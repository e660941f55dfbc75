"""Bridges + 2ECC cycle-space sampling at the 111M-edge scale.

Evidence that the DFS-free bridge construction holds its promised cost
shape on the shared 6M-node / 111M-edge corpus graph: one CC labeling
+ one multi-root BFS (delta-frontier, O(nnz) total) + one node-XOR agg
+ height upward-peel rounds that each touch ONE tree level.  The wall
is dominated by the two traversals — the XOR certificate itself is two
joins and h tiny aggregations, which is why this scales where
low-link DFS cannot.

Usage: python scripts/bridges_scale.py [edges_parquet] [cores]
Writes /tmp/bridges_scale.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from graphblas_algorithms_spark.classes.graph import Graph
from graphblas_algorithms_spark.operators.bridges import bridges, spanning_forest
from graphblas_algorithms_spark.session import get_spark, stop_spark


def main():
    edges_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_scale_edges"
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    if not os.path.exists(edges_path):
        import bench

        bench.SCALE_DIR = edges_path
        bench._scaling_build()
        stop_spark()
    spark = get_spark(cores=cores, shuffle_partitions=2 * cores, driver_memory="48g")
    raw = spark.read.parquet(edges_path).select("src", "dst")
    nodes = (
        raw.select(F.col("src").alias("id"))
        .unionByName(raw.select(F.col("dst").alias("id")))
        .distinct()
    )
    G = Graph(raw, nodes, canonicalize=True)
    m = G.edges.count()
    n = G.n
    print(f"undirected: {n} nodes, {m} canonical edges", flush=True)

    t0 = time.time()
    forest = spanning_forest(G).persist()
    fc = forest.count()
    height = forest.agg(F.max("level")).collect()[0][0]
    forest_wall = time.time() - t0
    print(f"forest: {fc} rows, height {height}, {forest_wall:.1f}s", flush=True)

    t0 = time.time()
    br = bridges(G).persist()
    nb = br.count()
    bridge_wall = time.time() - t0
    print(f"bridges: {nb} in {bridge_wall:.1f}s (incl. its own forest rebuild)", flush=True)

    out = {
        "cores": cores,
        "nodes": n,
        "edges_canonical": m,
        "forest_height": int(height),
        "forest_wall_s": round(forest_wall, 1),
        "bridges": nb,
        "bridges_wall_s": round(bridge_wall, 1),
    }
    print(json.dumps(out), flush=True)
    with open("/tmp/bridges_scale.json", "w") as f:
        json.dump(out, f)


if __name__ == "__main__":
    main()
