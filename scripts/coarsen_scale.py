"""Multilevel coarsening at the 111M-edge scale: two matching-contraction
levels, per-level node/edge counts and walls.

Usage: python scripts/coarsen_scale.py [edges_parquet] [cores] [levels]
Writes /tmp/coarsen_scale.json.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from graphblas_algorithms_spark.classes.graph import Graph
from graphblas_algorithms_spark.operators.matching import coarsen_graph
from graphblas_algorithms_spark.session import get_spark


def main():
    edges_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_scale_edges"
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    levels = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    spark = get_spark(cores=cores, shuffle_partitions=2 * cores, driver_memory="48g")
    raw = spark.read.parquet(edges_path).select("src", "dst")
    nodes = (
        raw.select(F.col("src").alias("id"))
        .unionByName(raw.select(F.col("dst").alias("id")))
        .distinct()
    )
    G = Graph(raw, nodes, canonicalize=True)
    n0, m0 = G.n, G.edges.count()
    print(f"level 0: {n0} nodes, {m0} canonical edges", flush=True)

    out = {"cores": cores, "levels": []}
    for lvl in range(1, levels + 1):
        t0 = time.time()
        coarse, node_map = coarsen_graph(G)
        coarse = coarse.persist()
        m = coarse.count()
        n = node_map.select("rep").distinct().count()
        wall = time.time() - t0
        # sanity: self-loop-free and canonical
        bad = coarse.filter(F.col("src") >= F.col("dst")).count()
        prev_n = n0 if lvl == 1 else out["levels"][-1]["nodes"]
        print(
            f"level {lvl}: {n} nodes, {m} weighted edges in {wall:.1f}s "
            f"(shrink {prev_n / n:.2f}x, bad_rows {bad})",
            flush=True,
        )
        out["levels"].append(
            {"nodes": n, "edges": m, "wall_s": round(wall, 1), "bad_rows": bad}
        )
        cn = coarse.select(F.col("src").alias("id")).unionByName(
            coarse.select(F.col("dst").alias("id"))
        ).distinct()
        G = Graph(coarse.select("src", "dst"), cn, canonicalize=False)

    out.update({"nodes0": n0, "edges0": m0})
    with open("/tmp/coarsen_scale.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
