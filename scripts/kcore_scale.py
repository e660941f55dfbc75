"""Exact core numbers at the 111M-edge scale (iterated h-index).

The h-index core iteration (Lü-Chen-Zhou 2016) is the one-pass answer
to the full core decomposition — no per-k peeling sweeps, state is one
value per node, a round is one O(nnz) join + one windowed h-index.
This row prices it on the shared corpus graph and reports the round
count (convergence is data-dependent: the slow tail is the deepest
core's boundary).

Usage: python scripts/kcore_scale.py [edges_parquet] [cores] [max_rounds]
Writes /tmp/kcore_scale.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from graphblas_algorithms_spark.classes.graph import Graph
from graphblas_algorithms_spark.operators.kcore import core_number
from graphblas_algorithms_spark.session import get_spark, stop_spark


def main():
    edges_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_scale_edges"
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    max_rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 100
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
    cn = core_number(G, max_rounds=max_rounds).persist()
    rows = cn.count()
    wall = time.time() - t0
    agg = cn.agg(F.max("core").alias("mx"), F.avg("core").alias("av")).collect()[0]
    out = {
        "cores": cores,
        "nodes": n,
        "edges_canonical": m,
        "rows": rows,
        "wall_s": round(wall, 1),
        "max_core": int(agg["mx"]),
        "avg_core": round(float(agg["av"]), 2),
    }
    print(json.dumps(out), flush=True)
    with open("/tmp/kcore_scale.json", "w") as f:
        json.dump(out, f)


if __name__ == "__main__":
    main()
