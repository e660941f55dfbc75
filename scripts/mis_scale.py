"""Luby MIS at the 111M-edge scale: rounds, per-round survivors, wall.

Usage: python scripts/mis_scale.py [edges_parquet] [cores]
Writes /tmp/mis_scale.json.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from graphblas_algorithms_spark.classes.graph import Graph
from graphblas_algorithms_spark.operators.mis import maximal_independent_set
from graphblas_algorithms_spark.session import get_spark


def main():
    edges_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_scale_edges"
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    spark = get_spark(cores=cores, shuffle_partitions=2 * cores, driver_memory="48g")
    raw = spark.read.parquet(edges_path).select("src", "dst")
    nodes = (
        raw.select(F.col("src").alias("id"))
        .unionByName(raw.select(F.col("dst").alias("id")))
        .distinct()
    )
    G = Graph(raw, nodes, canonicalize=True)
    m = G.edges.count()
    print(f"graph: {G.n} nodes, {m} canonical edges", flush=True)

    t0 = time.time()
    mis = maximal_independent_set(G).persist()
    k = mis.count()
    wall = time.time() - t0
    print(f"MIS: {k} nodes in {wall:.1f}s", flush=True)
    # spot-verify independence on a sample of MIS-internal edges
    bad = (
        G.edges.join(mis.withColumnRenamed("id", "src"), "src", "left_semi")
        .join(mis.withColumnRenamed("id", "dst"), "dst", "left_semi")
        .filter(F.col("src") != F.col("dst"))
        .count()
    )
    print(f"independence violations: {bad}", flush=True)
    out = {
        "cores": cores,
        "edges_canonical": m,
        "mis_size": k,
        "wall_s": round(wall, 1),
        "violations": bad,
    }
    with open("/tmp/mis_scale.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
