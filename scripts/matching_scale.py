"""Dominant-edge maximal matching at the 111M-edge scale: rounds, wall,
disjointness/maximality spot checks.

Usage: python scripts/matching_scale.py [edges_parquet] [cores]
Writes /tmp/matching_scale.json.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from graphblas_algorithms_spark.classes.graph import Graph
from graphblas_algorithms_spark.operators.matching import maximal_matching
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
    matched = maximal_matching(G).persist()
    k = matched.count()
    wall = time.time() - t0
    print(f"matching: {k} edges in {wall:.1f}s", flush=True)

    # disjointness: no endpoint appears twice
    dup = (
        matched.select(F.col("src").alias("id"))
        .unionByName(matched.select(F.col("dst").alias("id")))
        .groupBy("id")
        .count()
        .filter(F.col("count") > 1)
        .count()
    )
    # maximality: every non-loop edge touches a matched endpoint
    ids = (
        matched.select(F.col("src").alias("id"))
        .unionByName(matched.select(F.col("dst").alias("id")))
        .distinct()
    )
    uncovered = (
        G.edges.join(ids.withColumnRenamed("id", "src"), "src", "left_anti")
        .join(ids.withColumnRenamed("id", "dst"), "dst", "left_anti")
        .filter(F.col("src") != F.col("dst"))
        .count()
    )
    print(f"endpoint dups: {dup}, uncovered edges: {uncovered}", flush=True)
    out = {
        "cores": cores,
        "edges_canonical": m,
        "matching_size": k,
        "wall_s": round(wall, 1),
        "endpoint_dups": dup,
        "uncovered_edges": uncovered,
    }
    with open("/tmp/matching_scale.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
