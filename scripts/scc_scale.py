"""SCC at scale (VERDICT r2 "Next round" #5): run
strongly_connected_components on the 111M-edge synthesized source-code
link digraph (the same parquet the scaling evidence uses) and record
wall, peel rounds, per-round active counts, and block-manager stability.

The link graph is DAG-dominated (imports point "downward" into shared
modules) with small mutual-import cycles — exactly the shape where the
bulk trivial-SCC trim must collapse the DAG-like mass in cheap
fixpoint layers and leave only true cycles for the coloring rounds.

Usage: python scripts/scc_scale.py [edges_parquet] [cores]
Writes /tmp/scc_scale.json.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from graphblas_algorithms_spark.classes.graph import DiGraph
from graphblas_algorithms_spark.operators.components import (
    strongly_connected_components,
)
from graphblas_algorithms_spark.session import get_spark


def main():
    edges_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_scale_edges"
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    spark = get_spark(cores=cores, shuffle_partitions=2 * cores, driver_memory="48g")
    raw = spark.read.parquet(edges_path)
    edges = raw.select("src", "dst")
    nodes = (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    G = DiGraph(edges, nodes, dedup=False)
    m = G.edges.count()
    n = G.n
    print(f"digraph: {n} nodes, {m} edges", flush=True)

    sc = spark.sparkContext
    blocks_before = len(list(sc._jsc.sc().getRDDStorageInfo()))
    stats: dict = {}
    t0 = time.time()
    comp = strongly_connected_components(G, stats=stats).persist()
    n_out = comp.count()
    wall = time.time() - t0
    n_scc = comp.select("component").distinct().count()
    top = (
        comp.groupBy("component")
        .count()
        .orderBy(F.desc("count"))
        .limit(5)
        .collect()
    )
    blocks_after = len(list(sc._jsc.sc().getRDDStorageInfo()))
    out = {
        "nodes": n,
        "edges": m,
        "wall_s": round(wall, 1),
        "rows_out": n_out,
        "n_scc": n_scc,
        "top_scc_sizes": [r["count"] for r in top],
        "peel_rounds": stats.get("rounds"),
        "active_per_round": stats.get("active_per_round"),
        "rdd_storage_per_round": stats.get("rdd_storage_per_round"),
        "rdd_blocks_before": blocks_before,
        "rdd_blocks_after": blocks_after,
    }
    print(json.dumps(out), flush=True)
    with open("/tmp/scc_scale.json", "w") as f:
        json.dump(out, f, indent=2)
    assert n_out == n, f"every node must be labeled: {n_out} != {n}"


if __name__ == "__main__":
    main()
