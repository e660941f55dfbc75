"""HyperBall whole-graph centralities at the 111M-edge scale.

Evidence for the claim the operator exists to make: harmonic/closeness
estimates for EVERY node priced as (h rounds x one O(nnz) shuffle of
k+3 long columns) — the sketch pass is the only whole-graph distance
centrality that survives 10^12 files (exact closeness is one BFS per
node; the pivot estimators score pivots, not everyone).

Reuses the shared scale corpus parquet (bench.py writes it at
/tmp/spark_graft_scale_edges); builds it with bench._scaling_build()
when absent, so the row is comparable with the PageRank/CC/ANF rows on
the same graph.

Usage: python scripts/hyperball_scale.py [edges_parquet] [cores] [h] [k]
Writes /tmp/hyperball_scale.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from graphblas_algorithms_spark.classes.graph import DiGraph
from graphblas_algorithms_spark.operators.anf import hyperball
from graphblas_algorithms_spark.session import get_spark, stop_spark


def main():
    edges_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_scale_edges"
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    h = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    k = int(sys.argv[4]) if len(sys.argv) > 4 else 16

    if not os.path.exists(edges_path):
        print("scale edges missing — building via bench._scaling_build()", flush=True)
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
    G = DiGraph(raw, nodes, dedup=False)
    m = raw.count()
    n = G.n
    print(f"digraph: {n} nodes, {m} edges; hyperball h={h} k={k}", flush=True)

    t0 = time.time()
    hb = hyperball(G, h=h, k=k, mode="in")
    rows = hb.count()
    wall = time.time() - t0
    # converged-ball sanity: totals should be positive and bounded by n*n
    agg = hb.agg(
        F.sum("reachable").alias("pairs"),
        F.max("harmonic").alias("max_harm"),
    ).collect()[0]
    out = {
        "cores": cores,
        "nodes": n,
        "edges": m,
        "h": h,
        "k": k,
        "rows": rows,
        "wall_s": round(wall, 1),
        "wall_per_round_s": round(wall / h, 1),
        "edge_visits_per_s": round(m * h / wall),
        "reachable_pairs_est": float(agg["pairs"]),
        "max_harmonic_est": float(agg["max_harm"]),
    }
    print(json.dumps(out), flush=True)
    with open("/tmp/hyperball_scale.json", "w") as f:
        json.dump(out, f)


if __name__ == "__main__":
    main()
