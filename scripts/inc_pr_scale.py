"""Incremental PageRank at the 111M-edge scale: after a ~1% edge delta,
how many supersteps does the warm restart save vs mixing from uniform?

Tolerance: the reference's n-scaled criterion (err < n*tol) degenerates
at this scale — with 6M nodes and unit total mass, n*1e-6 = 6.0 exceeds
any possible L1 step difference, so every run "converges" after one
superstep and the comparison is vacuous (this script's first version
measured exactly that).  All runs here gate on the ABSOLUTE L1 step
budget ``TOL_ABS`` (default 1e-4 of total mass; see pagerank.tol_abs).
Distance to the unique fixpoint is then <= alpha/(1-alpha) * TOL_ABS,
so warm and cold scores must agree within
2 * alpha/(1-alpha) * TOL_ABS in L1 — asserted below.

Protocol: converge PageRank on the 99% bulk graph, add the delta, then
re-converge over the FULL edge set twice — warm-started from the bulk
scores and cold-started from uniform — recording iterations and wall
for each.

Usage: python scripts/inc_pr_scale.py [edges_parquet] [cores]
Writes /tmp/inc_pr_scale.json.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from graphblas_algorithms_spark.classes.graph import DiGraph
from graphblas_algorithms_spark.operators.pagerank import pagerank
from graphblas_algorithms_spark.session import get_spark

ALPHA = 0.85
TOL_ABS = 1e-4


def _converge(G, nstart=None):
    iters = []
    t0 = time.time()
    ranks = pagerank(
        G, alpha=ALPHA, tol_abs=TOL_ABS, max_iter=200, nstart=nstart,
        iteration_hook=lambda it, err: iters.append(it),
    ).persist()
    ranks.count()
    return ranks, len(iters), round(time.time() - t0, 1)


def main():
    edges_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_scale_edges"
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    spark = get_spark(cores=cores, shuffle_partitions=2 * cores, driver_memory="48g")

    raw = spark.read.parquet(edges_path).select("src", "dst")
    bucket = F.abs(F.xxhash64("src", "dst")) % 100
    bulk = raw.filter(bucket >= 1).persist()
    m_bulk = bulk.count()
    m_all = raw.count()
    print(f"bulk={m_bulk} all={m_all}", flush=True)

    def graph(e):
        nodes = (
            e.select(F.col("src").alias("id"))
            .unionByName(e.select(F.col("dst").alias("id")))
            .distinct()
        )
        return DiGraph(e, nodes, dedup=False)

    bulk_scores, it_bulk, w_bulk = _converge(graph(bulk))
    print(f"bootstrap: {it_bulk} iters, {w_bulk}s", flush=True)

    Gall = graph(raw)
    warm_scores, it_warm, w_warm = _converge(Gall, nstart=bulk_scores)
    print(f"warm: {it_warm} iters, {w_warm}s", flush=True)
    cold_scores, it_cold, w_cold = _converge(Gall)
    print(f"cold: {it_cold} iters, {w_cold}s", flush=True)

    agg = (
        warm_scores.withColumnRenamed("rank", "a")
        .join(cold_scores.withColumnRenamed("rank", "b"), "id")
        .agg(
            F.sum(F.abs(F.col("a") - F.col("b"))).alias("l1"),
            F.max(F.abs(F.col("a") - F.col("b"))).alias("worst"),
        )
        .collect()[0]
    )
    bound = 2 * ALPHA / (1 - ALPHA) * TOL_ABS
    out = {
        "cores": cores,
        "m_bulk": m_bulk,
        "m_all": m_all,
        "alpha": ALPHA,
        "tol_abs_l1": TOL_ABS,
        "bootstrap": {"iters": it_bulk, "wall_s": w_bulk},
        "warm_restart": {"iters": it_warm, "wall_s": w_warm},
        "cold_restart": {"iters": it_cold, "wall_s": w_cold},
        "l1_warm_vs_cold": agg["l1"],
        "l1_bound_theory": bound,
        "max_abs_score_diff_warm_vs_cold": agg["worst"],
    }
    print(json.dumps(out), flush=True)
    assert agg["l1"] < bound, (agg["l1"], bound)
    assert it_warm < it_cold, (it_warm, it_cold)
    with open("/tmp/inc_pr_scale.json", "w") as f:
        json.dump(out, f, indent=2)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
