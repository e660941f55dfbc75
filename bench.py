"""Benchmark harness (driver contract).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

* ``queries``: wall seconds per headline query on the parquet tables at
  ``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1), running on
  ``local[$SPARK_GRAFT_CPUS]`` (default 32).
* ``value``/``metric``: PageRank on the synthesized source-code link
  graph (seed=42, BASELINE.json north_star input) to 1e-6 convergence —
  reported as edges-processed/sec (edges * iterations / wall).
* ``SPARK_GRAFT_SCALING=1``: additionally re-runs the same PageRank at
  local[8] and local[32] and reports throughput at both + efficiency
  ((thr32/thr8)/4) — the sandbox evidence for the two-cluster-size rule.

Bench protocol follows the reference (scripts/bench.py:151-217): clear
property caches between runs; cold plans per run.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SCALING = os.environ.get("SPARK_GRAFT_SCALING", "0") == "1"

# corpus scale for the link-graph throughput metric
N_REPOS = int(os.environ.get("SPARK_GRAFT_BENCH_REPOS", "400"))
FILES_PER_REPO = int(os.environ.get("SPARK_GRAFT_BENCH_FILES", "100"))


def _corpus_pagerank(cores: int) -> dict:
    """Synthesize corpus -> extract edges -> pagerank to 1e-6.
    Returns throughput numbers. Fresh SparkSession at the given core count."""
    from graphblas_algorithms_spark.classes.graph import DiGraph
    from graphblas_algorithms_spark.operators.pagerank import pagerank
    from graphblas_algorithms_spark.session import get_spark, stop_spark
    from graphblas_algorithms_spark.sources.corpus import synthesize_source_table
    from graphblas_algorithms_spark.sources.edges import build_link_graph

    stop_spark()
    spark = get_spark(cores=cores, shuffle_partitions=cores, app_name=f"bench-{cores}")
    src = synthesize_source_table(spark, n_repos=N_REPOS, files_per_repo=FILES_PER_REPO)
    edges, nodes = build_link_graph(src)
    edges = edges.persist()
    m = edges.count()
    G = DiGraph(edges, nodes.select("id"), dedup=False)
    G.partition_by_src(cores)
    iters = []
    t0 = time.time()
    ranks = pagerank(G, alpha=0.85, tol=1e-6, max_iter=100,
                     iteration_hook=lambda it, err: iters.append(it))
    ranks.count()
    wall = time.time() - t0
    n_iter = len(iters)
    spark.catalog.clearCache()
    return {
        "cores": cores,
        "edges": m,
        "nodes": G.n,
        "iterations": n_iter,
        "wall_s": round(wall, 3),
        "iters_per_sec": round(n_iter / wall, 4),
        "edges_per_sec": round(m * n_iter / wall, 1),
    }


def _sf_queries(spark) -> dict:
    import __spark_entry__ as em

    picks = [
        "graph_pagerank",
        "graph_components",
        "graph_labelprop",
        "graph_triangles_total",
        "graph_bfs",
        "graph_sssp",
        "pipe_minhash_neardup",
        "pipe_ann_topk",
        "pipe_simhash",
        "events_sessions",
        "olap_pricing",
    ]
    qs = em.queries()
    out = {}
    for name in picks:
        t0 = time.time()
        df = qs[name](spark, SF_DIR)
        df.count()
        out[name] = round(time.time() - t0, 3)
        spark.catalog.clearCache()
    return out


def main() -> None:
    from graphblas_algorithms_spark.session import get_spark, stop_spark

    result: dict = {"sf": SF_DIR, "unit": "sec"}

    # headline: link-graph pagerank throughput at CPUS cores
    head = _corpus_pagerank(CPUS)
    result["metric"] = (
        "pagerank edges-processed/sec to 1e-6 on synthesized link graph "
        f"({head['nodes']} nodes, {head['edges']} edges, "
        f"{head['iterations']} iters, local[{CPUS}])"
    )
    result["value"] = head["wall_s"]
    result["pagerank"] = head

    if SCALING:
        lo = _corpus_pagerank(8)
        hi = head if CPUS == 32 else _corpus_pagerank(32)
        eff = (hi["edges_per_sec"] / lo["edges_per_sec"]) / (32 / 8)
        result["scaling"] = {
            "local8": lo,
            "local32": hi,
            "efficiency": round(eff, 4),
        }

    # per-query wall times on the sf tables
    stop_spark()
    spark = get_spark(cores=CPUS, shuffle_partitions=CPUS, app_name="bench-queries")
    result["queries"] = _sf_queries(spark)
    spark.stop()

    print(json.dumps(result))


if __name__ == "__main__":
    main()
