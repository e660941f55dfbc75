"""Benchmark harness (driver contract).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

* ``queries``: wall seconds per headline query on the parquet tables at
  ``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1), running on
  ``local[$SPARK_GRAFT_CPUS]`` (default 32).
* ``value``/``metric``: PageRank on the synthesized source-code link
  graph (seed=42, BASELINE.json north_star input) to 1e-6 convergence —
  reported as edges-processed/sec (edges * iterations / wall).
* ``SPARK_GRAFT_SCALING=1``: additionally runs the same PageRank
  superstep job over one shared edge-parquet input at TWO parallelism
  levels (default local[4] vs local[16]) and reports throughput at both
  + efficiency ((thr_hi/thr_lo)/(hi/lo)) — the sandbox evidence for the
  two-cluster-size rule.  Methodology notes (hard-won):
  - this sandbox's vCPUs are oversubscribed above ~16 threads AND the
    host is noisy (identical 3 s CPU bursts vary ~2x over minutes), so
    the pair is 4/16 (within real cores) and each level runs multiple
    interleaved reps with the MIN steady-state per-iteration wall taken
    (min filters host noise; first iterations excluded as warmup);
  - the measured job is the fused-state superstep: with the state
    hash-partitioned on the contraction key and edges pre-partitioned
    by src, a superstep is ONE O(nnz) shuffle (see operators/pagerank.py);
  - the graph must be big enough that compute dominates the ~2 s
    parallelism-independent per-superstep floor (driver scheduling +
    stage barriers); SPARK_GRAFT_SCALE_EDGES_X controls a disjoint-copy
    blowup of the extracted corpus graph to reach that regime.

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
    from graphblas_algorithms_spark.session import (
        get_spark,
        stop_spark,
        tune_shuffle_partitions,
    )
    from graphblas_algorithms_spark.sources.corpus import synthesize_source_table
    from graphblas_algorithms_spark.sources.edges import build_link_graph

    stop_spark()
    spark = get_spark(cores=cores, shuffle_partitions=cores, app_name=f"bench-{cores}")
    src = synthesize_source_table(spark, n_repos=N_REPOS, files_per_repo=FILES_PER_REPO)
    edges, nodes = build_link_graph(src)
    edges = edges.persist()
    m = edges.count()
    node_ids = nodes.select("id").persist()
    node_ids.count()
    # size-aware width: tiny graphs are scheduling-floor bound at full
    # core width (measured 2.4x; see session.tune_shuffle_partitions)
    parts = tune_shuffle_partitions(spark, m, max_parts=cores)
    # min-of-reps headline (VERDICT r4 #5): a single-shot wall on this
    # noisy host swung r3->r4 by +24% on UNCHANGED code; min over a few
    # cold-plan reps filters the host window like scaling_evidence does.
    reps = int(os.environ.get("SPARK_GRAFT_HEAD_REPS", "3"))
    walls, iter_counts = [], []
    best_n = None
    for _ in range(max(reps, 1)):
        G = DiGraph(edges, node_ids, dedup=False)
        G.partition_by_src(parts)
        iters = []
        t0 = time.time()
        # check_every=3: convergence action every 3rd superstep — the lazy
        # lineage cut rides the unchecked steps inside the next convergence
        # job, so the scheduling-floor-bound bench graph pays ~1/3 of the
        # driver actions at the same 1e-6 criterion (README "check_every").
        ranks = pagerank(G, alpha=0.85, tol=1e-6, max_iter=100, check_every=3,
                         iteration_hook=lambda it, err: iters.append(it))
        ranks.count()
        walls.append(time.time() - t0)
        iter_counts.append(len(iters))
        best_n = G.n
        G.edges.unpersist()
        spark.catalog.clearCache()
        edges.persist().count()  # re-pin the shared input for the next rep
    wall = min(walls)
    n_iter = iter_counts[walls.index(wall)]
    return {
        "cores": cores,
        "edges": m,
        "nodes": best_n,
        "iterations": n_iter,
        "wall_s": round(wall, 3),
        "walls_all": [round(w, 3) for w in walls],
        "iters_per_sec": round(n_iter / wall, 4),
        "edges_per_sec": round(m * n_iter / wall, 1),
    }


SCALE_LO = int(os.environ.get("SPARK_GRAFT_SCALE_LO", "4"))
SCALE_HI = int(os.environ.get("SPARK_GRAFT_SCALE_HI", "16"))
SCALE_REPOS = int(os.environ.get("SPARK_GRAFT_SCALE_REPOS", "6000"))
SCALE_FILES = int(os.environ.get("SPARK_GRAFT_SCALE_FILES", "250"))
SCALE_EDGES_X = int(os.environ.get("SPARK_GRAFT_SCALE_EDGES_X", "4"))
SCALE_REPS = int(os.environ.get("SPARK_GRAFT_SCALE_REPS", "2"))
SCALE_ITERS = int(os.environ.get("SPARK_GRAFT_SCALE_ITERS", "6"))
SCALE_DIR = os.environ.get("SPARK_GRAFT_SCALE_DIR", "/tmp/spark_graft_scale_edges")


def _scaling_build() -> tuple[int, int]:
    """Synthesize the corpus, extract the link graph, blow it up to
    SCALE_EDGES_X disjoint copies, write the edge parquet ONCE.  Both
    parallelism levels then read the SAME input (two-cluster-size rule).
    Returns (n_edges, n_nodes)."""
    from pyspark.sql import functions as F

    from graphblas_algorithms_spark.session import get_spark, stop_spark
    from graphblas_algorithms_spark.sources.corpus import synthesize_source_table
    from graphblas_algorithms_spark.sources.edges import build_link_graph

    stop_spark()
    spark = get_spark(cores=CPUS, shuffle_partitions=2 * CPUS, app_name="scale-build")
    src = synthesize_source_table(
        spark, n_repos=SCALE_REPOS, files_per_repo=SCALE_FILES,
        max_imports=100, deg_exponent=-2.0,
    )
    edges, nodes = build_link_graph(src, num_partitions=2 * CPUS)
    n_base = SCALE_REPOS * SCALE_FILES
    copies = [
        edges.select(
            (F.col("src") + F.lit(k * n_base)).alias("src"),
            (F.col("dst") + F.lit(k * n_base)).alias("dst"),
        )
        for k in range(SCALE_EDGES_X)
    ]
    big = copies[0]
    for c in copies[1:]:
        big = big.unionByName(c)
    big.write.mode("overwrite").parquet(SCALE_DIR)
    m = spark.read.parquet(SCALE_DIR).count()
    return m, n_base * SCALE_EDGES_X


def _scaling_run(cores: int, m: int) -> float:
    """Min steady-state per-superstep wall of the fused pagerank job at
    local[cores] over the shared edge parquet.  Returns edges/sec."""
    from pyspark.sql import functions as F

    from graphblas_algorithms_spark.classes.graph import DiGraph
    from graphblas_algorithms_spark.operators.pagerank import pagerank
    from graphblas_algorithms_spark.session import get_spark, stop_spark

    stop_spark()
    spark = get_spark(cores=cores, shuffle_partitions=cores, app_name=f"scale-{cores}")
    edges = spark.read.parquet(SCALE_DIR)
    nodes = (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    G = DiGraph(edges, nodes, dedup=False)
    G.nodes.persist().count()
    ts = [time.time()]
    def hook(it, err):
        ts.append(time.time())
    try:
        pagerank(G, alpha=0.85, tol=0.0, max_iter=SCALE_ITERS, iteration_hook=hook)
    except Exception:
        pass  # ConvergenceFailure expected at tol=0 (fixed-length run)
    walls = [ts[i + 1] - ts[i] for i in range(len(ts) - 1)]
    return m / min(walls[2:])


def _scaling_evidence() -> dict:
    m, n = _scaling_build()
    thr = {SCALE_LO: 0.0, SCALE_HI: 0.0}
    for _ in range(SCALE_REPS):  # interleave levels to cancel host drift
        for c in (SCALE_LO, SCALE_HI):
            thr[c] = max(thr[c], _scaling_run(c, m))
    eff = (thr[SCALE_HI] / thr[SCALE_LO]) / (SCALE_HI / SCALE_LO)
    return {
        "edges": m,
        "nodes": n,
        f"local{SCALE_LO}": {"edges_per_sec": round(thr[SCALE_LO], 1)},
        f"local{SCALE_HI}": {"edges_per_sec": round(thr[SCALE_HI], 1)},
        "efficiency": round(eff, 4),
        "method": "min steady-state per-superstep wall over interleaved reps; "
                  "shared edge parquet input; warmup iterations excluded",
    }


def _sf_queries(spark) -> dict:
    import __spark_entry__ as em
    from graphblas_algorithms_spark.session import tune_shuffle_partitions

    # size-aware width for the whole query pass: the sf tables' shared
    # co-purchase graph is ~77k edges at sf0.1 — scheduling-floor bound at
    # 32-wide shuffles (see session.tune_shuffle_partitions)
    n_li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").count()
    tune_shuffle_partitions(spark, n_li, rows_per_partition=75_000, max_parts=CPUS)

    picks = [
        "graph_pagerank",
        "graph_components",
        # same labeling via diameter-independent star contraction (the
        # unknown-diameter 100 TB default); side-by-side with min-label
        "graph_components_star",
        "graph_labelprop",
        "graph_triangles_total",
        "graph_bfs",
        "graph_sssp",
        # pivot-sampled centralities (16-source Brandes / 48-pivot harmonic)
        "graph_betweenness",
        "graph_harmonic",
        # deterministic walk corpus (16 starts x 2 walks x 8 hops) and
        # speculative greedy coloring on the 1/7-thinned graph
        "graph_walks",
        "graph_coloring",
        # dominant-edge matching (the third symmetry-breaking primitive)
        "graph_matching",
        # structural-role fingerprints (depth-2 WL label refinement)
        "graph_wl",
        # community structure: multilevel Louvain + the densest-core peel
        "graph_louvain",
        "graph_densest",
        # whole-graph distance statistic (2 BFS passes) + triad census
        "graph_diameter",
        "graph_triad_census",
        # r3 additions: whole-graph sketch centralities (4 HyperBall
        # rounds), bipartite butterfly counts, time-respecting reach
        "graph_hyperball",
        "graph_butterflies",
        "events_temporal_reach",
        # embedding-space curation: cluster-then-dedup (SemDeDup shape)
        "pipe_semdedup",
        "pipe_minhash_neardup",
        # corpus-level transitive dedup: LSH pairs -> CC clusters
        "pipe_dedup_clusters",
        # ANN headline = the bucketed IVF path (the 100 TB shape); the
        # brute-force crossJoin pipe_ann_topk stays as the oracled exact
        # verifier but is NOT the benched default
        "pipe_ann_ivf",
        "pipe_embedding_lsh",
        "pipe_simhash",
        # corpus stats: boilerplate n-gram mining + per-doc tf-idf top-k
        "pipe_common_ngrams",
        "pipe_tfidf_topterms",
        "events_sessions",
        "olap_pricing",
        # r4 rotation (VERDICT r3 #9): queries never benched before get
        # wall numbers at least once — k-core peel, the sequence packer's
        # distributed prefix-sum, benchmark decontamination, plus the two
        # new kernels (forward-push PPR, bow-tie decomposition)
        "graph_kcore",
        "pipe_pack_sequences",
        "pipe_decontaminate",
        "graph_ppr_push",
        "graph_bowtie",
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
        result["scaling"] = _scaling_evidence()

    # per-query wall times on the sf tables
    stop_spark()
    spark = get_spark(cores=CPUS, shuffle_partitions=CPUS, app_name="bench-queries")
    result["queries"] = _sf_queries(spark)
    spark.stop()

    print(json.dumps(result))


if __name__ == "__main__":
    main()
