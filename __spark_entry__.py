"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: PageRank over the customer->supplier link
graph derived from the sf0.001 parquet tables.

``queries()`` / ``oracle_sql()`` — one entry per implemented operator
(SURVEY.md §2 + pipeline mandate).  Graphs are derived deterministically
from the shared TPC-H-ish tables so the DuckDB oracle can rebuild the
same graph in pure SQL:

* part co-occurrence graph (undirected): parts appearing in the same
  order; nodes = all parts (isolated parts included).
* customer->supplier digraph: src=o_custkey, dst=100000+l_suppkey
  (distinct); nodes = all customers + suppliers (dangling suppliers).
* part digraph: co-occurrence pair (a<b) directed a->b iff (a+b)%2=0 and
  b->a iff (a+b)%3=0 (partial reciprocity).
* weighted part graph: weight = 1 + (src+dst)%5.

Iterative kernels run FIXED iteration counts here so the unrolled-SQL
oracles are trajectory-identical; floats are rounded to 6dp on BOTH
sides.  Every hash used by dedup ops is md5 (engine-portable).
"""

from __future__ import annotations

import os as _os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graphblas_algorithms_spark.classes.graph import DiGraph, Graph

# ---------------------------------------------------------------------------
# shared derived tables — Spark side
# ---------------------------------------------------------------------------


def _read(spark, sf_dir, name):
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# The co-purchase pair extraction below feeds ~30 of the graph queries; a
# real deployment materializes the edge table once and runs every kernel
# against it, so within one SparkSession we persist it on first use instead
# of re-deriving the self-join per query.  Keyed by session identity: a new
# session (the driver may create one per query) simply misses and rebuilds.
_PAIRS_MEMO: dict = {}


def _evict_dead_sessions() -> None:
    """Drop memo entries whose SparkSession has been stopped — a driver
    that creates one session per query would otherwise pin every dead
    session (and its persisted DataFrame) for the whole run."""
    dead = []
    for key, (sess, _df) in _PAIRS_MEMO.items():
        try:
            stopped = sess.sparkContext._jsc is None
        except Exception:
            stopped = True
        if stopped:
            dead.append(key)
    for key in dead:
        _PAIRS_MEMO.pop(key, None)


def _part_pairs(spark, sf_dir) -> DataFrame:
    _evict_dead_sessions()
    key = (id(spark), sf_dir)
    hit = _PAIRS_MEMO.get(key)
    if hit is not None and hit[0] is spark:
        df = hit[1]
        try:
            if df.storageLevel.useMemory is False and df.storageLevel.useDisk is False:
                df.persist()  # re-pin after an external clearCache()
        except Exception:
            pass
        return df
    li = _read(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a = li.toDF("ok", "pa")
    b = li.toDF("ok", "pb")
    pairs = (
        a.join(b, "ok")
        .filter(F.col("pa") < F.col("pb"))
        .select(F.col("pa").alias("src"), F.col("pb").alias("dst"))
        .distinct()
        .persist()
    )
    _PAIRS_MEMO[key] = (spark, pairs)
    return pairs


def _part_nodes(spark, sf_dir) -> DataFrame:
    return _read(spark, sf_dir, "part").select(F.col("p_partkey").alias("id"))


def _part_graph(spark, sf_dir) -> Graph:
    return Graph(_part_pairs(spark, sf_dir), _part_nodes(spark, sf_dir), canonicalize=False)


def _part_graph_weighted(spark, sf_dir) -> Graph:
    e = _part_pairs(spark, sf_dir).select(
        "src", "dst", (1 + (F.col("src") + F.col("dst")) % 5).cast("double").alias("weight")
    )
    return Graph(e, _part_nodes(spark, sf_dir), canonicalize=False)


def _part_digraph(spark, sf_dir) -> DiGraph:
    p = _part_pairs(spark, sf_dir)
    fwd = p.filter((F.col("src") + F.col("dst")) % 2 == 0).select("src", "dst")
    bwd = p.filter((F.col("src") + F.col("dst")) % 3 == 0).select(
        F.col("dst").alias("src"), F.col("src").alias("dst")
    )
    return DiGraph(fwd.unionByName(bwd), _part_nodes(spark, sf_dir), dedup=True)


def _cust_supp_edges(spark, sf_dir):
    o = _read(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = _read(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(
            F.col("o_custkey").cast("long").alias("src"),
            (F.lit(100000) + F.col("l_suppkey")).cast("long").alias("dst"),
        )
        .distinct()
    )


def _cust_supp_graph(spark, sf_dir) -> DiGraph:
    e = _cust_supp_edges(spark, sf_dir)
    nodes = (
        _read(spark, sf_dir, "customer")
        .select(F.col("c_custkey").cast("long").alias("id"))
        .unionByName(
            _read(spark, sf_dir, "supplier").select(
                (F.lit(100000) + F.col("s_suppkey")).cast("long").alias("id")
            )
        )
        .distinct()
    )
    return DiGraph(e, nodes, dedup=False)


# SQL CTE prefixes (DuckDB) mirroring the Spark builders -------------------

_SQL_PART = """
part_pairs AS (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
part_nodes AS (SELECT p_partkey AS id FROM part),
sym AS (
  SELECT src, dst FROM part_pairs
  UNION ALL
  SELECT dst AS src, src AS dst FROM part_pairs
)
"""

_SQL_CUST_SUPP = """
cs_edges AS (
  SELECT DISTINCT o_custkey AS src, 100000 + l_suppkey AS dst
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
),
cs_nodes AS (
  SELECT c_custkey AS id FROM customer
  UNION
  SELECT 100000 + s_suppkey AS id FROM supplier
)
"""

_SQL_PART_DIGRAPH = """
part_pairs AS (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
part_nodes AS (SELECT p_partkey AS id FROM part),
dedges AS (
  SELECT src, dst FROM part_pairs WHERE (src + dst) % 2 = 0
  UNION
  SELECT dst AS src, src AS dst FROM part_pairs WHERE (src + dst) % 3 = 0
)
"""


# ---------------------------------------------------------------------------
# entry — flagship
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """PageRank to convergence on the sf0.001 customer->supplier graph."""
    from graphblas_algorithms_spark.operators.pagerank import pagerank

    G = _cust_supp_graph(spark, "/root/testdata/sf0.001")
    ranks = pagerank(G, alpha=0.85, tol=1e-6, max_iter=100)
    return ranks.select("id", F.round("rank", 6).alias("rank")).orderBy(
        F.desc("rank"), "id"
    )


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------

PR_ITERS = 20
INC_PR_ITERS = (12, 8)  # fixed supersteps per epoch (bulk, warm restart)
LPA_ITERS = 3
LOUVAIN_ROUNDS = 4
LOUVAIN_LEVELS = 2
KATZ_ITERS = 12
SSSP_ITERS = 8
HITS_ITERS = 8
EC_ITERS = 6


def _q_pagerank(spark, sf_dir):
    from graphblas_algorithms_spark.operators.pagerank import pagerank

    G = _cust_supp_graph(spark, sf_dir)
    r = pagerank(G, alpha=0.85, fixed_iters=PR_ITERS)
    return r.select("id", F.round("rank", 6).alias("rank"))


def _q_ppr_multi(spark, sf_dir):
    """Batched multi-seed personalized PageRank: 4 lowest-id seeds ride
    ONE contributions shuffle per superstep (the queries-as-matrix trick
    applied to link analysis); oracle unrolls the same fixed iterations
    with a seed dimension."""
    from graphblas_algorithms_spark.operators.ppr import personalized_pagerank_multi

    G = _cust_supp_graph(spark, sf_dir)
    seeds = [r["id"] for r in G.nodes.orderBy("id").limit(4).collect()]
    r = personalized_pagerank_multi(G, seeds, alpha=0.85, iters=PR_ITERS)
    return r.select("seed", "id", F.round("rank", 6).alias("rank"))


def _q_ppr_push(spark, sf_dir):
    """Forward-push PPR (Andersen-Chung-Lang), the many-seed scale path
    (operators/ppr.py:111): sparse (seed,id) state only on TOUCHED
    pairs.  r5: p/r carried as 2^-40 dyadic scaled BIGINTs (exact
    integer mass balance, order-independent spread sums — the ANF
    recipe), so the trajectory is bit-identical across run orders and
    engines; the oracle replays ALL 40 rounds (== max_rounds) as exact
    BIGINT CTEs — rounds past convergence are exact no-ops, so parity
    holds at ANY convergence depth, and the output needs no rounding."""
    from graphblas_algorithms_spark.operators.ppr import forward_push_ppr

    G = _part_graph(spark, sf_dir)
    seeds = [r["id"] for r in G.nodes.orderBy("id").limit(4).collect()]
    return forward_push_ppr(G, seeds, alpha=0.15, eps=1e-3, max_rounds=40)


def _q_components(spark, sf_dir):
    from graphblas_algorithms_spark.operators.components import connected_components

    return connected_components(_part_graph(spark, sf_dir))


def _q_components_star(spark, sf_dir):
    """Same labeling contract as graph_components (same oracle SQL), via
    the diameter-independent star-contraction path (O(log n) rounds)."""
    from graphblas_algorithms_spark.operators.components import connected_components

    return connected_components(_part_graph(spark, sf_dir), method="star")


def _q_components_incremental(spark, sf_dir):
    """PRODUCTION streaming shape: the part graph's edges arrive as 3
    parquet files processed one per micro-batch
    (streaming/components.py); each batch is contracted through the
    current label store and only the residual component-merge graph is
    star-contracted.  The final store must equal one batch CC over the
    full edge set — the same recursive-CTE oracle as graph_components."""
    import tempfile

    from graphblas_algorithms_spark.streaming.components import (
        incremental_components,
        read_labels,
    )

    base = tempfile.mkdtemp(prefix="cc_inc_")
    feed, store, ckpt = f"{base}/feed", f"{base}/store", f"{base}/ckpt"
    pairs = _part_pairs(spark, sf_dir)
    for i in range(3):
        pairs.filter((F.col("src") + F.col("dst")) % 3 == i).write.mode(
            "overwrite"
        ).parquet(f"{feed}/chunk={i}")
    q = incremental_components(spark, feed, store, ckpt, max_files_per_trigger=1)
    q.awaitTermination()
    labels = read_labels(spark, store)
    return (
        _part_nodes(spark, sf_dir)
        .join(labels, "id", "left")
        .select("id", F.coalesce("component", F.col("id")).alias("component"))
    )


def _q_pagerank_weighted(spark, sf_dir):
    """Weighted directed PageRank: contributions proportional to edge
    weight (out-degree = sum of weights).  Edges = even-sum part pairs
    with deterministic weight 1+(src+dst)%5; dense over part_nodes so
    isolated parts exercise the dangling + teleport terms."""
    from graphblas_algorithms_spark.operators.pagerank import pagerank

    e = (
        _part_pairs(spark, sf_dir)
        .filter((F.col("src") + F.col("dst")) % 2 == 0)
        .select(
            "src",
            "dst",
            (1 + (F.col("src") + F.col("dst")) % 5).cast("double").alias("weight"),
        )
    )
    G = DiGraph(e, _part_nodes(spark, sf_dir), dedup=False)
    r = pagerank(G, alpha=0.85, fixed_iters=PR_ITERS)
    return r.select("id", F.round("rank", 6).alias("rank"))


def _q_pagerank_personalized(spark, sf_dir):
    """Personalized PageRank with the teleport vector supplied as a
    DataFrame (the scale-correct form — an O(n) vector can't live in a
    driver dict at 10^12 nodes): p ∝ 1 + id%7 over the cust-supp nodes,
    L1-normalized by the kernel; dangling mass follows p."""
    from graphblas_algorithms_spark.operators.pagerank import pagerank

    G = _cust_supp_graph(spark, sf_dir)
    p = G.nodes.select("id", (1 + F.col("id") % 7).cast("double").alias("value"))
    r = pagerank(G, alpha=0.85, personalization=p, fixed_iters=PR_ITERS)
    return r.select("id", F.round("rank", 6).alias("rank"))


def _q_spam_mass(spark, sf_dir):
    """TrustRank spam mass (operators/pagerank.py::spam_mass): trusted
    seeds = the 4 lowest customer ids (the multi-seed PPR convention);
    two fixed-iteration PageRank trajectories share the folded edges,
    spam_mass = clamp((rank - trusted_rank)/rank).  Oracle: two unrolled
    PR phases + the same clamp arithmetic."""
    from graphblas_algorithms_spark.operators.pagerank import spam_mass

    G = _cust_supp_graph(spark, sf_dir)
    trusted = G.nodes.orderBy("id").limit(4).select(
        "id", F.lit(1.0).alias("weight")
    )
    out = spam_mass(G, trusted, fixed_iters=PR_ITERS)
    return out.select(
        "id",
        F.round("rank", 6).alias("rank"),
        F.round("trusted_rank", 6).alias("trusted_rank"),
        F.round("spam_mass", 6).alias("spam_mass"),
    )


def _q_pagerank_incremental(spark, sf_dir):
    """Incremental PageRank maintenance (streaming/pagerank.py), made
    value-hash-deterministic by pinning the superstep count per epoch:
    epoch 0 converges the 2/3 bulk split of the cust-supp edges from
    uniform (INC_PR_ITERS[0] supersteps), epoch 1 warm-restarts over the
    FULL edge set from the epoch-0 snapshot (INC_PR_ITERS[1]).  Exercises
    pagerank_epoch directly — the same function the streaming sink calls
    per micro-batch (epoch ORDER matters for PageRank, so the driver query
    pins it; stream-order delivery is pytest-gated in
    test_streaming_pagerank.py).  Oracle: the identical two-phase protocol
    unrolled in SQL (_sql_pagerank_incremental)."""
    import tempfile

    from graphblas_algorithms_spark.streaming.pagerank import pagerank_epoch

    k0, k1 = INC_PR_ITERS
    store = tempfile.mkdtemp(prefix="pr_inc_")
    e = _cust_supp_edges(spark, sf_dir)
    split = (F.col("src") + F.col("dst")) % 3
    e.filter(split != 0).write.mode("overwrite").parquet(f"{store}/edges/epoch=0")
    pagerank_epoch(spark, store, 0, fixed_iters=k0)
    e.filter(split == 0).write.mode("overwrite").parquet(f"{store}/edges/epoch=1")
    final = pagerank_epoch(spark, store, 1, fixed_iters=k1)
    return final.select("id", F.round("rank", 6).alias("rank"))


def _q_wcc(spark, sf_dir):
    from graphblas_algorithms_spark.operators.components import connected_components

    return connected_components(_part_digraph(spark, sf_dir))


def _q_bowtie(spark, sf_dir):
    """Bow-tie macro-structure (operators/bowtie.py): every node in one
    of CORE / IN / OUT / TUBE / TENDRIL / DISC relative to the largest
    SCC (Broder et al. 2000) — THE whole-graph summary for a web-scale
    link graph.  Deterministic: largest SCC, min-label tie-break; the
    oracle composes the SCC closure with set-algebra reachability."""
    from graphblas_algorithms_spark.operators.bowtie import bowtie_structure

    return bowtie_structure(_part_digraph(spark, sf_dir))


def _q_scc(spark, sf_dir):
    from graphblas_algorithms_spark.operators.components import (
        strongly_connected_components,
    )

    return strongly_connected_components(_part_digraph(spark, sf_dir))


def _q_labelprop(spark, sf_dir):
    from graphblas_algorithms_spark.operators.labelprop import label_propagation

    return label_propagation(
        _part_graph(spark, sf_dir), max_iter=LPA_ITERS, early_stop=False
    )


def _q_triangles_total(spark, sf_dir):
    from graphblas_algorithms_spark.operators.triangles import total_triangles

    n = total_triangles(_part_graph(spark, sf_dir))
    return spark.createDataFrame([(n,)], "n_triangles long")


def _q_triangles_incremental(spark, sf_dir):
    """PRODUCTION streaming shape: the part graph's edges arrive as 3
    parquet files processed one per micro-batch
    (streaming/triangles.py); each batch enumerates wedges touching its
    truly-new edges only (inclusion-exclusion over 1/2/3-new-edge
    triangles).  The final running total must equal one batch
    total_triangles over the full edge set — same oracle as
    graph_triangles_total."""
    import tempfile

    from graphblas_algorithms_spark.streaming.triangles import (
        incremental_triangles,
        read_state,
    )

    base = tempfile.mkdtemp(prefix="tri_inc_")
    feed, store, ckpt = f"{base}/feed", f"{base}/store", f"{base}/ckpt"
    pairs = _part_pairs(spark, sf_dir)
    for i in range(3):
        pairs.filter((F.col("src") + F.col("dst")) % 3 == i).write.mode(
            "overwrite"
        ).parquet(f"{feed}/chunk={i}")
    q = incremental_triangles(spark, feed, store, ckpt, max_files_per_trigger=1)
    q.awaitTermination()
    _, total = read_state(spark, store)
    return spark.createDataFrame([(total,)], "n_triangles long")


def _q_triangles(spark, sf_dir):
    from graphblas_algorithms_spark.operators.triangles import triangles

    return triangles(_part_graph(spark, sf_dir))


def _q_four_cliques(spark, sf_dir):
    """Per-node 4-clique counts via the degree-ordered DAG extension of
    the triangle join (kClist); the oracle replays an id-ordered
    equivalent — per-corner counts are orientation-independent."""
    from graphblas_algorithms_spark.operators.triangles import four_cliques

    return four_cliques(_part_graph(spark, sf_dir))


def _q_triangles_weighted(spark, sf_dir):
    from graphblas_algorithms_spark.operators.triangles import triangles

    G = _part_graph_weighted(spark, sf_dir)
    t = triangles(G, weighted=True)
    return t.select("id", F.round("triangles", 6).alias("tri_w"))


def _q_clustering(spark, sf_dir):
    from graphblas_algorithms_spark.operators.triangles import clustering

    c = clustering(_part_graph(spark, sf_dir))
    return c.select("id", F.round("clustering", 6).alias("clustering"))


def _q_transitivity(spark, sf_dir):
    from graphblas_algorithms_spark.operators.triangles import transitivity

    t = transitivity(_part_graph(spark, sf_dir))
    return spark.createDataFrame([(round(t, 6),)], "transitivity double")


def _q_degree_centrality(spark, sf_dir):
    from graphblas_algorithms_spark.operators.centrality import degree_centrality

    d = degree_centrality(_part_graph(spark, sf_dir))
    return d.select("id", F.round("centrality", 6).alias("centrality"))


def _q_inout_degrees(spark, sf_dir):
    G = _cust_supp_graph(spark, sf_dir)
    ind = G.get_property("in_degrees").withColumnRenamed("degree", "in_deg")
    outd = G.get_property("out_degrees").withColumnRenamed("degree", "out_deg")
    return (
        G.nodes.join(ind, "id", "left")
        .join(outd, "id", "left")
        .select(
            "id",
            F.coalesce("in_deg", F.lit(0)).alias("in_deg"),
            F.coalesce("out_deg", F.lit(0)).alias("out_deg"),
        )
    )


def _q_katz(spark, sf_dir):
    """Katz via the library operator, fixed iterations, unnormalized
    (trajectory-identical to the unrolled DuckDB oracle)."""
    from graphblas_algorithms_spark.operators.centrality import katz_centrality

    G = _cust_supp_graph(spark, sf_dir)
    x = katz_centrality(
        G, alpha=0.05, beta=1.0, fixed_iters=KATZ_ITERS, normalized=False
    )
    return x.select("id", F.round("centrality", 6).alias("katz"))


def _q_bfs(spark, sf_dir):
    from graphblas_algorithms_spark.operators.traversal import bfs_levels

    G = _part_graph(spark, sf_dir)
    src = G.nodes.agg(F.min("id").alias("m")).collect()[0]["m"]
    return bfs_levels(G, int(src))


def _q_diameter(spark, sf_dir):
    """Double-sweep diameter lower bound (Magnien-Latapy-Habib) on the
    co-purchase graph: BFS from the max-degree hub (min-id ties), then
    BFS from the farthest node found; all picks are integer-ordered
    (level DESC, id ASC) so the DuckDB recursive-CTE oracle replays the
    exact same two sweeps."""
    from graphblas_algorithms_spark.operators.diameter import double_sweep

    return double_sweep(_part_graph(spark, sf_dir))


def _q_sssp(spark, sf_dir):
    from graphblas_algorithms_spark.operators.shortest_paths import (
        bellman_ford_path_length,
    )

    G = _part_graph_weighted(spark, sf_dir)
    src = G.nodes.agg(F.min("id").alias("m")).collect()[0]["m"]
    d = bellman_ford_path_length(G, int(src), fixed_iters=SSSP_ITERS)
    return d.select("id", F.round("dist", 6).alias("dist"))


def _q_hits(spark, sf_dir):
    """HITS via the library operator, fixed iterations, unnormalized
    (trajectory-identical to the unrolled DuckDB oracle)."""
    from graphblas_algorithms_spark.operators.centrality import hits

    G = _cust_supp_graph(spark, sf_dir)
    h, a = hits(G, fixed_iters=HITS_ITERS, normalized=False)
    return (
        h.join(a, "id")
        .select("id", F.round("hub", 6).alias("hub"), F.round("authority", 6).alias("authority"))
    )


def _q_eigenvector(spark, sf_dir):
    """Eigenvector centrality via the library operator, fixed iterations
    (trajectory-identical to the unrolled DuckDB oracle)."""
    from graphblas_algorithms_spark.operators.centrality import (
        eigenvector_centrality,
    )

    G = _part_graph(spark, sf_dir)
    x = eigenvector_centrality(G, fixed_iters=EC_ITERS)
    return x.select("id", F.round("centrality", 6).alias("ec"))


def _chain_graph(spark, sf_dir) -> Graph:
    """Second operand for set ops: partkey chain p -> p+1 (canonical)."""
    p = _part_nodes(spark, sf_dir)
    e = (
        p.select(F.col("id").alias("src"), (F.col("id") + 1).alias("dst"))
        .join(p.withColumnRenamed("id", "dst"), "dst", "left_semi")
    )
    return Graph(e, p, canonicalize=False)


def _q_setops_intersection(spark, sf_dir):
    from graphblas_algorithms_spark.operators.setops import intersection

    K = intersection(_part_graph(spark, sf_dir), _chain_graph(spark, sf_dir))
    return K.edges.select("src", "dst")


def _q_setops_difference(spark, sf_dir):
    from graphblas_algorithms_spark.operators.setops import difference

    K = difference(_chain_graph(spark, sf_dir), _part_graph(spark, sf_dir))
    return K.edges.select("src", "dst")


def _q_setops_symdiff(spark, sf_dir):
    from graphblas_algorithms_spark.operators.setops import symmetric_difference

    K = symmetric_difference(_part_graph(spark, sf_dir), _chain_graph(spark, sf_dir))
    return K.edges.select("src", "dst")


def _q_bfs_parent(spark, sf_dir):
    from graphblas_algorithms_spark.operators.traversal import bfs_parent

    G = _part_graph(spark, sf_dir)
    src = G.nodes.agg(F.min("id").alias("m")).collect()[0]["m"]
    return bfs_parent(G, int(src))


def _q_bfs_multi(spark, sf_dir):
    from graphblas_algorithms_spark.operators.traversal import bfs_levels_multi

    G = _part_graph(spark, sf_dir)
    srcs = [r["id"] for r in G.nodes.orderBy("id").limit(3).collect()]
    return bfs_levels_multi(G, srcs)


def _q_ego(spark, sf_dir):
    from graphblas_algorithms_spark.operators.structure import ego_graph

    G = _part_graph(spark, sf_dir)
    src = G.nodes.agg(F.min("id").alias("m")).collect()[0]["m"]
    K = ego_graph(G, int(src), radius=2)
    return K.edges.select("src", "dst")


def _q_neighborhood_function(spark, sf_dir):
    """ANF distance-distribution sketch (operators/anf.py): estimated
    #pairs within h hops per h, over the part graph.  Fixed trajectory
    (md5-seeded masks, exactly 6 supersteps, scaled-integer ball sums),
    so the DuckDB oracle replays the identical sketch and the row VALUES
    hash-match — r4 closed the last graph-side rows-only oracle.
    Estimator ACCURACY stays pytest-gated vs exact networkx closures
    (tests/test_anf.py)."""
    from graphblas_algorithms_spark.operators.anf import neighborhood_function

    nf = neighborhood_function(
        _part_graph(spark, sf_dir), max_h=6, k=16, seed=42, stop_early=False
    )
    return spark.createDataFrame(
        [(int(p["h"]), float(p["reachable_pairs"])) for p in nf],
        "h int, reachable_pairs double",
    )


def _q_square_clustering(spark, sf_dir):
    from graphblas_algorithms_spark.operators.cluster_extra import square_clustering

    c = square_clustering(_part_graph(spark, sf_dir))
    return c.select("id", F.round("sq_clustering", 6).alias("sq_clustering"))


def _q_clustering_directed(spark, sf_dir):
    from graphblas_algorithms_spark.operators.cluster_extra import clustering_directed

    c = clustering_directed(_part_digraph(spark, sf_dir))
    return c.select("id", F.round("clustering", 6).alias("clustering"))


def _q_generalized_degree(spark, sf_dir):
    from graphblas_algorithms_spark.operators.cluster_extra import generalized_degree

    return generalized_degree(_part_graph(spark, sf_dir))


def _q_edge_support(spark, sf_dir):
    """Per-edge triangle support — the k-truss inner step (exact oracle)."""
    from graphblas_algorithms_spark.operators.ktruss import _edge_support

    return _edge_support(_part_pairs(spark, sf_dir))


def _q_effective_size(spark, sf_dir):
    """Burt's effective size (structural holes) over the co-purchase
    graph: deg - 2*tri/deg per node, one shared wedge join."""
    from graphblas_algorithms_spark.operators.structure import effective_size

    es = effective_size(_part_graph(spark, sf_dir))
    return es.select("id", F.round("effective_size", 6).alias("effective_size"))


def _q_local_bridges(spark, sf_dir):
    """Local bridges: canonical edges on no triangle (span > 2)."""
    from graphblas_algorithms_spark.operators.structure import local_bridges

    return local_bridges(_part_graph(spark, sf_dir))


def _q_ktruss(spark, sf_dir):
    """Full k-truss fixpoint.  The fixpoint is deterministic, so the DuckDB
    oracle unrolls KTRUSS_ROUNDS support-filter rounds — once the edge set
    stops changing further rounds are no-ops, so any unroll depth >= the
    actual round count yields the identical fixpoint."""
    from graphblas_algorithms_spark.operators.ktruss import k_truss

    K = k_truss(_part_graph(spark, sf_dir), 4)
    return K.edges.select("src", "dst")


def _q_kcore(spark, sf_dir):
    """k-core peel fixpoint (operators/kcore.py).  Deterministic, so the
    oracle unrolls KCORE_ROUNDS degree-filter rounds — over-unrolling is
    a no-op past the fixpoint, same reasoning as graph_ktruss."""
    from graphblas_algorithms_spark.operators.kcore import k_core

    K = k_core(_part_graph(spark, sf_dir), KCORE_K)
    return K.edges.select("src", "dst")


def _q_core_number(spark, sf_dir):
    """Coreness of every part node via the iterated neighborhood h-index
    (converges to the exact core number); oracle unrolls the same
    iteration in SQL with a ranked window per round."""
    from graphblas_algorithms_spark.operators.kcore import core_number

    return core_number(_part_graph(spark, sf_dir)).select("id", "core")


def _q_densest(spark, sf_dir):
    """2(1+eps)-approx densest subgraph via Bahmani et al. parallel
    peeling (operators/densest.py) at eps=1/10, over the part graph
    with a PLANTED 150-clique (density 74.5 vs the co-purchase graph's
    ~58 at sf0.01) — the peel must survive the clique through several
    rounds while the uniform background collapses, and the max-density
    snapshot recovers exactly the planted set.  eps is a pinned
    rational so the survive test is exact BIGINT
    (``deg * n * 10 > 22 * m``); the oracle unrolls DENSEST_ROUNDS
    peel rounds, tags every snapshot, and re-selects the best with the
    same (density DESC, round ASC) ranking."""
    from graphblas_algorithms_spark.operators.densest import densest_subgraph

    k = spark.range(1, 151).select((F.lit(1000000) + F.col("id")).alias("id"))
    cq = (
        k.alias("a")
        .join(k.alias("b"), F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("src"), F.col("b.id").alias("dst"))
    )
    edges = _part_pairs(spark, sf_dir).unionByName(cq)
    nodes = _part_nodes(spark, sf_dir).unionByName(k)
    G = Graph(edges, nodes, canonicalize=False)
    return densest_subgraph(G, eps_num=1, eps_den=10)


def _q_triad_census(spark, sf_dir):
    """Full 16-class Holland-Leinhardt triad census on the mixed
    asym/mutual part digraph (operators/triads.py — Batagelj-Mrvar
    wedge decomposition; only >=2-edge triples are enumerated, the
    012/102/003 classes are arithmetic complements)."""
    from graphblas_algorithms_spark.operators.triads import triadic_census

    return triadic_census(_part_digraph(spark, sf_dir))


def _q_onion(spark, sf_dir):
    """Onion decomposition (nx onion_layers — the k-core peel's round
    index) on the 1/7-thinned co-purchase graph (34 peel rounds + the
    isolate layer at sf0.01; the full-density graph takes 70 — thinned
    keeps the oracle unroll and driver wall small, same trick as
    graph_coloring).  The oracle unrolls the same bulk-synchronous
    rounds, chaining the monotone core bound through one-row CTEs."""
    from graphblas_algorithms_spark.classes.graph import Graph
    from graphblas_algorithms_spark.operators.kcore import onion_layers

    p = _part_pairs(spark, sf_dir).filter((F.col("src") + F.col("dst")) % 7 == 0)
    G = Graph(p, _part_nodes(spark, sf_dir), canonicalize=False)
    return onion_layers(G)


def _q_linkpred(spark, sf_dir):
    """Link prediction over the co-purchase graph: every non-edge pair at
    distance 2 with >= 15 common neighbors, scored with the full
    CN-family (jaccard / adamic-adar / resource-allocation /
    preferential-attachment).  Oracle replicates the wedge aggregation
    verbatim in SQL."""
    from graphblas_algorithms_spark.operators.linkpred import link_prediction_scores

    s = link_prediction_scores(_part_graph(spark, sf_dir), min_common=15)
    return s.select(
        "u",
        "w",
        "cn",
        F.round("jaccard", 6).alias("jaccard"),
        F.round("adamic_adar", 6).alias("adamic_adar"),
        F.round("resource_allocation", 6).alias("resource_allocation"),
        "pref_attachment",
    )


def _q_negative_sample(spark, sf_dir):
    """Deterministic negative edge sampling (k non-edges per node, md5
    draw order, dense-index candidate mapping via assign_dense_ids);
    the oracle replays the identical draws, rejections, and integer
    min-j/row_number ranking."""
    from graphblas_algorithms_spark.operators.sampling import negative_edge_sample

    G = _part_graph(spark, sf_dir)
    return negative_edge_sample(G, k=2, factor=4)


def _q_linkpred_trainset(spark, sf_dir):
    """Full link-prediction training set: canonical positives + sampled
    negatives + deterministic pair-keyed train/test split."""
    from graphblas_algorithms_spark.operators.sampling import linkpred_training_set

    G = _part_graph(spark, sf_dir)
    return linkpred_training_set(G, k=2, factor=4, holdout_rate=0.2)


def _q_khop_sample(spark, sf_dir):
    """Layer-wise GraphSAGE-style neighbor-sampled adjacency blocks
    (fanouts 3 then 2, md5-ranked per src); the oracle replays the
    per-hop row_number ranking ordered by the same md5 integers."""
    from graphblas_algorithms_spark.operators.sampling import khop_neighbor_sample

    G = _part_graph(spark, sf_dir)
    return khop_neighbor_sample(G, fanouts=(3, 2))


def _q_chunk_documents(spark, sf_dir):
    """Sliding-window document chunking (128-token windows, stride 96):
    pure integer scan-side explode, zero shuffles."""
    from graphblas_algorithms_spark.pipeline.curation import chunk_documents

    return chunk_documents(
        _read(spark, sf_dir, "documents"), chunk_tokens=128, stride=96
    )


def _q_feature_prop(spark, sf_dir):
    """SGC-style feature smoothing: 2 rounds of self-loop neighborhood
    mean over 64-dim embeddings mapped onto the part graph (vec_id =
    id % 500).  Long-format (id, pos, val) so the aggregation is a plain
    codegen groupBy at any dimension; dyadic_bits=20 carries the sums as
    exact BIGINTs on the 2^-20 grid (the ANF contract) so the values are
    bit-identical across run orders, core counts, and engines — no
    rounding needed; the oracle replays both rounds as materialized
    scaled-integer sum/deg CTEs."""
    from graphblas_algorithms_spark.operators.features import propagate_features

    G = _part_graph(spark, sf_dir)
    emb = _read(spark, sf_dir, "embeddings")
    feats = (
        _part_nodes(spark, sf_dir)
        .join(emb, F.col("id") % 500 == F.col("vec_id"))
        .select("id", F.col("embedding").alias("vec"))
    )
    return propagate_features(G, feats, iters=2, dyadic_bits=20)


def _q_closeness(spark, sf_dir):
    """Exact Wasserman-Faust closeness centrality: (r/tot) * (r/(n-1))
    where r counts the OTHER nodes reachable from v and tot sums their
    distances — the all-pairs batched-BFS form (chunked (k x n) matrix
    frontiers); the oracle replays the full all-sources BFS as one
    bounded recursive CTE.  At web scale the pivot `harmonic_centrality`
    estimator is the sanctioned path (closeness does not decompose over
    a source sample; see operators/centrality.py)."""
    from graphblas_algorithms_spark.operators.centrality import closeness_centrality

    G = _part_graph(spark, sf_dir)
    c = closeness_centrality(G)
    return c.select("id", F.round("closeness", 6).alias("closeness"))


def _q_harmonic(spark, sf_dir):
    """Sampled harmonic centrality: sum of 1/d(s, v) over the 48
    lowest-id pivot sources — the pivot form is the estimator that
    scales (one (k x n) matrix-frontier BFS); the oracle replays the
    same pivot BFS as a recursive CTE."""
    from graphblas_algorithms_spark.operators.centrality import harmonic_centrality

    G = _part_graph(spark, sf_dir)
    srcs = [r["id"] for r in G.nodes.orderBy("id").limit(48).collect()]
    h = harmonic_centrality(G, sources=srcs)
    return h.select("id", F.round("harmonic", 6).alias("harmonic"))


def _q_betweenness(spark, sf_dir):
    """Pivot-sampled Brandes betweenness (16 lowest-id sources,
    unnormalized subset semantics = nx.betweenness_centrality_subset);
    the oracle unrolls the forward sigma BFS and backward dependency
    accumulation level-by-level in SQL."""
    from graphblas_algorithms_spark.operators.betweenness import betweenness_centrality

    G = _part_graph(spark, sf_dir)
    srcs = [r["id"] for r in G.nodes.orderBy("id").limit(16).collect()]
    b = betweenness_centrality(G, sources=srcs, normalized=False)
    return b.select("id", F.round("betweenness", 6).alias("betweenness"))


def _q_edge_betweenness(spark, sf_dir):
    """Pivot-sampled EDGE betweenness (same 16 pivots as
    graph_betweenness, unnormalized subset semantics; Girvan-Newman
    edge scores); oracle = the shared unrolled Brandes chain + per-level
    edge-credit aggregation."""
    from graphblas_algorithms_spark.operators.betweenness import (
        edge_betweenness_centrality,
    )

    G = _part_graph(spark, sf_dir)
    srcs = [r["id"] for r in G.nodes.orderBy("id").limit(16).collect()]
    b = edge_betweenness_centrality(G, sources=srcs, normalized=False)
    return b.select("src", "dst", F.round("betweenness", 6).alias("betweenness"))


def _q_walks(spark, sf_dir):
    """Deterministic random-walk corpus (DeepWalk input): 16 lowest-id
    starts x 2 walks x 8 hops, next step = md5-argmin over neighbors —
    the engine-portable hash makes the oracle replay the same corpus."""
    from graphblas_algorithms_spark.operators.walks import random_walks

    G = _part_graph(spark, sf_dir)
    starts = [r["id"] for r in G.nodes.orderBy("id").limit(16).collect()]
    return random_walks(G, walk_length=8, num_walks=2, starts=starts)


def _q_walks_weighted(spark, sf_dir):
    """Weighted walk corpus: Efraimidis-Spirakis arg_max(ln(u)/w) hops
    over the deterministic weighted part graph — the oracle replays the
    identical hash-uniform + log-key arithmetic."""
    from graphblas_algorithms_spark.operators.walks import random_walks

    G = _part_graph_weighted(spark, sf_dir)
    starts = [r["id"] for r in G.nodes.orderBy("id").limit(16).collect()]
    return random_walks(G, walk_length=8, num_walks=2, starts=starts, weighted=True)


def _q_node2vec(spark, sf_dir):
    """Second-order node2vec walk corpus (p=2, q=0.5 — DFS-leaning):
    16 lowest-id starts x 2 walks x 6 hops; the oracle replays the
    alpha-biased ES draw including the prev-adjacency LEFT-join test."""
    from graphblas_algorithms_spark.operators.walks import node2vec_walks

    G = _part_graph(spark, sf_dir)
    starts = [r["id"] for r in G.nodes.orderBy("id").limit(16).collect()]
    return node2vec_walks(G, walk_length=6, p=2.0, q=0.5, num_walks=2, starts=starts)


def _q_node2vec_rejection(spark, sf_dir):
    """The r5 KnightKing-style rejection-sampling node2vec (the scale
    path: 29.8 vs 103.6 s/hop at 28M edges — operators/walks.py
    method='rejection'): T=4 batched first-order proposals per
    (walk, node), prev-adjacency probed for the PROPOSED nodes only,
    md5-uniform acceptance at alpha/alpha_max, exact-ES fallback for
    all-rejected states.  Fully deterministic, so the oracle replays
    proposals, acceptance, and fallback verbatim."""
    from graphblas_algorithms_spark.operators.walks import node2vec_walks

    G = _part_graph(spark, sf_dir)
    starts = [r["id"] for r in G.nodes.orderBy("id").limit(16).collect()]
    return node2vec_walks(
        G, walk_length=6, p=2.0, q=0.5, num_walks=2, starts=starts,
        method="rejection", attempts=4,
    )


def _q_mis(spark, sf_dir):
    """Luby maximal independent set with md5 priorities — deterministic
    in (graph, seed); oracle unrolls the same rounds (over-unrolled past
    the fixpoint; empty rounds are no-ops)."""
    from graphblas_algorithms_spark.operators.mis import maximal_independent_set

    return maximal_independent_set(_part_graph(spark, sf_dir))


def _q_wl(spark, sf_dir):
    """Weisfeiler-Lehman node hashes at depth 2 — the structural-role
    fingerprint layer (operators/wl.py); oracle replays the md5 +
    commutative-fold arithmetic round by round."""
    from graphblas_algorithms_spark.operators.wl import wl_node_hashes

    return wl_node_hashes(_part_graph(spark, sf_dir), iterations=2)


def _q_fiedler(spark, sf_dir):
    """Fiedler vector (deflated power iteration, fixed 40 steps) — the
    spectral bisection layer (operators/spectral.py); oracle unrolls the
    same mean-deflate / B·x / normalize arithmetic per step."""
    from graphblas_algorithms_spark.operators.spectral import fiedler_vector

    return fiedler_vector(_part_graph(spark, sf_dir), iterations=40)


def _q_topo(spark, sf_dir):
    """Topological generations (Kahn peel, operators/dag.py) over the
    bucket-oriented part DAG: each canonical co-purchase pair is
    directed from the lower (id % 8) bucket to the higher, so the graph
    is acyclic with <= 8 generations at EVERY scale factor; layer =
    longest path from any source.  Oracle: recursive longest-path CTE."""
    from graphblas_algorithms_spark.classes.graph import DiGraph
    from graphblas_algorithms_spark.operators.dag import topological_generations

    p = _part_pairs(spark, sf_dir)
    fwd = p.filter((F.col("src") % 8) < (F.col("dst") % 8)).select("src", "dst")
    bwd = p.filter((F.col("dst") % 8) < (F.col("src") % 8)).select(
        F.col("dst").alias("src"), F.col("src").alias("dst")
    )
    G = DiGraph(fwd.unionByName(bwd), _part_nodes(spark, sf_dir), dedup=False)
    return topological_generations(G)


def _q_hyperball(spark, sf_dir):
    """HyperBall sketch centralities (operators/anf.py::hyperball) —
    4 fixed ball-growing rounds, k=16 md5-seeded FM masks, on the part
    co-purchase graph.  Approximate BY DESIGN yet value-oracled: the
    sketch trajectory is a pure function of (graph, h, k, seed) and
    every float op is correctly-rounded-reproducible, so the DuckDB
    replay hashes identically."""
    from graphblas_algorithms_spark.operators.anf import hyperball

    return hyperball(_part_graph(spark, sf_dir), h=4, k=16, seed=42)


def _thinned_part_graph(spark, sf_dir) -> Graph:
    """1/23-thinned co-purchase graph ((src*31+dst)%23==0): sparse
    enough to have real cut structure (72 bridges, 26 components at
    sf0.01) while staying deterministic and SQL-rebuildable."""
    e = _part_pairs(spark, sf_dir).filter(
        (F.col("src") * 31 + F.col("dst")) % 23 == 0
    )
    return Graph(e, _part_nodes(spark, sf_dir), canonicalize=False)


def _q_bridges(spark, sf_dir):
    """Cycle-space-sampling bridges (operators/bridges.py) on the
    thinned part graph; the oracle rebuilds the identical closed-form
    BFS forest (min-id roots, min-neighbor parents) and replays the
    md5 XOR certificate in SQL."""
    from graphblas_algorithms_spark.operators.bridges import bridges

    return bridges(_thinned_part_graph(spark, sf_dir))


def _q_2ecc(spark, sf_dir):
    """2-edge-connected component labeling = engine CC over the thinned
    graph minus its bridges."""
    from graphblas_algorithms_spark.operators.bridges import two_edge_components

    return two_edge_components(_thinned_part_graph(spark, sf_dir))


def _q_butterflies(spark, sf_dir):
    """Per-customer butterfly counts (2x2 bicliques) on the bipartite
    customer->supplier graph — operators/bipartite.py; one codegree
    self-join through the cheaper wedge side, no 4-cycle enumeration."""
    from graphblas_algorithms_spark.operators.bipartite import butterfly_counts

    return butterfly_counts(_cust_supp_edges(spark, sf_dir), side="src")


def _q_landmarks(spark, sf_dir):
    """Landmark distance oracle (operators/landmarks.py): top-8-degree
    landmarks, batched multi-source BFS table, then triangle-inequality
    bounds for a deterministic query batch u in 1..40, v = (u*37 % n)+1
    over the part co-purchase graph (low diameter: the BFS precompute
    is a handful of levels; the disconnected/NULL path is covered by
    tests/test_landmarks.py on sparse fixtures)."""
    from graphblas_algorithms_spark.operators.landmarks import (
        approx_distances,
        landmark_distance_table,
        select_landmarks,
    )

    G = _part_graph(spark, sf_dir)
    n = G.n
    pairs = (
        G.nodes.filter(F.col("id") <= 40)
        .select(
            F.col("id").alias("u"),
            ((F.col("id") * 37) % F.lit(n) + 1).alias("v"),
        )
    )
    tbl = landmark_distance_table(G, select_landmarks(G, 8))
    return approx_distances(tbl, pairs)


def _q_degree_hist(spark, sf_dir):
    """Degree histogram + survival fraction (power-law tail view) on
    the part graph — operators/metrics.py::degree_histogram."""
    from graphblas_algorithms_spark.operators.metrics import degree_histogram

    return degree_histogram(_part_graph(spark, sf_dir))


def _temporal_edges(spark, sf_dir):
    """Followed-by temporal edges from the events table (shared by the
    driver query and the plan-regression test)."""
    ev = _read(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("t"),
    )
    # range-join bucketing: joining on event_type alone is 4 hot keys ->
    # a quadratic hash join; adding the 10-minute time bucket to the key
    # bounds each probe to the 2 buckets that can satisfy dt <= 600s
    # (the standard interval-join decomposition a 100 TB run needs)
    win = 600_000_000
    a = ev.select(
        F.col("user_id").alias("ua"),
        F.col("event_type").alias("et"),
        F.col("t").alias("ta"),
        F.explode(
            F.array(F.floor(F.col("t") / win), F.floor(F.col("t") / win) + 1)
        ).alias("jb"),
    )
    b = ev.select(
        F.col("user_id").alias("ub"),
        F.col("event_type").alias("et"),
        F.col("t").alias("tb"),
        F.floor(F.col("t") / win).alias("jb"),
    )
    edges = (
        a.join(b, ["et", "jb"])
        .filter(
            (F.col("tb") > F.col("ta"))
            & (F.col("tb") <= F.col("ta") + win)
            & (F.col("ua") != F.col("ub"))
        )
        .select(F.col("ua").alias("src"), F.col("ub").alias("dst"), F.col("tb").alias("t"))
        .distinct()
    )
    return edges


def _q_temporal_reach(spark, sf_dir):
    """Time-respecting reachability (operators/temporal.py) over the
    events followed-by graph: edge (a -> b, t_b) when b's event of the
    same type follows a's within 10 minutes; earliest arrival from
    users 0..3 within 6 hops.  Static BFS overcounts here — an edge
    firing before the information arrives can't carry it."""
    from graphblas_algorithms_spark.operators.temporal import temporal_reachability

    return temporal_reachability(
        _temporal_edges(spark, sf_dir), [0, 1, 2, 3], max_hops=6
    )


def _q_trussness(spark, sf_dir):
    """Full truss decomposition (operators/ktruss.py::truss_decomposition)
    on the 1/7-thinned part graph: per-edge trussness via 10 fixed
    h-index rounds over the triangle membership table (converges in 8
    at sf0.01; extra rounds are no-ops).  Oracle replays the identical
    rounds with id-ordered triangle enumeration."""
    from graphblas_algorithms_spark.operators.ktruss import truss_decomposition

    e = _part_pairs(spark, sf_dir).filter(
        (F.col("src") * 31 + F.col("dst")) % 7 == 0
    )
    G = Graph(e, _part_nodes(spark, sf_dir), canonicalize=False)
    return truss_decomposition(G, fixed_rounds=10)


def _q_condensation(spark, sf_dir):
    """SCC condensation layers (operators/dag.py::condensation_layers)
    on the part digraph: each SCC (min-id label) placed at its longest-
    chain depth in the quotient DAG — the macro build-order of a cyclic
    dependency graph.  Runs on the 1/13-thinned digraph (the full part
    digraph is one giant SCC — a 1-row condensation; the thinned one
    has 137 SCCs at sf0.01).  Oracle: pairwise-reach SCC labels +
    recursive longest-path over the quotient edges."""
    from graphblas_algorithms_spark.classes.graph import DiGraph
    from graphblas_algorithms_spark.operators.dag import condensation_layers

    p = _part_pairs(spark, sf_dir).filter((F.col("src") * 31 + F.col("dst")) % 13 == 0)
    fwd = p.filter((F.col("src") + F.col("dst")) % 2 == 0).select("src", "dst")
    bwd = p.filter((F.col("src") + F.col("dst")) % 3 == 0).select(
        F.col("dst").alias("src"), F.col("src").alias("dst")
    )
    G = DiGraph(fwd.unionByName(bwd), _part_nodes(spark, sf_dir), dedup=True)
    return condensation_layers(G)


def _q_eulerian(spark, sf_dir):
    """Eulerian summary (degree parity + component count) on the
    thinned part graph — nx is_eulerian/has_eulerian_path semantics."""
    from graphblas_algorithms_spark.operators.structure import eulerian_summary

    return eulerian_summary(_thinned_part_graph(spark, sf_dir))


def _q_coarsen(spark, sf_dir):
    """One multilevel-coarsening step: contract the maximal matching,
    merge parallel edges into integer weights."""
    from graphblas_algorithms_spark.operators.matching import coarsen_graph

    coarse, _ = coarsen_graph(_part_graph(spark, sf_dir))
    return coarse


def _q_matching(spark, sf_dir):
    """Dominant-edge maximal matching with unique md5 edge priorities —
    deterministic in (graph, seed); oracle unrolls the same rounds
    (9 needed at sf0.01, unrolled to 14; empty rounds are no-ops)."""
    from graphblas_algorithms_spark.operators.matching import maximal_matching

    return maximal_matching(_part_graph(spark, sf_dir))


def _q_vertex_cover(spark, sf_dir):
    """2-approx min vertex cover = endpoints of the dominant-edge maximal
    matching (Gavril/Yannakakis); oracle reuses the matching unroll with
    a distinct-endpoints final select."""
    from graphblas_algorithms_spark.operators.matching import min_vertex_cover_2approx

    return min_vertex_cover_2approx(_part_graph(spark, sf_dir))


def _q_coloring(spark, sf_dir):
    """Speculative greedy coloring with conflict resolution on the
    1/7-thinned co-purchase graph (11 rounds measured; the full-density
    graph takes 37 — thinned keeps the oracle unroll and the driver
    wall small while exercising the identical kernel).  Oracle unrolls
    the same rounds with DuckDB list functions for the mex."""
    from graphblas_algorithms_spark.classes.graph import Graph
    from graphblas_algorithms_spark.operators.mis import greedy_color

    p = _part_pairs(spark, sf_dir).filter((F.col("src") + F.col("dst")) % 7 == 0)
    G = Graph(p, _part_nodes(spark, sf_dir), canonicalize=False)
    return greedy_color(G)


def _q_isolates(spark, sf_dir):
    from graphblas_algorithms_spark.operators.structure import isolates

    return isolates(_part_graph(spark, sf_dir))


def _q_smetric(spark, sf_dir):
    from graphblas_algorithms_spark.operators.structure import s_metric

    v = s_metric(_part_graph(spark, sf_dir))
    return spark.createDataFrame([(round(v, 6),)], "s_metric double")


def _q_reciprocity(spark, sf_dir):
    from graphblas_algorithms_spark.operators.structure import overall_reciprocity

    v = overall_reciprocity(_part_digraph(spark, sf_dir))
    return spark.createDataFrame([(round(v, 6),)], "reciprocity double")


def _q_conductance(spark, sf_dir):
    from graphblas_algorithms_spark.operators.boundary import conductance, cut_size, volume

    G = _part_graph(spark, sf_dir)
    S = G.nodes.filter(F.col("id") % 4 == 0)
    c = conductance(G, S)
    cs = cut_size(G, S)
    vol = volume(G, S)
    return spark.createDataFrame(
        [(int(cs), int(vol), round(c, 6))], "cut_size long, volume long, conductance double"
    )


def _q_node_boundary(spark, sf_dir):
    from graphblas_algorithms_spark.operators.boundary import node_boundary

    G = _part_graph(spark, sf_dir)
    S = G.nodes.filter(F.col("id") % 10 == 0)
    return node_boundary(G, S)


def _q_laplacian(spark, sf_dir):
    from graphblas_algorithms_spark.operators.linalg import laplacian_matrix

    L = laplacian_matrix(_part_graph(spark, sf_dir))
    return L.select("row", "col", F.round("value", 6).alias("value"))


# ---- pipeline queries -----------------------------------------------------


def _q_token_counts(spark, sf_dir):
    from graphblas_algorithms_spark.pipeline.text import token_counts

    return token_counts(_read(spark, sf_dir, "documents"))


def _q_lm_score(spark, sf_dir):
    """Corpus-trained add-one word-bigram LM score per document (the
    KenLM-style quality-filter proxy); oracle rebuilds the identical
    counts with list_zip bigrams and replays the log arithmetic."""
    from graphblas_algorithms_spark.pipeline.text import lm_scores

    s = lm_scores(_read(spark, sf_dir, "documents"))
    return s.select(
        "doc_id",
        F.round("lm_logprob", 6).alias("lm_logprob"),
        F.round("lm_per_token", 6).alias("lm_per_token"),
    )


def _q_fingerprints(spark, sf_dir):
    from graphblas_algorithms_spark.pipeline.text import fingerprints

    return fingerprints(_read(spark, sf_dir, "documents"))


def _q_exact_dups(spark, sf_dir):
    from graphblas_algorithms_spark.pipeline.dedup import exact_duplicates

    return exact_duplicates(_read(spark, sf_dir, "documents"))


def _q_quality(spark, sf_dir):
    from graphblas_algorithms_spark.pipeline.text import quality_scores

    return quality_scores(_read(spark, sf_dir, "documents"))


def _q_repetition(spark, sf_dir):
    from graphblas_algorithms_spark.pipeline.text import repetition_scores

    return repetition_scores(_read(spark, sf_dir, "documents"))


def _q_source_mix(spark, sf_dir):
    from graphblas_algorithms_spark.pipeline.text import source_mix

    return source_mix(_read(spark, sf_dir, "documents"))


def _q_domain_cap(spark, sf_dir):
    """Per-source cap at 20 docs, longest-first: the histogram-threshold
    plan (corpus never shuffles; only the tie band at the threshold
    length is ranked)."""
    from graphblas_algorithms_spark.pipeline.curation import domain_cap

    capped = domain_cap(_read(spark, sf_dir, "documents"), cap=20)
    return capped.select("doc_id", "source", "n_chars")


def _q_common_ngrams(spark, sf_dir):
    from graphblas_algorithms_spark.pipeline.text import common_ngrams

    return common_ngrams(_read(spark, sf_dir, "documents"), n=3, min_docs=2, top=100)


def _q_pmi_bigrams(spark, sf_dir):
    """Top-100 adjacent-word collocations by PMI (min pair count 5):
    dim-sized vocabulary joins after map-side-combinable count aggs."""
    from graphblas_algorithms_spark.pipeline.text import pmi_bigrams

    return pmi_bigrams(_read(spark, sf_dir, "documents"), min_count=5, top=100)


def _q_doc_entropy(spark, sf_dir):
    """Per-document unigram Shannon entropy — the distributional
    gibberish/repetition quality signal."""
    from graphblas_algorithms_spark.pipeline.text import doc_entropy

    return doc_entropy(_read(spark, sf_dir, "documents"))


def _q_span_dedup(spark, sf_dir):
    """CCNet-style span-level dedup: strip globally-repeated 8-token
    windows (boilerplate) and reassemble the cleaned documents."""
    from graphblas_algorithms_spark.pipeline.text import strip_repeated_spans

    return strip_repeated_spans(
        _read(spark, sf_dir, "documents"), span_tokens=8, min_docs=2
    )


def _q_tfidf_topterms(spark, sf_dir):
    from graphblas_algorithms_spark.pipeline.text import tfidf_top_terms

    return tfidf_top_terms(_read(spark, sf_dir, "documents"), k=5)


def _q_decontaminate(spark, sf_dir):
    from pyspark.sql import functions as F

    from graphblas_algorithms_spark.pipeline.curation import decontaminate

    docs = _read(spark, sf_dir, "documents")
    # held-out "benchmark": the first-12-word prefix of every 101st doc
    # (derived from the same table so the DuckDB oracle can reproduce it
    # exactly; a real run would read an external eval-set table here)
    words = F.split(
        F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " "), " "
    )
    bench = docs.filter(F.col("doc_id") % 101 == 0).select(
        F.concat_ws(" ", F.slice(words, 1, 12)).alias("text")
    )
    return decontaminate(docs, bench, k=3, min_hits=2)


def _q_token_budget_sample(spark, sf_dir):
    from graphblas_algorithms_spark.pipeline.curation import token_budget_sample

    return token_budget_sample(_read(spark, sf_dir, "documents"), budget_tokens=700)


def _q_shard_manifest(spark, sf_dir):
    """Token-balanced training-shard assignment (docs never split),
    reported as the per-shard (n_docs, tokens) manifest."""
    from graphblas_algorithms_spark.pipeline.curation import shard_manifest

    return shard_manifest(_read(spark, sf_dir, "documents"), shard_tokens=2000)


def _q_pack_sequences(spark, sf_dir):
    """Concat-and-chop sequence packing to 256-token training windows:
    deterministic shuffle order, distributed prefix-sum offsets (bucketed
    two-phase scan, no global single-partition window), integer-div
    window ids.  Oracle replays the identical md5-uniform order and
    cumsum as one DuckDB window."""
    from graphblas_algorithms_spark.pipeline.curation import pack_sequences

    return pack_sequences(_read(spark, sf_dir, "documents"), seq_len=256)


def _q_weighted_sample(spark, sf_dir):
    """Efraimidis-Spirakis A-Res weighted sample without replacement:
    key = u^(1/ws_tokens), top-100 — planned as TakeOrderedAndProject
    (per-partition local top-k, no global sort)."""
    from graphblas_algorithms_spark.pipeline.curation import weighted_sample

    return weighted_sample(_read(spark, sf_dir, "documents"), k=100)


def _q_langid(spark, sf_dir):
    from graphblas_algorithms_spark.pipeline.text import language_id

    return language_id(_read(spark, sf_dir, "documents"))


def _q_clean_corpus(spark, sf_dir):
    from graphblas_algorithms_spark.pipeline.text import clean_corpus

    return clean_corpus(_read(spark, sf_dir, "documents"), min_quality=0.65, langs=("en",))


def _q_ngram_jaccard(spark, sf_dir):
    from graphblas_algorithms_spark.pipeline.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(_read(spark, sf_dir, "documents"), k=3, threshold=0.8)


def _q_minhash_neardup(spark, sf_dir):
    from graphblas_algorithms_spark.pipeline.dedup import minhash_near_duplicates

    return minhash_near_duplicates(
        _read(spark, sf_dir, "documents"), k=3, n_hashes=12, bands=4, threshold=0.7
    )


def _q_dedup_incremental(spark, sf_dir):
    """Snapshot-refresh dedup: documents split deterministically into a
    base corpus and an incoming slice; incoming docs near-duplicating a
    base doc (LSH candidates, true-Jaccard verified) are reported."""
    from graphblas_algorithms_spark.pipeline.curation import _uniform
    from graphblas_algorithms_spark.pipeline.dedup import incremental_near_duplicates

    docs = _read(spark, sf_dir, "documents")
    u = _uniform(F.col("doc_id"), "inc")
    return incremental_near_duplicates(
        docs.filter(u < 0.5), docs.filter(u >= 0.5), k=3, n_hashes=12, bands=4, threshold=0.7
    )


def _q_dedup_clusters(spark, sf_dir):
    from graphblas_algorithms_spark.pipeline.dedup import near_duplicate_clusters

    return near_duplicate_clusters(
        _read(spark, sf_dir, "documents"), k=3, n_hashes=12, bands=4, threshold=0.7
    )


def _q_simhash(spark, sf_dir):
    from graphblas_algorithms_spark.pipeline.dedup import simhash

    return simhash(_read(spark, sf_dir, "documents"), bits=64)


def _q_embedding_neardup(spark, sf_dir):
    from graphblas_algorithms_spark.pipeline.dedup import embedding_near_duplicates

    return embedding_near_duplicates(_read(spark, sf_dir, "embeddings"), threshold=0.35)


def _q_embedding_lsh(spark, sf_dir):
    from graphblas_algorithms_spark.pipeline.dedup import embedding_lsh_near_duplicates

    return embedding_lsh_near_duplicates(
        _read(spark, sf_dir, "embeddings"), threshold=0.35, n_planes=16, bands=4
    )


def _q_semdedup(spark, sf_dir):
    """SemDeDup-style cluster-then-dedup over the embeddings table
    (pipeline/dedup.py:semantic_dedup): nearest-of-16-seed-centroids
    bucketing, then within-cell round-6 cosine >= 0.35 drops toward the
    min-id representative.  refine_iters=0 keeps every comparison a
    vector-vector cosine, so the oracle replays the whole pipeline."""
    from graphblas_algorithms_spark.pipeline.dedup import semantic_dedup

    return semantic_dedup(
        _read(spark, sf_dir, "embeddings"), m=16, threshold=0.35, refine_iters=0
    )


def _q_ann_topk(spark, sf_dir):
    from graphblas_algorithms_spark.pipeline.similarity import cosine_topk

    return cosine_topk(_read(spark, sf_dir, "embeddings"), k=10)


def _q_ann_ivf(spark, sf_dir):
    """IVF ANN — VALUE-oracled since r5: the centroid refinement's
    per-dimension means are dyadic scaled-integer exact (similarity.py
    deterministic_centroids), so the seeded-centroid -> one-Lloyd-step ->
    assign/probe -> per-cell exact-cosine pipeline is a deterministic
    trajectory the oracle replays in pure SQL (seeds, refine, rank).

    Operating point m=16 / n_probe=8 per the measured sf0.1 recall grid
    (scripts/ivf_recall.py, BENCH/BASELINE.md round-3 recall section):
    recall@10 = 0.77 at 10.7x the exact scan's speed on these isotropic
    synthetic embeddings; n_probe=4 gave 0.52 at nearly the same wall."""
    from graphblas_algorithms_spark.pipeline.similarity import ivf_topk

    return ivf_topk(_read(spark, sf_dir, "embeddings"), k=10, m=16, n_probe=8)


def _q_ann_ivf_pandas(spark, sf_dir):
    """IVF ANN, per-cell scoring via cogrouped applyInPandas — VALUE-
    oracled since r5: the cell matmul runs on 2^-26 dyadic-snapped
    int64 vectors, so every similarity is one exact integer (no float
    summation order anywhere — the reason this path was rows-only) and
    _SQL_ANN_IVF_PANDAS replays centroids/assignment/probes plus the
    same BIGINT dot products in pure SQL.  pytest still proves parity
    with ivf_topk rank-for-rank at the 2e-6 snap tolerance."""
    from graphblas_algorithms_spark.pipeline.similarity import ivf_topk_pandas

    return ivf_topk_pandas(_read(spark, sf_dir, "embeddings"), k=10, m=16, n_probe=8)


def _q_ann_ivf_pq(spark, sf_dir):
    """IVF + product quantization with exact re-rank — VALUE-oracled
    since r5: dyadic_bits=20 carries the whole ADC (snapped queries x
    snapped codebook, integer LUT sums) in int64, so candidate selection
    is bit-identical across runs/engines.  The oracle replays centroids/
    assignment/probes in SQL (dyadic Lloyd means, shared with
    pipe_ann_ivf), pins the TRAINED codebook from
    fixtures/pq_codebook_sf001.json (Lloyd's numpy means are a tiny
    local model, not SQL-expressible; drift is guarded by
    test_pq_codebook_matches_fixture), and replays encode + ADC + both
    top-40 stages + the exact-cosine re-rank independently.  pytest
    gates recall >= 0.85 on clustered data and exactness of reported
    cosines."""
    from graphblas_algorithms_spark.pipeline.similarity import ivf_pq_topk

    return ivf_pq_topk(
        _read(spark, sf_dir, "embeddings"),
        k=10,
        m=16,
        n_probe=8,
        m_sub=8,
        k_codes=256,
        dyadic_bits=20,
    )


def _q_events_windowed(spark, sf_dir):
    from graphblas_algorithms_spark.streaming.events import windowed_counts_batch

    return windowed_counts_batch(_read(spark, sf_dir, "events"), minutes=60)


def _q_events_sessions(spark, sf_dir):
    from graphblas_algorithms_spark.streaming.events import sessionize_batch

    return sessionize_batch(_read(spark, sf_dir, "events"), gap_minutes=30)


def _q_events_funnel(spark, sf_dir):
    """Per-user ordered funnel (first view < first click < first
    purchase) with JSON ``props`` extraction — the semi-structured
    column no other query exercises; one user_id groupBy, JSON parsed
    scan-side."""
    from graphblas_algorithms_spark.pipeline.funnel import funnel_conversion

    return funnel_conversion(_read(spark, sf_dir, "events"))


def _q_events_windowed_closed(spark, sf_dir):
    """PRODUCTION streaming shape: append-mode + watermark + file sink
    (bounded state — window state is dropped once the watermark closes
    it).  On the finite input the emitted set is exactly the windows
    whose end <= max(ts) - watermark, which the SQL oracle reproduces."""
    import tempfile

    from graphblas_algorithms_spark.streaming.events import (
        windowed_counts_stream_append,
    )

    out = tempfile.mkdtemp(prefix="evt_win_closed_")
    q = windowed_counts_stream_append(
        spark, f"{sf_dir}/events.parquet", out, minutes=60, watermark="2 hours"
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.read.parquet(f"{out}/data")


def _q_events_sessions_closed(spark, sf_dir):
    """PRODUCTION streaming shape: applyInPandasWithState sessionizer
    (state = one open session per user, O(#users) not O(stream)).  On
    the finite input it emits every gap-closed session; each user's
    trailing open session stays in state — the SQL oracle is batch
    sessionization minus each user's last session."""
    import uuid

    from graphblas_algorithms_spark.streaming.events import sessionize_stateful

    name = f"sess_closed_{uuid.uuid4().hex[:8]}"
    q = sessionize_stateful(
        spark, f"{sf_dir}/events.parquet", gap_minutes=30, query_name=name
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)


def _q_olap_pricing(spark, sf_dir):
    """TPC-H Q1-style scan+agg (engine breadth check).

    Money columns are DECIMAL(15,2) in the TPC-H spec, so the sums run
    in exact cents-integer arithmetic (round-half-up x100 recovers the
    exact decimal; BIGINT SUM is order-independent — float SUM over
    non-dyadic 2-decimal values is the r4 hash-flip class).  disc_price
    scales discount by 100 too (units of 10^-4)."""
    li = _read(spark, sf_dir, "lineitem")
    cents = lambda c: F.floor(F.col(c) * 100 + F.lit(0.5)).cast("long")
    qint = F.floor(F.col("l_quantity") + F.lit(0.5)).cast("long")
    d100 = F.floor(F.col("l_discount") * 100 + F.lit(0.5)).cast("long")
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qint).cast("double").alias("sum_qty"),
            (F.sum(cents("l_extendedprice")) / F.lit(100.0)).alias("sum_base_price"),
            (
                F.sum(cents("l_extendedprice") * (F.lit(100) - d100))
                / F.lit(10000.0)
            ).alias("sum_disc_price"),
            F.round(F.sum(qint).cast("double") / F.count(F.lit(1)), 6).alias("avg_qty"),
            F.count("*").alias("count_order"),
        )
    )


def _q_olap_top_customers(spark, sf_dir):
    from pyspark.sql import Window

    o = _read(spark, sf_dir, "orders")
    c = _read(spark, sf_dir, "customer")
    n = _read(spark, sf_dir, "nation")
    agg = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .groupBy("n_name", "c_custkey")
        # exact cents-integer revenue: the rank window below orders by it,
        # so float sum-order wobble could silently reorder near-ties
        .agg(
            (
                F.sum(F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long"))
                / F.lit(100.0)
            ).alias("revenue")
        )
    )
    w = Window.partitionBy("n_name").orderBy(F.desc("revenue"), F.asc("c_custkey"))
    return (
        agg.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("n_name", "c_custkey", "revenue", F.col("rk").cast("long").alias("rk"))
    )


def _q_keyed_pagerank(spark, sf_dir):
    """nxapi shell (api.KeyedGraph) end-to-end: string-keyed edges in,
    (key, rank) out — renumber once, run the id-typed kernel, join keys
    back only at the output boundary (reference nxapi key-typed surface)."""
    from graphblas_algorithms_spark.api import KeyedGraph

    o = _read(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = _read(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    raw = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("src_key"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst_key"),
        )
        .distinct()
    )
    kg = KeyedGraph(raw, "src_key", "dst_key", directed=True)
    # few iterations on purpose: this row value-checks the key-translation
    # boundary (renumber in / join keys back out), not convergence — the
    # id-typed kernel itself is checked by graph_pagerank at PR_ITERS
    r = kg.pagerank(alpha=0.85, fixed_iters=KEYED_PR_ITERS)
    return r.select("key", F.round("rank", 6).alias("rank"))


KEYED_PR_ITERS = 6

MM_N_ASSETS = 240
MM_FEATURE_DIM = 8


def _q_multimodal_features(spark, sf_dir):
    """Multimodal surface end-to-end: binary payload -> mapInPandas decode
    -> exploded (asset_id, kind, dim_idx, v).  Since r5 the image and
    audio paths do REAL byte-level work: the payloads are genuine P6 PPM
    images / RIFF-WAVE PCM16 audio built from deterministic pixel/sample
    formulas, and the registered decoders parse the actual containers
    (pure-numpy header walk + frombuffer) before reducing to exact
    integer-aggregate features; only video keeps the sha256 stand-in
    (container demux needs ffmpeg).  The oracle re-derives the features
    from the same formulas in SQL.  Input is the deterministic synthetic
    asset table, independent of sf_dir."""
    from graphblas_algorithms_spark.pipeline.multimodal import (
        extract_features,
        register_builtin_decoders,
        synth_assets,
    )

    register_builtin_decoders(dim=MM_FEATURE_DIM)
    assets = synth_assets(spark, n=MM_N_ASSETS)
    feats = extract_features(assets, dim=MM_FEATURE_DIM)
    return feats.select(
        "asset_id", "kind", F.posexplode("feature").alias("dim_idx", "v")
    ).select(
        "asset_id",
        "kind",
        F.col("dim_idx").cast("long").alias("dim_idx"),
        F.round("v", 6).alias("v"),
    )


def _q_frame_sample(spark, sf_dir):
    """Video frame-sampling plan (pure Catalyst sequence+explode) over the
    deterministic synthetic asset table."""
    from graphblas_algorithms_spark.pipeline.multimodal import (
        sample_frames,
        synth_assets,
    )

    assets = synth_assets(spark, n=MM_N_ASSETS)
    return sample_frames(assets, every=5).select(
        "asset_id", F.col("frame_idx").cast("long").alias("frame_idx")
    )


def _q_assortativity(spark, sf_dir):
    """Degree assortativity + density of the co-purchase graph
    (operators/metrics.py; networkx degree_assortativity_coefficient)."""
    from graphblas_algorithms_spark.operators.metrics import (
        degree_assortativity_coefficient,
        density,
    )

    G = _part_graph(spark, sf_dir)
    r = degree_assortativity_coefficient(G)
    d = density(G)
    return spark.createDataFrame(
        [(round(r, 6), round(d, 9))], "assortativity double, density double"
    )


def _q_avg_neighbor_degree(spark, sf_dir):
    from graphblas_algorithms_spark.operators.metrics import average_neighbor_degree

    out = average_neighbor_degree(_part_graph(spark, sf_dir))
    return out.select("id", F.round("avg_nbr_deg", 6).alias("avg_nbr_deg"))


def _q_modularity(spark, sf_dir):
    """Per-community modularity contributions for a deterministic md5-hash
    8-way partition (the partition is engine-portable: conv(md5) == DuckDB
    ::UBIGINT on a 15-hex prefix)."""
    from graphblas_algorithms_spark.operators.metrics import modularity_by_community

    G = _part_graph(spark, sf_dir)
    lab = G.nodes.select(
        "id",
        (
            F.conv(F.substring(F.md5(F.col("id").cast("string")), 1, 15), 16, 10)
            .cast("long")
            % 8
        ).alias("community"),
    )
    out = modularity_by_community(G, lab)
    return out.select(
        "community",
        F.col("intra_edges").cast("long").alias("intra_edges"),
        F.col("degree_sum").cast("long").alias("degree_sum"),
        F.round("contrib", 6).alias("contrib"),
    )


def _q_louvain(spark, sf_dir):
    """Deterministic parallel Louvain (operators/louvain.py) on the
    co-purchase graph: 4 half-activation move rounds x 2 contraction
    levels, exact-BIGINT gain argmax — bit-replicated by the unrolled
    DuckDB SQL in _sql_louvain()."""
    from graphblas_algorithms_spark.operators.louvain import louvain_communities

    G = _part_graph(spark, sf_dir)
    return louvain_communities(G, rounds=LOUVAIN_ROUNDS, levels=LOUVAIN_LEVELS).select(
        "id", "community"
    )


def _q_rich_club(spark, sf_dir):
    from graphblas_algorithms_spark.operators.metrics import rich_club_coefficient

    out = rich_club_coefficient(_part_graph(spark, sf_dir))
    return out.select("k", "n_nodes", "n_edges", F.round("phi", 6).alias("phi"))


# ---- r5 grouped long-tail queries ----------------------------------------
# VERDICT r4 "What's missing #2": the pytest-only [x] groups get driver
# rows via grouped queries emitting labeled scalars / tagged rows, so
# EVERY SURVEY §2.2 component has a driver attestation.


def _min_part_id(spark, sf_dir) -> int:
    return int(
        _part_nodes(spark, sf_dir).agg(F.min("id").alias("m")).collect()[0]["m"]
    )


def _level_dag(spark, sf_dir) -> DiGraph:
    """Bounded-depth DAG from the co-purchase pairs: orient every pair
    whose endpoints have distinct levels (lvl = id % 8) from lower to
    higher level — acyclic by construction, longest path <= 7, so the
    ancestor BFS is a bounded superstep loop and the oracle a bounded
    recursive CTE."""
    p = _part_pairs(spark, sf_dir)
    lo_hi = p.filter(F.col("src") % 8 < F.col("dst") % 8).select("src", "dst")
    hi_lo = p.filter(F.col("dst") % 8 < F.col("src") % 8).select(
        F.col("dst").alias("src"), F.col("src").alias("dst")
    )
    return DiGraph(
        lo_hi.unionByName(hi_lo), _part_nodes(spark, sf_dir), dedup=False
    )


def _tournament8(spark, sf_dir) -> DiGraph:
    """Tournament on the 8 lowest part ids: pair a<b oriented a->b iff
    (a+b)%2==0 else b->a — exactly one arc per pair by construction."""
    t = _part_nodes(spark, sf_dir).orderBy("id").limit(8)
    a = t.select(F.col("id").alias("a"))
    b = t.select(F.col("id").alias("b"))
    pairs = a.crossJoin(b).filter(F.col("a") < F.col("b"))
    e = pairs.select(
        F.when((F.col("a") + F.col("b")) % 2 == 0, F.col("a")).otherwise(F.col("b")).alias("src"),
        F.when((F.col("a") + F.col("b")) % 2 == 0, F.col("b")).otherwise(F.col("a")).alias("dst"),
    )
    return DiGraph(e, t, dedup=False)


def _q_structure_suite(spark, sf_dir):
    """Structure predicates as labeled scalars (metric, value) — the
    reference's misc surface (simple_paths.py, efficiency_measures.py,
    structuralholes.py mutual_weight, lowest_common_ancestors.py,
    tournament.py, dominating.py, triads.py is_triad, isomorphism
    profiles), each exercised on a deterministic fixture and replayed
    by the oracle in pure SQL."""
    from graphblas_algorithms_spark.operators.structure import (
        could_be_isomorphic,
        efficiency,
        is_dominating_set,
        is_simple_path,
        is_tournament,
        is_triad,
        lowest_common_ancestor,
        mutual_weight,
        score_sequence,
        tournament_matrix,
    )

    G = _part_graph(spark, sf_dir)
    Gw = _part_graph_weighted(spark, sf_dir)
    u = _min_part_id(spark, sf_dir)
    rows: list[tuple[str, float]] = []
    rows.append(("efficiency_u_v5", float(efficiency(G, u, u + 5))))
    rows.append(("mutual_weight_u_v1", float(mutual_weight(Gw, u, u + 1))))
    rows.append(
        ("is_simple_path_3", 1.0 if is_simple_path(G, [u, u + 1, u + 2]) else 0.0)
    )
    dag = _level_dag(spark, sf_dir)
    hi = dag.nodes.agg(F.max("id").alias("m")).collect()[0]["m"]
    lca_u = int(hi)
    lca_v = int(hi) - 1
    lca = lowest_common_ancestor(dag, lca_u, lca_v, default=-1)
    rows.append(("lca_hi_pair", float(lca if lca is not None else -1)))
    S = G.nodes.filter(F.col("id") % 10 == 0)
    rows.append(("is_dominating_mod10", 1.0 if is_dominating_set(G, S) else 0.0))
    T = _tournament8(spark, sf_dir)
    rows.append(("is_tournament8", 1.0 if is_tournament(T) else 0.0))
    seq = score_sequence(T)
    rows.append(("tourn_score_sumsq", float(sum(d * d for d in seq))))
    rows.append(("tourn_matrix_nnz", float(tournament_matrix(T).count())))
    tri_ids = [u, u + 1, u + 2]
    tri_nodes = spark.createDataFrame([(int(i),) for i in tri_ids], "id long")
    dE = _part_digraph(spark, sf_dir).edges
    tri_e = dE.join(
        tri_nodes.withColumnRenamed("id", "src"), "src", "left_semi"
    ).join(tri_nodes.withColumnRenamed("id", "dst"), "dst", "left_semi")
    rows.append(
        ("is_triad_low3", 1.0 if is_triad(DiGraph(tri_e, tri_nodes, dedup=False)) else 0.0)
    )
    rows.append(("iso_self", 1.0 if could_be_isomorphic(G, G) else 0.0))
    rows.append(
        ("iso_chain", 1.0 if could_be_isomorphic(G, _chain_graph(spark, sf_dir)) else 0.0)
    )
    return spark.createDataFrame(rows, "metric string, value double")


def _q_setops_rest(spark, sf_dir):
    """The setops not yet driver-attested (binary.py:16-155, unary.py:
    8-18, digraph.py:604-612) as (op, n_nodes, n_edges, checksum) rows:
    union / disjoint_union / compose (weighted right-bias branch) /
    full_join / complement / reverse / to_undirected, each built by the
    operator and reduced to counts the oracle reproduces arithmetically."""
    from graphblas_algorithms_spark.operators.setops import (
        complement,
        compose,
        disjoint_union,
        full_join,
        reverse,
        to_undirected,
        union,
    )

    G = _part_graph(spark, sf_dir)
    Gw = _part_graph_weighted(spark, sf_dir)
    C = _chain_graph(spark, sf_dir)
    D = _part_digraph(spark, sf_dir)
    rows = []
    U = union(G, C)
    rows.append(("union", U.n, U.m, 0.0))
    DJ = disjoint_union(G, C)
    rows.append(("disjoint_union", DJ.n, DJ.m, 0.0))
    CO = compose(Gw, C)  # right-biased weight merge: chain edges win at 1.0
    w_sum = float(
        CO.edges.agg(F.sum("weight").alias("s")).collect()[0]["s"] or 0.0
    )
    rows.append(("compose_w", CO.n, CO.m, w_sum))
    FJ = full_join(G, C)
    rows.append(("full_join", FJ.n, FJ.m, 0.0))
    CP = complement(C)
    rows.append(("complement_chain", CP.n, CP.m, 0.0))
    RV = reverse(D)
    rows.append(("reverse", RV.n, RV.m, 0.0))
    TU = to_undirected(D)
    rows.append(("to_undirected", TU.n, TU.m, 0.0))
    return spark.createDataFrame(
        rows, "op string, n_nodes long, n_edges long, checksum double"
    )


def _q_bf_path(spark, sf_dir):
    """Bellman-Ford with path reconstruction (weighted.py:268-284 parity;
    shortest_paths.py:250): (id, dist, parent) from the lowest part id
    over the weighted co-purchase graph.  The per-round min(struct(dist,
    parent)) argmin and the frontier-delta trajectory are deterministic,
    so the oracle replays the rounds verbatim (no-op rounds past
    convergence are exact; integer weights keep every dist double
    exact)."""
    from graphblas_algorithms_spark.operators.shortest_paths import bellman_ford_path

    Gw = _part_graph_weighted(spark, sf_dir)
    u = _min_part_id(spark, sf_dir)
    return bellman_ford_path(Gw, u)


def _q_paths_suite(spark, sf_dir):
    """Shortest-path scalars (metric, value): negative_edge_cycle on the
    all-positive weighted digraph (False in one round) AND on a crafted
    3-node negative cycle from the lowest part ids (True);
    bidirectional_shortest_path_length + has_path for a reachable pair;
    has_path to an isolated part (False).  weighted.py:311-348,
    unweighted.py:32-64, generic.py:7-12 parity."""
    from graphblas_algorithms_spark.operators.shortest_paths import (
        bidirectional_shortest_path_length,
        has_path,
        negative_edge_cycle,
    )

    Dw = DiGraph(
        _part_digraph(spark, sf_dir).edges.select(
            "src",
            "dst",
            (1 + (F.col("src") + F.col("dst")) % 5).cast("double").alias("weight"),
        ),
        _part_nodes(spark, sf_dir),
        dedup=False,
    )
    u = _min_part_id(spark, sf_dir)
    rows = []
    rows.append(("neg_cycle_positive", 1.0 if negative_edge_cycle(Dw) else 0.0))
    a, b, c = u, u + 1, u + 2
    neg = DiGraph(
        spark.createDataFrame(
            [(a, b, 1.0), (b, c, -2.0), (c, a, -1.0)],
            "src long, dst long, weight double",
        ),
        dedup=False,
    )
    rows.append(("neg_cycle_crafted", 1.0 if negative_edge_cycle(neg) else 0.0))
    G = _part_graph(spark, sf_dir)
    d = bidirectional_shortest_path_length(G, u, u + 5)
    rows.append(("bidir_u_v5", float(d if d is not None else -1)))
    rows.append(("has_path_u_v5", 1.0 if has_path(G, u, u + 5) else 0.0))
    iso = (
        _part_nodes(spark, sf_dir)
        .join(
            _part_pairs(spark, sf_dir)
            .select(F.col("src").alias("id"))
            .unionByName(_part_pairs(spark, sf_dir).select(F.col("dst").alias("id")))
            .distinct(),
            "id",
            "left_anti",
        )
        .agg(F.min("id").alias("m"))
        .collect()[0]["m"]
    )
    if iso is None:
        rows.append(("has_path_u_isolated", -1.0))
    else:
        rows.append(
            ("has_path_u_isolated", 1.0 if has_path(G, u, int(iso)) else 0.0)
        )
    return spark.createDataFrame(rows, "metric string, value double")


def _q_floyd_warshall(spark, sf_dir):
    """floyd_warshall (dense.py:9-111 parity, tiny-n guarded) on the
    weighted co-purchase subgraph induced by the 60 lowest part ids;
    oracle is 7 unrolled min-plus squaring rounds (covers 2^7 hops —
    far past the subgraph's weighted hop diameter; integer weights keep
    mins exact)."""
    from graphblas_algorithms_spark.operators.shortest_paths import floyd_warshall

    u = _min_part_id(spark, sf_dir)
    hi = u + 60
    nodes = _part_nodes(spark, sf_dir).filter(F.col("id") < hi)
    e = (
        _part_pairs(spark, sf_dir)
        .filter((F.col("src") < hi) & (F.col("dst") < hi))
        .select(
            "src",
            "dst",
            (1 + (F.col("src") + F.col("dst")) % 5).cast("double").alias("weight"),
        )
    )
    Gs = Graph(e, nodes, canonicalize=False)
    return floyd_warshall(Gs)


def _q_traversal_rest(spark, sf_dir):
    """bfs_layers / descendants_at_distance / descendants / ancestors
    (breadth_first_search.py:10-45, dag.py:6-17) as tagged (metric, id)
    rows: layer_k membership from the lowest part id on the undirected
    graph; 2-step frontier, reachable set, and co-reachable set on the
    part digraph."""
    from graphblas_algorithms_spark.operators.traversal import (
        ancestors,
        bfs_layers,
        descendants,
        descendants_at_distance,
    )

    G = _part_graph(spark, sf_dir)
    D = _part_digraph(spark, sf_dir)
    u = _min_part_id(spark, sf_dir)
    layers = bfs_layers(G, u)
    parts = []
    for k, layer in enumerate(layers):
        parts.append(layer.select(F.lit(f"layer_{k}").alias("metric"), "id"))
    parts.append(
        descendants_at_distance(D, u, 2).select(
            F.lit("desc_at_2").alias("metric"), "id"
        )
    )
    parts.append(descendants(D, u).select(F.lit("descendants").alias("metric"), "id"))
    parts.append(ancestors(D, u).select(F.lit("ancestors").alias("metric"), "id"))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _q_cuts_suite(spark, sf_dir):
    """The cut-arithmetic surface not yet driver-attested (cuts.py:41-??):
    normalized_cut_size, edge/mixing/node/boundary expansion on
    S = {id % 4 == 0}, plus cut_size with an explicit T = {id % 4 == 1}
    — labeled scalars; every value is a ratio of the oracle's own
    integer counts."""
    from graphblas_algorithms_spark.operators.boundary import (
        boundary_expansion,
        cut_size,
        edge_expansion,
        mixing_expansion,
        node_expansion,
        normalized_cut_size,
    )

    G = _part_graph(spark, sf_dir)
    S = G.nodes.filter(F.col("id") % 4 == 0)
    T = G.nodes.filter(F.col("id") % 4 == 1)
    rows = [
        ("normalized_cut", float(normalized_cut_size(G, S))),
        ("edge_expansion", float(edge_expansion(G, S))),
        ("mixing_expansion", float(mixing_expansion(G, S))),
        ("node_expansion", float(node_expansion(G, S))),
        ("boundary_expansion", float(boundary_expansion(G, S))),
        ("cut_size_S_T", float(cut_size(G, S, T))),
    ]
    return spark.createDataFrame(rows, "metric string, value double")


def _q_google_matrix(spark, sf_dir):
    """google_matrix (pagerank_alg.py:104-162 parity; tiny-n guarded
    dense form) on the co-purchase subgraph induced by the 100 lowest
    part ids — every entry is a closed-form scan-side expression
    (alpha*S + dangling + teleport), no accumulation, so raw doubles
    are engine-exact."""
    from graphblas_algorithms_spark.operators.linalg import google_matrix

    u = _min_part_id(spark, sf_dir)
    hi = u + 100
    nodes = _part_nodes(spark, sf_dir).filter(F.col("id") < hi)
    e = _part_pairs(spark, sf_dir).filter(
        (F.col("src") < hi) & (F.col("dst") < hi)
    )
    Gs = Graph(e, nodes, canonicalize=False)
    return google_matrix(Gs, alpha=0.85)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # Registry order IS the driver's attestation window (first 50 rows).
    # r5 window (ROTATION.md): the 3 queries changed this round (the two
    # r4 hash-fails, now dyadic-deterministic, + the dyadic ppr_push),
    # the 8 NEW grouped long-tail queries, the 33 stale/never-checked
    # entries the r4 plan deferred, and 6 north-rule kernel re-attests.
    return {
        # -- changed this round (must re-attest) --
        "graph_feature_prop": _q_feature_prop,
        "events_funnel": _q_events_funnel,
        "graph_ppr_push": _q_ppr_push,
        # -- new r5 grouped long-tail queries --
        "graph_structure_suite": _q_structure_suite,
        "graph_setops_rest": _q_setops_rest,
        "graph_bf_path": _q_bf_path,
        "graph_paths_suite": _q_paths_suite,
        "graph_floyd_warshall": _q_floyd_warshall,
        "graph_traversal_rest": _q_traversal_rest,
        "graph_cuts_suite": _q_cuts_suite,
        "graph_google_matrix": _q_google_matrix,
        # -- r5 rotation: stale (r1/r2) + never-checked --
        "graph_ktruss": _q_ktruss,
        "graph_walks_weighted": _q_walks_weighted,
        "graph_coarsen": _q_coarsen,
        "graph_vertex_cover": _q_vertex_cover,
        "graph_isolates": _q_isolates,
        "graph_smetric": _q_smetric,
        "graph_reciprocity": _q_reciprocity,
        "graph_conductance": _q_conductance,
        "graph_node_boundary": _q_node_boundary,
        "graph_laplacian": _q_laplacian,
        "graph_avg_neighbor_degree": _q_avg_neighbor_degree,
        "graph_rich_club": _q_rich_club,
        "pipe_token_counts": _q_token_counts,
        "pipe_fingerprints": _q_fingerprints,
        "pipe_exact_dups": _q_exact_dups,
        "pipe_quality": _q_quality,
        "pipe_langid": _q_langid,
        "pipe_clean_corpus": _q_clean_corpus,
        "pipe_ngram_jaccard": _q_ngram_jaccard,
        "pipe_minhash_neardup": _q_minhash_neardup,
        "pipe_simhash": _q_simhash,
        "pipe_embedding_neardup": _q_embedding_neardup,
        "pipe_embedding_lsh": _q_embedding_lsh,
        "pipe_ann_topk": _q_ann_topk,
        "pipe_ann_ivf": _q_ann_ivf,
        "pipe_ann_ivf_pandas": _q_ann_ivf_pandas,
        "pipe_ann_ivf_pq": _q_ann_ivf_pq,
        "events_windowed": _q_events_windowed,
        "events_sessions": _q_events_sessions,
        "olap_pricing": _q_olap_pricing,
        "olap_top_customers": _q_olap_top_customers,
        "pipe_multimodal_features": _q_multimodal_features,
        "pipe_frame_sample": _q_frame_sample,
        # -- north-rule kernel re-attests (freshness) --
        "graph_pagerank": _q_pagerank,
        "graph_components": _q_components,
        "graph_scc": _q_scc,
        "graph_labelprop": _q_labelprop,
        # changed late in r5 (common-neighbor triangle arithmetic —
        # values byte-identical, but the implementation must re-attest;
        # displaces the graph_triangles freshness re-attest, whose whole
        # 7-query family is r3-green)
        "graph_triad_census": _q_triad_census,
        # -- new r5 scale path (first attestation) --
        "graph_node2vec_rejection": _q_node2vec_rejection,
        # -- window boundary (entries below keep their r3/r4 green rows) --
        "graph_bfs": _q_bfs,
        "graph_bowtie": _q_bowtie,
        "graph_effective_size": _q_effective_size,
        "graph_local_bridges": _q_local_bridges,
        "graph_trussness": _q_trussness,
        "graph_kcore": _q_kcore,
        "graph_core_number": _q_core_number,
        "graph_densest": _q_densest,
        "graph_diameter": _q_diameter,
        "graph_triangles": _q_triangles,
        "graph_onion": _q_onion,
        "graph_linkpred": _q_linkpred,
        "graph_negative_sample": _q_negative_sample,
        "graph_linkpred_trainset": _q_linkpred_trainset,
        "graph_khop_sample": _q_khop_sample,
        "graph_closeness": _q_closeness,
        "graph_harmonic": _q_harmonic,
        "graph_betweenness": _q_betweenness,
        "graph_edge_betweenness": _q_edge_betweenness,
        "graph_walks": _q_walks,
        "graph_node2vec": _q_node2vec,
        "graph_mis": _q_mis,
        "graph_matching": _q_matching,
        "graph_coloring": _q_coloring,
        "graph_assortativity": _q_assortativity,
        "graph_modularity": _q_modularity,
        "pipe_lm_score": _q_lm_score,
        "pipe_repetition": _q_repetition,
        "pipe_source_mix": _q_source_mix,
        "pipe_domain_cap": _q_domain_cap,
        "pipe_common_ngrams": _q_common_ngrams,
        "pipe_tfidf_topterms": _q_tfidf_topterms,
        "pipe_pmi_bigrams": _q_pmi_bigrams,
        "pipe_doc_entropy": _q_doc_entropy,
        "pipe_span_dedup": _q_span_dedup,
        "pipe_decontaminate": _q_decontaminate,
        "pipe_token_budget_sample": _q_token_budget_sample,
        "pipe_pack_sequences": _q_pack_sequences,
        "pipe_shard_manifest": _q_shard_manifest,
        "pipe_weighted_sample": _q_weighted_sample,
        "pipe_chunk_documents": _q_chunk_documents,
        "pipe_dedup_incremental": _q_dedup_incremental,
        "pipe_dedup_clusters": _q_dedup_clusters,
        "pipe_semdedup": _q_semdedup,
        "events_windowed_closed": _q_events_windowed_closed,
        "events_sessions_closed": _q_events_sessions_closed,
        "graph_keyed_pagerank": _q_keyed_pagerank,
        "graph_neighborhood_function": _q_neighborhood_function,
        "graph_ppr_multi": _q_ppr_multi,
        "graph_pagerank_weighted": _q_pagerank_weighted,
        "graph_pagerank_personalized": _q_pagerank_personalized,
        "graph_spam_mass": _q_spam_mass,
        "graph_pagerank_incremental": _q_pagerank_incremental,
        "graph_components_star": _q_components_star,
        "graph_components_incremental": _q_components_incremental,
        "graph_wcc": _q_wcc,
        "graph_wl": _q_wl,
        "graph_fiedler": _q_fiedler,
        "graph_topo_generations": _q_topo,
        "graph_hyperball": _q_hyperball,
        "graph_bridges": _q_bridges,
        "graph_2ecc": _q_2ecc,
        "graph_eulerian": _q_eulerian,
        "graph_condensation_layers": _q_condensation,
        "graph_degree_hist": _q_degree_hist,
        "events_temporal_reach": _q_temporal_reach,
        "graph_butterflies": _q_butterflies,
        "graph_landmarks": _q_landmarks,
        "graph_louvain": _q_louvain,
        "graph_triangles_total": _q_triangles_total,
        "graph_triangles_incremental": _q_triangles_incremental,
        "graph_four_cliques": _q_four_cliques,
        "graph_triangles_weighted": _q_triangles_weighted,
        "graph_clustering": _q_clustering,
        "graph_transitivity": _q_transitivity,
        "graph_degree_centrality": _q_degree_centrality,
        "graph_inout_degrees": _q_inout_degrees,
        "graph_katz": _q_katz,
        "graph_sssp": _q_sssp,
        "graph_hits": _q_hits,
        "graph_eigenvector": _q_eigenvector,
        "graph_setops_intersection": _q_setops_intersection,
        "graph_setops_difference": _q_setops_difference,
        "graph_setops_symdiff": _q_setops_symdiff,
        "graph_bfs_parent": _q_bfs_parent,
        "graph_bfs_multi": _q_bfs_multi,
        "graph_ego": _q_ego,
        "graph_square_clustering": _q_square_clustering,
        "graph_clustering_directed": _q_clustering_directed,
        "graph_generalized_degree": _q_generalized_degree,
        "graph_edge_support": _q_edge_support,
    }


# ---------------------------------------------------------------------------
# oracle SQL (DuckDB)
# ---------------------------------------------------------------------------


def _sql_pr_phase(
    edges: str,
    nodes: str,
    tag: str,
    iters: int,
    x0_body: str,
    alpha: float = 0.85,
    weighted: bool = False,
    pers: str | None = None,
) -> str:
    """CTE fragment (leading comma included) unrolling ``iters`` PageRank
    supersteps over <edges>(src,dst[,w]) / <nodes>(id): emits
    ``outdeg_{tag}``, ``nn_{tag}``, ``{tag}0`` (= ``x0_body``) and
    ``{tag}1..{tag}N``, each iterate as (id, r).  Composable — the
    incremental oracle chains two phases (bulk from uniform, then warm
    restart over the grown graph).  ``weighted`` reads edge weight ``w``
    (out-degree = sum of weights, contributions weight-proportional);
    ``pers`` names a (id, p) CTE of L1-normalized teleport weights that
    replaces the uniform 1/n in BOTH the teleport and the
    dangling-redistribution terms (dangling=None kernel semantics)."""
    od = "sum(w)" if weighted else "count(*)"
    contrib = "p.r * e.w / od.c" if weighted else "p.r / od.c"
    if pers is None:
        tele = f"(1-{alpha})/nn.cnt"
        dang = f"{alpha} * dm.mass / nn.cnt"
        pers_join = ""
    else:
        tele = f"(1-{alpha}) * coalesce(pp.p, 0)"
        dang = f"{alpha} * dm.mass * coalesce(pp.p, 0)"
        pers_join = f"\n  LEFT JOIN {pers} pp ON pp.id = no.id"
    parts = [
        f""",
outdeg_{tag} AS MATERIALIZED (SELECT src, {od} AS c FROM {edges} GROUP BY src),
nn_{tag} AS MATERIALIZED (SELECT count(*)::DOUBLE AS cnt FROM {nodes}),
{tag}0 AS MATERIALIZED ({x0_body})""",
    ]
    for k in range(1, iters + 1):
        parts.append(
            f""",
{tag}{k} AS MATERIALIZED (
  SELECT no.id AS id,
         {tele}
         + {alpha} * coalesce(c.s, 0)
         + {dang} AS r
  FROM {nodes} no
  CROSS JOIN nn_{tag} nn
  CROSS JOIN (SELECT coalesce(sum(p.r), 0) AS mass
              FROM {tag}{k-1} p LEFT JOIN outdeg_{tag} od ON p.id = od.src
              WHERE od.src IS NULL) dm{pers_join}
  LEFT JOIN (SELECT e.dst AS id, sum({contrib}) AS s
             FROM {tag}{k-1} p
             JOIN {edges} e ON p.id = e.src
             JOIN outdeg_{tag} od ON od.src = e.src
             GROUP BY e.dst) c ON c.id = no.id
)"""
        )
    return "".join(parts)


def _sql_pagerank_unrolled(
    prelude: str, edges: str, nodes: str, out_cols: str, iters: int | None = None
) -> str:
    """Unrolled fixed-iteration PageRank over <edges>(src,dst) /
    <nodes>(id) CTEs defined by ``prelude`` — shared by the id-typed and
    the string-keyed (nxapi shell) oracle variants."""
    iters = iters or PR_ITERS
    x0 = f"SELECT id, 1.0/nn.cnt AS r FROM {nodes}, nn_x nn"
    return (
        "WITH "
        + prelude.strip().rstrip(",").strip()
        + _sql_pr_phase(edges, nodes, "x", iters, x0)
        + f"\nSELECT {out_cols} FROM x{iters}"
    )


def _sql_pagerank() -> str:
    return _sql_pagerank_unrolled(
        _SQL_CUST_SUPP, "cs_edges", "cs_nodes", "id, round(r, 6) AS rank"
    )


def _sql_ppr_multi(n_seeds: int = 4, iters: int | None = None, alpha: float = 0.85) -> str:
    """Multi-seed PPR unrolled with a seed dimension (mirrors
    operators/ppr.py): per seed, teleport and dangling mass concentrate
    on the seed; state is (seed, id, r)."""
    iters = iters or PR_ITERS
    parts = [
        "WITH " + _SQL_CUST_SUPP.strip().rstrip(",").strip(),
        f""",
sd AS MATERIALIZED (SELECT id AS seed FROM cs_nodes ORDER BY id LIMIT {n_seeds}),
outdeg_q AS MATERIALIZED (SELECT src, count(*) AS c FROM cs_edges GROUP BY src),
nn_q AS MATERIALIZED (SELECT count(*)::DOUBLE AS cnt FROM cs_nodes),
y0 AS MATERIALIZED (
  SELECT s.seed, n.id, 1.0 / nn.cnt AS r FROM cs_nodes n CROSS JOIN sd s CROSS JOIN nn_q nn
)""",
    ]
    for k in range(1, iters + 1):
        parts.append(
            f""",
y{k} AS MATERIALIZED (
  SELECT s.seed, no.id,
         (1 - {alpha}) * (CASE WHEN no.id = s.seed THEN 1.0 ELSE 0.0 END)
         + coalesce(c.s, 0)
         + {alpha} * coalesce(dm.mass, 0)
           * (CASE WHEN no.id = s.seed THEN 1.0 ELSE 0.0 END) AS r
  FROM cs_nodes no
  CROSS JOIN sd s
  LEFT JOIN (SELECT p.seed, coalesce(sum(p.r), 0) AS mass
             FROM y{k - 1} p LEFT JOIN outdeg_q od ON p.id = od.src
             WHERE od.src IS NULL GROUP BY p.seed) dm ON dm.seed = s.seed
  LEFT JOIN (SELECT p.seed, e.dst AS id, sum({alpha} * p.r / od.c) AS s
             FROM y{k - 1} p
             JOIN cs_edges e ON p.id = e.src
             JOIN outdeg_q od ON od.src = e.src
             GROUP BY p.seed, e.dst) c ON c.seed = s.seed AND c.id = no.id
)"""
        )
    parts.append(f"\nSELECT seed, id, round(r, 6) AS rank FROM y{iters}")
    return "".join(parts)


def _sql_pagerank_weighted() -> str:
    """Weight-proportional contributions: out-"degree" = sum of edge
    weights, each neighbor receives r * w/sum_w (pagerank weighted
    branch; reference pagerank_alg.py S = A.reduce_rowwise() over
    weights)."""
    prelude = (
        _SQL_PART.strip().rstrip(",").strip()
        + """,
we AS (
  SELECT src, dst, (1 + (src + dst) % 5)::DOUBLE AS w
  FROM part_pairs WHERE (src + dst) % 2 = 0
)
"""
    )
    x0 = "SELECT id, 1.0/nn.cnt AS r FROM part_nodes, nn_x nn"
    return (
        "WITH "
        + prelude.strip()
        + _sql_pr_phase("we", "part_nodes", "x", PR_ITERS, x0, weighted=True)
        + f"\nSELECT id, round(r, 6) AS rank FROM x{PR_ITERS}"
    )


def _sql_pagerank_personalized() -> str:
    """Non-uniform teleport: p ∝ 1 + id%7, L1-normalized; dangling mass
    redistributes by the same p (kernel dangling=None semantics,
    reference pagerank_alg.py p / dangling_weights)."""
    prelude = (
        _SQL_CUST_SUPP.strip().rstrip(",").strip()
        + """,
p0 AS (SELECT id, (1 + id % 7)::DOUBLE AS praw FROM cs_nodes),
pers AS (SELECT id, praw / (SELECT sum(praw) FROM p0) AS p FROM p0)
"""
    )
    x0 = "SELECT id, 1.0/nn.cnt AS r FROM cs_nodes, nn_x nn"
    return (
        "WITH "
        + prelude.strip()
        + _sql_pr_phase("cs_edges", "cs_nodes", "x", PR_ITERS, x0, pers="pers")
        + f"\nSELECT id, round(r, 6) AS rank FROM x{PR_ITERS}"
    )


def _sql_spam_mass() -> str:
    """Two unrolled PR phases (uniform x, trusted-teleport y) over the
    same cs_edges, composed exactly like the kernel's two runs."""
    prelude = (
        _SQL_CUST_SUPP.strip().rstrip(",").strip()
        + """,
tseed AS (SELECT id FROM cs_nodes ORDER BY id LIMIT 4),
tpers AS (SELECT id, 0.25::DOUBLE AS p FROM tseed)
"""
    )
    x0 = "SELECT id, 1.0/nn.cnt AS r FROM cs_nodes, nn_x nn"
    y0 = "SELECT id, 1.0/nn.cnt AS r FROM cs_nodes, nn_y nn"
    return (
        "WITH "
        + prelude.strip()
        + _sql_pr_phase("cs_edges", "cs_nodes", "x", PR_ITERS, x0)
        + _sql_pr_phase("cs_edges", "cs_nodes", "y", PR_ITERS, y0, pers="tpers")
        + f"""
SELECT x.id,
       round(x.r, 6) AS rank,
       round(y.r, 6) AS trusted_rank,
       round(CASE WHEN x.r > 0
             THEN greatest(0.0, least(1.0, (x.r - y.r) / x.r))
             ELSE 0.0 END, 6) AS spam_mass
FROM x{PR_ITERS} x JOIN y{PR_ITERS} y ON y.id = x.id"""
    )


def _sql_pagerank_incremental() -> str:
    """Two-epoch replay of streaming/pagerank.py's maintenance protocol:
    converge (fixed supersteps) on the 2/3 bulk split from uniform, then
    warm-restart over the FULL edge set from the bulk scores
    (L1-normalized; nodes new in the delta enter at 0 — exactly
    pagerank()'s nstart semantics).  Node set per phase = endpoints of
    the accumulated edges, mirroring pagerank_epoch."""
    k0, k1 = INC_PR_ITERS
    prelude = """
cs_edges AS (
  SELECT DISTINCT o_custkey AS src, 100000 + l_suppkey AS dst
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
),
e0 AS (SELECT * FROM cs_edges WHERE (src + dst) % 3 <> 0),
n0 AS (SELECT src AS id FROM e0 UNION SELECT dst AS id FROM e0),
nall AS (SELECT src AS id FROM cs_edges UNION SELECT dst AS id FROM cs_edges)
"""
    warm_x0 = f"""
  SELECT na.id AS id, coalesce(p.r / t.total, 0.0) AS r
  FROM nall na
  LEFT JOIN y{k0} p ON p.id = na.id
  CROSS JOIN (SELECT sum(r) AS total FROM y{k0}) t
"""
    return (
        "WITH "
        + prelude.strip()
        + _sql_pr_phase("e0", "n0", "y", k0, "SELECT id, 1.0/nn.cnt AS r FROM n0, nn_y nn")
        + _sql_pr_phase("cs_edges", "nall", "x", k1, warm_x0)
        + f"\nSELECT id, round(r, 6) AS rank FROM x{k1}"
    )


_SQL_KEYED_EDGES = """
kedges AS (
  SELECT DISTINCT 'c' || o_custkey::VARCHAR AS src,
                  's' || l_suppkey::VARCHAR AS dst
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
),
knodes AS (SELECT src AS id FROM kedges UNION SELECT dst FROM kedges)
"""


def _sql_keyed_pagerank() -> str:
    return _sql_pagerank_unrolled(
        _SQL_KEYED_EDGES,
        "kedges",
        "knodes",
        "id AS key, round(r, 6) AS rank",
        iters=KEYED_PR_ITERS,
    )


_SQL_COMPONENTS = f"""
WITH RECURSIVE {_SQL_PART.strip()},
reach(id, comp) AS (
  SELECT id, id FROM part_nodes
  UNION
  SELECT s.dst, r.comp FROM reach r JOIN sym s ON s.src = r.id
)
SELECT id, min(comp) AS component FROM reach GROUP BY id
"""

_SQL_WCC = f"""
WITH RECURSIVE {_SQL_PART_DIGRAPH.strip()},
dsym AS (
  SELECT src, dst FROM dedges UNION SELECT dst, src FROM dedges
),
reach(id, comp) AS (
  SELECT id, id FROM part_nodes
  UNION
  SELECT s.dst, r.comp FROM reach r JOIN dsym s ON s.src = r.id
)
SELECT id, min(comp) AS component FROM reach GROUP BY id
"""

_SQL_BOWTIE = f"""
WITH RECURSIVE {_SQL_PART_DIGRAPH.strip()},
reach(src, dst) AS (
  SELECT id, id FROM part_nodes
  UNION
  SELECT r.src, e.dst FROM reach r JOIN dedges e ON e.src = r.dst
),
scc AS MATERIALIZED (
  SELECT a.src AS id, min(a.dst) AS component
  FROM reach a JOIN reach b ON a.src = b.dst AND a.dst = b.src
  GROUP BY a.src
),
core_label AS MATERIALIZED (
  SELECT component FROM (
    SELECT component, count(*) AS n FROM scc GROUP BY component
  ) ORDER BY n DESC, component ASC LIMIT 1
),
core AS MATERIALIZED (
  SELECT id FROM scc WHERE component = (SELECT component FROM core_label)
),
fwd AS MATERIALIZED (
  SELECT DISTINCT r.dst AS id FROM reach r SEMI JOIN core c ON c.id = r.src
),
bwd AS MATERIALIZED (
  SELECT DISTINCT r.src AS id FROM reach r SEMI JOIN core c ON c.id = r.dst
),
out_r AS MATERIALIZED (SELECT id FROM fwd ANTI JOIN core c ON c.id = fwd.id),
in_r AS MATERIALIZED (SELECT id FROM bwd ANTI JOIN core c ON c.id = bwd.id),
known AS MATERIALIZED (
  SELECT id FROM core UNION ALL SELECT id FROM out_r UNION ALL SELECT id FROM in_r
),
t_fwd AS MATERIALIZED (
  SELECT id FROM (
    SELECT DISTINCT r.dst AS id FROM reach r SEMI JOIN in_r s ON s.id = r.src
  ) x ANTI JOIN known k ON k.id = x.id
),
t_bwd AS MATERIALIZED (
  SELECT id FROM (
    SELECT DISTINCT r.src AS id FROM reach r SEMI JOIN out_r s ON s.id = r.dst
  ) x ANTI JOIN known k ON k.id = x.id
),
tube AS MATERIALIZED (SELECT id FROM t_fwd SEMI JOIN t_bwd b ON b.id = t_fwd.id),
tendril AS MATERIALIZED (
  SELECT id FROM (
    SELECT id FROM t_fwd UNION SELECT id FROM t_bwd
  ) x ANTI JOIN tube t ON t.id = x.id
),
tagged AS MATERIALIZED (
  SELECT id, 'CORE' AS region FROM core
  UNION ALL SELECT id, 'IN' FROM in_r
  UNION ALL SELECT id, 'OUT' FROM out_r
  UNION ALL SELECT id, 'TUBE' FROM tube
  UNION ALL SELECT id, 'TENDRIL' FROM tendril
)
SELECT n.id, COALESCE(t.region, 'DISC') AS region
FROM part_nodes n LEFT JOIN tagged t ON t.id = n.id
"""

_SQL_SCC = f"""
WITH RECURSIVE {_SQL_PART_DIGRAPH.strip()},
reach(src, dst) AS (
  SELECT id, id FROM part_nodes
  UNION
  SELECT r.src, e.dst FROM reach r JOIN dedges e ON e.src = r.dst
)
SELECT a.src AS id, min(a.dst) AS component
FROM reach a JOIN reach b ON a.src = b.dst AND a.dst = b.src
GROUP BY a.src
"""


def _sql_labelprop() -> str:
    parts = [
        "WITH " + _SQL_PART.strip().rstrip(",").strip(),
        """,
l0 AS MATERIALIZED (SELECT id, id AS label FROM part_nodes)""",
    ]
    for k in range(1, LPA_ITERS + 1):
        parts.append(
            f""",
v{k} AS MATERIALIZED (
  SELECT s.dst AS id, p.label FROM l{k-1} p JOIN sym s ON s.src = p.id
  UNION ALL
  SELECT id, label FROM l{k-1}
),
c{k} AS (SELECT id, label, count(*) AS c FROM v{k} GROUP BY id, label),
l{k} AS (
  SELECT id, label FROM (
    SELECT id, label,
           row_number() OVER (PARTITION BY id ORDER BY c DESC, label ASC) AS rn
    FROM c{k}) WHERE rn = 1
)"""
        )
    parts.append(f"\nSELECT id, label FROM l{LPA_ITERS}")
    return "".join(parts)


_SQL_TRI_LIST = f"""{_SQL_PART.strip()},
tri AS (
  SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
  FROM part_pairs e1
  JOIN part_pairs e2 ON e1.src = e2.src AND e1.dst < e2.dst
  JOIN part_pairs e3 ON e3.src = e1.dst AND e3.dst = e2.dst
)"""

_SQL_TRIANGLES_TOTAL = f"WITH {_SQL_TRI_LIST}\nSELECT count(*)::BIGINT AS n_triangles FROM tri"

_SQL_TRIANGLES = f"""WITH {_SQL_TRI_LIST},
corners AS (
  SELECT a AS id FROM tri UNION ALL SELECT b FROM tri UNION ALL SELECT c FROM tri
),
cnt AS (SELECT id, count(*)::BIGINT AS t FROM corners GROUP BY id)
SELECT n.id, coalesce(cnt.t, 0)::BIGINT AS triangles
FROM part_nodes n LEFT JOIN cnt ON n.id = cnt.id
"""

_SQL_DEG_MINUS = """
deg AS (SELECT src AS id, count(*)::BIGINT AS d FROM sym GROUP BY src)
"""

# per-node 4-clique counts: id-ordered triangle extension (mirrors
# operators/triangles.py:four_cliques up to orientation)
_SQL_FOUR_CLIQUES = f"""WITH {_SQL_TRI_LIST},
quad AS (
  SELECT t.a, t.b, t.c, p1.dst AS d
  FROM tri t
  JOIN part_pairs p1 ON p1.src = t.a
  JOIN part_pairs p2 ON p2.src = t.b AND p2.dst = p1.dst
  JOIN part_pairs p3 ON p3.src = t.c AND p3.dst = p1.dst
),
qc AS (
  SELECT id, count(*)::BIGINT AS q FROM (
    SELECT a AS id FROM quad UNION ALL SELECT b FROM quad
    UNION ALL SELECT c FROM quad UNION ALL SELECT d FROM quad
  ) GROUP BY id
)
SELECT n.id, coalesce(qc.q, 0)::BIGINT AS cliques4
FROM part_nodes n LEFT JOIN qc ON n.id = qc.id
"""

# Burt effective size: deg - 2*tri/deg per edge-having node (mirrors
# operators/structure.py:effective_size)
_SQL_EFFECTIVE_SIZE = f"""WITH {_SQL_TRI_LIST},
corners AS (
  SELECT a AS id FROM tri UNION ALL SELECT b FROM tri UNION ALL SELECT c FROM tri
),
cnt AS (SELECT id, count(*)::BIGINT AS t FROM corners GROUP BY id),
{_SQL_DEG_MINUS.strip()}
SELECT deg.id, round(deg.d - 2.0 * coalesce(cnt.t, 0) / deg.d, 6) AS effective_size
FROM deg LEFT JOIN cnt ON deg.id = cnt.id
"""

# local bridges: canonical edges appearing in no triangle (mirrors
# operators/structure.py:local_bridges)
_SQL_LOCAL_BRIDGES = f"""WITH {_SQL_TRI_LIST},
tri_e AS (
  SELECT a AS src, b AS dst FROM tri
  UNION SELECT a, c FROM tri
  UNION SELECT b, c FROM tri
)
SELECT p.src, p.dst FROM part_pairs p
LEFT JOIN tri_e t ON p.src = t.src AND p.dst = t.dst
WHERE t.src IS NULL
"""

# link prediction: distance-2 non-edge pairs with >= 15 common neighbors,
# CN-family scores (mirrors operators/linkpred.py:link_prediction_scores)
_SQL_LINKPRED = f"""WITH {_SQL_PART.strip()},
{_SQL_DEG_MINUS.strip()},
cen AS (
  SELECT s.src AS v, s.dst AS n, deg.d AS dv FROM sym s JOIN deg ON deg.id = s.src
),
wed AS (
  SELECT l.n AS u, r.n AS w, count(*)::BIGINT AS cn,
         sum(1.0 / ln(l.dv)) AS aa, sum(1.0 / l.dv) AS ra
  FROM cen l JOIN cen r ON l.v = r.v AND l.n < r.n
  GROUP BY 1, 2
),
cand AS (SELECT * FROM wed WHERE cn >= 15),
ne AS (
  SELECT cand.* FROM cand
  ANTI JOIN part_pairs p ON cand.u = p.src AND cand.w = p.dst
)
SELECT ne.u, ne.w, ne.cn,
       round(ne.cn / (du.d + dw.d - ne.cn), 6) AS jaccard,
       round(ne.aa, 6) AS adamic_adar,
       round(ne.ra, 6) AS resource_allocation,
       (du.d * dw.d)::BIGINT AS pref_attachment
FROM ne JOIN deg du ON du.id = ne.u JOIN deg dw ON dw.id = ne.w
"""

# weighted triangles: per-triangle tw = cbrt(w1*w2*w3)/max_w, summed per
# corner (mirrors triangles(G, weighted=True), reference cluster.py:44-64)
_SQL_TRIANGLES_WEIGHTED = f"""WITH {_SQL_PART.strip()},
pw AS (
  SELECT src, dst, (1 + (src + dst) % 5)::DOUBLE AS w FROM part_pairs
),
mx AS (SELECT max(w) AS mw FROM pw),
tri AS (
  SELECT e1.src AS a, e1.dst AS b, e2.dst AS c,
         cbrt(e1.w * e2.w * e3.w) / mx.mw AS tw
  FROM pw e1
  JOIN pw e2 ON e1.src = e2.src AND e1.dst < e2.dst
  JOIN pw e3 ON e3.src = e1.dst AND e3.dst = e2.dst
  CROSS JOIN mx
),
corners AS (
  SELECT a AS id, tw FROM tri
  UNION ALL SELECT b, tw FROM tri
  UNION ALL SELECT c, tw FROM tri
),
agg AS (SELECT id, sum(tw) AS t FROM corners GROUP BY id)
SELECT n.id, round(coalesce(agg.t, 0.0), 6) AS tri_w
FROM part_nodes n LEFT JOIN agg ON n.id = agg.id
"""

_SQL_CLUSTERING = f"""WITH {_SQL_TRI_LIST},
corners AS (
  SELECT a AS id FROM tri UNION ALL SELECT b FROM tri UNION ALL SELECT c FROM tri
),
cnt AS (SELECT id, count(*) AS t FROM corners GROUP BY id),
{_SQL_DEG_MINUS.strip()}
SELECT n.id,
       round(CASE WHEN coalesce(deg.d,0) >= 2
             THEN 2.0 * coalesce(cnt.t,0) / (deg.d * (deg.d - 1))
             ELSE 0.0 END, 6) AS clustering
FROM part_nodes n
LEFT JOIN cnt ON n.id = cnt.id
LEFT JOIN deg ON n.id = deg.id
"""

_SQL_TRANSITIVITY = f"""WITH {_SQL_TRI_LIST},
{_SQL_DEG_MINUS.strip()},
tt AS (SELECT count(*)::DOUBLE AS t FROM tri),
dd AS (SELECT sum(d * (d - 1))::DOUBLE AS s FROM deg)
SELECT round(CASE WHEN dd.s > 0 THEN 6.0 * tt.t / dd.s ELSE 0.0 END, 6) AS transitivity
FROM tt, dd
"""

_SQL_DEGREE_CENTRALITY = f"""WITH {_SQL_PART.strip()},
{_SQL_DEG_MINUS.strip()},
nn AS (SELECT count(*)::DOUBLE AS cnt FROM part_nodes)
SELECT n.id, round(coalesce(deg.d, 0) / (nn.cnt - 1), 6) AS centrality
FROM part_nodes n CROSS JOIN nn LEFT JOIN deg ON n.id = deg.id
"""

_SQL_INOUT = f"""WITH {_SQL_CUST_SUPP.strip()},
i AS (SELECT dst AS id, count(*)::BIGINT AS d FROM cs_edges GROUP BY dst),
o AS (SELECT src AS id, count(*)::BIGINT AS d FROM cs_edges GROUP BY src)
SELECT n.id, coalesce(i.d, 0)::BIGINT AS in_deg, coalesce(o.d, 0)::BIGINT AS out_deg
FROM cs_nodes n LEFT JOIN i ON n.id = i.id LEFT JOIN o ON n.id = o.id
"""


def _sql_katz() -> str:
    alpha, beta = 0.05, 1.0
    parts = [
        "WITH " + _SQL_CUST_SUPP.strip().rstrip(",").strip(),
        ",\nk0 AS MATERIALIZED (SELECT id, 0.0::DOUBLE AS v FROM cs_nodes)",
    ]
    for k in range(1, KATZ_ITERS + 1):
        parts.append(
            f""",
k{k} AS MATERIALIZED (
  SELECT n.id, ({alpha} * coalesce(p.s, 0) + {beta})::DOUBLE AS v
  FROM cs_nodes n
  LEFT JOIN (SELECT e.dst AS id, sum(x.v) AS s
             FROM k{k-1} x JOIN cs_edges e ON x.id = e.src
             GROUP BY e.dst) p ON p.id = n.id
)"""
        )
    parts.append(f"\nSELECT id, round(v, 6) AS katz FROM k{KATZ_ITERS}")
    return "".join(parts)


_SQL_BFS = f"""
WITH RECURSIVE {_SQL_PART.strip()},
src0 AS (SELECT min(id) AS s FROM part_nodes),
reach(id, lvl) AS (
  SELECT s, 0::BIGINT FROM src0
  UNION
  SELECT e.dst, r.lvl + 1
  FROM reach r JOIN sym e ON e.src = r.id
  WHERE r.lvl < 12
)
SELECT id, min(lvl)::BIGINT AS level FROM reach GROUP BY id
"""


_SQL_DIAMETER = f"""
WITH RECURSIVE {_SQL_PART.strip()},
dsdeg AS (SELECT src AS id, count(*) AS d FROM sym GROUP BY src),
dseed AS (SELECT id FROM dsdeg ORDER BY d DESC, id ASC LIMIT 1),
dr1(id, lvl) AS (
  SELECT id, 0::BIGINT FROM dseed
  UNION
  SELECT e.dst, r.lvl + 1 FROM dr1 r JOIN sym e ON e.src = r.id
  WHERE r.lvl < 16
),
dl1 AS (SELECT id, min(lvl)::BIGINT AS lvl FROM dr1 GROUP BY id),
du1 AS (SELECT id, lvl FROM dl1 ORDER BY lvl DESC, id ASC LIMIT 1),
dr2(id, lvl) AS (
  SELECT id, 0::BIGINT FROM du1
  UNION
  SELECT e.dst, r.lvl + 1 FROM dr2 r JOIN sym e ON e.src = r.id
  WHERE r.lvl < 16
),
dl2 AS (SELECT id, min(lvl)::BIGINT AS lvl FROM dr2 GROUP BY id),
dv1 AS (SELECT id, lvl FROM dl2 ORDER BY lvl DESC, id ASC LIMIT 1)
SELECT s.id AS seed, du1.id AS far_node, dv1.id AS periphery_node,
       du1.lvl AS ecc_seed, dv1.lvl AS diameter_lb
FROM dseed s CROSS JOIN du1 CROSS JOIN dv1
"""


def _sql_sssp() -> str:
    parts = [
        "WITH " + _SQL_PART.strip().rstrip(",").strip(),
        """,
wedges AS (SELECT src, dst, (1 + (src + dst) % 5)::DOUBLE AS w FROM sym),
src0 AS (SELECT min(id) AS s FROM part_nodes),
d0 AS MATERIALIZED (SELECT s AS id, 0.0::DOUBLE AS dist FROM src0)""",
    ]
    for k in range(1, SSSP_ITERS + 1):
        parts.append(
            f""",
d{k} AS MATERIALIZED (
  SELECT id, min(dist) AS dist FROM (
    SELECT id, dist FROM d{k-1}
    UNION ALL
    SELECT e.dst AS id, p.dist + e.w AS dist
    FROM d{k-1} p JOIN wedges e ON p.id = e.src
  ) GROUP BY id
)"""
        )
    parts.append(f"\nSELECT id, round(dist, 6) AS dist FROM d{SSSP_ITERS}")
    return "".join(parts)


_SQL_EDGE_SUPPORT = f"""WITH {_SQL_TRI_LIST},
tedges AS (
  SELECT least(a,b) AS src, greatest(a,b) AS dst FROM tri
  UNION ALL SELECT least(a,c), greatest(a,c) FROM tri
  UNION ALL SELECT least(b,c), greatest(b,c) FROM tri
),
sup AS (SELECT src, dst, count(*)::BIGINT AS s FROM tedges GROUP BY src, dst)
SELECT p.src, p.dst, coalesce(sup.s, 0)::BIGINT AS support
FROM part_pairs p LEFT JOIN sup ON p.src = sup.src AND p.dst = sup.dst
"""

KTRUSS_ROUNDS = 6  # >= the observed sf0.01 fixpoint depth; extra rounds no-op


def _sql_ktruss() -> str:
    """Unrolled k-truss (k=4): per round, drop edges in < k-2 triangles."""
    parts = ["WITH " + _SQL_PART.strip()]
    parts.append(",\ne0 AS MATERIALIZED (SELECT src, dst FROM part_pairs)")
    for r in range(1, KTRUSS_ROUNDS + 1):
        parts.append(
            f""",
tri{r} AS MATERIALIZED (
  SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
  FROM e{r-1} e1
  JOIN e{r-1} e2 ON e1.src = e2.src AND e1.dst < e2.dst
  JOIN e{r-1} e3 ON e3.src = e1.dst AND e3.dst = e2.dst
),
sup{r} AS MATERIALIZED (
  SELECT src, dst, count(*)::BIGINT AS s FROM (
    SELECT least(a,b) AS src, greatest(a,b) AS dst FROM tri{r}
    UNION ALL SELECT least(a,c), greatest(a,c) FROM tri{r}
    UNION ALL SELECT least(b,c), greatest(b,c) FROM tri{r}
  ) GROUP BY src, dst
),
e{r} AS MATERIALIZED (
  SELECT e.src, e.dst FROM e{r-1} e
  JOIN sup{r} s ON e.src = s.src AND e.dst = s.dst
  WHERE s.s >= 2
)"""
        )
    parts.append(f"\nSELECT src, dst FROM e{KTRUSS_ROUNDS}")
    return "".join(parts)


KCORE_K = 8
KCORE_ROUNDS = 10  # >= the sf0.01 peel fixpoint depth; extra rounds no-op
CORE_NUMBER_ROUNDS = 32  # sf0.01 h-index fixpoint measured at <=20 rounds; margin


def _sql_kcore() -> str:
    """Unrolled k-core: per round, keep edges whose BOTH endpoints have
    degree >= k in the surviving edge set."""
    parts = ["WITH " + _SQL_PART.strip()]
    parts.append(",\nke0 AS MATERIALIZED (SELECT src, dst FROM part_pairs)")
    for r in range(1, KCORE_ROUNDS + 1):
        parts.append(
            f""",
kd{r} AS MATERIALIZED (
  SELECT id FROM (
    SELECT id, count(*) AS c FROM (
      SELECT src AS id FROM ke{r-1} UNION ALL SELECT dst FROM ke{r-1}
    ) GROUP BY id
  ) WHERE c >= {KCORE_K}
),
ke{r} AS MATERIALIZED (
  SELECT e.src, e.dst FROM ke{r-1} e
  JOIN kd{r} a ON e.src = a.id
  JOIN kd{r} b ON e.dst = b.id
)"""
        )
    parts.append(f"\nSELECT src, dst FROM ke{KCORE_ROUNDS}")
    return "".join(parts)


def _sql_core_number() -> str:
    """Unrolled iterated h-index from the degree vector: c(v) <- largest
    r such that >= r neighbors have value >= r (ranked window)."""
    parts = ["WITH " + _SQL_PART.strip()]
    parts.append(
        """,
cn0 AS MATERIALIZED (
  SELECT n.id, coalesce(d.c, 0)::BIGINT AS core
  FROM part_nodes n LEFT JOIN (
    SELECT src AS id, count(*) AS c FROM sym GROUP BY src
  ) d ON d.id = n.id
)"""
    )
    for r in range(1, CORE_NUMBER_ROUNDS + 1):
        parts.append(
            f""",
cn{r} AS MATERIALIZED (
  SELECT n.id, coalesce(h._h, 0)::BIGINT AS core
  FROM part_nodes n LEFT JOIN (
    SELECT id, max(_r) AS _h FROM (
      SELECT e.src AS id, p.core AS _c,
             row_number() OVER (PARTITION BY e.src ORDER BY p.core DESC) AS _r
      FROM sym e JOIN cn{r-1} p ON p.id = e.dst
    ) WHERE _c >= _r GROUP BY id
  ) h ON h.id = n.id
)"""
        )
    parts.append(f"\nSELECT id, core FROM cn{CORE_NUMBER_ROUNDS}")
    return "".join(parts)


DENSEST_ROUNDS = 12  # sf0.01 peel empties in ~5 rounds at eps=1/10; margin


def _sql_densest() -> str:
    """Unrolled Bahmani peel at eps=1/10 over part graph + planted
    150-clique: per round drop every node with deg * n * 10 <= 22 * m,
    tag each snapshot, return the max-density one (density DESC, round
    ASC — IEEE division is correctly rounded, so the DOUBLE ranking
    matches the engine's bit-for-bit)."""
    parts = ["WITH " + _SQL_PART.strip()]
    parts.append(
        ",\nck AS MATERIALIZED (SELECT 1000000 + range AS id FROM range(1, 151))"
        ",\nds0 AS MATERIALIZED"
        " (SELECT id FROM part_nodes UNION ALL SELECT id FROM ck)"
        ",\nde0 AS MATERIALIZED (SELECT src, dst FROM part_pairs UNION ALL"
        " SELECT a.id AS src, b.id AS dst FROM ck a JOIN ck b ON a.id < b.id)"
    )
    for r in range(1, DENSEST_ROUNDS + 1):
        parts.append(
            f""",
dd{r} AS MATERIALIZED (
  SELECT id, count(*) AS c FROM (
    SELECT src AS id FROM de{r-1} UNION ALL SELECT dst FROM de{r-1}
  ) GROUP BY id
),
ds{r} AS MATERIALIZED (
  SELECT d.id FROM dd{r} d
  WHERE d.c * (SELECT count(*) FROM ds{r-1}) * 10 > 22 * (SELECT count(*) FROM de{r-1})
),
de{r} AS MATERIALIZED (
  SELECT e.src, e.dst FROM de{r-1} e
  JOIN ds{r} a ON e.src = a.id
  JOIN ds{r} b ON e.dst = b.id
)"""
        )
    stats = " UNION ALL ".join(
        f"SELECT {r} AS r, (SELECT count(*) FROM ds{r}) AS n,"
        f" (SELECT count(*) FROM de{r}) AS m"
        for r in range(DENSEST_ROUNDS + 1)
    )
    tagged = " UNION ALL ".join(
        f"SELECT {r} AS r, id FROM ds{r}" for r in range(DENSEST_ROUNDS + 1)
    )
    parts.append(
        f""",
dstats AS MATERIALIZED ({stats}),
dbest AS MATERIALIZED (
  SELECT r FROM dstats WHERE n > 0 ORDER BY m * 1.0 / n DESC, r ASC LIMIT 1
),
dall AS MATERIALIZED ({tagged})
SELECT a.id FROM dall a WHERE a.r = (SELECT r FROM dbest)"""
    )
    return "".join(parts)


def _sql_hits() -> str:
    parts = [
        "WITH " + _SQL_CUST_SUPP.strip().rstrip(",").strip(),
        """,
nn AS MATERIALIZED (SELECT count(*)::DOUBLE AS cnt FROM cs_nodes),
h0 AS MATERIALIZED (SELECT id, 1.0/nn.cnt AS v FROM cs_nodes, nn)""",
    ]
    for k in range(1, HITS_ITERS + 1):
        parts.append(
            f""",
araw{k} AS MATERIALIZED (
  SELECT e.dst AS id, sum(h.v) AS s
  FROM h{k-1} h JOIN cs_edges e ON h.id = e.src GROUP BY e.dst
),
a{k} AS MATERIALIZED (
  SELECT n.id,
         CASE WHEN m.mx <> 0 THEN coalesce(r.s, 0) / m.mx
              ELSE coalesce(r.s, 0) END AS v
  FROM cs_nodes n
  CROSS JOIN (SELECT max(s) AS mx FROM araw{k}) m
  LEFT JOIN araw{k} r ON n.id = r.id
),
hraw{k} AS MATERIALIZED (
  SELECT e.src AS id, sum(a.v) AS s
  FROM a{k} a JOIN cs_edges e ON a.id = e.dst GROUP BY e.src
),
h{k} AS MATERIALIZED (
  SELECT n.id,
         CASE WHEN m.mx <> 0 THEN coalesce(r.s, 0) / m.mx
              ELSE coalesce(r.s, 0) END AS v
  FROM cs_nodes n
  CROSS JOIN (SELECT max(s) AS mx FROM hraw{k}) m
  LEFT JOIN hraw{k} r ON n.id = r.id
)"""
        )
    parts.append(
        f"""
SELECT h.id, round(h.v, 6) AS hub, round(a.v, 6) AS authority
FROM h{HITS_ITERS} h JOIN a{HITS_ITERS} a ON h.id = a.id"""
    )
    return "".join(parts)


def _sql_eigenvector() -> str:
    parts = [
        "WITH " + _SQL_PART.strip().rstrip(",").strip(),
        """,
nn AS MATERIALIZED (SELECT count(*)::DOUBLE AS cnt FROM part_nodes),
e0 AS MATERIALIZED (SELECT id, 1.0/nn.cnt AS v FROM part_nodes, nn)""",
    ]
    for k in range(1, EC_ITERS + 1):
        parts.append(
            f""",
y{k} AS MATERIALIZED (
  SELECT x.id, x.v + coalesce(p.s, 0) AS y
  FROM e{k-1} x
  LEFT JOIN (SELECT s.dst AS id, sum(x2.v) AS s
             FROM e{k-1} x2 JOIN sym s ON x2.id = s.src
             GROUP BY s.dst) p ON x.id = p.id
),
e{k} AS MATERIALIZED (
  SELECT id, CASE WHEN nrm.n > 0 THEN y / nrm.n ELSE y END AS v
  FROM y{k} CROSS JOIN (SELECT sqrt(sum(y * y)) AS n FROM y{k}) nrm
)"""
        )
    parts.append(f"\nSELECT id, round(v, 6) AS ec FROM e{EC_ITERS}")
    return "".join(parts)


_SQL_CHAIN = """
chain AS (
  SELECT p.p_partkey AS src, p.p_partkey + 1 AS dst
  FROM part p
  WHERE EXISTS (SELECT 1 FROM part q WHERE q.p_partkey = p.p_partkey + 1)
)
"""

_SQL_SETOPS_INTERSECTION = f"""WITH {_SQL_PART.strip()},
{_SQL_CHAIN.strip()}
SELECT p.src, p.dst FROM part_pairs p
WHERE EXISTS (SELECT 1 FROM chain c WHERE c.src = p.src AND c.dst = p.dst)
"""

_SQL_SETOPS_DIFFERENCE = f"""WITH {_SQL_PART.strip()},
{_SQL_CHAIN.strip()}
SELECT c.src, c.dst FROM chain c
WHERE NOT EXISTS (SELECT 1 FROM part_pairs p WHERE p.src = c.src AND p.dst = c.dst)
"""

_SQL_SETOPS_SYMDIFF = f"""WITH {_SQL_PART.strip()},
{_SQL_CHAIN.strip()}
SELECT p.src, p.dst FROM part_pairs p
WHERE NOT EXISTS (SELECT 1 FROM chain c WHERE c.src = p.src AND c.dst = p.dst)
UNION ALL
SELECT c.src, c.dst FROM chain c
WHERE NOT EXISTS (SELECT 1 FROM part_pairs p WHERE p.src = c.src AND p.dst = c.dst)
"""

_SQL_BFS_PARENT = f"""
WITH RECURSIVE {_SQL_PART.strip()},
src0 AS (SELECT min(id) AS s FROM part_nodes),
reach(id, lvl) AS (
  SELECT s, 0::BIGINT FROM src0
  UNION
  SELECT e.dst, r.lvl + 1
  FROM reach r JOIN sym e ON e.src = r.id
  WHERE r.lvl < 12
),
lv AS (SELECT id, min(lvl) AS lvl FROM reach GROUP BY id)
SELECT v.id,
       CASE WHEN v.lvl = 0 THEN v.id
            ELSE (SELECT min(e.src) FROM sym e JOIN lv u ON e.src = u.id
                  WHERE e.dst = v.id AND u.lvl = v.lvl - 1) END AS parent
FROM lv v
"""

_SQL_BFS_MULTI = f"""
WITH RECURSIVE {_SQL_PART.strip()},
srcs AS (SELECT id AS s FROM part_nodes ORDER BY id LIMIT 3),
reach(source, id, lvl) AS (
  SELECT s, s, 0::BIGINT FROM srcs
  UNION
  SELECT r.source, e.dst, r.lvl + 1
  FROM reach r JOIN sym e ON e.src = r.id
  WHERE r.lvl < 12
)
SELECT source, id, min(lvl)::BIGINT AS level FROM reach GROUP BY source, id
"""

def _sql_brandes_levels(n_src: int, max_lvl: int) -> list:
    """Shared Brandes CTE chain: forward sigma-BFS f0..f{max_lvl} +
    backward dependency d{max_lvl}..d1 — consumed by both the node and
    the edge betweenness oracles."""
    # every CTE is MATERIALIZED: the level chain references sym/f{l}/v{l}
    # repeatedly and DuckDB's default inlining would re-expand (and
    # re-open the parquet) once per reference — ~25 levels deep that
    # exhausts the open-file limit
    parts = [
        """WITH part_pairs AS MATERIALIZED (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
part_nodes AS MATERIALIZED (SELECT p_partkey AS id FROM part),
sym AS MATERIALIZED (
  SELECT src, dst FROM part_pairs
  UNION ALL
  SELECT dst AS src, src AS dst FROM part_pairs
),""",
        f"srcs AS MATERIALIZED (SELECT id AS s FROM part_nodes ORDER BY id LIMIT {n_src}),",
        "f0 AS MATERIALIZED (SELECT s AS source, s AS id, 1.0::DOUBLE AS sig FROM srcs),",
        "v0 AS MATERIALIZED (SELECT source, id FROM f0),",
    ]
    for l in range(1, max_lvl + 1):
        parts.append(
            f"""g{l} AS MATERIALIZED (
  SELECT f.source, e.dst AS id, sum(f.sig) AS sig
  FROM f{l - 1} f JOIN sym e ON e.src = f.id GROUP BY 1, 2
),
f{l} AS MATERIALIZED (
  SELECT g.* FROM g{l} g ANTI JOIN v{l - 1} v ON v.source = g.source AND v.id = g.id
),
v{l} AS MATERIALIZED (SELECT * FROM v{l - 1} UNION ALL SELECT source, id FROM f{l}),"""
        )
    parts.append(
        f"d{max_lvl} AS MATERIALIZED (SELECT source, id, sig, 0.0::DOUBLE AS delta FROM f{max_lvl}),"
    )
    for l in range(max_lvl - 1, 0, -1):
        parts.append(
            f"""c{l} AS MATERIALIZED (
  SELECT f.source, f.id, sum(f.sig / w.sig * (1 + w.delta)) AS delta
  FROM f{l} f
  JOIN sym e ON e.src = f.id
  JOIN d{l + 1} w ON w.source = f.source AND w.id = e.dst
  GROUP BY 1, 2
),
d{l} AS MATERIALIZED (
  SELECT f.source, f.id, f.sig, coalesce(c.delta, 0.0) AS delta
  FROM f{l} f LEFT JOIN c{l} c ON c.source = f.source AND c.id = f.id
),"""
        )
    return parts


def _sql_betweenness(n_src: int = 16, max_lvl: int = 12) -> str:
    """Node Brandes unrolled (see _sql_brandes_levels); bc = 0.5 * sum
    of deltas (undirected halving, matching
    betweenness_centrality(..., normalized=False))."""
    parts = _sql_brandes_levels(n_src, max_lvl)
    union = "\nUNION ALL ".join(
        f"SELECT source, id, delta FROM d{l}" for l in range(1, max_lvl + 1)
    )
    parts = parts + [
        f"alldelta AS ({union}),",
        "bc AS (SELECT id, 0.5 * sum(delta) AS b FROM alldelta GROUP BY id)",
        """SELECT n.id, round(coalesce(bc.b, 0.0), 6) AS betweenness
FROM part_nodes n LEFT JOIN bc ON n.id = bc.id""",
    ]
    return "\n".join(parts)


def _sql_edge_betweenness(n_src: int = 16, max_lvl: int = 12) -> str:
    """Edge Brandes over the same level chain: a DAG edge (v at f_l,
    w at f_{l+1}) earns sig_v/sig_w * (1 + delta_w) per source —
    including l=0 (edges leaving the pivots), which the node recursion
    never reads; canonicalized, halved (undirected), dense over the
    canonical edge set."""
    parts = _sql_brandes_levels(n_src, max_lvl)
    creds = []
    for l in range(0, max_lvl):
        parts.append(
            f"""ec{l} AS MATERIALIZED (
  SELECT least(f.id, e.dst) AS src, greatest(f.id, e.dst) AS dst,
         sum(f.sig / w.sig * (1 + w.delta)) AS b
  FROM f{l} f
  JOIN sym e ON e.src = f.id
  JOIN d{l + 1} w ON w.source = f.source AND w.id = e.dst
  GROUP BY 1, 2
),"""
        )
        creds.append(f"SELECT src, dst, b FROM ec{l}")
    union = "\nUNION ALL ".join(creds)
    parts = parts + [
        f"alle AS ({union}),",
        "ebc AS (SELECT src, dst, 0.5 * sum(b) AS b FROM alle GROUP BY src, dst)",
        """SELECT p.src, p.dst, round(coalesce(e.b, 0.0), 6) AS betweenness
FROM part_pairs p LEFT JOIN ebc e ON e.src = p.src AND e.dst = p.dst""",
    ]
    return "\n".join(parts)


def _sql_walks(
    n_starts: int = 16,
    num_walks: int = 2,
    walk_length: int = 8,
    seed: int = 42,
    weighted: bool = False,
) -> str:
    """Step-unrolled replay of random_walks' md5-argmin rule: each chain
    holds one row per (start, walk), advanced by arg_min over neighbors
    of the same engine-portable md5 draw string.  ``weighted`` replays
    the Efraimidis-Spirakis arg_max(ln(u)/w) rule over the same
    deterministic (1 + (src+dst) % 5) weights the weighted graph
    queries use."""
    wcol = ", (1 + (src + dst) % 5)::DOUBLE AS w" if weighted else ""
    parts = [
        f"""WITH part_pairs AS MATERIALIZED (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
part_nodes AS MATERIALIZED (SELECT p_partkey AS id FROM part),
sym AS MATERIALIZED (
  SELECT src, dst{wcol} FROM (
    SELECT src, dst FROM part_pairs
    UNION ALL
    SELECT dst AS src, src AS dst FROM part_pairs
  )
),""",
        f"starts AS (SELECT id AS start FROM part_nodes ORDER BY id LIMIT {n_starts}),",
        "wk AS (SELECT unnest(range({n})) AS walk),".format(n=num_walks),
        "c0 AS MATERIALIZED (SELECT start, walk, start AS node FROM starts CROSS JOIN wk),",
    ]
    for k in range(1, walk_length + 1):
        draw = f"md5(concat_ws('|', {seed}, c.walk, {k}, c.node, e.dst))"
        if weighted:
            u = f"((('0x' || substr({draw}, 1, 15))::UBIGINT)::DOUBLE / 1152921504606846976.0)"
            pick = f"arg_max(e.dst, ln({u}) / e.w)"
        else:
            pick = f"arg_min(e.dst, {draw})"
        parts.append(
            f"""c{k} AS MATERIALIZED (
  SELECT c.start, c.walk, {pick} AS node
  FROM c{k - 1} c JOIN sym e ON e.src = c.node
  GROUP BY 1, 2
),"""
        )
    union = "\nUNION ALL ".join(
        f"SELECT start, walk, {k}::BIGINT AS step, node FROM c{k}"
        for k in range(0, walk_length + 1)
    )
    parts.append(f"allsteps AS ({union})")
    parts.append("SELECT start, walk, step, node FROM allsteps")
    return "\n".join(parts)


def _sql_mis(rounds: int = 16, seed: int = 42) -> str:
    """Luby MIS unrolled: per round, a node wins when its md5 priority is
    the strict min of its undecided closed neighborhood; winners and
    their neighbors leave.  Rounds past the fixpoint are empty no-ops
    (same over-unroll convention as the kcore oracle)."""
    parts = [
        """WITH part_pairs AS MATERIALIZED (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
part_nodes AS MATERIALIZED (SELECT p_partkey AS id FROM part),
sym AS MATERIALIZED (
  SELECT src, dst FROM part_pairs
  UNION ALL
  SELECT dst AS src, src AS dst FROM part_pairs
),""",
        f"u0 AS MATERIALIZED (SELECT id, md5(concat_ws('|', {seed}, id)) AS pri FROM part_nodes),",
    ]
    for r in range(rounds):
        parts.append(
            f"""nm{r} AS MATERIALIZED (
  SELECT e.src AS id, min(u2.pri) AS minp
  FROM sym e JOIN u{r} u1 ON u1.id = e.src JOIN u{r} u2 ON u2.id = e.dst
  GROUP BY e.src
),
c{r} AS MATERIALIZED (
  SELECT u.id FROM u{r} u LEFT JOIN nm{r} n ON n.id = u.id
  WHERE n.minp IS NULL OR u.pri < n.minp
),
u{r + 1} AS MATERIALIZED (
  SELECT u.id, u.pri FROM u{r} u
  ANTI JOIN (
    SELECT id FROM c{r}
    UNION
    SELECT e.dst AS id FROM sym e SEMI JOIN c{r} c ON c.id = e.src
  ) d ON d.id = u.id
),"""
        )
    union = "\nUNION ALL ".join(f"SELECT id FROM c{r}" for r in range(rounds))
    parts.append(f"mis AS ({union})")
    parts.append("SELECT id FROM mis")
    return "\n".join(parts)


def _sql_wl(iters: int = 2) -> str:
    """WL refinement unrolled: lab0 = md5(degree); per round the new
    label digests (own label, commutative 60-bit fold sums of neighbor
    labels, neighbor count) — DuckDB ('0x'||substr)::UBIGINT == Spark
    conv(substr(md5),16,10), HUGEINT sums == DECIMAL(38,0) sums."""
    parts = [
        """WITH part_pairs AS MATERIALIZED (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
part_nodes AS MATERIALIZED (SELECT p_partkey AS id FROM part),
sym AS MATERIALIZED (
  SELECT src, dst FROM part_pairs
  UNION ALL
  SELECT dst AS src, src AS dst FROM part_pairs
),
deg AS (SELECT src AS id, COUNT(*) AS d FROM sym GROUP BY src),
l0 AS MATERIALIZED (
  SELECT n.id, md5(CAST(COALESCE(d.d, 0) AS VARCHAR)) AS wl
  FROM part_nodes n LEFT JOIN deg d ON d.id = n.id
),"""
    ]
    for r in range(iters):
        parts.append(
            f"""g{r} AS MATERIALIZED (
  SELECT e.src AS id,
         SUM(CAST(('0x' || substring(l.wl, 1, 15))::UBIGINT AS HUGEINT)) AS s1,
         SUM(CAST(('0x' || substring(l.wl, 17, 15))::UBIGINT AS HUGEINT)) AS s2,
         COUNT(*) AS c
  FROM sym e JOIN l{r} l ON l.id = e.dst
  GROUP BY e.src
),
l{r + 1} AS MATERIALIZED (
  SELECT l.id,
         md5(concat_ws('|', l.wl,
             COALESCE(CAST(g.s1 AS VARCHAR), '0'),
             COALESCE(CAST(g.s2 AS VARCHAR), '0'),
             COALESCE(CAST(g.c AS VARCHAR), '0'))) AS wl
  FROM l{r} l LEFT JOIN g{r} g ON g.id = l.id
),"""
        )
    # strip the trailing comma of the last CTE before the final SELECT
    joined = "\n".join(parts)
    if joined.endswith(","):
        joined = joined[:-1]
    return joined + f"\nSELECT id, wl FROM l{iters}"


def _sql_ppr_push(rounds: int = 40, alpha: float = 0.15, eps: float = 1e-3) -> str:
    """Forward-push PPR replay (r5, dyadic): p/r as 2^-40 scaled BIGINTs.
    Per push: floor(alpha*r) units to p, q = floor((1-alpha)*r/deg)
    units to EACH neighbor, crumbs stay in the pusher's r — exact
    integer mass balance, and the spread SUM is a BIGINT sum (DuckDB
    widens to HUGEINT; cast back).  The floats involved (one multiply,
    one divide, floor, the eps*2^40 threshold literal) are all
    correctly-rounded IEEE, so every round is bit-identical to Spark.
    Unrolled to the engine's max_rounds=40: rounds past convergence are
    exact no-ops, so parity holds at any convergence depth (ADVICE r4)."""
    one_m = repr(1.0 - alpha)
    a = repr(alpha)
    et = repr(eps * float(2**40))  # threshold in scaled units
    sc = str(int(2**40))
    parts = [
        f"""WITH part_pairs AS MATERIALIZED (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
sym AS MATERIALIZED (
  SELECT src, dst FROM part_pairs
  UNION ALL
  SELECT dst AS src, src AS dst FROM part_pairs
),
deg AS MATERIALIZED (SELECT src AS id, count(*) AS deg FROM sym GROUP BY src),
seeds AS MATERIALIZED (SELECT p_partkey AS id FROM part ORDER BY 1 LIMIT 4),
st0 AS MATERIALIZED (
  SELECT s.id AS seed, s.id AS id, 0::BIGINT AS p, {sc}::BIGINT AS r,
         COALESCE(d.deg, 0) AS deg
  FROM seeds s LEFT JOIN deg d ON d.id = s.id
),""",
    ]
    for k in range(1, rounds + 1):
        parts.append(
            f"""sp{k} AS MATERIALIZED (
  SELECT s.seed, e.dst AS id,
         sum(floor({one_m} * s.r / s.deg)::BIGINT)::BIGINT AS _in
  FROM st{k - 1} s JOIN sym e ON e.src = s.id
  WHERE s.r > {et} * s.deg AND s.deg > 0
  GROUP BY s.seed, e.dst
),
mg{k} AS MATERIALIZED (
  SELECT COALESCE(a.seed, b.seed) AS seed, COALESCE(a.id, b.id) AS id,
         COALESCE(a.p, 0) + CASE WHEN COALESCE(a.r, 0) > {et} * COALESCE(a.deg, 0)
                                      AND COALESCE(a.deg, 0) > 0
                                 THEN floor({a} * a.r)::BIGINT ELSE 0 END AS p,
         CASE WHEN COALESCE(a.r, 0) > {et} * COALESCE(a.deg, 0)
                   AND COALESCE(a.deg, 0) > 0
              THEN a.r - floor({a} * a.r)::BIGINT
                   - a.deg * floor({one_m} * a.r / a.deg)::BIGINT
              ELSE COALESCE(a.r, 0) END + COALESCE(b._in, 0) AS r,
         a.deg AS olddeg
  FROM st{k - 1} a FULL OUTER JOIN sp{k} b ON a.seed = b.seed AND a.id = b.id
),
st{k} AS MATERIALIZED (
  SELECT m.seed, m.id, m.p::BIGINT AS p, m.r::BIGINT AS r,
         COALESCE(m.olddeg, COALESCE(d.deg, 0)) AS deg
  FROM mg{k} m LEFT JOIN deg d ON d.id = m.id
),"""
        )
    parts.append(
        f"fin AS (SELECT seed, id, (p / {sc}.0) AS p, (r / {sc}.0) AS residual FROM st{rounds})\n"
        "SELECT seed, id, p, residual FROM fin"
    )
    return "\n".join(parts)


def _sql_neighborhood_function(h: int = 6, k: int = 16, seed: int = 42) -> str:
    """ANF replay (r4): identical md5 geometric-bit init, identical
    bit_or supersteps over the symmetrized part graph, and the same
    2^-20-dyadic scaled-integer ball sum per h — BIGINT-exact and
    order-independent, so the cross-node sum is engine-identical
    (operators/anf.py neighborhood_function, stop_early=False)."""
    from graphblas_algorithms_spark.operators.anf import hb_ball_sql, hb_mask_init_sql

    ball = hb_ball_sql(k)
    init = ", ".join(
        f"{hb_mask_init_sql(i, seed, 'duckdb')} AS m{i}" for i in range(k)
    )
    mlist = ", ".join(f"m{i}" for i in range(k))
    est = f"sum(cast(floor(({ball}) * 1048576.0 + 0.5) AS BIGINT)) / 1048576.0"
    parts = [
        """WITH part_pairs AS MATERIALIZED (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
part_nodes AS MATERIALIZED (SELECT p_partkey AS id FROM part),
sym AS MATERIALIZED (
  SELECT src, dst FROM part_pairs
  UNION ALL
  SELECT dst AS src, src AS dst FROM part_pairs
),""",
        f"s0 AS MATERIALIZED (SELECT id, {init} FROM part_nodes),",
    ]
    for r in range(1, h + 1):
        gors = ", ".join(f"bit_or(s.m{i}) AS g{i}" for i in range(k))
        merged = ", ".join(f"(s.m{i} | COALESCE(g.g{i}, 0)) AS m{i}" for i in range(k))
        parts.append(
            f"""g{r} AS MATERIALIZED (
  SELECT e.src AS id, {gors}
  FROM sym e JOIN s{r - 1} s ON s.id = e.dst GROUP BY e.src
),
s{r} AS MATERIALIZED (
  SELECT s.id, {merged}
  FROM s{r - 1} s LEFT JOIN g{r} g ON g.id = s.id
),"""
        )
    selects = [
        "SELECT 0 AS h, (SELECT cast(count(*) AS DOUBLE) FROM part_nodes) AS reachable_pairs"
    ] + [
        f"SELECT {r} AS h, (SELECT {est} FROM s{r}) AS reachable_pairs"
        for r in range(1, h + 1)
    ]
    parts.append(
        "fin AS (" + "\nUNION ALL\n".join(selects) + ")\n"
        "SELECT h, reachable_pairs FROM fin ORDER BY h"
    )
    return "\n".join(parts)


def _sql_hyperball(h: int = 4, k: int = 16, seed: int = 42) -> str:
    """HyperBall replay: identical sketch init (md5 geometric bits),
    identical bit_or supersteps, identical reproducible-float ball
    estimate (shared expression text from operators/anf.py)."""
    from graphblas_algorithms_spark.operators.anf import hb_ball_sql, hb_mask_init_sql

    ball = hb_ball_sql(k)
    init = ", ".join(
        f"{hb_mask_init_sql(i, seed, 'duckdb')} AS m{i}" for i in range(k)
    )
    mlist = ", ".join(f"m{i}" for i in range(k))
    parts = [
        """WITH part_pairs AS MATERIALIZED (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
part_nodes AS MATERIALIZED (SELECT p_partkey AS id FROM part),
sym AS MATERIALIZED (
  SELECT src, dst FROM part_pairs
  UNION ALL
  SELECT dst AS src, src AS dst FROM part_pairs
),""",
        f"sm0 AS MATERIALIZED (SELECT id, {init} FROM part_nodes),",
        f"s0 AS MATERIALIZED (SELECT id, {mlist}, {ball} AS ball, 0.0 AS harm, 0.0 AS sumd FROM sm0),",
    ]
    for r in range(1, h + 1):
        gors = ", ".join(f"bit_or(s.m{i}) AS g{i}" for i in range(k))
        merged = ", ".join(f"(s.m{i} | COALESCE(g.g{i}, 0)) AS m{i}" for i in range(k))
        parts.append(
            f"""g{r} AS MATERIALIZED (
  SELECT e.src AS id, {gors}
  FROM sym e JOIN s{r - 1} s ON s.id = e.dst GROUP BY e.src
),
sm{r} AS MATERIALIZED (
  SELECT s.id, {merged}, s.ball, s.harm, s.sumd
  FROM s{r - 1} s LEFT JOIN g{r} g ON g.id = s.id
),
s{r} AS MATERIALIZED (
  SELECT id, {mlist},
         {ball} AS ball,
         harm + ({ball} - ball) / {float(r)!r} AS harm,
         sumd + ({ball} - ball) * {float(r)!r} AS sumd
  FROM sm{r}
),"""
        )
    parts.append(
        f"fin AS (SELECT id, ball AS reachable, harm AS harmonic, sumd AS sum_dist FROM s{h})\n"
        "SELECT id, reachable, harmonic, sum_dist FROM fin"
    )
    return "\n".join(parts)


_SQL_BRIDGE_PREFIX = """part_pairs AS MATERIALIZED (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
part_nodes AS MATERIALIZED (SELECT p_partkey AS id FROM part),
te AS MATERIALIZED (
  SELECT src, dst FROM part_pairs WHERE (src * 31 + dst) % 23 = 0
),
sym23 AS MATERIALIZED (
  SELECT src, dst FROM te UNION ALL SELECT dst AS src, src AS dst FROM te
),
reach(id, comp) AS (
  SELECT id, id FROM part_nodes
  UNION
  SELECT s.dst, r.comp FROM reach r JOIN sym23 s ON s.src = r.id
),
comp AS MATERIALIZED (SELECT id, min(comp) AS root FROM reach GROUP BY id),
lvl(id, d) AS (
  SELECT id, 0 FROM comp WHERE id = root
  UNION
  SELECT s.dst, l.d + 1 FROM lvl l JOIN sym23 s ON s.src = l.id WHERE l.d < 512
),
lvl2 AS MATERIALIZED (SELECT id, min(d) AS level FROM lvl GROUP BY id),
-- ADVICE r3: the depth bound exists only because a cyclic (id, d) BFS
-- CTE never terminates; 512 is far above any plausible eccentricity of
-- the 1/23-thinned graph at every sf.  If truncation EVER bites, this
-- canary emits an impossible (-1, -1) edge so parity breaks loudly
-- instead of silently building a different forest.
trunc_canary AS MATERIALIZED (
  SELECT CAST(-1 AS BIGINT) AS src, CAST(-1 AS BIGINT) AS dst
  FROM lvl2 WHERE level >= 511 LIMIT 1
),
par AS MATERIALIZED (
  SELECT e.dst AS id, min(e.src) AS parent
  FROM sym23 e JOIN lvl2 a ON a.id = e.src JOIN lvl2 b ON b.id = e.dst
  WHERE a.level = b.level - 1
  GROUP BY e.dst
),
tree AS MATERIALIZED (
  SELECT least(parent, id) AS src, greatest(parent, id) AS dst FROM par
),
nont AS MATERIALIZED (
  SELECT t.src, t.dst FROM te t ANTI JOIN tree r ON r.src = t.src AND r.dst = t.dst
),
lab AS MATERIALIZED (
  SELECT src, dst,
         CAST(CAST(('0x' || substring(md5(concat_ws('|', src, dst, 42)), 1, 15)) AS UBIGINT) AS BIGINT) AS lab
  FROM nont
),
xv AS MATERIALIZED (
  SELECT id, bit_xor(lab) AS x FROM (
    SELECT src AS id, lab FROM lab UNION ALL SELECT dst AS id, lab FROM lab
  ) GROUP BY id
),
anc(u, a) AS (
  SELECT id, id FROM part_nodes
  UNION
  SELECT c.u, p.parent FROM anc c JOIN par p ON p.id = c.a
),
subx AS MATERIALIZED (
  SELECT c.a AS id, bit_xor(COALESCE(x.x, 0)) AS sx
  FROM anc c LEFT JOIN xv x ON x.id = c.u
  GROUP BY c.a
),
bridge AS MATERIALIZED (
  SELECT least(p.parent, p.id) AS src, greatest(p.parent, p.id) AS dst
  FROM par p JOIN subx s ON s.id = p.id
  WHERE s.sx = 0
)"""

_SQL_BRIDGES = f"""WITH RECURSIVE {_SQL_BRIDGE_PREFIX}
SELECT src, dst FROM bridge
UNION ALL SELECT src, dst FROM trunc_canary"""

_SQL_BUTTERFLIES = f"""WITH {_SQL_CUST_SUPP.strip()},
cod AS (
  SELECT e1.src AS a, e2.src AS b, count(*) AS t
  FROM cs_edges e1 JOIN cs_edges e2 ON e1.dst = e2.dst AND e1.src < e2.src
  GROUP BY e1.src, e2.src
),
pp AS (SELECT a, b, t * (t - 1) / 2 AS bf FROM cod),
scored AS (
  SELECT id, CAST(SUM(bf) AS BIGINT) AS butterflies FROM (
    SELECT a AS id, bf FROM pp UNION ALL SELECT b AS id, bf FROM pp
  ) GROUP BY id
)
SELECT s.src AS id, COALESCE(x.butterflies, 0) AS butterflies
FROM (SELECT DISTINCT src FROM cs_edges) s
LEFT JOIN scored x ON x.id = s.src"""

_SQL_LANDMARKS = """WITH RECURSIVE part_pairs AS MATERIALIZED (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
part_nodes AS MATERIALIZED (SELECT p_partkey AS id FROM part),
symq AS MATERIALIZED (
  SELECT src, dst FROM part_pairs
  UNION ALL SELECT dst AS src, src AS dst FROM part_pairs
),
deg AS (SELECT src AS id, count(*) AS d FROM symq GROUP BY src),
lms AS MATERIALIZED (
  SELECT id FROM deg ORDER BY d DESC, id ASC LIMIT 8
),
dist(lm, id, dd) AS (
  SELECT id, id, 0 FROM lms
  UNION
  SELECT r.lm, s.dst, r.dd + 1
  FROM dist r JOIN symq s ON s.src = r.id WHERE r.dd < 16
),
ldist AS MATERIALIZED (
  SELECT lm, id, min(dd) AS dist FROM dist GROUP BY lm, id
),
qpairs AS (
  SELECT id AS u, ((id * 37) % (SELECT count(*) FROM part)) + 1 AS v
  FROM part_nodes WHERE id <= 40
)
SELECT q.u, q.v,
       min(du.dist + dv.dist) AS dist_upper,
       max(abs(du.dist - dv.dist)) AS dist_lower
FROM qpairs q
LEFT JOIN ldist du ON du.id = q.u
LEFT JOIN ldist dv ON dv.id = q.v AND dv.lm = du.lm
GROUP BY q.u, q.v"""

_SQL_DEGREE_HIST = """WITH part_pairs AS MATERIALIZED (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
part_nodes AS MATERIALIZED (SELECT p_partkey AS id FROM part),
sym AS (
  SELECT src, dst FROM part_pairs
  UNION ALL SELECT dst AS src, src AS dst FROM part_pairs
),
deg AS (
  SELECT n.id, COALESCE(d.d, 0) AS degree
  FROM part_nodes n
  LEFT JOIN (SELECT src AS id, count(*) AS d FROM sym GROUP BY src) d
    ON d.id = n.id
),
hist AS (SELECT degree, count(*) AS n_nodes FROM deg GROUP BY degree)
SELECT degree, n_nodes,
       round(SUM(n_nodes) OVER (ORDER BY degree DESC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             / (SELECT count(*) FROM part_nodes), 6) AS frac_ge
FROM hist"""

def _sql_temporal_reach(hops: int = 6) -> str:
    """Earliest-arrival relaxation unrolled: a{k} = min(a{k-1}, min t of
    edges from a{k-1} with t >= arrival) — the same hop-bounded closure
    the kernel computes (over-unrolled rounds past the fixpoint are
    no-ops)."""
    parts = [
        """WITH ev AS MATERIALIZED (
  SELECT user_id, event_type, epoch_us(ts) AS t FROM events
),
te AS MATERIALIZED (
  SELECT DISTINCT a.user_id AS src, b.user_id AS dst, b.t
  FROM ev a JOIN ev b ON a.event_type = b.event_type
   AND b.t > a.t AND b.t <= a.t + 600000000 AND a.user_id <> b.user_id
),
a0 AS MATERIALIZED (
  SELECT s AS source, s AS id, CAST(0 AS BIGINT) AS arrival
  FROM (VALUES (0), (1), (2), (3)) v(s)
),"""
    ]
    for k in range(1, hops + 1):
        parts.append(
            f"""p{k} AS MATERIALIZED (
  SELECT p.source, e.dst AS id, min(e.t) AS arrival
  FROM a{k - 1} p JOIN te e ON e.src = p.id AND e.t >= p.arrival
  GROUP BY p.source, e.dst
),
a{k} AS MATERIALIZED (
  SELECT source, id, min(arrival) AS arrival FROM (
    SELECT source, id, arrival FROM a{k - 1}
    UNION ALL SELECT source, id, arrival FROM p{k}
  ) GROUP BY source, id
),"""
        )
    last = parts[-1].rstrip()
    parts[-1] = last[:-1] if last.endswith(",") else last
    parts.append(f"SELECT source, id, arrival FROM a{hops}")
    return "\n".join(parts)


def _sql_trussness(rounds: int = 10) -> str:
    """h-index truss rounds unrolled: membership table (3 rows per
    triangle), per round join tau onto both other edges, windowed
    h-index per edge, clamp non-increasing."""
    parts = [
        """WITH part_pairs AS MATERIALIZED (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
te AS MATERIALIZED (
  SELECT src, dst FROM part_pairs WHERE (src * 31 + dst) % 7 = 0
),
tri AS MATERIALIZED (
  SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
  FROM te e1
  JOIN te e2 ON e2.src = e1.src AND e2.dst > e1.dst
  JOIN te e3 ON e3.src = e1.dst AND e3.dst = e2.dst
),
mem AS MATERIALIZED (
  SELECT a AS src, b AS dst, a AS o1s, c AS o1d, b AS o2s, c AS o2d FROM tri
  UNION ALL
  SELECT a, c, a, b, b, c FROM tri
  UNION ALL
  SELECT b, c, a, b, a, c FROM tri
),
tau0 AS MATERIALIZED (
  SELECT src, dst, count(*) AS tau FROM mem GROUP BY src, dst
),"""
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f"""v{r} AS MATERIALIZED (
  SELECT m.src, m.dst, least(t1.tau, t2.tau) AS m
  FROM mem m
  JOIN tau{r - 1} t1 ON t1.src = m.o1s AND t1.dst = m.o1d
  JOIN tau{r - 1} t2 ON t2.src = m.o2s AND t2.dst = m.o2d
),
h{r} AS MATERIALIZED (
  SELECT src, dst, max(least(rk, m)) AS h FROM (
    SELECT src, dst, m,
           row_number() OVER (PARTITION BY src, dst ORDER BY m DESC) AS rk
    FROM v{r}
  ) GROUP BY src, dst
),
tau{r} AS MATERIALIZED (
  SELECT t.src, t.dst, least(t.tau, coalesce(h.h, 0)) AS tau
  FROM tau{r - 1} t LEFT JOIN h{r} h ON h.src = t.src AND h.dst = t.dst
),"""
        )
    parts.append(
        f"""fin AS (
  SELECT e.src, e.dst, CAST(coalesce(t.tau, 0) + 2 AS BIGINT) AS trussness
  FROM te e LEFT JOIN tau{rounds} t ON t.src = e.src AND t.dst = e.dst
)
SELECT src, dst, trussness FROM fin"""
    )
    return "\n".join(parts)


_SQL_CONDENSATION = """
WITH RECURSIVE part_pairs AS MATERIALIZED (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
part_nodes AS MATERIALIZED (SELECT p_partkey AS id FROM part),
t13 AS MATERIALIZED (
  SELECT src, dst FROM part_pairs WHERE (src * 31 + dst) % 13 = 0
),
dedges AS MATERIALIZED (
  SELECT src, dst FROM t13 WHERE (src + dst) % 2 = 0
  UNION
  SELECT dst AS src, src AS dst FROM t13 WHERE (src + dst) % 3 = 0
),
reach(src, dst) AS (
  SELECT id, id FROM part_nodes
  UNION
  SELECT r.src, e.dst FROM reach r JOIN dedges e ON e.src = r.dst
),
scc AS MATERIALIZED (
  SELECT a.src AS id, min(a.dst) AS component
  FROM reach a JOIN reach b ON a.src = b.dst AND a.dst = b.src
  GROUP BY a.src
),
cedges AS MATERIALIZED (
  SELECT DISTINCT s1.component AS src, s2.component AS dst
  FROM dedges e
  JOIN scc s1 ON s1.id = e.src
  JOIN scc s2 ON s2.id = e.dst
  WHERE s1.component <> s2.component
),
cnodes AS MATERIALIZED (SELECT DISTINCT component AS id FROM scc),
lp(id, d) AS (
  SELECT n.id, 0 FROM cnodes n
  WHERE NOT EXISTS (SELECT 1 FROM cedges e WHERE e.dst = n.id)
  UNION
  SELECT e.dst, r.d + 1 FROM lp r JOIN cedges e ON e.src = r.id
)
SELECT id AS component, CAST(max(d) AS BIGINT) AS layer FROM lp GROUP BY id"""

_SQL_EULERIAN = """WITH RECURSIVE part_pairs AS MATERIALIZED (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
part_nodes AS MATERIALIZED (SELECT p_partkey AS id FROM part),
te AS MATERIALIZED (
  SELECT src, dst FROM part_pairs WHERE (src * 31 + dst) % 23 = 0
),
ends AS (SELECT src AS id FROM te UNION ALL SELECT dst AS id FROM te),
deg AS (SELECT id, count(*) AS d FROM ends GROUP BY id),
oddc AS (SELECT count(*) AS n_odd FROM deg WHERE d % 2 = 1),
sym23 AS MATERIALIZED (
  SELECT src, dst FROM te UNION ALL SELECT dst AS src, src AS dst FROM te
),
reach(id, comp) AS (
  SELECT id, id FROM part_nodes
  UNION
  SELECT s.dst, r.comp FROM reach r JOIN sym23 s ON s.src = r.id
),
comps AS (
  SELECT count(DISTINCT mc) AS n_comp
  FROM (SELECT id, min(comp) AS mc FROM reach GROUP BY id)
)
SELECT CAST(o.n_odd AS INT) AS odd_degree_nodes,
       CAST(o.n_odd AS INT) AS unbalanced_nodes,
       CAST(c.n_comp AS INT) AS spanning_components,
       (o.n_odd = 0 AND c.n_comp <= 1) AS is_eulerian,
       (o.n_odd IN (0, 2) AND c.n_comp <= 1) AS has_eulerian_path
FROM oddc o, comps c"""

_SQL_2ECC = f"""WITH RECURSIVE {_SQL_BRIDGE_PREFIX},
kept AS MATERIALIZED (
  SELECT t.src, t.dst FROM te t ANTI JOIN bridge b ON b.src = t.src AND b.dst = t.dst
),
ksym AS MATERIALIZED (
  SELECT src, dst FROM kept UNION ALL SELECT dst AS src, src AS dst FROM kept
),
kreach(id, comp) AS (
  SELECT id, id FROM part_nodes
  UNION
  SELECT s.dst, r.comp FROM kreach r JOIN ksym s ON s.src = r.id
)
SELECT id, min(comp) AS component FROM kreach GROUP BY id
UNION ALL SELECT src AS id, dst AS component FROM trunc_canary"""


def _sql_topo() -> str:
    """Longest-path layers over the bucket-oriented part DAG via a
    recursive CTE: seed every node with no incoming DAG edge at depth 0,
    extend along edges, take max depth per node (UNION dedups (id, d)
    pairs so the expansion is bounded by n * max_layer <= 8n)."""
    return """WITH RECURSIVE part_pairs AS MATERIALIZED (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
part_nodes AS MATERIALIZED (SELECT p_partkey AS id FROM part),
dag AS MATERIALIZED (
  SELECT src, dst FROM part_pairs WHERE (src % 8) < (dst % 8)
  UNION ALL
  SELECT dst AS src, src AS dst FROM part_pairs WHERE (dst % 8) < (src % 8)
),
reach(id, d) AS (
  SELECT n.id, 0 FROM part_nodes n
  WHERE NOT EXISTS (SELECT 1 FROM dag e WHERE e.dst = n.id)
  UNION
  SELECT e.dst, r.d + 1 FROM reach r JOIN dag e ON e.src = r.id
)
SELECT id, CAST(max(d) AS BIGINT) AS layer FROM reach GROUP BY id"""


def _sql_fiedler(iters: int = 40, seed: int = 42) -> str:
    """Deflated power iteration unrolled: x0 md5-uniform, per step
    subtract the mean (deflate the all-ones eigenvector), apply
    B = c·I − L as (c−d)·x + Σ_nbr x, L2-normalize."""
    parts = [
        """WITH part_pairs AS MATERIALIZED (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
part_nodes AS MATERIALIZED (SELECT p_partkey AS id FROM part),
sym AS MATERIALIZED (
  SELECT src, dst FROM part_pairs
  UNION ALL
  SELECT dst AS src, src AS dst FROM part_pairs
),
deg AS MATERIALIZED (
  SELECT src AS id, COUNT(*)::DOUBLE AS d FROM sym GROUP BY src
),
cc AS (SELECT 2.0 * MAX(d) AS c FROM deg),""",
        f"""x0 AS MATERIALIZED (
  SELECT n.id, COALESCE(dg.d, 0.0) AS d,
         ('0x' || substr(md5('fiedler|{seed}|' || n.id::VARCHAR), 1, 15))::UBIGINT::DOUBLE
           / 1152921504606846976.0 - 0.5 AS x
  FROM part_nodes n LEFT JOIN deg dg ON dg.id = n.id
),""",
    ]
    for r in range(iters):
        parts.append(
            f"""m{r} AS (SELECT AVG(x) AS mu FROM x{r}),
c{r} AS MATERIALIZED (
  SELECT id, d, x - (SELECT mu FROM m{r}) AS xc FROM x{r}
),
s{r} AS MATERIALIZED (
  SELECT e.src AS id, SUM(l.xc) AS s
  FROM sym e JOIN c{r} l ON l.id = e.dst GROUP BY e.src
),
y{r} AS MATERIALIZED (
  SELECT t.id, t.d,
         ((SELECT c FROM cc) - t.d) * t.xc + COALESCE(s.s, 0.0) AS y
  FROM c{r} t LEFT JOIN s{r} s ON s.id = t.id
),
n{r} AS (SELECT SQRT(SUM(y * y)) AS nrm FROM y{r}),
x{r + 1} AS MATERIALIZED (
  SELECT id, d,
         CASE WHEN (SELECT nrm FROM n{r}) > 0
              THEN y / (SELECT nrm FROM n{r}) ELSE y END AS x
  FROM y{r}
),"""
        )
    joined = "\n".join(parts)
    if joined.endswith(","):
        joined = joined[:-1]
    return joined + f"\nSELECT id, x AS f FROM x{iters}"


def _sql_matching(
    rounds: int = 14, seed: int = 42, cover: bool = False, coarsen: bool = False
) -> str:
    """Dominant-edge maximal matching unrolled (operators/matching.py):
    per round an edge wins when its globally-unique priority string
    (md5(seed|src|dst) || '|src|dst') is the min over live edges at BOTH
    endpoints; both endpoints retire.  9 rounds reach the fixpoint at
    sf0.01; the extra rounds are empty no-ops (same over-unroll
    convention as the MIS oracle)."""
    parts = [
        """WITH part_pairs AS MATERIALIZED (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),""",
        f"""e0 AS MATERIALIZED (
  SELECT src, dst,
         concat_ws('|', md5(concat_ws('|', {seed}, src, dst)), src, dst) AS pri
  FROM part_pairs
),""",
    ]
    for r in range(rounds):
        parts.append(
            f"""nm{r} AS MATERIALIZED (
  SELECT id, min(pri) AS minp FROM (
    SELECT src AS id, pri FROM e{r}
    UNION ALL SELECT dst AS id, pri FROM e{r}
  ) GROUP BY id
),
w{r} AS MATERIALIZED (
  SELECT e.src, e.dst FROM e{r} e
  JOIN nm{r} ns ON ns.id = e.src AND ns.minp = e.pri
  JOIN nm{r} nd ON nd.id = e.dst AND nd.minp = e.pri
),
e{r + 1} AS MATERIALIZED (
  SELECT e.src, e.dst, e.pri FROM e{r} e
  ANTI JOIN (SELECT src AS id FROM w{r} UNION SELECT dst AS id FROM w{r}) a
    ON a.id = e.src
  ANTI JOIN (SELECT src AS id FROM w{r} UNION SELECT dst AS id FROM w{r}) b
    ON b.id = e.dst
),"""
        )
    union = "\nUNION ALL ".join(f"SELECT src, dst FROM w{r}" for r in range(rounds))
    parts.append(f"matched AS ({union})")
    if cover:
        parts.append(
            "SELECT DISTINCT id FROM"
            " (SELECT src AS id FROM matched UNION ALL SELECT dst AS id FROM matched)"
        )
    elif coarsen:
        parts.append(
            """, nmap AS (SELECT dst AS id, src AS rep FROM matched),
relabel AS (
  SELECT coalesce(m1.rep, p.src) AS a, coalesce(m2.rep, p.dst) AS b
  FROM part_pairs p
  LEFT JOIN nmap m1 ON m1.id = p.src
  LEFT JOIN nmap m2 ON m2.id = p.dst
)
SELECT least(a, b) AS src, greatest(a, b) AS dst, count(*)::BIGINT AS weight
FROM relabel WHERE a <> b GROUP BY 1, 2"""
        )
    else:
        parts.append("SELECT src, dst FROM matched")
    return "\n".join(parts)


def _sql_coloring(rounds: int = 16, seed: int = 42) -> str:
    """Speculative coloring unrolled: per round every undecided node
    picks the mex over COMMITTED neighbor colors (list_filter over
    range(0, |used|+1), matching Spark's sequence/array_except), then
    same-pick edges send the higher-md5-priority endpoint back.
    Over-unrolled; empty rounds are no-ops."""
    parts = [
        """WITH part_pairs AS MATERIALIZED (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  WHERE (a.l_partkey + b.l_partkey) % 7 = 0
),
part_nodes AS MATERIALIZED (SELECT p_partkey AS id FROM part),
sym AS MATERIALIZED (
  SELECT src, dst FROM part_pairs
  UNION ALL
  SELECT dst AS src, src AS dst FROM part_pairs
),""",
        f"u0 AS MATERIALIZED (SELECT id, md5(concat_ws('|', {seed}, id)) AS pri FROM part_nodes),",
        "col0 AS MATERIALIZED (SELECT id, 0::BIGINT AS color FROM part_nodes WHERE false),",
    ]
    for r in range(rounds):
        parts.append(
            f"""pk{r} AS MATERIALIZED (
  SELECT id, pri,
         coalesce(list_min(list_filter(range(0, coalesce(len(used), 0) + 1),
                                       x -> NOT list_contains(coalesce(used, []), x))),
                  0)::BIGINT AS pick
  FROM (
    SELECT u.id, u.pri,
           list(DISTINCT c2.color) FILTER (WHERE c2.color IS NOT NULL) AS used
    FROM u{r} u
    LEFT JOIN sym e ON e.src = u.id
    LEFT JOIN col{r} c2 ON c2.id = e.dst
    GROUP BY u.id, u.pri
  )
),
ls{r} AS MATERIALIZED (
  SELECT DISTINCT p1.id
  FROM pk{r} p1
  JOIN sym e ON e.src = p1.id
  JOIN pk{r} p2 ON p2.id = e.dst AND p2.pick = p1.pick
  WHERE p2.pri < p1.pri
),
col{r + 1} AS MATERIALIZED (
  SELECT * FROM col{r}
  UNION ALL
  SELECT p.id, p.pick AS color FROM pk{r} p ANTI JOIN ls{r} l ON l.id = p.id
),
u{r + 1} AS MATERIALIZED (
  SELECT u.id, u.pri FROM u{r} u SEMI JOIN ls{r} l ON l.id = u.id
),"""
        )
    parts.append(f"final AS (SELECT id, color FROM col{rounds})")
    parts.append("SELECT id, color FROM final")
    return "\n".join(parts)


def _sql_node2vec(
    n_starts: int = 16,
    num_walks: int = 2,
    walk_length: int = 6,
    p: float = 2.0,
    q: float = 0.5,
    seed: int = 42,
) -> str:
    """Step-unrolled node2vec replay: chains carry (prev, node); each
    hop's alpha is decided by an equality test against prev plus a LEFT
    join against the neighbor-pair set, then arg_max of ln(u)/alpha —
    the exact arithmetic of operators/walks.py:node2vec_walks."""
    inv_p, inv_q = 1.0 / p, 1.0 / q
    u = (
        "((('0x' || substr(md5(concat_ws('|', {seed}, c.walk, {k}, c.node, e.dst)), 1, 15))"
        "::UBIGINT)::DOUBLE / 1152921504606846976.0)"
    )
    parts = [
        """WITH part_pairs AS MATERIALIZED (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
part_nodes AS MATERIALIZED (SELECT p_partkey AS id FROM part),
sym AS MATERIALIZED (
  SELECT src, dst FROM part_pairs
  UNION ALL
  SELECT dst AS src, src AS dst FROM part_pairs
),""",
        f"starts AS (SELECT id AS start FROM part_nodes ORDER BY id LIMIT {n_starts}),",
        "wk AS (SELECT unnest(range({n})) AS walk),".format(n=num_walks),
        "c0 AS MATERIALIZED (SELECT start, walk, NULL::BIGINT AS prev, start AS node FROM starts CROSS JOIN wk),",
        # step 1 is first-order: arg_max of ln(u)/1
        f"""c1 AS MATERIALIZED (
  SELECT c.start, c.walk, c.node AS prev,
         arg_max(e.dst, ln({u.format(seed=seed, k=1)})) AS node
  FROM c0 c JOIN sym e ON e.src = c.node
  GROUP BY c.start, c.walk, c.node
),""",
    ]
    for k in range(2, walk_length + 1):
        uk = u.format(seed=seed, k=k)
        parts.append(
            f"""c{k} AS MATERIALIZED (
  SELECT c.start, c.walk, c.node AS prev,
         arg_max(e.dst,
                 ln({uk}) / (CASE WHEN e.dst = c.prev THEN {inv_p!r}
                                  WHEN n.src IS NOT NULL THEN 1.0
                                  ELSE {inv_q!r} END)) AS node
  FROM c{k - 1} c
  JOIN sym e ON e.src = c.node
  LEFT JOIN sym n ON n.src = c.prev AND n.dst = e.dst
  GROUP BY c.start, c.walk, c.node
),"""
        )
    union = "\nUNION ALL ".join(
        f"SELECT start, walk, {k}::BIGINT AS step, node FROM c{k}"
        for k in range(0, walk_length + 1)
    )
    parts.append(f"allsteps AS ({union})")
    parts.append("SELECT start, walk, step, node FROM allsteps")
    return "\n".join(parts)


def _sql_node2vec_rejection(
    n_starts: int = 16,
    num_walks: int = 2,
    walk_length: int = 6,
    p: float = 2.0,
    q: float = 0.5,
    seed: int = 42,
    attempts: int = 4,
) -> str:
    """Replay of walks.py method='rejection': per hop, T md5 min_by
    proposals per (walk, node); acceptance iff md5-uniform ua <
    alpha/alpha_max (alpha class via prev-equality + pair EXISTS);
    first accepted t wins (min_by over t); all-rejected states fall
    back to the exact ES arg_max(ln(u)/alpha) draw — line for line the
    kernel's arithmetic, so walks are bit-identical."""
    a_ret, a_nbr, a_oth = 1.0 / p, 1.0, 1.0 / q
    a_max = max(a_ret, a_nbr, a_oth)
    acc_ret, acc_nbr, acc_oth = a_ret / a_max, a_nbr / a_max, a_oth / a_max
    hexdiv = "1152921504606846976.0"
    parts = [
        f"""WITH part_pairs AS MATERIALIZED (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
part_nodes AS MATERIALIZED (SELECT p_partkey AS id FROM part),
sym AS MATERIALIZED (
  SELECT src, dst FROM part_pairs
  UNION ALL
  SELECT dst AS src, src AS dst FROM part_pairs
),
starts AS (SELECT id AS start FROM part_nodes ORDER BY id LIMIT {n_starts}),
wk AS (SELECT unnest(range({num_walks})) AS walk),
c0 AS MATERIALIZED (
  SELECT start, walk, NULL::BIGINT AS prev, start AS node
  FROM starts CROSS JOIN wk
),
c1 AS MATERIALIZED (
  SELECT c.start, c.walk, c.node AS prev,
         min_by(e.dst, md5(concat_ws('|', {seed}, c.walk, 1, c.node, e.dst))) AS node
  FROM c0 c JOIN sym e ON e.src = c.node
  GROUP BY c.start, c.walk, c.node
),""",
    ]
    for k in range(2, walk_length + 1):
        prop_cols = ",\n         ".join(
            f"min_by(e.dst, md5(concat_ws('|', {seed}, d.walk, {k}, {t}, d.node, e.dst))) AS _c{t}"
            for t in range(1, attempts + 1)
        )
        exp_union = "\n    UNION ALL ".join(
            f"SELECT s.walk, s.prev, s.node, {t} AS t, p._c{t} AS cand "
            f"FROM st{k} s JOIN pr{k} p ON p.walk = s.walk AND p.node = s.node"
            for t in range(1, attempts + 1)
        )
        parts.append(
            f"""st{k} AS MATERIALIZED (
  SELECT DISTINCT walk, prev, node FROM c{k - 1}
),
pr{k} AS MATERIALIZED (
  SELECT d.walk, d.node,
         {prop_cols}
  FROM (SELECT DISTINCT walk, node FROM st{k}) d
  JOIN sym e ON e.src = d.node
  GROUP BY d.walk, d.node
),
ex{k} AS MATERIALIZED (
    {exp_union}
),
ac{k} AS MATERIALIZED (
  SELECT walk, prev, node, t, cand,
         CASE WHEN cand = prev THEN {acc_ret!r}
              WHEN EXISTS (SELECT 1 FROM sym n
                           WHERE n.src = ex{k}.prev AND n.dst = ex{k}.cand)
                   THEN {acc_nbr!r}
              ELSE {acc_oth!r} END AS ap,
         ((('0x' || substr(md5(concat_ws('|', {seed}, walk, {k}, t, 'a', prev,
                                         node, cand)), 1, 15))::UBIGINT)::DOUBLE
          / {hexdiv}) AS ua
  FROM ex{k}
),
fi{k} AS MATERIALIZED (
  SELECT walk, prev, node, min_by(cand, t) AS nxt
  FROM ac{k} WHERE ua < ap
  GROUP BY walk, prev, node
),
rs{k} AS MATERIALIZED (
  SELECT s.walk, s.prev, s.node,
         arg_max(e.dst,
                 ln((('0x' || substr(md5(concat_ws('|', {seed}, s.walk, {k},
                                                   s.node, e.dst)), 1, 15))
                     ::UBIGINT)::DOUBLE / {hexdiv})
                 / (CASE WHEN e.dst = s.prev THEN {a_ret!r}
                         WHEN n.src IS NOT NULL THEN {a_nbr!r}
                         ELSE {a_oth!r} END)) AS nxt
  FROM (SELECT t.* FROM st{k} t
        WHERE NOT EXISTS (SELECT 1 FROM fi{k} f
                          WHERE f.walk = t.walk AND f.prev IS NOT DISTINCT FROM t.prev
                            AND f.node = t.node)) s
  JOIN sym e ON e.src = s.node
  LEFT JOIN sym n ON n.src = s.prev AND n.dst = e.dst
  GROUP BY s.walk, s.prev, s.node
),
hp{k} AS MATERIALIZED (
  SELECT walk, prev, node, nxt FROM fi{k}
  UNION ALL
  SELECT walk, prev, node, nxt FROM rs{k}
),
c{k} AS MATERIALIZED (
  SELECT c.start, c.walk, c.node AS prev, h.nxt AS node
  FROM c{k - 1} c
  JOIN hp{k} h ON h.walk = c.walk AND h.prev IS NOT DISTINCT FROM c.prev
              AND h.node = c.node
),"""
        )
    union = "\nUNION ALL ".join(
        f"SELECT start, walk, {k}::BIGINT AS step, node FROM c{k}"
        for k in range(0, walk_length + 1)
    )
    joined = "\n".join(parts)
    if joined.endswith(","):
        joined = joined[:-1]
    return joined + f",\nallsteps AS ({union})\nSELECT start, walk, step, node FROM allsteps"


# sampled harmonic centrality: 48 lowest-id pivots, sum(1/dist) per node
# (mirrors operators/centrality.py:harmonic_centrality(sources=...))
_SQL_HARMONIC = f"""
WITH RECURSIVE {_SQL_PART.strip()},
srcs AS (SELECT id AS s FROM part_nodes ORDER BY id LIMIT 48),
reach(source, id, lvl) AS (
  SELECT s, s, 0::BIGINT FROM srcs
  UNION
  SELECT r.source, e.dst, r.lvl + 1
  FROM reach r JOIN sym e ON e.src = r.id
  WHERE r.lvl < 12
),
dist AS (SELECT source, id, min(lvl) AS d FROM reach GROUP BY source, id),
h AS (SELECT id, sum(1.0 / d) AS h FROM dist WHERE source <> id GROUP BY id)
SELECT n.id, round(coalesce(h.h, 0.0), 6) AS harmonic
FROM part_nodes n LEFT JOIN h ON n.id = h.id
"""

#: The dense candidate index replays assign_dense_ids' sorted-key order
#: as a plain row_number; draws, rejections, and ranking are integer-
#: exact, so the oracle selects the identical pairs.  The least() clamp
#: mirrors sampling.py's double-rounding guard.
_SQL_NEG_CAND = f"""
{_SQL_PART.strip()},
nn AS MATERIALIZED (SELECT count(*) AS n FROM part_nodes),
nidx AS MATERIALIZED (
  SELECT id AS key, row_number() OVER (ORDER BY id) - 1 AS idx
  FROM part_nodes
),
cand AS (
  SELECT s.id AS src, j.j,
         least(floor((('0x' || substr(md5('{{salt}}:' || s.id || ':' || j.j), 1, 15))::UBIGINT
                      / 1152921504606846976.0) * nn.n)::BIGINT,
               nn.n - 1) AS idx
  FROM part_nodes s CROSS JOIN nn CROSS JOIN generate_series(0, 7) AS j(j)
),
firstj AS (
  SELECT c.src, x.key AS dst, min(c.j) AS j
  FROM cand c JOIN nidx x ON x.idx = c.idx
  WHERE x.key <> c.src
    AND NOT EXISTS (SELECT 1 FROM sym e WHERE e.src = c.src AND e.dst = x.key)
  GROUP BY c.src, x.key
),
ranked AS (
  SELECT src, dst, j,
         row_number() OVER (PARTITION BY src ORDER BY j, dst) AS rn
  FROM firstj
)
"""

_SQL_NEGATIVE_SAMPLE = f"""
WITH {_SQL_NEG_CAND.strip().format(salt="neg")}
SELECT src, dst, j FROM ranked WHERE rn <= 2
"""

_SQL_LINKPRED_TRAINSET = f"""
WITH {_SQL_NEG_CAND.strip().format(salt="lp:neg")},
pos AS (
  SELECT least(src, dst) AS src, greatest(src, dst) AS dst, 1 AS label
  FROM sym GROUP BY 1, 2
),
lp_rows AS (
  SELECT src, dst, label FROM pos
  UNION ALL
  SELECT src, dst, 0 AS label FROM ranked WHERE rn <= 2
)
SELECT src, dst, label,
       CASE WHEN ('0x' || substr(md5('lp:split:' || src || ':' || dst), 1, 15))::UBIGINT
                 / 1152921504606846976.0 < 0.2
            THEN 'test' ELSE 'train' END AS split
FROM lp_rows
"""

#: Ranking by the raw md5 UBIGINT equals Spark's ranking by the derived
#: double u (monotone), with dst as the integer tie-break.
_SQL_KHOP_SAMPLE = f"""
WITH {_SQL_PART.strip()},
h1 AS MATERIALIZED (
  SELECT 1 AS hop, src, dst FROM (
    SELECT e.src, e.dst,
           row_number() OVER (PARTITION BY e.src ORDER BY
             ('0x' || substr(md5('khop:1:' || e.src || ':' || e.dst), 1, 15))::UBIGINT,
             e.dst) AS rn
    FROM sym e JOIN part_nodes n ON n.id = e.src
  ) WHERE rn <= 3
),
f2 AS MATERIALIZED (SELECT DISTINCT dst AS id FROM h1),
h2 AS (
  SELECT 2 AS hop, src, dst FROM (
    SELECT e.src, e.dst,
           row_number() OVER (PARTITION BY e.src ORDER BY
             ('0x' || substr(md5('khop:2:' || e.src || ':' || e.dst), 1, 15))::UBIGINT,
             e.dst) AS rn
    FROM sym e JOIN f2 ON f2.id = e.src
  ) WHERE rn <= 2
)
SELECT hop, src, dst FROM h1
UNION ALL
SELECT hop, src, dst FROM h2
"""

#: pos is 0-based in Spark's posexplode; generate_subscripts is 1-based.
#: Dyadic scaled-integer replay (the ANF contract): vals snapped to the
#: 2^-20 grid as BIGINT, sums exact (cast sum back to BIGINT — DuckDB's
#: sum(BIGINT) widens to HUGEINT), per-round mean = floor of the IEEE
#: quotient (identical in both engines for |s| << 2^53), final /2^20
#: exact — bit-identical to Spark with no rounding.
_SQL_FEATURE_PROP = f"""
WITH {_SQL_PART.strip()},
f0 AS MATERIALIZED (
  SELECT n.id,
         generate_subscripts(e.embedding, 1) - 1 AS pos,
         floor(unnest(e.embedding)::DOUBLE * 1048576.0)::BIGINT AS val
  FROM part_nodes n JOIN embeddings e ON e.vec_id = n.id % 500
),
deg AS MATERIALIZED (SELECT dst AS id, count(*) + 1 AS d FROM sym GROUP BY dst),
it1 AS MATERIALIZED (
  SELECT s.id, s.pos, floor(s.s / coalesce(g.d, 1))::BIGINT AS val
  FROM (
    SELECT id, pos, sum(val)::BIGINT AS s FROM (
      SELECT id, pos, val FROM f0
      UNION ALL
      SELECT e.dst AS id, f.pos, f.val FROM f0 f JOIN sym e ON e.src = f.id
    ) GROUP BY id, pos
  ) s LEFT JOIN deg g ON g.id = s.id
),
it2 AS (
  SELECT s.id, s.pos, floor(s.s / coalesce(g.d, 1))::BIGINT AS val
  FROM (
    SELECT id, pos, sum(val)::BIGINT AS s FROM (
      SELECT id, pos, val FROM it1
      UNION ALL
      SELECT e.dst AS id, f.pos, f.val FROM it1 f JOIN sym e ON e.src = f.id
    ) GROUP BY id, pos
  ) s LEFT JOIN deg g ON g.id = s.id
)
SELECT id, pos, (val / 1048576.0) AS val FROM it2
"""

_SQL_CHUNK_DOCUMENTS = """
WITH t AS (
  SELECT doc_id,
         len(regexp_split_to_array(trim(text), '\\s+'))::BIGINT AS n,
         1 + (greatest(len(regexp_split_to_array(trim(text), '\\s+'))::BIGINT - 128, 0)
              + 95) // 96 AS n_chunks
  FROM documents
)
SELECT doc_id,
       chunk_id,
       (chunk_id * 96)::BIGINT AS begin_tok,
       least(128, n - chunk_id * 96)::BIGINT AS n_toks
FROM (SELECT doc_id, n, unnest(range(0, n_chunks)) AS chunk_id FROM t)
"""

#: Closeness needs ALL-pairs distances, so the recursive-CTE pattern used
#: by the 48-source harmonic oracle blows up here (each reached node
#: reappears at every deeper level under UNION dedup on the (source, id,
#: lvl) triple -> ~44M states x degree-115 joins).  Instead: a bounded
#: MATERIALIZED frontier-delta chain.  The sf0.01 part graph has diameter
#: 3 with every pair reachable (measured via dense numpy BFS), so f1/f2
#: forward expansion plus a distance-3 step computed from the TINY
#: unreached-after-2 complement (13.9k of 4M pairs) covers it; f4 is kept
#: as the emptiness witness so a deeper graph would surface as a value
#: mismatch rather than silently under-counting.
_SQL_CLOSENESS = f"""
WITH {_SQL_PART.strip()},
nn AS MATERIALIZED (SELECT count(*) AS n FROM part_nodes),
f1 AS MATERIALIZED (SELECT src AS source, dst AS id FROM sym),
f2 AS MATERIALIZED (
  SELECT DISTINCT f1.source, e.dst AS id
  FROM f1 JOIN sym e ON e.src = f1.id
  WHERE e.dst <> f1.source
    AND NOT EXISTS (SELECT 1 FROM f1 k WHERE k.source = f1.source AND k.id = e.dst)
),
u3 AS MATERIALIZED (
  SELECT a.id AS source, b.id AS id
  FROM part_nodes a CROSS JOIN part_nodes b
  WHERE a.id <> b.id
    AND NOT EXISTS (SELECT 1 FROM f1 WHERE f1.source = a.id AND f1.id = b.id)
    AND NOT EXISTS (SELECT 1 FROM f2 WHERE f2.source = a.id AND f2.id = b.id)
),
f3 AS MATERIALIZED (
  SELECT DISTINCT u.source, u.id
  FROM u3 u JOIN sym e ON e.dst = u.id
  JOIN f2 ON f2.source = u.source AND f2.id = e.src
),
f4 AS MATERIALIZED (
  SELECT DISTINCT u.source, u.id
  FROM (SELECT source, id FROM u3 EXCEPT SELECT source, id FROM f3) u
  JOIN sym e ON e.dst = u.id
  JOIN f3 ON f3.source = u.source AND f3.id = e.src
),
dist AS (
  SELECT source, id, 1 AS d FROM f1
  UNION ALL SELECT source, id, 2 FROM f2
  UNION ALL SELECT source, id, 3 FROM f3
  UNION ALL SELECT source, id, 4 FROM f4
),
agg AS (
  SELECT source AS id, sum(d)::DOUBLE AS tot, count(*)::DOUBLE AS r
  FROM dist GROUP BY source
)
SELECT n.id,
       round(coalesce(
         CASE WHEN a.tot > 0 THEN (a.r / a.tot) * (a.r / (nn.n - 1)) END,
         0.0), 6) AS closeness
FROM part_nodes n LEFT JOIN agg a ON n.id = a.id CROSS JOIN nn
"""

_SQL_EGO = f"""
WITH RECURSIVE {_SQL_PART.strip()},
src0 AS (SELECT min(id) AS s FROM part_nodes),
reach(id, lvl) AS (
  SELECT s, 0::BIGINT FROM src0
  UNION
  SELECT e.dst, r.lvl + 1
  FROM reach r JOIN sym e ON e.src = r.id
  WHERE r.lvl < 2
),
ball AS (SELECT DISTINCT id FROM reach)
SELECT p.src, p.dst FROM part_pairs p
WHERE p.src IN (SELECT id FROM ball) AND p.dst IN (SELECT id FROM ball)
"""

_SQL_SQUARE_CLUSTERING = f"""WITH {_SQL_PART.strip()},
deg AS (SELECT src AS id, count(*)::BIGINT AS d FROM sym GROUP BY src),
wed AS (
  SELECT a.src AS v, a.dst AS u, b.dst AS w
  FROM sym a JOIN sym b ON a.src = b.src AND a.dst < b.dst
),
pair_cnt AS (SELECT u, w, count(*)::BIGINT AS cn FROM wed GROUP BY u, w),
per AS (
  SELECT wed.v, (pc.cn - 1) AS q,
         CASE WHEN th.src IS NOT NULL THEN 1 ELSE 0 END AS t,
         du.d AS ku, dw.d AS kw
  FROM wed
  JOIN pair_cnt pc ON wed.u = pc.u AND wed.w = pc.w
  LEFT JOIN part_pairs th ON wed.u = th.src AND wed.w = th.dst
  JOIN deg du ON wed.u = du.id
  JOIN deg dw ON wed.w = dw.id
),
agg AS (
  SELECT v, sum(q) AS numer,
         sum((ku - (q + 1 + t)) + (kw - (q + 1 + t)) + q) AS denom
  FROM per GROUP BY v
)
SELECT n.id,
       round(CASE WHEN coalesce(agg.denom, 0) > 0
             THEN agg.numer::DOUBLE / agg.denom ELSE 0.0 END, 6) AS sq_clustering
FROM part_nodes n LEFT JOIN agg ON n.id = agg.v
"""

_SQL_CLUSTERING_DIRECTED = f"""WITH {_SQL_PART_DIGRAPH.strip()},
offd AS (SELECT src, dst FROM dedges WHERE src <> dst),
b AS (
  SELECT src, dst, count(*)::DOUBLE AS b FROM (
    SELECT src, dst FROM offd UNION ALL SELECT dst AS src, src AS dst FROM offd
  ) GROUP BY src, dst
),
wed AS (
  SELECT e1.src AS i, e1.dst AS j, e2.dst AS k, e1.b AS bj, e2.b AS bk
  FROM b e1 JOIN b e2 ON e1.src = e2.src AND e1.dst < e2.dst
),
tri AS (
  SELECT i, sum(bj * bk * c.b) AS t
  FROM wed JOIN b c ON c.src = wed.j AND c.dst = wed.k
  GROUP BY i
),
dtot AS (
  SELECT id, count(*)::BIGINT AS d FROM (
    SELECT src AS id FROM offd UNION ALL SELECT dst FROM offd
  ) GROUP BY id
),
drec AS (
  SELECT a.src AS id, count(*)::BIGINT AS d
  FROM offd a JOIN offd r ON r.src = a.dst AND r.dst = a.src
  GROUP BY a.src
)
SELECT n.id,
       round(CASE WHEN dtot.d IS NOT NULL
                   AND (dtot.d * (dtot.d - 1) - 2 * coalesce(drec.d, 0)) > 0
             THEN coalesce(tri.t, 0)
                  / (dtot.d * (dtot.d - 1) - 2 * coalesce(drec.d, 0))
             ELSE 0.0 END, 6) AS clustering
FROM part_nodes n
LEFT JOIN dtot ON n.id = dtot.id
LEFT JOIN drec ON n.id = drec.id
LEFT JOIN tri ON n.id = tri.i
"""

_SQL_GENERALIZED_DEGREE = f"""WITH {_SQL_TRI_LIST},
tedges AS (
  SELECT least(a,b) AS src, greatest(a,b) AS dst FROM tri
  UNION ALL SELECT least(a,c), greatest(a,c) FROM tri
  UNION ALL SELECT least(b,c), greatest(b,c) FROM tri
),
sup AS (SELECT src, dst, count(*)::BIGINT AS s FROM tedges GROUP BY src, dst),
edge_t AS (
  SELECT p.src, p.dst, coalesce(sup.s, 0)::BIGINT AS ntri
  FROM part_pairs p LEFT JOIN sup ON p.src = sup.src AND p.dst = sup.dst
),
incident AS (
  SELECT src AS id, ntri FROM edge_t UNION ALL SELECT dst AS id, ntri FROM edge_t
)
SELECT id, ntri, count(*)::BIGINT AS n_edges FROM incident GROUP BY id, ntri
"""

_SQL_ISOLATES = f"""WITH {_SQL_PART.strip()}
SELECT n.id FROM part_nodes n
LEFT JOIN (SELECT DISTINCT src AS id FROM sym) e ON n.id = e.id
WHERE e.id IS NULL
"""

_SQL_SMETRIC = f"""WITH {_SQL_PART.strip()},
{_SQL_DEG_MINUS.strip()}
SELECT round(sum(du.d * dv.d)::DOUBLE, 6) AS s_metric
FROM part_pairs p
JOIN deg du ON p.src = du.id
JOIN deg dv ON p.dst = dv.id
"""

_SQL_RECIPROCITY = f"""WITH {_SQL_PART_DIGRAPH.strip()},
offd AS (SELECT src, dst FROM dedges WHERE src <> dst),
recip AS (
  SELECT a.src, a.dst FROM offd a
  WHERE EXISTS (SELECT 1 FROM offd b WHERE b.src = a.dst AND b.dst = a.src)
)
SELECT round((SELECT count(*) FROM recip)::DOUBLE / (SELECT count(*) FROM offd), 6)
       AS reciprocity
"""

_SQL_CONDUCTANCE = f"""WITH {_SQL_PART.strip()},
s AS (SELECT id FROM part_nodes WHERE id % 4 = 0),
cut AS (
  SELECT count(*)::BIGINT AS c FROM sym
  WHERE src IN (SELECT id FROM s) AND dst NOT IN (SELECT id FROM s)
),
vol_s AS (
  SELECT count(*)::BIGINT AS v FROM sym WHERE src IN (SELECT id FROM s)
),
vol_t AS (
  SELECT count(*)::BIGINT AS v FROM sym WHERE src NOT IN (SELECT id FROM s)
)
SELECT cut.c AS cut_size, vol_s.v AS volume,
       round(cut.c::DOUBLE / least(vol_s.v, vol_t.v), 6) AS conductance
FROM cut, vol_s, vol_t
"""

_SQL_NODE_BOUNDARY = f"""WITH {_SQL_PART.strip()},
s AS (SELECT id FROM part_nodes WHERE id % 10 = 0)
SELECT DISTINCT dst AS id FROM sym
WHERE src IN (SELECT id FROM s) AND dst NOT IN (SELECT id FROM s)
"""

_SQL_LAPLACIAN = f"""WITH {_SQL_PART.strip()},
wdeg AS (SELECT src AS id, count(*)::DOUBLE AS d FROM sym GROUP BY src),
entries AS (
  SELECT id AS row, id AS col, d AS value FROM wdeg
  UNION ALL
  SELECT src, dst, -1.0 FROM sym
)
SELECT row, col, round(sum(value), 6) AS value
FROM entries GROUP BY row, col HAVING sum(value) <> 0
"""

# ---- pipeline oracles ------------------------------------------------------

_BPE = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"

# corpus-trained add-one word-bigram LM score (mirrors
# pipeline/text.py:lm_scores): bigrams via list_zip of shifted slices,
# c1 = bigram-context counts, V = corpus distinct tokens
_SQL_LM_SCORE = """
WITH lsts AS MATERIALIZED (
  SELECT doc_id,
         str_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS lst
  FROM documents
),
bi AS MATERIALIZED (
  SELECT doc_id, z[1] AS w1, z[2] AS w2
  FROM (
    SELECT doc_id,
           unnest(list_zip(lst[1:len(lst) - 1], lst[2:len(lst)])) AS z
    FROM lsts
  )
),
uni AS MATERIALIZED (SELECT w1, count(*)::BIGINT AS c1 FROM bi GROUP BY w1),
bic AS MATERIALIZED (SELECT w1, w2, count(*)::BIGINT AS c2 FROM bi GROUP BY w1, w2),
voc AS (SELECT count(DISTINCT tok) AS v FROM (SELECT unnest(lst) AS tok FROM lsts)),
scored AS (
  SELECT b.doc_id,
         sum(ln((bic.c2 + 1.0) / (uni.c1 + voc.v))) AS lp,
         count(*) AS nb
  FROM bi b JOIN bic ON bic.w1 = b.w1 AND bic.w2 = b.w2
  JOIN uni ON uni.w1 = b.w1
  CROSS JOIN voc
  GROUP BY b.doc_id
)
SELECT d.doc_id,
       round(coalesce(s.lp, 0.0), 6) AS lm_logprob,
       round(coalesce(s.lp / s.nb, 0.0), 6) AS lm_per_token
FROM documents d LEFT JOIN scored s ON s.doc_id = d.doc_id
"""

_SQL_TOKEN_COUNTS = f"""
SELECT doc_id,
       len(regexp_split_to_array(trim(text), '\\s+'))::BIGINT AS ws_tokens,
       len(regexp_extract_all(text, '{_BPE}'))::BIGINT AS bpe_tokens
FROM documents
"""

_SQL_NORM = "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"

_SQL_REPETITION = f"""
WITH t AS (
  SELECT doc_id, regexp_split_to_array({_SQL_NORM}, ' ') AS w FROM documents
)
SELECT doc_id,
       len(w)::BIGINT AS n_words,
       CASE WHEN len(w) >= 2 THEN round(
         1.0 - len(list_distinct(list_transform(
                 generate_series(1, len(w) - 1),
                 i -> array_to_string(w[i:i+1], ' ')
               )))::DOUBLE / (len(w) - 1), 6)
       ELSE 0.0 END AS dup2_frac,
       CASE WHEN len(w) >= 3 THEN round(
         1.0 - len(list_distinct(list_transform(
                 generate_series(1, len(w) - 2),
                 i -> array_to_string(w[i:i+2], ' ')
               )))::DOUBLE / (len(w) - 2), 6)
       ELSE 0.0 END AS dup3_frac
FROM t
"""

_SQL_TOKEN_BUDGET_SAMPLE = """
WITH t AS (
  SELECT doc_id, source,
         len(regexp_split_to_array(trim(text), '\\s+'))::BIGINT AS ws_tokens
  FROM documents
),
r AS (
  SELECT source, least(1.0, 700.0 / sum(ws_tokens)) AS rate
  FROM t GROUP BY source
)
SELECT t.doc_id, t.source, t.ws_tokens
FROM t JOIN r USING (source)
WHERE ('0x' || substr(md5('budget:' || t.doc_id::VARCHAR), 1, 15))::UBIGINT
        / 1152921504606846976.0 < r.rate
"""

#: Ordering by the raw uniform u alone matches Spark's (bucket, u,
#: doc_id) order because bucket = floor(u * n_buckets) is monotone in u;
#: `//` is DuckDB integer division, matching Spark's `div`.
_SQL_PACK_SEQUENCES = """
WITH t AS (
  SELECT doc_id,
         len(regexp_split_to_array(trim(text), '\\s+'))::BIGINT AS ws_tokens,
         ('0x' || substr(md5('pack:' || doc_id::VARCHAR), 1, 15))::UBIGINT
           / 1152921504606846976.0 AS u
  FROM documents
),
laid AS (
  SELECT doc_id, ws_tokens,
         coalesce(sum(ws_tokens) OVER (
           ORDER BY u, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS begin_tok
  FROM t
)
SELECT doc_id, ws_tokens, begin_tok,
       begin_tok // 256 AS first_seq,
       (begin_tok + ws_tokens - 1) // 256 AS last_seq
FROM laid
"""

# PMI collocations (mirrors pipeline/text.py:pmi_bigrams)
_SQL_PMI_BIGRAMS = """
WITH w AS (
  SELECT doc_id,
         regexp_split_to_array(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS toks
  FROM documents
),
bg AS (
  SELECT toks[x] AS w1, toks[x + 1] AS w2
  FROM (SELECT toks, unnest(range(1, len(toks))) AS x FROM w)
),
big AS (
  SELECT w1, w2, count(*)::BIGINT AS n_pair FROM bg GROUP BY 1, 2
  HAVING count(*) >= 5
),
uni AS (
  SELECT tok, count(*)::BIGINT AS n_tok
  FROM (SELECT unnest(toks) AS tok FROM w) GROUP BY 1
),
tot AS (SELECT sum(greatest(len(toks) - 1, 0))::BIGINT AS n FROM w)
SELECT b.w1, b.w2, b.n_pair,
       round(ln(tot.n::DOUBLE * b.n_pair / (u1.n_tok * u2.n_tok)), 6) AS pmi
FROM big b
JOIN uni u1 ON u1.tok = b.w1
JOIN uni u2 ON u2.tok = b.w2
CROSS JOIN tot
ORDER BY pmi DESC, b.w1, b.w2
LIMIT 100
"""

# per-doc unigram entropy (mirrors pipeline/text.py:doc_entropy)
_SQL_DOC_ENTROPY = """
WITH w AS (
  SELECT doc_id,
         regexp_split_to_array(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS toks
  FROM documents
),
cnt AS (
  SELECT doc_id, tok, count(*)::BIGINT AS c
  FROM (SELECT doc_id, unnest(toks) AS tok FROM w) GROUP BY 1, 2
),
tot AS (SELECT doc_id, sum(c)::BIGINT AS n_tokens FROM cnt GROUP BY 1)
SELECT cnt.doc_id, t.n_tokens,
       round(-sum((c::DOUBLE / t.n_tokens) * ln(c::DOUBLE / t.n_tokens)), 6) AS entropy
FROM cnt JOIN tot t ON cnt.doc_id = t.doc_id
GROUP BY cnt.doc_id, t.n_tokens
"""

# CCNet-style span dedup (mirrors pipeline/text.py::strip_repeated_spans:
# non-overlapping 8-token windows, md5-keyed global duplicate set at
# min_docs=2, in-order reassembly of surviving windows)
_SQL_SPAN_DEDUP = """
WITH w AS (
  SELECT doc_id,
         regexp_split_to_array(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS toks
  FROM documents
),
base AS (
  SELECT doc_id, toks, CAST(ceil(len(toks) / 8.0) AS BIGINT) AS n_spans FROM w
),
spans AS (
  SELECT doc_id, i AS idx,
         array_to_string(toks[i*8+1 : i*8+8], ' ') AS span
  FROM base, range(0, 4096) t(i)
  WHERE i < n_spans
),
dup AS (
  SELECT md5(span) AS h FROM spans GROUP BY 1 HAVING count(DISTINCT doc_id) >= 2
),
kept AS (SELECT * FROM spans WHERE md5(span) NOT IN (SELECT h FROM dup)),
clean AS (
  SELECT doc_id, string_agg(span, ' ' ORDER BY idx) AS clean_text,
         count(*)::BIGINT AS n_kept
  FROM kept GROUP BY doc_id
)
SELECT b.doc_id,
       coalesce(c.clean_text, '') AS clean_text,
       b.n_spans,
       (b.n_spans - coalesce(c.n_kept, 0))::BIGINT AS n_spans_dropped
FROM base b LEFT JOIN clean c ON b.doc_id = c.doc_id
"""

# token-balanced shard manifest (mirrors pipeline/curation.py:
# training_shards / shard_manifest; same tape as pack_sequences, salt
# 'shard', shard = begin_tok div 2000)
_SQL_SHARD_MANIFEST = """
WITH t AS (
  SELECT doc_id,
         len(regexp_split_to_array(trim(text), '\\s+'))::BIGINT AS ws_tokens,
         ('0x' || substr(md5('shard:' || doc_id::VARCHAR), 1, 15))::UBIGINT
           / 1152921504606846976.0 AS u
  FROM documents
),
laid AS (
  SELECT doc_id, ws_tokens,
         coalesce(sum(ws_tokens) OVER (
           ORDER BY u, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS begin_tok
  FROM t
)
SELECT begin_tok // 2000 AS shard,
       count(*)::BIGINT AS n_docs,
       sum(ws_tokens)::BIGINT AS tokens
FROM laid GROUP BY 1
"""

_SQL_WEIGHTED_SAMPLE = """
WITH t AS (
  SELECT doc_id, source,
         len(regexp_split_to_array(trim(text), '\\s+'))::BIGINT AS ws_tokens,
         ('0x' || substr(md5('wsample:' || doc_id::VARCHAR), 1, 15))::UBIGINT
           / 1152921504606846976.0 AS u
  FROM documents
)
SELECT doc_id, source, ws_tokens
FROM t
ORDER BY pow(u, 1.0 / ws_tokens) DESC, doc_id
LIMIT 100
"""

# per-source cap, longest-first with doc_id tiebreak (mirrors
# pipeline/curation.py:domain_cap's histogram-threshold plan)
_SQL_DOMAIN_CAP = """
WITH hist AS (
  SELECT source, n_chars, count(*)::BIGINT AS cnt
  FROM documents GROUP BY source, n_chars
),
running AS (
  SELECT source, n_chars, cnt,
         sum(cnt) OVER (PARTITION BY source ORDER BY n_chars DESC) - cnt AS above
  FROM hist
),
whole AS (SELECT source, n_chars FROM running WHERE above + cnt <= 20),
bnd AS (
  SELECT source, n_chars, 20 - above AS quota
  FROM running WHERE above < 20 AND above + cnt > 20
),
keptw AS (
  SELECT d.doc_id, d.source, d.n_chars
  FROM documents d JOIN whole w ON d.source = w.source AND d.n_chars = w.n_chars
),
keptb AS (
  SELECT doc_id, source, n_chars FROM (
    SELECT d.doc_id, d.source, d.n_chars, b.quota,
           row_number() OVER (PARTITION BY d.source ORDER BY d.doc_id) AS rn
    FROM documents d JOIN bnd b ON d.source = b.source AND d.n_chars = b.n_chars
  ) WHERE rn <= quota
)
SELECT * FROM keptw UNION ALL SELECT * FROM keptb
"""

_SQL_SOURCE_MIX = """
WITH t AS (
  SELECT source,
         len(regexp_split_to_array(trim(text), '\\s+'))::BIGINT AS tok
  FROM documents
),
a AS (
  SELECT source, count(*)::BIGINT AS n_docs, sum(tok)::BIGINT AS ws_tokens
  FROM t GROUP BY source
)
SELECT source, n_docs, ws_tokens,
       round(ws_tokens::DOUBLE / sum(ws_tokens) OVER (), 6) AS token_share
FROM a
"""

_SQL_COMMON_NGRAMS = f"""
WITH t AS (
  SELECT doc_id, regexp_split_to_array({_SQL_NORM}, ' ') AS w FROM documents
),
g AS (
  SELECT doc_id,
         unnest(CASE WHEN len(w) >= 3 THEN list_transform(
                  generate_series(1, len(w) - 2),
                  i -> array_to_string(w[i:i+2], ' '))
                ELSE [] END) AS ngram
  FROM t
)
SELECT ngram,
       count(DISTINCT doc_id)::BIGINT AS n_docs,
       count(*)::BIGINT AS n_occurrences
FROM g
GROUP BY ngram
HAVING count(DISTINCT doc_id) >= 2
ORDER BY n_occurrences DESC, ngram ASC
LIMIT 100
"""

_SQL_TFIDF_TOPTERMS = f"""
WITH t AS (
  SELECT doc_id, unnest(regexp_split_to_array({_SQL_NORM}, ' ')) AS term
  FROM documents
),
p AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf
  FROM t WHERE term <> '' GROUP BY doc_id, term
),
d AS (SELECT term, count(*)::BIGINT AS df FROM p GROUP BY term),
n AS (SELECT count(DISTINCT doc_id) AS n FROM documents),
s AS (
  SELECT doc_id, p.term AS term, tf, df,
         round(tf * ln(n::DOUBLE / df), 6) AS tfidf,
         row_number() OVER (
           PARTITION BY doc_id
           ORDER BY round(tf * ln(n::DOUBLE / df), 6) DESC, p.term ASC
         ) AS rk
  FROM p JOIN d USING (term) CROSS JOIN n
)
SELECT doc_id, term, tf, df, tfidf FROM s WHERE rk <= 5
"""

_SQL_FINGERPRINTS = f"SELECT doc_id, md5({_SQL_NORM}) AS fingerprint FROM documents"

_SQL_EXACT_DUPS = f"""
WITH fp AS (SELECT doc_id, md5({_SQL_NORM}) AS f FROM documents),
g AS (SELECT f, min(doc_id) AS canonical_id, count(*) AS n FROM fp GROUP BY f)
SELECT fp.doc_id, g.canonical_id FROM fp JOIN g ON fp.f = g.f WHERE g.n >= 2
"""

_STOPWORDS = "('the','and','of','to','in','is','data','value')"

_SQL_QUALITY = f"""
WITH t AS (
  SELECT doc_id,
         length(text)::BIGINT AS n_chars_q,
         regexp_split_to_array(trim(text), '\\s+') AS toks,
         len(regexp_extract_all(text, '[^\\w\\s]'))::BIGINT AS punct
  FROM documents
),
m AS (
  SELECT doc_id, n_chars_q, punct,
         len(toks)::BIGINT AS n_tokens,
         len(list_filter(toks, x -> x IN {_STOPWORDS}))::BIGINT AS n_stop
  FROM t
)
SELECT doc_id, n_chars_q, n_tokens,
       round((n_chars_q - (n_tokens - 1))::DOUBLE / n_tokens, 6) AS mean_token_len,
       round(punct::DOUBLE / greatest(n_chars_q, 1), 6) AS punct_ratio,
       round(n_stop::DOUBLE / greatest(n_tokens, 1), 6) AS stopword_ratio,
       round(greatest(CASE WHEN n_tokens < 5 THEN 0.0 ELSE
         least(1.0,
           0.5 * (1.0 - (punct::DOUBLE / greatest(n_chars_q, 1)) * 10.0)
           + 0.3 * least((n_stop::DOUBLE / greatest(n_tokens, 1)) * 5.0, 1.0)
           + 0.2 * least(n_tokens / 100.0, 1.0))
         END, 0.0), 6) AS quality
FROM m
"""


def _sql_clean_corpus() -> str:
    """Composition oracle for pipeline/text.py::clean_corpus — the dedup
    canonical filter, quality floor, and language filter over the SAME
    per-stage SQL used by pipe_exact_dups / pipe_quality / pipe_langid."""
    return f"""
WITH fp AS (SELECT doc_id, md5({_SQL_NORM}) AS f FROM documents),
can AS (SELECT f, min(doc_id) AS doc_id FROM fp GROUP BY f),
q AS ({_SQL_QUALITY}),
lg AS ({_sql_langid()})
SELECT q.doc_id, lg.pred_lang, q.n_tokens, q.quality
FROM can JOIN q ON can.doc_id = q.doc_id JOIN lg ON q.doc_id = lg.doc_id
WHERE q.quality >= 0.65 AND lg.pred_lang IN ('en')
"""


def _sql_langid() -> str:
    from graphblas_algorithms_spark.pipeline.text import LANG_MARKERS

    langs = sorted(LANG_MARKERS)
    cols = []
    for lang in langs:
        lst = ",".join(f"'{w}'" for w in LANG_MARKERS[lang])
        cols.append(
            f"len(list_filter(toks, x -> x IN ({lst})))::BIGINT AS c_{lang}"
        )
    # tie-break: earliest in sorted order wins (>= comparisons)
    cases = []
    for i, lang in enumerate(langs):
        conds = [f"c_{lang} >= c_{other}" for other in langs[i + 1 :]]
        prior = [f"c_{lang} > c_{other}" for other in langs[:i]]
        all_conds = prior + conds
        cond = " AND ".join(all_conds) if all_conds else "TRUE"
        cases.append(f"WHEN {cond} THEN '{lang}'")
    case_lang = "CASE " + " ".join(cases) + " END"
    case_score = (
        "CASE "
        + " ".join(
            f"WHEN pred_lang = '{lang}' THEN c_{lang}" for lang in langs
        )
        + " END"
    )
    return f"""
WITH t AS (
  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS toks
  FROM documents
),
c AS (SELECT doc_id, {', '.join(cols)} FROM t),
p AS (SELECT doc_id, c_de, c_en, c_es, c_fr, {case_lang} AS pred_lang FROM c)
SELECT doc_id, pred_lang, ({case_score})::BIGINT AS score FROM p
"""


_SQL_SHINGLES = """
sh AS (
  SELECT doc_id, unnest(list_distinct(shl)) AS shingle FROM (
    SELECT doc_id,
           list_transform(
             generate_series(1, greatest(len(w) - 2, 1)),
             i -> array_to_string(w[i:i+2], ' ')
           ) AS shl
    FROM (SELECT doc_id,
                 regexp_split_to_array(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS w
          FROM documents)
  )
)
"""

_SQL_DECONTAMINATE = f"""
WITH {_SQL_SHINGLES.strip()},
bench AS (
  SELECT array_to_string(
           (regexp_split_to_array(
              regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' '))[1:12],
           ' ') AS text
  FROM documents WHERE doc_id % 101 = 0
),
bsh AS (
  SELECT DISTINCT unnest(list_transform(
           generate_series(1, greatest(len(w) - 2, 1)),
           i -> array_to_string(w[i:i+2], ' '))) AS shingle
  FROM (SELECT regexp_split_to_array(
                 regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS w
        FROM bench)
)
SELECT sh.doc_id, count(*)::BIGINT AS bench_hits
FROM sh JOIN bsh USING (shingle)
GROUP BY sh.doc_id
HAVING count(*) >= 2
"""

_SQL_NGRAM_JACCARD = f"""
WITH {_SQL_SHINGLES.strip()},
sizes AS (SELECT doc_id, count(*)::BIGINT AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*)::BIGINT AS i
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT doc_a, doc_b,
       round(i::DOUBLE / (sa.n + sb.n - i), 6) AS jaccard
FROM inter
JOIN sizes sa ON doc_a = sa.doc_id
JOIN sizes sb ON doc_b = sb.doc_id
WHERE round(i::DOUBLE / (sa.n + sb.n - i), 6) >= 0.8
"""


def _sql_minhash_prelude(n_hashes: int = 12, bands: int = 4) -> str:
    """Shared CTE chain shingles -> minhash sig -> banded -> candidate
    pairs -> shingle sizes -> intersections; consumed by the pairwise
    near-dup oracle and the cluster (connected-components) oracle."""
    rows = n_hashes // bands
    mins = ",\n         ".join(
        f"min(md5('{i}:' || shingle)) AS h{i}" for i in range(n_hashes)
    )
    band_selects = []
    for b in range(bands):
        key = " || '|' || ".join(f"h{b * rows + r}" for r in range(rows))
        band_selects.append(
            f"SELECT doc_id, {b} AS band, md5({key}) AS key FROM sig"
        )
    banded = "\nUNION ALL\n".join(band_selects)
    return f"""{_SQL_SHINGLES.strip()},
sig AS (
  SELECT doc_id,
         {mins}
  FROM sh GROUP BY doc_id
),
banded AS (
{banded}
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM banded a JOIN banded b ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
),
sizes AS (SELECT doc_id, count(*)::BIGINT AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT c.doc_a, c.doc_b, count(*)::BIGINT AS i
  FROM cand c
  JOIN sh a ON a.doc_id = c.doc_a
  JOIN sh b ON b.doc_id = c.doc_b AND a.shingle = b.shingle
  GROUP BY c.doc_a, c.doc_b
)"""


def _sql_minhash_neardup(n_hashes: int = 12, bands: int = 4, threshold: float = 0.7) -> str:
    return f"""
WITH {_sql_minhash_prelude(n_hashes, bands)}
SELECT doc_a, doc_b,
       round(i::DOUBLE / (sa.n + sb.n - i), 6) AS jaccard
FROM inter
JOIN sizes sa ON doc_a = sa.doc_id
JOIN sizes sb ON doc_b = sb.doc_id
WHERE round(i::DOUBLE / (sa.n + sb.n - i), 6) >= {threshold}
"""


def _sql_dedup_incremental(
    n_hashes: int = 12, bands: int = 4, threshold: float = 0.7
) -> str:
    """Incoming-vs-base band join over the shared minhash prelude; the
    base/incoming split replicates pipeline/curation.py:_uniform with
    salt 'inc' (mirrors pipeline/dedup.py:incremental_near_duplicates)."""
    return f"""
WITH {_sql_minhash_prelude(n_hashes, bands)},
split AS (
  SELECT doc_id,
         ((('0x' || substr(md5('inc:' || doc_id), 1, 15))::UBIGINT)::DOUBLE
          / 1152921504606846976.0) < 0.5 AS is_base
  FROM documents
),
cand2 AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM banded a
  JOIN banded b ON a.band = b.band AND a.key = b.key
  JOIN split sa ON sa.doc_id = a.doc_id AND NOT sa.is_base
  JOIN split sb ON sb.doc_id = b.doc_id AND sb.is_base
),
inter2 AS (
  SELECT c.doc_a, c.doc_b, count(*)::BIGINT AS i
  FROM cand2 c
  JOIN sh a ON a.doc_id = c.doc_a
  JOIN sh b ON b.doc_id = c.doc_b AND a.shingle = b.shingle
  GROUP BY c.doc_a, c.doc_b
)
SELECT doc_a AS doc_id, doc_b AS dup_of,
       round(i::DOUBLE / (sa.n + sb.n - i), 6) AS jaccard
FROM inter2
JOIN sizes sa ON doc_a = sa.doc_id
JOIN sizes sb ON doc_b = sb.doc_id
WHERE round(i::DOUBLE / (sa.n + sb.n - i), 6) >= {threshold}
"""


def _sql_dedup_clusters(n_hashes: int = 12, bands: int = 4, threshold: float = 0.7) -> str:
    """Transitive near-dup clusters: verified pairs -> undirected edges ->
    recursive min-reachable-id fixpoint (the SQL statement of the engine's
    connected-components kernel) -> (doc_id, cluster_id, is_survivor)."""
    return f"""
WITH RECURSIVE {_sql_minhash_prelude(n_hashes, bands)},
pairs AS (
  SELECT doc_a, doc_b
  FROM inter
  JOIN sizes sa ON doc_a = sa.doc_id
  JOIN sizes sb ON doc_b = sb.doc_id
  WHERE round(i::DOUBLE / (sa.n + sb.n - i), 6) >= {threshold}
),
und AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION ALL
  SELECT doc_b, doc_a FROM pairs
),
reach(node, r) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT und.a, reach.r FROM und JOIN reach ON reach.node = und.b
)
SELECT node AS doc_id,
       min(r) AS cluster_id,
       (node = min(r)) AS is_survivor
FROM reach GROUP BY node
"""


def _sql_simhash(bits: int = 64) -> str:
    votes = []
    for b in range(bits):
        nib = b // 4
        shift = 2 ** (b % 4)
        votes.append(
            f"sum(((strpos('0123456789abcdef', substr(h, {nib + 1}, 1)) - 1) "
            f"// {shift}) % 2 * 2 - 1) AS v{b}"
        )
    # bit 63 = the BIGINT sign bit: contributes -2^63 (two's complement),
    # in lock-step with pipeline/dedup.py simhash()
    # SQL can't spell -2^63 directly (unary minus binds after the cast of
    # an out-of-range positive literal) — use (-(2^63-1) - 1)
    def _term_val(b: int) -> str:
        if b == 63:
            return "(-9223372036854775807::BIGINT - 1)"
        return f"{2 ** b}::BIGINT"

    terms = " + ".join(
        f"(CASE WHEN v{b} > 0 THEN {_term_val(b)} ELSE 0 END)" for b in range(bits)
    )
    return f"""
WITH tok AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS token
  FROM documents
),
h AS (SELECT doc_id, md5(token) AS h FROM tok),
v AS (SELECT doc_id, {', '.join(votes)} FROM h GROUP BY doc_id)
SELECT doc_id, ({terms})::BIGINT AS simhash FROM v
"""


_SQL_EMB_NORM = """
v AS (
  SELECT vec_id,
         list_transform(embedding::DOUBLE[], x -> x) AS e,
         sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))) AS nrm
  FROM embeddings
)
"""

_SQL_EMB_NEARDUP = f"""
WITH {_SQL_EMB_NORM.strip()}
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_dot_product(a.e, b.e) / (a.nrm * b.nrm), 6) AS cosine
FROM v a JOIN v b ON a.vec_id < b.vec_id
WHERE round(list_dot_product(a.e, b.e) / (a.nrm * b.nrm), 6) >= 0.35
"""


def _sql_embedding_lsh(n_planes: int = 16, bands: int = 4, dim: int = 64) -> str:
    """Replicates embedding_lsh_near_duplicates verbatim: the hyperplane
    literals come from the SAME deterministic generator, so bucket keys
    (and therefore the candidate set) are engine-identical."""
    from graphblas_algorithms_spark.pipeline.dedup import hyperplanes

    planes = hyperplanes(n_planes, dim)
    rows_per_band = n_planes // bands
    bit_exprs = ",\n         ".join(
        "(CASE WHEN list_dot_product(e, ["
        + ", ".join(repr(c) for c in planes[i])
        + f"]) >= 0 THEN '1' ELSE '0' END) AS b{i}"
        for i in range(n_planes)
    )
    band_selects = "\n  UNION ALL ".join(
        f"SELECT vec_id, {b} AS band, "
        + " || ".join(f"b{b * rows_per_band + r}" for r in range(rows_per_band))
        + " AS key FROM bits"
        for b in range(bands)
    )
    return f"""
WITH {_SQL_EMB_NORM.strip()},
bits AS (
  SELECT vec_id, e, nrm,
         {bit_exprs}
  FROM v
),
banded AS (
  {band_selects}
),
cand AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
  FROM banded a JOIN banded b ON a.band = b.band AND a.key = b.key
  WHERE a.vec_id < b.vec_id
)
SELECT c.id_a, c.id_b,
       round(list_dot_product(va.e, vb.e) / (va.nrm * vb.nrm), 6) AS cosine
FROM cand c
JOIN v va ON va.vec_id = c.id_a
JOIN v vb ON vb.vec_id = c.id_b
WHERE round(list_dot_product(va.e, vb.e) / (va.nrm * vb.nrm), 6) >= 0.35
"""

ONION_ROUNDS = 40  # 1/7-thinned sf0.01 peel takes 34 loop rounds; margin


def _sql_onion() -> str:
    """Unrolled onion decomposition on the 1/7-thinned co-purchase
    graph: per round, the monotone core bound (one-row CTE chain) and
    the bulk drop of every node at degree <= bound; isolates are layer
    1 and shift loop layers by one."""
    parts = ["WITH " + _SQL_PART.strip()]
    parts.append(
        """,
othin AS MATERIALIZED (SELECT src, dst FROM part_pairs WHERE (src + dst) % 7 = 0),
osym AS MATERIALIZED (
  SELECT src, dst FROM othin UNION ALL SELECT dst AS src, src AS dst FROM othin
),
odeg0 AS MATERIALIZED (
  SELECT n.id, coalesce(d.cnt, 0) AS d
  FROM part_nodes n LEFT JOIN
    (SELECT src AS id, count(*) AS cnt FROM osym GROUP BY src) d USING (id)
),
oiso AS MATERIALIZED (SELECT id FROM odeg0 WHERE d = 0),
oshift AS MATERIALIZED (SELECT CASE WHEN count(*) > 0 THEN 1 ELSE 0 END AS s FROM oiso),
ol0 AS MATERIALIZED (SELECT id FROM odeg0 WHERE d > 0),
oe0 AS MATERIALIZED (SELECT src, dst FROM osym),
oc0 AS MATERIALIZED (SELECT 1 AS c)"""
    )
    for r in range(1, ONION_ROUNDS + 1):
        parts.append(
            f""",
od{r} AS MATERIALIZED (
  SELECT l.id, coalesce(d.cnt, 0) AS d
  FROM ol{r-1} l LEFT JOIN
    (SELECT src AS id, count(*) AS cnt FROM oe{r-1} GROUP BY src) d USING (id)
),
oc{r} AS MATERIALIZED (
  SELECT greatest((SELECT c FROM oc{r-1}),
                  coalesce((SELECT min(d) FROM od{r}),
                           (SELECT c FROM oc{r-1}))) AS c
),
ob{r} AS MATERIALIZED (
  SELECT id FROM od{r} WHERE d <= (SELECT c FROM oc{r})
),
ol{r} AS MATERIALIZED (
  SELECT l.id FROM ol{r-1} l ANTI JOIN ob{r} b ON l.id = b.id
),
oe{r} AS MATERIALIZED (
  SELECT e.src, e.dst FROM oe{r-1} e
  ANTI JOIN ob{r} a ON e.src = a.id
  ANTI JOIN ob{r} b ON e.dst = b.id
)"""
        )
    layers = " UNION ALL ".join(
        f"SELECT id, ({r} + (SELECT s FROM oshift))::BIGINT AS layer FROM ob{r}"
        for r in range(1, ONION_ROUNDS + 1)
    )
    parts.append(
        f"""
SELECT id, 1::BIGINT AS layer FROM oiso
UNION ALL
{layers}"""
    )
    return "".join(parts)


def _sql_triad_census() -> str:
    """Mirrors operators/triads.py:triadic_census over the part digraph:
    oriented linked-pair self-join for wedges, min-center triangle dedup,
    the same 6-bit code permutation, the same 64-entry CODE_NAME map
    (imported — single source of truth), arithmetic 012/102/003."""
    from graphblas_algorithms_spark.operators.triads import CODE_NAME, TRIAD_TYPES

    codemap = ", ".join(f"({i}, '{nm}')" for i, nm in enumerate(CODE_NAME))
    types = ", ".join(f"('{t}')" for t in TRIAD_TYPES)
    return f"""
WITH {_SQL_PART_DIGRAPH.strip()},
tc_n AS (SELECT count(*)::BIGINT AS n FROM part_nodes),
tlp AS MATERIALIZED (
  SELECT least(src, dst) AS u, greatest(src, dst) AS v,
         max(CASE WHEN src < dst THEN 1 ELSE 0 END) AS f,
         max(CASE WHEN src > dst THEN 1 ELSE 0 END) AS b
  FROM dedges WHERE src <> dst GROUP BY 1, 2
),
tlpo AS MATERIALIZED (
  SELECT u AS a, v AS bn, f AS ab, b AS ba FROM tlp
  UNION ALL
  SELECT v AS a, u AS bn, b AS ab, f AS ba FROM tlp
),
tw AS MATERIALIZED (
  SELECT e1.a AS c, e1.bn AS x, e2.bn AS z,
         e1.ab AS f_cx, e1.ba AS f_xc, e2.ab AS f_cz, e2.ba AS f_zc
  FROM tlpo e1 JOIN tlpo e2 ON e1.a = e2.a AND e1.bn < e2.bn
),
ttrip AS MATERIALIZED (
  SELECT tw.*, t.f AS f_xz, t.b AS f_zx
  FROM tw LEFT JOIN tlp t ON t.u = tw.x AND t.v = tw.z
  WHERE t.f IS NULL OR tw.c < tw.x
),
tcoded AS (
  SELECT CASE
    WHEN c < x THEN 32*f_cx + 16*f_xc + 8*f_cz + 4*f_zc
                    + 2*coalesce(f_xz, 0) + coalesce(f_zx, 0)
    WHEN c < z THEN 32*f_xc + 16*f_cx + 8*coalesce(f_xz, 0)
                    + 4*coalesce(f_zx, 0) + 2*f_cz + f_zc
    ELSE 32*coalesce(f_xz, 0) + 16*coalesce(f_zx, 0)
         + 8*f_xc + 4*f_cx + 2*f_zc + f_cz
  END AS code FROM ttrip
),
tcodemap(code, nm) AS (VALUES {codemap}),
tenum AS (
  SELECT m.nm AS triad_type, count(*)::BIGINT AS n
  FROM tcoded JOIN tcodemap m USING (code) GROUP BY 1
),
tdeg AS (SELECT a AS id, count(*)::BIGINT AS d FROM tlpo GROUP BY a),
tcm AS (SELECT x, z, count(*)::BIGINT AS cm FROM tw GROUP BY x, z),
tlonely AS (
  SELECT CASE WHEN tlp.f = 1 AND tlp.b = 1 THEN '102' ELSE '012' END AS triad_type,
         sum((SELECT n FROM tc_n) - du.d - dv.d + coalesce(tcm.cm, 0))::BIGINT AS n
  FROM tlp
  JOIN tdeg du ON du.id = tlp.u
  JOIN tdeg dv ON dv.id = tlp.v
  LEFT JOIN tcm ON tcm.x = tlp.u AND tcm.z = tlp.v
  GROUP BY 1
),
tall AS MATERIALIZED (SELECT * FROM tenum UNION ALL SELECT * FROM tlonely),
tnull AS (
  SELECT '003' AS triad_type,
         ((SELECT n * (n - 1) * (n - 2) // 6 FROM tc_n)
          - coalesce((SELECT sum(n) FROM tall), 0))::BIGINT AS n
),
ttypes(triad_type) AS (VALUES {types}),
tfull AS (SELECT * FROM tall UNION ALL SELECT * FROM tnull)
SELECT t.triad_type, coalesce(f.n, 0)::BIGINT AS n
FROM ttypes t LEFT JOIN tfull f USING (triad_type)
"""


_SQL_SEMDEDUP = f"""
WITH {_SQL_EMB_NORM.strip()},
nv AS MATERIALIZED (
  SELECT vec_id, list_transform(e, x -> x / greatest(nrm, 1e-12)) AS v FROM v
),
sd_seeds AS (
  SELECT vec_id % 16 AS centroid_id, min(vec_id) AS vec_id
  FROM nv GROUP BY 1
),
sd_cents AS MATERIALIZED (
  SELECT s.centroid_id, n.v AS cv FROM sd_seeds s JOIN nv n USING (vec_id)
),
sd_assigned AS MATERIALIZED (
  SELECT vec_id, v, centroid_id FROM (
    SELECT n.vec_id, n.v, c.centroid_id,
           row_number() OVER (
             PARTITION BY n.vec_id
             ORDER BY round(list_dot_product(n.v, c.cv), 6) DESC,
                      c.centroid_id ASC
           ) AS rk
    FROM nv n CROSS JOIN sd_cents c
  ) WHERE rk = 1
),
sd_dropped AS MATERIALIZED (
  SELECT DISTINCT b.vec_id
  FROM sd_assigned a JOIN sd_assigned b
    ON a.centroid_id = b.centroid_id AND a.vec_id < b.vec_id
  WHERE round(list_dot_product(a.v, b.v), 6) >= 0.35
)
SELECT s.vec_id, s.centroid_id
FROM sd_assigned s ANTI JOIN sd_dropped d ON s.vec_id = d.vec_id
"""

_SQL_ANN_TOPK = f"""
WITH {_SQL_EMB_NORM.strip()},
scored AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         round(list_dot_product(a.e, b.e) / (a.nrm * b.nrm), 6) AS cosine
  FROM v a JOIN v b ON a.vec_id <> b.vec_id
),
ranked AS (
  SELECT query_id, neighbor_id, cosine,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, rank::BIGINT AS rank, cosine
FROM ranked WHERE rank <= 10
"""

#: Full SQL replay of ivf_topk (m=16, n_probe=8, refine_iters=1, k=10):
#: residue-class seeds -> one Lloyd step with DYADIC per-dimension means
#: (exact BIGINT sums, r5 similarity.py change) -> normalized refined
#: centroids -> assignment (rank 1) / probes (rank <= 8) from ONE scored
#: pass -> per-cell exact cosines -> global top-10.  Vectors are
#: normalized per-element exactly like Spark's transform(x -> x /
#: greatest(nrm, 1e-12)); sims order UNROUNDED like the kernel; final
#: cosines round to 6 on both sides.
_SQL_IVF_PREFIX = """
nv AS MATERIALIZED (
  SELECT vec_id AS id,
         list_transform(
           embedding::DOUBLE[],
           x -> x / greatest(
                  sqrt(list_sum(list_transform(embedding::DOUBLE[], y -> y * y))),
                  1e-12)
         ) AS v
  FROM embeddings
),
iseeds AS MATERIALIZED (
  SELECT id % 16 AS centroid_id, min(id) AS id FROM nv GROUP BY 1
),
icents0 AS MATERIALIZED (
  SELECT s.centroid_id, n.v AS cv FROM iseeds s JOIN nv n USING (id)
),
iasg0 AS MATERIALIZED (
  SELECT id, v, centroid_id FROM (
    SELECT n.id, n.v, c.centroid_id,
           row_number() OVER (
             PARTITION BY n.id
             ORDER BY list_dot_product(n.v, c.cv) DESC, c.centroid_id ASC
           ) AS rk
    FROM nv n CROSS JOIN icents0 c
  ) WHERE rk = 1
),
imeans AS MATERIALIZED (
  SELECT centroid_id, list(mx ORDER BY pos) AS mean_v FROM (
    SELECT centroid_id, pos,
           (floor(sum(floor(x * 1048576.0)::BIGINT)::BIGINT / count(*))::BIGINT
            / 1048576.0) AS mx
    FROM (
      SELECT centroid_id, generate_subscripts(v, 1) AS pos, unnest(v) AS x
      FROM iasg0
    ) GROUP BY centroid_id, pos
  ) GROUP BY centroid_id
),
irefined AS MATERIALIZED (
  SELECT centroid_id,
         CASE WHEN sqrt(list_sum(list_transform(mean_v, x -> x * x))) > 0
              THEN list_transform(
                     mean_v,
                     x -> x / sqrt(list_sum(list_transform(mean_v, y -> y * y))))
         END AS cvn
  FROM imeans
),
icents AS MATERIALIZED (
  SELECT c.centroid_id, coalesce(r.cvn, c.cv) AS cv
  FROM icents0 c LEFT JOIN irefined r USING (centroid_id)
),
iscored AS MATERIALIZED (
  SELECT id, v, centroid_id, rk FROM (
    SELECT n.id, n.v, c.centroid_id,
           row_number() OVER (
             PARTITION BY n.id
             ORDER BY list_dot_product(n.v, c.cv) DESC, c.centroid_id ASC
           ) AS rk
    FROM nv n CROSS JOIN icents c
  ) WHERE rk <= 8
)
"""

_SQL_ANN_IVF = f"""
WITH {_SQL_IVF_PREFIX.strip()},
icand AS (
  SELECT p.id AS query_id, a.id AS neighbor_id,
         round(list_dot_product(p.v, a.v), 6) AS cosine
  FROM iscored p
  JOIN (SELECT id, v, centroid_id FROM iscored WHERE rk = 1) a
    ON a.centroid_id = p.centroid_id AND a.id <> p.id
)
SELECT query_id, neighbor_id, rank::BIGINT AS rank, cosine FROM (
  SELECT query_id, neighbor_id, cosine,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM icand
) WHERE rank <= 10
"""

#: Full SQL replay of ivf_topk_pandas (m=16, n_probe=8, k=10): same
#: centroid/assign/probe trajectory as _SQL_ANN_IVF, but the per-cell
#: scoring is the kernel's EXACT 2^-26 dyadic-integer dot product —
#: both sides snap the normalized vectors with floor(x * 2^26) to
#: BIGINT and sum the 64 products as exact integers (DuckDB's BIGINT
#: sum uses a HUGEINT accumulator; the kernel's numpy int64 matmul is
#: exact), so the similarity is a single integer on both engines and
#: rank order is bit-identical regardless of summation order.  The
#: reported cosine is round(dint / 2^52, 6) on both sides.
_SQL_ANN_IVF_PANDAS = f"""
WITH {_SQL_IVF_PREFIX.strip()},
piexp AS MATERIALIZED (
  SELECT id, centroid_id, rk, generate_subscripts(v, 1) AS pos,
         floor(unnest(v) * 67108864.0)::BIGINT AS x
  FROM iscored
),
picand AS MATERIALIZED (
  SELECT p.id AS query_id, a.id AS neighbor_id,
         sum(p.x * a.x)::BIGINT AS dint
  FROM piexp p
  JOIN piexp a
    ON a.centroid_id = p.centroid_id AND a.pos = p.pos
   AND a.rk = 1 AND a.id <> p.id
  GROUP BY 1, 2
)
SELECT query_id, neighbor_id, rank::BIGINT AS rank,
       round(dint / 4503599627370496.0, 6) AS cosine
FROM (
  SELECT query_id, neighbor_id, dint,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY dint DESC, neighbor_id ASC) AS rank
  FROM picand
) WHERE rank <= 10
"""

#: The PQ codebook is a tiny trained model (Lloyd means in numpy — not
#: SQL-expressible); the oracle pins the trained, 2^-20-snapped codebook
#: from this fixture (regenerate: scripts/gen_pq_fixture.py; drift guard:
#: test_pq_codebook_matches_fixture) and replays encode + integer ADC +
#: candidate windows + exact re-rank independently.
_PQ_FIXTURE = _os.path.join(
    _os.path.dirname(_os.path.abspath(__file__)), "fixtures", "pq_codebook_sf001.json"
)

_SQL_ANN_IVF_PQ = f"""
WITH {_SQL_IVF_PREFIX.strip()},
cbrows AS MATERIALIZED (
  SELECT s::INT AS s, k::INT AS k, c::BIGINT[] AS c
  FROM read_json_auto('{_PQ_FIXTURE}')
),
xslices AS MATERIALIZED (
  SELECT xi.id, ss.s, list_slice(xi.x, ss.s * 8 + 1, ss.s * 8 + 8) AS xs
  FROM (SELECT id, list_transform(v, x -> floor(x * 1048576.0)::BIGINT) AS x
        FROM nv) xi,
       (SELECT DISTINCT s FROM cbrows) ss
),
enc AS MATERIALIZED (
  SELECT id, s, k AS code FROM (
    SELECT xs.id, xs.s, cb.k,
           row_number() OVER (
             PARTITION BY xs.id, xs.s
             ORDER BY 2 * list_dot_product(xs.xs, cb.c)
                      - list_dot_product(cb.c, cb.c) DESC,
                      cb.k ASC
           ) AS rk
    FROM xslices xs JOIN cbrows cb ON cb.s = xs.s
  ) WHERE rk = 1
),
pqpairs AS MATERIALIZED (
  SELECT p.id AS query_id, a.id AS neighbor_id, p.centroid_id AS cell
  FROM iscored p
  JOIN (SELECT id, centroid_id FROM iscored WHERE rk = 1) a
    ON a.centroid_id = p.centroid_id AND a.id <> p.id
),
adc AS MATERIALIZED (
  SELECT pr.query_id, pr.neighbor_id, pr.cell,
         sum(list_dot_product(xs.xs, cb.c)) AS approx
  FROM pqpairs pr
  JOIN enc e ON e.id = pr.neighbor_id
  JOIN xslices xs ON xs.id = pr.query_id AND xs.s = e.s
  JOIN cbrows cb ON cb.s = e.s AND cb.k = e.code
  GROUP BY pr.query_id, pr.neighbor_id, pr.cell
),
cell_top AS MATERIALIZED (
  SELECT query_id, neighbor_id, approx FROM (
    SELECT query_id, neighbor_id, approx,
           row_number() OVER (PARTITION BY query_id, cell
                              ORDER BY approx DESC, neighbor_id ASC) AS rk
    FROM adc
  ) WHERE rk <= 40
),
gcand AS MATERIALIZED (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY approx DESC, neighbor_id ASC) AS rk
    FROM cell_top
  ) WHERE rk <= 40
),
rr AS (
  SELECT g.query_id, g.neighbor_id,
         round(list_dot_product(q.v, n.v), 6) AS cosine
  FROM gcand g
  JOIN nv q ON q.id = g.query_id
  JOIN nv n ON n.id = g.neighbor_id
)
SELECT query_id, neighbor_id, rank::BIGINT AS rank, cosine FROM (
  SELECT query_id, neighbor_id, cosine,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM rr
) WHERE rank <= 10
"""

_SQL_EVENTS_WINDOWED = """
SELECT date_trunc('hour', ts) AS window_start, event_type,
       count(*)::BIGINT AS n_events,
       (sum(floor(value * 1048576.0)::BIGINT)::BIGINT / 1048576.0) AS sum_value
FROM events GROUP BY 1, 2
"""

# per-user ordered funnel + JSON props extraction (mirrors
# pipeline/funnel.py:funnel_conversion): NULL stage-min semantics make
# the strict-order comparison fall to 0 when any stage is absent
_SQL_EVENTS_FUNNEL = """
SELECT user_id,
       count(*) FILTER (event_type = 'view') AS n_view,
       count(*) FILTER (event_type = 'click') AS n_click,
       count(*) FILTER (event_type = 'purchase') AS n_purchase,
       coalesce(sum(CAST(json_extract(props, '$.k') AS BIGINT))
                FILTER (event_type = 'click'), 0) AS click_k_sum,
       (coalesce(sum(floor(value * 1048576.0)::BIGINT)
                 FILTER (event_type = 'purchase'), 0)::BIGINT
        / 1048576.0) AS purchase_value,
       CASE WHEN min(ts) FILTER (event_type = 'view')
                 < min(ts) FILTER (event_type = 'click')
             AND min(ts) FILTER (event_type = 'click')
                 < min(ts) FILTER (event_type = 'purchase')
            THEN 1 ELSE 0 END AS funnel
FROM events GROUP BY user_id
"""

_SQL_EVENTS_SESSIONS = """
WITH marked AS (
  SELECT user_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
sessions AS (
  SELECT user_id, ts, value,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                          ROWS UNBOUNDED PRECEDING) AS session_id
  FROM marked
)
SELECT user_id, session_id::BIGINT AS session_id,
       min(ts) AS session_start,
       count(*)::BIGINT AS n_events,
       (sum(floor(value * 1048576.0)::BIGINT)::BIGINT / 1048576.0) AS sum_value
FROM sessions GROUP BY user_id, session_id
"""

_SQL_EVENTS_WINDOWED_CLOSED = """
SELECT date_trunc('hour', ts) AS window_start, event_type,
       count(*)::BIGINT AS n_events,
       (sum(floor(value * 1048576.0)::BIGINT)::BIGINT / 1048576.0) AS sum_value
FROM events
GROUP BY 1, 2
HAVING date_trunc('hour', ts) + INTERVAL 60 MINUTE
       <= (SELECT max(ts) FROM events) - INTERVAL 2 HOUR
"""

_SQL_EVENTS_SESSIONS_CLOSED = """
WITH marked AS (
  SELECT user_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
sessions AS (
  SELECT user_id, ts, value,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                          ROWS UNBOUNDED PRECEDING) AS session_id
  FROM marked
),
agg AS (
  SELECT user_id, session_id,
         min(ts) AS session_start,
         count(*)::BIGINT AS n_events,
         (sum(floor(value * 1048576.0)::BIGINT)::BIGINT / 1048576.0) AS sum_value
  FROM sessions GROUP BY user_id, session_id
)
SELECT user_id, session_start, n_events, sum_value
FROM agg
WHERE session_id < (SELECT max(b.session_id) FROM agg b
                    WHERE b.user_id = agg.user_id)
"""

_SQL_OLAP_PRICING = """
SELECT l_returnflag, l_linestatus,
       sum(floor(l_quantity + 0.5)::BIGINT)::DOUBLE AS sum_qty,
       (sum(floor(l_extendedprice * 100 + 0.5)::BIGINT)::BIGINT
        / 100.0) AS sum_base_price,
       (sum(floor(l_extendedprice * 100 + 0.5)::BIGINT
            * (100 - floor(l_discount * 100 + 0.5)::BIGINT))::BIGINT
        / 10000.0) AS sum_disc_price,
       round(sum(floor(l_quantity + 0.5)::BIGINT)::DOUBLE / count(*), 6)
         AS avg_qty,
       count(*)::BIGINT AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""

_SQL_OLAP_TOPCUST = """
WITH agg AS (
  SELECT n_name, c_custkey,
         (sum(floor(o_totalprice * 100 + 0.5)::BIGINT)::BIGINT / 100.0)
           AS revenue
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  GROUP BY n_name, c_custkey
),
ranked AS (
  SELECT n_name, c_custkey, revenue,
         row_number() OVER (PARTITION BY n_name
                            ORDER BY revenue DESC, c_custkey ASC) AS rk
  FROM agg
)
SELECT n_name, c_custkey, revenue, rk::BIGINT AS rk FROM ranked WHERE rk <= 3
"""


# Replicates pipeline.multimodal exactly.  Image/audio (r5, REAL
# decoders): the synthetic payloads encode deterministic formulas —
# pixel v = (a*7 + x*3 + y*5 + c*11) % 256 over 64x48x3, sample
# s_i = ((a*13 + i*7) % 65536) - 32768 over n = 800 + (a%5)*160 — and
# the features are exact integer aggregates of them, so SQL re-derives
# the identical values without touching bytes (the byte round-trip
# itself is pytest-gated: encode->decode == formula).  Video keeps the
# sha256-digest stand-in replay.
_SQL_MULTIMODAL_FEATURES = f"""
WITH ids AS (SELECT range AS asset_id FROM range({MM_N_ASSETS})),
img_px AS (
  SELECT i.asset_id, c.c,
         (i.asset_id * 7 + x.x * 3 + y.y * 5 + c.c * 11) % 256 AS v
  FROM ids i,
       (SELECT range AS x FROM range(64)) x,
       (SELECT range AS y FROM range(48)) y,
       (SELECT range AS c FROM range(3)) c
  WHERE i.asset_id % 3 = 0
),
img_agg AS (
  SELECT asset_id,
         sum(CASE WHEN c = 0 THEN v END)::BIGINT AS s0,
         sum(CASE WHEN c = 1 THEN v END)::BIGINT AS s1,
         sum(CASE WHEN c = 2 THEN v END)::BIGINT AS s2,
         min(v)::BIGINT AS vmin, max(v)::BIGINT AS vmax,
         sum(v)::BIGINT AS tot
  FROM img_px GROUP BY asset_id
),
img_feats AS (
  SELECT asset_id, 0 AS dim_idx, 64 / 256.0 AS v FROM img_agg
  UNION ALL SELECT asset_id, 1, 48 / 256.0 FROM img_agg
  UNION ALL SELECT asset_id, 2, s0 / (3072 * 255.0) FROM img_agg
  UNION ALL SELECT asset_id, 3, s1 / (3072 * 255.0) FROM img_agg
  UNION ALL SELECT asset_id, 4, s2 / (3072 * 255.0) FROM img_agg
  UNION ALL SELECT asset_id, 5, vmin / 255.0 FROM img_agg
  UNION ALL SELECT asset_id, 6, vmax / 255.0 FROM img_agg
  UNION ALL SELECT asset_id, 7, (tot % 9973) / 9973.0 FROM img_agg
),
aud_smp AS (
  SELECT i.asset_id, s.i,
         ((i.asset_id * 13 + s.i * 7) % 65536) - 32768 AS v,
         800 + (i.asset_id % 5) * 160 AS n
  FROM ids i, (SELECT range AS i FROM range(1440)) s
  WHERE i.asset_id % 3 = 1 AND s.i < 800 + (i.asset_id % 5) * 160
),
aud_agg AS (
  SELECT asset_id, max(n) AS n,
         sum(v)::BIGINT AS sv, sum(abs(v))::BIGINT AS sa,
         min(v)::BIGINT AS vmin, max(v)::BIGINT AS vmax,
         sum(CASE WHEN prev IS NOT NULL AND ((v < 0) <> (prev < 0))
                  THEN 1 ELSE 0 END)::BIGINT AS zc
  FROM (SELECT asset_id, n, i, v,
               lag(v) OVER (PARTITION BY asset_id ORDER BY i) AS prev
        FROM aud_smp)
  GROUP BY asset_id
),
aud_feats AS (
  SELECT asset_id, 0 AS dim_idx, 16000 / 48000.0 AS v FROM aud_agg
  UNION ALL SELECT asset_id, 1, n / 65536.0 FROM aud_agg
  UNION ALL SELECT asset_id, 2, sv / (n * 32768.0) FROM aud_agg
  UNION ALL SELECT asset_id, 3, sa / (n * 32768.0) FROM aud_agg
  UNION ALL SELECT asset_id, 4, vmin / 32768.0 FROM aud_agg
  UNION ALL SELECT asset_id, 5, vmax / 32768.0 FROM aud_agg
  UNION ALL SELECT asset_id, 6, zc / (1.0 * n) FROM aud_agg
  UNION ALL SELECT asset_id, 7, (sa % 9973) / 9973.0 FROM aud_agg
),
vid AS (
  SELECT asset_id, sha256(sha256('asset:' || asset_id::VARCHAR)) AS digest
  FROM ids WHERE asset_id % 3 = 2
),
dims AS (SELECT range AS dim_idx FROM range({MM_FEATURE_DIM})),
vid_feats AS (
  SELECT v.asset_id, dim_idx,
         ((strpos('0123456789abcdef', substr(digest, dim_idx*2+1, 1)) - 1) * 16
          + (strpos('0123456789abcdef', substr(digest, dim_idx*2+2, 1)) - 1))
         / 255.0 AS v
  FROM vid v CROSS JOIN dims
),
allf AS (
  SELECT asset_id, 'image' AS kind, dim_idx, v FROM img_feats
  UNION ALL SELECT asset_id, 'audio', dim_idx, v FROM aud_feats
  UNION ALL SELECT asset_id, 'video', dim_idx, v FROM vid_feats
)
SELECT asset_id, kind, dim_idx::BIGINT AS dim_idx, round(v, 6) AS v FROM allf
"""

_SQL_FRAME_SAMPLE = f"""
WITH ids AS (SELECT range AS asset_id FROM range({MM_N_ASSETS})),
v AS (SELECT asset_id, asset_id % 30 + 1 AS nf FROM ids WHERE asset_id % 3 = 2)
SELECT asset_id, unnest(range(0, nf, 5))::BIGINT AS frame_idx FROM v
"""


def _sql_louvain(rounds: int = LOUVAIN_ROUNDS, levels: int = LOUVAIN_LEVELS) -> str:
    """Step-unrolled replica of operators/louvain.py's pinned rule: per
    round, half-activation by md5 parity (engine-portable), exact-BIGINT
    modularity-gain argmax with (gain, is_own, -c) ordering and the
    singleton swap-prevention filter; per level, min-member relabel +
    contraction of the ORIGINAL edges by the composed mapping."""

    def act(col: str, r: int) -> str:
        return (
            f"(('0x' || substring(md5(CAST({col} AS VARCHAR) || '|{r}'), 1, 15))"
            f"::UBIGINT % 2 = 0)"
        )

    parts = [
        "WITH part_pairs AS MATERIALIZED (",
        "  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst",
        "  FROM lineitem a JOIN lineitem b",
        "    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey",
        "),",
        "part_nodes AS (SELECT p_partkey AS id FROM part),",
        "e0 AS (SELECT src, dst, 1::BIGINT AS w FROM part_pairs),",
        "n0 AS (SELECT id FROM part_nodes)",
    ]
    for lv in range(levels):
        parts.append(f""",
sym{lv} AS MATERIALIZED (
  SELECT src, dst, w FROM e{lv} WHERE src <> dst
  UNION ALL SELECT dst AS src, src AS dst, w FROM e{lv} WHERE src <> dst
),
deg{lv} AS MATERIALIZED (
  SELECT n.id, coalesce(s.d, 0)::BIGINT AS deg FROM n{lv} n LEFT JOIN (
    SELECT id, sum(w)::BIGINT AS d FROM (
      SELECT src AS id, w FROM sym{lv}
      UNION ALL SELECT src AS id, 2 * w AS w FROM e{lv} WHERE src = dst
    ) GROUP BY id) s ON s.id = n.id
),
mm{lv} AS (SELECT sum(w)::BIGINT AS m FROM e{lv}),
l{lv}_0 AS MATERIALIZED (SELECT id, id AS c FROM n{lv})""")
        for r in range(rounds):
            parts.append(f""",
st{lv}_{r} AS MATERIALIZED (
  SELECT l.c, sum(d.deg)::BIGINT AS sig, count(*)::BIGINT AS sz
  FROM l{lv}_{r} l JOIN deg{lv} d ON d.id = l.id GROUP BY l.c
),
kv{lv}_{r} AS (
  SELECT s.src AS id, l.c, sum(s.w)::BIGINT AS k
  FROM sym{lv} s JOIN l{lv}_{r} l ON l.id = s.dst
  WHERE {act('s.src', r)}
  GROUP BY s.src, l.c
),
cd{lv}_{r} AS (
  SELECT id, c, sum(k)::BIGINT AS k FROM (
    SELECT id, c, k FROM kv{lv}_{r}
    UNION ALL SELECT id, c, 0 AS k FROM l{lv}_{r} WHERE {act('id', r)}
  ) GROUP BY id, c
),
sc{lv}_{r} AS (
  SELECT cd.id, cd.c,
         2 * (SELECT m FROM mm{lv}) * cd.k
           - d.deg * (st.sig - CASE WHEN cd.c = lo.c THEN d.deg ELSE 0 END)
           AS gain,
         CASE WHEN cd.c = lo.c THEN 1 ELSE 0 END AS is_own
  FROM cd{lv}_{r} cd
  JOIN l{lv}_{r} lo ON lo.id = cd.id
  JOIN deg{lv} d ON d.id = cd.id
  JOIN st{lv}_{r} st ON st.c = cd.c
  JOIN st{lv}_{r} so ON so.c = lo.c
  WHERE NOT (so.sz = 1 AND st.sz = 1 AND cd.c > lo.c)
),
l{lv}_{r + 1} AS MATERIALIZED (
  SELECT id, c FROM (
    SELECT id, c,
           row_number() OVER (PARTITION BY id ORDER BY gain DESC, is_own DESC, c ASC) AS rn
    FROM sc{lv}_{r}) WHERE rn = 1
  UNION ALL
  SELECT id, c FROM l{lv}_{r} WHERE NOT {act('id', r)}
)""")
        parts.append(f""",
rl{lv} AS MATERIALIZED (
  SELECT l.id, rr.rep AS c FROM l{lv}_{rounds} l
  JOIN (SELECT c, min(id) AS rep FROM l{lv}_{rounds} GROUP BY c) rr ON rr.c = l.c
)""")
        if lv == 0:
            parts.append(",\nmap0 AS MATERIALIZED (SELECT id, c FROM rl0)")
        else:
            parts.append(f""",
map{lv} AS MATERIALIZED (
  SELECT m.id, r.c FROM map{lv - 1} m JOIN rl{lv} r ON r.id = m.c
)""")
        if lv + 1 < levels:
            parts.append(f""",
e{lv + 1} AS MATERIALIZED (
  SELECT least(cu.c, cv.c) AS src, greatest(cu.c, cv.c) AS dst, sum(e.w)::BIGINT AS w
  FROM e0 e JOIN map{lv} cu ON e.src = cu.id JOIN map{lv} cv ON e.dst = cv.id
  GROUP BY 1, 2
),
n{lv + 1} AS (SELECT DISTINCT c AS id FROM map{lv})""")
    parts.append(f"\nSELECT id, c AS community FROM map{levels - 1}")
    return "\n".join(parts)


_SQL_PART_MAT = """
part_pairs AS MATERIALIZED (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
part_nodes AS (SELECT p_partkey AS id FROM part),
sym AS (
  SELECT src, dst FROM part_pairs
  UNION ALL
  SELECT dst AS src, src AS dst FROM part_pairs
)
"""

_SQL_ASSORTATIVITY = f"""
WITH {_SQL_PART_MAT},
deg AS (SELECT src AS id, count(*)::BIGINT AS d FROM sym GROUP BY src),
pairs AS (
  SELECT du.d AS du, dv.d AS dv
  FROM sym s JOIN deg du ON s.src = du.id JOIN deg dv ON s.dst = dv.id
)
SELECT round(corr(du, dv), 6) AS assortativity,
       round(2.0 * (SELECT count(*) FROM part_pairs)
             / ((SELECT count(*) FROM part_nodes)
                * ((SELECT count(*) FROM part_nodes) - 1)), 9) AS density
FROM pairs
"""

_SQL_AVG_NBR_DEG = f"""
WITH {_SQL_PART_MAT},
deg AS (SELECT src AS id, count(*)::BIGINT AS d FROM sym GROUP BY src),
avg_n AS (
  SELECT s.src AS id, avg(dn.d) AS avg_nbr_deg
  FROM sym s JOIN deg dn ON s.dst = dn.id
  GROUP BY s.src
)
SELECT n.id, round(coalesce(a.avg_nbr_deg, 0.0), 6) AS avg_nbr_deg
FROM part_nodes n LEFT JOIN avg_n a ON a.id = n.id
"""

# the community labels replicate the Spark side bit-for-bit:
# Spark conv(substring(md5(id), 1, 15), 16, 10) == DuckDB ('0x'||substring)::UBIGINT
_SQL_MODULARITY = f"""
WITH {_SQL_PART_MAT},
lab AS MATERIALIZED (
  SELECT id,
         ((('0x' || substring(md5(id::VARCHAR), 1, 15))::UBIGINT) % 8)::BIGINT
           AS community
  FROM part_nodes
),
deg AS (SELECT src AS id, count(*)::BIGINT AS d FROM sym GROUP BY src),
m AS (SELECT count(*)::DOUBLE AS m FROM part_pairs),
intra AS (
  SELECT lu.community, count(*)::BIGINT AS intra_edges
  FROM part_pairs p
    JOIN lab lu ON p.src = lu.id
    JOIN lab lv ON p.dst = lv.id
  WHERE lu.community = lv.community
  GROUP BY lu.community
),
dsum AS (
  SELECT l.community, sum(coalesce(deg.d, 0))::BIGINT AS degree_sum
  FROM lab l LEFT JOIN deg ON deg.id = l.id
  GROUP BY l.community
)
SELECT d.community,
       coalesce(i.intra_edges, 0) AS intra_edges,
       d.degree_sum,
       round(coalesce(i.intra_edges, 0) / m.m
             - (d.degree_sum / (2 * m.m)) * (d.degree_sum / (2 * m.m)), 6)
         AS contrib
FROM dsum d LEFT JOIN intra i ON i.community = d.community CROSS JOIN m
"""

_SQL_RICH_CLUB = f"""
WITH {_SQL_PART_MAT},
deg AS (SELECT src AS id, count(*)::BIGINT AS d FROM sym GROUP BY src),
degall AS (
  SELECT n.id, coalesce(deg.d, 0)::BIGINT AS d
  FROM part_nodes n LEFT JOIN deg ON deg.id = n.id
),
edges_min AS (
  SELECT least(du.d, dv.d) AS md
  FROM part_pairs p JOIN deg du ON p.src = du.id JOIN deg dv ON p.dst = dv.id
),
ks AS (SELECT unnest(range(0, (SELECT max(d) FROM degall))) AS k),
nk AS (
  SELECT k.k, count(*)::BIGINT AS n_nodes FROM ks k JOIN degall d ON d.d > k.k GROUP BY k.k
),
ek AS (
  SELECT k.k, count(*)::BIGINT AS n_edges FROM ks k JOIN edges_min e ON e.md > k.k GROUP BY k.k
)
SELECT n.k::BIGINT AS k, n.n_nodes, coalesce(e.n_edges, 0) AS n_edges,
       round(2.0 * coalesce(e.n_edges, 0) / (n.n_nodes * (n.n_nodes - 1)), 6) AS phi
FROM nk n LEFT JOIN ek e ON e.k = n.k
WHERE n.n_nodes >= 2
ORDER BY k
"""


# ---- r5 grouped long-tail oracles ----------------------------------------

#: Shared CTE fragment: the part digraph edges (same as _SQL_PART_DIGRAPH's
#: dedges but composable AFTER _SQL_PART, which already defines part_pairs).
_SQL_DEDGES_FRAG = """
dedges AS (
  SELECT src, dst FROM part_pairs WHERE (src + dst) % 2 = 0
  UNION
  SELECT dst AS src, src AS dst FROM part_pairs WHERE (src + dst) % 3 = 0
)
"""

_SQL_STRUCTURE_SUITE = f"""
WITH RECURSIVE {_SQL_PART.strip()},
{_SQL_CHAIN.strip()},
{_SQL_DEDGES_FRAG.strip()},
u0 AS (SELECT min(id) AS u FROM part_nodes),
eff_reach(id, lvl) AS (
  SELECT u, 0::BIGINT FROM u0
  UNION
  SELECT e.dst, r.lvl + 1 FROM eff_reach r JOIN sym e ON e.src = r.id
  WHERE r.lvl < 6
),
eff_l AS (
  SELECT min(lvl) AS l FROM eff_reach WHERE id = (SELECT u + 5 FROM u0)
),
dag AS (
  SELECT src, dst FROM part_pairs WHERE src % 8 < dst % 8
  UNION ALL
  SELECT dst AS src, src AS dst FROM part_pairs WHERE dst % 8 < src % 8
),
hi0 AS (SELECT max(id) AS hi FROM part_nodes),
anc_u(id) AS (
  SELECT hi FROM hi0
  UNION
  SELECT e.src FROM dag e JOIN anc_u a ON e.dst = a.id
),
anc_v(id) AS (
  SELECT hi - 1 FROM hi0
  UNION
  SELECT e.src FROM dag e JOIN anc_v a ON e.dst = a.id
),
lca_common AS (SELECT a.id FROM anc_u a JOIN anc_v b ON b.id = a.id),
lca_succ AS (
  SELECT DISTINCT e.src AS id FROM dag e
  WHERE e.src IN (SELECT id FROM lca_common)
    AND e.dst IN (SELECT id FROM lca_common)
),
lca0 AS (
  SELECT coalesce(max(id), -1) AS v FROM lca_common
  WHERE id NOT IN (SELECT id FROM lca_succ)
),
sdom AS (SELECT id FROM part_nodes WHERE id % 10 = 0),
ndom AS (
  SELECT DISTINCT e.dst AS id FROM sym e JOIN sdom s ON e.src = s.id
  WHERE e.dst NOT IN (SELECT id FROM sdom)
),
t8 AS (SELECT id FROM part_nodes ORDER BY id LIMIT 8),
tedges AS (
  SELECT CASE WHEN (a.id + b.id) % 2 = 0 THEN a.id ELSE b.id END AS src,
         CASE WHEN (a.id + b.id) % 2 = 0 THEN b.id ELSE a.id END AS dst
  FROM t8 a JOIN t8 b ON a.id < b.id
),
tn AS (SELECT count(*) AS n FROM t8),
tdeg AS (
  SELECT t.id, (SELECT count(*) FROM tedges e WHERE e.src = t.id) AS d FROM t8 t
),
tmat AS (
  SELECT row_, col_, sum(val) AS value FROM (
    SELECT src AS row_, dst AS col_, 1.0 AS val FROM tedges
    UNION ALL
    SELECT dst AS row_, src AS col_, -1.0 AS val FROM tedges
  ) GROUP BY row_, col_
),
tri_self AS (
  SELECT count(*) AS c FROM dedges d, u0
  WHERE d.src = d.dst AND d.src IN (u, u + 1, u + 2) AND d.dst IN (u, u + 1, u + 2)
),
gdeg AS (
  SELECT n.id, (SELECT count(*) FROM sym e WHERE e.src = n.id) AS d
  FROM part_nodes n
),
cdeg AS (
  SELECT n.id,
         (SELECT count(*) FROM chain c WHERE c.src = n.id OR c.dst = n.id) AS d
  FROM part_nodes n
)
SELECT 'efficiency_u_v5' AS metric,
       (SELECT CASE WHEN l IS NULL THEN 0.0 ELSE 1.0 / l END FROM eff_l) AS value
UNION ALL
SELECT 'mutual_weight_u_v1',
       (SELECT coalesce(sum((1 + (src + dst) % 5)::DOUBLE), 0.0) FROM sym, u0
        WHERE (src = u AND dst = u + 1) OR (src = u + 1 AND dst = u))
UNION ALL
SELECT 'is_simple_path_3',
       (SELECT CASE WHEN EXISTS (SELECT 1 FROM sym, u0 WHERE src = u AND dst = u + 1)
                     AND EXISTS (SELECT 1 FROM sym, u0 WHERE src = u + 1 AND dst = u + 2)
               THEN 1.0 ELSE 0.0 END)
UNION ALL
SELECT 'lca_hi_pair', (SELECT v::DOUBLE FROM lca0)
UNION ALL
SELECT 'is_dominating_mod10',
       CASE WHEN (SELECT count(*) FROM (SELECT id FROM sdom UNION SELECT id FROM ndom))
                 = (SELECT count(*) FROM part_nodes)
            THEN 1.0 ELSE 0.0 END
UNION ALL
SELECT 'is_tournament8',
       CASE WHEN NOT EXISTS (SELECT 1 FROM tedges WHERE src = dst)
             AND (SELECT count(*) FROM tedges) = (SELECT (n * (n - 1)) // 2 FROM tn)
             AND NOT EXISTS (SELECT 1 FROM tedges e
                             JOIN tedges r ON r.src = e.dst AND r.dst = e.src)
            THEN 1.0 ELSE 0.0 END
UNION ALL
SELECT 'tourn_score_sumsq', (SELECT sum(d * d)::DOUBLE FROM tdeg)
UNION ALL
SELECT 'tourn_matrix_nnz', (SELECT count(*)::DOUBLE FROM tmat WHERE value <> 0)
UNION ALL
SELECT 'is_triad_low3', (SELECT CASE WHEN c = 0 THEN 1.0 ELSE 0.0 END FROM tri_self)
UNION ALL
SELECT 'iso_self',
       CASE WHEN (SELECT list_sort(list(d)) FROM gdeg)
                 = (SELECT list_sort(list(d)) FROM gdeg)
            THEN 1.0 ELSE 0.0 END
UNION ALL
SELECT 'iso_chain',
       CASE WHEN (SELECT count(*) FROM part_nodes) = (SELECT count(*) FROM part_nodes)
             AND (SELECT count(*) FROM part_pairs) = (SELECT count(*) FROM chain)
             AND (SELECT list_sort(list(d)) FROM gdeg)
                 = (SELECT list_sort(list(d)) FROM cdeg)
            THEN 1.0 ELSE 0.0 END
"""

_SQL_SETOPS_REST = f"""
WITH {_SQL_PART.strip()},
{_SQL_CHAIN.strip()},
{_SQL_DEDGES_FRAG.strip()},
nn AS (SELECT count(*) AS n FROM part_nodes),
pp_n AS (SELECT count(*) AS m FROM part_pairs),
ch_n AS (SELECT count(*) AS m FROM chain),
un_n AS (
  SELECT count(*) AS m FROM (
    SELECT src, dst FROM part_pairs UNION SELECT src, dst FROM chain
  )
),
de_n AS (SELECT count(*) AS m FROM dedges),
tu_n AS (
  SELECT count(*) AS m FROM (
    SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b FROM dedges
  )
),
comp_w AS (
  SELECT sum(CASE WHEN EXISTS (SELECT 1 FROM chain c
                               WHERE c.src = e.src AND c.dst = e.dst)
                  THEN 1.0 ELSE (1 + (e.src + e.dst) % 5)::DOUBLE END) AS s
  FROM (SELECT src, dst FROM part_pairs UNION SELECT src, dst FROM chain) e
)
SELECT 'union' AS op, (SELECT n FROM nn) AS n_nodes,
       (SELECT m FROM un_n) AS n_edges, 0.0 AS checksum
UNION ALL
SELECT 'disjoint_union', 2 * (SELECT n FROM nn),
       (SELECT m FROM pp_n) + (SELECT m FROM ch_n), 0.0
UNION ALL
SELECT 'compose_w', (SELECT n FROM nn), (SELECT m FROM un_n), (SELECT s FROM comp_w)
UNION ALL
SELECT 'full_join', 2 * (SELECT n FROM nn),
       (SELECT m FROM pp_n) + (SELECT m FROM ch_n) + (SELECT n * n FROM nn), 0.0
UNION ALL
SELECT 'complement_chain', (SELECT n FROM nn),
       (SELECT (n * (n - 1)) // 2 FROM nn) - (SELECT m FROM ch_n), 0.0
UNION ALL
SELECT 'reverse', (SELECT n FROM nn), (SELECT m FROM de_n), 0.0
UNION ALL
SELECT 'to_undirected', (SELECT n FROM nn), (SELECT m FROM tu_n), 0.0
"""


def _sql_bf_path(rounds: int = 14) -> str:
    """Bellman-Ford path-reconstruction replay: the kernel's per-round
    min(struct(dist, parent)) argmin becomes a two-step min: cd = min
    candidate dist per node, cp = min parent among candidates achieving
    cd; the frontier-delta trajectory (frontier = strictly-improved rows)
    is replayed verbatim so the trajectory-dependent parent column
    matches.  Integer weights keep every dist double exact; rounds past
    convergence are exact no-ops (empty frontier)."""
    parts = [
        f"""WITH {_SQL_PART.strip()},
u0 AS (SELECT min(id) AS u FROM part_nodes),
symw AS MATERIALIZED (
  SELECT src, dst, (1 + (src + dst) % 5)::DOUBLE AS w FROM sym
),
st0 AS MATERIALIZED (SELECT u AS id, 0.0 AS dist, u AS parent FROM u0),
fr0 AS MATERIALIZED (SELECT u AS id, 0.0 AS dist FROM u0),"""
    ]
    for k in range(1, rounds + 1):
        parts.append(
            f"""cd{k} AS MATERIALIZED (
  SELECT e.dst AS id, min(f.dist + e.w) AS cd
  FROM fr{k - 1} f JOIN symw e ON e.src = f.id
  GROUP BY e.dst
),
cp{k} AS MATERIALIZED (
  SELECT c.id, c.cd, min(f.id) AS cp
  FROM cd{k} c JOIN symw e ON e.dst = c.id JOIN fr{k - 1} f ON f.id = e.src
  WHERE f.dist + e.w = c.cd
  GROUP BY c.id, c.cd
),
im{k} AS MATERIALIZED (
  SELECT c.id, c.cd AS dist, c.cp AS parent
  FROM cp{k} c LEFT JOIN st{k - 1} s ON s.id = c.id
  WHERE s.id IS NULL OR c.cd < s.dist
),
st{k} AS MATERIALIZED (
  SELECT COALESCE(s.id, i.id) AS id,
         CASE WHEN i.id IS NOT NULL AND (s.id IS NULL OR i.dist < s.dist)
              THEN i.dist ELSE s.dist END AS dist,
         CASE WHEN i.id IS NOT NULL AND (s.id IS NULL OR i.dist < s.dist)
              THEN i.parent ELSE s.parent END AS parent
  FROM st{k - 1} s FULL OUTER JOIN im{k} i ON i.id = s.id
),
fr{k} AS MATERIALIZED (SELECT id, dist FROM im{k}),"""
        )
    joined = "\n".join(parts)
    if joined.endswith(","):
        joined = joined[:-1]
    return joined + f"\nSELECT id, dist, parent FROM st{rounds}"


_SQL_PATHS_SUITE = f"""
WITH RECURSIVE {_SQL_PART.strip()},
{_SQL_DEDGES_FRAG.strip()},
u0 AS (SELECT min(id) AS u FROM part_nodes),
dwedges AS (SELECT src, dst, (1 + (src + dst) % 5)::DOUBLE AS w FROM dedges),
crafted AS (
  SELECT u AS src, u + 1 AS dst, 1.0 AS w FROM u0
  UNION ALL SELECT u + 1, u + 2, -2.0 FROM u0
  UNION ALL SELECT u + 2, u, -1.0 FROM u0
),
bidir_reach(id, lvl) AS (
  SELECT u, 0::BIGINT FROM u0
  UNION
  SELECT e.dst, r.lvl + 1 FROM bidir_reach r JOIN sym e ON e.src = r.id
  WHERE r.lvl < 8
),
bidir_l AS (
  SELECT min(lvl) AS l FROM bidir_reach WHERE id = (SELECT u + 5 FROM u0)
),
reach_u(id) AS (
  SELECT u FROM u0
  UNION
  SELECT e.dst FROM sym e JOIN reach_u r ON e.src = r.id
),
iso0 AS (
  SELECT min(id) AS iso FROM part_nodes
  WHERE id NOT IN (SELECT src FROM part_pairs)
    AND id NOT IN (SELECT dst FROM part_pairs)
)
SELECT 'neg_cycle_positive' AS metric,
       CASE WHEN EXISTS (SELECT 1 FROM dwedges WHERE w < 0) THEN 1.0 ELSE 0.0 END
         AS value
UNION ALL
SELECT 'neg_cycle_crafted',
       CASE WHEN (SELECT sum(w) FROM crafted) < 0 THEN 1.0 ELSE 0.0 END
UNION ALL
SELECT 'bidir_u_v5', (SELECT coalesce(l, -1)::DOUBLE FROM bidir_l)
UNION ALL
SELECT 'has_path_u_v5',
       CASE WHEN (SELECT u + 5 FROM u0) IN (SELECT id FROM reach_u)
            THEN 1.0 ELSE 0.0 END
UNION ALL
SELECT 'has_path_u_isolated',
       (SELECT CASE WHEN iso IS NULL THEN -1.0
                    WHEN iso IN (SELECT id FROM reach_u) THEN 1.0
                    ELSE 0.0 END FROM iso0)
"""


def _sql_floyd_warshall(rounds: int = 7) -> str:
    """Min-plus matrix-squaring replay of floyd_warshall on the 60-node
    weighted subgraph: d_{{k+1}}(i,j) = min(d_k(i,j), min_m d_k(i,m) +
    d_k(m,j)) — 7 squarings cover 2^7 hops, far past the subgraph's hop
    diameter; integer weights keep every min exact; extra rounds are
    exact no-ops at the fixpoint."""
    parts = [
        f"""WITH {_SQL_PART.strip()},
u0 AS (SELECT min(id) AS u FROM part_nodes),
sub_nodes AS MATERIALIZED (SELECT id FROM part_nodes, u0 WHERE id < u + 60),
sube AS MATERIALIZED (
  SELECT src, dst, (1 + (src + dst) % 5)::DOUBLE AS w
  FROM part_pairs, u0 WHERE src < u + 60 AND dst < u + 60
),
d0 AS MATERIALIZED (
  SELECT r, c, min(d) AS d FROM (
    SELECT id AS r, id AS c, 0.0 AS d FROM sub_nodes
    UNION ALL SELECT src, dst, w FROM sube
    UNION ALL SELECT dst, src, w FROM sube
  ) GROUP BY r, c
),"""
    ]
    for k in range(1, rounds + 1):
        parts.append(
            f"""d{k} AS MATERIALIZED (
  SELECT r, c, min(d) AS d FROM (
    SELECT a.r, b.c, a.d + b.d AS d FROM d{k - 1} a JOIN d{k - 1} b ON a.c = b.r
    UNION ALL
    SELECT r, c, d FROM d{k - 1}
  ) GROUP BY r, c
),"""
        )
    joined = "\n".join(parts)
    if joined.endswith(","):
        joined = joined[:-1]
    return joined + f"\nSELECT r AS row, c AS col, d AS value FROM d{rounds}"


_SQL_TRAVERSAL_REST = f"""
WITH RECURSIVE {_SQL_PART.strip()},
{_SQL_DEDGES_FRAG.strip()},
u0 AS (SELECT min(id) AS u FROM part_nodes),
lay_reach(id, lvl) AS (
  SELECT u, 0::BIGINT FROM u0
  UNION
  SELECT e.dst, r.lvl + 1 FROM lay_reach r JOIN sym e ON e.src = r.id
  WHERE r.lvl < 12
),
lay AS (SELECT id, min(lvl) AS lvl FROM lay_reach GROUP BY id),
d2_reach(id, lvl) AS (
  SELECT u, 0::BIGINT FROM u0
  UNION
  SELECT e.dst, r.lvl + 1 FROM d2_reach r JOIN dedges e ON e.src = r.id
  WHERE r.lvl < 2
),
d2 AS (SELECT id, min(lvl) AS lvl FROM d2_reach GROUP BY id),
desc_u(id) AS (
  SELECT u FROM u0
  UNION
  SELECT e.dst FROM dedges e JOIN desc_u r ON e.src = r.id
),
anc_su(id) AS (
  SELECT u FROM u0
  UNION
  SELECT e.src FROM dedges e JOIN anc_su r ON e.dst = r.id
)
SELECT 'layer_' || lvl AS metric, id FROM lay
UNION ALL
SELECT 'desc_at_2', id FROM d2 WHERE lvl = 2
UNION ALL
SELECT 'descendants', id FROM desc_u WHERE id <> (SELECT u FROM u0)
UNION ALL
SELECT 'ancestors', id FROM anc_su WHERE id <> (SELECT u FROM u0)
"""

_SQL_CUTS_SUITE = f"""
WITH {_SQL_PART.strip()},
s AS (SELECT id FROM part_nodes WHERE id % 4 = 0),
t AS (SELECT id FROM part_nodes WHERE id % 4 = 1),
nn AS (SELECT count(*) AS n FROM part_nodes),
mm AS (SELECT count(*) AS m FROM part_pairs),
cut AS (
  SELECT count(*)::BIGINT AS c FROM sym
  WHERE src IN (SELECT id FROM s) AND dst NOT IN (SELECT id FROM s)
),
cut_st AS (
  SELECT count(*)::BIGINT AS c FROM sym
  WHERE src IN (SELECT id FROM s) AND dst IN (SELECT id FROM t)
),
vol_s AS (SELECT count(*)::BIGINT AS v FROM sym WHERE src IN (SELECT id FROM s)),
vol_t AS (
  SELECT count(*)::BIGINT AS v FROM sym WHERE src NOT IN (SELECT id FROM s)
),
sn AS (SELECT count(*)::BIGINT AS c FROM s),
nb AS (
  SELECT count(*)::BIGINT AS c FROM (
    SELECT DISTINCT dst AS id FROM sym
    WHERE src IN (SELECT id FROM s) AND dst NOT IN (SELECT id FROM s)
  )
)
SELECT 'normalized_cut' AS metric,
       (SELECT c FROM cut) * (1.0 / (SELECT v FROM vol_s)
                              + 1.0 / (SELECT v FROM vol_t)) AS value
UNION ALL
SELECT 'edge_expansion',
       (SELECT c FROM cut)
       / least((SELECT c FROM sn), (SELECT n FROM nn) - (SELECT c FROM sn))
UNION ALL
SELECT 'mixing_expansion', (SELECT c FROM cut) / (2.0 * (SELECT m FROM mm))
UNION ALL
SELECT 'node_expansion',
       ((SELECT c FROM nb) + (SELECT c FROM sn)) / (SELECT c FROM sn)
UNION ALL
SELECT 'boundary_expansion', (SELECT c FROM nb) / (SELECT c FROM sn)
UNION ALL
SELECT 'cut_size_S_T', (SELECT c FROM cut_st)::DOUBLE
"""

#: 1.0 - 0.85 computed in Python is 0.15000000000000002; the oracle must
#: use the same literal for bit-exact teleport terms.
_SQL_GOOGLE_MATRIX = f"""
WITH {_SQL_PART.strip()},
u0 AS (SELECT min(id) AS u FROM part_nodes),
gm_nodes AS (SELECT id FROM part_nodes, u0 WHERE id < u + 100),
gme AS (
  SELECT src, dst FROM part_pairs, u0 WHERE src < u + 100 AND dst < u + 100
),
gmsym AS (
  SELECT src, dst, 1.0 AS w FROM gme
  UNION ALL
  SELECT dst AS src, src AS dst, 1.0 AS w FROM gme
),
od AS (SELECT src, sum(w) AS od FROM gmsym GROUP BY src),
pn AS (SELECT 1.0 / count(*) AS p FROM gm_nodes),
dang AS (
  SELECT id FROM gm_nodes WHERE id NOT IN (SELECT src FROM gmsym)
)
SELECT a.id AS row, b.id AS col,
       0.85 * coalesce(s.v, 0.0)
       + (CASE WHEN a.id IN (SELECT id FROM dang)
               THEN 0.85 * (SELECT p FROM pn) ELSE 0.0 END)
       + {1.0 - 0.85!r} * (SELECT p FROM pn) AS value
FROM gm_nodes a
CROSS JOIN gm_nodes b
LEFT JOIN (
  SELECT e.src, e.dst, e.w / o.od AS v FROM gmsym e JOIN od o ON o.src = e.src
) s ON s.src = a.id AND s.dst = b.id
"""


def oracle_sql() -> dict[str, str]:
    return {
        "graph_pagerank": _sql_pagerank(),
        "graph_ppr_multi": _sql_ppr_multi(),
        "graph_pagerank_weighted": _sql_pagerank_weighted(),
        "graph_pagerank_personalized": _sql_pagerank_personalized(),
        "graph_spam_mass": _sql_spam_mass(),
        "graph_pagerank_incremental": _sql_pagerank_incremental(),
        "graph_structure_suite": _SQL_STRUCTURE_SUITE,
        "graph_setops_rest": _SQL_SETOPS_REST,
        "graph_bf_path": _sql_bf_path(),
        "graph_paths_suite": _SQL_PATHS_SUITE,
        "graph_floyd_warshall": _sql_floyd_warshall(),
        "graph_traversal_rest": _SQL_TRAVERSAL_REST,
        "graph_cuts_suite": _SQL_CUTS_SUITE,
        "graph_google_matrix": _SQL_GOOGLE_MATRIX,
        "graph_components": _SQL_COMPONENTS,
        "graph_components_star": _SQL_COMPONENTS,
        "graph_components_incremental": _SQL_COMPONENTS,
        "graph_wcc": _SQL_WCC,
        "graph_scc": _SQL_SCC,
        "graph_bowtie": _SQL_BOWTIE,
        "graph_labelprop": _sql_labelprop(),
        "graph_louvain": _sql_louvain(),
        "graph_triangles_total": _SQL_TRIANGLES_TOTAL,
        "graph_triangles_incremental": _SQL_TRIANGLES_TOTAL,
        "graph_triangles": _SQL_TRIANGLES,
        "graph_four_cliques": _SQL_FOUR_CLIQUES,
        "graph_triangles_weighted": _SQL_TRIANGLES_WEIGHTED,
        "graph_clustering": _SQL_CLUSTERING,
        "graph_transitivity": _SQL_TRANSITIVITY,
        "graph_degree_centrality": _SQL_DEGREE_CENTRALITY,
        "graph_inout_degrees": _SQL_INOUT,
        "graph_katz": _sql_katz(),
        "graph_bfs": _SQL_BFS,
        "graph_sssp": _sql_sssp(),
        "graph_hits": _sql_hits(),
        "graph_eigenvector": _sql_eigenvector(),
        "graph_setops_intersection": _SQL_SETOPS_INTERSECTION,
        "graph_setops_difference": _SQL_SETOPS_DIFFERENCE,
        "graph_setops_symdiff": _SQL_SETOPS_SYMDIFF,
        "graph_bfs_parent": _SQL_BFS_PARENT,
        "graph_bfs_multi": _SQL_BFS_MULTI,
        "graph_ego": _SQL_EGO,
        "graph_square_clustering": _SQL_SQUARE_CLUSTERING,
        "graph_clustering_directed": _SQL_CLUSTERING_DIRECTED,
        "graph_generalized_degree": _SQL_GENERALIZED_DEGREE,
        "graph_edge_support": _SQL_EDGE_SUPPORT,
        "graph_effective_size": _SQL_EFFECTIVE_SIZE,
        "graph_local_bridges": _SQL_LOCAL_BRIDGES,
        "graph_ktruss": _sql_ktruss(),
        "graph_trussness": _sql_trussness(),
        "graph_kcore": _sql_kcore(),
        "graph_core_number": _sql_core_number(),
        "graph_densest": _sql_densest(),
        "graph_diameter": _SQL_DIAMETER,
        "graph_triad_census": _sql_triad_census(),
        "graph_onion": _sql_onion(),
        "graph_linkpred": _SQL_LINKPRED,
        "graph_negative_sample": _SQL_NEGATIVE_SAMPLE,
        "graph_linkpred_trainset": _SQL_LINKPRED_TRAINSET,
        "graph_khop_sample": _SQL_KHOP_SAMPLE,
        "graph_feature_prop": _SQL_FEATURE_PROP,
        "graph_closeness": _SQL_CLOSENESS,
        "graph_harmonic": _SQL_HARMONIC,
        "graph_betweenness": _sql_betweenness(),
        "graph_edge_betweenness": _sql_edge_betweenness(),
        "graph_walks": _sql_walks(),
        "graph_walks_weighted": _sql_walks(weighted=True),
        "graph_node2vec": _sql_node2vec(),
        "graph_node2vec_rejection": _sql_node2vec_rejection(),
        "graph_mis": _sql_mis(),
        "graph_wl": _sql_wl(),
        "graph_fiedler": _sql_fiedler(),
        "graph_topo_generations": _sql_topo(),
        "graph_hyperball": _sql_hyperball(),
        "graph_ppr_push": _sql_ppr_push(),
        "graph_neighborhood_function": _sql_neighborhood_function(),
        "graph_bridges": _SQL_BRIDGES,
        "graph_2ecc": _SQL_2ECC,
        "graph_eulerian": _SQL_EULERIAN,
        "graph_condensation_layers": _SQL_CONDENSATION,
        "graph_degree_hist": _SQL_DEGREE_HIST,
        "events_temporal_reach": _sql_temporal_reach(),
        "graph_butterflies": _SQL_BUTTERFLIES,
        "graph_landmarks": _SQL_LANDMARKS,
        "graph_matching": _sql_matching(),
        "graph_coarsen": _sql_matching(coarsen=True),
        "graph_vertex_cover": _sql_matching(cover=True),
        "graph_coloring": _sql_coloring(),
        "graph_isolates": _SQL_ISOLATES,
        "graph_smetric": _SQL_SMETRIC,
        "graph_reciprocity": _SQL_RECIPROCITY,
        "graph_conductance": _SQL_CONDUCTANCE,
        "graph_node_boundary": _SQL_NODE_BOUNDARY,
        "graph_laplacian": _SQL_LAPLACIAN,
        "graph_assortativity": _SQL_ASSORTATIVITY,
        "graph_avg_neighbor_degree": _SQL_AVG_NBR_DEG,
        "graph_modularity": _SQL_MODULARITY,
        "graph_rich_club": _SQL_RICH_CLUB,
        "pipe_token_counts": _SQL_TOKEN_COUNTS,
        "pipe_lm_score": _SQL_LM_SCORE,
        "pipe_fingerprints": _SQL_FINGERPRINTS,
        "pipe_exact_dups": _SQL_EXACT_DUPS,
        "pipe_quality": _SQL_QUALITY,
        "pipe_repetition": _SQL_REPETITION,
        "pipe_source_mix": _SQL_SOURCE_MIX,
        "pipe_domain_cap": _SQL_DOMAIN_CAP,
        "pipe_common_ngrams": _SQL_COMMON_NGRAMS,
        "pipe_tfidf_topterms": _SQL_TFIDF_TOPTERMS,
        "pipe_pmi_bigrams": _SQL_PMI_BIGRAMS,
        "pipe_doc_entropy": _SQL_DOC_ENTROPY,
        "pipe_span_dedup": _SQL_SPAN_DEDUP,
        "pipe_decontaminate": _SQL_DECONTAMINATE,
        "pipe_token_budget_sample": _SQL_TOKEN_BUDGET_SAMPLE,
        "pipe_pack_sequences": _SQL_PACK_SEQUENCES,
        "pipe_shard_manifest": _SQL_SHARD_MANIFEST,
        "pipe_weighted_sample": _SQL_WEIGHTED_SAMPLE,
        "pipe_chunk_documents": _SQL_CHUNK_DOCUMENTS,
        "pipe_langid": _sql_langid(),
        "pipe_clean_corpus": _sql_clean_corpus(),
        "pipe_ngram_jaccard": _SQL_NGRAM_JACCARD,
        "pipe_minhash_neardup": _sql_minhash_neardup(),
        "pipe_dedup_incremental": _sql_dedup_incremental(),
        "pipe_dedup_clusters": _sql_dedup_clusters(),
        "pipe_simhash": _sql_simhash(),
        "pipe_embedding_neardup": _SQL_EMB_NEARDUP,
        "pipe_embedding_lsh": _sql_embedding_lsh(),
        "pipe_semdedup": _SQL_SEMDEDUP,
        "pipe_ann_topk": _SQL_ANN_TOPK,
        "pipe_ann_ivf": _SQL_ANN_IVF,
        "pipe_ann_ivf_pandas": _SQL_ANN_IVF_PANDAS,
        "pipe_ann_ivf_pq": _SQL_ANN_IVF_PQ,
        "events_windowed": _SQL_EVENTS_WINDOWED,
        "events_sessions": _SQL_EVENTS_SESSIONS,
        "events_funnel": _SQL_EVENTS_FUNNEL,
        "events_windowed_closed": _SQL_EVENTS_WINDOWED_CLOSED,
        "events_sessions_closed": _SQL_EVENTS_SESSIONS_CLOSED,
        "olap_pricing": _SQL_OLAP_PRICING,
        "olap_top_customers": _SQL_OLAP_TOPCUST,
        "graph_keyed_pagerank": _sql_keyed_pagerank(),
        "pipe_multimodal_features": _SQL_MULTIMODAL_FEATURES,
        "pipe_frame_sample": _SQL_FRAME_SAMPLE,
    }
