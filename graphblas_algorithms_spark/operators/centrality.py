"""Centrality kernels: degree, eigenvector, Katz — plus HITS.

All share the pagerank superstep template (SURVEY §2.2 [S] tier):

* ``degree_centrality`` — ``centrality/degree_alg.py:6-32``:
  degree * 1/(n-1).
* ``eigenvector_centrality`` — ``centrality/eigenvector.py:9-33``:
  ``x <- x + x@A``, L2 normalize, L1 converge ``err < n*tol``.
* ``katz_centrality`` — ``centrality/katz.py:11-55``:
  ``x <- alpha*(x@A) + beta``; the reference folds iso edge values into
  alpha (``:35-40``) — our analog: unweighted graphs have no weight
  column so the multiply constant-folds (O3).
* ``hits`` — ``link_analysis/hits_alg.py:9-62``: alternating
  ``a <- h@A``, ``h <- A@a`` with L-inf normalization per iteration.

Each normalization scalar is cross-joined in lazily so a superstep
remains ONE action (O12).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..exceptions import ConvergenceFailure
from ..functions.semiring import mxv, vxm
from ..plans.superstep import lineage_cut, Superstep, scalar_agg


def degree_centrality(G) -> DataFrame:
    """(id, centrality) — degree/(n-1), self-edges counted twice
    (matches nx.degree_centrality on graphs with self-loops)."""
    n = G.n
    if G.is_directed_flag:
        deg = G.get_property("total_degrees")
    else:
        diag = G.get_property("diag").select(F.col("src").alias("id"), F.lit(1).alias("_d"))
        deg = (
            G.get_property("degrees_plus")
            .join(diag, "id", "left")
            .select("id", (F.col("degree") + F.coalesce("_d", F.lit(0))).alias("degree"))
        )
    scale = 1.0 / (n - 1) if n > 1 else 1.0
    out = deg.select("id", (F.col("degree") * F.lit(scale)).alias("centrality"))
    return G.nodes.join(out, "id", "left").select(
        "id", F.coalesce("centrality", F.lit(0.0)).alias("centrality")
    )


def in_degree_centrality(G) -> DataFrame:
    n = G.n
    scale = 1.0 / (n - 1) if n > 1 else 1.0
    out = G.get_property("in_degrees").select(
        "id", (F.col("degree") * F.lit(scale)).alias("centrality")
    )
    return G.nodes.join(out, "id", "left").select(
        "id", F.coalesce("centrality", F.lit(0.0)).alias("centrality")
    )


def out_degree_centrality(G) -> DataFrame:
    n = G.n
    scale = 1.0 / (n - 1) if n > 1 else 1.0
    out = G.get_property("out_degrees").select(
        "id", (F.col("degree") * F.lit(scale)).alias("centrality")
    )
    return G.nodes.join(out, "id", "left").select(
        "id", F.coalesce("centrality", F.lit(0.0)).alias("centrality")
    )


def _adj(G) -> DataFrame:
    return G.edges if G.is_directed_flag else G.get_property("sym_edges")


def eigenvector_centrality(
    G,
    max_iter: int = 100,
    tol: float = 1e-6,
    nstart: dict | None = None,
    fixed_iters: int | None = None,
) -> DataFrame:
    """(id, centrality) — power iteration (``eigenvector.py:9-33``).

    ``fixed_iters`` runs exactly that many iterations with no convergence
    action (deterministic trajectory for the DuckDB-oracle queries)."""
    spark = G.spark
    n = G.n
    adj = _adj(G).persist()
    if nstart is None:
        x = G.nodes.select("id", (F.lit(1.0) / F.lit(float(n))).alias("value"))
    else:
        x = spark.createDataFrame(
            [(int(k), float(v)) for k, v in nstart.items()], "id long, value double"
        )
    x = x.persist()
    harness = Superstep(spark)
    iters = fixed_iters if fixed_iters is not None else max_iter
    for it in range(iters):
        prop = vxm(x, adj, add="sum", mul="times").withColumnRenamed("value", "_p")
        y = x.join(prop, "id", "left").select(
            "id", (F.col("value") + F.coalesce("_p", F.lit(0.0))).alias("_y")
        )
        norm = y.agg(F.sqrt(F.sum(F.col("_y") * F.col("_y"))).alias("_norm"))
        new_x = y.crossJoin(F.broadcast(norm)).select(
            "id",
            F.when(F.col("_norm") > 0, F.col("_y") / F.col("_norm"))
            .otherwise(F.col("_y"))
            .alias("value"),
        )
        new_x = harness.materialize(new_x, it, {"kernel": "eigenvector"})
        if fixed_iters is not None:
            x = new_x
            continue
        err = scalar_agg(
            new_x.join(x.withColumnRenamed("value", "_prev"), "id", "left"),
            err=F.sum(F.abs(F.col("value") - F.coalesce("_prev", F.lit(0.0)))),
        )["err"]
        x = new_x
        if err is not None and err < n * tol:
            adj.unpersist()
            return x.select("id", F.col("value").alias("centrality"))
    adj.unpersist()
    if fixed_iters is not None:
        return x.select("id", F.col("value").alias("centrality"))
    raise ConvergenceFailure(f"eigenvector: no convergence in {max_iter} iterations")


def katz_centrality(
    G,
    alpha: float = 0.1,
    beta: float = 1.0,
    max_iter: int = 1000,
    tol: float = 1e-6,
    nstart: dict | None = None,
    normalized: bool = True,
    fixed_iters: int | None = None,
) -> DataFrame:
    """(id, centrality) — ``katz.py:11-55``.

    ``fixed_iters`` runs exactly that many iterations with no convergence
    action (deterministic trajectory for the DuckDB-oracle queries)."""
    spark = G.spark
    n = G.n
    adj = _adj(G).persist()
    if nstart is None:
        x = G.nodes.select("id", F.lit(0.0).alias("value"))
    else:
        x = spark.createDataFrame(
            [(int(k), float(v)) for k, v in nstart.items()], "id long, value double"
        )
    x = x.persist()
    harness = Superstep(spark)
    iters = fixed_iters if fixed_iters is not None else max_iter
    for it in range(iters):
        prop = vxm(x, adj, add="sum", mul="times").withColumnRenamed("value", "_p")
        new_x = G.nodes.join(prop, "id", "left").select(
            "id",
            (F.lit(alpha) * F.coalesce("_p", F.lit(0.0)) + F.lit(beta)).alias("value"),
        )
        new_x = harness.materialize(new_x, it, {"kernel": "katz"})
        if fixed_iters is not None:
            x = new_x
            continue
        err = scalar_agg(
            new_x.join(x.withColumnRenamed("value", "_prev"), "id", "left"),
            err=F.sum(F.abs(F.col("value") - F.coalesce("_prev", F.lit(0.0)))),
        )["err"]
        x = new_x
        if err is not None and err < n * tol:
            break
    else:
        if fixed_iters is None:
            adj.unpersist()
            raise ConvergenceFailure(f"katz: no convergence in {max_iter} iterations")
    adj.unpersist()
    if normalized:
        norm = x.agg(F.sqrt(F.sum(F.col("value") * F.col("value"))).alias("_n"))
        x = x.crossJoin(F.broadcast(norm)).select(
            "id",
            F.when(F.col("_n") > 0, F.col("value") / F.col("_n"))
            .otherwise(F.col("value"))
            .alias("value"),
        )
    return x.select("id", F.col("value").alias("centrality"))


def hits(
    G,
    max_iter: int = 100,
    tol: float = 1e-8,
    nstart: dict | None = None,
    normalized: bool = True,
    fixed_iters: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """((id, hub), (id, authority)) — ``hits_alg.py:9-62``.

    Per iteration: a = hlast@A (L-inf normalized), h = A@a (L-inf
    normalized), converge on L1(h - hlast) < tol*n.  ``fixed_iters``
    runs exactly that many iterations with no convergence action
    (deterministic trajectory for the DuckDB-oracle queries).
    """
    spark = G.spark
    n = G.n
    adj = _adj(G).persist()
    if nstart is None:
        h = G.nodes.select("id", (F.lit(1.0) / F.lit(float(n))).alias("value"))
    else:
        h = spark.createDataFrame(
            [(int(k), float(v)) for k, v in nstart.items()], "id long, value double"
        )
    h = h.persist()
    harness = Superstep(spark)
    a = None
    iters = fixed_iters if fixed_iters is not None else max_iter
    for it in range(iters):
        a_raw = vxm(h, adj, add="sum", mul="times")  # a = h @ A
        amax = a_raw.agg(F.max("value").alias("_m"))
        a = a_raw.crossJoin(F.broadcast(amax)).select(
            "id",
            F.when(F.col("_m") != 0, F.col("value") / F.col("_m"))
            .otherwise(F.col("value"))
            .alias("value"),
        )
        # a feeds both h_raw and hmax below — without a hard cut the plan
        # tree would double through the crossJoin every iteration
        a = a.transform(lineage_cut)
        h_raw = mxv(adj, a, add="sum", mul="times")  # h = A @ a
        hmax = h_raw.agg(F.max("value").alias("_m"))
        new_h = h_raw.crossJoin(F.broadcast(hmax)).select(
            "id",
            F.when(F.col("_m") != 0, F.col("value") / F.col("_m"))
            .otherwise(F.col("value"))
            .alias("value"),
        )
        # keep dense over nodes so the L1 error sees dropped-to-zero nodes
        new_h = G.nodes.join(new_h, "id", "left").select(
            "id", F.coalesce("value", F.lit(0.0)).alias("value")
        )
        new_h = harness.materialize(new_h, it, {"kernel": "hits"})
        if fixed_iters is not None:
            h = new_h
            continue
        err = scalar_agg(
            new_h.join(h.withColumnRenamed("value", "_prev"), "id", "left"),
            err=F.sum(F.abs(F.col("value") - F.coalesce("_prev", F.lit(0.0)))),
        )["err"]
        h = new_h
        if err is not None and err < tol * n:
            break
    else:
        if fixed_iters is None:
            adj.unpersist()
            raise ConvergenceFailure(f"hits: no convergence in {max_iter} iterations")
    a = G.nodes.join(a, "id", "left").select(
        "id", F.coalesce("value", F.lit(0.0)).alias("value")
    )
    if normalized:
        hs = h.agg(F.sum("value").alias("_s"))
        h = h.crossJoin(F.broadcast(hs)).select(
            "id",
            F.when(F.col("_s") != 0, F.col("value") / F.col("_s"))
            .otherwise(F.col("value"))
            .alias("hub"),
        )
        as_ = a.agg(F.sum("value").alias("_s"))
        a = a.crossJoin(F.broadcast(as_)).select(
            "id",
            F.when(F.col("_s") != 0, F.col("value") / F.col("_s"))
            .otherwise(F.col("value"))
            .alias("authority"),
        )
    else:
        h = h.select("id", F.col("value").alias("hub"))
        a = a.select("id", F.col("value").alias("authority"))
    adj.unpersist()
    return h, a


def harmonic_centrality(
    G,
    sources: list[int] | None = None,
    dense: bool = True,
    chunk_size: int | None = None,
    max_sources: int | None = -1,
) -> DataFrame:
    """(id, harmonic: double) = sum over s in ``sources`` of 1/d(s, id).

    NetworkX ``harmonic_centrality`` semantics (not in the reference —
    the distance side of the centrality family its BFS kernels imply).
    ``sources=None`` is the exact all-sources form — O(n) batched BFS,
    small-graph only; an explicit pivot set is the scale path (the
    standard sampled-harmonic estimator: k pivots = one (k x n) matrix
    frontier, the same O9 queries-as-matrix shape as ``bfs_levels_multi``,
    cost independent of n beyond the BFS itself).  Unreachable pairs
    contribute 0; for directed graphs distances follow edge direction
    INTO the node (nx convention: d(s, v))."""
    from .shortest_paths import all_pairs_shortest_path_length

    if sources is not None and len(sources) == 0:
        zero = G.nodes.select("id", F.lit(0.0).alias("harmonic"))
        return zero if dense else zero.limit(0)
    if max_sources == -1:  # engine default: guard only the all-sources path
        from .shortest_paths import EXACT_SOURCES_MAX

        max_sources = EXACT_SOURCES_MAX if sources is None else None
    dists = all_pairs_shortest_path_length(
        G, sources=sources, chunk_size=chunk_size, max_sources=max_sources
    )
    h = (
        dists.filter(F.col("source") != F.col("id"))
        .groupBy("id")
        .agg(F.sum(1.0 / F.col("length")).alias("harmonic"))
    )
    if not dense:
        return h
    return G.nodes.join(h, "id", "left").select(
        "id", F.coalesce("harmonic", F.lit(0.0)).alias("harmonic")
    )


def closeness_centrality(
    G,
    wf_improved: bool = True,
    chunk_size: int | None = None,
    max_sources: int | None = -1,
) -> DataFrame:
    """(id, closeness: double) — nx ``closeness_centrality``:
    (r-1)/totdist, Wasserman-Faust-scaled by (r-1)/(n-1) where r is the
    node's reachable-set size (self included).  Exact form needs all-pairs
    distances (chunked batched BFS) — at web scale use
    ``harmonic_centrality`` with pivots instead (closeness does not
    decompose over a source sample; harmonic does).  Directed graphs use
    incoming distances (nx convention)."""
    from .shortest_paths import all_pairs_shortest_path_length

    n = G.n
    if max_sources == -1:
        from .shortest_paths import EXACT_SOURCES_MAX

        max_sources = EXACT_SOURCES_MAX
    dists = all_pairs_shortest_path_length(
        G, chunk_size=chunk_size, transpose=G.is_directed_flag,
        max_sources=max_sources,
    )
    # distances are source->id; closeness of u aggregates d(., u): with the
    # transpose above, (source=u) rows ARE the incoming distances to u
    agg = (
        dists.filter(F.col("source") != F.col("id"))
        .groupBy("source")
        .agg(F.sum("length").alias("tot"), F.count("*").alias("r"))
    )
    wf = (F.col("r") / (n - 1)) if (wf_improved and n > 1) else F.lit(1.0)
    c = agg.select(
        F.col("source").alias("id"),
        F.when(F.col("tot") > 0, (F.col("r") / F.col("tot")) * wf)
        .otherwise(0.0)
        .alias("closeness"),
    )
    return G.nodes.join(c, "id", "left").select(
        "id", F.coalesce("closeness", F.lit(0.0)).alias("closeness")
    )
