"""Betweenness centrality — Brandes' algorithm as batched DataFrame supersteps.

Not in the reference (graphblas-algorithms stops at eigenvector/katz/
degree); added because betweenness is the remaining classic centrality
and its pivot-sampled estimator is the standard web-scale form.  The
structure reuses the engine's two load-bearing shapes:

* forward pass = the multi-source BFS matrix frontier
  (``_bfs.py:78-107``'s queries-as-matrix trick, SURVEY O9) carrying a
  ``sigma`` shortest-path-count column — one join+agg per level serves
  every pivot at once;
* backward pass = Brandes' dependency accumulation
  delta(v) = sum over DAG successors w of sigma_v/sigma_w * (1+delta_w),
  one join+agg per level walking the BFS DAG deepest-level-first.

Cost: O(diameter) supersteps forward + O(diameter) backward per pivot
chunk, every step a single shuffle — the same per-superstep shape the
scaling evidence measures.  Exact betweenness needs all n pivots
(``sources=None``; small graphs only); a pivot subset gives the
Brandes-Pich sampled estimator, and ``sum_over_sources`` semantics match
``nx.betweenness_centrality_subset(G, S, V)`` so the estimate is
unbiased up to the n/k rescale the caller picks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.joins import edge_join
from ..plans.superstep import lineage_cut


def _adj(G) -> DataFrame:
    if G.is_directed_flag:
        return G.edges.select("src", "dst").filter(F.col("src") != F.col("dst"))
    return G.get_property("sym_offdiag")


def _forward(G, adj: DataFrame, sources: list[int]) -> tuple[DataFrame, int]:
    """BFS with path counts: (source, id, lvl, sigma) for reached pairs."""
    spark = G.spark
    visited = spark.createDataFrame(
        [(int(s), int(s), 0, 1.0) for s in sources],
        "source long, id long, lvl long, sigma double",
    ).persist()
    frontier = visited
    lvl = 0
    while True:
        lvl += 1
        nxt = (
            edge_join(frontier, adj, payload=["source", "sigma"])
            .groupBy("source", "id")
            .agg(F.sum("sigma").alias("sigma"))
            .join(visited.select("source", "id"), ["source", "id"], "left_anti")
            .select("source", "id", F.lit(lvl).alias("lvl"), "sigma")
            .persist()
        )
        if nxt.count() == 0:
            nxt.unpersist()
            return visited, lvl - 1
        visited = visited.unionByName(nxt).transform(lineage_cut).persist()
        frontier = nxt


def _backward(adj: DataFrame, visited: DataFrame, max_lvl: int) -> DataFrame:
    """Dependency accumulation over the BFS DAG: returns (source, id, delta)
    for every non-root visited pair (roots excluded by the lvl > 0 filter
    at the end; their delta is never read)."""
    # successors at lvl+1 are reached THROUGH edges (v, w); walking edges
    # forward from v finds them because the DAG edge set is exactly
    # {(v, w) in E : lvl_w = lvl_v + 1}
    deltas = None  # rows (source, id, lvl, delta) accumulated per level
    below = None  # (source, id, sigma, delta) at the level being consumed
    for lvl in range(max_lvl, 0, -1):
        at = visited.filter(F.col("lvl") == lvl).select("source", "id", "sigma")
        if below is None:
            dl = at.select("source", "id", F.lit(0.0).alias("delta"))
        else:
            succ = below.select(
                F.col("source").alias("_src2"),
                F.col("id").alias("_w"),
                F.col("sigma").alias("_sw"),
                F.col("delta").alias("_dw"),
            )
            contrib = (
                edge_join(at, adj, payload=["source", "sigma"], keep_src="_v")
                .join(
                    succ,
                    (F.col("source") == F.col("_src2")) & (F.col("id") == F.col("_w")),
                    "inner",
                )
                .groupBy("source", "_v")
                .agg(
                    F.sum(F.col("sigma") / F.col("_sw") * (1.0 + F.col("_dw"))).alias(
                        "delta"
                    )
                )
                .withColumnRenamed("_v", "id")
            )
            dl = (
                at.join(contrib, ["source", "id"], "left")
                .select("source", "id", F.coalesce("delta", F.lit(0.0)).alias("delta"))
            )
        dl = dl.persist()
        below = (
            visited.filter(F.col("lvl") == lvl)
            .select("source", "id", "sigma")
            .join(dl, ["source", "id"])
            .select("source", "id", "sigma", "delta")
            .transform(lineage_cut)
            .persist()
        )
        dl = dl.select("source", "id", F.lit(lvl).alias("lvl"), "delta")
        deltas = dl if deltas is None else deltas.unionByName(dl).transform(lineage_cut)
    if deltas is None:
        return visited.limit(0).select(
            "source", "id", F.lit(0.0).alias("delta")
        )
    return deltas.select("source", "id", "delta")


def betweenness_centrality(
    G,
    sources: list[int] | None = None,
    normalized: bool = True,
    chunk_size: int | None = None,
    dense: bool = True,
    max_sources: int | None = -1,
) -> DataFrame:
    """(id, betweenness: double).

    ``sources=None``: exact Brandes (all pivots) — matches
    ``nx.betweenness_centrality(G, normalized=)``.  With a pivot list,
    the unnormalized sum over those sources — matches
    ``nx.betweenness_centrality_subset(G, sources, V, normalized=False)``
    (undirected results halved, per Brandes/nx); pass
    ``normalized=False`` and rescale by n/k for the sampled estimator.
    Pivots are processed in bounded chunks like the multi-source BFS."""
    from .shortest_paths import EXACT_SOURCES_MAX, _source_chunks

    exact = sources is None
    if max_sources == -1:  # engine default: guard only the all-pivots path
        max_sources = EXACT_SOURCES_MAX if exact else None
    chunks = _source_chunks(
        G, sources, chunk_size, max_sources=max_sources,
        caller="betweenness_centrality",
        alt="a sampled pivot list (sources=[...], the standard Brandes "
        "pivot estimator; rescale by n/k)",
    )
    if not chunks:  # explicit empty pivot list: zero contribution everywhere
        zero = G.nodes.select("id", F.lit(0.0).alias("betweenness"))
        return zero if dense else zero.limit(0)
    adj = _adj(G).persist()
    acc = None
    for chunk in chunks:
        visited, max_lvl = _forward(G, adj, chunk)
        deltas = _backward(adj, visited, max_lvl)
        part = (
            deltas.filter(F.col("source") != F.col("id"))
            .groupBy("id")
            .agg(F.sum("delta").alias("betweenness"))
            .transform(lineage_cut)
        )
        acc = part if acc is None else (
            acc.unionByName(part)
            .groupBy("id")
            .agg(F.sum("betweenness").alias("betweenness"))
            .transform(lineage_cut)
        )
        visited.unpersist()
    adj.unpersist()
    n = G.n
    scale = 1.0
    if not G.is_directed_flag:
        scale = 0.5  # each unordered (s,t) pair counted from both roles
    if normalized:
        denom = (n - 1) * (n - 2) if G.is_directed_flag else (n - 1) * (n - 2) / 2.0
        scale = (scale / denom) if denom > 0 else 0.0
        if not exact:
            # pivot estimate: nx multiplies by n/k (sampled rescale)
            scale *= n / max(len([s for c in chunks for s in c]), 1)
    out = acc.select("id", (F.col("betweenness") * F.lit(scale)).alias("betweenness"))
    if not dense:
        return out
    return G.nodes.join(out, "id", "left").select(
        "id", F.coalesce("betweenness", F.lit(0.0)).alias("betweenness")
    )


def edge_betweenness_centrality(
    G,
    sources: list[int] | None = None,
    normalized: bool = True,
    chunk_size: int | None = None,
    dense: bool = True,
    max_sources: int | None = -1,
) -> DataFrame:
    """(src, dst, betweenness) — Brandes edge betweenness (the
    Girvan-Newman edge score): for a BFS-DAG edge (v, w) the per-source
    credit is sigma_v/sigma_w * (1 + delta_w), i.e. the fraction of
    shortest paths through w that arrive via v — read straight off the
    SAME forward sigma table and backward delta table the node kernel
    builds, plus one three-way join per pivot chunk.  Undirected edges
    are reported once, canonical (src < dst).

    ``sources=None`` = exact (all pivots), matching
    ``nx.edge_betweenness_centrality(G, normalized=)``; a pivot list
    gives the subset sum (node-kernel convention: unnormalized = the
    raw subset credit, halved for undirected; normalized additionally
    applies nx's 1/(n(n-1)) and the sampled n/k rescale)."""
    from .shortest_paths import EXACT_SOURCES_MAX, _source_chunks

    exact = sources is None
    chunks = _source_chunks(
        G, sources, chunk_size,
        max_sources=max_sources if max_sources != -1
        else (EXACT_SOURCES_MAX if exact else None),
        caller="edge_betweenness_centrality",
        alt="a sampled pivot list (sources=[...]; rescale by n/k)",
    )
    edges_all = (
        G.edges.select("src", "dst").filter(F.col("src") != F.col("dst"))
        if G.is_directed_flag
        else G.get_property("sym_offdiag").filter(F.col("src") < F.col("dst"))
    ).distinct()
    if not chunks:
        zero = edges_all.select("src", "dst", F.lit(0.0).alias("betweenness"))
        return zero if dense else zero.limit(0)
    adj = _adj(G).persist()
    acc = None
    for chunk in chunks:
        visited, max_lvl = _forward(G, adj, chunk)
        deltas = _backward(adj, visited, max_lvl)
        vu = visited.select(
            "source",
            F.col("id").alias("src"),
            F.col("lvl").alias("_lu"),
            F.col("sigma").alias("_su"),
        )
        vw = visited.select(
            "source",
            F.col("id").alias("dst"),
            F.col("lvl").alias("_lw"),
            F.col("sigma").alias("_sw"),
        )
        dw = deltas.select(
            "source", F.col("id").alias("dst"), F.col("delta").alias("_dw")
        )
        dag = (
            adj.join(vu, "src")
            .join(vw, ["source", "dst"])
            .filter(F.col("_lw") == F.col("_lu") + 1)
            .join(dw, ["source", "dst"], "left")
        )
        credit = F.col("_su") / F.col("_sw") * (1.0 + F.coalesce("_dw", F.lit(0.0)))
        key = (
            [F.col("src"), F.col("dst")]
            if G.is_directed_flag
            else [
                F.least("src", "dst").alias("src"),
                F.greatest("src", "dst").alias("dst"),
            ]
        )
        part = (
            dag.groupBy(*key)
            .agg(F.sum(credit).alias("betweenness"))
            .transform(lineage_cut)
        )
        acc = part if acc is None else (
            acc.unionByName(part)
            .groupBy("src", "dst")
            .agg(F.sum("betweenness").alias("betweenness"))
            .transform(lineage_cut)
        )
        visited.unpersist()
    adj.unpersist()
    n = G.n
    k = len([s for c in chunks for s in c])
    scale = None
    if normalized:
        scale = 1.0 / (n * (n - 1)) if n > 1 else None
        if scale is not None and not exact:
            # sampled-estimator rescale, nx _rescale_e k branch
            scale *= n / max(k, 1)
    elif not G.is_directed_flag:
        # raw subset sum, halved like the node kernel (nx subset
        # semantics: no n/k rescale unless normalized)
        scale = 0.5
    out = acc
    if scale is not None:
        out = out.select(
            "src", "dst", (F.col("betweenness") * F.lit(scale)).alias("betweenness")
        )
    if not dense:
        return out
    return edges_all.join(out, ["src", "dst"], "left").select(
        "src", "dst", F.coalesce("betweenness", F.lit(0.0)).alias("betweenness")
    )
