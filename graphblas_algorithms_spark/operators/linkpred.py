"""Link prediction: common-neighbor-family similarity scores over a graph.

Not present in the reference (graphblas-algorithms has no
``link_prediction`` module) — added as the graph-side sibling of the
pipeline's similarity-join surface: the classic NetworkX scores
(``jaccard_coefficient``, ``adamic_adar_index``,
``resource_allocation_index``, ``preferential_attachment``,
``common_neighbor_centrality``'s CN core) expressed as the same
degree-bounded wedge join the triangle kernels use (reference analog:
``plus_pair(A @ A.T)`` restricted to the *non*-edge pattern — the
complement mask of ``algorithms/cluster.py:44-64``'s triangle mask).

Scale shape: candidate generation enumerates distance-2 pairs through
each shared neighbor ``v`` — O(d_v^2) pairs per center.  A mega-hub
center contributes quadratically while carrying ~zero signal (a
neighborhood shared through a 10^6-degree hub says nothing about the
pair), so ``max_center_degree`` caps the centers that generate
candidates — the graph analog of the n-gram dedup path's ``max_df``
hot-shingle cap (``pipeline/dedup.py``).  Scoring an explicit candidate
table (the NetworkX ``ebunch``) restricts wedge generation to the
queried endpoints' neighborhoods and is always exact (no cap applies).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _wedge_scores(
    G,
    max_center_degree: int | None = None,
    endpoints: DataFrame | None = None,
) -> DataFrame:
    """Per-pair common-neighborhood aggregates through shared neighbors.

    Returns (u, w, cn, aa, ra) with u < w for every pair at distance <= 2
    (including pairs that are also edges — callers filter):
    cn = |Γ(u) ∩ Γ(w)|, aa = Σ_v 1/ln(deg v), ra = Σ_v 1/deg v.
    ``endpoints`` (an (id) DataFrame) restricts BOTH wedge endpoints to a
    node set — exact for any pair within the set, while skipping the
    full-graph wedge enumeration.
    """
    adj = G.get_property("sym_offdiag")
    deg = G.get_property("degrees_minus")
    centers = adj.select(F.col("src").alias("v"), F.col("dst").alias("n")).join(
        deg.select(F.col("id").alias("v"), F.col("degree").alias("dv")), "v"
    )
    if max_center_degree is not None:
        centers = centers.filter(F.col("dv") <= max_center_degree)
    if endpoints is not None:
        centers = centers.join(
            endpoints.select(F.col("id").alias("n")), "n", "left_semi"
        )
    left = centers.select("v", F.col("n").alias("u"), "dv")
    right = centers.select("v", F.col("n").alias("w"))
    wedges = left.join(right, "v").filter(F.col("u") < F.col("w"))
    return wedges.groupBy("u", "w").agg(
        F.count("*").alias("cn"),
        # a shared neighbor is adjacent to both u and w, so deg v >= 2 and
        # ln(deg v) > 0 always
        F.sum(1.0 / F.log(F.col("dv"))).alias("aa"),
        F.sum(1.0 / F.col("dv")).alias("ra"),
    )


def link_prediction_scores(
    G,
    min_common: int = 1,
    max_center_degree: int | None = None,
    include_edges: bool = False,
) -> DataFrame:
    """All candidate pairs at distance 2 with every CN-family score.

    (u, w, cn: long, jaccard, adamic_adar, resource_allocation,
    pref_attachment) with u < w; existing edges are excluded unless
    ``include_edges`` (prediction scores non-edges).  ``min_common``
    prunes the long tail of 1-common-neighbor pairs before the degree
    joins (at web scale the cn>=2 cut typically drops ~90% of
    candidates).
    """
    scores = _wedge_scores(G, max_center_degree=max_center_degree)
    if min_common > 1:
        scores = scores.filter(F.col("cn") >= min_common)
    if not include_edges:
        canon = G.get_property("offdiag").select(
            F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("w")
        )
        scores = scores.join(canon, ["u", "w"], "left_anti")
    deg = G.get_property("degrees_minus")
    return (
        scores.join(deg.select(F.col("id").alias("u"), F.col("degree").alias("du")), "u")
        .join(deg.select(F.col("id").alias("w"), F.col("degree").alias("dw")), "w")
        .select(
            "u",
            "w",
            "cn",
            (F.col("cn") / (F.col("du") + F.col("dw") - F.col("cn"))).alias("jaccard"),
            F.col("aa").alias("adamic_adar"),
            F.col("ra").alias("resource_allocation"),
            (F.col("du") * F.col("dw")).alias("pref_attachment"),
        )
    )


def _score_pairs(G, pairs: DataFrame) -> DataFrame:
    """Scores for an explicit (u, w) candidate table (NetworkX ebunch).

    Pairs are canonicalized to u < w; pairs with no common neighbor get
    cn=0 / 0.0 scores (NetworkX emits 0 for them too).  Always exact:
    wedge generation is restricted to the queried endpoints (no hub cap
    — a cap would silently undercount cn/aa/ra for explicit pairs).
    """
    canon = pairs.select(
        F.least("u", "w").alias("u"), F.greatest("u", "w").alias("w")
    ).distinct()
    ends = canon.select(F.col("u").alias("id")).unionByName(
        canon.select(F.col("w").alias("id"))
    ).distinct()
    scores = _wedge_scores(G, endpoints=ends)
    deg = G.get_property("degrees_minus")
    return (
        canon.join(scores, ["u", "w"], "left")
        .join(deg.select(F.col("id").alias("u"), F.col("degree").alias("du")), "u", "left")
        .join(deg.select(F.col("id").alias("w"), F.col("degree").alias("dw")), "w", "left")
        .select(
            "u",
            "w",
            F.coalesce("cn", F.lit(0)).alias("cn"),
            F.coalesce(
                F.col("cn") / (F.col("du") + F.col("dw") - F.col("cn")), F.lit(0.0)
            ).alias("jaccard"),
            F.coalesce("aa", F.lit(0.0)).alias("adamic_adar"),
            F.coalesce("ra", F.lit(0.0)).alias("resource_allocation"),
            (F.coalesce("du", F.lit(0)) * F.coalesce("dw", F.lit(0))).alias(
                "pref_attachment"
            ),
        )
    )


def jaccard_coefficient(G, pairs: DataFrame | None = None, **kw) -> DataFrame:
    """(u, w, jaccard) — |Γ(u)∩Γ(w)| / |Γ(u)∪Γ(w)| (nx semantics on a
    simple graph).  ``**kw`` applies to candidate GENERATION only
    (explicit pairs are always scored exactly)."""
    base = _score_pairs(G, pairs) if pairs is not None else link_prediction_scores(G, **kw)
    return base.select("u", "w", "jaccard")


def adamic_adar_index(G, pairs: DataFrame | None = None, **kw) -> DataFrame:
    base = _score_pairs(G, pairs) if pairs is not None else link_prediction_scores(G, **kw)
    return base.select("u", "w", "adamic_adar")


def resource_allocation_index(G, pairs: DataFrame | None = None, **kw) -> DataFrame:
    base = _score_pairs(G, pairs) if pairs is not None else link_prediction_scores(G, **kw)
    return base.select("u", "w", "resource_allocation")


def preferential_attachment(G, pairs: DataFrame) -> DataFrame:
    """(u, w, pref_attachment) — deg(u)*deg(w) for the given pairs only
    (all-pairs PA is a dense n^2 anti-pattern; NetworkX also requires the
    ebunch in practice)."""
    return _score_pairs(G, pairs).select("u", "w", "pref_attachment")
