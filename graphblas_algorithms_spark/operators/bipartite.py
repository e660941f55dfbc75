"""Bipartite motif analytics: butterfly (2x2 biclique / C4) counting.

Engine extension — the reference's triangle family (``cluster.py``)
has no bipartite analog, but a link graph derived from (repo, path,
commit) co-occurrence is naturally bipartite (file x import, customer x
supplier, doc x shingle), where triangles cannot exist and the atomic
cohesion motif is the BUTTERFLY: a 2x2 biclique u1-w1-u2-w2.  Butterfly
counts drive bipartite clustering coefficients, k-bitruss peeling, and
spam/collusion detection (dense co-purchase blocks).

Algorithm (Wang et al. VLDB'14; Sanei-Mehri et al. KDD'18 side
choice): butterflies = sum over same-side pairs C(codeg(u,v), 2).
Codegrees come from ONE wedge self-join through the pivot side; the
pivot is chosen to minimize the materialized wedge volume
sum_c C(deg(c), 2) — computed from the two degree tables first (two
cheap aggs), the exact decision a 1000-executor run makes before
joining 10^12 rows.  A ``max_pivot_degree`` cap (default none) bounds
hub fan-out the same way the triangle kernels' orientation does.

Everything is joins + aggregations on the edge table: no enumeration
of the 4-cycles themselves, per-pair codegree rows only (bounded by
wedge volume), map-side partial aggs throughout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _edges_of(G_or_df) -> DataFrame:
    if isinstance(G_or_df, DataFrame):
        return G_or_df.select("src", "dst")
    return G_or_df.edges.select("src", "dst")


def _wedge_volumes(edges: DataFrame) -> tuple[int, int]:
    """(via_dst, via_src): rows a codegree self-join materializes when
    pivoting on dst (pairing src nodes) vs on src (pairing dst)."""
    v_dst = (
        edges.groupBy("dst")
        .agg(F.count(F.lit(1)).alias("d"))
        .agg(F.sum(F.col("d") * (F.col("d") - 1) / 2).alias("w"))
        .collect()[0]["w"]
    )
    v_src = (
        edges.groupBy("src")
        .agg(F.count(F.lit(1)).alias("d"))
        .agg(F.sum(F.col("d") * (F.col("d") - 1) / 2).alias("w"))
        .collect()[0]["w"]
    )
    return int(v_dst or 0), int(v_src or 0)


def _codegrees(
    edges: DataFrame, pivot: str, max_pivot_degree: int | None = None
) -> DataFrame:
    """(a, b, codeg) for same-side pairs a<b sharing >= 1 pivot-side
    neighbor.  ``pivot``: 'dst' pairs src nodes, 'src' pairs dst.

    ``max_pivot_degree`` drops pivot nodes above the cap from the wedge
    join (the bipartite analog of the n-gram ``max_df`` hot-shingle cap
    and the link-prediction hub cap): counts become exact on the
    hub-filtered subgraph — the documented trade that makes the join
    feasible on power-law sides where one hub's C(d,2) alone exceeds
    the cluster (cap c bounds wedge volume by #pivots * C(c,2))."""
    other = "src" if pivot == "dst" else "dst"
    if max_pivot_degree is not None:
        keep = (
            edges.groupBy(pivot)
            .agg(F.count(F.lit(1)).alias("_d"))
            .filter(F.col("_d") <= max_pivot_degree)
            .select(pivot)
        )
        edges = edges.join(keep, pivot, "left_semi")
    e1 = edges.select(F.col(pivot).alias("p"), F.col(other).alias("a"))
    e2 = edges.select(F.col(pivot).alias("p"), F.col(other).alias("b"))
    return (
        e1.join(e2, "p")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("codeg"))
    )


def butterfly_count(
    G_or_edges, pivot: str | None = None, max_pivot_degree: int | None = None
) -> int:
    """Total number of butterflies (unordered 2x2 bicliques).  The
    graph must be bipartite with parts = (src ids, dst ids) — the shape
    ``build_link_graph`` / the customer->supplier extraction produce.
    ``pivot`` forces the wedge side; default picks the cheaper one from
    the degree tables.  ``max_pivot_degree`` excludes hub pivots (see
    ``_codegrees`` — exact on the filtered subgraph)."""
    edges = _edges_of(G_or_edges).distinct()
    if pivot is None:
        v_dst, v_src = _wedge_volumes(edges)
        pivot = "dst" if v_dst <= v_src else "src"
    cod = _codegrees(edges, pivot, max_pivot_degree)
    row = cod.agg(
        F.sum(F.col("codeg") * (F.col("codeg") - 1) / 2).alias("bf")
    ).collect()[0]
    return int(row["bf"] or 0)


def butterfly_counts(
    G_or_edges,
    side: str = "src",
    max_pivot_degree: int | None = None,
) -> DataFrame:
    """(id, butterflies) — per-node butterfly participation for every
    node of ``side`` ('src' or 'dst').  Each node of a pair (a, b) with
    codegree t lies in C(t, 2) butterflies through that pair, so
    per-node counts fall out of the SAME codegree table as the total:
    bf(a) = sum over partners b of C(codeg(a,b), 2).

    For the opposite side, flip ``side`` — the kernel re-pivots so the
    scored nodes are the paired ones.  Nodes in no butterfly get 0."""
    edges = _edges_of(G_or_edges).distinct()
    want_pairs_on = side  # the paired side is the scored side
    pivot = "dst" if want_pairs_on == "src" else "src"
    cod = _codegrees(edges, pivot, max_pivot_degree)
    per_pair = cod.select(
        "a", "b", (F.col("codeg") * (F.col("codeg") - 1) / 2).alias("bf")
    )
    scored = (
        per_pair.select(F.col("a").alias("id"), "bf")
        .unionByName(per_pair.select(F.col("b").alias("id"), "bf"))
        .groupBy("id")
        .agg(F.sum("bf").cast("long").alias("butterflies"))
    )
    all_side = edges.select(F.col(side).alias("id")).distinct()
    return all_side.join(scored, "id", "left").select(
        "id", F.coalesce("butterflies", F.lit(0)).alias("butterflies")
    )


def butterfly_counts_pivot_side(G_or_edges, side: str = "dst") -> DataFrame:
    """(id, butterflies) for the PIVOT side without re-pivoting: a pivot
    node w common to pair (a, b) with codegree t completes t-1
    butterflies with that pair, so bf(w) = sum over pairs through w of
    (codeg - 1).  Costs one extra join of the wedge table against the
    codegree table — use when one side is hub-heavy and re-pivoting
    through it would blow the wedge volume."""
    edges = _edges_of(G_or_edges).distinct()
    pivot = side
    other = "src" if pivot == "dst" else "dst"
    e1 = edges.select(F.col(pivot).alias("p"), F.col(other).alias("a"))
    e2 = edges.select(F.col(pivot).alias("p"), F.col(other).alias("b"))
    wedges = e1.join(e2, "p").filter(F.col("a") < F.col("b"))
    cod = wedges.groupBy("a", "b").agg(F.count(F.lit(1)).alias("codeg"))
    scored = (
        wedges.join(cod, ["a", "b"])
        .groupBy(F.col("p").alias("id"))
        .agg(F.sum(F.col("codeg") - 1).cast("long").alias("butterflies"))
    )
    all_side = edges.select(F.col(side).alias("id")).distinct()
    return all_side.join(scored, "id", "left").select(
        "id", F.coalesce("butterflies", F.lit(0)).alias("butterflies")
    )
