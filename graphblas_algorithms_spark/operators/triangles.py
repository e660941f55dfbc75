"""Triangle counting / clustering via degree-ordered oriented wedge joins.

Reference: ``algorithms/cluster.py:44-98`` — masked matmuls
``plus_pair(L @ L.T).new(mask=L.S)`` etc.  The masked matmul never
materializes A² (SURVEY O1); the Spark translation pushes the mask INTO
the join order: wedges are generated from the oriented edge set and
immediately closed by a semi-join against the same oriented edge set, so
only actual triangles ever materialize.

Orientation is by (degree, id) — each undirected edge points from the
lower-degree endpoint to the higher — which bounds every vertex's
oriented out-fanout by O(sqrt(m)) and kills power-law hub skew in the
wedge self-join (SURVEY O5: "we go further than the reference's U/L
halving: orient by degree to bound wedge fan-out").

Self-edges are ignored throughout (reference computes on ``offdiag``/
U-/L- views, ``cluster.py:47``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _oriented_edges(G, weighted: bool = False) -> DataFrame:
    """(src, dst[, weight]) with (deg[src], src) < (deg[dst], dst); one row
    per undirected off-diagonal edge.  ``weighted`` carries the stored edge
    weight (1.0 when the graph has no weight column — iso semantics)."""
    deg = G.get_property("degrees_minus")  # (id, degree), excludes self-edges
    off = G.get_property("offdiag")
    has_w = weighted and "weight" in off.columns
    wcol = F.col("weight") if has_w else F.lit(1.0)
    e = off.select("src", "dst", *([wcol.alias("weight")] if weighted else []))
    e = (
        e.join(
            deg.select(F.col("id").alias("src"), F.col("degree").alias("_ds")), "src"
        )
        .join(deg.select(F.col("id").alias("dst"), F.col("degree").alias("_dd")), "dst")
    )
    fwd_ok = (F.col("_ds") < F.col("_dd")) | (
        (F.col("_ds") == F.col("_dd")) & (F.col("src") < F.col("dst"))
    )
    return e.select(
        F.when(fwd_ok, F.col("src")).otherwise(F.col("dst")).alias("src"),
        F.when(fwd_ok, F.col("dst")).otherwise(F.col("src")).alias("dst"),
        F.when(fwd_ok, F.col("_ds")).otherwise(F.col("_dd")).alias("deg_src"),
        F.when(fwd_ok, F.col("_dd")).otherwise(F.col("_ds")).alias("deg_dst"),
        *([F.col("weight")] if weighted else []),
    )


def _max_element(G) -> float:
    """``max_element-``: max off-diagonal edge weight (graph.py property)."""
    off = G.get_property("offdiag")
    if "weight" not in off.columns:
        return 1.0
    row = off.agg(F.max("weight").alias("m")).collect()[0]
    return float(row["m"]) if row["m"] is not None else 1.0


def triangle_list(G, weighted: bool = False) -> DataFrame:
    """(a, b, c[, tw]) — one row per triangle, each exactly once.

    ``weighted``: ``tw = cbrt(w_ab * w_ac * w_bc) / max_element`` — the
    reference's ``unary.cbrt(L / maxval)`` plus_times form
    (``cluster.py:44-64``), i.e. the normalized geometric mean of the
    three edge weights."""
    eo = _oriented_edges(G, weighted=weighted).persist()
    e1 = eo.select(
        F.col("src").alias("u"),
        F.col("dst").alias("v"),
        F.col("deg_dst").alias("_dv"),
        *([F.col("weight").alias("_w_uv")] if weighted else []),
    )
    e2 = eo.select(
        F.col("src").alias("u2"),
        F.col("dst").alias("w"),
        F.col("deg_dst").alias("_dw"),
        *([F.col("weight").alias("_w_uw")] if weighted else []),
    )
    # wedges centered at the (low-degree) source u, ordered v < w in the
    # same (degree, id) orientation order so the closing edge is oriented v->w
    wedges = e1.join(e2, F.col("u") == F.col("u2")).filter(
        (F.col("_dv") < F.col("_dw"))
        | ((F.col("_dv") == F.col("_dw")) & (F.col("v") < F.col("w")))
    )
    if not weighted:
        closing = eo.select(F.col("src").alias("v"), F.col("dst").alias("w"))
        return wedges.join(closing, ["v", "w"], "left_semi").select(
            F.col("u").alias("a"), F.col("v").alias("b"), F.col("w").alias("c")
        )
    maxval = _max_element(G)
    closing = eo.select(
        F.col("src").alias("v"), F.col("dst").alias("w"), F.col("weight").alias("_w_vw")
    )
    return wedges.join(closing, ["v", "w"]).select(
        F.col("u").alias("a"),
        F.col("v").alias("b"),
        F.col("w").alias("c"),
        (
            F.cbrt(F.col("_w_uv") * F.col("_w_uw") * F.col("_w_vw"))
            / F.lit(float(maxval))
        ).alias("tw"),
    )


def four_clique_list(G) -> DataFrame:
    """(a, b, c, d) — one row per 4-clique, each exactly once.

    kClist/Chiba-Nishizeki extension of the oriented triangle join: a
    triangle (a→b→c) in the degree-ordered DAG extends to a 4-clique per
    common out-neighbor d of all three corners, so every clique is
    emitted at its unique DAG-ordered tuple.  Cost is bounded the same
    way the triangle join is — out-degrees in the orientation are
    O(arboricity), so hub skew never enumerates a hub's full
    neighborhood squared; the three joins all key on the corner node.
    Beyond the reference (its matrix algebra stops at triangles); the
    driver oracle replays an id-ordered equivalent in SQL (counts are
    orientation-independent)."""
    tri = triangle_list(G)
    eo = _oriented_edges(G).select("src", "dst")
    return (
        tri.join(eo.select(F.col("src").alias("a"), F.col("dst").alias("d")), "a")
        .join(eo.select(F.col("src").alias("b"), F.col("dst").alias("d")), ["b", "d"])
        .join(eo.select(F.col("src").alias("c"), F.col("dst").alias("d")), ["c", "d"])
        .select("a", "b", "c", "d")
    )


def four_cliques(G, dense: bool = True) -> DataFrame:
    """Per-vertex 4-clique participation count (id: long, cliques4: long);
    ``dense`` fills zeros over all nodes (the ``triangles`` convention)."""
    q = four_clique_list(G)
    corners = (
        q.select(F.col("a").alias("id"))
        .unionByName(q.select(F.col("b").alias("id")))
        .unionByName(q.select(F.col("c").alias("id")))
        .unionByName(q.select(F.col("d").alias("id")))
    )
    counts = corners.groupBy("id").agg(F.count("*").alias("cliques4"))
    if not dense:
        return counts
    return G.nodes.join(counts, "id", "left").select(
        "id", F.coalesce("cliques4", F.lit(0)).alias("cliques4")
    )


def total_four_cliques(G) -> int:
    """Total number of 4-cliques in G."""
    return int(four_clique_list(G).count())


def triangles(G, dense: bool = True, weighted: bool = False) -> DataFrame:
    """Per-vertex triangle count (id: long, triangles: long) — or, with
    ``weighted=True``, (id, triangles: double) where each triangle
    contributes the normalized geometric mean of its edge weights
    (reference ``cluster.py:44-64`` ``weighted=`` kwarg).

    Reference returns a dense count vector via the nxapi wrapper;
    ``dense=True`` fills zeros over all nodes.
    """
    tris = triangle_list(G, weighted=weighted)
    val = [F.col("tw")] if weighted else []
    corners = (
        tris.select(F.col("a").alias("id"), *val)
        .unionByName(tris.select(F.col("b").alias("id"), *val))
        .unionByName(tris.select(F.col("c").alias("id"), *val))
    )
    if weighted:
        counts = corners.groupBy("id").agg(F.sum("tw").alias("triangles"))
        zero = F.lit(0.0)
    else:
        counts = corners.groupBy("id").agg(F.count("*").alias("triangles"))
        zero = F.lit(0)
    if not dense:
        return counts
    return G.nodes.join(counts, "id", "left").select(
        "id", F.coalesce("triangles", zero).alias("triangles")
    )


def single_triangle(G, node: int, weighted: bool = False) -> float:
    """Triangle count (or weighted sum) at ONE node — the filter-first fast
    path (reference ``cluster.py:24-41``): restrict to the node's neighbor
    set first, then count edges among neighbors; never touches the full
    wedge join."""
    has_w = weighted and "weight" in G.edges.columns
    sym = G.get_property("sym_edges")
    wcol = F.col("weight") if has_w else F.lit(1.0)
    nbrs = sym.filter((F.col("src") == node) & (F.col("dst") != node)).select(
        F.col("dst").alias("id"), *([wcol.alias("_wn")] if weighted else [])
    )
    off = G.get_property("offdiag")
    among = (
        off.select("src", "dst", *([wcol.alias("_we")] if weighted else []))
        .join(
            nbrs.select(
                F.col("id").alias("src"), *([F.col("_wn").alias("_ws")] if weighted else [])
            ),
            "src",
        )
        .join(
            nbrs.select(
                F.col("id").alias("dst"), *([F.col("_wn").alias("_wd")] if weighted else [])
            ),
            "dst",
        )
    )
    if not weighted:
        return float(among.count())
    maxval = _max_element(G)
    row = among.agg(
        F.sum(
            F.cbrt(F.col("_we") * F.col("_ws") * F.col("_wd")) / F.lit(float(maxval))
        ).alias("t")
    ).collect()[0]
    return float(row["t"]) if row["t"] is not None else 0.0


def single_clustering(G, node: int, weighted: bool = False) -> float:
    """Clustering coefficient at ONE node (reference ``cluster.py:129-147``):
    2*tri / (d*(d-1)) with the filter-first triangle count."""
    tri = single_triangle(G, node, weighted=weighted)
    if tri == 0:
        return 0.0
    deg = (
        G.get_property("degrees_minus").filter(F.col("id") == node).collect()
    )
    d = int(deg[0]["degree"]) if deg else 0
    if d < 2:
        return 0.0
    return 2.0 * tri / (d * (d - 1))


def total_triangles(G) -> int:
    """Global triangle count — "SandiaDot" ``plus_pair(L @ U.T).new(mask=L.S)``
    (``cluster.py:67-71``); here: count of the oriented triangle list."""
    return triangle_list(G).count()


def transitivity(G) -> float:
    """3*triangles / #wedges = 6*total / sum d(d-1) (``cluster.py:74-80``)."""
    deg = G.get_property("degrees_minus")
    denom = deg.agg(
        F.sum(F.col("degree") * (F.col("degree") - 1)).alias("s")
    ).collect()[0]["s"]
    if not denom:
        return 0.0
    return 6.0 * total_triangles(G) / float(denom)


def clustering(G, dense: bool = True, weighted: bool = False) -> DataFrame:
    """(id, clustering: double) = 2*tri / (d*(d-1)) (``cluster.py:94-98``);
    nodes with degree < 2 get 0.0 (networkx convention).  ``weighted=True``
    uses the geometric-mean weighted triangle sum (``cluster.py:94-98``
    ``weighted=`` kwarg) over the same unweighted-degree denominator."""
    tri = triangles(G, dense=False, weighted=weighted)
    deg = G.get_property("degrees_minus")
    out = deg.join(tri, "id", "left").select(
        "id",
        F.when(
            F.col("degree") >= 2,
            2.0
            * F.coalesce("triangles", F.lit(0))
            / (F.col("degree") * (F.col("degree") - 1)),
        )
        .otherwise(0.0)
        .alias("clustering"),
    )
    if not dense:
        return out
    return G.nodes.join(out, "id", "left").select(
        "id", F.coalesce("clustering", F.lit(0.0)).alias("clustering")
    )


def average_clustering(G, count_zeros: bool = True, weighted: bool = False) -> float:
    """``cluster.py:176-193``."""
    c = clustering(G, dense=True, weighted=weighted)
    if not count_zeros:
        c = c.filter(F.col("clustering") != 0.0)
    row = c.agg(F.avg("clustering").alias("m")).collect()[0]
    return float(row["m"]) if row["m"] is not None else 0.0


def transitivity_directed(G) -> float:
    """``cluster.py:83-91``: numerator = plus_pair(A @ A.T).new(mask=A.S)
    summed = |{(i,j,k): i->j, i->k, j->k}| (common OUT-neighbors of the
    endpoints of each edge); denominator = sum over out-degrees d(d-1)
    (``row_degrees-``)."""
    e = G.edges.select("src", "dst").filter(F.col("src") != F.col("dst")).persist()
    ij = e.select(F.col("src").alias("i"), F.col("dst").alias("j"))
    ik = e.select(F.col("src").alias("i"), F.col("dst").alias("k"))
    jk = e.select(F.col("src").alias("j"), F.col("dst").alias("k"))
    numer = ij.join(ik, "i").join(jk, ["j", "k"], "left_semi").count()
    deg = e.groupBy("src").agg(F.count("*").alias("d"))
    row = deg.agg(F.sum(F.col("d") * (F.col("d") - 1)).alias("s")).collect()[0]
    e.unpersist()
    denom = float(row["s"] or 0)
    return numer / denom if denom else 0.0
