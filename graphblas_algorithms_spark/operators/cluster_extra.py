"""Long-tail clustering operators: square clustering, generalized degree,
directed clustering.

Reference: ``algorithms/cluster.py`` —

* ``square_clustering`` (``cluster.py:227-282``): C4 coefficient per
  arXiv:2007.11111 eq. (8); the reference computes
  ``P2 = plus_pair(A @ A.T).new(mask=~D.S)`` then per-node sums, and the
  nxapi wrapper chunks node ranges to bound the dense intermediate
  ("256 MiB", ``nxapi/cluster.py:95-104``).
* ``generalized_degree`` (``cluster.py:285-310``): per node, histogram of
  "number of edges at this node participating in t triangles".
* ``clustering_directed`` (``cluster.py:101-126``): 4 masked matmuls over
  A/A.T; equivalently with B = A + A.T (values in {1,2}),
  ``T(i) = sum_{j<k} b_ij * b_ik * b_jk`` and
  ``C(i) = T(i) / (d_tot*(d_tot-1) - 2*d_recip)``.

Spark-first: everything is oriented/keyed joins over the edge DataFrame;
the A²-class intermediates (neighbor-pair wedges) are generated once and
closed immediately by the next join, mirroring the reference's masked
matmul discipline (SURVEY O1).  ``square_clustering`` accepts
``node_ids`` chunking, the Spark analog of the nxapi 256 MiB chunker.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.superstep import lineage_cut


def _sym_offdiag(G) -> DataFrame:
    """Symmetric off-diagonal adjacency (both directions), unweighted."""
    if G.is_directed_flag:
        e = G.get_property("sym_edges")
    else:
        e = G.get_property("sym_edges").select("src", "dst")
    return e.select("src", "dst").filter(F.col("src") != F.col("dst"))


def square_clustering(G, node_ids: list[int] | None = None) -> DataFrame:
    """(id, sq_clustering: double) — C4 clustering coefficient.

    networkx/arXiv:2007.11111 semantics (reference ``cluster.py:227-282``):
    for each pair of distinct neighbors (u, w) of v,
    ``q = |N(u) ∩ N(w)| - 1`` (common neighbors besides v) counts squares;
    the potential term is ``(k_u - (1+q+θ)) + (k_w - (1+q+θ)) + q`` with
    ``θ = 1`` if (u,w) is an edge.

    ``node_ids`` restricts output to a chunk of vertices — the Spark
    analog of the nxapi "256 MiB" node-range chunker
    (``nxapi/cluster.py:95-104``) for bounding the wedge intermediate.
    """
    adj = _sym_offdiag(G).persist()
    deg = adj.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("deg"))

    # all open wedges u - v - w with u < w (v = center), built and persisted
    # ONCE: the chunked per-node wedge set is a filter of it and the P2
    # common-neighbor counts group the SAME cached rows — the most expensive
    # intermediate is never computed twice
    e1 = adj.select(F.col("src").alias("v"), F.col("dst").alias("u"))
    e2 = adj.select(F.col("src").alias("v"), F.col("dst").alias("w"))
    allw = e1.join(e2, "v").filter(F.col("u") < F.col("w")).persist()
    wedges = allw
    if node_ids is not None:
        ids_df = G.spark.createDataFrame([(int(i),) for i in node_ids], "v long")
        wedges = wedges.join(F.broadcast(ids_df), "v", "left_semi")

    # P2[u,w] = number of common neighbors of (u,w), u<w — from the SAME
    # wedge set grouped by endpoints (never materializes dense A²)
    pair_cnt = allw.groupBy("u", "w").agg(F.count("*").alias("_cn"))

    # θ[u,w] = 1 iff u-w is an edge (canonical orientation u<w)
    theta = adj.filter(F.col("src") < F.col("dst")).select(
        F.col("src").alias("u"), F.col("dst").alias("w"), F.lit(1).alias("_theta")
    )

    per_wedge = (
        wedges.join(pair_cnt, ["u", "w"])
        .join(theta, ["u", "w"], "left")
        .join(deg.select(F.col("id").alias("u"), F.col("deg").alias("_ku")), "u")
        .join(deg.select(F.col("id").alias("w"), F.col("deg").alias("_kw")), "w")
        .select(
            "v",
            (F.col("_cn") - 1).alias("_q"),
            F.coalesce("_theta", F.lit(0)).alias("_t"),
            "_ku",
            "_kw",
        )
    )
    degm = F.col("_q") + 1 + F.col("_t")
    agg = per_wedge.groupBy("v").agg(
        F.sum("_q").alias("_numer"),
        F.sum((F.col("_ku") - degm) + (F.col("_kw") - degm) + F.col("_q")).alias(
            "_denom"
        ),
    )
    # agg is ≤ n rows — snapshot it eagerly so the big cached intermediates
    # (adj, allw) can be released before returning instead of leaking for
    # the session
    agg = agg.transform(lineage_cut)
    adj.unpersist()
    allw.unpersist()
    nodes = G.nodes
    if node_ids is not None:
        ids_df = G.spark.createDataFrame([(int(i),) for i in node_ids], "id long")
        nodes = nodes.join(F.broadcast(ids_df), "id", "left_semi")
    out = nodes.join(agg.withColumnRenamed("v", "id"), "id", "left").select(
        "id",
        F.when(
            F.coalesce("_denom", F.lit(0)) > 0,
            F.col("_numer") / F.col("_denom"),
        )
        .otherwise(0.0)
        .alias("sq_clustering"),
    )
    return out


def generalized_degree(G) -> DataFrame:
    """(id, ntri: long, n_edges: long) — for each node, how many of its
    incident edges participate in exactly ``ntri`` triangles
    (reference ``cluster.py:285-310`` returns this as a node×count Matrix).
    """
    from .triangles import triangle_list

    tris = triangle_list(G)
    # each triangle closes 3 canonical edges
    tedges = (
        tris.select(
            F.least("a", "b").alias("src"), F.greatest("a", "b").alias("dst")
        )
        .unionByName(
            tris.select(
                F.least("a", "c").alias("src"), F.greatest("a", "c").alias("dst")
            )
        )
        .unionByName(
            tris.select(
                F.least("b", "c").alias("src"), F.greatest("b", "c").alias("dst")
            )
        )
    )
    sup = tedges.groupBy("src", "dst").agg(F.count("*").alias("_t"))
    canon = (
        G.get_property("offdiag")
        .select(F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst"))
        .distinct()
    )
    edge_t = canon.join(sup, ["src", "dst"], "left").select(
        "src", "dst", F.coalesce("_t", F.lit(0)).alias("ntri")
    )
    incident = edge_t.select(F.col("src").alias("id"), "ntri").unionByName(
        edge_t.select(F.col("dst").alias("id"), "ntri")
    )
    return incident.groupBy("id", "ntri").agg(F.count("*").alias("n_edges"))


def _b_matrix(G, weighted: bool = False) -> DataFrame:
    """B = Ahat + Ahat.T over off-diagonal edges, where Ahat = A for the
    pattern case and ``cbrt(A / max_element)`` for the weighted case
    (reference ``cluster.py:101-110``, Fagiolo 2007)."""
    has_w = weighted and "weight" in G.edges.columns
    if has_w:
        from .triangles import _max_element

        maxval = _max_element(G)
        val = F.cbrt(F.col("weight") / F.lit(float(maxval)))
    else:
        val = F.lit(1.0)
    e = G.edges.filter(F.col("src") != F.col("dst")).select(
        "src", "dst", val.alias("_v")
    )
    return (
        e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "_v")
        )
        .groupBy("src", "dst")
        .agg(F.sum("_v").alias("b"))
    )


def _directed_tri_counts(G, weighted: bool = False) -> DataFrame:
    """(id, tri: double) — T(i) = sum_{j<k} b_ij*b_ik*b_jk with
    B = A + A.T (offdiag), the networkx directed-triangle count that the
    reference assembles from 4 masked matmuls (``cluster.py:111-123``);
    ``weighted`` switches B to the cbrt-normalized form."""
    b = _b_matrix(G, weighted=weighted).persist()
    e1 = b.select(F.col("src").alias("i"), F.col("dst").alias("j"), F.col("b").alias("_bj"))
    e2 = b.select(F.col("src").alias("i"), F.col("dst").alias("k"), F.col("b").alias("_bk"))
    close = b.select(F.col("src").alias("j"), F.col("dst").alias("k"), F.col("b").alias("_bjk"))
    wedges = e1.join(e2, "i").filter(F.col("j") < F.col("k"))
    return (
        wedges.join(close, ["j", "k"])
        .groupBy(F.col("i").alias("id"))
        .agg(F.sum(F.col("_bj") * F.col("_bk") * F.col("_bjk")).alias("tri"))
    )


def clustering_directed(G, dense: bool = True, weighted: bool = False) -> DataFrame:
    """(id, clustering: double) — directed clustering coefficient
    (reference ``cluster.py:101-126``):
    ``C(i) = T(i) / (d_tot*(d_tot-1) - 2*d_recip)``; ``weighted`` uses the
    cbrt-normalized triangle intensity over the same degree denominator."""
    tri = _directed_tri_counts(G, weighted=weighted)
    off = G.edges.select("src", "dst").filter(F.col("src") != F.col("dst")).persist()
    dtot = (
        off.select(F.col("src").alias("id"))
        .unionByName(off.select(F.col("dst").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("_dtot"))
    )
    # reciprocated partners per node (recip_degrees-, digraph.py:119-235)
    recip = (
        off.join(
            off.select(F.col("dst").alias("src"), F.col("src").alias("dst")),
            ["src", "dst"],
            "left_semi",
        )
        .groupBy(F.col("src").alias("id"))
        .agg(F.count("*").alias("_drec"))
    )
    denom = F.col("_dtot") * (F.col("_dtot") - 1) - 2 * F.coalesce(
        "_drec", F.lit(0)
    )
    out = (
        dtot.join(recip, "id", "left")
        .join(tri, "id", "left")
        .select(
            "id",
            F.when(denom > 0, F.coalesce("tri", F.lit(0.0)) / denom)
            .otherwise(0.0)
            .alias("clustering"),
        )
    )
    if not dense:
        return out
    return G.nodes.join(out, "id", "left").select(
        "id", F.coalesce("clustering", F.lit(0.0)).alias("clustering")
    )


def average_clustering_directed(
    G, count_zeros: bool = True, weighted: bool = False
) -> float:
    """``cluster.py:176-193`` directed variant."""
    c = clustering_directed(G, dense=True, weighted=weighted)
    if not count_zeros:
        c = c.filter(F.col("clustering") != 0.0)
    row = c.agg(F.avg("clustering").alias("m")).collect()[0]
    return float(row["m"]) if row["m"] is not None else 0.0


# -- node-local filter-first fast paths (reference cluster.py single_*) ------


def single_clustering_directed(G, node: int, weighted: bool = False) -> float:
    """Directed clustering at ONE node (reference ``cluster.py:149-173``):
    the B-matrix triangle sum restricted to the node's neighborhood first —
    work is O(deg(i)^2 join m), never the full wedge join."""
    b = _b_matrix(G, weighted=weighted)
    nbrs = b.filter(F.col("src") == node).select(
        F.col("dst").alias("id"), F.col("b").alias("_bn")
    )
    pairs = (
        nbrs.select(F.col("id").alias("j"), F.col("_bn").alias("_bj"))
        .crossJoin(nbrs.select(F.col("id").alias("k"), F.col("_bn").alias("_bk")))
        .filter(F.col("j") < F.col("k"))
    )
    closed = pairs.join(
        b.select(F.col("src").alias("j"), F.col("dst").alias("k"), F.col("b").alias("_bjk")),
        ["j", "k"],
    )
    row = closed.agg(
        F.sum(F.col("_bj") * F.col("_bk") * F.col("_bjk")).alias("t")
    ).collect()[0]
    tri = float(row["t"]) if row["t"] is not None else 0.0
    if tri == 0.0:
        return 0.0
    off = G.edges.filter(F.col("src") != F.col("dst"))
    out_n = off.filter(F.col("src") == node).count()
    in_n = off.filter(F.col("dst") == node).count()
    recip = (
        off.filter(F.col("src") == node)
        .select("dst")
        .join(off.filter(F.col("dst") == node).select(F.col("src").alias("dst")), "dst", "left_semi")
        .count()
    )
    dtot = out_n + in_n
    denom = dtot * (dtot - 1) - 2 * recip
    return tri / denom if denom > 0 else 0.0


def single_generalized_degree(G, node: int) -> DataFrame:
    """(id, ntri, n_edges) for ONE node (reference ``cluster.py:285-310``
    ``single_`` variant): per incident edge (node,u), the triangle count is
    |N(node) ∩ N(u)| — computed against the node's neighbor set only."""
    sym = G.get_property("sym_edges").select("src", "dst").filter(
        F.col("src") != F.col("dst")
    )
    nbrs = sym.filter(F.col("src") == node).select(F.col("dst").alias("u")).persist()
    # for each neighbor u: edges u -> w with w also a neighbor of node
    tri_per_edge = (
        sym.join(nbrs.select(F.col("u").alias("src")), "src", "left_semi")
        .join(
            nbrs.select(F.col("u").alias("dst")), "dst", "left_semi"
        )
        .groupBy(F.col("src").alias("u"))
        .agg(F.count("*").alias("ntri"))
    )
    hist = (
        nbrs.join(tri_per_edge, "u", "left")
        .select(F.coalesce("ntri", F.lit(0)).alias("ntri"))
        .groupBy("ntri")
        .agg(F.count("*").alias("n_edges"))
        .select(F.lit(int(node)).alias("id"), "ntri", "n_edges")
    )
    return hist


def single_square_clustering(G, node: int) -> float:
    """C4 coefficient at ONE node (reference ``cluster.py:197-226``) —
    routed through the chunked bulk plan with a single-node chunk."""
    rows = (
        square_clustering(G, node_ids=[int(node)])
        .filter(F.col("id") == int(node))
        .collect()
    )
    return float(rows[0]["sq_clustering"]) if rows else 0.0
