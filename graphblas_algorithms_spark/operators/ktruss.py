"""k-truss: iterated edge-support filtering (reference ``core.py:8-37``).

Reference loop: support = ``plus_pair(S @ S.T).new(mask=S.S)``, drop
edges with support < k-2, repeat to fixpoint (``:23-29``), then drop
isolate nodes (``:32-34``).  Spark translation: the per-edge support is
the triangle-per-edge count from the SAME degree-ordered oriented wedge
join as triangles.py (mask pushed into join order, O1), iterated with a
driver-side fixpoint check on the surviving-edge count (O8).

Unlike the reference we keep original node ids in the result subgraph
(no renumbering — SURVEY §2.2 note)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..classes.graph import Graph
from ..plans.superstep import lineage_cut, _release_state


def _edge_support(edges_df):
    """edges_df: canonical (src<dst) undirected simple edges.
    Returns (src, dst, support) with support = #triangles through the edge."""
    deg = (
        edges_df.select(F.col("src").alias("id"))
        .unionByName(edges_df.select(F.col("dst").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("degree"))
    )
    e = (
        edges_df.join(deg.select(F.col("id").alias("src"), F.col("degree").alias("_ds")), "src")
        .join(deg.select(F.col("id").alias("dst"), F.col("degree").alias("_dd")), "dst")
    )
    fwd_ok = (F.col("_ds") < F.col("_dd")) | (
        (F.col("_ds") == F.col("_dd")) & (F.col("src") < F.col("dst"))
    )
    eo = e.select(
        F.when(fwd_ok, F.col("src")).otherwise(F.col("dst")).alias("src"),
        F.when(fwd_ok, F.col("dst")).otherwise(F.col("src")).alias("dst"),
        F.when(fwd_ok, F.col("_ds")).otherwise(F.col("_dd")).alias("deg_src"),
        F.when(fwd_ok, F.col("_dd")).otherwise(F.col("_ds")).alias("deg_dst"),
    )
    e1 = eo.select(F.col("src").alias("u"), F.col("dst").alias("v"), F.col("deg_dst").alias("_dv"))
    e2 = eo.select(F.col("src").alias("u2"), F.col("dst").alias("w"), F.col("deg_dst").alias("_dw"))
    wedges = e1.join(e2, F.col("u") == F.col("u2")).filter(
        (F.col("_dv") < F.col("_dw"))
        | ((F.col("_dv") == F.col("_dw")) & (F.col("v") < F.col("w")))
    )
    closing = eo.select(F.col("src").alias("v"), F.col("dst").alias("w"))
    tris = wedges.join(closing, ["v", "w"], "left_semi").select("u", "v", "w")
    # each triangle (u,v,w) supports 3 edges; emit canonical (min,max) pairs
    tri_edges = (
        tris.select(F.least("u", "v").alias("src"), F.greatest("u", "v").alias("dst"))
        .unionByName(tris.select(F.least("u", "w").alias("src"), F.greatest("u", "w").alias("dst")))
        .unionByName(tris.select(F.least("v", "w").alias("src"), F.greatest("v", "w").alias("dst")))
    )
    support = tri_edges.groupBy("src", "dst").agg(F.count("*").alias("support"))
    return edges_df.join(support, ["src", "dst"], "left").select(
        "src", "dst", F.coalesce("support", F.lit(0)).alias("support")
    )


def k_truss(G: Graph, k: int) -> Graph:
    """Maximal subgraph where every edge is in >= k-2 triangles.

    Returns a new Graph; isolate nodes dropped (``core.py:32-34``)."""
    # start from simple off-diagonal canonical edges (core.py:15-21 strips diag)
    # localCheckpoint per round truncates lineage — the support join tree
    # nests otherwise and Catalyst canonicalization recurses past the JVM
    # stack after ~15 fixpoint rounds (same lineage discipline as the
    # superstep harness, SURVEY §3 "Spark lifecycle")
    edges = (
        G.get_property("offdiag").select("src", "dst").transform(lineage_cut)
    )
    m = edges.count()
    while True:
        kept = (
            _edge_support(edges)
            .filter(F.col("support") >= k - 2)
            .select("src", "dst")
            .transform(lineage_cut)
        )
        m2 = kept.count()
        # kept is fully materialized (eager checkpoint) — the retired round's
        # edge snapshot can be released NOW; plain unpersist would leave its
        # localCheckpoint blocks resident for the session (see _release_state)
        _release_state(edges)
        edges = kept
        if m2 == m:
            break
        m = m2
    nodes = (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    return Graph(edges, nodes, canonicalize=False)
