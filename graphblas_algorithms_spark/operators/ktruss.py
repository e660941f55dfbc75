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


def truss_decomposition(
    G, max_rounds: int = 100, fixed_rounds: int | None = None
) -> DataFrame:
    """(src, dst, trussness) — the trussness of EVERY edge: the largest
    k such that the edge survives in the k-truss.  Completes
    :func:`k_truss` the way ``core_number`` completes ``k_core`` — one
    pass replaces a per-k peeling sweep.

    Algorithm: higher-order h-index iteration (the Lü-Chen-Zhou coreness
    h-index lifted to the triangle hypergraph; Sariyüce et al., "Local
    algorithms for hierarchical dense subgraph discovery", VLDB'18):
    tau(e) starts at the edge's triangle support; each round replaces it
    with the h-index of {min(tau(f), tau(g)) over triangles (e, f, g)},
    clamped non-increasing.  Iterates from above monotonically to the
    triangle-core fixpoint; trussness = tau + 2 (edges on no triangle
    are trussness 2).  ``fixed_rounds`` pins the round count for the
    SQL-replay oracle (rounds past the fixpoint are no-ops).

    Scale shape: state is one value per edge; a round is two hash joins
    of the 3x#triangles membership table against the edge values + one
    windowed h-index per edge — no peeling sequentiality, no per-k
    sweeps, and the triangle table is built ONCE (degree-ordered
    orientation bounds its size the same way the count kernels do).
    """
    from pyspark.sql import Window

    from .triangles import triangle_list

    spark = G.spark
    num_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    tri = triangle_list(G).select(
        F.least("a", "b").alias("e1s"), F.greatest("a", "b").alias("e1d"),
        F.least("a", "c").alias("e2s"), F.greatest("a", "c").alias("e2d"),
        F.least("b", "c").alias("e3s"), F.greatest("b", "c").alias("e3d"),
    )
    # membership: one row per (triangle, member edge) with the other two
    mem = None
    for me, o1, o2 in (("e1", "e2", "e3"), ("e2", "e1", "e3"), ("e3", "e1", "e2")):
        part = tri.select(
            F.col(f"{me}s").alias("src"), F.col(f"{me}d").alias("dst"),
            F.col(f"{o1}s").alias("o1s"), F.col(f"{o1}d").alias("o1d"),
            F.col(f"{o2}s").alias("o2s"), F.col(f"{o2}d").alias("o2d"),
        )
        mem = part if mem is None else mem.unionByName(part)
    mem = mem.repartition(num_part, "src", "dst").persist()

    edges_all = (
        G.get_property("sym_offdiag")
        .filter(F.col("src") < F.col("dst"))
        .select("src", "dst")
        .distinct()
        .persist()
    )
    tau = (
        mem.groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("tau"))
        .transform(lineage_cut)
        .persist()
    )

    rounds = fixed_rounds if fixed_rounds is not None else max_rounds
    prev_sum = None if fixed_rounds is not None else tau.agg(F.sum("tau")).collect()[0][0]
    w = Window.partitionBy("src", "dst").orderBy(F.desc("m"))
    for _ in range(rounds):
        t1 = tau.select(
            F.col("src").alias("o1s"), F.col("dst").alias("o1d"), F.col("tau").alias("_t1")
        )
        t2 = tau.select(
            F.col("src").alias("o2s"), F.col("dst").alias("o2d"), F.col("tau").alias("_t2")
        )
        vals = (
            mem.join(t1, ["o1s", "o1d"])
            .join(t2, ["o2s", "o2d"])
            .select("src", "dst", F.least("_t1", "_t2").alias("m"))
        )
        hidx = (
            vals.select("src", "dst", "m", F.row_number().over(w).alias("_rk"))
            .groupBy("src", "dst")
            .agg(F.max(F.least(F.col("_rk").cast("long"), F.col("m"))).alias("h"))
        )
        new_tau = (
            tau.join(hidx, ["src", "dst"], "left")
            .select(
                "src", "dst",
                F.least("tau", F.coalesce("h", F.lit(0))).alias("tau"),
            )
            .transform(lineage_cut)
            .persist()
        )
        if fixed_rounds is None:
            s = new_tau.agg(F.sum("tau")).collect()[0][0]
            tau.unpersist()
            tau = new_tau
            if s == prev_sum:
                break
            prev_sum = s
        else:
            tau.unpersist()
            tau = new_tau
    out = edges_all.join(tau, ["src", "dst"], "left").select(
        "src", "dst",
        (F.coalesce("tau", F.lit(0)) + 2).cast("long").alias("trussness"),
    )
    mem.unpersist()
    return out
