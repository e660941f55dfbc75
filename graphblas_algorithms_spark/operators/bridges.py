"""Bridges and 2-edge-connected components via cycle-space sampling
over a BFS spanning forest.

Engine extension — the reference stops at *local* bridges (edges on no
triangle, ``structure.py::local_bridges``); true bridges (edges whose
removal disconnects their component) classically need DFS low-links,
which don't distribute.  Cycle-space sampling (Pritchard & Thurimella,
"Fast computation of small cuts via cycle space sampling", TALG 2011)
replaces the DFS with algebra any engine has:

1. Build a BFS spanning forest.  Every piece is CLOSED FORM, not
   trajectory state: root(v) = min node id of v's component (the
   engine's CC labeling), level(v) = BFS distance from root(v), and
   parent(v) = min neighbor one level up — so an SQL oracle can rebuild
   the identical forest from the graph alone.
2. Give every NON-tree edge a deterministic 60-bit label
   (md5 of the canonical endpoint pair) and each node the XOR of its
   incident non-tree-edge labels.
3. Subtree-XOR those node values up the forest.  For a tree edge
   (parent(v), v) the subtree XOR equals the XOR of labels of exactly
   the non-tree edges with ONE endpoint under v — i.e. the fundamental
   cycles crossing the edge.  It is 0 iff no non-tree edge spans the
   cut, i.e. iff the edge is a bridge (a nonempty label set XORs to 0
   with probability 2^-60 per edge — negligible, and deterministic:
   reruns and the SQL replay agree bit-for-bit).

Non-tree edges are never bridges.  2-edge-connected components are then
just the engine's own CC labeling over the edge set minus bridges.

Scale shape: one CC run + one BFS (both delta-frontier, O(nnz) total),
one join+agg for parents, one for node XORs, then ``height`` upward
peel rounds each touching only one tree level — every step a
hash-partitioned join/agg on the node key, no DFS, no per-row Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.superstep import lineage_cut


def _edge_label(a, b, seed: int):
    """Deterministic 60-bit non-tree edge label, engine-portable:
    conv(substr(md5('a|b|seed'),1,15),16,10)."""
    return F.expr(
        f"cast(conv(substr(md5(concat_ws('|', {a}, {b}, {int(seed)})), 1, 15), 16, 10) as bigint)"
    )


def spanning_forest(G) -> DataFrame:
    """(id, root, level, parent) — BFS spanning forest, one tree per
    component: root = component min id (parent NULL there), level = BFS
    distance from the root, parent = min-id neighbor at level-1.
    Closed-form deterministic: a pure function of the graph."""
    from .components import connected_components

    spark = G.spark
    num_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    adj = G.get_property("sym_offdiag").select("src", "dst")
    adj = adj.repartition(num_part, "dst").persist()

    comp = connected_components(G)  # (id, component) with component = min id
    roots = comp.filter(F.col("id") == F.col("component")).select("id")

    # delta-frontier BFS from all roots at once (components are disjoint)
    visited = roots.select("id", F.lit(0).alias("level")).persist()
    frontier = roots.select("id").persist()
    level = 0
    while frontier.limit(1).count() > 0:
        level += 1
        nxt = (
            adj.join(frontier.withColumnRenamed("id", "src"), "src", "left_semi")
            .select(F.col("dst").alias("id"))
            .distinct()
            .join(visited.select("id"), "id", "left_anti")
            .transform(lineage_cut)
            .persist()
        )
        frontier.unpersist()
        frontier = nxt
        visited = (
            visited.unionByName(frontier.select("id", F.lit(level).alias("level")))
            .transform(lineage_cut)
            .persist()
        )
    frontier.unpersist()

    # parent(v) = min neighbor one level up — closed form over levels
    lvl_dst = visited.select(F.col("id").alias("dst"), F.col("level").alias("_ld"))
    lvl_src = visited.select(F.col("id").alias("src"), F.col("level").alias("_ls"))
    parents = (
        adj.join(lvl_dst, "dst")
        .join(lvl_src, "src")
        .filter(F.col("_ls") == F.col("_ld") - 1)
        .groupBy(F.col("dst").alias("id"))
        .agg(F.min("src").alias("parent"))
    )
    out = (
        visited.join(comp.select("id", F.col("component").alias("root")), "id")
        .join(parents, "id", "left")
        .select("id", "root", "level", "parent")
    )
    adj.unpersist()
    return out


def bridges(G, seed: int = 42) -> DataFrame:
    """(src, dst) — canonical (src<dst) bridge edges: edges whose
    removal disconnects their component.  Deterministic cycle-space
    sampling; self-loops are never bridges."""
    spark = G.spark
    num_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    forest = spanning_forest(G).repartition(num_part, "id").persist()

    # canonical simple edges and the tree-edge pattern
    canon = (
        G.get_property("sym_offdiag")
        .filter(F.col("src") < F.col("dst"))
        .select("src", "dst")
        .distinct()
    )
    tree = forest.filter(F.col("parent").isNotNull()).select(
        F.least("parent", "id").alias("src"), F.greatest("parent", "id").alias("dst")
    )
    nontree = canon.join(tree, ["src", "dst"], "left_anti").persist()

    # node XOR of incident non-tree edge labels
    lab = nontree.select(
        "src", "dst", _edge_label("src", "dst", seed).alias("lab")
    )
    ends = lab.select(F.col("src").alias("id"), "lab").unionByName(
        lab.select(F.col("dst").alias("id"), "lab")
    )
    xval = ends.groupBy("id").agg(F.bit_xor("lab").alias("x"))

    acc = (
        forest.join(xval, "id", "left")
        .select(
            "id",
            "root",
            "level",
            "parent",
            F.coalesce("x", F.lit(0)).alias("acc"),
        )
        .persist()
    )
    max_level = acc.agg(F.max("level")).collect()[0][0] or 0

    # upward peel: fold level-l subtree XORs into the level-(l-1) parents
    for lvl in range(int(max_level), 0, -1):
        contrib = (
            acc.filter(F.col("level") == lvl)
            .groupBy(F.col("parent").alias("id"))
            .agg(F.bit_xor("acc").alias("_c"))
        )
        nxt = (
            acc.join(contrib, "id", "left")
            .select(
                "id",
                "root",
                "level",
                "parent",
                F.when(
                    F.col("level") == lvl - 1,
                    F.col("acc").bitwiseXOR(F.coalesce("_c", F.lit(0))),
                )
                .otherwise(F.col("acc"))
                .alias("acc"),
            )
            .transform(lineage_cut)
            .persist()
        )
        acc.unpersist()
        acc = nxt

    out = (
        acc.filter(F.col("parent").isNotNull() & (F.col("acc") == 0))
        .select(
            F.least("parent", "id").alias("src"),
            F.greatest("parent", "id").alias("dst"),
        )
    )
    forest.unpersist()
    nontree.unpersist()
    return out


def two_edge_components(G, seed: int = 42) -> DataFrame:
    """(id, component) — 2-edge-connected component labeling (= min
    node id in the component): the engine's CC over the graph minus its
    bridges.  Matches nx ``bridge_components`` (every node appears;
    bridge endpoints become their own singleton unless held by another
    non-bridge edge)."""
    from .components import connected_components

    br = bridges(G, seed=seed)
    kept = (
        G.get_property("sym_offdiag")
        .filter(F.col("src") < F.col("dst"))
        .select("src", "dst")
        .distinct()
        .join(br, ["src", "dst"], "left_anti")
    )
    pruned = type(G)(kept, G.nodes.select("id"))
    return connected_components(pruned)


def has_bridges(G, seed: int = 42) -> bool:
    """True iff the graph has at least one bridge (nx ``has_bridges``)."""
    return bridges(G, seed=seed).limit(1).count() > 0
