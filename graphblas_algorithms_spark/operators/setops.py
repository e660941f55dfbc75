"""Graph set operators (reference ``algorithms/operators/binary.py`` and
``unary.py``) — each is 1-3 DataFrame expressions (SURVEY §2.2 table).

The reference stitches id spaces through ``_key_to_id`` dict merges and
block-diagonal Matrix assembly (``binary.py:37-42``); our ids are longs,
so disjoint union offsets the right graph's ids by ``G.n`` and the
key-compatible ops assert/assume a shared id space (the nxapi layer owns
key translation, SURVEY §2.3).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..classes.graph import DiGraph, Graph


def _same_kind(G, H):
    if G.is_directed_flag != H.is_directed_flag:
        raise ValueError("graphs must both be directed or both undirected")
    return DiGraph if G.is_directed_flag else Graph


def union(G, H, rename: tuple[str, str] | None = None):
    """Edge union over the SAME node-id space (``binary.py:16-56``;
    the reference requires disjoint keys unless rename — on a shared id
    space the natural reading is pattern union)."""
    cls = _same_kind(G, H)
    e = G.edges.select("src", "dst").unionByName(H.edges.select("src", "dst")).distinct()
    nodes = G.nodes.unionByName(H.nodes).distinct()
    return cls(e, nodes, **({"canonicalize": False} if cls is Graph else {"dedup": False}))


def disjoint_union(G, H):
    """Block-diagonal assembly with id offset (``binary.py:37-42``):
    H's ids shifted by G.n."""
    cls = _same_kind(G, H)
    n = G.n
    e2 = H.edges.select(
        (F.col("src") + F.lit(n)).alias("src"), (F.col("dst") + F.lit(n)).alias("dst")
    )
    e = G.edges.select("src", "dst").unionByName(e2)
    nodes = G.nodes.unionByName(H.nodes.select((F.col("id") + F.lit(n)).alias("id")))
    return cls(e, nodes, **({"canonicalize": False} if cls is Graph else {"dedup": False}))


def intersection(G, H):
    """Common nodes, edges in both (``binary.py:59-70``) — inner join on
    (src, dst)."""
    cls = _same_kind(G, H)
    e = G.edges.select("src", "dst").join(H.edges.select("src", "dst"), ["src", "dst"], "left_semi")
    nodes = G.nodes.join(H.nodes, "id", "left_semi")
    return cls(e, nodes, **({"canonicalize": False} if cls is Graph else {"dedup": False}))


def difference(G, H):
    """Same node set, edges in G not in H (``binary.py:73-89``) —
    left-anti join."""
    cls = _same_kind(G, H)
    e = G.edges.select("src", "dst").join(H.edges.select("src", "dst"), ["src", "dst"], "left_anti")
    return cls(e, G.nodes, **({"canonicalize": False} if cls is Graph else {"dedup": False}))


def symmetric_difference(G, H):
    """anti union anti (``binary.py:92-109``)."""
    cls = _same_kind(G, H)
    e1 = G.edges.select("src", "dst").join(H.edges.select("src", "dst"), ["src", "dst"], "left_anti")
    e2 = H.edges.select("src", "dst").join(G.edges.select("src", "dst"), ["src", "dst"], "left_anti")
    nodes = G.nodes.unionByName(H.nodes).distinct()
    return cls(e1.unionByName(e2), nodes, **({"canonicalize": False} if cls is Graph else {"dedup": False}))


def compose(G, H):
    """Right-biased merge (``binary.py:112-147``, ``binary.second(A | B)``):
    all nodes and edges of both graphs; on a common edge H's weight wins.
    When neither operand carries weights this degrades to pattern union.
    (networkx-compatible on differing node sets: G-only edges between
    common nodes survive, unlike the reference's block-assign quirk.)"""
    cls = _same_kind(G, H)
    if not (G.weighted or H.weighted):
        return union(G, H)
    gw = F.col("weight") if G.weighted else F.lit(1.0)
    hw = F.col("weight") if H.weighted else F.lit(1.0)
    ge = G.edges.select("src", "dst", gw.alias("_gw"))
    he = H.edges.select("src", "dst", hw.alias("_hw"))
    e = ge.join(he, ["src", "dst"], "full_outer").select(
        "src", "dst", F.coalesce("_hw", "_gw").alias("weight")
    )
    nodes = G.nodes.unionByName(H.nodes).distinct()
    return cls(e, nodes, **({"canonicalize": False} if cls is Graph else {"dedup": False}))


def full_join(G, H):
    """union + complete bipartite fill (``binary.py:150-155``) — dense;
    tests/small graphs only."""
    cls = _same_kind(G, H)
    D = disjoint_union(G, H)
    n = G.n
    left = G.nodes.select(F.col("id").alias("src"))
    right = H.nodes.select((F.col("id") + F.lit(n)).alias("dst"))
    bip = left.crossJoin(right)
    e = D.edges.select("src", "dst").unionByName(bip)
    if G.is_directed_flag:
        e = e.unionByName(bip.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    return cls(e, D.nodes, **({"canonicalize": False} if cls is Graph else {"dedup": True}))


def complement(G):
    """``(~A.S)`` off-diagonal (``operators/unary.py:8-12``) — O(n^2)
    cross-join anti; tests/small graphs only."""
    cls = DiGraph if G.is_directed_flag else Graph
    pairs = (
        G.nodes.select(F.col("id").alias("src"))
        .crossJoin(G.nodes.select(F.col("id").alias("dst")))
        .filter(F.col("src") != F.col("dst"))
    )
    if not G.is_directed_flag:
        pairs = pairs.filter(F.col("src") < F.col("dst"))
        existing = G.get_property("offdiag").select(
            F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
        )
    else:
        existing = G.edges.select("src", "dst")
    e = pairs.join(existing, ["src", "dst"], "left_anti")
    return cls(e, G.nodes, **({"canonicalize": False} if cls is Graph else {"dedup": False}))


def reverse(G: DiGraph) -> DiGraph:
    """``unary.py:15-18``."""
    return G.reverse()


def to_undirected(G: DiGraph) -> Graph:
    """``digraph.py:604-612``."""
    return G.to_undirected()
