"""Maximal matching: property checks (disjoint endpoints + maximality),
Python replay of the deterministic dominant-edge rule, seeds, edge cases."""

from __future__ import annotations

import hashlib

import networkx as nx

from graphblas_algorithms_spark import from_networkx
from graphblas_algorithms_spark.operators.matching import (
    maximal_matching,
    min_vertex_cover_2approx,
)


def _py_matching(nxg, seed=42):
    """Pure-python replay of the pinned rule: canonical-edge md5 priority
    with unique '|src|dst' suffix; per round an edge wins iff its priority
    is the min over live edges at BOTH endpoints."""
    live = {
        (min(u, v), max(u, v))
        for u, v in nxg.edges
        if u != v
    }
    pri = {
        e: hashlib.md5(f"{seed}|{e[0]}|{e[1]}".encode()).hexdigest()
        + f"|{e[0]}|{e[1]}"
        for e in live
    }
    matched = set()
    out = set()
    while live:
        node_min = {}
        for e in live:
            for v in e:
                if v not in node_min or pri[e] < node_min[v]:
                    node_min[v] = pri[e]
        won = {e for e in live if pri[e] == node_min[e[0]] == node_min[e[1]]}
        assert won, "dominant-edge rule must always make progress"
        out |= won
        for u, v in won:
            matched |= {u, v}
        live = {e for e in live if e[0] not in matched and e[1] not in matched}
    return out


def _check_matching(nxg, got):
    seen = set()
    for u, v in got:
        assert u < v
        assert nxg.has_edge(u, v), (u, v)
        assert u not in seen and v not in seen, (u, v)
        seen |= {u, v}
    # maximality: every non-loop edge has a matched endpoint
    for u, v in nxg.edges:
        if u != v:
            assert u in seen or v in seen, (u, v)


def test_matching_matches_python_replay(spark):
    nxg = nx.gnp_random_graph(80, 0.08, seed=13)
    G = from_networkx(spark, nxg)
    got = {(r["src"], r["dst"]) for r in maximal_matching(G).collect()}
    assert got == _py_matching(nxg)
    _check_matching(nxg, got)


def test_matching_denser_graph_and_2approx(spark):
    nxg = nx.gnp_random_graph(60, 0.25, seed=21)
    G = from_networkx(spark, nxg)
    got = {(r["src"], r["dst"]) for r in maximal_matching(G).collect()}
    _check_matching(nxg, got)
    assert got == _py_matching(nxg)
    # any maximal matching is a 2-approximation of the maximum matching
    opt = len(nx.max_weight_matching(nxg, maxcardinality=True))
    assert len(got) >= opt / 2


def test_matching_seed_changes_set_but_not_validity(spark):
    nxg = nx.gnp_random_graph(50, 0.15, seed=5)
    G = from_networkx(spark, nxg)
    a = {(r["src"], r["dst"]) for r in maximal_matching(G, seed=1).collect()}
    b = {(r["src"], r["dst"]) for r in maximal_matching(G, seed=2).collect()}
    _check_matching(nxg, a)
    _check_matching(nxg, b)
    assert a == _py_matching(nxg, seed=1)
    assert b == _py_matching(nxg, seed=2)


def test_matching_path_star_selfloop_empty(spark):
    # path: alternating structure; star: exactly one edge; self-loops ignored
    p = nx.path_graph(7)
    G = from_networkx(spark, p)
    got = {(r["src"], r["dst"]) for r in maximal_matching(G).collect()}
    _check_matching(p, got)
    assert got == _py_matching(p)

    s = nx.star_graph(9)
    s.add_edge(3, 3)  # self-loop must be ignored
    G = from_networkx(spark, s)
    got = {(r["src"], r["dst"]) for r in maximal_matching(G).collect()}
    assert len(got) == 1 and got == _py_matching(s)

    e = nx.empty_graph(4)
    G = from_networkx(spark, e)
    assert maximal_matching(G).count() == 0


def test_vertex_cover_2approx(spark):
    nxg = nx.gnp_random_graph(60, 0.12, seed=31)
    G = from_networkx(spark, nxg)
    cover = {r["id"] for r in min_vertex_cover_2approx(G).collect()}
    # covers every non-loop edge
    for u, v in nxg.edges:
        if u != v:
            assert u in cover or v in cover, (u, v)
    # exactly the matching's endpoints, so |cover| = 2|M| <= 2 OPT;
    # check the factor against networkx's exact min weighted cover LP dual
    # proxy: max matching size (König would need bipartite; use the
    # guaranteed bound |cover| <= 2 * max_matching instead)
    opt_matching = len(nx.max_weight_matching(nxg, maxcardinality=True))
    assert len(cover) <= 2 * opt_matching
    assert len(cover) == 2 * maximal_matching(G).count()


def test_coarsen_graph_contracts_matching(spark):
    """Coarse edges == python contraction of the engine's own matching;
    node_map covers every node; no self-loops; weights preserve edge mass."""
    from collections import Counter

    from graphblas_algorithms_spark.operators.matching import (
        coarsen_graph,
        maximal_matching,
    )

    nxg = nx.gnp_random_graph(60, 0.12, seed=9)
    G = from_networkx(spark, nxg)
    m = {(r["src"], r["dst"]) for r in maximal_matching(G).collect()}
    rep = {d: s for s, d in m}

    want = Counter()
    for u, v in nxg.edges():
        u, v = min(u, v), max(u, v)
        a, b = rep.get(u, u), rep.get(v, v)
        if a != b:
            want[(min(a, b), max(a, b))] += 1

    coarse, node_map = coarsen_graph(G)
    got = {(r["src"], r["dst"]): r["weight"] for r in coarse.collect()}
    assert got == dict(want)
    assert all(s != d for s, d in got)

    nm = {r["id"]: r["rep"] for r in node_map.collect()}
    assert set(nm) == set(nxg.nodes())
    for u, v in m:
        assert nm[v] == u and nm[u] == u
    # in a simple graph the only edges contracted away are the matching's
    assert sum(got.values()) + len(m) == nxg.number_of_edges()
