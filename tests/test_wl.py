"""Weisfeiler-Lehman hashing: isomorphism invariance, refinement-class
agreement with networkx, and non-isomorphic discrimination."""

from __future__ import annotations

import networkx as nx

from graphblas_algorithms_spark import from_networkx
from graphblas_algorithms_spark.operators.wl import wl_graph_hash, wl_node_hashes


def _node_hash_map(spark, nxg, iterations):
    G = from_networkx(spark, nxg)
    return {r["id"]: r["wl"] for r in wl_node_hashes(G, iterations=iterations).collect()}


def _partition(h: dict) -> set:
    by = {}
    for k, v in h.items():
        by.setdefault(v, set()).add(k)
    return {frozenset(s) for s in by.values()}


def test_wl_isomorphism_invariance(spark):
    nxg = nx.gnp_random_graph(60, 0.08, seed=7)
    perm = {v: (v * 37 + 11) % 60 for v in nxg}  # 37 coprime to 60: a bijection
    nxg2 = nx.relabel_nodes(nxg, perm)
    G1 = from_networkx(spark, nxg)
    G2 = from_networkx(spark, nxg2)
    assert wl_graph_hash(G1, iterations=3) == wl_graph_hash(G2, iterations=3)
    h1 = _node_hash_map(spark, nxg, 3)
    h2 = _node_hash_map(spark, nxg2, 3)
    for v in nxg:
        assert h1[v] == h2[perm[v]]


def test_wl_classes_match_networkx(spark):
    for seed, n, p in [(3, 40, 0.1), (5, 50, 0.05)]:
        nxg = nx.gnp_random_graph(n, p, seed=seed)
        ours = _partition(_node_hash_map(spark, nxg, 3))
        # nx >= 3.5 prepends the depth-0 (initial degree-label) hash, so
        # nx h[i] is refinement depth i: depth 3 needs iterations=4.
        nx_hashes = nx.weisfeiler_lehman_subgraph_hashes(nxg, iterations=4)
        theirs = _partition({v: h[3] for v, h in nx_hashes.items()})
        assert ours == theirs


def test_wl_distinguishes_non_isomorphic(spark):
    a = nx.gnp_random_graph(30, 0.15, seed=1)
    b = nx.gnp_random_graph(30, 0.15, seed=2)
    assert nx.weisfeiler_lehman_graph_hash(a) != nx.weisfeiler_lehman_graph_hash(b)
    Ga = from_networkx(spark, a)
    Gb = from_networkx(spark, b)
    assert wl_graph_hash(Ga, iterations=3) != wl_graph_hash(Gb, iterations=3)
    # known 1-WL limitation (documented, matches nx): d-regular graphs of
    # equal size are 1-WL-indistinguishable — C6 and 2xK3 hash equal.
    c6 = nx.cycle_graph(6)
    tt = nx.disjoint_union(nx.complete_graph(3), nx.complete_graph(3))
    assert nx.weisfeiler_lehman_graph_hash(c6) == nx.weisfeiler_lehman_graph_hash(tt)
    assert wl_graph_hash(from_networkx(spark, c6), 3) == wl_graph_hash(
        from_networkx(spark, tt), 3
    )


def test_wl_isolated_nodes_and_empty(spark):
    nxg = nx.empty_graph(5)
    nxg.add_edge(0, 1)
    h = _node_hash_map(spark, nxg, 2)
    assert h[2] == h[3] == h[4]  # isolated nodes share a class
    assert h[0] == h[1]  # the matched pair shares a class
    assert h[0] != h[2]
