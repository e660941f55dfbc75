"""Bridges / 2-edge-connected components vs networkx, plus forest
invariants for the cycle-space construction."""

from __future__ import annotations

import networkx as nx
from networkx.algorithms.connectivity.edge_kcomponents import bridge_components

from graphblas_algorithms_spark import from_networkx
from graphblas_algorithms_spark.operators.bridges import (
    bridges,
    has_bridges,
    spanning_forest,
    two_edge_components,
)


def _bridge_set(G):
    return {(r["src"], r["dst"]) for r in bridges(G).collect()}


def _nx_bridges(nxg):
    return {tuple(sorted(e)) for e in nx.bridges(nxg)}


def test_bridges_random_sparse(spark):
    for seed, p in [(5, 0.02), (9, 0.035)]:
        nxg = nx.gnp_random_graph(70, p, seed=seed)
        G = from_networkx(spark, nxg)
        assert _bridge_set(G) == _nx_bridges(nxg), f"seed={seed}"


def test_bridges_structured(spark):
    # two triangles joined by a path: exactly the path edges are bridges
    nxg = nx.Graph([(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 5), (5, 6), (6, 4)])
    G = from_networkx(spark, nxg)
    assert _bridge_set(G) == {(2, 3), (3, 4)}
    assert has_bridges(G)
    tri = from_networkx(spark, nx.complete_graph(5))
    assert _bridge_set(tri) == set()
    assert not has_bridges(tri)


def test_tree_every_edge_is_a_bridge(spark):
    nxg = nx.random_labeled_tree(40, seed=3)
    G = from_networkx(spark, nxg)
    assert _bridge_set(G) == {tuple(sorted(e)) for e in nxg.edges()}


def test_two_edge_components_matches_networkx(spark):
    for seed, p in [(7, 0.03), (13, 0.05)]:
        nxg = nx.gnp_random_graph(60, p, seed=seed)
        G = from_networkx(spark, nxg)
        rows = two_edge_components(G).collect()
        got: dict = {}
        for r in rows:
            got.setdefault(r["component"], set()).add(r["id"])
        want = {frozenset(c) for c in bridge_components(nxg)}
        assert {frozenset(c) for c in got.values()} == want, f"seed={seed}"


def test_spanning_forest_invariants(spark):
    nxg = nx.gnp_random_graph(50, 0.06, seed=21)
    nxg.add_node(990)  # isolate = its own root
    G = from_networkx(spark, nxg)
    rows = {r["id"]: r for r in spanning_forest(G).collect()}
    assert len(rows) == nxg.number_of_nodes()
    comp_min = {n: min(c) for c in nx.connected_components(nxg) for n in c}
    sp = {}
    for root in {comp_min[n] for n in nxg}:
        sp.update(nx.single_source_shortest_path_length(nxg, root))
    for n, r in rows.items():
        assert r["root"] == comp_min[n]
        assert r["level"] == sp[n]
        if n == r["root"]:
            assert r["parent"] is None
        else:
            # min neighbor one BFS level up
            want = min(u for u in nxg.neighbors(n) if sp[u] == sp[n] - 1)
            assert r["parent"] == want
