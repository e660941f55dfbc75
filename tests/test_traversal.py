"""BFS family + shortest paths vs networkx (exact)."""

from __future__ import annotations

import networkx as nx
import pytest

from graphblas_algorithms_spark import from_networkx
from graphblas_algorithms_spark.exceptions import Unbounded
from graphblas_algorithms_spark.operators.shortest_paths import (
    all_pairs_shortest_path_length,
    bellman_ford_path,
    bellman_ford_path_length,
    bellman_ford_path_lengths,
    has_path,
    negative_edge_cycle,
    single_source_shortest_path_length,
    single_target_shortest_path_length,
)
from graphblas_algorithms_spark.operators.traversal import (
    ancestors,
    bfs_layers,
    bfs_levels,
    bfs_levels_multi,
    bfs_parent,
    descendants,
    descendants_at_distance,
)


@pytest.fixture(scope="module")
def er(spark):
    nxg = nx.gnp_random_graph(100, 0.03, seed=42)
    return nxg, from_networkx(spark, nxg)


def test_bfs_levels(er):
    nxg, G = er
    got = {r["id"]: r["level"] for r in bfs_levels(G, 0).collect()}
    want = nx.single_source_shortest_path_length(nxg, 0)
    assert got == want


def test_bfs_levels_multi(er):
    nxg, G = er
    got = {}
    for r in bfs_levels_multi(G, [0, 5, 17]).collect():
        got.setdefault(r["source"], {})[r["id"]] = r["level"]
    for s in (0, 5, 17):
        assert got[s] == nx.single_source_shortest_path_length(nxg, s)


def test_bfs_parent_levels_consistent(er):
    nxg, G = er
    par = {r["id"]: r["parent"] for r in bfs_parent(G, 0).collect()}
    lvl = nx.single_source_shortest_path_length(nxg, 0)
    assert set(par) == set(lvl)
    assert par[0] == 0
    for v, p in par.items():
        if v != 0:
            assert lvl[p] == lvl[v] - 1 and nxg.has_edge(p, v)


def test_bfs_layers_and_distance(er):
    nxg, G = er
    layers = bfs_layers(G, 0)
    want = nx.single_source_shortest_path_length(nxg, 0)
    for d, layer in enumerate(layers):
        ids = {r["id"] for r in layer.collect()}
        assert ids == {u for u, lv in want.items() if lv == d}
    d2 = {r["id"] for r in descendants_at_distance(G, 0, 2).collect()}
    assert d2 == {u for u, lv in want.items() if lv == 2}


def test_descendants_ancestors(spark):
    nxg = nx.DiGraph([(0, 1), (1, 2), (3, 1), (2, 4)])
    G = from_networkx(spark, nxg)
    assert {r["id"] for r in descendants(G, 0).collect()} == nx.descendants(nxg, 0)
    assert {r["id"] for r in ancestors(G, 4).collect()} == nx.ancestors(nxg, 4)


def test_sssp_unweighted(er):
    nxg, G = er
    got = {r["id"]: r["length"] for r in single_source_shortest_path_length(G, 3).collect()}
    assert got == nx.single_source_shortest_path_length(nxg, 3)


def test_sssp_target_directed(spark):
    nxg = nx.DiGraph([(0, 1), (1, 2), (3, 2), (2, 4)])
    G = from_networkx(spark, nxg)
    got = {r["id"]: r["length"] for r in single_target_shortest_path_length(G, 2).collect()}
    want = {
        u: l
        for u, l in nx.single_source_shortest_path_length(nxg.reverse(), 2).items()
    }
    assert got == want


def test_bellman_ford(spark):
    nxg = nx.gnp_random_graph(80, 0.05, seed=9, directed=True)
    for u, v in nxg.edges:
        nxg[u][v]["weight"] = float((u * 7 + v * 13) % 10 + 1)
    G = from_networkx(spark, nxg)
    got = {r["id"]: r["dist"] for r in bellman_ford_path_length(G, 0).collect()}
    want = nx.single_source_bellman_ford_path_length(nxg, 0)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-9)


def test_bellman_ford_multi_and_parent(spark):
    nxg = nx.gnp_random_graph(50, 0.08, seed=4, directed=True)
    for u, v in nxg.edges:
        nxg[u][v]["weight"] = float((u + v) % 5 + 1)
    G = from_networkx(spark, nxg)
    multi = bellman_ford_path_lengths(G, [0, 1])
    got = {}
    for r in multi.collect():
        got.setdefault(r["source"], {})[r["id"]] = r["dist"]
    for s in (0, 1):
        want = nx.single_source_bellman_ford_path_length(nxg, s)
        assert {k: pytest.approx(v) for k, v in got[s].items()} == want
    # parent tree: dist[parent] + w(parent,v) == dist[v]
    tree = {r["id"]: (r["dist"], r["parent"]) for r in bellman_ford_path(G, 0).collect()}
    want = nx.single_source_bellman_ford_path_length(nxg, 0)
    assert {k: v[0] for k, v in tree.items()} == pytest.approx(want)
    for v, (d, p) in tree.items():
        if v != 0:
            assert tree[p][0] + nxg[p][v]["weight"] == pytest.approx(d)


def test_negative_cycle(spark):
    nxg = nx.DiGraph()
    nxg.add_edge(0, 1, weight=1.0)
    nxg.add_edge(1, 2, weight=-2.0)
    nxg.add_edge(2, 0, weight=0.5)
    G = from_networkx(spark, nxg)
    assert negative_edge_cycle(G)
    with pytest.raises(Unbounded):
        bellman_ford_path_length(G, 0)
    nxg2 = nx.DiGraph()
    nxg2.add_edge(0, 1, weight=1.0)
    nxg2.add_edge(1, 2, weight=-0.5)
    G2 = from_networkx(spark, nxg2)
    assert not negative_edge_cycle(G2)


def test_has_path(spark):
    nxg = nx.DiGraph([(0, 1), (2, 3)])
    G = from_networkx(spark, nxg)
    assert has_path(G, 0, 1)
    assert not has_path(G, 0, 3)


def test_all_pairs(spark):
    nxg = nx.gnp_random_graph(40, 0.1, seed=2)
    G = from_networkx(spark, nxg)
    got = {}
    for r in all_pairs_shortest_path_length(G).collect():
        got.setdefault(r["source"], {})[r["id"]] = r["length"]
    for s, want in nx.all_pairs_shortest_path_length(nxg):
        assert got.get(s, {}) == want


def test_all_pairs_chunked_matches_unchunked(spark):
    # chunk_size forcing >1 chunk must be result-identical (nxapi 10MiB
    # chunker analog, nxapi/shortest_paths/unweighted.py:30-45)
    nxg = nx.gnp_random_graph(25, 0.15, seed=5)
    G = from_networkx(spark, nxg)
    one = sorted(
        tuple(r) for r in all_pairs_shortest_path_length(G).collect()
    )
    many = sorted(
        tuple(r)
        for r in all_pairs_shortest_path_length(G, chunk_size=7).collect()
    )
    assert one == many


def test_bellman_ford_lengths_chunked(spark):
    nxg = nx.gnp_random_graph(30, 0.12, seed=6, directed=True)
    for u, v in nxg.edges:
        nxg[u][v]["weight"] = float((u + 2 * v) % 4 + 1)
    G = from_networkx(spark, nxg)
    srcs = list(range(9))
    one = sorted(tuple(r) for r in bellman_ford_path_lengths(G, srcs).collect())
    many = sorted(
        tuple(r)
        for r in bellman_ford_path_lengths(G, srcs, chunk_size=4).collect()
    )
    assert one == many
