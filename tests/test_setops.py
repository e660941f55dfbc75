"""Graph set operators vs networkx."""

from __future__ import annotations

import networkx as nx

from graphblas_algorithms_spark import from_networkx
from graphblas_algorithms_spark.operators.setops import (
    complement,
    compose,
    difference,
    disjoint_union,
    full_join,
    intersection,
    reverse,
    symmetric_difference,
    to_undirected,
    union,
)


def _edges(G):
    return {(r["src"], r["dst"]) for r in G.edges.select("src", "dst").collect()}


def _nx_edges_undirected(nxg):
    return {(min(u, v), max(u, v)) for u, v in nxg.edges}


def test_union_intersection_difference(spark):
    g1 = nx.gnp_random_graph(30, 0.1, seed=1)
    g2 = nx.gnp_random_graph(30, 0.1, seed=2)
    G, H = from_networkx(spark, g1), from_networkx(spark, g2)
    assert _edges(intersection(G, H)) == _nx_edges_undirected(
        nx.intersection(g1, g2)
    )
    assert _edges(difference(G, H)) == _nx_edges_undirected(nx.difference(g1, g2))
    assert _edges(symmetric_difference(G, H)) == _nx_edges_undirected(
        nx.symmetric_difference(g1, g2)
    )
    assert _edges(compose(G, H)) == _nx_edges_undirected(nx.compose(g1, g2))
    assert _edges(union(G, H)) == _nx_edges_undirected(nx.compose(g1, g2))


def test_disjoint_union(spark):
    g1 = nx.path_graph(4)
    g2 = nx.cycle_graph(3)
    G, H = from_networkx(spark, g1), from_networkx(spark, g2)
    D = disjoint_union(G, H)
    assert _edges(D) == _nx_edges_undirected(nx.disjoint_union(g1, g2))
    assert D.n == 7


def test_complement(spark):
    g = nx.gnp_random_graph(15, 0.3, seed=3)
    G = from_networkx(spark, g)
    assert _edges(complement(G)) == _nx_edges_undirected(nx.complement(g))


def test_full_join(spark):
    g1 = nx.path_graph(3)
    g2 = nx.path_graph(2)
    G, H = from_networkx(spark, g1), from_networkx(spark, g2)
    FJ = full_join(G, H)
    want = nx.full_join(g1, g2, rename=("g", "h"))
    assert len(_edges(FJ)) == want.number_of_edges()


def test_reverse_to_undirected(spark):
    g = nx.gnp_random_graph(20, 0.1, seed=4, directed=True)
    G = from_networkx(spark, g)
    assert _edges(reverse(G)) == {(v, u) for u, v in g.edges}
    U = to_undirected(G)
    assert _edges(U) == _nx_edges_undirected(g.to_undirected())
