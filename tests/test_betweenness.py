"""Betweenness centrality differential tests vs networkx."""

from __future__ import annotations

import math

import networkx as nx

from graphblas_algorithms_spark import from_networkx
from graphblas_algorithms_spark.operators.betweenness import betweenness_centrality


def _vec(df):
    return {r["id"]: r["betweenness"] for r in df.collect()}


def _close(got, want, tol=1e-9):
    assert set(got) == set(want)
    for k in want:
        assert math.isclose(got[k], want[k], rel_tol=tol, abs_tol=1e-12), (
            k,
            got[k],
            want[k],
        )


def test_exact_undirected_normalized(spark):
    nxg = nx.gnp_random_graph(40, 0.1, seed=17)
    nxg.add_node(900)  # isolate
    G = from_networkx(spark, nxg)
    _close(_vec(betweenness_centrality(G)), nx.betweenness_centrality(nxg))


def test_exact_undirected_unnormalized(spark):
    nxg = nx.karate_club_graph()
    G = from_networkx(spark, nxg)
    _close(
        _vec(betweenness_centrality(G, normalized=False)),
        nx.betweenness_centrality(nxg, normalized=False),
    )


def test_exact_directed(spark):
    nxg = nx.gnp_random_graph(35, 0.1, seed=23, directed=True)
    G = from_networkx(spark, nxg)
    _close(_vec(betweenness_centrality(G)), nx.betweenness_centrality(nxg))
    _close(
        _vec(betweenness_centrality(G, normalized=False)),
        nx.betweenness_centrality(nxg, normalized=False),
    )


def test_pivot_subset_matches_nx_subset(spark):
    nxg = nx.gnp_random_graph(45, 0.09, seed=31)
    G = from_networkx(spark, nxg)
    pivots = [0, 2, 5, 11, 17, 23]
    got = _vec(betweenness_centrality(G, sources=pivots, normalized=False))
    want = nx.betweenness_centrality_subset(
        nxg, sources=pivots, targets=list(nxg), normalized=False
    )
    _close(got, want)


def test_pivot_chunking_invariant(spark):
    nxg = nx.gnp_random_graph(30, 0.12, seed=41)
    G = from_networkx(spark, nxg)
    pivots = list(range(12))
    one = _vec(betweenness_centrality(G, sources=pivots, normalized=False))
    many = _vec(
        betweenness_centrality(G, sources=pivots, normalized=False, chunk_size=5)
    )
    _close(many, one)
