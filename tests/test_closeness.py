"""Harmonic / closeness centrality differential tests vs networkx."""

from __future__ import annotations

import math

import networkx as nx

from graphblas_algorithms_spark import from_networkx
from graphblas_algorithms_spark.operators.centrality import (
    closeness_centrality,
    harmonic_centrality,
)


def _vec(df, col):
    return {r["id"]: r[col] for r in df.collect()}


def test_harmonic_all_sources_matches_networkx(spark):
    nxg = nx.gnp_random_graph(60, 0.07, seed=11)
    nxg.add_node(999)  # isolate -> 0.0
    G = from_networkx(spark, nxg)
    got = _vec(harmonic_centrality(G), "harmonic")
    want = nx.harmonic_centrality(nxg)
    assert set(got) == set(want)
    for k in want:
        assert math.isclose(got[k], want[k], rel_tol=1e-9), k


def test_harmonic_sampled_sources(spark):
    nxg = nx.gnp_random_graph(50, 0.1, seed=5)
    G = from_networkx(spark, nxg)
    pivots = [0, 3, 7, 11, 19]
    got = _vec(harmonic_centrality(G, sources=pivots), "harmonic")
    # nx `sources=` restricts the s-sum the same way
    want = nx.harmonic_centrality(nxg, sources=pivots)
    for k in want:
        assert math.isclose(got[k], want[k], rel_tol=1e-9, abs_tol=1e-12), k


def test_closeness_undirected_matches_networkx(spark):
    nxg = nx.gnp_random_graph(55, 0.08, seed=9)
    nxg.add_node(500)
    G = from_networkx(spark, nxg)
    got = _vec(closeness_centrality(G), "closeness")
    want = nx.closeness_centrality(nxg)
    for k in want:
        assert math.isclose(got[k], want[k], rel_tol=1e-9, abs_tol=1e-12), k


def test_closeness_directed_incoming(spark):
    nxg = nx.gnp_random_graph(40, 0.09, seed=4, directed=True)
    G = from_networkx(spark, nxg)
    got = _vec(closeness_centrality(G), "closeness")
    want = nx.closeness_centrality(nxg)  # nx uses incoming distances
    for k in want:
        assert math.isclose(got[k], want[k], rel_tol=1e-9, abs_tol=1e-12), k


def test_closeness_not_wf_improved(spark):
    nxg = nx.gnp_random_graph(30, 0.1, seed=2)
    G = from_networkx(spark, nxg)
    got = _vec(closeness_centrality(G, wf_improved=False), "closeness")
    want = nx.closeness_centrality(nxg, wf_improved=False)
    for k in want:
        assert math.isclose(got[k], want[k], rel_tol=1e-9, abs_tol=1e-12), k
