"""Degree/eigenvector/Katz centrality + HITS vs oracles."""

from __future__ import annotations

import networkx as nx
import pytest

from graphblas_algorithms_spark import from_networkx
from graphblas_algorithms_spark.operators.centrality import (
    degree_centrality,
    eigenvector_centrality,
    hits,
    in_degree_centrality,
    katz_centrality,
    out_degree_centrality,
)

from .oracles import eigenvector_oracle, hits_oracle, katz_oracle


def _dc(df, col="centrality"):
    return {r["id"]: r[col] for r in df.collect()}


def test_degree_centrality(spark):
    nxg = nx.gnp_random_graph(80, 0.05, seed=1)
    nxg.add_edge(0, 0)  # self-loop counts twice in nx.degree_centrality
    G = from_networkx(spark, nxg)
    got = _dc(degree_centrality(G))
    want = nx.degree_centrality(nxg)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-12)


def test_in_out_degree_centrality(spark):
    nxg = nx.gnp_random_graph(60, 0.06, seed=2, directed=True)
    G = from_networkx(spark, nxg)
    got_in, got_out = _dc(in_degree_centrality(G)), _dc(out_degree_centrality(G))
    want_in, want_out = nx.in_degree_centrality(nxg), nx.out_degree_centrality(nxg)
    for k in want_in:
        assert got_in[k] == pytest.approx(want_in[k], abs=1e-12)
        assert got_out[k] == pytest.approx(want_out[k], abs=1e-12)


def test_eigenvector(spark):
    nxg = nx.gnp_random_graph(60, 0.1, seed=3)
    G = from_networkx(spark, nxg)
    got = _dc(eigenvector_centrality(G, tol=1e-6))
    want = eigenvector_oracle(nxg, tol=1e-6)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-5)


def test_katz(spark):
    nxg = nx.gnp_random_graph(60, 0.06, seed=4, directed=True)
    G = from_networkx(spark, nxg)
    got = _dc(katz_centrality(G, alpha=0.05))
    want = katz_oracle(nxg, alpha=0.05)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-5)


def test_hits(spark):
    nxg = nx.gnp_random_graph(50, 0.08, seed=5, directed=True)
    G = from_networkx(spark, nxg)
    h_df, a_df = hits(G, tol=1e-8)
    got_h = {r["id"]: r["hub"] for r in h_df.collect()}
    got_a = {r["id"]: r["authority"] for r in a_df.collect()}
    want_h, want_a = hits_oracle(nxg, tol=1e-8)
    for k in want_h:
        assert got_h[k] == pytest.approx(want_h[k], abs=1e-5)
        assert got_a[k] == pytest.approx(want_a[k], abs=1e-5)
