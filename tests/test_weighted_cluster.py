"""Differential tests vs networkx for the round-2 long-tail additions:
weighted triangles/clustering (reference cluster.py:44-64,94-98 weighted=),
node-local single_* fast paths (cluster.py:24-41,129-173,285-310), weighted
compose (operators/binary.py:112-147), and directed_modularity_matrix
(linalg/modularitymatrix.py:17-37)."""

from __future__ import annotations

import networkx as nx
import numpy as np
import pytest

from graphblas_algorithms_spark import from_networkx
from graphblas_algorithms_spark.operators.cluster_extra import (
    clustering_directed,
    single_clustering_directed,
    single_generalized_degree,
    single_square_clustering,
)
from graphblas_algorithms_spark.operators.linalg import directed_modularity_matrix
from graphblas_algorithms_spark.operators.setops import compose
from graphblas_algorithms_spark.operators.triangles import (
    clustering,
    single_clustering,
    single_triangle,
    triangles,
)


def _weighted_er(n=40, p=0.15, seed=4, directed=False):
    nxg = nx.gnp_random_graph(n, p, seed=seed, directed=directed)
    for i, (u, v) in enumerate(nxg.edges()):
        nxg[u][v]["weight"] = 0.5 + ((u * 7 + v * 3 + i) % 10) / 4.0
    return nxg


def test_weighted_triangles_vs_networkx(spark):
    # networkx has no public weighted triangle count; derive it from
    # nx.clustering(weight=): tri_w = c * d*(d-1) / 2
    nxg = _weighted_er()
    G = from_networkx(spark, nxg)
    got = {r["id"]: r["triangles"] for r in triangles(G, weighted=True).collect()}
    cw = nx.clustering(nxg, weight="weight")
    for u in nxg.nodes:
        d = nxg.degree(u)
        want = cw[u] * d * (d - 1) / 2.0
        assert got[u] == pytest.approx(want, abs=1e-9), f"node {u}"


def test_weighted_clustering_vs_networkx(spark):
    nxg = _weighted_er(seed=9)
    G = from_networkx(spark, nxg)
    got = {r["id"]: r["clustering"] for r in clustering(G, weighted=True).collect()}
    want = nx.clustering(nxg, weight="weight")
    for u in nxg.nodes:
        assert got[u] == pytest.approx(want[u], abs=1e-9), f"node {u}"


def test_weighted_clustering_unweighted_graph_matches_counts(spark):
    # iso semantics: weighted=True on a weightless graph == plain counts
    nxg = nx.gnp_random_graph(30, 0.2, seed=1)
    G = from_networkx(spark, nxg)
    got = {r["id"]: r["clustering"] for r in clustering(G, weighted=True).collect()}
    want = nx.clustering(nxg)
    for u in nxg.nodes:
        assert got[u] == pytest.approx(want[u], abs=1e-9)


def test_single_triangle_and_clustering(spark):
    nxg = _weighted_er(seed=13)
    G = from_networkx(spark, nxg)
    tri = nx.triangles(nxg)
    cw = nx.clustering(nxg, weight="weight")
    c = nx.clustering(nxg)
    for node in [0, 3, 17]:
        assert single_triangle(G, node) == pytest.approx(tri[node])
        assert single_clustering(G, node) == pytest.approx(c[node], abs=1e-9)
        assert single_clustering(G, node, weighted=True) == pytest.approx(
            cw[node], abs=1e-9
        )


def test_directed_clustering_weighted(spark):
    nxg = _weighted_er(n=30, p=0.12, seed=21, directed=True)
    G = from_networkx(spark, nxg)
    got = {
        r["id"]: r["clustering"]
        for r in clustering_directed(G, weighted=True).collect()
    }
    want = nx.clustering(nxg, weight="weight")
    for u in nxg.nodes:
        assert got[u] == pytest.approx(want[u], abs=1e-9), f"node {u}"


def test_single_clustering_directed(spark):
    nxg = _weighted_er(n=30, p=0.12, seed=8, directed=True)
    G = from_networkx(spark, nxg)
    want_u = nx.clustering(nxg)
    want_w = nx.clustering(nxg, weight="weight")
    for node in [0, 5, 11]:
        assert single_clustering_directed(G, node) == pytest.approx(
            want_u[node], abs=1e-9
        )
        assert single_clustering_directed(G, node, weighted=True) == pytest.approx(
            want_w[node], abs=1e-9
        )


def test_single_generalized_degree(spark):
    nxg = nx.gnp_random_graph(30, 0.2, seed=3)
    G = from_networkx(spark, nxg)
    for node in [0, 7]:
        got = {
            r["ntri"]: r["n_edges"]
            for r in single_generalized_degree(G, node).collect()
        }
        want = dict(nx.generalized_degree(nxg, node))
        assert got == want, f"node {node}: {got} vs {want}"


def test_single_square_clustering(spark):
    nxg = nx.gnp_random_graph(25, 0.2, seed=6)
    G = from_networkx(spark, nxg)
    want = nx.square_clustering(nxg)
    for node in [0, 4, 12]:
        assert single_square_clustering(G, node) == pytest.approx(
            want[node], abs=1e-9
        )


def test_compose_right_bias_weights(spark):
    g = nx.Graph()
    g.add_edge(0, 1, weight=1.0)
    g.add_edge(1, 2, weight=2.0)
    g.add_edge(2, 3, weight=3.0)
    h = nx.Graph()
    h.add_edge(1, 2, weight=9.0)  # overlap: H wins
    h.add_edge(3, 4, weight=4.0)  # new edge + new node
    G = from_networkx(spark, g)
    H = from_networkx(spark, h)
    K = compose(G, H)
    got = {(r["src"], r["dst"]): r["weight"] for r in K.edges.collect()}
    want_nx = nx.compose(g, h)
    want = {
        (min(u, v), max(u, v)): d["weight"] for u, v, d in want_nx.edges(data=True)
    }
    assert got == want
    assert {r["id"] for r in K.nodes.collect()} == set(want_nx.nodes)


def test_directed_modularity_matrix(spark):
    nxg = nx.gnp_random_graph(15, 0.25, seed=2, directed=True)
    G = from_networkx(spark, nxg)
    rows = directed_modularity_matrix(G, materialize=True).collect()
    n = G.n
    M = np.zeros((n, n))
    for r in rows:
        M[r["row"], r["col"]] = r["value"]
    # nx.directed_modularity_matrix needs scipy (not installed) — same math
    # in numpy: B = A - outer(k_out, k_in)/m on the 0/1 adjacency
    A = nx.to_numpy_array(nxg, nodelist=sorted(nxg), weight=None)
    k_out = A.sum(axis=1)
    k_in = A.sum(axis=0)
    want = A - np.outer(k_out, k_in) / A.sum()
    assert np.allclose(M, want, atol=1e-9)
