"""Long-tail clustering + shortest-path ops vs networkx oracles:
square_clustering, generalized_degree, clustering_directed,
bidirectional_shortest_path_length, floyd_warshall, google_matrix,
is_triad."""

from __future__ import annotations

import networkx as nx
import numpy as np
import pytest

from graphblas_algorithms_spark import from_networkx
from graphblas_algorithms_spark.operators.cluster_extra import (
    average_clustering_directed,
    clustering_directed,
    generalized_degree,
    square_clustering,
)
from graphblas_algorithms_spark.operators.linalg import google_matrix
from graphblas_algorithms_spark.operators.shortest_paths import (
    bidirectional_shortest_path_length,
    floyd_warshall,
    has_path,
)
from graphblas_algorithms_spark.operators.structure import is_triad


def test_square_clustering_er(spark):
    nxg = nx.gnp_random_graph(60, 0.1, seed=7)
    G = from_networkx(spark, nxg)
    got = {r["id"]: r["sq_clustering"] for r in square_clustering(G).collect()}
    want = nx.square_clustering(nxg)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-12), k


def test_square_clustering_chunked(spark):
    nxg = nx.gnp_random_graph(40, 0.15, seed=3)
    G = from_networkx(spark, nxg)
    ids = [0, 5, 17]
    got = {r["id"]: r["sq_clustering"] for r in square_clustering(G, node_ids=ids).collect()}
    want = nx.square_clustering(nxg, nodes=ids)
    assert set(got) == set(ids)
    for k in ids:
        assert got[k] == pytest.approx(want[k], abs=1e-12)


def test_generalized_degree(spark):
    nxg = nx.gnp_random_graph(50, 0.12, seed=11)
    G = from_networkx(spark, nxg)
    rows = generalized_degree(G).collect()
    got: dict[int, dict[int, int]] = {}
    for r in rows:
        got.setdefault(r["id"], {})[r["ntri"]] = r["n_edges"]
    want = nx.generalized_degree(nxg)
    for node, counter in want.items():
        expect = {t: c for t, c in counter.items() if c > 0}
        assert got.get(node, {}) == expect, node


def test_clustering_directed(spark):
    nxg = nx.gnp_random_graph(40, 0.12, seed=5, directed=True)
    G = from_networkx(spark, nxg)
    got = {r["id"]: r["clustering"] for r in clustering_directed(G).collect()}
    want = nx.clustering(nxg)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-12), k
    assert average_clustering_directed(G) == pytest.approx(
        nx.average_clustering(nxg), abs=1e-12
    )


def test_bidirectional_bfs(spark):
    nxg = nx.gnp_random_graph(80, 0.05, seed=19)
    G = from_networkx(spark, nxg)
    lengths = dict(nx.single_source_shortest_path_length(nxg, 0))
    for target in [1, 7, 42]:
        want = lengths.get(target)
        got = bidirectional_shortest_path_length(G, 0, target)
        assert got == want
        assert has_path(G, 0, target) == (want is not None)


def test_floyd_warshall(spark):
    nxg = nx.gnp_random_graph(25, 0.2, seed=23)
    for u, v in nxg.edges():
        nxg[u][v]["weight"] = 1.0 + ((u + v) % 4)
    G = from_networkx(spark, nxg)
    got = {(r["row"], r["col"]): r["value"] for r in floyd_warshall(G).collect()}
    want = nx.floyd_warshall(nxg)
    for i in want:
        for j, d in want[i].items():
            if d != float("inf"):
                assert got[(i, j)] == pytest.approx(d, abs=1e-9)


def test_google_matrix_and_pagerank_consistency(spark):
    nxg = nx.gnp_random_graph(20, 0.2, seed=2, directed=True)
    G = from_networkx(spark, nxg)
    rows = google_matrix(G, alpha=0.85).collect()
    n = G.n
    M = np.zeros((n, n))
    for r in rows:
        M[r["row"], r["col"]] = r["value"]
    # rows sum to 1 (stochastic) and the dominant left eigenvector is pagerank
    assert np.allclose(M.sum(axis=1), 1.0, atol=1e-9)
    want = nx.google_matrix(nxg, alpha=0.85, nodelist=sorted(nxg))
    assert np.allclose(M, np.asarray(want), atol=1e-9)


def test_google_matrix_partial_personalization(spark):
    # partial dicts keep every column (ADVICE r1: inner join on p/dw
    # dropped all columns outside the dict's key set)
    nxg = nx.gnp_random_graph(15, 0.2, seed=5, directed=True)
    nxg.add_node(14)  # ensure a dangling/isolated node exists
    G = from_networkx(spark, nxg)
    pers = {i: 1.0 + i for i in range(0, 15, 3)}
    dang = {1: 1.0, 4: 2.0}
    rows = google_matrix(G, alpha=0.85, personalization=pers, dangling=dang).collect()
    n = G.n
    M = np.zeros((n, n))
    for r in rows:
        M[r["row"], r["col"]] = r["value"]
    want = nx.google_matrix(
        nxg, alpha=0.85, personalization=pers, dangling=dang, nodelist=sorted(nxg)
    )
    assert np.allclose(M, np.asarray(want), atol=1e-9)


def test_is_triad(spark):
    t = nx.DiGraph([(0, 1), (1, 2)])
    G = from_networkx(spark, t)
    assert is_triad(G)
    t.add_edge(0, 0)
    G2 = from_networkx(spark, t)
    assert not is_triad(G2)
    G3 = from_networkx(spark, nx.DiGraph([(0, 1), (1, 2), (2, 3)]))
    assert not is_triad(G3)
