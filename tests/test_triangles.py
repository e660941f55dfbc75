"""Triangles / clustering vs networkx (exact counts) — fixtures from the
reference's own unit tests (FIXTURES.md F2.1/F2.2,
``algorithms/tests/test_cluster.py:7-53``)."""

from __future__ import annotations

import networkx as nx
import pytest

from graphblas_algorithms_spark import from_networkx
from graphblas_algorithms_spark.operators.triangles import (
    average_clustering,
    clustering,
    total_triangles,
    transitivity,
    transitivity_directed,
    triangles,
)


def test_k5_with_self_edges(spark):
    # reference algorithms/tests/test_cluster.py:7-17: K5 + all self-edges
    nxg = nx.complete_graph(5)
    for i in range(5):
        nxg.add_edge(i, i)
    G = from_networkx(spark, nxg)
    got = {r["id"]: r["triangles"] for r in triangles(G).collect()}
    assert got == {i: 6 for i in range(5)}
    assert total_triangles(G) == 10
    assert transitivity(G) == 1.0
    cl = {r["id"]: r["clustering"] for r in clustering(G).collect()}
    assert cl == {i: 1.0 for i in range(5)}


def test_er_triangles(spark):
    nxg = nx.gnp_random_graph(120, 0.06, seed=42)
    G = from_networkx(spark, nxg)
    got = {r["id"]: r["triangles"] for r in triangles(G).collect()}
    want = nx.triangles(nxg)
    assert got == want
    assert total_triangles(G) == sum(want.values()) // 3
    assert transitivity(G) == pytest.approx(nx.transitivity(nxg), abs=1e-12)
    cl = {r["id"]: r["clustering"] for r in clustering(G).collect()}
    want_cl = nx.clustering(nxg)
    for k in want_cl:
        assert cl[k] == pytest.approx(want_cl[k], abs=1e-12)
    assert average_clustering(G) == pytest.approx(nx.average_clustering(nxg), abs=1e-12)


def test_directed_transitivity(spark):
    # reference nxapi/tests/test_cluster.py:6-12: complete digraph minus
    # (1->2),(2->3), plus isolated node 5
    nxg = nx.complete_graph(5, nx.DiGraph())
    nxg.remove_edge(1, 2)
    nxg.remove_edge(2, 3)
    nxg.add_node(5)
    G = from_networkx(spark, nxg)
    assert transitivity_directed(G) == pytest.approx(nx.transitivity(nxg), abs=1e-12)


def test_star_no_triangles(spark):
    nxg = nx.star_graph(20)
    G = from_networkx(spark, nxg)
    assert total_triangles(G) == 0
    assert average_clustering(G, count_zeros=True) == 0.0


def test_four_cliques_vs_networkx(spark):
    """Per-node and total 4-clique counts vs brute enumeration; each
    clique emitted exactly once; K5 sanity (C(5,4)=5, each node in 4)."""
    from itertools import combinations

    from graphblas_algorithms_spark.operators.triangles import (
        four_clique_list,
        four_cliques,
        total_four_cliques,
    )

    nxg = nx.gnp_random_graph(30, 0.3, seed=11)
    G = from_networkx(spark, nxg)
    want = {n: 0 for n in nxg.nodes}
    total = 0
    adj = {n: set(nxg[n]) for n in nxg.nodes}
    for quad in combinations(sorted(nxg.nodes), 4):
        if all(v in adj[u] for u, v in combinations(quad, 2)):
            total += 1
            for n in quad:
                want[n] += 1
    rows = four_clique_list(G).collect()
    assert len(rows) == total
    assert len({tuple(sorted((r["a"], r["b"], r["c"], r["d"]))) for r in rows}) == total
    got = {r["id"]: r["cliques4"] for r in four_cliques(G).collect()}
    assert got == want
    assert total_four_cliques(G) == total

    k5 = from_networkx(spark, nx.complete_graph(5))
    assert total_four_cliques(k5) == 5
    assert all(r["cliques4"] == 4 for r in four_cliques(k5).collect())
