"""k-truss vs a python oracle (networkx has k_truss)."""

from __future__ import annotations

import networkx as nx

from graphblas_algorithms_spark import from_networkx
from graphblas_algorithms_spark.operators.ktruss import k_truss


def _edges(G):
    return {(r["src"], r["dst"]) for r in G.edges.select("src", "dst").collect()}


def test_ktruss_er(spark):
    nxg = nx.gnp_random_graph(60, 0.12, seed=42)
    G = from_networkx(spark, nxg)
    for k in (3, 4, 5):
        got = _edges(k_truss(G, k))
        want = {
            (min(u, v), max(u, v)) for u, v in nx.k_truss(nxg, k).edges
        }
        assert got == want, k


def test_ktruss_reference_shape(spark):
    # reference README example shape: k-truss keeps the dense core
    nxg = nx.complete_graph(5)
    nxg.add_edge(0, 10)  # pendant edge dies at k=3
    G = from_networkx(spark, nxg)
    got = _edges(k_truss(G, 5))
    assert got == {(min(u, v), max(u, v)) for u, v in nx.complete_graph(5).edges}
    # nodes: isolates dropped
    assert {r["id"] for r in k_truss(G, 5).nodes.collect()} == set(range(5))
