"""Eulerian predicates + dominating set differential tests."""

from __future__ import annotations

import networkx as nx

from graphblas_algorithms_spark import from_networkx
from graphblas_algorithms_spark.operators.mis import dominating_set
from graphblas_algorithms_spark.operators.structure import (
    has_eulerian_path,
    is_eulerian,
)


def _check(spark, nxg):
    G = from_networkx(spark, nxg)
    assert is_eulerian(G) == nx.is_eulerian(nxg), f"is_eulerian {nxg}"
    assert has_eulerian_path(G) == nx.has_eulerian_path(nxg), f"has_path {nxg}"


def test_eulerian_undirected_cases(spark):
    _check(spark, nx.cycle_graph(7))            # circuit
    _check(spark, nx.path_graph(6))             # path only (2 odd)
    _check(spark, nx.complete_graph(5))         # circuit (all even)
    _check(spark, nx.complete_graph(4))         # 4 odd -> neither
    _check(spark, nx.petersen_graph())          # 3-regular -> neither
    g = nx.cycle_graph(5)
    g.add_node(99)                              # isolate disconnects (nx)
    _check(spark, g)
    g2 = nx.union(nx.cycle_graph(3), nx.relabel_nodes(nx.cycle_graph(3), lambda i: i + 10))
    _check(spark, g2)                           # two components


def test_eulerian_directed_cases(spark):
    _check(spark, nx.DiGraph({0: [3], 1: [2], 2: [3], 3: [0, 1]}))  # nx doc: True
    _check(spark, nx.DiGraph([(0, 1), (1, 2), (2, 0)]))             # circuit
    _check(spark, nx.DiGraph([(0, 1), (1, 2)]))                     # path only
    _check(spark, nx.DiGraph([(0, 1), (1, 2), (2, 0), (0, 2)]))     # one +1/-1
    _check(spark, nx.DiGraph([(0, 1), (2, 3)]))                     # disconnected


def test_eulerian_isolates_disconnect(spark):
    """nx 3.6.x: isolated vertices disqualify both the circuit and the
    path, directed or not (ADVICE r3 follow-up pinned differentially)."""
    g = nx.DiGraph([(0, 1), (1, 2), (2, 0)]); g.add_node(5)
    _check(spark, g)
    g = nx.DiGraph([(0, 1), (1, 2)]); g.add_node(7)
    _check(spark, g)
    g = nx.Graph([(0, 1), (1, 2)]); g.add_node(9)
    _check(spark, g)


def test_eulerian_self_loop_parity(spark):
    g = nx.Graph([(0, 1), (1, 2), (2, 0)])
    g.add_edge(1, 1)  # self-loop adds 2 to degree: still eulerian in nx
    _check(spark, g)


def test_dominating_set_dominates(spark):
    for seed, p in [(3, 0.05), (8, 0.12)]:
        nxg = nx.gnp_random_graph(70, p, seed=seed)
        G = from_networkx(spark, nxg)
        s = {r["id"] for r in dominating_set(G).collect()}
        assert nx.is_dominating_set(nxg, s), f"seed={seed}"
