"""Distance measures: exact ecc/diameter/radius/center/periphery vs
networkx, double-sweep bound sandwich, disconnected guard."""

from __future__ import annotations

import networkx as nx
import pytest

from graphblas_algorithms_spark import from_networkx
from graphblas_algorithms_spark.operators.diameter import (
    center,
    diameter,
    double_sweep,
    eccentricity,
    periphery,
    radius,
)


def _connected(n, p, seed):
    nxg = nx.gnp_random_graph(n, p, seed=seed)
    comp = max(nx.connected_components(nxg), key=len)
    return nx.convert_node_labels_to_integers(nxg.subgraph(comp))


def test_exact_measures_match_networkx(spark):
    nxg = _connected(60, 0.06, 3)
    G = from_networkx(spark, nxg)
    want = nx.eccentricity(nxg)
    got = {r["id"]: r["ecc"] for r in eccentricity(G).collect()}
    assert got == want
    assert diameter(G) == nx.diameter(nxg)
    assert radius(G) == nx.radius(nxg)
    assert {r["id"] for r in center(G).collect()} == set(nx.center(nxg))
    assert {r["id"] for r in periphery(G).collect()} == set(nx.periphery(nxg))


def test_eccentricity_raises_on_disconnected(spark):
    nxg = nx.Graph([(0, 1), (2, 3)])
    G = from_networkx(spark, nxg)
    with pytest.raises(ValueError, match="disconnected"):
        eccentricity(G).collect()


def test_double_sweep_sandwich(spark):
    # ecc(seed) <= diameter_lb <= true diameter; path/cycle/tree are
    # exactly tight for the double sweep
    for nxg, tight in [
        (_connected(80, 0.05, 7), False),
        (nx.path_graph(12), True),
        (nx.cycle_graph(16), True),
        (nx.balanced_tree(2, 4), True),
    ]:
        nxg = nx.convert_node_labels_to_integers(nxg)
        G = from_networkx(spark, nxg)
        row = double_sweep(G).collect()[0]
        true_d = nx.diameter(nxg)
        assert row["ecc_seed"] <= row["diameter_lb"] <= true_d
        # the sweep's second BFS starts at a true farthest-from-seed node
        assert (
            nx.shortest_path_length(nxg, row["seed"], row["far_node"])
            == row["ecc_seed"]
        )
        if tight:
            assert row["diameter_lb"] == true_d


def test_double_sweep_pinned_seed_component(spark):
    # seed pins the component: the sweep never leaves it
    nxg = nx.Graph([(0, 1), (1, 2), (10, 11)])
    G = from_networkx(spark, nxg)
    row = double_sweep(G, seed=10).collect()[0]
    assert row["diameter_lb"] == 1
    assert {row["far_node"], row["periphery_node"]} <= {10, 11}
