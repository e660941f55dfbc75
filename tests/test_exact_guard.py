"""Guards on the exact all-pivots centrality paths (r4, VERDICT r3 #5):
``sources=None`` on a graph larger than ``max_sources`` must refuse with
a pointer to the pivot-sampled estimator instead of silently scheduling
n BFS sweeps, mirroring pipeline/similarity's all-pairs guard.  The
wedge-budget gate on ``triadic_census`` (VERDICT r3 #3) is tested here
too: refusal above the budget, identical counts below it."""

from __future__ import annotations

import networkx as nx
import pytest

from graphblas_algorithms_spark import from_networkx
from graphblas_algorithms_spark.operators.betweenness import (
    betweenness_centrality,
    edge_betweenness_centrality,
)
from graphblas_algorithms_spark.operators.centrality import (
    closeness_centrality,
    harmonic_centrality,
)
from graphblas_algorithms_spark.operators.shortest_paths import EXACT_SOURCES_MAX
from graphblas_algorithms_spark.operators.triads import triadic_census


def test_exact_sources_guard_trips(spark):
    assert EXACT_SOURCES_MAX >= 10_000  # sandbox-scale graphs stay un-guarded
    nxg = nx.gnp_random_graph(30, 0.1, seed=1)
    G = from_networkx(spark, nxg)
    with pytest.raises(ValueError, match="betweenness_centrality"):
        betweenness_centrality(G, max_sources=10)
    with pytest.raises(ValueError, match="edge_betweenness_centrality"):
        edge_betweenness_centrality(G, max_sources=10)
    with pytest.raises(ValueError, match="max_sources"):
        closeness_centrality(G, max_sources=10)
    with pytest.raises(ValueError, match="max_sources"):
        harmonic_centrality(G, max_sources=10)


def test_exact_sources_guard_bypasses(spark):
    """Explicit pivots are never guarded; max_sources=None forces exact."""
    nxg = nx.gnp_random_graph(20, 0.15, seed=2)
    G = from_networkx(spark, nxg)
    # explicit pivot list larger than the cap passes through untouched
    got = betweenness_centrality(
        G, sources=[0, 1, 2], normalized=False, max_sources=2
    )
    assert got.count() == 20
    # None disables the guard on the exact path
    got = betweenness_centrality(G, max_sources=None)
    assert got.count() == 20


def test_triad_census_wedge_gate(spark):
    nxg = nx.gnp_random_graph(25, 0.2, seed=3, directed=True)
    G = from_networkx(spark, nxg)
    want = {r["triad_type"]: r["n"] for r in triadic_census(G).collect()}
    # networkx census as the value oracle (the gate must not change counts)
    nx_census = nx.triadic_census(nxg)
    assert want == {k: v for k, v in nx_census.items()}
    with pytest.raises(ValueError, match="max_wedges"):
        triadic_census(G, max_wedges=5)
    # disabled gate: identical counts
    got = {r["triad_type"]: r["n"] for r in triadic_census(G, max_wedges=None).collect()}
    assert got == want
