"""Property-based differential tests (hypothesis) — random small graphs
vs networkx/numpy oracles.

The deterministic suites pin known shapes; these sweep the edge-case
space the reference's own pytest suite reaches through parametrization
(empty graphs, self-loops, isolated nodes, duplicate/reciprocal edges).
``derandomize=True`` keeps driver runs reproducible — a property test
that can fail only sometimes is not a gate.  Example counts are small on
purpose: each example is a real Spark job and the property space here is
tiny (node ids 0..7), so ~10 examples cover it far past the point of
diminishing returns.
"""

from __future__ import annotations

import networkx as nx
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from graphblas_algorithms_spark import from_networkx

SETTINGS = dict(
    max_examples=10,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.too_slow],
)

# node universe 0..7: small enough that 10 examples sweep self-loops,
# isolated nodes, reciprocal pairs and multi-component shapes
edge_lists = st.lists(
    st.tuples(st.integers(0, 7), st.integers(0, 7)), min_size=0, max_size=18
)


def _ugraph(edges):
    g = nx.Graph()
    g.add_nodes_from(range(8))
    g.add_edges_from(edges)
    return g


def _digraph(edges):
    g = nx.DiGraph()
    g.add_nodes_from(range(8))
    g.add_edges_from(edges)
    return g


@given(edges=edge_lists)
@settings(**SETTINGS)
def test_prop_components(spark, edges):
    from graphblas_algorithms_spark.operators.components import connected_components

    nxg = _ugraph(edges)
    got = {
        r["id"]: r["component"]
        for r in connected_components(from_networkx(spark, nxg)).collect()
    }
    want = {}
    for comp in nx.connected_components(nxg):
        m = min(comp)
        want.update({u: m for u in comp})
    assert got == want


@given(edges=edge_lists)
@settings(**SETTINGS)
def test_prop_components_star(spark, edges):
    """Star contraction agrees with networkx (and hence with min-label)
    on arbitrary random edge lists, isolates included."""
    from graphblas_algorithms_spark.operators.components import connected_components

    nxg = _ugraph(edges)
    got = {
        r["id"]: r["component"]
        for r in connected_components(
            from_networkx(spark, nxg), method="star"
        ).collect()
    }
    want = {}
    for comp in nx.connected_components(nxg):
        m = min(comp)
        want.update({u: m for u in comp})
    assert got == want


@given(edges=edge_lists)
@settings(**SETTINGS)
def test_prop_scc(spark, edges):
    from graphblas_algorithms_spark.operators.components import (
        strongly_connected_components,
    )

    nxg = _digraph(edges)
    got = {
        r["id"]: r["component"]
        for r in strongly_connected_components(from_networkx(spark, nxg)).collect()
    }
    want = {}
    for comp in nx.strongly_connected_components(nxg):
        m = min(comp)
        want.update({u: m for u in comp})
    assert got == want


@given(edges=edge_lists)
@settings(**{**SETTINGS, "max_examples": 6})
def test_prop_pagerank_fixed_iters(spark, edges):
    """Fixed-iteration trajectories are EXACTLY reproducible: the Spark
    kernel and the dense numpy oracle run the same power iteration, so
    agreement is to float noise, not 1e-6 — and the vector sums to 1."""
    from graphblas_algorithms_spark.operators.pagerank import pagerank

    from .oracles import pagerank_oracle

    nxg = _digraph(edges)
    got = {
        r["id"]: r["rank"]
        for r in pagerank(from_networkx(spark, nxg), fixed_iters=4).collect()
    }
    want = pagerank_oracle(nxg, fixed_iters=4)
    assert set(got) == set(want)
    assert abs(sum(got.values()) - 1.0) < 1e-9
    for u in want:
        assert got[u] == pytest.approx(want[u], abs=1e-12)


@given(e1=edge_lists, e2=edge_lists)
@settings(**SETTINGS)
def test_prop_setops_identities(spark, e1, e2):
    """Setops vs Python set algebra on canonical undirected edge sets —
    including symmetric_difference == union minus intersection."""
    from graphblas_algorithms_spark.operators.setops import (
        difference,
        intersection,
        symmetric_difference,
        union,
    )

    G = from_networkx(spark, _ugraph(e1))
    H = from_networkx(spark, _ugraph(e2))
    s1 = {tuple(sorted(e)) for e in e1}
    s2 = {tuple(sorted(e)) for e in e2}

    def edgeset(K):
        return {(r["src"], r["dst"]) for r in K.edges.select("src", "dst").collect()}

    assert edgeset(union(G, H)) == s1 | s2
    assert edgeset(intersection(G, H)) == s1 & s2
    assert edgeset(difference(G, H)) == s1 - s2
    sym = edgeset(symmetric_difference(G, H))
    assert sym == s1 ^ s2
    assert sym == (s1 | s2) - (s1 & s2)


@given(edges=edge_lists)
@settings(**SETTINGS)
def test_prop_triangles(spark, edges):
    from graphblas_algorithms_spark.operators.triangles import triangles

    # networkx triangles() ignores self-loops; match by stripping them
    nxg = _ugraph([(u, v) for (u, v) in edges if u != v])
    got = {
        r["id"]: r["triangles"]
        for r in triangles(from_networkx(spark, nxg)).collect()
    }
    assert got == dict(nx.triangles(nxg))
