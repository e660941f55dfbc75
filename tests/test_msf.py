"""Borůvka minimum spanning forest vs networkx."""

from __future__ import annotations

import networkx as nx

from graphblas_algorithms_spark import from_networkx
from graphblas_algorithms_spark.operators.msf import minimum_spanning_forest


def _edges(df):
    return {(r["src"], r["dst"]) for r in df.collect()}


def test_msf_unique_weights_matches_networkx(spark):
    nxg = nx.gnp_random_graph(60, 0.08, seed=11)
    for i, (u, v) in enumerate(sorted(nxg.edges)):
        nxg[u][v]["weight"] = 1.0 + ((u * 131 + v * 17 + i) % 997) / 997.0 + i * 1e-6
    G = from_networkx(spark, nxg)
    got = _edges(minimum_spanning_forest(G))
    want = {
        tuple(sorted((u, v)))
        for u, v, _ in nx.minimum_spanning_edges(nxg, algorithm="kruskal")
    }
    assert got == want


def test_msf_tied_weights_same_total(spark):
    nxg = nx.gnp_random_graph(50, 0.1, seed=23)
    for u, v in nxg.edges:
        nxg[u][v]["weight"] = float(1 + ((u + v) % 3))  # many ties
    G = from_networkx(spark, nxg)
    rows = minimum_spanning_forest(G).collect()
    got_total = sum(r["weight"] for r in rows)
    want_total = sum(
        d["weight"] for _, _, d in nx.minimum_spanning_tree(nxg).edges(data=True)
    )
    assert abs(got_total - want_total) < 1e-9
    # forest: acyclic with n - #components edges
    ncomp = nx.number_connected_components(nxg)
    assert len(rows) == nxg.number_of_nodes() - ncomp
    # every forest edge is a real graph edge
    for r in rows:
        assert nxg.has_edge(r["src"], r["dst"])


def test_msf_unweighted_forest_shape(spark):
    nxg = nx.gnp_random_graph(40, 0.05, seed=3)  # likely disconnected
    nxg.add_node(900)
    G = from_networkx(spark, nxg)
    rows = minimum_spanning_forest(G).collect()
    ncomp = nx.number_connected_components(nxg)
    assert len(rows) == nxg.number_of_nodes() - ncomp
    f = nx.Graph((r["src"], r["dst"]) for r in rows)
    assert nx.is_forest(f)
    # spanning: forest + isolates reproduce the component partition
    for comp in nx.connected_components(nxg):
        if len(comp) > 1:
            assert any(u in comp for u in f.nodes)


def test_msf_deterministic(spark):
    nxg = nx.gnp_random_graph(30, 0.15, seed=7)
    for u, v in nxg.edges:
        nxg[u][v]["weight"] = float(1 + ((u * v) % 4))
    G = from_networkx(spark, nxg)
    a = _edges(minimum_spanning_forest(G))
    b = _edges(minimum_spanning_forest(G))
    assert a == b
