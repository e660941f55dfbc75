"""Triad census: CODE_NAME provenance (regenerated from networkx) and
full-census equality vs nx.triadic_census on random digraphs."""

from __future__ import annotations

import networkx as nx

from graphblas_algorithms_spark import from_networkx
from graphblas_algorithms_spark.operators.triads import (
    CODE_NAME,
    TRIAD_TYPES,
    triadic_census,
)


def test_code_name_table_matches_networkx():
    """Regenerate the 64-entry code->class table from nx and compare."""
    got = []
    for code in range(64):
        g = nx.DiGraph()
        g.add_nodes_from([0, 1, 2])
        if code & 32:
            g.add_edge(0, 1)
        if code & 16:
            g.add_edge(1, 0)
        if code & 8:
            g.add_edge(0, 2)
        if code & 4:
            g.add_edge(2, 0)
        if code & 2:
            g.add_edge(1, 2)
        if code & 1:
            g.add_edge(2, 1)
        cen = nx.triadic_census(g)
        (nm,) = [k for k, v in cen.items() if v == 1]
        got.append(nm)
    assert tuple(got) == CODE_NAME


def _census(spark, nxg):
    G = from_networkx(spark, nxg)
    out = {r["triad_type"]: r["n"] for r in triadic_census(G).collect()}
    assert set(out) == set(TRIAD_TYPES)  # all 16 classes, zeros included
    return out


def test_census_matches_networkx_random(spark):
    for seed, p in [(3, 0.08), (11, 0.2)]:
        nxg = nx.gnp_random_graph(40, p, seed=seed, directed=True)
        assert _census(spark, nxg) == nx.triadic_census(nxg)


def test_census_matches_networkx_mutual_heavy(spark):
    # force many mutual dyads (102/111/201/300 classes non-trivial)
    nxg = nx.gnp_random_graph(30, 0.15, seed=7, directed=True)
    nxg.add_edges_from([(v, u) for u, v in list(nxg.edges())[::2]])
    assert _census(spark, nxg) == nx.triadic_census(nxg)


def test_census_edge_cases(spark):
    # empty graph: everything is 003
    empty = nx.empty_graph(6, create_using=nx.DiGraph)
    out = _census(spark, empty)
    assert out["003"] == 20 and sum(out.values()) == 20
    # a single directed triangle
    tri = nx.DiGraph([(0, 1), (1, 2), (2, 0)])
    out = _census(spark, tri)
    assert out["030C"] == 1 and sum(out.values()) == 1
