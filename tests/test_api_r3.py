"""KeyedGraph wrappers added in round 3: smoke + semantics checks."""

from __future__ import annotations

import networkx as nx
import pytest
from pyspark.sql import functions as F

from graphblas_algorithms_spark.api import KeyedGraph


def _keyed_edges(spark, pairs):
    return spark.createDataFrame(
        [(f"n{a}", f"n{b}") for a, b in pairs], "u string, v string"
    )


@pytest.fixture(scope="module")
def kg(spark):
    # two triangles bridged by a path + a pendant
    pairs = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 5), (5, 6), (6, 4), (6, 7)]
    return KeyedGraph(_keyed_edges(spark, pairs), "u", "v", directed=False)


def test_bridges_and_2ecc_keyed(kg):
    br = {(r["src_key"], r["dst_key"]) for r in kg.bridges().collect()}
    assert {tuple(sorted(e)) for e in br} == {("n2", "n3"), ("n3", "n4"), ("n6", "n7")}
    assert kg.has_bridges()
    comps = {}
    for r in kg.two_edge_components().collect():
        comps.setdefault(r["component"], set()).add(r["key"])
    assert {frozenset(c) for c in comps.values()} == {
        frozenset({"n0", "n1", "n2"}),
        frozenset({"n4", "n5", "n6"}),
        frozenset({"n3"}),
        frozenset({"n7"}),
    }


def test_truss_and_edge_betweenness_keyed(kg):
    tr = {
        tuple(sorted((r["src_key"], r["dst_key"]))): r["trussness"]
        for r in kg.truss_decomposition().collect()
    }
    assert tr[("n0", "n1")] == 3  # triangle edge
    assert tr[("n2", "n3")] == 2  # bridge
    eb = {
        tuple(sorted((r["src_key"], r["dst_key"]))): r["betweenness"]
        for r in kg.edge_betweenness_centrality(normalized=False).collect()
    }
    # (3,4) carries the 4x4 cross pairs (vs 3x5 on (2,3)): the max
    assert eb[("n3", "n4")] == max(eb.values())


def test_hyperball_and_degree_stats_keyed(kg):
    hb = {r["key"]: r["harmonic"] for r in kg.hyperball_harmonic(h=6, k=32).collect()}
    assert len(hb) == 8 and all(v > 0 for v in hb.values())
    hist = {r["degree"]: r["n_nodes"] for r in kg.degree_histogram().collect()}
    assert sum(hist.values()) == 8
    alpha = kg.powerlaw_alpha(d_min=1)
    assert alpha["n_tail"] == 8


def test_dag_and_eulerian_keyed(spark):
    dag = KeyedGraph(
        _keyed_edges(spark, [(0, 1), (1, 2), (0, 2), (2, 3)]), "u", "v", directed=True
    )
    assert dag.is_dag()
    gens = {r["key"]: r["layer"] for r in dag.topological_generations().collect()}
    assert gens == {"n0": 0, "n1": 1, "n2": 2, "n3": 3}
    assert dag.dag_longest_path_length() == 3
    cyc = KeyedGraph(
        _keyed_edges(spark, [(0, 1), (1, 0)]), "u", "v", directed=True
    )
    assert not cyc.is_dag()
    assert cyc.is_eulerian()  # 2-cycle: balanced + strongly connected


def test_dominating_and_spam_mass_keyed(spark, kg):
    dom = {r["key"] for r in kg.dominating_set().collect()}
    # every node adjacent to (or in) the set
    pairs = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 5), (5, 6), (6, 4), (6, 7)]
    nxg = nx.Graph((f"n{a}", f"n{b}") for a, b in pairs)
    assert nx.is_dominating_set(nxg, dom)
    dg = KeyedGraph(
        _keyed_edges(spark, [(0, 1), (1, 2), (2, 0), (5, 6), (6, 5), (0, 5)]),
        "u", "v", directed=True,
    )
    sm = {r["key"]: r["spam_mass"] for r in dg.spam_mass(["n0"], fixed_iters=15).collect()}
    assert sm["n6"] < 1.0  # reachable from the trusted seed
