"""Graph mixing/community metrics vs networkx (loopless graphs)."""

from __future__ import annotations

import networkx as nx
import pytest
from networkx.algorithms.community import modularity as nx_modularity

from graphblas_algorithms_spark import from_networkx
from graphblas_algorithms_spark.operators.metrics import (
    average_neighbor_degree,
    degree_assortativity_coefficient,
    density,
    modularity,
    modularity_by_community,
    rich_club_coefficient,
)

pytestmark = pytest.mark.usefixtures("spark")


def _graphs():
    return [
        nx.Graph([(0, 1), (0, 2), (0, 3), (1, 2), (3, 4), (4, 5), (5, 0)]),
        nx.karate_club_graph(),
        nx.path_graph(7),
        nx.barbell_graph(4, 2),
    ]


def test_assortativity_undirected(spark):
    for nxg in _graphs():
        G = from_networkx(spark, nxg)
        want = nx.degree_assortativity_coefficient(nxg)
        got = degree_assortativity_coefficient(G)
        assert got == pytest.approx(want, abs=1e-9), nxg


def test_assortativity_directed(spark):
    nxg = nx.DiGraph([(0, 1), (1, 2), (2, 0), (0, 3), (3, 1), (3, 2)])
    G = from_networkx(spark, nxg)
    assert degree_assortativity_coefficient(G) == pytest.approx(
        nx.degree_assortativity_coefficient(nxg), abs=1e-9
    )
    assert degree_assortativity_coefficient(G, x="in", y="out") == pytest.approx(
        nx.degree_assortativity_coefficient(nxg, x="in", y="out"), abs=1e-9
    )


def test_assortativity_regular_raises(spark):
    G = from_networkx(spark, nx.cycle_graph(5))  # all degrees 2 -> undefined
    with pytest.raises(ValueError):
        degree_assortativity_coefficient(G)


def test_average_neighbor_degree_undirected(spark):
    for nxg in _graphs():
        G = from_networkx(spark, nxg)
        want = nx.average_neighbor_degree(nxg)
        got = {
            r["id"]: r["avg_nbr_deg"] for r in average_neighbor_degree(G).collect()
        }
        assert set(got) == set(want)
        for k in want:
            assert got[k] == pytest.approx(want[k], abs=1e-9), k


def test_average_neighbor_degree_directed(spark):
    nxg = nx.DiGraph([(0, 1), (1, 2), (2, 0), (0, 3), (3, 1)])
    G = from_networkx(spark, nxg)
    for source, target in [("out", "out"), ("out", "in"), ("in", "out")]:
        want = nx.average_neighbor_degree(nxg, source=source, target=target)
        got = {
            r["id"]: r["avg_nbr_deg"]
            for r in average_neighbor_degree(G, source=source, target=target).collect()
        }
        for k in want:
            assert got[k] == pytest.approx(want[k], abs=1e-9), (source, target, k)


def test_modularity(spark):
    nxg = nx.karate_club_graph()
    G = from_networkx(spark, nxg)
    parts = [
        [{n for n in nxg if n % 2 == 0}, {n for n in nxg if n % 2 == 1}],
        [set(range(0, 17)), set(range(17, 34))],
        [{n} for n in nxg],  # singletons
    ]
    for comm in parts:
        labels = [(n, i) for i, c in enumerate(comm) for n in c]
        lab = spark.createDataFrame(labels, "id long, community long")
        want = nx_modularity(nxg, comm, weight=None)
        assert modularity(G, lab) == pytest.approx(want, abs=1e-9)
    # per-community rows sum to the scalar
    lab = spark.createDataFrame(
        [(n, n % 3) for n in nxg], "id long, community long"
    )
    rows = modularity_by_community(G, lab).collect()
    total = sum(r["contrib"] for r in rows)
    assert total == pytest.approx(
        nx_modularity(nxg, [{n for n in nxg if n % 3 == i} for i in range(3)], weight=None),
        abs=1e-9,
    )


def test_rich_club(spark):
    for nxg in _graphs():
        G = from_networkx(spark, nxg)
        want = nx.rich_club_coefficient(nxg, normalized=False)
        got = {r["k"]: r["phi"] for r in rich_club_coefficient(G).collect()}
        assert set(got) == set(want), nxg
        for k in want:
            assert got[k] == pytest.approx(want[k], abs=1e-9), k


def test_rich_club_with_isolates(spark):
    nxg = nx.Graph([(0, 1), (1, 2), (0, 2)])
    nxg.add_nodes_from([10, 11])  # isolates enter N_0
    G = from_networkx(spark, nxg)
    want = nx.rich_club_coefficient(nxg, normalized=False)
    got = {r["k"]: r["phi"] for r in rich_club_coefficient(G).collect()}
    assert got == pytest.approx(want)


def test_density(spark):
    for nxg in _graphs():
        G = from_networkx(spark, nxg)
        assert density(G) == pytest.approx(nx.density(nxg), abs=1e-12)
    d = nx.DiGraph([(0, 1), (1, 2), (2, 0)])
    assert density(from_networkx(spark, d)) == pytest.approx(nx.density(d))


def test_modularity_weighted(spark):
    nxg = nx.karate_club_graph()  # carries integer edge weights
    G = from_networkx(spark, nxg)
    comm = [set(range(0, 17)), set(range(17, 34))]
    lab = spark.createDataFrame(
        [(n, i) for i, c in enumerate(comm) for n in c], "id long, community long"
    )
    want = nx_modularity(nxg, comm)  # weight="weight" is the nx default
    assert modularity(G, lab, weighted=True) == pytest.approx(want, abs=1e-9)
