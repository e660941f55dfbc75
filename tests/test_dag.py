"""DAG kernel differential tests vs networkx."""

from __future__ import annotations

import networkx as nx
import pytest

from graphblas_algorithms_spark import from_networkx
from graphblas_algorithms_spark.operators.dag import (
    cyclic_core,
    dag_longest_path_length,
    is_directed_acyclic_graph,
    topological_generations,
    topological_sort,
)


def _random_dag(n=60, p=0.08, seed=7):
    g = nx.gnp_random_graph(n, p, seed=seed, directed=True)
    return nx.DiGraph((u, v) for u, v in g.edges() if u < v)


def test_topological_generations_matches_networkx(spark):
    nxg = _random_dag()
    nxg.add_node(999)  # isolate -> generation 0
    G = from_networkx(spark, nxg)
    got = {r["id"]: r["layer"] for r in topological_generations(G).collect()}
    want = {
        n: i for i, gen in enumerate(nx.topological_generations(nxg)) for n in gen
    }
    assert got == want


def test_layer_is_longest_path_from_source(spark):
    # chain 0->1->2->3 plus shortcut 0->3: layer(3) must be 3, not 1
    nxg = nx.DiGraph([(0, 1), (1, 2), (2, 3), (0, 3)])
    G = from_networkx(spark, nxg)
    got = {r["id"]: r["layer"] for r in topological_generations(G).collect()}
    assert got == {0: 0, 1: 1, 2: 2, 3: 3}


def test_topological_sort_is_valid_order(spark):
    nxg = _random_dag(n=50, p=0.1, seed=11)
    G = from_networkx(spark, nxg)
    pos = {r["id"]: r["pos"] for r in topological_sort(G).collect()}
    assert sorted(pos.values()) == list(range(len(pos)))
    for u, v in nxg.edges():
        assert pos[u] < pos[v]


def test_is_dag_and_cycle_raises(spark):
    dag = from_networkx(spark, _random_dag())
    assert is_directed_acyclic_graph(dag)
    cyc = from_networkx(spark, nx.DiGraph([(0, 1), (1, 2), (2, 0), (2, 3)]))
    assert not is_directed_acyclic_graph(cyc)
    with pytest.raises(ValueError, match="cycle"):
        topological_generations(cyc)
    # acyclic prefix: only node 3's ancestors are cyclic; nothing peels
    # past the sources (none here besides nothing) — 0,1,2,3 all cyclic-
    # ancestored except none are in-degree-0, so prefix is empty
    prefix = topological_generations(cyc, require_dag=False)
    assert prefix.count() == 0


def test_self_loop_is_cyclic(spark):
    g = nx.DiGraph([(0, 0), (0, 1)])
    G = from_networkx(spark, g)
    assert not is_directed_acyclic_graph(G)


def test_dag_longest_path_length_matches_networkx(spark):
    for seed in (3, 19):
        nxg = _random_dag(n=55, p=0.09, seed=seed)
        G = from_networkx(spark, nxg)
        assert dag_longest_path_length(G) == nx.dag_longest_path_length(nxg)


def test_dag_longest_path_weighted(spark):
    nxg = nx.DiGraph()
    nxg.add_edge(0, 1, weight=1.0)
    nxg.add_edge(1, 3, weight=1.0)
    nxg.add_edge(0, 2, weight=5.0)
    nxg.add_edge(2, 3, weight=0.5)
    G = from_networkx(spark, nxg)
    want = nx.dag_longest_path_length(nxg, weight="weight")
    assert dag_longest_path_length(G, weight=True) == pytest.approx(want)


def test_cyclic_core(spark):
    # cycle {1,2,3}, cycle {6,7}, bridge path 3->4->5->6, tail 7->8, head 0->1
    edges = [(1, 2), (2, 3), (3, 1), (6, 7), (7, 6), (3, 4), (4, 5), (5, 6), (7, 8), (0, 1)]
    G = from_networkx(spark, nx.DiGraph(edges))
    got = {r["id"] for r in cyclic_core(G).collect()}
    assert got == {1, 2, 3, 4, 5, 6, 7}
    dag = from_networkx(spark, _random_dag(n=30, p=0.1, seed=5))
    assert cyclic_core(dag).count() == 0


def test_condensation_matches_networkx(spark):
    from graphblas_algorithms_spark.operators.dag import (
        condensation,
        condensation_layers,
    )

    edges = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 4), (5, 6), (0, 1), (6, 7)]
    nxg = nx.DiGraph(edges)
    G = from_networkx(spark, nxg)
    ce, cn = condensation(G)
    got_edges = {(r["src"], r["dst"]) for r in ce.collect()}
    # SCC min-id labels: {1,2,3}->1, {4,5}->4, singletons 0,6,7
    assert got_edges == {(1, 4), (4, 6), (0, 1), (6, 7)}
    assert {r["id"] for r in cn.collect()} == {0, 1, 4, 6, 7}
    layers = {r["component"]: r["layer"] for r in condensation_layers(G).collect()}
    assert layers == {0: 0, 1: 1, 4: 2, 6: 3, 7: 4}
    # cross-check against nx condensation structure
    C = nx.condensation(nxg)
    assert len(C) == 5 and C.number_of_edges() == 4


def test_dag_longest_path_negative_weights(spark):
    """ADVICE r3: with negative edge weights a maximal path may start
    mid-graph; the all-node 0-seed realizes nx's per-node (0, v) floor."""
    nxg = nx.DiGraph()
    nxg.add_weighted_edges_from(
        [(0, 1, -5.0), (1, 2, -1.0), (2, 3, 4.0), (3, 4, 2.0), (0, 5, 1.0)]
    )
    from graphblas_algorithms_spark.operators.dag import dag_longest_path_length

    G = from_networkx(spark, nxg)
    got = dag_longest_path_length(G, weight=True)
    want = nx.dag_longest_path_length(nxg)
    assert got == want, (got, want)
    # nonnegative regression: unchanged agreement
    nxg2 = nx.DiGraph()
    nxg2.add_weighted_edges_from([(0, 1, 2.0), (1, 2, 3.0), (0, 2, 1.0)])
    assert dag_longest_path_length(from_networkx(spark, nxg2), weight=True) == 5.0
