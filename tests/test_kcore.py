"""k-core / core_number differential tests vs networkx."""

from __future__ import annotations

import networkx as nx

from graphblas_algorithms_spark import from_networkx
from graphblas_algorithms_spark.classes._utils import vector_to_dict
from graphblas_algorithms_spark.operators.kcore import core_number, k_core


def _edges(K):
    return {tuple(sorted((r["src"], r["dst"]))) for r in K.edges.collect()}


def test_k_core_matches_networkx(spark):
    nxg = nx.gnp_random_graph(80, 0.08, seed=13)
    G = from_networkx(spark, nxg)
    for k in (2, 3, 4):
        want = {tuple(sorted(e)) for e in nx.k_core(nxg, k).edges()}
        assert _edges(k_core(G, k)) == want, f"k={k}"


def test_k_core_empty_when_k_exceeds_degeneracy(spark):
    nxg = nx.path_graph(12)  # degeneracy 1
    G = from_networkx(spark, nxg)
    assert _edges(k_core(G, 3)) == set()


def test_core_number_matches_networkx(spark):
    nxg = nx.gnp_random_graph(90, 0.07, seed=21)
    nxg.add_node(1000)  # isolate -> core 0
    G = from_networkx(spark, nxg)
    got = vector_to_dict(core_number(G), val_col="core")
    want = nx.core_number(nxg)
    assert got == {k: int(v) for k, v in want.items()}


def test_core_number_star_plus_clique(spark):
    nxg = nx.star_graph(20)
    nxg = nx.compose(nxg, nx.relabel_nodes(nx.complete_graph(6), lambda i: i + 100))
    G = from_networkx(spark, nxg)
    got = vector_to_dict(core_number(G), val_col="core")
    want = nx.core_number(nxg)
    assert got == {k: int(v) for k, v in want.items()}


def test_onion_layers_matches_networkx(spark):
    from graphblas_algorithms_spark.operators.kcore import onion_layers

    for seed, p in [(3, 0.06), (11, 0.18)]:
        nxg = nx.gnp_random_graph(60, p, seed=seed)
        G = from_networkx(spark, nxg)
        got = {r["id"]: r["layer"] for r in onion_layers(G).collect()}
        assert got == nx.onion_layers(nxg)


def test_onion_layers_isolates_and_docs_example(spark):
    from graphblas_algorithms_spark.operators.kcore import onion_layers

    # the nx docstring example: havel_hakimi of [0,1,2,2,2,2,3]
    nxg = nx.havel_hakimi_graph([0, 1, 2, 2, 2, 2, 3])
    G = from_networkx(spark, nxg)
    got = {r["id"]: r["layer"] for r in onion_layers(G).collect()}
    assert got == nx.onion_layers(nxg)
    assert got[6] == 1  # the isolate sits alone in layer 1
