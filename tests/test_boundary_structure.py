"""Boundary/cuts, structure predicates, linalg constructors vs networkx."""

from __future__ import annotations

import networkx as nx
import numpy as np
import pytest

from graphblas_algorithms_spark import from_networkx
from graphblas_algorithms_spark.operators.boundary import (
    boundary_expansion,
    conductance,
    cut_size,
    edge_boundary,
    edge_expansion,
    intra_inter_community_edges,
    mixing_expansion,
    node_boundary,
    normalized_cut_size,
    volume,
)
from graphblas_algorithms_spark.operators.linalg import (
    adjacency_matrix,
    bethe_hessian_matrix,
    laplacian_matrix,
    modularity_matrix,
    normalized_laplacian_matrix,
)
from graphblas_algorithms_spark.operators.structure import (
    could_be_isomorphic,
    ego_graph,
    is_dominating_set,
    is_isolate,
    is_k_regular,
    is_regular,
    is_simple_path,
    is_tournament,
    isolates,
    lowest_common_ancestor,
    mutual_weight,
    number_of_isolates,
    overall_reciprocity,
    reciprocity,
    s_metric,
    score_sequence,
    tournament_matrix,
)


@pytest.fixture(scope="module")
def er(spark):
    nxg = nx.gnp_random_graph(40, 0.1, seed=42)
    return nxg, from_networkx(spark, nxg)


S = list(range(10))


def test_boundary(er):
    nxg, G = er
    got = {
        (min(r["src"], r["dst"]), max(r["src"], r["dst"]))
        for r in edge_boundary(G, S).collect()
    }
    want = {(min(u, v), max(u, v)) for u, v in nx.edge_boundary(nxg, S)}
    assert got == want
    assert {r["id"] for r in node_boundary(G, S).collect()} == nx.node_boundary(nxg, S)


def test_cuts(er):
    nxg, G = er
    assert cut_size(G, S) == nx.cut_size(nxg, S)
    assert volume(G, S) == nx.volume(nxg, S)
    T = [i for i in nxg.nodes if i not in S]
    assert normalized_cut_size(G, S) == pytest.approx(
        nx.normalized_cut_size(nxg, S), abs=1e-12
    )
    assert conductance(G, S) == pytest.approx(nx.conductance(nxg, S), abs=1e-12)
    assert edge_expansion(G, S) == pytest.approx(nx.edge_expansion(nxg, S), abs=1e-12)
    assert mixing_expansion(G, S) == pytest.approx(
        nx.mixing_expansion(nxg, S), abs=1e-12
    )
    assert boundary_expansion(G, S) == pytest.approx(
        nx.boundary_expansion(nxg, S), abs=1e-12
    )


def test_community_quality(er):
    nxg, G = er
    labels = G.spark.createDataFrame(
        [(i, i % 3) for i in nxg.nodes], "id long, label long"
    )
    intra, inter = intra_inter_community_edges(G, labels)
    want_intra = sum(1 for u, v in nxg.edges if u % 3 == v % 3)
    assert intra == want_intra
    assert inter == nxg.number_of_edges() - want_intra


def test_isolates(spark):
    nxg = nx.Graph([(0, 1)])
    nxg.add_nodes_from([5, 6])
    G = from_networkx(spark, nxg)
    assert {r["id"] for r in isolates(G).collect()} == {5, 6}
    assert is_isolate(G, 5) and not is_isolate(G, 0)
    assert number_of_isolates(G) == 2


def test_regular(spark):
    G = from_networkx(spark, nx.cycle_graph(6))
    assert is_regular(G) and is_k_regular(G, 2) and not is_k_regular(G, 3)
    H = from_networkx(spark, nx.path_graph(4))
    assert not is_regular(H)


def test_reciprocity(spark):
    nxg = nx.DiGraph([(0, 1), (1, 0), (1, 2), (2, 3), (3, 2), (0, 2)])
    G = from_networkx(spark, nxg)
    assert overall_reciprocity(G) == pytest.approx(nx.overall_reciprocity(nxg))
    got = {r["id"]: r["reciprocity"] for r in reciprocity(G).collect()}
    want = nx.reciprocity(nxg, nodes=list(nxg.nodes))
    for k, v in want.items():
        assert got[k] == pytest.approx(v, abs=1e-12)


def test_s_metric(er):
    nxg, G = er
    assert s_metric(G) == pytest.approx(nx.s_metric(nxg), abs=1e-9)


def test_mutual_weight(spark):
    nxg = nx.DiGraph()
    nxg.add_edge(0, 1, weight=2.0)
    nxg.add_edge(1, 0, weight=3.0)
    nxg.add_edge(1, 2, weight=1.0)
    G = from_networkx(spark, nxg)
    assert mutual_weight(G, 0, 1) == 5.0
    assert mutual_weight(G, 1, 2) == 1.0
    assert mutual_weight(G, 0, 2) == 0.0


def test_simple_path(er):
    nxg, G = er
    p = nx.shortest_path(nxg, 0, 5)
    assert is_simple_path(G, p)
    assert not is_simple_path(G, [0, 0])
    assert not is_simple_path(G, [0, 999])


def test_tournament(spark):
    nxg = nx.tournament.random_tournament(7, seed=1)
    G = from_networkx(spark, nxg)
    assert is_tournament(G)
    assert score_sequence(G) == sorted(d for _, d in nxg.out_degree())
    tm = {(r["row"], r["col"]): r["value"] for r in tournament_matrix(G).collect()}
    for u, v in nxg.edges:
        assert tm[(u, v)] == 1.0 and tm[(v, u)] == -1.0
    H = from_networkx(spark, nx.path_graph(4, nx.DiGraph))
    assert not is_tournament(H)


def test_dominating(er):
    nxg, G = er
    dom = nx.dominating_set(nxg)
    assert is_dominating_set(G, dom)
    assert is_dominating_set(G, list(nxg.nodes))


def test_lca(spark):
    nxg = nx.DiGraph([(0, 1), (0, 2), (1, 3), (2, 3), (2, 4)])
    G = from_networkx(spark, nxg)
    want = nx.lowest_common_ancestor(nxg, 3, 4)
    assert lowest_common_ancestor(G, 3, 4) == want
    assert lowest_common_ancestor(G, 1, 2) == 0


def test_could_be_isomorphic(spark):
    g1 = nx.cycle_graph(6)
    g2 = nx.relabel_nodes(nx.cycle_graph(6), {i: (i * 5) % 6 for i in range(6)})
    g3 = nx.path_graph(6)
    G1, G2, G3 = (from_networkx(spark, g) for g in (g1, g2, g3))
    assert could_be_isomorphic(G1, G2)
    assert could_be_isomorphic(G1, G2, fast=False)
    assert not could_be_isomorphic(G1, G3)


def test_ego(er):
    nxg, G = er
    ego = ego_graph(G, 0, radius=2)
    want = nx.ego_graph(nxg, 0, radius=2)
    got_nodes = {r["id"] for r in ego.nodes.collect()}
    assert got_nodes == set(want.nodes)
    got_edges = {
        (min(r["src"], r["dst"]), max(r["src"], r["dst"]))
        for r in ego.edges.collect()
    }
    assert got_edges == {(min(u, v), max(u, v)) for u, v in want.edges}


def _mat_to_np(df, n):
    m = np.zeros((n, n))
    for r in df.collect():
        m[r["row"], r["col"]] = r["value"]
    return m


def test_linalg(spark):
    nxg = nx.gnp_random_graph(20, 0.2, seed=7)
    G = from_networkx(spark, nxg)
    n = 20
    A = _mat_to_np(adjacency_matrix(G), n)
    assert np.allclose(A, nx.to_numpy_array(nxg))
    L = _mat_to_np(laplacian_matrix(G), n)
    deg = A.sum(axis=1)
    assert np.allclose(L, np.diag(deg) - A)
    NL = _mat_to_np(normalized_laplacian_matrix(G), n)
    dinv = np.divide(1.0, np.sqrt(deg), out=np.zeros(n), where=deg > 0)
    want_nl = np.eye(n) * (deg > 0) - dinv[:, None] * A * dinv[None, :]
    assert np.allclose(NL, want_nl)
    B = _mat_to_np(modularity_matrix(G, materialize=True), n)
    two_m = deg.sum()
    assert np.allclose(B, A - np.outer(deg, deg) / two_m)
    r = 1.5
    BH = _mat_to_np(bethe_hessian_matrix(G, r=r), n)
    assert np.allclose(BH, (r * r - 1) * np.eye(n) - r * A + np.diag(deg))


def test_effective_size(er):
    nxg, G = er
    from graphblas_algorithms_spark.operators.structure import effective_size

    got = {r["id"]: r["effective_size"] for r in effective_size(G).collect()}
    want = nx.effective_size(nxg)
    pos = {n for n, d in nxg.degree() if d > 0}
    assert set(got) == pos
    for n in pos:
        assert got[n] == pytest.approx(want[n]), n


def test_local_bridges(er):
    nxg, G = er
    from graphblas_algorithms_spark.operators.structure import local_bridges

    got = {(r["src"], r["dst"]) for r in local_bridges(G).collect()}
    want = {tuple(sorted(e)) for e in nx.local_bridges(nxg, with_span=False)}
    assert got == want
    spanned = local_bridges(G, with_span=True).collect()
    assert {(r["src"], r["dst"]) for r in spanned} == want
    assert all(r["span_gt_2"] for r in spanned)
