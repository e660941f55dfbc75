"""Fiedler vector: numpy eigendecomposition differential, planted-cut
recovery, algebraic connectivity, and determinism."""

from __future__ import annotations

import networkx as nx
import numpy as np

from graphblas_algorithms_spark import from_networkx
from graphblas_algorithms_spark.operators.spectral import (
    algebraic_connectivity,
    fiedler_vector,
    spectral_bisection,
)


def _np_fiedler(nxg):
    nodes = sorted(nxg)
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    L = np.zeros((n, n))  # no scipy in this container: build L by hand
    for u, v in nxg.edges:
        if u == v:
            continue
        L[idx[u], idx[v]] -= 1
        L[idx[v], idx[u]] -= 1
        L[idx[u], idx[u]] += 1
        L[idx[v], idx[v]] += 1
    w, v = np.linalg.eigh(L)
    return nodes, w[1], v[:, 1]


def test_fiedler_matches_numpy(spark):
    nxg = nx.gnp_random_graph(40, 0.15, seed=9)
    assert nx.is_connected(nxg)
    nodes, lam2, ref = _np_fiedler(nxg)
    G = from_networkx(spark, nxg)
    got = {r["id"]: r["f"] for r in fiedler_vector(G, iterations=400).collect()}
    x = np.array([got[v] for v in nodes])
    # unit vectors equal up to global sign
    err = min(np.abs(x - ref).max(), np.abs(x + ref).max())
    assert err < 1e-4, err
    lam = algebraic_connectivity(G, iterations=400)
    assert abs(lam - lam2) < 1e-4, (lam, lam2)


def test_spectral_bisection_recovers_planted_cut(spark):
    # two dense 15-cliques joined by a single bridge edge
    a = nx.complete_graph(15)
    b = nx.relabel_nodes(nx.complete_graph(15), {i: i + 15 for i in range(15)})
    nxg = nx.union(a, b)
    nxg.add_edge(0, 15)
    G = from_networkx(spark, nxg)
    sides = {r["id"]: r["side"] for r in spectral_bisection(G, iterations=120).collect()}
    left = {v for v, s in sides.items() if s == sides[0]}
    assert left == set(range(15)) or left == set(range(15, 30))


def test_fiedler_deterministic(spark):
    nxg = nx.gnp_random_graph(30, 0.2, seed=4)
    G = from_networkx(spark, nxg)
    a = {r["id"]: r["f"] for r in fiedler_vector(G, iterations=30).collect()}
    b = {r["id"]: r["f"] for r in fiedler_vector(G, iterations=30).collect()}
    assert a == b
