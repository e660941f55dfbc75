"""Truss decomposition vs a brute-force peeling oracle."""

from __future__ import annotations

import networkx as nx

from graphblas_algorithms_spark import from_networkx
from graphblas_algorithms_spark.operators.ktruss import k_truss, truss_decomposition


def _brute_trussness(nxg):
    """trussness(e) = max k with e in the k-truss, by literal peeling."""
    out = {}
    k = 2
    remaining = nx.Graph(nxg)
    remaining.remove_edges_from(nx.selfloop_edges(remaining))
    for e in remaining.edges():
        out[tuple(sorted(e))] = 2
    while remaining.number_of_edges():
        k += 1
        g = nx.Graph(remaining)
        changed = True
        while changed:
            changed = False
            drop = []
            for u, v in g.edges():
                if len(set(g[u]) & set(g[v])) < k - 2:
                    drop.append((u, v))
            if drop:
                g.remove_edges_from(drop)
                changed = True
        for e in g.edges():
            out[tuple(sorted(e))] = k
        remaining = g
    return out


def test_trussness_matches_peeling(spark):
    for seed, p in [(5, 0.15), (9, 0.25)]:
        nxg = nx.gnp_random_graph(35, p, seed=seed)
        G = from_networkx(spark, nxg)
        got = {
            (r["src"], r["dst"]): r["trussness"]
            for r in truss_decomposition(G).collect()
        }
        want = _brute_trussness(nxg)
        assert got == want, f"seed={seed}"


def test_trussness_consistent_with_k_truss(spark):
    nxg = nx.gnp_random_graph(40, 0.2, seed=13)
    G = from_networkx(spark, nxg)
    tr = {
        (r["src"], r["dst"]): r["trussness"] for r in truss_decomposition(G).collect()
    }
    for k in (3, 4, 5):
        kt = {
            tuple(sorted((r["src"], r["dst"])))
            for r in k_truss(G, k).edges.collect()
        }
        assert kt == {e for e, t in tr.items() if t >= k}, f"k={k}"


def test_clique_and_tree(spark):
    # K6: every edge trussness 6; a tree: every edge trussness 2
    G = from_networkx(spark, nx.complete_graph(6))
    got = {r["trussness"] for r in truss_decomposition(G).collect()}
    assert got == {6}
    T = from_networkx(spark, nx.random_labeled_tree(15, seed=3))
    got = {r["trussness"] for r in truss_decomposition(T).collect()}
    assert got == {2}
