"""Densest subgraph (Bahmani peel): Python replay equality, the
2(1+eps) approximation guarantee vs exact brute force on tiny graphs,
and planted-clique recovery."""

from __future__ import annotations

import itertools

import networkx as nx

from graphblas_algorithms_spark import from_networkx
from graphblas_algorithms_spark.operators.densest import densest_subgraph


def _py_densest(nxg, eps_num=1, eps_den=10):
    """Driver-side replay of the pinned peel (same integral threshold,
    same (density DESC, round ASC) snapshot ranking)."""
    coef = 2 * (eps_den + eps_num)
    live = set(nxg.nodes())
    edges = {(u, v) for u, v in nxg.edges() if u != v}
    snaps = [(0, set(live), len(edges))]
    r = 0
    while live:
        r += 1
        n, m = len(live), len(edges)
        deg: dict = {}
        for u, v in edges:
            deg[u] = deg.get(u, 0) + 1
            deg[v] = deg.get(v, 0) + 1
        live = {v for v in deg if deg[v] * n * eps_den > coef * m}
        edges = {(u, v) for u, v in edges if u in live and v in live}
        if live:
            snaps.append((r, set(live), len(edges)))
    best = max(snaps, key=lambda s: (s[2] / len(s[1]), -s[0]))
    return best[1]


def _run(spark, nxg, **kw):
    G = from_networkx(spark, nxg)
    return {r["id"] for r in densest_subgraph(G, **kw).collect()}


def test_densest_matches_python_replay(spark):
    for seed, p in [(3, 0.05), (11, 0.15)]:
        nxg = nx.gnp_random_graph(70, p, seed=seed)
        got = _run(spark, nxg)
        assert got == _py_densest(nxg)


def test_densest_approximation_guarantee_exact_tiny(spark):
    # brute-force rho* over all subsets of a 10-node graph; the peel's
    # answer must be within the 2(1+eps) factor
    nxg = nx.gnp_random_graph(10, 0.4, seed=7)
    nodes = list(nxg.nodes())
    best = 0.0
    for k in range(1, len(nodes) + 1):
        for sub in itertools.combinations(nodes, k):
            s = set(sub)
            m = sum(1 for u, v in nxg.edges() if u in s and v in s)
            best = max(best, m / len(s))
    got = _run(spark, nxg, eps_num=1, eps_den=10)
    m_got = sum(1 for u, v in nxg.edges() if u in got and v in got)
    assert m_got / len(got) >= best / (2 * 1.1) - 1e-12


def test_densest_recovers_planted_clique(spark):
    # sparse background + a 12-clique: the best snapshot is the clique
    nxg = nx.gnp_random_graph(200, 0.02, seed=5)
    clique = list(range(200, 212))
    nxg.add_edges_from(itertools.combinations(clique, 2))
    got = _run(spark, nxg)
    assert got == _py_densest(nxg)
    assert set(clique) <= got


def test_densest_stats_trace_and_empty_graph(spark):
    nxg = nx.empty_graph(5)
    G = from_networkx(spark, nxg)
    out, stats = densest_subgraph(G, return_stats=True)
    # 5 isolates: snapshot 0 is the whole node set at density 0 and wins
    assert stats[0] == (0, 5, 0, 0.0)
    assert {r["id"] for r in out.collect()} == set(range(5))
