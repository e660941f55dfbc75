"""Edge betweenness differential tests vs networkx (pure BFS, no scipy)."""

from __future__ import annotations

import networkx as nx
import pytest

from graphblas_algorithms_spark import from_networkx
from graphblas_algorithms_spark.operators.betweenness import (
    edge_betweenness_centrality,
)


def _got(G, **kw):
    return {
        (r["src"], r["dst"]): r["betweenness"]
        for r in edge_betweenness_centrality(G, **kw).collect()
    }


def _want(nxg, **kw):
    return {
        tuple(sorted(e)) if not nxg.is_directed() else e: v
        for e, v in nx.edge_betweenness_centrality(nxg, **kw).items()
    }


def test_undirected_exact(spark):
    for seed, p in [(3, 0.08), (11, 0.15)]:
        nxg = nx.gnp_random_graph(40, p, seed=seed)
        G = from_networkx(spark, nxg)
        got = _got(G)
        want = _want(nxg)
        assert set(got) == set(want)
        for e in want:
            assert got[e] == pytest.approx(want[e], abs=1e-9), (seed, e)


def test_undirected_unnormalized(spark):
    nxg = nx.karate_club_graph()
    G = from_networkx(spark, nxg)
    got = _got(G, normalized=False)
    want = _want(nxg, normalized=False)
    for e in want:
        assert got[e] == pytest.approx(want[e], abs=1e-9)


def test_directed_exact(spark):
    g = nx.gnp_random_graph(35, 0.1, seed=7, directed=True)
    G = from_networkx(spark, g)
    got = _got(G)
    want = _want(g)
    assert set(got) == set(want)
    for e in want:
        assert got[e] == pytest.approx(want[e], abs=1e-9)


def test_girvan_newman_bridge_dominates(spark):
    # two cliques joined by one edge: that edge carries every cross pair
    nxg = nx.barbell_graph(6, 0)
    G = from_networkx(spark, nxg)
    got = _got(G, normalized=False)
    bridge = (5, 6)
    assert got[bridge] == max(got.values())
    want = _want(nxg, normalized=False)
    assert got[bridge] == pytest.approx(want[bridge], abs=1e-9)


def test_subset_unnormalized_matches_python_replay(spark):
    from collections import defaultdict, deque

    nxg = nx.gnp_random_graph(50, 0.1, seed=23)
    G = from_networkx(spark, nxg)
    srcs = sorted(nxg.nodes)[:8]
    adj = {n: set(nxg.neighbors(n)) for n in nxg}
    eb: dict = defaultdict(float)
    for s in srcs:
        dist = {s: 0}
        sigma = {s: 1.0}
        order = []
        q = deque([s])
        while q:
            v = q.popleft()
            order.append(v)
            for w in adj[v]:
                if w not in dist:
                    dist[w] = dist[v] + 1
                    q.append(w)
                if dist.get(w) == dist[v] + 1:
                    sigma[w] = sigma.get(w, 0) + sigma[v]
        delta: dict = defaultdict(float)
        for w in reversed(order):
            for v in adj[w]:
                if dist.get(v) == dist[w] - 1:
                    c = sigma[v] / sigma[w] * (1 + delta[w])
                    eb[tuple(sorted((v, w)))] += c
                    delta[v] += c
    got = _got(G, sources=srcs, normalized=False)
    for e, v in got.items():
        assert v == pytest.approx(0.5 * eb.get(e, 0.0), abs=1e-9), e
