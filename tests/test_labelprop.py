"""Label propagation: differential vs a python implementation of the SAME
pinned deterministic rule (the operator's semantics, documented in
labelprop.py, are ours — the reference has no LPA; north_rule names it)."""

from __future__ import annotations

import networkx as nx

from graphblas_algorithms_spark import from_networkx
from graphblas_algorithms_spark.operators.labelprop import label_propagation


def _lpa_oracle(nxg, max_iter=5):
    labels = {u: u for u in nxg.nodes}
    for _ in range(max_iter):
        new = {}
        for u in nxg.nodes:
            counts = {}
            for v in nxg.neighbors(u):
                counts[labels[v]] = counts.get(labels[v], 0) + 1
            counts[labels[u]] = counts.get(labels[u], 0) + 1  # self-vote
            best = max(counts.items(), key=lambda kv: (kv[1], -kv[0]))
            new[u] = best[0]
        if new == labels:
            return new
        labels = new
    return labels


def test_two_cliques_bridge(spark):
    g1 = nx.complete_graph(5)
    g2 = nx.relabel_nodes(nx.complete_graph(5), {i: i + 5 for i in range(5)})
    nxg = nx.compose(g1, g2)
    nxg.add_edge(4, 5)
    G = from_networkx(spark, nxg)
    got = {r["id"]: r["label"] for r in label_propagation(G, max_iter=5).collect()}
    assert got == _lpa_oracle(nxg, 5)
    # communities resolve to the two cliques
    assert len(set(got.values())) == 2


def test_er_lpa_exact_match(spark):
    nxg = nx.gnp_random_graph(120, 0.04, seed=13)
    G = from_networkx(spark, nxg)
    for iters in (1, 3, 5):
        got = {
            r["id"]: r["label"]
            for r in label_propagation(G, max_iter=iters, early_stop=False).collect()
        }
        assert got == _lpa_oracle_fixed(nxg, iters)


def _lpa_oracle_fixed(nxg, iters):
    labels = {u: u for u in nxg.nodes}
    for _ in range(iters):
        new = {}
        for u in nxg.nodes:
            counts = {}
            for v in nxg.neighbors(u):
                counts[labels[v]] = counts.get(labels[v], 0) + 1
            counts[labels[u]] = counts.get(labels[u], 0) + 1
            best = max(counts.items(), key=lambda kv: (kv[1], -kv[0]))
            new[u] = best[0]
        labels = new
    return labels


def test_isolated_nodes_keep_own_label(spark):
    nxg = nx.Graph()
    nxg.add_edge(0, 1)
    nxg.add_nodes_from([5, 6])
    G = from_networkx(spark, nxg)
    got = {r["id"]: r["label"] for r in label_propagation(G).collect()}
    assert got[5] == 5 and got[6] == 6
    assert got[0] == got[1] == 0
