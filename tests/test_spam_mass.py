"""TrustRank spam mass vs networkx personalization differential."""

from __future__ import annotations

import networkx as nx
import pytest

from graphblas_algorithms_spark import from_networkx
from graphblas_algorithms_spark.operators.pagerank import spam_mass

from .oracles import pagerank_oracle


def test_spam_mass_matches_networkx(spark):
    g = nx.gnp_random_graph(60, 0.08, seed=12, directed=True)
    G = from_networkx(spark, g)
    trusted = [0, 1, 2, 3]
    got = {r["id"]: r for r in spam_mass(G, trusted, tol=1e-10).collect()}
    pr = pagerank_oracle(g, alpha=0.85, tol=1e-12, max_iter=500)
    tpr = pagerank_oracle(
        g, alpha=0.85, tol=1e-12, max_iter=500,
        personalization={t: 1.0 for t in trusted},
    )
    for n in g:
        assert got[n]["rank"] == pytest.approx(pr[n], abs=1e-6)
        assert got[n]["trusted_rank"] == pytest.approx(tpr[n], abs=1e-6)
        want = max(0.0, min(1.0, (pr[n] - tpr[n]) / pr[n]))
        assert got[n]["spam_mass"] == pytest.approx(want, abs=1e-4)


def test_spam_farm_is_flagged(spark):
    # trusted core clique 0-4; spam farm 10-16 linking only to each other,
    # one escape edge so ranks mix slightly
    g = nx.DiGraph()
    for i in range(5):
        for j in range(5):
            if i != j:
                g.add_edge(i, j)
    for i in range(10, 17):
        for j in range(10, 17):
            if i != j:
                g.add_edge(i, j)
    g.add_edge(4, 10)  # weak trust leak into the farm
    G = from_networkx(spark, g)
    got = {r["id"]: r["spam_mass"] for r in spam_mass(G, [0, 1, 2, 3, 4]).collect()}
    core_mass = max(got[i] for i in range(5))
    farm_mass = min(got[i] for i in range(10, 17))
    assert farm_mass > 0.5
    assert core_mass < farm_mass
