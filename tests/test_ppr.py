"""Batched multi-seed PPR: per-seed equality with the single-seed kernel
and with networkx personalized pagerank."""

from __future__ import annotations

import networkx as nx
import pytest

from graphblas_algorithms_spark import from_networkx
from graphblas_algorithms_spark.operators.pagerank import pagerank
from graphblas_algorithms_spark.operators.ppr import personalized_pagerank_multi


def test_multi_seed_matches_single_seed_kernel(spark):
    nxg = nx.gnp_random_graph(40, 0.1, seed=19, directed=True)
    G = from_networkx(spark, nxg)
    seeds = [0, 3, 7]
    multi = personalized_pagerank_multi(G, seeds, iters=15)
    got = {(r["seed"], r["id"]): r["rank"] for r in multi.collect()}
    for s in seeds:
        single = pagerank(G, personalization={s: 1.0}, fixed_iters=15)
        want = {r["id"]: r["rank"] for r in single.collect()}
        for i, v in want.items():
            assert got[(s, i)] == pytest.approx(v, abs=1e-12), (s, i)


def test_multi_seed_matches_numpy_oracle_converged(spark):
    from .oracles import pagerank_oracle

    nxg = nx.gnp_random_graph(35, 0.12, seed=5)
    G = from_networkx(spark, nxg)
    multi = personalized_pagerank_multi(G, [2], iters=80)
    got = {r["id"]: r["rank"] for r in multi.collect()}
    want = pagerank_oracle(nxg, personalization={2: 1.0}, fixed_iters=80)
    for i, v in want.items():
        assert got[i] == pytest.approx(v, abs=1e-10), i


def test_multi_seed_mass_conservation(spark):
    nxg = nx.gnp_random_graph(30, 0.08, seed=31, directed=True)
    G = from_networkx(spark, nxg)
    multi = personalized_pagerank_multi(G, [0, 1, 2, 3], iters=10)
    import collections

    tot = collections.defaultdict(float)
    for r in multi.collect():
        tot[r["seed"]] += r["rank"]
    for s, t in tot.items():
        assert t == pytest.approx(1.0, abs=1e-9), s
