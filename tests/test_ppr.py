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


def test_forward_push_approximates_exact_ppr(spark):
    from .oracles import pagerank_oracle

    from graphblas_algorithms_spark.operators.ppr import forward_push_ppr

    nxg = nx.gnp_random_graph(50, 0.1, seed=13)  # undirected, connected-ish
    G = from_networkx(spark, nxg)
    eps = 1e-5
    got = {
        (r["seed"], r["id"]): r
        for r in forward_push_ppr(G, [0, 5], alpha=0.15, eps=eps).collect()
    }
    # ACL push with teleport alpha == power iteration with damping 1-alpha
    # on an undirected graph (no dangling nodes)
    for s in (0, 5):
        exact = pagerank_oracle(
            nxg, alpha=0.85, personalization={s: 1.0}, fixed_iters=500
        )
        mass = sum(r["p"] for (sd, _), r in got.items() if sd == s) + sum(
            r["residual"] for (sd, _), r in got.items() if sd == s
        )
        assert mass == pytest.approx(1.0, abs=1e-9)
        for v, pv in exact.items():
            est = got.get((s, v))
            p_est = est["p"] if est else 0.0
            assert abs(pv - p_est) <= eps * max(nxg.degree[v], 1) + 1e-9, (s, v)
        # residual invariant at termination
        for (sd, v), r in got.items():
            if sd == s:
                assert r["residual"] <= eps * max(nxg.degree[v], 1) + 1e-12


def test_forward_push_state_is_sparse(spark):
    from graphblas_algorithms_spark.operators.ppr import forward_push_ppr

    # two far-apart seeds on a long path: push with a loose eps must not
    # touch the whole graph
    nxg = nx.path_graph(400)
    G = from_networkx(spark, nxg)
    rows = forward_push_ppr(G, [0, 399], alpha=0.15, eps=1e-3).collect()
    assert len(rows) < 2 * 100  # far below 2 x 400 dense rows
    assert {r["seed"] for r in rows} == {0, 399}
