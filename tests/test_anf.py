"""ANF neighborhood function / effective diameter differential tests.

Exact oracle: networkx all-pairs shortest paths -> N(h) = #pairs with
dist <= h.  The FM sketch carries ~1/sqrt(k) relative error; gates are
set at 20% with k=64 (loose enough to be seed-robust, tight enough to
catch a broken estimator or a wrong propagation direction, which are
off by integer factors).  seed=42 matches the md5-seeded driver query;
the estimates were cross-checked against a pure-Python replay of the
same md5 recipe when the seed was picked (r4).
"""

from __future__ import annotations

import networkx as nx
import pytest

from graphblas_algorithms_spark import from_networkx
from graphblas_algorithms_spark.operators.anf import (
    effective_diameter,
    neighborhood_function,
)


def exact_nf(nxg):
    """[(h, pairs within distance h)] including h=0 self-pairs."""
    lengths = dict(nx.all_pairs_shortest_path_length(nxg))
    diam = max(max(d.values()) for d in lengths.values())
    out = []
    for h in range(diam + 1):
        out.append(
            sum(1 for s in lengths for t, d in lengths[s].items() if d <= h)
        )
    return out


def _run(spark, nxg, k=64):
    G = from_networkx(spark, nxg)
    got = neighborhood_function(G, k=k, seed=42)
    want = exact_nf(nxg)
    # converges at the true diameter: the curve stops growing there
    assert got[-1]["h"] <= len(want) + 1
    for point in got:
        h = point["h"]
        if h >= len(want):
            continue
        rel = abs(point["reachable_pairs"] - want[h]) / want[h]
        assert rel < 0.20, f"h={h}: est {point['reachable_pairs']} vs {want[h]}"
    # the converged total must match the true closure size too
    rel_total = abs(got[-1]["reachable_pairs"] - want[-1]) / want[-1]
    assert rel_total < 0.20
    return got


def test_anf_er_graph(spark):
    _run(spark, nx.gnp_random_graph(120, 0.04, seed=5))


def test_anf_directed(spark):
    nxg = nx.gnp_random_graph(100, 0.05, seed=9, directed=True)
    G = from_networkx(spark, nxg)
    got = neighborhood_function(G, k=64, seed=42)
    lengths = dict(nx.all_pairs_shortest_path_length(nxg))
    total = sum(len(d) for d in lengths.values())  # ordered pairs
    rel = abs(got[-1]["reachable_pairs"] - total) / total
    assert rel < 0.20


def test_anf_path_graph_h_resolution(spark):
    """On a path the curve is exactly linear-ish per h — checks that each
    superstep advances the frontier exactly one hop."""
    nxg = nx.path_graph(24)
    got = _run(spark, nx.path_graph(24), k=64)
    # path diameter 23: needs all 23 supersteps, no early stop
    assert got[-1]["h"] >= 20
    del nxg


def test_anf_deterministic(spark):
    nxg = nx.gnp_random_graph(60, 0.06, seed=3)
    G = from_networkx(spark, nxg)
    a = neighborhood_function(G, k=32, seed=11)
    b = neighborhood_function(G, k=32, seed=11)
    assert a == b  # bit-exact: hash-seeded init, OR propagation


def test_effective_diameter_star_vs_path(spark):
    """Structure check: a star's 90%-effective diameter is ~2, a path's
    grows with n — the operator must separate them decisively."""
    star = effective_diameter(from_networkx(spark, nx.star_graph(80)), q=0.9, k=64)
    path = effective_diameter(from_networkx(spark, nx.path_graph(40)), q=0.9, k=64)
    assert star <= 3.0
    assert path >= 10.0
