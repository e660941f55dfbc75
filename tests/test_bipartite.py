"""Butterfly counting vs a brute-force python oracle."""

from __future__ import annotations

from itertools import combinations

import pytest
from pyspark.sql import functions as F


def _make_edges(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "src long, dst long"
    )


def _brute(pairs):
    """total, per-left, per-right butterfly counts."""
    adj: dict = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
    total = 0
    per_left: dict = {a: 0 for a in adj}
    per_right: dict = {}
    for b in {b for _, b in pairs}:
        per_right[b] = 0
    for a1, a2 in combinations(sorted(adj), 2):
        common = adj[a1] & adj[a2]
        t = len(common)
        bf = t * (t - 1) // 2
        total += bf
        per_left[a1] += bf
        per_left[a2] += bf
        for w in common:
            per_right[w] += t - 1
    return total, per_left, per_right


@pytest.fixture(scope="module")
def bip(spark):
    import random

    rng = random.Random(17)
    pairs = {(rng.randrange(20), 100 + rng.randrange(15)) for _ in range(140)}
    return sorted(pairs)


def test_butterfly_total(spark, bip):
    from graphblas_algorithms_spark.operators.bipartite import butterfly_count

    e = _make_edges(spark, bip)
    want, _, _ = _brute(bip)
    assert butterfly_count(e) == want
    # both pivots agree
    assert butterfly_count(e, pivot="src") == want
    assert butterfly_count(e, pivot="dst") == want


def test_butterfly_per_node_left(spark, bip):
    from graphblas_algorithms_spark.operators.bipartite import butterfly_counts

    e = _make_edges(spark, bip)
    _, per_left, _ = _brute(bip)
    got = {r["id"]: r["butterflies"] for r in butterfly_counts(e, side="src").collect()}
    assert got == per_left


def test_butterfly_per_node_right(spark, bip):
    from graphblas_algorithms_spark.operators.bipartite import (
        butterfly_counts,
        butterfly_counts_pivot_side,
    )

    e = _make_edges(spark, bip)
    _, _, per_right = _brute(bip)
    got = {r["id"]: r["butterflies"] for r in butterfly_counts(e, side="dst").collect()}
    assert got == per_right
    # the pivot-side variant scores the same nodes without re-pivoting
    got2 = {
        r["id"]: r["butterflies"]
        for r in butterfly_counts_pivot_side(e, side="dst").collect()
    }
    assert got2 == per_right


def test_butterfly_empty_and_star(spark):
    from graphblas_algorithms_spark.operators.bipartite import (
        butterfly_count,
        butterfly_counts,
    )

    star = _make_edges(spark, [(0, 100 + i) for i in range(6)])
    assert butterfly_count(star) == 0  # a star has wedges but no C4
    got = {r["id"]: r["butterflies"] for r in butterfly_counts(star, side="dst").collect()}
    assert set(got.values()) == {0}
    grid = _make_edges(spark, [(a, 100 + b) for a in range(3) for b in range(3)])
    # K_{3,3}: C(3,2)^2 = 9 butterflies
    assert butterfly_count(grid) == 9


def test_max_pivot_degree_cap(spark, bip):
    from graphblas_algorithms_spark.operators.bipartite import butterfly_count

    e = _make_edges(spark, bip)
    # cap below the max right-side degree: counts equal brute force on
    # the hub-filtered subgraph
    from collections import Counter

    rdeg = Counter(b for _, b in bip)
    cap = sorted(rdeg.values())[len(rdeg) // 2]
    kept = [(a, b) for a, b in bip if rdeg[b] <= cap]
    want, _, _ = _brute(kept)
    got = butterfly_count(e, pivot="dst", max_pivot_degree=cap)
    assert got == want
    # uncapped is an upper bound
    assert butterfly_count(e, pivot="dst") >= got


def test_keyed_butterfly_directed_matches_and_undirected_raises(spark, bip):
    """ADVICE r3: the keyed path must refuse an undirected KeyedGraph
    (canonicalization interleaves the parts) and agree with the
    brute-force oracle when built directed=True."""
    from graphblas_algorithms_spark.api import KeyedGraph

    total, per_left, _ = _brute(bip)
    keyed = spark.createDataFrame(
        [(f"L{a}", f"R{b}") for a, b in bip], "u string, v string"
    )
    kg = KeyedGraph(keyed, "u", "v", directed=True)
    assert kg.butterfly_count() == total
    got = {r["key"]: r["butterflies"] for r in kg.butterfly_counts(side="src").collect()}
    want = {f"L{a}": c for a, c in per_left.items() if c}
    assert {k: v for k, v in got.items() if v} == want

    und = KeyedGraph(keyed, "u", "v", directed=False)
    with pytest.raises(ValueError, match="directed=True"):
        und.butterfly_count()
    with pytest.raises(ValueError, match="directed=True"):
        und.butterfly_counts()
