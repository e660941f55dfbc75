"""Time-respecting reachability vs a brute-force python closure."""

from __future__ import annotations

from collections import defaultdict


def _brute(edges, sources, max_hops, start=0):
    """earliest arrival with <= max_hops hops, edge usable iff t >= arrival."""
    out = {}
    for s in sources:
        arr = {s: start}
        for _ in range(max_hops):
            improved = False
            new = dict(arr)
            for u, v, t in edges:
                if u in arr and t >= arr[u] and t < new.get(v, float("inf")):
                    new[v] = t
                    improved = True
            arr = new
            if not improved:
                break
        for n, a in arr.items():
            out[(s, n)] = a
    return out


def _df(spark, edges):
    return spark.createDataFrame(
        [(int(a), int(b), int(t)) for a, b, t in edges], "src long, dst long, t long"
    )


def test_time_respecting_vs_static(spark):
    from graphblas_algorithms_spark.operators.temporal import temporal_reachability

    # static path 0->1->2 exists, but the 1->2 edge fires BEFORE 0->1:
    # information from 0 can never reach 2
    edges = [(0, 1, 100), (1, 2, 50)]
    got = {
        (r["source"], r["id"]): r["arrival"]
        for r in temporal_reachability(_df(spark, edges), [0]).collect()
    }
    assert got == {(0, 0): 0, (0, 1): 100}


def test_matches_brute_force(spark):
    import random

    from graphblas_algorithms_spark.operators.temporal import temporal_reachability

    rng = random.Random(9)
    edges = [
        (rng.randrange(12), rng.randrange(12), rng.randrange(1000))
        for _ in range(120)
    ]
    edges = [(u, v, t) for u, v, t in edges if u != v]
    sources = [0, 3, 7]
    for hops in (1, 3, 8):
        got = {
            (r["source"], r["id"]): r["arrival"]
            for r in temporal_reachability(_df(spark, edges), sources, max_hops=hops).collect()
        }
        assert got == _brute(edges, sources, hops), f"hops={hops}"


def test_equal_timestamps_chain(spark):
    from graphblas_algorithms_spark.operators.temporal import temporal_reachability

    edges = [(0, 1, 5), (1, 2, 5)]  # non-decreasing: allowed
    got = {
        (r["source"], r["id"]): r["arrival"]
        for r in temporal_reachability(_df(spark, edges), [0]).collect()
    }
    assert got[(0, 2)] == 5


def test_reachable_counts(spark):
    from graphblas_algorithms_spark.operators.temporal import (
        temporal_reachable_counts,
    )

    edges = [(0, 1, 10), (1, 2, 20), (0, 3, 15), (5, 6, 1)]
    rows = {
        r["source"]: r
        for r in temporal_reachable_counts(_df(spark, edges), [0, 5]).collect()
    }
    assert rows[0]["n_reachable"] == 4  # {0,1,2,3}
    assert rows[0]["earliest_last"] == 20
    assert rows[5]["n_reachable"] == 2


def test_incremental_matches_batch_closure(spark):
    import random

    from graphblas_algorithms_spark.operators.temporal import temporal_reachability
    from graphblas_algorithms_spark.streaming.temporal import merge_temporal_batch

    rng = random.Random(31)
    all_edges = [
        (rng.randrange(15), rng.randrange(15), rng.randrange(500))
        for _ in range(150)
    ]
    all_edges = [(u, v, t) for u, v, t in all_edges if u != v]
    sources = [0, 4]
    batches = [all_edges[:50], all_edges[50:90], all_edges[90:]]
    arrival = None
    seen: list = []
    for batch in batches:
        seen = seen + batch
        arrival = merge_temporal_batch(
            arrival, _df(spark, seen), _df(spark, batch), sources
        )
        got = {(r["source"], r["id"]): r["arrival"] for r in arrival.collect()}
        want = {
            (r["source"], r["id"]): r["arrival"]
            for r in temporal_reachability(
                _df(spark, seen), sources, max_hops=64
            ).collect()
        }
        assert got == want, f"after {len(seen)} edges"
