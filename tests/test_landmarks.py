"""Landmark distance oracle: bound validity + exactness cases vs nx."""

from __future__ import annotations

import networkx as nx

from graphblas_algorithms_spark import from_networkx
from graphblas_algorithms_spark.operators.landmarks import (
    approx_distances,
    landmark_distance_table,
    select_landmarks,
)


def _pairs_df(spark, pairs):
    return spark.createDataFrame([(int(u), int(v)) for u, v in pairs], "u long, v long")


def test_bounds_sandwich_exact_undirected(spark):
    nxg = nx.connected_watts_strogatz_graph(80, 4, 0.2, seed=9)
    G = from_networkx(spark, nxg)
    lms = select_landmarks(G, 8)
    deg = dict(nxg.degree())
    # deterministic top-degree selection
    want = sorted(nxg.nodes, key=lambda n: (-deg[n], n))[:8]
    assert lms == want
    tbl = landmark_distance_table(G, lms).persist()
    pairs = [(0, 40), (3, 77), (12, 55), (20, 21), (5, 5)]
    got = {
        (r["u"], r["v"]): (r["dist_upper"], r["dist_lower"])
        for r in approx_distances(tbl, _pairs_df(spark, pairs)).collect()
    }
    for u, v in pairs:
        d = nx.shortest_path_length(nxg, u, v)
        up, lo = got[(u, v)]
        assert lo <= d <= up, f"({u},{v}): {lo} <= {d} <= {up}"
    tbl.unpersist()


def test_exact_when_endpoint_is_landmark(spark):
    nxg = nx.connected_watts_strogatz_graph(60, 4, 0.15, seed=4)
    G = from_networkx(spark, nxg)
    lms = select_landmarks(G, 4)
    tbl = landmark_distance_table(G, lms)
    pairs = [(lms[0], 17), (23, lms[1])]
    got = {
        (r["u"], r["v"]): r["dist_upper"]
        for r in approx_distances(tbl, _pairs_df(spark, pairs)).collect()
    }
    for u, v in pairs:
        assert got[(u, v)] == nx.shortest_path_length(nxg, u, v)


def test_directed_upper_bound(spark):
    g = nx.gnp_random_graph(50, 0.08, seed=6, directed=True)
    # keep it mostly strongly connected: add a cycle spine
    g.add_edges_from((i, (i + 1) % 50) for i in range(50))
    G = from_networkx(spark, g)
    tbl = landmark_distance_table(G, k=6)
    pairs = [(0, 25), (10, 3), (44, 44)]
    got = {
        (r["u"], r["v"]): r["dist_upper"]
        for r in approx_distances(tbl, _pairs_df(spark, pairs)).collect()
    }
    for u, v in pairs:
        d = nx.shortest_path_length(g, u, v)
        assert got[(u, v)] >= d
        assert got[(u, v)] <= 2 * 50  # sane


def test_disconnected_pair_is_null(spark):
    nxg = nx.union(nx.path_graph(5), nx.relabel_nodes(nx.path_graph(5), lambda i: i + 10))
    G = from_networkx(spark, nxg)
    tbl = landmark_distance_table(G, k=4)
    rows = approx_distances(tbl, _pairs_df(spark, [(0, 14)])).collect()
    assert rows[0]["dist_upper"] is None
