"""Incremental triangle maintenance: batch-replay equality vs the
one-shot kernel, duplicate no-ops, and the streaming wiring."""

from __future__ import annotations

import networkx as nx

from graphblas_algorithms_spark import from_networkx
from graphblas_algorithms_spark.operators.triangles import total_triangles
from graphblas_algorithms_spark.streaming.triangles import (
    incremental_triangles,
    merge_triangle_batch,
    read_state,
)


def _edges_df(spark, rows):
    return spark.createDataFrame(rows, "src long, dst long")


def test_merge_matches_oneshot_per_batch(spark):
    nxg = nx.gnp_random_graph(60, 0.12, seed=5)
    edges = [(int(u), int(v)) for u, v in nxg.edges()]
    chunks = [edges[i::4] for i in range(4)]
    state = _edges_df(spark, [])
    total = 0
    seen: list = []
    for ch in chunks:
        state, inc = merge_triangle_batch(state, _edges_df(spark, ch))
        state = state.persist()
        total += inc
        seen += ch
        sub = nx.Graph(seen)
        want = sum(nx.triangles(sub).values()) // 3
        assert total == want  # exact after EVERY batch, not just the last
    assert total == sum(nx.triangles(nxg).values()) // 3


def test_merge_duplicates_and_reversed_are_noops(spark):
    nxg = nx.gnp_random_graph(30, 0.2, seed=9)
    edges = [(int(u), int(v)) for u, v in nxg.edges()]
    state, inc = merge_triangle_batch(_edges_df(spark, []), _edges_df(spark, edges))
    assert inc == sum(nx.triangles(nxg).values()) // 3
    # replay the same edges reversed + self loops: zero increment
    state = state.persist()
    noise = [(v, u) for u, v in edges] + [(3, 3), (1, 1)]
    state2, inc2 = merge_triangle_batch(state, _edges_df(spark, noise))
    assert inc2 == 0
    assert state2.count() == state.count()


def test_streaming_wiring_availablenow(spark, tmp_path):
    nxg = nx.gnp_random_graph(40, 0.15, seed=3)
    edges = [(int(u), int(v)) for u, v in nxg.edges()]
    feed = str(tmp_path / "feed")
    for i in range(3):
        _edges_df(spark, edges[i::3]).write.mode("overwrite").parquet(
            f"{feed}/chunk={i}"
        )
    q = incremental_triangles(
        spark,
        feed,
        str(tmp_path / "store"),
        str(tmp_path / "ckpt"),
        max_files_per_trigger=1,
    )
    q.awaitTermination()
    _, total = read_state(spark, str(tmp_path / "store"))
    G = from_networkx(spark, nxg)
    assert total == total_triangles(G) == sum(nx.triangles(nxg).values()) // 3
