"""Incremental CC maintenance: stream-of-batches result must equal one
batch connected_components run over the accumulated edge set, exactly."""

from __future__ import annotations

import os
import random

import pytest
from pyspark.sql import functions as F

from graphblas_algorithms_spark.classes.graph import Graph
from graphblas_algorithms_spark.operators.components import connected_components
from graphblas_algorithms_spark.streaming.components import (
    incremental_components,
    merge_edge_batch,
    read_labels,
)


def _random_chunks(seed, n_nodes=400, n_edges=500, k=4):
    rng = random.Random(seed)
    pairs = set()
    while len(pairs) < n_edges:
        a, b = rng.randrange(n_nodes), rng.randrange(n_nodes)
        if a != b:
            pairs.add((a, b))
    edges = sorted(pairs)
    rng.shuffle(edges)
    sz = (len(edges) + k - 1) // k
    return [edges[i * sz : (i + 1) * sz] for i in range(k)]


def _full_labels(spark, chunks):
    all_edges = [e for c in chunks for e in c]
    df = spark.createDataFrame(all_edges, "src long, dst long")
    nodes = (
        df.select(F.col("src").alias("id"))
        .unionByName(df.select(F.col("dst").alias("id")))
        .distinct()
    )
    return {
        r["id"]: r["component"]
        for r in connected_components(Graph(df, nodes)).collect()
    }


@pytest.mark.parametrize("seed", [1, 2])
def test_merge_fold_equals_batch(spark, seed):
    chunks = _random_chunks(seed)
    labels = spark.createDataFrame([], "id long, component long")
    for c in chunks:
        batch = spark.createDataFrame(c, "src long, dst long")
        labels = merge_edge_batch(labels, batch).persist()
        labels.count()
    got = {r["id"]: r["component"] for r in labels.collect()}
    assert got == _full_labels(spark, chunks)


def test_merge_is_idempotent(spark):
    chunks = _random_chunks(7, k=2)
    labels = spark.createDataFrame([], "id long, component long")
    for c in chunks:
        batch = spark.createDataFrame(c, "src long, dst long")
        labels = merge_edge_batch(labels, batch).persist()
        labels.count()
    # replay the last batch (at-least-once delivery): labels unchanged
    replay = merge_edge_batch(
        labels, spark.createDataFrame(chunks[-1], "src long, dst long")
    )
    before = {r["id"]: r["component"] for r in labels.collect()}
    after = {r["id"]: r["component"] for r in replay.collect()}
    assert after == before


def test_incremental_stream_end_to_end(spark, tmp_path):
    chunks = _random_chunks(11, k=3)
    feed = str(tmp_path / "feed")
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(feed)

    def write_chunk(i):
        spark.createDataFrame(chunks[i], "src long, dst long").coalesce(
            1
        ).write.mode("overwrite").parquet(f"{feed}/chunk={i}")

    write_chunk(0)
    write_chunk(1)
    q = incremental_components(spark, feed, store, ckpt)
    q.awaitTermination()
    mid = {
        r["id"]: r["component"] for r in read_labels(spark, store).collect()
    }
    assert mid == _full_labels(spark, chunks[:2])

    # a later file: only the delta is processed (same checkpoint)
    write_chunk(2)
    q = incremental_components(spark, feed, store, ckpt)
    q.awaitTermination()
    got = {
        r["id"]: r["component"] for r in read_labels(spark, store).collect()
    }
    assert got == _full_labels(spark, chunks)
