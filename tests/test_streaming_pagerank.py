"""Incremental PageRank: warm-started stream result must agree with the
batch kernel over the accumulated edges, in fewer supersteps."""

from __future__ import annotations

import os
import random

from pyspark.sql import functions as F

from graphblas_algorithms_spark.classes.graph import DiGraph
from graphblas_algorithms_spark.operators.pagerank import pagerank
from graphblas_algorithms_spark.streaming.pagerank import (
    incremental_pagerank,
    read_metrics,
    read_scores,
)


def _chunks(seed=5, n_nodes=300, n_edges=900, k=3):
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


def _batch_scores(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    nodes = (
        df.select(F.col("src").alias("id"))
        .unionByName(df.select(F.col("dst").alias("id")))
        .distinct()
    )
    return {
        r["id"]: r["rank"]
        for r in pagerank(DiGraph(df, nodes, dedup=True), tol=1e-9).collect()
    }


def test_incremental_pagerank_stream(spark, tmp_path):
    chunks = _chunks()
    feed = str(tmp_path / "feed")
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(feed)
    for i, c in enumerate(chunks):
        spark.createDataFrame(c, "src long, dst long").coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{feed}/chunk={i}")

    # tol_abs: the wrapper's scale-correct default (1e-4 of total mass)
    # is looser than n*tol at toy n; pin the absolute gate tight so the
    # stream-vs-batch comparison below stays meaningful
    q = incremental_pagerank(
        spark, feed, store, ckpt, tol=1e-9, tol_abs=1e-9, max_files_per_trigger=1
    )
    q.awaitTermination()

    got = {r["id"]: r["rank"] for r in read_scores(spark, store).collect()}
    want = _batch_scores(spark, [e for c in chunks for e in c])
    assert set(got) == set(want)
    worst = max(abs(got[k] - want[k]) for k in want)
    assert worst < 1e-6, worst

    metrics = read_metrics(store)
    assert len(metrics) == 3
    assert metrics[0]["warm_start"] is False
    assert all(m["warm_start"] for m in metrics[1:])
    # warm epochs add ~1/3 of the edges each; they must converge in
    # fewer supersteps than the cold epoch needed
    assert metrics[-1]["iterations"] < metrics[0]["iterations"], metrics
