"""Incremental connected components over a stream of edge batches.

A link graph at corpus scale is never loaded once — edges arrive as
crawls / repo pushes land.  Recomputing full CC per micro-batch is
O(total edges) every batch; this module maintains the labeling
incrementally: each batch is CONTRACTED through the current labels
(endpoints replaced by their component ids), edges that land inside one
component are dropped, and star contraction
(operators/components.py:connected_components_star) runs on the tiny
residual component-merge graph only.  Per-batch work is
O(|batch| + |affected components|), independent of the accumulated
edge count.

Exactness: labels are always the min node id per component over ALL
edges seen so far — the same contract as the batch kernels, so a
replayed stream is bit-equal to one batch ``connected_components`` run
over the full edge set (pytest-gated, and driver-oracled as
``graph_components_incremental`` against the same recursive-CTE SQL
oracle as ``graph_components``).

State layout (the 100 TB shape):

* Executor state is ZERO (same design as streaming/corpus.py): the
  label store is parquet, one FULL snapshot per epoch under
  ``epoch=N`` written in overwrite mode, so an at-least-once replay of
  a micro-batch rewrites the same snapshot instead of corrupting it —
  idempotent, effectively exactly-once.  Labels are O(nodes), much
  smaller than edges; at trillion-node scale swap the full snapshot
  for a delta log + periodic compaction (the merge algebra below is
  unchanged — snapshots are only how state is persisted).
* The contraction join shuffles the BATCH against the label store scan;
  bucket the store by id (sources/edges.py:write_edges_bucketed
  pattern) to make the store side exchange-free for large batches.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_EDGE_SCHEMA = "src long, dst long"
_LABEL_SCHEMA = "id long, component long"


def read_labels(spark: SparkSession, store_dir: str) -> DataFrame:
    """Current (id, component) snapshot — the newest complete epoch;
    empty frame if the store does not exist yet."""
    if not os.path.isdir(store_dir):
        return spark.createDataFrame([], _LABEL_SCHEMA)
    epochs = [
        int(n.split("=")[1])
        for n in os.listdir(store_dir)
        if n.startswith("epoch=") and os.path.exists(
            os.path.join(store_dir, n, "_SUCCESS")
        )
    ]
    if not epochs:
        return spark.createDataFrame([], _LABEL_SCHEMA)
    return (
        spark.read.schema(_LABEL_SCHEMA)
        .parquet(os.path.join(store_dir, f"epoch={max(epochs)}"))
    )


def merge_edge_batch(labels: DataFrame, batch_edges: DataFrame) -> DataFrame:
    """New full labeling after one edge batch — pure, deterministic.

    1. contract: endpoints -> current component ids (unseen nodes are
       their own component), drop intra-component edges;
    2. star-contract the residual merge graph (old component ids as
       nodes) -> old component -> new component mapping;
    3. remap the store and attach brand-new nodes.
    """
    from ..classes.graph import Graph
    from ..operators.components import connected_components_star

    spark = batch_edges.sparkSession
    e = batch_edges.select("src", "dst").filter(F.col("src") != F.col("dst"))
    contracted = (
        e.join(
            labels.select(F.col("id").alias("src"), F.col("component").alias("_cs")),
            "src",
            "left",
        )
        .join(
            labels.select(F.col("id").alias("dst"), F.col("component").alias("_cd")),
            "dst",
            "left",
        )
        .select(
            F.coalesce("_cs", F.col("src")).alias("src"),
            F.coalesce("_cd", F.col("dst")).alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    new_nodes = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
        .join(labels.select("id"), "id", "left_anti")
        .persist()
    )
    if contracted.limit(1).count() == 0:
        # batch adds no cross-component edges: only register new nodes
        out = labels.unionByName(
            new_nodes.select("id", F.col("id").alias("component"))
        )
        new_nodes.unpersist()
        return out
    cnodes = (
        contracted.select(F.col("src").alias("id"))
        .unionByName(contracted.select(F.col("dst").alias("id")))
        .distinct()
    )
    mapping = connected_components_star(
        Graph(contracted, cnodes, canonicalize=False)
    ).select(F.col("id").alias("_old"), F.col("component").alias("_new"))
    remapped = (
        labels.unionByName(new_nodes.select("id", F.col("id").alias("component")))
        .join(mapping, F.col("component") == F.col("_old"), "left")
        .select("id", F.coalesce("_new", F.col("component")).alias("component"))
    )
    new_nodes.unpersist()
    return remapped


def incremental_components(
    spark: SparkSession,
    edges_stream_dir: str,
    store_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
):
    """Start the maintenance stream; returns the StreamingQuery.

    Reads edge parquet files as they appear under ``edges_stream_dir``
    and keeps ``store_dir`` holding the labeling of everything seen.
    ``max_files_per_trigger`` caps files per micro-batch (availableNow
    honors it), forcing genuinely incremental merges over a backlog."""
    reader = spark.readStream.schema(_EDGE_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    src = reader.parquet(edges_stream_dir)

    def sink(batch_df: DataFrame, epoch: int) -> None:
        sess = batch_df.sparkSession
        batch_df = batch_df.persist()
        try:
            labels = read_labels(sess, store_dir)
            updated = merge_edge_batch(labels, batch_df)
            updated.write.mode("overwrite").parquet(
                os.path.join(store_dir, f"epoch={epoch}")
            )
        finally:
            batch_df.unpersist()

    return (
        src.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
