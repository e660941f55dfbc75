"""Incremental corpus ingestion: streaming exact-dedup against an
on-disk fingerprint store with an UNBOUNDED suppression horizon.

``dedup_stream`` (streaming/events.py) bounds executor state with a
watermark — the right trade for telemetry feeds, but a training-corpus
ingest must suppress a duplicate document no matter how much later it
arrives (re-crawls recur months apart).  This module keeps the dedup
state on storage instead of in executors: each micro-batch is
fingerprinted (same normalization as pipeline/text.py:fingerprints, so
batch and streaming dedup agree on identity), anti-joined against the
accumulated store, deduped within the batch (min doc_id wins,
deterministic), and the survivors are appended to the corpus sink while
their fingerprints extend the store.

Scale notes (the 100 TB shape):

* Executor state is ZERO — the store is parquet, so the suppression
  horizon is unbounded while memory stays flat; this is the pattern
  Structured Streaming cannot express with ``dropDuplicates`` state.
* Both per-epoch writes land under ``epoch=N`` directories in
  ``overwrite`` mode, so a replayed micro-batch (foreachBatch is
  at-least-once) rewrites the same files instead of double-appending —
  idempotent, hence effectively exactly-once end-to-end.  Epoch numbers
  are meaningful only within one checkpoint lineage: always restart with
  the SAME ``checkpoint_dir`` (a fresh checkpoint restarts epochs at 0
  and would overwrite earlier output directories).
* The per-batch anti-join shuffles only the BATCH (small) against the
  store scan; bucket the store by fingerprint (sources/edges.py:
  write_edges_bucketed pattern) to make the store side exchange-free
  when batches are large.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..pipeline.text import fingerprints

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("n_chars", T.LongType(), True),
    ]
)

_STORE_SCHEMA = "fingerprint string, doc_id long"


def read_store(spark: SparkSession, store_dir: str) -> DataFrame:
    """The accumulated (fingerprint, doc_id) store; empty if absent."""
    if not os.path.isdir(store_dir) or not any(
        n.startswith("epoch=") for n in os.listdir(store_dir)
    ):
        return spark.createDataFrame([], _STORE_SCHEMA)
    return spark.read.schema(_STORE_SCHEMA).parquet(f"{store_dir}/epoch=*")


def dedup_batch_against_store(
    batch: DataFrame, store: DataFrame
) -> DataFrame:
    """Survivors of one ingest batch: docs whose fingerprint is neither
    in the store nor claimed by a lower doc_id inside the same batch."""
    fp = fingerprints(batch)
    fresh = fp.join(store.select("fingerprint"), "fingerprint", "left_anti")
    winners = fresh.groupBy("fingerprint").agg(F.min("doc_id").alias("doc_id"))
    return batch.join(winners.select("doc_id"), "doc_id")


def incremental_corpus_dedup(
    spark: SparkSession,
    docs_stream_dir: str,
    out_dir: str,
    store_dir: str,
    checkpoint_dir: str,
):
    """Start the ingest stream; returns the StreamingQuery.

    Reads document parquet files as they appear under
    ``docs_stream_dir``; appends globally-novel docs to ``out_dir`` and
    their fingerprints to ``store_dir``, both partitioned by epoch for
    idempotent replay.
    """
    src = spark.readStream.schema(DOC_SCHEMA).parquet(docs_stream_dir)

    def sink(batch_df: DataFrame, epoch: int) -> None:
        batch_df = batch_df.persist()
        try:
            store = read_store(batch_df.sparkSession, store_dir)
            survivors = dedup_batch_against_store(batch_df, store).persist()
            survivors.write.mode("overwrite").parquet(f"{out_dir}/epoch={epoch}")
            fingerprints(survivors).select("fingerprint", "doc_id").write.mode(
                "overwrite"
            ).parquet(f"{store_dir}/epoch={epoch}")
            survivors.unpersist()
        finally:
            batch_df.unpersist()

    return (
        src.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_corpus(spark: SparkSession, out_dir: str) -> DataFrame:
    """The deduped corpus accumulated so far."""
    return spark.read.schema(DOC_SCHEMA).parquet(f"{out_dir}/epoch=*")
