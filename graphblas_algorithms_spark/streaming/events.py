"""Structured Streaming over the events table.

The reference is batch-only (SURVEY §2.2 "not present" note), but the
engine targets pipelines where the link graph and quality signals update
incrementally.  This module gives the streaming surface: watermarked
tumbling-window aggregation, sessionization, and a stateful
edge-accumulator — each with a batch-equivalent used by the DuckDB
oracle (streaming results on a finite input == the batch query; that is
the test).

events(event_id: long, ts: timestamp, user_id: long,
       event_type: string, value: double, props: string-json)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: 2^20 — the dyadic grid shared with the funnel/ANF/feature-prop contract.
_DY = 1048576.0


def _sum_value():
    """Order-independent ``SUM(value)``: floor-snap each value to the
    2^-20 dyadic grid (exact power-of-two scaling), SUM as exact BIGINT,
    divide once (sum < 2^53, so the quotient is an exact double).  Float
    SUM is aggregation-order-dependent — the r4 ``events_funnel`` hash
    flip — and ``events.value`` is 2-decimal (non-dyadic), so every
    value-sum on this surface carries the same scaled-integer contract
    (pipeline/funnel.py, operators/features.py, anf.py)."""
    return (
        F.sum(F.floor(F.col("value") * F.lit(_DY)).cast("long")) / F.lit(_DY)
    ).alias("sum_value")


def _stream_source_path(path: str) -> str:
    """Resolve a user path into a FileStreamSource-safe pattern.

    FileStreamSource derives ``basePath`` from the path: a bare FILE path
    (the driver testdata ships single-file tables) errors with "Option
    'basePath' must be a directory".  For a plain single file we turn the
    last character into a one-character glob so basePath resolves to the
    parent directory.  That rewrite is only sound when the path contains
    no OTHER glob metacharacters — ``*?[]{}`` anywhere else would make
    the rewritten pattern match wrong files or nothing, silently — so
    such paths are rejected with a clear error instead (point the stream
    at a directory in that case)."""
    import os

    if not os.path.isfile(path):
        return path
    if any(c in path for c in "*?[]{}"):
        raise ValueError(
            f"streaming source file path {path!r} contains glob "
            "metacharacters; pass a directory instead (FileStreamSource "
            "treats paths as glob patterns)"
        )
    return f"{path[:-1]}[{path[-1]}]"


EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)


def windowed_counts_batch(events: DataFrame, minutes: int = 60) -> DataFrame:
    """Batch-equivalent tumbling-window agg (the oracle-comparable shape):
    (window_start, event_type, n_events, sum_value)."""
    win = F.window("ts", f"{minutes} minutes")
    return (
        events.groupBy(win.alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            _sum_value(),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def windowed_counts_stream(
    spark: SparkSession, parquet_dir: str, minutes: int = 60, watermark: str = "2 hours"
):
    """The same aggregation as a streaming query over a parquet source
    with a watermark; returns the started query (memory sink).  Use
    ``q.processAllAvailable()`` then read ``spark.sql(...)``."""
    parquet_dir = _stream_source_path(parquet_dir)
    src = (
        spark.readStream.schema(EVENT_SCHEMA)
        .parquet(parquet_dir)
        .withWatermark("ts", watermark)
    )
    agg = (
        src.groupBy(F.window("ts", f"{minutes} minutes").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            _sum_value(),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
    return (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("windowed_counts")
        .start()
    )


def windowed_counts_stream_append(
    spark: SparkSession,
    parquet_dir: str,
    out_dir: str,
    minutes: int = 60,
    watermark: str = "2 hours",
):
    """Bounded-state production shape of :func:`windowed_counts_stream`:
    ``outputMode("append")`` + file sink.  A window row is emitted once,
    when the watermark passes its end, and its state is then DROPPED —
    unlike complete-mode (test-only), state never grows with stream
    length.  On a finite input only windows whose end <= max(ts) -
    watermark are emitted (the rest are still open when the source runs
    dry); the test compares exactly that closed subset against the batch
    equivalent."""
    parquet_dir = _stream_source_path(parquet_dir)
    src = (
        spark.readStream.schema(EVENT_SCHEMA)
        .parquet(parquet_dir)
        .withWatermark("ts", watermark)
    )
    agg = (
        src.groupBy(F.window("ts", f"{minutes} minutes").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            _sum_value(),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
    return (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", f"{out_dir}/data")
        .option("checkpointLocation", f"{out_dir}/_ckpt")
        .start()
    )


def sessionize_stateful(
    spark: SparkSession,
    parquet_dir: str,
    gap_minutes: int = 30,
    query_name: str = "stateful_sessions",
    timeout_minutes: float | None = None,
):
    """Custom stateful sessionization via ``applyInPandasWithState`` —
    the arbitrary-state API the built-in ``session_window`` cannot
    express variants of (e.g. value-weighted gap rules).  Per user_id the
    state is the one OPEN session (start, last_ts, n, sum); each Arrow
    batch merges its rows in event-time order, emits every session
    CLOSED by a gap > threshold, and parks the trailing open session
    back in state.  State is O(#active-users), not O(stream), and each
    group's batch is one vectorized pandas pass.

    ``timeout_minutes`` (production knob, default off): arm a
    processing-time timeout so idle users' open sessions are flushed by
    a later trigger.  Leave it ``None`` on finite inputs — pending
    timeouts keep scheduling empty micro-batches after the source runs
    dry, so ``processAllAvailable`` spins instead of returning.

    On a finite input with no timeout, emitted rows == batch
    sessionization minus each user's final (still-open) session — the
    deterministic subset the test oracles."""
    import numpy as np
    import pandas as pd

    from pyspark.sql.streaming.state import GroupStateTimeout

    parquet_dir = _stream_source_path(parquet_dir)
    gap_us = gap_minutes * 60 * 1_000_000

    out_schema = (
        "user_id long, session_start timestamp, n_events long, sum_value double"
    )
    # s carries the session's value sum as a scaled BIGINT on the 2^-20
    # dyadic grid (the _sum_value contract) — exact across batch splits
    state_schema = "start_us long, last_us long, n long, s long"

    def _fn(key, pdf_iter, state):
        (user_id,) = key
        rows = []  # closed sessions to emit
        if state.hasTimedOut:
            st, last, n, s = state.get
            rows.append((st, n, s))
            state.remove()
        else:
            cur = state.get if state.exists else None
            for pdf in pdf_iter:
                if not len(pdf):
                    continue
                ts_us = (
                    pd.to_datetime(pdf["ts"]).astype("int64") // 1000
                ).to_numpy()  # microseconds since epoch
                order = ts_us.argsort(kind="stable")
                # snap to the dyadic grid BEFORE summing (the _sum_value
                # contract): int64 accumulation is order-exact
                vals = np.floor(
                    pdf["value"].to_numpy(dtype=np.float64)[order] * _DY
                ).astype(np.int64)
                ts_us = ts_us[order]
                # Vectorized gap split: a session boundary sits wherever
                # the inter-event gap exceeds the threshold.  Segment
                # starts -> reduceat aggregates; Python touches only the
                # state boundary, never per-event rows.
                starts = np.flatnonzero(
                    np.concatenate(([True], np.diff(ts_us) > gap_us))
                )
                seg_start = ts_us[starts]
                seg_last = ts_us[np.concatenate((starts[1:] - 1, [len(ts_us) - 1]))]
                seg_n = np.diff(np.concatenate((starts, [len(ts_us)])))
                seg_sum = np.add.reduceat(vals, starts)
                i0 = 0
                if cur is not None:
                    if ts_us[0] - cur[1] <= gap_us:
                        # batch's first segment continues the open session
                        cur = (
                            cur[0],
                            int(seg_last[0]),
                            cur[2] + int(seg_n[0]),
                            cur[3] + int(seg_sum[0]),
                        )
                        i0 = 1
                    else:
                        rows.append((cur[0], cur[2], cur[3]))
                        cur = None
                if i0 < len(starts):
                    # all complete segments except the trailing one close now
                    if cur is not None:
                        rows.append((cur[0], cur[2], cur[3]))
                    for j in range(i0, len(starts) - 1):
                        rows.append(
                            (int(seg_start[j]), int(seg_n[j]), int(seg_sum[j]))
                        )
                    j = len(starts) - 1
                    cur = (
                        int(seg_start[j]),
                        int(seg_last[j]),
                        int(seg_n[j]),
                        int(seg_sum[j]),
                    )
            if cur is not None:
                state.update(cur)
                if timeout_minutes is not None:
                    state.setTimeoutDuration(int(timeout_minutes * 60_000))
        if rows:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(rows),
                    "session_start": pd.to_datetime(
                        [r[0] * 1000 for r in rows], unit="ns"
                    ),
                    "n_events": [r[1] for r in rows],
                    "sum_value": [r[2] / _DY for r in rows],
                }
            )

    src = spark.readStream.schema(EVENT_SCHEMA).parquet(parquet_dir)
    sessions = src.groupBy("user_id").applyInPandasWithState(
        _fn,
        out_schema,
        state_schema,
        "append",
        GroupStateTimeout.ProcessingTimeTimeout
        if timeout_minutes is not None
        else GroupStateTimeout.NoTimeout,
    )
    return (
        sessions.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .start()
    )


def sessionize_batch(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """(user_id, session_id, session_start, n_events, sum_value) — classic
    lag+cumsum sessionization (gap > threshold starts a session).  Batch
    shape; the streaming analog is ``session_window``/
    ``applyInPandasWithState`` below."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    marked = events.withColumn(
        "_new",
        F.when(gap.isNull() | (gap > gap_minutes * 60), 1).otherwise(0),
    ).withColumn("session_id", F.sum("_new").over(w))
    return marked.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.count("*").alias("n_events"),
        _sum_value(),
    )


def sessionize_stream(
    spark: SparkSession, parquet_dir: str, gap_minutes: int = 30
):
    """Streaming sessionization via the built-in ``session_window``."""
    src = (
        spark.readStream.schema(EVENT_SCHEMA)
        .parquet(parquet_dir)
        .withWatermark("ts", "1 hour")
    )
    agg = (
        src.groupBy(
            F.session_window("ts", f"{gap_minutes} minutes").alias("w"), "user_id"
        )
        .agg(F.count("*").alias("n_events"), _sum_value())
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            "n_events",
            "sum_value",
        )
    )
    return (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("sessions")
        .start()
    )


def streaming_edge_accumulator(
    spark: SparkSession, parquet_dir: str, checkpoint_dir: str
):
    """Incremental link-graph maintenance: treat (user_id, event_type) as
    an edge stream and maintain per-edge counts exactly-once via
    ``foreachBatch`` + idempotent parquet overwrite by epoch."""
    src = spark.readStream.schema(EVENT_SCHEMA).parquet(parquet_dir)
    edges = src.select(
        F.col("user_id").alias("src"),
        F.abs(F.xxhash64("event_type")).alias("dst"),
    )

    def sink(batch_df: DataFrame, epoch: int) -> None:
        (
            batch_df.groupBy("src", "dst")
            .agg(F.count("*").alias("weight"))
            .write.mode("overwrite")
            .parquet(f"{checkpoint_dir}/epoch={epoch}")
        )

    return (
        edges.writeStream.foreachBatch(sink)
        .option("checkpointLocation", f"{checkpoint_dir}/_ckpt")
        .start()
    )


def dedup_stream(
    spark: SparkSession,
    parquet_dir: str,
    out_dir: str,
    keys: list[str] | None = None,
    watermark: str = "2 hours",
):
    """Streaming exact-dedup with BOUNDED state:
    ``dropDuplicatesWithinWatermark`` keeps a key's fingerprint only
    until the watermark passes its event time, then drops it — the
    streaming analog of the batch exact-dedup groupBy
    (``pipeline/dedup.py``), sized for ingest feeds where duplicates
    arrive close together (retries, replays, at-least-once sources)
    rather than arbitrarily late.  Append-mode file sink; each surviving
    row is emitted exactly once.

    Batch equivalence on a finite input: every duplicate pair in the
    test feed lands inside one watermark span, so the surviving set ==
    ``dedup_batch`` (ties broken by arrival order within a micro-batch;
    with one input file that is parquet row order).
    """
    parquet_dir = _stream_source_path(parquet_dir)
    keys = keys or ["user_id", "event_type", "value"]
    src = (
        spark.readStream.schema(EVENT_SCHEMA)
        .parquet(parquet_dir)
        .withWatermark("ts", watermark)
    )
    deduped = src.dropDuplicatesWithinWatermark(keys)
    return (
        deduped.writeStream.outputMode("append")
        .format("parquet")
        .option("path", f"{out_dir}/data")
        .option("checkpointLocation", f"{out_dir}/_ckpt")
        .start()
    )


def dedup_batch(events: DataFrame, keys: list[str] | None = None) -> DataFrame:
    """Batch equivalent of :func:`dedup_stream` on a finite input: keep
    the earliest event (min ts, then min event_id) per key group."""
    keys = keys or ["user_id", "event_type", "value"]
    w_cols = [F.col(k) for k in keys]
    ranked = events.withColumn(
        "_rk",
        F.row_number().over(
            Window.partitionBy(*w_cols).orderBy(F.asc("ts"), F.asc("event_id"))
        ),
    )
    return ranked.filter(F.col("_rk") == 1).drop("_rk")
