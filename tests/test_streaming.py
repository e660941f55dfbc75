"""Structured Streaming surface: streaming result over a finite parquet
input must equal the batch-equivalent query."""

from __future__ import annotations

import pytest

from graphblas_algorithms_spark.streaming.events import (
    sessionize_batch,
    windowed_counts_batch,
    windowed_counts_stream,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(f"{SF}/events.parquet").persist()


def test_windowed_counts_stream_equals_batch(spark, events):
    q = windowed_counts_stream(spark, f"{SF}/events.parquet", minutes=60)
    try:
        q.processAllAvailable()
        got = {
            (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
            for r in spark.sql("SELECT * FROM windowed_counts").collect()
        }
    finally:
        q.stop()
    want = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in windowed_counts_batch(events, minutes=60).collect()
    }
    assert got == want
    assert len(want) > 10


def test_sessionize_batch_oracle(spark, events):
    rows = sessionize_batch(events, gap_minutes=30).collect()
    # python oracle
    by_user = {}
    for r in events.select("user_id", "ts", "value").collect():
        by_user.setdefault(r["user_id"], []).append((r["ts"], r["value"]))
    want = {}
    for uid, evs in by_user.items():
        evs.sort()
        sid = 0
        prev = None
        agg = {}
        for ts, val in evs:
            if prev is None or (ts - prev).total_seconds() > 30 * 60:
                sid += 1
                agg[sid] = [ts, 0, 0.0]
            agg[sid][1] += 1
            agg[sid][2] += val
            prev = ts
        for sid, (start, n, sv) in agg.items():
            want[(uid, sid)] = (start, n, round(sv, 6))
    got = {
        (r["user_id"], r["session_id"]): (r["session_start"], r["n_events"], r["sum_value"])
        for r in rows
    }
    assert got == want


def test_windowed_append_mode_bounded_state(spark, events, tmp_path):
    """Append-mode + watermark: emits exactly the windows the watermark
    has closed (end <= max(ts) - watermark), then drops their state."""
    from pyspark.sql import functions as F

    from graphblas_algorithms_spark.streaming.events import (
        windowed_counts_stream_append,
    )

    q = windowed_counts_stream_append(
        spark, f"{SF}/events.parquet", str(tmp_path / "out"),
        minutes=60, watermark="2 hours",
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.read.parquet(str(tmp_path / "out" / "data")).collect()
    }
    max_ts = events.agg(F.max("ts")).collect()[0][0]
    import datetime

    cutoff = max_ts - datetime.timedelta(hours=2)
    want = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in windowed_counts_batch(events, minutes=60).collect()
        if r["window_start"] + datetime.timedelta(minutes=60) <= cutoff
    }
    assert got == want
    assert len(want) > 5  # the finite input must actually close windows


def test_sessionize_stateful_closed_sessions(spark, events):
    """applyInPandasWithState sessionizer: on a finite single-batch input
    it emits every session CLOSED by a gap; each user's trailing open
    session stays in state (flushed only by a later timeout trigger)."""
    from graphblas_algorithms_spark.streaming.events import sessionize_stateful

    q = sessionize_stateful(spark, f"{SF}/events.parquet", gap_minutes=30,
                            query_name="stateful_sessions_t")
    try:
        q.processAllAvailable()
        got = {
            (r["user_id"], r["session_start"]): (r["n_events"], r["sum_value"])
            for r in spark.sql("SELECT * FROM stateful_sessions_t").collect()
        }
    finally:
        q.stop()
    # batch oracle minus each user's final session
    sess = sessionize_batch(events, gap_minutes=30).collect()
    last = {}
    for r in sess:
        cur = last.get(r["user_id"])
        if cur is None or r["session_start"] > cur:
            last[r["user_id"]] = r["session_start"]
    want = {
        (r["user_id"], r["session_start"]): (r["n_events"], r["sum_value"])
        for r in sess
        if r["session_start"] != last[r["user_id"]]
    }
    assert got == want
    assert len(want) > 50
