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
