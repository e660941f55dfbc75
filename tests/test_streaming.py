"""Structured Streaming surface: streaming result over a finite parquet
input must equal the batch-equivalent query."""

from __future__ import annotations

import math

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
                agg[sid] = [ts, 0, 0]
            agg[sid][1] += 1
            # the dyadic scaled-integer sum contract (events._sum_value):
            # snap each value to the 2^-20 grid, accumulate exact ints
            agg[sid][2] += math.floor(val * 1048576.0)
            prev = ts
        for sid, (start, n, sv) in agg.items():
            want[(uid, sid)] = (start, n, sv / 1048576.0)
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


def test_dedup_stream_bounded_state_equals_batch(spark, tmp_path):
    """dropDuplicatesWithinWatermark must keep exactly one row per key on
    a finite feed whose duplicates arrive within the watermark, matching
    the batch dedup's surviving key set."""
    import datetime as dt

    from graphblas_algorithms_spark.streaming.events import (
        EVENT_SCHEMA,
        dedup_batch,
        dedup_stream,
    )

    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
    rows = []
    eid = 0
    for key in range(8):
        n_copies = 1 + key % 3  # keys 0,3,6 unique; others duplicated
        for c in range(n_copies):
            rows.append(
                (
                    eid,
                    t0 + dt.timedelta(minutes=key * 10 + c),
                    key % 4,
                    f"type{key % 2}",
                    float(key),
                    "{}",
                )
            )
            eid += 1
    feed_dir = str(tmp_path / "feed")
    out_dir = str(tmp_path / "out")
    spark.createDataFrame(rows, schema=EVENT_SCHEMA).coalesce(1).write.parquet(feed_dir)

    keys = ["user_id", "event_type", "value"]
    q = dedup_stream(spark, feed_dir, out_dir, keys=keys, watermark="2 hours")
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.read.parquet(f"{out_dir}/data")
    want = dedup_batch(spark.read.parquet(feed_dir), keys=keys)
    got_keys = sorted(map(tuple, got.select(*keys).collect()))
    want_keys = sorted(map(tuple, want.select(*keys).collect()))
    assert got_keys == want_keys
    # exactly one survivor per key: state was bounded AND complete
    assert got.count() == got.select(*keys).distinct().count() == 8


def test_stream_source_path_rules(tmp_path):
    """Single plain files get the one-char-glob rewrite; files whose path
    contains glob metacharacters are rejected loudly instead of being
    rewritten into a pattern that could match the wrong files (ADVICE r2);
    directories pass through untouched."""
    from graphblas_algorithms_spark.streaming.events import _stream_source_path

    f = tmp_path / "events.parquet"
    f.write_bytes(b"x")
    got = _stream_source_path(str(f))
    assert got == f"{str(f)[:-1]}[t]"
    d = tmp_path / "adir"
    d.mkdir()
    assert _stream_source_path(str(d)) == str(d)
    weird = tmp_path / "ev[1].parquet"
    weird.write_bytes(b"x")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="glob"):
        _stream_source_path(str(weird))


def test_stream_source_path_rules(tmp_path):
    """Single plain files get the one-char-glob rewrite; files whose path
    contains glob metacharacters are rejected loudly instead of being
    rewritten into a pattern that could match the wrong files (ADVICE r2);
    directories pass through untouched."""
    from graphblas_algorithms_spark.streaming.events import _stream_source_path

    f = tmp_path / "events.parquet"
    f.write_bytes(b"x")
    got = _stream_source_path(str(f))
    assert got == str(f)[:-1] + "[t]"
    d = tmp_path / "adir"
    d.mkdir()
    assert _stream_source_path(str(d)) == str(d)
    weird = tmp_path / "ev[1].parquet"
    weird.write_bytes(b"x")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="glob"):
        _stream_source_path(str(weird))


def test_incremental_corpus_dedup_unbounded_horizon(spark, tmp_path):
    """Two ingest waves: exact dups are suppressed within a batch (min
    doc_id wins), across batches, and across RESTARTS — wave 2 runs in a
    fresh query but the on-disk fingerprint store still suppresses a
    duplicate of wave-1 text (the unbounded horizon dedup_stream's
    watermark cannot provide).  Kept set == sequential batch oracle."""
    from graphblas_algorithms_spark.streaming.corpus import (
        DOC_SCHEMA,
        incremental_corpus_dedup,
        read_corpus,
        read_store,
    )

    src = tmp_path / "src"
    out, store, ckpt = (
        str(tmp_path / "out"),
        str(tmp_path / "store"),
        str(tmp_path / "ckpt"),
    )
    src.mkdir()

    def doc(i, text):
        return (i, text, "en", f"src{i % 3}", len(text))

    wave1 = [doc(1, "alpha beta gamma"), doc(2, "delta epsilon"),
             doc(7, "Alpha  beta   GAMMA")]  # 7 normalizes to 1's text
    wave2 = [doc(3, "zeta eta theta"), doc(4, "alpha beta gamma"),  # dup of 1
             doc(6, "zeta eta theta zzz"), doc(5, "zeta eta theta zzz")]  # 5 wins

    import glob as _glob
    import shutil as _shutil

    def drop(rows, name):
        # the file stream source lists flat files: write via Spark then
        # move the part files into the watched dir under a unique name
        tmp = tmp_path / f"_stage_{name}"
        spark.createDataFrame(rows, DOC_SCHEMA).coalesce(1).write.parquet(str(tmp))
        for i, p in enumerate(_glob.glob(f"{tmp}/part-*.parquet")):
            _shutil.copy(p, src / f"{name}_{i}.parquet")

    drop(wave1, "w1")
    q = incremental_corpus_dedup(spark, str(src), out, store, ckpt)
    q.awaitTermination(120)

    drop(wave2, "w2")
    q = incremental_corpus_dedup(spark, str(src), out, store, ckpt)
    q.awaitTermination(120)

    kept = sorted(r["doc_id"] for r in read_corpus(spark, out).collect())
    assert kept == [1, 2, 3, 5]

    st = read_store(spark, store).collect()
    assert len(st) == 4 and len({r["fingerprint"] for r in st}) == 4

    # restart with the SAME checkpoint and no new files: a no-op — the
    # source offset log already covers every file, nothing is rewritten
    q = incremental_corpus_dedup(spark, str(src), out, store, ckpt)
    q.awaitTermination(120)
    assert sorted(
        r["doc_id"] for r in read_corpus(spark, out).collect()
    ) == [1, 2, 3, 5]
