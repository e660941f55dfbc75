"""SparkSession factory tuned for the link-graph engine.

Local-mode defaults mirror what we would set per-executor on a real
cluster: AQE on (runtime shuffle coalescing + skew-join splitting),
Arrow on (every pandas UDF crosses via Arrow batches), shuffle
partitions sized to cores rather than the 200 default, UTC timezone
pinned so DuckDB-oracle comparisons are stable.

At 100 TB the same settings translate to: AQE + skew join handle
moderate skew, ``spark.sql.shuffle.partitions`` sized to ~2-3x total
cores, ``spark.sql.files.maxPartitionBytes`` left at 128 MiB so scans
parallelize, and broadcast threshold raised so per-iteration frontier/
rank vectors (small relative to edges) broadcast instead of shuffling.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "graphblas-algorithms-spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    driver_memory: str = "24g",
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    ``cores=None`` honours ``$SPARK_GRAFT_CPUS`` (driver contract).
    """
    cores = cores or DEFAULT_CPUS
    shuffle_partitions = shuffle_partitions or cores
    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", driver_memory)
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # ParallelGC over G1 for this batch/iterative profile: measured 4->16
        # core scaling efficiency 0.75 -> 0.77 and CPU work inflation
        # 1.27 -> 1.09 on the 111M-edge pagerank superstep (BENCH/BASELINE.md)
        .config("spark.driver.extraJavaOptions", "-XX:+UseParallelGC")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    _lineage_cut_canary(spark)
    return spark


def _lineage_cut_canary(spark: SparkSession) -> None:
    """Session-start canary for the private-API coupling in
    plans/superstep.py: ``lineage_cut`` rebuilds frames through
    ``SparkSession.internalCreateDataFrame``, which a Spark upgrade can
    remove or change SILENTLY — the code falls back to plain
    localCheckpoint (correct but re-poisons the stats estimate the cut
    exists to drop, degrading iterative kernels by orders of magnitude
    past ~17 supersteps).  Turn that silent degrade into a loud warning
    once per session (VERDICT r4 #9); the pyproject pin (<4.2) marks the
    validated range."""
    if getattr(spark, "_gas_canary_ok", False):
        return
    try:
        from .plans.superstep import _release_state, lineage_cut

        probe = lineage_cut(spark.range(2).toDF("id"))
        ok = getattr(probe, "_gas_ckpt", None) is not None and probe.count() == 2
        _release_state(probe)
    except Exception:
        ok = False
    if not ok:
        import warnings

        warnings.warn(
            "lineage_cut fell back to plain localCheckpoint on this Spark "
            f"version ({spark.version}): internalCreateDataFrame is missing "
            "or changed.  Iterative kernels remain CORRECT but will slow "
            "dramatically past ~17 supersteps (stats re-poisoning; see "
            "plans/superstep.py).  Re-validate the private API against this "
            "Spark release.",
            RuntimeWarning,
            stacklevel=2,
        )
    spark._gas_canary_ok = True


def stop_spark() -> None:
    """Stop the active session (used by the two-parallelism bench)."""
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()


def tune_shuffle_partitions(
    spark: SparkSession,
    n_rows: int,
    rows_per_partition: int = 10_000,
    min_parts: int = 2,
    max_parts: int | None = None,
) -> int:
    """Size-aware shuffle width for iterative kernels (runtime conf).

    Small graphs are scheduling-floor bound at full core width: the
    per-superstep shuffle launches one task per partition regardless of
    rows, and explicit ``repartition(N, key)`` pins N past AQE's
    coalescer.  Measured on the 77k-edge bench corpus at local[32]:
    converged PageRank 23.4 s at 32 partitions vs 9.8 s at 8 — identical
    results, 2.4x wall.  At 100 TB the same rule keeps partitions near
    the ~128 MiB sweet spot instead of exploding task counts.

    Sets ``spark.sql.shuffle.partitions`` (a runtime conf) and returns
    the chosen width; kernels pick it up through groupBy/repartition.
    The conf change is session-global and intentionally outlives the
    kernel that tuned it (the next kernel on the same graph wants the
    same width); callers that need the old width back can save
    ``spark.conf.get("spark.sql.shuffle.partitions")`` first.

    The cap wins over the floor: ``min_parts`` only raises the width up
    to ``max_parts`` (a ``local[1]`` caller with ``max_parts=1`` gets 1,
    never 2).
    """
    cap = max_parts or int(spark.conf.get("spark.sql.shuffle.partitions"))
    parts = max(1, min(cap, max(min_parts, n_rows // rows_per_partition or 1)))
    spark.conf.set("spark.sql.shuffle.partitions", str(parts))
    return parts
