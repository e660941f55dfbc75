"""Superstep harness: materialize / lineage-truncate / checkpoint / resume.

Iterative DataFrame programs (pagerank, components, label prop, BFS, BF)
grow their logical plan every superstep; without truncation Catalyst
re-analyzes an ever-deeper tree and executor stacks blow up.  The
reference materializes ``x`` each iteration instead of nesting lazy
expressions (``pagerank_alg.py:96`` assigns through ``<<``); our analog
(SURVEY §3 "Spark lifecycle") is persist + an action per superstep, with
a hard lineage cut (parquet round-trip or ``localCheckpoint``) every K
supersteps.

Checkpoint layout (north_rule: resumable with per-partition lineage +
metrics)::

    <dir>/iter=K/state/          parquet of the state vector
    <dir>/iter=K/metrics.json    {iter, kernel metrics, per-partition rows,
                                  wall clock, schema}

Resume: ``latest()`` finds the newest complete iter (presence of
``metrics.json`` marks completeness — written AFTER the parquet commit),
reads the state back, and the kernel continues from iter K+1.  A killed
run therefore restarts mid-iteration losing at most one superstep.

Iceberg mode (north_star: "checkpoints frontier and score vectors to
Iceberg"): pass ``checkpoint_table="catalog.db.prefix"`` instead of a
directory and each superstep state goes to the Iceberg table
``<prefix>_iter_<K>`` via ``writeTo(...).createOrReplace()`` with the
same metrics row appended LAST to ``<prefix>_metrics`` as the commit
marker (Iceberg's snapshot commit is atomic, so a killed run leaves at
most an unreferenced orphan table, never a half-visible state).  This
container ships no Iceberg runtime jar, so the path is gated on
:func:`iceberg_available` and exercised only where a catalog is
configured; the parquet layout above is the tested default and is
semantically identical (directory = table, metrics.json = metrics row).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def lineage_cut(df: DataFrame, eager: bool = True) -> DataFrame:
    """localCheckpoint + rebuild a STATS-FREE frame over the checkpointed
    RDD.

    Why not plain ``localCheckpoint``: Spark's ``Dataset.checkpoint``
    carries the ESTIMATED ``Statistics`` of the original plan into the
    replacement ``LogicalRDD`` (``LogicalRDD.rewriteStatsAndConstraints``).
    The size-only estimator multiplies children's ``sizeInBytes`` for a
    join, so an iterative program whose state is join-derived feeds each
    generation's product back in as the next generation's leaf estimate:
    the BigInt's DIGIT COUNT doubles per superstep and the stats pass
    inside the next checkpoint multiplies ~2^k-digit integers — measured
    ~3x wall growth per iteration from superstep ~17 (0.3s -> 99s by
    superstep 22 on a 90-node graph).  Rebuilding the frame with
    ``internalCreateDataFrame`` drops the poisoned estimate (leaf falls
    back to default sizing) while keeping the checkpointed blocks.

    The checkpointed intermediate is attached as ``_gas_ckpt`` so
    :func:`_release_state` can free its blocks when the state retires.
    """
    ck = df.localCheckpoint(eager=eager)
    try:
        spark = df.sparkSession
        jdf = ck._jdf
        jrdd = jdf.queryExecution().toRdd()
        new_jdf = spark._jsparkSession.internalCreateDataFrame(
            jrdd, jdf.schema(), False
        )
        out = DataFrame(new_jdf, spark)
        out._gas_ckpt = ck
        return out
    except Exception:
        return ck  # older/connect sessions: plain checkpoint still correct


def _release_state(df: DataFrame) -> None:
    """Free a retired superstep state, INCLUDING localCheckpoint blocks.

    ``DataFrame.unpersist()`` only uncaches CacheManager entries; a
    localCheckpointed DataFrame's data lives as persisted blocks of the
    underlying RDD, which unpersist() does NOT release.  Left alone,
    every superstep leaks a full state vector into the block manager —
    hundreds of MB per iteration at scale — and the mounting heap
    pressure shows up as 2-3x GC-induced swings in per-superstep CPU
    time.  Walk the analyzed plan for LogicalRDD leaves and unpersist
    their RDDs directly; a frame built by :func:`lineage_cut` releases
    through its attached checkpoint instead.
    """
    df.unpersist()
    ck = getattr(df, "_gas_ckpt", None)
    if ck is not None:
        df._gas_ckpt = None
        _release_state(ck)
        return
    parts = getattr(df, "_gas_parts", None)
    if parts is not None:
        # a union-of-parts result (e.g. SCC's per-round peel batches) owns
        # its parts' checkpoints; the leaf walk below cannot free a
        # lineage_cut part (its LogicalRDD wraps a DERIVED toRdd() child of
        # the persisted checkpoint RDD, so unpersisting the leaf's own RDD
        # is a no-op — r4 finding).  Deliberately shallow everywhere else:
        # a plain-persisted frame must NOT release live upstream
        # checkpoints it merely reads (see the color-ownership note in
        # components.py).
        df._gas_parts = None
        for p in parts:
            _release_state(p)
        return
    try:
        plan = df._jdf.queryExecution().analyzed()
        it = plan.collectLeaves().iterator()
        while it.hasNext():
            leaf = it.next()
            if leaf.getClass().getSimpleName() == "LogicalRDD":
                leaf.rdd().unpersist(False)
    except Exception:
        pass  # best-effort: releasing cache is never correctness-critical


def iceberg_available(spark: SparkSession) -> bool:
    """True when an Iceberg SparkCatalog class is on the session's JVM
    classpath (i.e. ``writeTo(...).using("iceberg")`` can commit)."""
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


class Superstep:
    def __init__(
        self,
        spark: SparkSession,
        checkpoint_dir: str | None = None,
        checkpoint_every: int = 1,
        lineage_cut_every: int = 1,
        checkpoint_table: str | None = None,
    ):
        self.spark = spark
        self.dir = checkpoint_dir
        self.table = checkpoint_table
        if checkpoint_table is not None:
            if checkpoint_dir is not None:
                raise ValueError("pass checkpoint_dir OR checkpoint_table, not both")
            if not iceberg_available(spark):
                raise RuntimeError(
                    "checkpoint_table= needs an Iceberg runtime on the Spark "
                    "classpath (spark.jars.packages org.apache.iceberg:"
                    "iceberg-spark-runtime-*) and a configured catalog; "
                    "use checkpoint_dir= for the parquet layout instead"
                )
            self.dir = checkpoint_table  # non-None => checkpointing enabled
        self.every = max(1, checkpoint_every)
        self.cut_every = max(1, lineage_cut_every)
        self._live: DataFrame | None = None
        self._retiring: DataFrame | None = None
        self._t0 = time.monotonic()

    # ------------------------------------------------------------------
    def _iter_dir(self, it: int) -> str:
        return os.path.join(self.dir, f"iter={it}")

    def _iter_table(self, it: int) -> str:
        return f"{self.table}_iter_{it}"

    def latest(self) -> tuple[int, DataFrame] | None:
        """Newest complete checkpoint (iter, state) or None."""
        if self.table is not None:
            try:
                mx = (
                    self.spark.table(f"{self.table}_metrics")
                    .agg(F.max("iter"))
                    .collect()[0][0]
                )
            except Exception:
                return None  # metrics table absent: no complete checkpoint
            if mx is None:
                return None
            return int(mx), self.spark.table(self._iter_table(int(mx))).persist()
        if self.dir is None or not os.path.isdir(self.dir):
            return None
        done = []
        for name in os.listdir(self.dir):
            if name.startswith("iter="):
                it = int(name.split("=", 1)[1])
                if os.path.exists(os.path.join(self.dir, name, "metrics.json")):
                    done.append(it)
        if not done:
            return None
        it = max(done)
        df = self.spark.read.parquet(os.path.join(self._iter_dir(it), "state"))
        return it, df.persist()

    def read_metrics(self, it: int) -> dict:
        if self.table is not None:
            row = (
                self.spark.table(f"{self.table}_metrics")
                .filter(F.col("iter") == it)
                .collect()[-1]
            )
            payload = json.loads(row["payload"])
            return payload
        with open(os.path.join(self._iter_dir(it), "metrics.json")) as f:
            return json.load(f)

    # ------------------------------------------------------------------
    def materialize(
        self, state: DataFrame, it: int, metrics: dict | None = None, eager: bool = False
    ) -> DataFrame:
        """Persist the new state, cut lineage / checkpoint as configured,
        release older states.  Returns the DataFrame to iterate with.

        The default ``lineage_cut_every=1`` hard-cuts lineage EVERY
        superstep.  This is load-bearing: ``unpersist()`` on an old state
        CASCADES to every cached plan that still references it as a
        subplan (Spark re-cache-invalidation), so a persist-only chain of
        states silently loses its caches each generation and every action
        recomputes the whole chain since the last cut — observed as
        exponential per-iteration wall growth (2s -> 5s -> 17s -> 143s ->
        328s between cuts).  ``localCheckpoint`` replaces the plan with a
        LogicalRDD that has no dependency on older states, so the
        unpersist cascade stops there.
        """
        checkpointing = self.dir is not None and it % self.every == 0
        if checkpointing:
            state = self._checkpoint(state, it, metrics or {})
        elif (it + 1) % self.cut_every == 0:
            # hard lineage cut without durable write.  Lazy: the caller's
            # convergence agg (O12) is the one job that both computes the
            # state and snapshots it, so a superstep costs ONE Spark job;
            # pass eager=True from kernels that run no follow-up action.
            state = lineage_cut(state, eager=eager)
        else:
            state = state.persist()
            if eager:
                state.count()
        if self._retiring is not None:
            _release_state(self._retiring)
        self._retiring = self._live
        self._live = state
        return state

    def _checkpoint(self, state: DataFrame, it: int, metrics: dict) -> DataFrame:
        if self.table is not None:
            state.writeTo(self._iter_table(it)).using("iceberg").createOrReplace()
            reread = self.spark.table(self._iter_table(it)).persist()
        else:
            path = self._iter_dir(it)
            state_path = os.path.join(path, "state")
            state.write.mode("overwrite").parquet(state_path)
            reread = self.spark.read.parquet(state_path).persist()
        # per-partition lineage: rows per output partition of this superstep
        part_rows = {
            str(r["p"]): r["rows"]
            for r in reread.withColumn("p", F.spark_partition_id())
            .groupBy("p")
            .agg(F.count("*").alias("rows"))
            .collect()
        }
        payload = {
            "iter": it,
            "wall_s": round(time.monotonic() - self._t0, 3),
            "schema": reread.schema.simpleString(),
            "partition_rows": part_rows,
            **metrics,
        }
        # metrics written LAST = commit marker for resume
        if self.table is not None:
            row = self.spark.createDataFrame(
                [(it, json.dumps(payload))], "iter int, payload string"
            )
            try:
                row.writeTo(f"{self.table}_metrics").append()
            except Exception:
                row.writeTo(f"{self.table}_metrics").using("iceberg").create()
        else:
            with open(os.path.join(path, "metrics.json"), "w") as f:
                json.dump(payload, f)
        return reread

    def finish(self) -> None:
        if self._retiring is not None:
            self._retiring.unpersist()
            self._retiring = None
        if self._live is not None:
            self._live.unpersist()
            self._live = None


def scalar_agg(df: DataFrame, **exprs) -> dict:
    """One blocking action carrying every per-superstep scalar together
    (reference batches blocking scalar reads, ``cluster.py:167-168``;
    SURVEY O12)."""
    row = df.agg(*[e.alias(k) for k, e in exprs.items()]).collect()[0]
    return row.asDict()
