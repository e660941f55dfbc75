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
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class Superstep:
    def __init__(
        self,
        spark: SparkSession,
        checkpoint_dir: str | None = None,
        checkpoint_every: int = 1,
        lineage_cut_every: int = 5,
    ):
        self.spark = spark
        self.dir = checkpoint_dir
        self.every = max(1, checkpoint_every)
        self.cut_every = max(1, lineage_cut_every)
        self._live: DataFrame | None = None
        self._retiring: DataFrame | None = None
        self._t0 = time.monotonic()

    # ------------------------------------------------------------------
    def _iter_dir(self, it: int) -> str:
        return os.path.join(self.dir, f"iter={it}")

    def latest(self) -> tuple[int, DataFrame] | None:
        """Newest complete checkpoint (iter, state) or None."""
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
        with open(os.path.join(self._iter_dir(it), "metrics.json")) as f:
            return json.load(f)

    # ------------------------------------------------------------------
    def materialize(
        self, state: DataFrame, it: int, metrics: dict | None = None, eager: bool = False
    ) -> DataFrame:
        """Persist the new state, cut lineage / checkpoint as configured,
        release older states.  Returns the DataFrame to iterate with.

        ``eager=False`` (default): the persist is lazy — the caller's next
        action (typically the convergence agg, O12) materializes it, so a
        superstep costs exactly ONE Spark job.  Previous states are
        unpersisted one generation late so a lazily-persisted new state
        never recomputes through an evicted parent.
        """
        checkpointing = self.dir is not None and it % self.every == 0
        if checkpointing:
            state = self._checkpoint(state, it, metrics or {})
        elif (it + 1) % self.cut_every == 0:
            # hard lineage cut without durable write (eager by nature)
            state = state.localCheckpoint(eager=True)
        else:
            state = state.persist()
            if eager:
                state.count()
        if self._retiring is not None:
            self._retiring.unpersist()
        self._retiring = self._live
        self._live = state
        return state

    def _checkpoint(self, state: DataFrame, it: int, metrics: dict) -> DataFrame:
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
        # metrics.json written last = commit marker for resume
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
