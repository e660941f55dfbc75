"""Incremental time-respecting reachability over streaming edge batches.

The temporal analog of streaming/components.py: a crawl/push stream
appends timestamped edges, and the earliest-arrival closure from a
fixed source set is maintained without recomputation.  The enabling
monotonicity: appending edges can only CREATE time-respecting paths,
so arrivals only ever decrease — each batch seeds a delta frontier
(proposals through the new edges from current arrivals) and relaxes to
fixpoint over the accumulated edge set; per-batch work is
O(|batch| + |affected region|), not O(total edges).

Exactness contract (same as the incremental CC/PR family): after every
batch, the maintained state equals a from-scratch
``temporal_reachability`` closure over all edges seen so far —
pytest-gated batch-vs-incremental equality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.superstep import _release_state, lineage_cut


def _relax_to_fixpoint(
    edges: DataFrame, arrival: DataFrame, frontier: DataFrame, max_rounds: int = 10_000
) -> DataFrame:
    """Delta-frontier earliest-arrival relaxation until no improvement.
    ``edges``: (src, dst, t); ``arrival``/``frontier``: (source, id,
    arrival).  Returns the new arrival table."""
    rounds = 0
    owned = False  # round-0 arrival/frontier belong to the CALLER
    while frontier.limit(1).count() > 0:
        rounds += 1
        if rounds > max_rounds:
            # release owned frames on the error path too (ADVICE r4):
            # exiting with the current frontier/arrival pinned leaks the
            # exact block-manager state this module's per-round release
            # discipline exists to prevent
            if owned:
                if frontier is not arrival:
                    _release_state(frontier)
                _release_state(arrival)
            raise RuntimeError("temporal relaxation did not converge")
        prop = (
            edges.join(
                frontier.select(
                    "source", F.col("id").alias("src"), F.col("arrival").alias("_at")
                ),
                "src",
            )
            .filter(F.col("t") >= F.col("_at"))
            .groupBy("source", F.col("dst").alias("id"))
            .agg(F.min("t").alias("_new"))
        )
        merged = arrival.join(prop, ["source", "id"], "full").select(
            "source",
            "id",
            F.least("arrival", "_new").alias("arrival"),
            F.col("arrival").alias("_old"),
        )
        prev_frontier, prev_arrival = frontier, arrival
        frontier = (
            merged.filter(F.col("_old").isNull() | (F.col("arrival") < F.col("_old")))
            .select("source", "id", "arrival")
            .transform(lineage_cut)
            .persist()
        )
        arrival = (
            merged.select("source", "id", "arrival").transform(lineage_cut).persist()
        )
        # ADVICE r3: release the superseded round's frames — the batch
        # maintenance path accumulates relaxation chains across batches.
        # Round-0 inputs are caller-owned and never touched.
        if owned:
            if prev_frontier is not prev_arrival:
                _release_state(prev_frontier)
            _release_state(prev_arrival)
        owned = True
    if owned:
        _release_state(frontier)
    return arrival


def merge_temporal_batch(
    arrival: DataFrame,
    accumulated_edges: DataFrame,
    batch_edges: DataFrame,
    sources: list[int],
    start_time: int = 0,
) -> DataFrame:
    """New (source, id, arrival) closure after appending ``batch_edges``
    — pure and deterministic.  ``accumulated_edges`` must ALREADY
    include the batch (the caller appends first; relaxation through old
    edges may be unlocked by a new early arrival)."""
    spark = batch_edges.sparkSession
    if arrival is None:
        arrival = spark.createDataFrame(
            [(int(s), int(s), int(start_time)) for s in sources],
            "source long, id long, arrival long",
        )
    # seed: one-hop proposals THROUGH the new edges only
    seeds = (
        batch_edges.select("src", "dst", F.col("t").cast("long").alias("t"))
        .join(
            arrival.select(
                "source", F.col("id").alias("src"), F.col("arrival").alias("_at")
            ),
            "src",
        )
        .filter(F.col("t") >= F.col("_at"))
        .groupBy("source", F.col("dst").alias("id"))
        .agg(F.min("t").alias("_new"))
    )
    merged = arrival.join(seeds, ["source", "id"], "full").select(
        "source",
        "id",
        F.least("arrival", "_new").alias("arrival"),
        F.col("arrival").alias("_old"),
    )
    frontier = (
        merged.filter(F.col("_old").isNull() | (F.col("arrival") < F.col("_old")))
        .select("source", "id", "arrival")
        .persist()
    )
    arrival = merged.select("source", "id", "arrival").persist()
    e = accumulated_edges.select("src", "dst", F.col("t").cast("long").alias("t"))
    return _relax_to_fixpoint(e, arrival, frontier)
