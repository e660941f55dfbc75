"""Temporal (time-respecting) reachability over timestamped edges.

Engine extension — the reference's traversals ignore time; an event
stream (or a commit history) induces a TEMPORAL graph where a path is
valid only if edge timestamps are non-decreasing along it (Holme &
Saramäki, "Temporal networks", Phys. Rep. 2012).  "Who could have
influenced whom, and how early" is unanswerable by static BFS: an edge
that fired BEFORE the information arrived at its tail cannot carry it.

Kernel: earliest-arrival relaxation — the temporal analog of the
min_plus SSSP semiring (SURVEY P1): state (source, id, arrival);
a round relaxes every edge (u, v, t) with t >= arrival(u) to propose
arrival(v) = t, keeping the min.  ``max_hops`` bounds the rounds, so
the result is the exact "earliest arrival using at most h hops" —
deterministic, monotone in h, and replayable as h unrolled SQL rounds
(the driver oracle).  Run with h >= the temporal diameter for the full
closure (each round is one O(nnz) hash join + min-agg; the same
superstep currency as BFS/SSSP, with the frontier naturally shrinking
as arrivals stop improving).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.superstep import _release_state, lineage_cut


def temporal_reachability(
    edges: DataFrame,
    sources: list[int],
    max_hops: int = 8,
    start_time: int = 0,
) -> DataFrame:
    """(source, id, arrival) — earliest time-respecting arrival from
    each source within ``max_hops`` hops over ``edges`` (src, dst, t;
    t any orderable numeric — epoch micros by convention).

    A source's own arrival is ``start_time`` (edges at t >= start_time
    are usable from it).  Unreached (source, node) pairs are absent —
    sparsity is absence, the engine's vector convention."""
    spark = edges.sparkSession
    num_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    e = edges.select("src", "dst", F.col("t").cast("long").alias("t"))
    e = e.repartition(num_part, "src").persist()

    arrival = spark.createDataFrame(
        [(int(s), int(s), int(start_time)) for s in sources],
        "source long, id long, arrival long",
    ).repartition(num_part, "id")
    # delta frontier: only rows whose arrival improved last round can
    # improve a neighbor this round
    frontier = arrival
    for _ in range(max_hops):
        prop = (
            e.join(
                frontier.select(
                    "source", F.col("id").alias("src"), F.col("arrival").alias("_at")
                ),
                "src",
            )
            .filter(F.col("t") >= F.col("_at"))
            .groupBy("source", F.col("dst").alias("id"))
            .agg(F.min("t").alias("_new"))
        )
        merged = (
            arrival.join(prop, ["source", "id"], "full")
            .select(
                "source",
                "id",
                # least() skips NULLs in Spark SQL: a side missing from
                # the full join never wins
                F.least("arrival", "_new").alias("arrival"),
                F.col("arrival").alias("_old"),
            )
        )
        prev_frontier, prev_arrival = frontier, arrival
        frontier = (
            merged.filter(
                F.col("_old").isNull() | (F.col("arrival") < F.col("_old"))
            )
            .select("source", "id", "arrival")
            .transform(lineage_cut)
            .persist()
        )
        arrival = merged.select("source", "id", "arrival").transform(lineage_cut).persist()
        # ADVICE r3: long relaxation chains pinned one frame per round
        if prev_frontier is not prev_arrival:
            _release_state(prev_frontier)
        _release_state(prev_arrival)
        if frontier.limit(1).count() == 0:
            break
    e.unpersist()
    _release_state(frontier)
    return arrival


def temporal_reachable_counts(
    edges: DataFrame, sources: list[int], max_hops: int = 8, start_time: int = 0
) -> DataFrame:
    """(source, n_reachable, earliest_last) — reach-set size and the
    time the LAST reached node was first touched, per source (influence
    span of an account / a commit author)."""
    arr = temporal_reachability(edges, sources, max_hops, start_time)
    return arr.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_reachable"),
        F.max("arrival").alias("earliest_last"),
    )
