"""Maximal independent set — Luby's algorithm with deterministic priorities.

Not in the reference; added as the classic O(log n)-round parallel
symmetry-breaking kernel (Luby 1986), the same superstep currency as
the rest of the engine: each round is two edge joins + one agg over the
shrinking undecided set.

Determinism: node priority = md5(seed|id) compared lexicographically
(hex strings order the same in every engine — no RNG, no ties).  A node
enters the MIS when its priority is the strict minimum of its closed
undecided neighborhood; it and its neighbors then leave the undecided
set.  The result is a pure function of (graph, seed) and replays across
engines — the oracle unrolls the same rounds in SQL.

Scale shape: the undecided set shrinks geometrically (Luby's analysis:
expected >= 1/2 of undecided EDGES die per round), so round cost is a
decreasing sequence of O(nnz(U)) shuffles — diameter-independent, the
same reason star-contraction CC is the unknown-diameter default.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.superstep import lineage_cut


def maximal_independent_set(G, seed: int = 42, max_rounds: int = 64) -> DataFrame:
    """(id: long) — a maximal independent set, deterministic in (G, seed).

    Self-edges are ignored (a self-looped node can still enter: MIS is
    defined on the simple graph).  Raises if ``max_rounds`` is hit
    (never observed below ~3 log2 n rounds)."""
    adj = G.get_property("sym_offdiag").persist()
    pri = F.md5(F.concat_ws("|", F.lit(int(seed)), F.col("id")))
    undecided = G.nodes.select("id", pri.alias("pri")).persist()
    mis = None
    done = undecided.limit(1).count() == 0
    rounds = 0
    while not done and rounds < max_rounds:
        rounds += 1
        # neighbor priorities WITHIN the undecided set: adjacency
        # restricted by two semi-joins (SURVEY P8 structure mask)
        u_ids = undecided.select("id")
        live = (
            adj.join(u_ids.withColumnRenamed("id", "src"), "src", "left_semi")
            .join(u_ids.withColumnRenamed("id", "dst"), "dst", "left_semi")
        )
        nbr_min = (
            live.join(
                undecided.select(
                    F.col("id").alias("dst"), F.col("pri").alias("_np")
                ),
                "dst",
            )
            .groupBy("src")
            .agg(F.min("_np").alias("_minp"))
            .withColumnRenamed("src", "id")
        )
        cand = (
            undecided.join(nbr_min, "id", "left")
            .filter(F.col("_minp").isNull() | (F.col("pri") < F.col("_minp")))
            .select("id")
            .transform(lineage_cut)
            .persist()
        )
        mis = cand if mis is None else mis.unionByName(cand).transform(lineage_cut)
        # drop winners and their neighbors from the undecided set
        dead_nbrs = adj.join(
            cand.withColumnRenamed("id", "src"), "src", "left_semi"
        ).select(F.col("dst").alias("id"))
        undecided = (
            undecided.join(
                cand.unionByName(dead_nbrs).distinct(), "id", "left_anti"
            )
            .transform(lineage_cut)
            .persist()
        )
        done = undecided.limit(1).count() == 0
    adj.unpersist()
    if not done:
        raise RuntimeError(
            f"maximal_independent_set did not converge in {max_rounds} rounds"
        )
    if mis is None:
        return G.nodes.select("id").limit(0)
    return mis.select("id")
