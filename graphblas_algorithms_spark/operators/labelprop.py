"""Label propagation community detection (synchronous, deterministic).

Not in the reference (BASELINE.json north_rule names it). Semantics we
define (and pin in the DuckDB-oracle SQL so it is exactly testable):

* labels initialized to node id;
* each superstep, every node adopts the most frequent label among its
  neighbors **plus its own current label counted once** (the self-vote
  damps the 2-cycle oscillation of pure synchronous LPA);
* ties broken by MIN label — deterministic (SURVEY §7 exactness rule);
* fixed iteration cap (default 5) or early-stop when no label changes.

Plan shape per superstep (ONE O(#votes) exchange, measured 80.4 s →
see BENCH/BASELINE.md at 111M edges): sym_edges are hash-pinned by
``src`` once per run and labels stay hash-partitioned on ``id`` across
supersteps, so the vote join is exchange-free on both sides; the single
``repartition(id)`` on the votes then satisfies BOTH downstream
aggregations — Spark accepts hash(id) for groupBy(id, label) because
the partitioning keys are a subset of the grouping keys — so
groupBy(dst, label) count and the argmax groupBy(dst) are exchange-free
partial aggregations, and the argmax output is already id-partitioned
for the next superstep's join.  Hub skew is absorbed by the map-side
partial agg (a hub's votes combine before the exchange).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.joins import edge_join
from ..plans.superstep import Superstep


def label_propagation(
    G,
    max_iter: int = 5,
    early_stop: bool = True,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 1,
    resume: bool = False,
) -> DataFrame:
    """(id: long, label: long)."""
    spark = G.spark
    num_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    # pin AND pre-sort the vote edges by the join key: InMemoryTableScan
    # preserves the cached plan's output ordering, so a sort-merge vote
    # join skips its edge-side sort every superstep.  Measured NEUTRAL at
    # local[16]/111M edges (43.4 vs 43.6 s/superstep — the first
    # superstep's all-distinct-labels vote shuffle dominates, not the
    # sort); kept because it costs one sort at prep and protects the SMJ
    # regime on real clusters.
    adj = (
        G.get_property("sym_edges")
        .select("src", "dst")
        .repartition(num_part, "src")
        .sortWithinPartitions("src")
        .persist()
    )
    labels = (
        G.nodes.select("id", F.col("id").alias("label")).repartition(num_part, "id")
    )

    harness = Superstep(spark, checkpoint_dir, checkpoint_every)
    start_iter = 0
    if resume and checkpoint_dir is not None:
        got = harness.latest()
        if got is not None:
            start_iter, labels = got[0] + 1, got[1]
    else:
        labels = labels.persist()

    for it in range(start_iter, max_iter):
        # neighbor votes + one self-vote; the repartition(id) is the
        # superstep's ONE exchange — hash(id) is a subset of (id, label),
        # so both groupBys below run as exchange-free partial aggs and
        # the result stays id-partitioned for the next join
        votes = (
            edge_join(labels, adj, payload=["label"])
            .unionByName(labels.select("id", "label"))
            .repartition(num_part, "id")
        )
        counted = votes.groupBy("id", "label").agg(F.count("*").alias("_c"))
        # argmax(count) with min-label tie-break.  max_by over the
        # (count, -label) ordering struct is the same lexicographic
        # comparison as max(struct(...)), but plans hash-based
        # (ObjectHashAggregate) instead of SortAggregate — the struct-max
        # form forced a full sort of the counted votes every superstep
        # (228M rows in superstep 1 at the 111M-edge scale).
        new_labels = counted.groupBy("id").agg(
            F.expr("max_by(label, struct(_c, -label))").alias("label")
        )
        if early_stop:
            new_labels = harness.materialize(
                new_labels, it, {"kernel": "label_propagation"}
            )
            changed = (
                new_labels.join(
                    labels.withColumnRenamed("label", "_old"), "id"
                )
                .filter(F.col("label") != F.col("_old"))
                .count()
            )
            labels = new_labels
            if changed == 0:
                break
        else:
            labels = harness.materialize(new_labels, it, {"kernel": "label_propagation"})
    adj.unpersist()
    return labels.select("id", "label")
