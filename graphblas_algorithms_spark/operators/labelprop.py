"""Label propagation community detection (synchronous, deterministic).

Not in the reference (BASELINE.json north_rule names it). Semantics we
define (and pin in the DuckDB-oracle SQL so it is exactly testable):

* labels initialized to node id;
* each superstep, every node adopts the most frequent label among its
  neighbors **plus its own current label counted once** (the self-vote
  damps the 2-cycle oscillation of pure synchronous LPA);
* ties broken by MIN label — deterministic (SURVEY §7 exactness rule);
* fixed iteration cap (default 5) or early-stop when no label changes.

Plan shape per superstep: sym_edges ⋈ labels → groupBy(dst, label)
count → argmax via max(struct(count, -label)) — two shuffles, both
partial-aggregated map-side; hub skew handled by the partial agg.
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
    adj = G.get_property("sym_edges").select("src", "dst").persist()
    labels = G.nodes.select("id", F.col("id").alias("label"))

    harness = Superstep(spark, checkpoint_dir, checkpoint_every)
    start_iter = 0
    if resume and checkpoint_dir is not None:
        got = harness.latest()
        if got is not None:
            start_iter, labels = got[0] + 1, got[1]
    else:
        labels = labels.persist()

    for it in range(start_iter, max_iter):
        # neighbor votes + one self-vote
        votes = edge_join(labels, adj, payload=["label"]).unionByName(
            labels.select("id", "label")
        )
        counted = votes.groupBy("id", "label").agg(F.count("*").alias("_c"))
        # argmax(count) with min-label tie-break: max(struct(c, -label))
        new_labels = (
            counted.groupBy("id")
            .agg(F.max(F.struct(F.col("_c"), (-F.col("label")).alias("_nl"))).alias("_m"))
            .select("id", (-F.col("_m._nl")).alias("label"))
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
