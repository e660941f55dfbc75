"""Incremental PageRank maintenance over a stream of edge batches.

PageRank is a global fixpoint — an edge delta perturbs every score in
its component, so unlike CC (streaming/components.py) there is no
contraction shortcut that avoids touching the graph.  What CAN be
reused is the solution itself: power iteration started from the
previous epoch's scores converges in the handful of supersteps it takes
to propagate the perturbation, instead of the tens it takes to mix from
the uniform vector.  Each superstep still scans all edges (that is the
algorithm), so the savings multiply the per-superstep O(nnz) cost by
saved iterations — measured at the 111M-edge scale in
BENCH/BASELINE.md (scripts/inc_pr_scale.py).

Tolerance at scale: the reference's n-scaled criterion (err < n*tol)
degenerates above ~1e6 nodes — the unit-mass score vector can never
move n*1e-6 in L1 — so the maintenance loop gates on the ABSOLUTE L1
step difference ``tol_abs`` (default 1e-4 of total mass; fixpoint
distance <= alpha/(1-alpha) * tol_abs).  Pass ``tol_abs=None`` to
recover exact reference semantics on small graphs.

State layout mirrors streaming/components.py: zero executor state; the
accumulated edge log lands under ``{store}/edges/epoch=N`` and the full
score snapshot under ``{store}/scores/epoch=N``, both written in
overwrite mode so an at-least-once replay is idempotent.  Per-epoch
convergence metadata (iterations, L1 error) is written next to the
scores as ``_metrics.json`` — the per-partition lineage metrics of the
superstep harness remain available via ``checkpoint_dir`` on the
underlying kernel.

Exactness: the fixpoint is unique (alpha < 1), so warm-started and
cold-started runs converge to the same scores within ``tol``;
stream-vs-batch agreement is pytest-gated with allclose at the
convergence tolerance (no value-hash oracle — two different iteration
counts legitimately differ in the last float digits).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_EDGE_SCHEMA = "src long, dst long"
_SCORE_SCHEMA = "id long, rank double"


def read_scores(spark: SparkSession, store_dir: str) -> DataFrame | None:
    """Newest complete score snapshot, or None before the first epoch."""
    root = os.path.join(store_dir, "scores")
    if not os.path.isdir(root):
        return None
    epochs = [
        int(n.split("=")[1])
        for n in os.listdir(root)
        if n.startswith("epoch=") and os.path.exists(
            os.path.join(root, n, "_SUCCESS")
        )
    ]
    if not epochs:
        return None
    return (
        spark.read.schema(_SCORE_SCHEMA)
        .parquet(os.path.join(root, f"epoch={max(epochs)}"))
    )


def read_metrics(store_dir: str) -> list[dict]:
    """Per-epoch convergence metadata, epoch-ordered."""
    root = os.path.join(store_dir, "scores")
    out = []
    if not os.path.isdir(root):
        return out
    for name in sorted(
        (n for n in os.listdir(root) if n.startswith("epoch=")),
        key=lambda n: int(n.split("=")[1]),
    ):
        p = os.path.join(root, name, "_metrics.json")
        if os.path.exists(p):
            with open(p) as f:
                out.append(json.load(f))
    return out


def pagerank_epoch(
    spark: SparkSession,
    store_dir: str,
    epoch: int,
    alpha: float = 0.85,
    tol: float = 1e-6,
    tol_abs: float | None = 1e-4,
    max_iter: int = 100,
    fixed_iters: int | None = None,
) -> DataFrame:
    """Recompute scores over ALL edges accumulated through ``epoch``,
    warm-started from the previous snapshot.  Pure given the stores.

    ``fixed_iters`` pins the superstep count per epoch (no convergence
    action) — the deterministic protocol the driver's value-hash oracle
    (`graph_pagerank_incremental`) replays in unrolled SQL; production
    maintenance uses the ``tol_abs`` gate instead."""
    from ..classes.graph import DiGraph
    from ..operators.pagerank import pagerank

    edges = (
        spark.read.schema(_EDGE_SCHEMA)
        .parquet(os.path.join(store_dir, "edges", "epoch=*"))
    )
    nodes = (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    G = DiGraph(edges, nodes, dedup=True)
    prev = read_scores(spark, store_dir)
    iters: list = []

    def hook(it, err):
        iters.append((it, err))

    ranks = pagerank(
        G,
        alpha=alpha,
        tol=tol,
        tol_abs=tol_abs,
        max_iter=max_iter,
        nstart=prev,
        fixed_iters=fixed_iters,
        iteration_hook=hook,
    )
    out_dir = os.path.join(store_dir, "scores", f"epoch={epoch}")
    ranks.write.mode("overwrite").parquet(out_dir)
    with open(os.path.join(out_dir, "_metrics.json"), "w") as f:
        json.dump(
            {
                "epoch": epoch,
                "iterations": len(iters),
                "warm_start": prev is not None,
                "final_err": iters[-1][1] if iters else None,
            },
            f,
        )
    return spark.read.schema(_SCORE_SCHEMA).parquet(out_dir)


def incremental_pagerank(
    spark: SparkSession,
    edges_stream_dir: str,
    store_dir: str,
    checkpoint_dir: str,
    alpha: float = 0.85,
    tol: float = 1e-6,
    tol_abs: float | None = 1e-4,
    max_iter: int = 100,
    max_files_per_trigger: int | None = None,
    fixed_iters: int | None = None,
):
    """Start the maintenance stream; returns the StreamingQuery."""
    reader = spark.readStream.schema(_EDGE_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    src = reader.parquet(edges_stream_dir)

    def sink(batch_df: DataFrame, epoch: int) -> None:
        sess = batch_df.sparkSession
        batch_df.write.mode("overwrite").parquet(
            os.path.join(store_dir, "edges", f"epoch={epoch}")
        )
        pagerank_epoch(
            sess, store_dir, epoch, alpha=alpha, tol=tol, tol_abs=tol_abs,
            max_iter=max_iter, fixed_iters=fixed_iters,
        )

    return (
        src.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
