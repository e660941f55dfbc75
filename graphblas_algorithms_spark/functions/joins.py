"""Frontier-expansion join helper.

Every traversal kernel does the same P1 step: join a node-keyed state
DataFrame onto the adjacency by ``state.id == edges.src`` and emit one
row per out-edge keyed by ``dst``.  Because state frames usually derive
from the SAME edge lineage (nodes are built from edge endpoints), naive
``df["col"]`` references trip Spark's ambiguous-self-join detection.
This helper renames both sides to fresh names first, which keeps the
join unambiguous and lets Catalyst's dedupRight handle shared exprIds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def edge_join(
    state: DataFrame,
    adj: DataFrame,
    state_id: str = "id",
    payload: list[str] | None = None,
    keep_src: str | None = None,
    keep_weight: str | None = None,
) -> DataFrame:
    """One row per (state row, out-edge): columns ``id`` (= edge dst),
    the payload columns carried from ``state``, optionally the edge
    ``src`` (as ``keep_src``) and edge ``weight`` (as ``keep_weight``)."""
    if payload is None:
        payload = [c for c in state.columns if c != state_id]
    xs = state.select(
        F.col(state_id).alias("_ej_id"),
        *[F.col(c).alias(f"_ej_{c}") for c in payload],
    )
    ecols = [F.col("src").alias("_ej_src"), F.col("dst").alias("_ej_dst")]
    if keep_weight is not None:
        ecols.append(F.col("weight").alias("_ej_w"))
    e = adj.select(*ecols)
    j = xs.join(e, F.col("_ej_id") == F.col("_ej_src"))
    out = [F.col("_ej_dst").alias("id")]
    out += [F.col(f"_ej_{c}").alias(c) for c in payload]
    if keep_src is not None:
        out.append(F.col("_ej_src").alias(keep_src))
    if keep_weight is not None:
        out.append(F.col("_ej_w").alias(keep_weight))
    return j.select(*out)
