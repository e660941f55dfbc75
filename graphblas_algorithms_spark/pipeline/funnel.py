"""Funnel / conversion analytics over the events table.

Batch sibling of the streaming event shapes (``streaming/events.py``):
per-user staged-conversion rollup with semi-structured ``props``
extraction — the one table column no other query exercised.  100 TB
shape: JSON parsing (``get_json_object``) happens in the scan-side
projection and everything reduces through ONE user_id groupBy with full
partial aggregation — no joins, no window, no second shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_conversion(
    events: DataFrame,
    stages: tuple[str, ...] = ("view", "click", "purchase"),
    json_sum_stage: str = "click",
    json_field: str = "k",
    value_sum_stage: str = "purchase",
) -> DataFrame:
    """Per-user funnel rollup.

    Output: (user_id, n_<stage>... , <json_sum_stage>_<json_field>_sum,
    <value_sum_stage>_value, funnel) where ``funnel`` is 1 iff the user's
    FIRST event of each stage occurs in strict stage order (first view <
    first click < first purchase) — the ordered-funnel definition, not
    mere stage presence.  A single-stage funnel degenerates to presence
    of that stage; an empty stage tuple is an error."""
    if not stages:
        raise ValueError("funnel_conversion requires at least one stage")
    aggs = []
    for s in stages:
        is_s = F.col("event_type") == s
        aggs.append(F.count(F.when(is_s, 1)).alias(f"n_{s}"))
        aggs.append(F.min(F.when(is_s, F.col("ts"))).alias(f"_t_{s}"))
    k = F.get_json_object("props", f"$.{json_field}").cast("long")
    aggs.append(
        F.coalesce(
            F.sum(F.when(F.col("event_type") == json_sum_stage, k)), F.lit(0)
        ).alias(f"{json_sum_stage}_{json_field}_sum")
    )
    # Value sums are carried on the 2^-20 dyadic grid as exact BIGINTs
    # (float SUM is aggregation-order-dependent; a value at a half-ULP
    # rounding boundary flips across partitionings/core counts).  The
    # snap (floor of an exact power-of-two scaling) and the final /2^20
    # are both exact IEEE ops, so the result is bit-identical across
    # runs and engines — the ANF dyadic scaled-integer contract.
    v_scaled = F.floor(F.col("value") * F.lit(1048576.0)).cast("long")
    aggs.append(
        (
            F.coalesce(
                F.sum(
                    F.when(F.col("event_type") == value_sum_stage, v_scaled)
                ),
                F.lit(0),
            )
            / F.lit(1048576.0)
        ).alias(f"{value_sum_stage}_value")
    )
    out = events.groupBy("user_id").agg(*aggs)
    # single stage: the funnel degenerates to "did stage 1 happen"
    ordered = F.col(f"_t_{stages[0]}").isNotNull()
    for a, b in zip(stages, stages[1:]):
        ordered = ordered & (F.col(f"_t_{a}") < F.col(f"_t_{b}"))
    out = out.withColumn("funnel", F.when(ordered, 1).otherwise(0))
    return out.drop(*[f"_t_{s}" for s in stages])
