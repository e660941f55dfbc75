"""GraphBLAS semiring mxv/vxm re-expressed as DataFrame join+agg.

The reference composes every algorithm from ~10 primitive forms (SURVEY
§2.1); the hot one is P1, ``y = x @ A`` over a semiring:

    y[j] = ADD_i  x[i] MUL A[i, j]

Semirings actually used by the reference (complete list):
``plus_times, plus_first, plus_pair, any_pair, min_plus, min_first,
any_plus, any_second`` (e.g. ``pagerank_alg.py:2``, ``_bfs.py:6``,
``shortest_paths/weighted.py:4``, ``dense.py:2``).

Spark mapping: join on the contraction index, then hash-aggregate —
Catalyst's partial (map-side) aggregation gives the monoid combine for
free, and AQE handles moderate skew.  ``MUL`` is a plain column
expression, ``ADD`` one of sum/min/max/first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# value expression builders: (x_value, edge_weight_or_None) -> Column
_MUL = {
    "times": lambda xv, w: xv * (w if w is not None else F.lit(1.0)),
    "first": lambda xv, w: xv,  # ignore stored edge value (plus_first)
    "pair": lambda xv, w: F.lit(1),  # structural pairing (plus_pair)
    "plus": lambda xv, w: xv + (w if w is not None else F.lit(1.0)),  # min_plus
    "second": lambda xv, w: w if w is not None else F.lit(1.0),
}

_ADD = {
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
    "any": F.first,  # any monoid: any representative (we pick first for determinism via min)
    "count": lambda c: F.count(F.lit(1)),
}


def vxm(
    x: DataFrame,
    edges: DataFrame,
    add: str = "sum",
    mul: str = "times",
    x_id: str = "id",
    x_val: str = "value",
    out_val: str = "value",
) -> DataFrame:
    """``y = x @ A``: returns (id, <out_val>) keyed by edge ``dst``.

    Sparsity is preserved: output has rows only for dst reachable from
    stored x rows (missing id = no value, the load-bearing mask semantics
    of SURVEY §1.1).
    """
    has_w = "weight" in edges.columns
    e = edges.select(
        F.col("src").alias("_e_src"),
        F.col("dst").alias("_e_dst"),
        *([F.col("weight").alias("_e_w")] if has_w else []),
    )
    xs = x.select(F.col(x_id).alias("_x_id"), F.col(x_val).alias("_x_val"))
    expr = _MUL[mul](F.col("_x_val"), F.col("_e_w") if has_w else None)
    joined = xs.join(e, F.col("_x_id") == F.col("_e_src")).select(
        F.col("_e_dst").alias("id"), expr.alias("_v")
    )
    if add == "any":
        # deterministic "any": min is a valid ANY witness and reproducible
        agg = F.min("_v")
    elif add == "count":
        agg = F.count(F.lit(1))
    else:
        agg = _ADD[add]("_v")
    return joined.groupBy("id").agg(agg.alias(out_val))


def mxv(
    edges: DataFrame,
    x: DataFrame,
    add: str = "sum",
    mul: str = "times",
    x_id: str = "id",
    x_val: str = "value",
    out_val: str = "value",
) -> DataFrame:
    """``y = A @ x`` — contraction over ``dst`` (transpose of vxm)."""
    swapped = edges.select(
        F.col("dst").alias("src"),
        F.col("src").alias("dst"),
        *([F.col("weight")] if "weight" in edges.columns else []),
    )
    return vxm(x, swapped, add=add, mul=mul, x_id=x_id, x_val=x_val, out_val=out_val)


def salted_vxm_sum(
    x: DataFrame,
    edges: DataFrame,
    salt: int,
    mul: str = "times",
    x_id: str = "id",
    x_val: str = "value",
    out_val: str = "value",
) -> DataFrame:
    """Skew-salted plus-semiring vxm (SURVEY O14, north_rule requirement).

    Power-law hubs put most of one ``src`` key's edges in one join task.
    Fix: extend the join key with ``salt = pmod(hash(dst), S)`` on the
    (big) edge side and replicate the (per-key-single-row) rank side S
    times, splitting a hub's adjacency across S tasks.  The groupBy(dst)
    sum is unaffected (partial aggregation already combines map-side).

    Measured crossover (scripts/skew_bench.py, BENCH/BASELINE.md round-3
    skew section; 4 hubs x 5M edges = 50% of a 40M-edge graph): use this
    when (a) the state vector exceeds the broadcast threshold — a
    broadcast-hash join is skew-immune and faster, the engine's regime 0
    — AND (b) a single src key's edge bytes exceed ~2x the target
    shuffle-partition size.  There S=16 ran 2x faster than the plain
    shuffle join (7.0 s vs 14.3 s) and matched a fully RETUNED AQE
    (skew threshold lowered 256m->32m, coalescing off: 7.4 s); default
    AQE does NOT split hub partitions under its 256 MB threshold and
    its coalescing amplified the straggler 2.3x.  Salting needs no
    session-config control, which a library kernel usually lacks.
    """
    has_w = "weight" in edges.columns
    e = edges.select(
        F.col("src").alias("_e_src"),
        F.col("dst").alias("_e_dst"),
        *([F.col("weight").alias("_e_w")] if has_w else []),
    ).withColumn("_e_salt", F.pmod(F.hash("_e_dst"), F.lit(salt)))
    xr = x.select(
        F.col(x_id).alias("_x_id"), F.col(x_val).alias("_x_val")
    ).withColumn("_x_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1))))
    expr = _MUL[mul](F.col("_x_val"), F.col("_e_w") if has_w else None)
    joined = xr.join(
        e,
        (F.col("_x_id") == F.col("_e_src")) & (F.col("_x_salt") == F.col("_e_salt")),
    ).select(F.col("_e_dst").alias("id"), expr.alias("_v"))
    return joined.groupBy("id").agg(F.sum("_v").alias(out_val))
