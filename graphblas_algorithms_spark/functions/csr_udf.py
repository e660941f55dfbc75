"""Vectorized CSR-block gather-scatter for the mxv hot loop.

North-star mandate (BASELINE.json): re-express the semiring
matrix-vector product as *partitioned CSR-block gather-scatter via
vectorized pandas/Arrow UDFs* — no per-row Python anywhere.

Design: edges are bucketed into src-blocks (``pmod(hash(src), B)``);
after joining the rank vector in (JVM-side join), each block is handed
to ONE ``applyInPandas`` call that does a numpy segment-sum of
contributions by ``dst`` inside the block — the gather (ranks already
joined) + scatter (bincount by dst) of a CSR SpMV, vectorized over the
whole Arrow batch.  Block partial sums then combine in a final (much
smaller) JVM-side groupBy(dst).sum — the monoid's associativity at
work, same as SuiteSparse's per-thread partial reductions.

This is numerically identical to :func:`semiring.vxm` with add='sum'
(kept as the pure-SQL correctness reference; SURVEY §7 "behind a flag").
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def vxm_csr_sum(
    x: DataFrame,
    edges: DataFrame,
    mul: str = "times",
    x_id: str = "id",
    x_val: str = "value",
    out_val: str = "value",
    num_blocks: int | None = None,
) -> DataFrame:
    """plus-semiring ``y = x @ A`` via CSR-block pandas UDF.

    mul: 'times' (x*w), 'first' (x), 'pair' (1).
    """
    spark = edges.sparkSession
    if num_blocks is None:
        num_blocks = spark.sparkContext.defaultParallelism
    has_w = "weight" in edges.columns

    e = edges.select(
        F.col("src").alias("_e_src"),
        F.col("dst").alias("dst"),
        *([F.col("weight").alias("_w")] if has_w else []),
    ).withColumn("_blk", F.pmod(F.hash("_e_src"), F.lit(num_blocks)))
    xs = x.select(F.col(x_id).alias("_x_id"), F.col(x_val).alias("_xv"))
    joined = xs.join(e, F.col("_x_id") == F.col("_e_src")).select(
        "_blk", "dst", "_xv", *(["_w"] if has_w else [])
    )

    def _segment_sum(pdf: pd.DataFrame) -> pd.DataFrame:
        # gather: ranks already column-aligned; compute contributions
        if mul == "times":
            contrib = pdf["_xv"].to_numpy() * (
                pdf["_w"].to_numpy() if has_w else 1.0
            )
        elif mul == "first":
            contrib = pdf["_xv"].to_numpy()
        elif mul == "pair":
            import numpy as np

            contrib = np.ones(len(pdf), dtype="float64")
        else:  # pragma: no cover
            raise ValueError(mul)
        # scatter: segment-sum by dst (vectorized hash-group, no python loop)
        out = (
            pd.DataFrame({"dst": pdf["dst"].to_numpy(), "_c": contrib})
            .groupby("dst", sort=False)["_c"]
            .sum()
            .reset_index()
        )
        return out.rename(columns={"_c": "partial"})

    partials = joined.groupBy("_blk").applyInPandas(
        _segment_sum, schema="dst long, partial double"
    )
    return partials.groupBy(F.col("dst").alias("id")).agg(
        F.sum("partial").alias(out_val)
    )
