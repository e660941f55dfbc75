"""Linear-algebra constructors (reference ``linalg/``).

Matrices are (row: long, col: long, value: double) DataFrames — the
Matrix result type of SURVEY §1.1.  The dense rank-1 term of the
modularity matrix is kept factored (never materialized) per SURVEY
§2.2; ``modularity_matrix`` exposes the factored pieces and a
small-graph materializer for tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _sym_weighted(G) -> DataFrame:
    e = G.get_property("sym_edges") if not G.is_directed_flag else G.edges
    if "weight" not in e.columns:
        e = e.withColumn("weight", F.lit(1.0))
    return e.select("src", "dst", "weight")


def adjacency_matrix(G, weighted: bool = True) -> DataFrame:
    """(row, col, value) — ``graphmatrix.py:6-19`` (``unary.one(A)`` when
    not weighted)."""
    e = _sym_weighted(G)
    v = F.col("weight") if weighted else F.lit(1.0)
    return e.select(F.col("src").alias("row"), F.col("dst").alias("col"), v.alias("value"))


def _degrees_weighted(G) -> DataFrame:
    """(id, wdeg) over the symmetric adjacency (diagonal counts once)."""
    e = _sym_weighted(G)
    return e.groupBy(F.col("src").alias("id")).agg(F.sum("weight").alias("wdeg"))


def laplacian_matrix(G) -> DataFrame:
    """D - A (``laplacianmatrix.py:27-30``): degree diagonal union negated
    edges (merged on overlap for self-loops)."""
    A = adjacency_matrix(G)
    D = _degrees_weighted(G).select(
        F.col("id").alias("row"), F.col("id").alias("col"), F.col("wdeg").alias("value")
    )
    return (
        D.unionByName(A.select("row", "col", (-F.col("value")).alias("value")))
        .groupBy("row", "col")
        .agg(F.sum("value").alias("value"))
        .filter(F.col("value") != 0)
    )


def normalized_laplacian_matrix(G) -> DataFrame:
    """I - D^{-1/2} A D^{-1/2} (``laplacianmatrix.py:33-54``).  The masked
    outer product (``:44``) = joining d^{-1/2} onto both edge endpoints."""
    A = adjacency_matrix(G)
    d = _degrees_weighted(G).select(
        "id",
        F.when(F.col("wdeg") > 0, 1.0 / F.sqrt("wdeg")).otherwise(0.0).alias("dinv"),
    )
    scaled = (
        A.join(d.select(F.col("id").alias("row"), F.col("dinv").alias("_dr")), "row")
        .join(d.select(F.col("id").alias("col"), F.col("dinv").alias("_dc")), "col")
        .select("row", "col", (-F.col("value") * F.col("_dr") * F.col("_dc")).alias("value"))
    )
    eye = _degrees_weighted(G).filter(F.col("wdeg") > 0).select(
        F.col("id").alias("row"), F.col("id").alias("col"), F.lit(1.0).alias("value")
    )
    return (
        eye.unionByName(scaled)
        .groupBy("row", "col")
        .agg(F.sum("value").alias("value"))
        .filter(F.col("value") != 0)
    )


def modularity_matrix(G, materialize: bool = False):
    """B = A - k kᵀ / (2m) (``modularitymatrix.py:8-37``).

    Returns (A, k, two_m) factored by default — the rank-1 term is dense
    and must never materialize at scale. ``materialize=True`` cross-joins
    for small-graph tests only."""
    A = adjacency_matrix(G)
    k = _degrees_weighted(G)
    two_m = float(
        _sym_weighted(G).agg(F.sum("weight").alias("s")).collect()[0]["s"] or 0.0
    )
    if not materialize:
        return A, k, two_m
    dense = (
        k.select(F.col("id").alias("row"), F.col("wdeg").alias("_kr"))
        .crossJoin(k.select(F.col("id").alias("col"), F.col("wdeg").alias("_kc")))
        .select("row", "col", (-F.col("_kr") * F.col("_kc") / F.lit(two_m)).alias("value"))
    )
    return (
        A.unionByName(dense)
        .groupBy("row", "col")
        .agg(F.sum("value").alias("value"))
        .filter(F.col("value") != 0)
    )


def directed_modularity_matrix(G, is_weighted: bool = False, materialize: bool = False):
    """B = A - k_out k_inᵀ / m (``modularitymatrix.py:17-37``).

    Returns (A, k_out, k_in, m) factored by default — the rank-1 term is
    dense and must never materialize at scale.  ``materialize=True``
    cross-joins for small-graph tests only.  ``is_weighted=False`` uses
    ``unary.one(A)`` pattern semantics like the reference."""
    e = G.edges
    if "weight" not in e.columns or not is_weighted:
        e = e.select("src", "dst", F.lit(1.0).alias("weight"))
    A = e.select(
        F.col("src").alias("row"), F.col("dst").alias("col"), F.col("weight").alias("value")
    )
    k_out = e.groupBy(F.col("src").alias("id")).agg(F.sum("weight").alias("kout"))
    k_in = e.groupBy(F.col("dst").alias("id")).agg(F.sum("weight").alias("kin"))
    m = float(e.agg(F.sum("weight").alias("s")).collect()[0]["s"] or 0.0)
    if not materialize:
        return A, k_out, k_in, m
    dense = (
        k_out.select(F.col("id").alias("row"), F.col("kout").alias("_kr"))
        .crossJoin(k_in.select(F.col("id").alias("col"), F.col("kin").alias("_kc")))
        .select("row", "col", (-F.col("_kr") * F.col("_kc") / F.lit(m)).alias("value"))
    )
    return (
        A.unionByName(dense)
        .groupBy("row", "col")
        .agg(F.sum("value").alias("value"))
        .filter(F.col("value") != 0)
    )


def bethe_hessian_matrix(G, r: float | None = None) -> DataFrame:
    """(r²-1)I - rA + D (``bethehessianmatrix.py:6-25``); default r =
    sqrt(avg of d²/avg d - 1) per the reference."""
    d = _degrees_weighted(G)
    if r is None:
        row = d.agg(
            (F.avg(F.col("wdeg") * F.col("wdeg")) / F.avg("wdeg") - 1).alias("x")
        ).collect()[0]
        import math

        r = math.sqrt(float(row["x"]))
    A = adjacency_matrix(G)
    eye = G.nodes.select(
        F.col("id").alias("row"), F.col("id").alias("col"),
        F.lit(r * r - 1.0).alias("value"),
    )
    D = d.select(
        F.col("id").alias("row"), F.col("id").alias("col"), F.col("wdeg").alias("value")
    )
    return (
        eye.unionByName(D)
        .unionByName(A.select("row", "col", (-F.lit(r) * F.col("value")).alias("value")))
        .groupBy("row", "col")
        .agg(F.sum("value").alias("value"))
        .filter(F.col("value") != 0)
    )


def google_matrix(
    G,
    alpha: float = 0.85,
    personalization: dict | None = None,
    dangling: dict | None = None,
) -> DataFrame:
    """(row, col, value) — the explicit dense alpha-damped stochastic
    matrix (reference ``pagerank_alg.py:104-162``).

    Dense n×n is an anti-pattern at scale (SURVEY: "skip at scale;
    derivable for tests via cross-join on tiny n") — kept for tiny-graph
    parity, built as a nodes×nodes cross join plus the sparse stochastic
    term; guarded to small n.
    """
    n = G.n
    if n > 5000:
        raise ValueError("google_matrix is dense n^2 — tiny-graph parity only")
    e = _sym_weighted(G)
    outdeg = e.groupBy("src").agg(F.sum("weight").alias("_od"))
    S = e.join(outdeg, "src").select(
        F.col("src").alias("row"),
        F.col("dst").alias("col"),
        (F.col("weight") / F.col("_od")).alias("_s"),
    )
    spark = G.spark

    def _pvec(mapping):
        if mapping is None:
            return G.nodes.select(
                F.col("id").alias("col"), (F.lit(1.0) / n).alias("_p")
            )
        total = float(sum(mapping.values()))
        return spark.createDataFrame(
            [(int(k), float(v) / total) for k, v in mapping.items()],
            "col long, _p double",
        )

    p = _pvec(personalization)
    dw = _pvec(dangling) if dangling is not None else p
    dangling_rows = G.nodes.join(
        e.select(F.col("src").alias("id")).distinct(), "id", "left_anti"
    ).select(F.col("id").alias("row"), F.lit(1).alias("_isd"))
    # Dense row x col grid built from nodes x nodes; p/dw LEFT-joined so a
    # partial personalization/dangling dict contributes 0 teleport for the
    # missing columns but keeps every column (ref pagerank_alg.py:104-162
    # missing keys -> 0).  n is already capped at 5000 so n^2 is fine.
    base = (
        G.nodes.select(F.col("id").alias("row"))
        .crossJoin(G.nodes.select(F.col("id").alias("col")))
        .join(p, "col", "left")
        .join(dangling_rows, "row", "left")
        .join(dw.withColumnRenamed("_p", "_dwp"), "col", "left")
        .withColumn("_p", F.coalesce("_p", F.lit(0.0)))
        .withColumn("_dwp", F.coalesce("_dwp", F.lit(0.0)))
        .select(
            "row",
            "col",
            F.when(
                F.col("_isd").isNotNull(), F.lit(alpha) * F.col("_dwp")
            ).otherwise(0.0).alias("_dterm"),
            (F.lit(1.0 - alpha) * F.col("_p")).alias("_tele"),
        )
    )
    return (
        base.join(S, ["row", "col"], "left")
        .select(
            "row",
            "col",
            (
                F.lit(alpha) * F.coalesce("_s", F.lit(0.0))
                + F.col("_dterm")
                + F.col("_tele")
            ).alias("value"),
        )
    )
