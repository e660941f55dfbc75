"""Plan-shape regression tests for the round-3 kernels."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graphblas_algorithms_spark.classes.graph import DiGraph, Graph


def _physical(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def _assert_no_cartesian(df, label):
    plan = _physical(df)
    for marker in ("CartesianProduct", "BroadcastNestedLoopJoin"):
        assert marker not in plan, f"{label} degenerated to {marker}:\n{plan}"


@pytest.fixture(scope="module")
def ug(spark):
    e = (
        spark.range(4000)
        .select((F.col("id") % 500).alias("src"), ((F.col("id") * 13) % 500).alias("dst"))
        .filter("src < dst")
        .distinct()
    )
    return Graph(e, spark.range(500).select("id"))


def test_butterfly_no_cartesian(spark):
    from graphblas_algorithms_spark.operators.bipartite import butterfly_counts

    e = spark.range(3000).select(
        (F.col("id") % 200).alias("src"), (1000 + F.col("id") % 90).alias("dst")
    )
    _assert_no_cartesian(butterfly_counts(e, side="src"), "butterfly_counts")


def test_hyperball_dense_output_invariants(ug):
    # the per-round frames are materialized (localCheckpoint), so the
    # final plan is an ExistingRDD scan — assert the data invariants
    # instead: one row per node, positive ball estimates
    from graphblas_algorithms_spark.operators.anf import hyperball

    df = hyperball(ug, h=1, k=4)
    assert df.columns == ["id", "reachable", "harmonic", "sum_dist"]
    assert df.count() == 500
    assert df.filter(F.col("reachable") <= 0).count() == 0


def test_truss_membership_no_cartesian(ug):
    from graphblas_algorithms_spark.operators.ktruss import truss_decomposition

    _assert_no_cartesian(truss_decomposition(ug, fixed_rounds=1), "trussness")


def test_temporal_query_join_keys_include_bucket(spark):
    """The followed-by derivation must join on (event_type, time bucket),
    never on event_type alone (4 hot keys -> quadratic)."""
    import __spark_entry__ as em

    df = em._temporal_edges(spark, "/root/testdata/sf0.001")
    plan = _physical(df)
    assert "jb" in plan, "time-bucket key missing from the range join"
    _assert_no_cartesian(df, "temporal followed-by edges")


def test_landmark_table_reuses_bfs_no_cartesian(ug):
    from graphblas_algorithms_spark.operators.landmarks import (
        approx_distances,
        landmark_distance_table,
    )

    tbl = landmark_distance_table(ug, k=2)
    pairs = ug.spark.createDataFrame([(1, 2)], "u long, v long")
    _assert_no_cartesian(approx_distances(tbl, pairs), "approx_distances")
