"""propagate_features vs a dense numpy replay of D^-1 (A + I) x."""

from __future__ import annotations

import networkx as nx
import numpy as np
from pyspark.sql import functions as F

from graphblas_algorithms_spark import from_networkx
from graphblas_algorithms_spark.operators.features import propagate_features


def test_propagate_features_matches_numpy(spark):
    nxg = nx.gnp_random_graph(30, 0.15, seed=9)
    G = from_networkx(spark, nxg)
    rng = np.random.default_rng(4)
    d = 5
    X = rng.normal(size=(30, d))

    feats = spark.createDataFrame(
        [(i, [float(v) for v in X[i]]) for i in range(30)],
        "id long, vec array<double>",
    )
    for iters in (0, 1, 3):
        got = {
            (r["id"], r["pos"]): r["val"]
            for r in propagate_features(G, feats, iters=iters).collect()
        }
        A = nx.to_numpy_array(nxg, nodelist=range(30)) + np.eye(30)
        Y = X.copy()
        for _ in range(iters):
            Y = (A @ Y) / A.sum(axis=1, keepdims=True)
        assert len(got) == 30 * d
        for (i, p), v in got.items():
            assert abs(v - Y[i, p]) < 1e-9, (i, p, v, Y[i, p])


def test_propagate_features_partial_coverage(spark):
    """A node with no feature row acquires features purely from its
    neighbors (empty self-term, deg+1 divisor); an isolated featured
    node keeps its vector verbatim."""
    e = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
    from graphblas_algorithms_spark.classes.graph import Graph

    G = Graph(e, spark.range(4).select("id"))  # node 3 isolated
    feats = spark.createDataFrame(
        [(0, [1.0, 2.0]), (2, [3.0, 6.0]), (3, [9.0, 9.0])],
        "id long, vec array<double>",
    )
    got = {
        (r["id"], r["pos"]): r["val"]
        for r in propagate_features(G, feats, iters=1).collect()
    }
    # node 1: no self features; neighbors 0 and 2; deg(1)+1 = 3
    assert got[(1, 0)] == (1.0 + 3.0) / 3
    assert got[(1, 1)] == (2.0 + 6.0) / 3
    # node 0: self + neighbor 1 (featureless); deg(0)+1 = 2
    assert got[(0, 0)] == 1.0 / 2
    # isolated node 3 keeps its features (divisor 1)
    assert got[(3, 0)] == 9.0
