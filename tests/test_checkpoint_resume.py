"""FIXTURES.md F4: resume-from-checkpoint must equal the uninterrupted
run exactly, with per-partition lineage metrics present."""

from __future__ import annotations

import json
import os
import shutil

import networkx as nx
import pytest

from graphblas_algorithms_spark import from_networkx
from graphblas_algorithms_spark.operators.components import connected_components
from graphblas_algorithms_spark.operators.pagerank import pagerank
from graphblas_algorithms_spark.plans.superstep import Superstep


@pytest.fixture()
def ckpt(tmp_path):
    d = str(tmp_path / "ckpt")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_pagerank_resume_identical(spark, ckpt):
    nxg = nx.gnp_random_graph(100, 0.05, seed=42)
    G = from_networkx(spark, nxg)
    full = {
        r["id"]: r["rank"]
        for r in pagerank(G, fixed_iters=12, checkpoint_dir=ckpt).collect()
    }
    # simulate a kill after superstep 6: delete checkpoints > 6
    for name in os.listdir(ckpt):
        if int(name.split("=")[1]) > 6:
            shutil.rmtree(os.path.join(ckpt, name))
    resumed = {
        r["id"]: r["rank"]
        for r in pagerank(
            G, fixed_iters=12, checkpoint_dir=ckpt, resume=True
        ).collect()
    }
    assert resumed == full  # bit-identical, not just allclose


def test_metrics_lineage_written(spark, ckpt):
    nxg = nx.gnp_random_graph(50, 0.08, seed=1)
    G = from_networkx(spark, nxg)
    pagerank(G, fixed_iters=4, checkpoint_dir=ckpt)
    iters = sorted(os.listdir(ckpt))
    assert iters == ["iter=0", "iter=1", "iter=2", "iter=3"]
    with open(os.path.join(ckpt, "iter=2", "metrics.json")) as f:
        m = json.load(f)
    assert m["iter"] == 2
    assert m["kernel"] == "pagerank"
    assert "partition_rows" in m and sum(m["partition_rows"].values()) == 50
    assert "wall_s" in m and "schema" in m


def test_incomplete_checkpoint_ignored(spark, ckpt):
    """metrics.json is the commit marker: a state dir without it (killed
    mid-write) must not be resumed from."""
    nxg = nx.gnp_random_graph(30, 0.1, seed=2)
    G = from_networkx(spark, nxg)
    pagerank(G, fixed_iters=3, checkpoint_dir=ckpt)
    os.remove(os.path.join(ckpt, "iter=2", "metrics.json"))
    harness = Superstep(spark, ckpt)
    it, _ = harness.latest()
    assert it == 1


def test_components_checkpoint_resume(spark, ckpt):
    nxg = nx.gnp_random_graph(80, 0.03, seed=3)
    G = from_networkx(spark, nxg)
    full = {
        r["id"]: r["component"]
        for r in connected_components(G, checkpoint_dir=ckpt).collect()
    }
    # wipe later iters, resume
    iters = sorted(
        int(n.split("=")[1]) for n in os.listdir(ckpt) if n.startswith("iter=")
    )
    if len(iters) > 1:
        shutil.rmtree(os.path.join(ckpt, f"iter={iters[-1]}"))
    resumed = {
        r["id"]: r["component"]
        for r in connected_components(G, checkpoint_dir=ckpt, resume=True).collect()
    }
    assert resumed == full


def test_components_star_checkpoint_resume(spark, ckpt):
    """Star contraction's iterated state is the EDGE set; a resumed run
    from a mid-alternation checkpoint must yield identical labels."""
    nxg = nx.gnp_random_graph(80, 0.03, seed=9)
    nxg.add_nodes_from(range(80, 86))
    G = from_networkx(spark, nxg)
    full = {
        r["id"]: r["component"]
        for r in connected_components(
            G, checkpoint_dir=ckpt, method="star"
        ).collect()
    }
    iters = sorted(
        int(n.split("=")[1]) for n in os.listdir(ckpt) if n.startswith("iter=")
    )
    assert iters, "star run wrote no checkpoints"
    if len(iters) > 1:
        shutil.rmtree(os.path.join(ckpt, f"iter={iters[-1]}"))
    resumed = {
        r["id"]: r["component"]
        for r in connected_components(
            G, checkpoint_dir=ckpt, method="star", resume=True
        ).collect()
    }
    assert resumed == full


def test_iceberg_mode_gated(spark):
    """checkpoint_table= fails fast with a clear message when no Iceberg
    runtime is on the classpath (this container ships none), and the
    availability probe itself answers False rather than raising."""
    from graphblas_algorithms_spark.plans.superstep import iceberg_available

    if iceberg_available(spark):
        pytest.skip("Iceberg runtime present; gating path not applicable")
    with pytest.raises(RuntimeError, match="Iceberg runtime"):
        Superstep(spark, checkpoint_table="local.db.ckpt")


def test_dir_and_table_mutually_exclusive(spark, ckpt):
    with pytest.raises(ValueError):
        Superstep(spark, checkpoint_dir=ckpt, checkpoint_table="local.db.ckpt")


def test_lineage_cut_canary_not_silently_degraded(spark):
    """CANARY (VERDICT r2 'Next round' #9): lineage_cut's fast path uses
    private JVM APIs (internalCreateDataFrame over the checkpointed RDD)
    to drop the poisoned Statistics estimate; its except-fallback returns
    the plain localCheckpoint, which is CORRECT but silently reintroduces
    the measured exponential-stats regression (~3x wall growth per
    superstep from iter ~17).  This test fails loudly if a Spark upgrade
    makes the fast path unavailable, so the degradation can never ship
    unnoticed."""
    from pyspark.sql import functions as F

    from graphblas_algorithms_spark.plans.superstep import (
        _release_state,
        lineage_cut,
    )

    df = spark.range(1000).select(
        F.col("id"), (F.col("id") % 7).alias("v")
    )
    cut = lineage_cut(df)
    # fast path marker: the stats-free rebuild attaches the checkpointed
    # intermediate as _gas_ckpt; the fallback path returns the checkpoint
    # itself with no attachment
    assert getattr(cut, "_gas_ckpt", None) is not None, (
        "lineage_cut took the plain-localCheckpoint fallback - the "
        "exponential-stats fix is silently OFF on this Spark version"
    )
    assert cut.count() == 1000
    # and _release_state must actually free the checkpoint blocks
    sc = spark.sparkContext
    n_before = len([i for i in sc._jsc.sc().getRDDStorageInfo()])
    _release_state(cut)
    n_after = len([i for i in sc._jsc.sc().getRDDStorageInfo()])
    assert n_after < n_before or n_before == 0


def test_pagerank_resume_identical_with_check_every(spark, ckpt):
    """tol-mode resume with check_every: the cadence is keyed on the
    absolute iteration index, so a killed-and-resumed run replays the
    same check schedule and lands on the identical final state."""
    nxg = nx.gnp_random_graph(100, 0.05, seed=42)
    G = from_networkx(spark, nxg)
    full = {
        r["id"]: r["rank"]
        for r in pagerank(
            G, tol=1e-9, check_every=2, checkpoint_dir=ckpt
        ).collect()
    }
    done = sorted(int(n.split("=")[1]) for n in os.listdir(ckpt))
    cut = done[len(done) // 2]
    for name in list(os.listdir(ckpt)):
        if int(name.split("=")[1]) > cut:
            shutil.rmtree(os.path.join(ckpt, name))
    resumed = {
        r["id"]: r["rank"]
        for r in pagerank(
            G, tol=1e-9, check_every=2, checkpoint_dir=ckpt, resume=True
        ).collect()
    }
    assert resumed == full  # bit-identical, not just allclose
