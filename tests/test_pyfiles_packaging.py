"""spark-submit --py-files packaging contract (north_star: the engine
ships to a cluster as one zip; no repo checkout or pip install on
workers).  Builds dist/graphblas_algorithms_spark.zip, then runs the
scripts/submit_pagerank.py job via real spark-submit from a neutral cwd
with no PYTHONPATH — imports succeed only if the zip is self-contained."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import zipfile

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


def test_pyfiles_zip_deterministic(tmp_path):
    sys.path.insert(0, os.path.join(ROOT, "scripts"))
    from build_pyfiles import build

    z1 = build(str(tmp_path / "a.zip"))
    z2 = build(str(tmp_path / "b.zip"))
    b1, b2 = open(z1, "rb").read(), open(z2, "rb").read()
    assert b1 == b2  # byte-reproducible
    names = zipfile.ZipFile(z1).namelist()
    assert "graphblas_algorithms_spark/__init__.py" in names
    assert "graphblas_algorithms_spark/operators/pagerank.py" in names
    assert not any("__pycache__" in n for n in names)


@pytest.mark.skipif(not os.path.exists(SPARK_SUBMIT), reason="no spark-submit")
def test_spark_submit_pyfiles_pagerank(spark, tmp_path):
    from pyspark.sql import functions as F

    sys.path.insert(0, os.path.join(ROOT, "scripts"))
    from build_pyfiles import build

    pyz = build(str(tmp_path / "engine.zip"))
    # small deterministic edge table: 3-cycle + chain + dangling node
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4)], "src long, dst long"
    )
    edges_pq = str(tmp_path / "edges")
    edges.write.parquet(edges_pq)
    out_pq = str(tmp_path / "ranks")

    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    proc = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--conf", "spark.ui.enabled=false",
            "--py-files", pyz,
            os.path.join(ROOT, "scripts", "submit_pagerank.py"),
            edges_pq, out_pq, "--fixed-iters", "10",
        ],
        cwd=str(tmp_path),  # neutral cwd: package import must come from the zip
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    metrics = json.loads(
        [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    )
    assert metrics["nodes"] == 5 and metrics["edges"] == 5

    got = {
        r["id"]: r["rank"]
        for r in spark.read.parquet(out_pq).collect()
    }
    # same kernel in-process must agree exactly (same plan, same arithmetic)
    from graphblas_algorithms_spark.classes.graph import DiGraph
    from graphblas_algorithms_spark.operators.pagerank import pagerank

    want = {
        r["id"]: r["rank"]
        for r in pagerank(DiGraph(edges), fixed_iters=10).collect()
    }
    assert got.keys() == want.keys()
    for k in want:
        assert abs(got[k] - want[k]) < 1e-12
