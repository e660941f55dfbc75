"""Checkpoint/resume evidence at the 111M-edge scale (north_rule:
"resumable from checkpoint with per-partition lineage + metrics").

The toy fixture (tests/test_checkpoint_resume.py) proves bit-identical
resume on 100 nodes; this script proves the SAME contract holds — and
measures what checkpointing costs — on the 6M-node / 111M-edge graph
the scaling evidence uses:

  1. pagerank fixed_iters=8 WITHOUT checkpointing       -> wall A
  2. pagerank fixed_iters=8 WITH checkpoint_dir          -> wall B
     (B - A) / 8 = per-superstep parquet-checkpoint overhead
  3. delete checkpoints > iter 4 (simulated mid-run kill)
  4. pagerank resume=True                                -> wall C
     (should re-run only supersteps 5-7 + the restore read)
  5. assert resumed scores == uninterrupted scores EXACTLY
     (bit-identical doubles, not allclose) and that every kept
     iter=k dir carries per-partition lineage metrics.

Usage: python scripts/resume_scale.py [edges_parquet] [cores] [plain_wall_s]
(pass a previously measured plain wall as arg 3 to skip phase 1)
Writes /tmp/resume_scale.json.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from graphblas_algorithms_spark.classes.graph import DiGraph
from graphblas_algorithms_spark.operators.pagerank import pagerank
from graphblas_algorithms_spark.session import get_spark

CKPT = "/tmp/resume_scale_ckpt"
ITERS = 8
KEEP = 4  # checkpoints kept after the simulated kill


def main():
    edges_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_scale_edges"
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    spark = get_spark(cores=cores, shuffle_partitions=2 * cores, driver_memory="48g")
    edges = spark.read.parquet(edges_path).select("src", "dst")
    G = DiGraph(edges)

    shutil.rmtree(CKPT, ignore_errors=True)

    if len(sys.argv) > 3:
        wall_plain = float(sys.argv[3])
        print(f"plain: {wall_plain}s (carried from a prior run)", flush=True)
    else:
        t0 = time.time()
        base = pagerank(G, fixed_iters=ITERS)
        base_sum = base.agg(F.sum("rank"), F.count("*")).collect()[0]
        wall_plain = round(time.time() - t0, 1)
        print(f"plain: {wall_plain}s sum={base_sum}", flush=True)

    # hash the full vector cheaply: xor of per-row hashes is order-free
    # (and unlike sum it cannot overflow ANSI-mode longs at 6M rows)
    vec_hash = [
        F.expr("bit_xor(xxhash64(id, rank))").alias("h"),
        F.count("*").alias("n"),
    ]

    t0 = time.time()
    ck = pagerank(G, fixed_iters=ITERS, checkpoint_dir=CKPT)
    ck_hash = ck.agg(*vec_hash).collect()[0]
    wall_ckpt = round(time.time() - t0, 1)
    print(f"checkpointed: {wall_ckpt}s hash={ck_hash}", flush=True)

    # per-partition lineage metrics must exist for every superstep
    metrics_ok = True
    for k in range(ITERS):
        p = os.path.join(CKPT, f"iter={k}", "metrics.json")
        with open(p) as f:
            m = json.load(f)
        if "partition_rows" not in m or m.get("iter") != k:
            metrics_ok = False

    # simulated kill: drop checkpoints past KEEP
    for name in list(os.listdir(CKPT)):
        if name.startswith("iter=") and int(name.split("=")[1]) > KEEP:
            shutil.rmtree(os.path.join(CKPT, name))

    t0 = time.time()
    res = pagerank(G, fixed_iters=ITERS, checkpoint_dir=CKPT, resume=True)
    res_hash = res.agg(*vec_hash).collect()[0]
    wall_resume = round(time.time() - t0, 1)
    print(f"resumed: {wall_resume}s hash={res_hash}", flush=True)

    identical = (res_hash["h"] == ck_hash["h"]) and (res_hash["n"] == ck_hash["n"])
    out = {
        "edges": 111058448,
        "iters": ITERS,
        "kept_iters": KEEP + 1,
        "wall_plain_s": wall_plain,
        "wall_checkpointed_s": wall_ckpt,
        "ckpt_overhead_per_superstep_s": round((wall_ckpt - wall_plain) / ITERS, 2),
        "wall_resume_s": wall_resume,
        "resume_vs_full_ratio": round(wall_resume / wall_ckpt, 3),
        "bit_identical": identical,
        "lineage_metrics_all_supersteps": metrics_ok,
    }
    with open("/tmp/resume_scale.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out), flush=True)
    assert identical, "resumed vector differs from uninterrupted run"
    assert metrics_ok, "missing per-partition lineage metrics"


if __name__ == "__main__":
    main()
