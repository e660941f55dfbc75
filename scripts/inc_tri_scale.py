"""Incremental triangle maintenance at the 111M-edge scale.

State = the full 111M-canonical-edge graph (triangle total 17,780,460,
measured by scripts/kernels_scale.py at 468.8 s full recount).  Two
batch shapes are merged through streaming/triangles.py:

1. a fresh 50-clique on unseen node ids — the increment is EXACTLY
   C(50,3) = 19,600, an at-scale correctness check with a known answer;
2. 100k deterministic new edges between existing nodes (md5-derived
   endpoints, anti-joined to be truly new) — the production shape,
   exercising the old-adjacency wedge joins on a graph with 10^4-degree
   hubs.

The point: per-batch wall is priced by sum(d(endpoint)) over the delta,
not by the 1.3e9-wedge full recount.

Usage: python scripts/inc_tri_scale.py [edges_parquet] [cores]
Writes /tmp/inc_tri_scale.json.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from graphblas_algorithms_spark.session import get_spark
from graphblas_algorithms_spark.streaming.triangles import merge_triangle_batch

KNOWN_TOTAL = 17_780_460  # scripts/kernels_scale.py, BENCH/BASELINE.md


def main():
    edges_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_scale_edges"
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    spark = get_spark(cores=cores, shuffle_partitions=2 * cores, driver_memory="48g")
    raw = spark.read.parquet(edges_path).select("src", "dst")
    state = (
        raw.select(F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .persist()
    )
    m = state.count()
    print(f"state: {m} canonical edges (total={KNOWN_TOTAL} known)", flush=True)

    # batch 1: fresh 50-clique on unseen ids (>= 10M) — known increment
    k = spark.range(10_000_000, 10_000_050)
    clique = (
        k.alias("a")
        .join(k.alias("b"), F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("src"), F.col("b.id").alias("dst"))
    )
    t0 = time.time()
    state, inc1 = merge_triangle_batch(state, clique)
    state = state.persist()
    w1 = time.time() - t0
    want1 = 50 * 49 * 48 // 6
    print(f"clique batch: inc={inc1} (want {want1}) in {w1:.1f}s", flush=True)
    assert inc1 == want1, (inc1, want1)

    # batch 2: 100k deterministic new edges between existing nodes
    n_nodes = 6_000_000
    cand = (
        spark.range(0, 150_000)
        .select(
            (F.abs(F.xxhash64(F.col("id"), F.lit(1))) % n_nodes).alias("src"),
            (F.abs(F.xxhash64(F.col("id"), F.lit(2))) % n_nodes).alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .limit(100_000)
    )
    t1 = time.time()
    state, inc2 = merge_triangle_batch(state, cand)
    w2 = time.time() - t1
    print(f"100k-edge batch: inc={inc2} new triangles in {w2:.1f}s", flush=True)

    out = {
        "cores": cores,
        "state_edges": m,
        "clique_inc": inc1,
        "clique_wall_s": round(w1, 1),
        "batch100k_inc": inc2,
        "batch100k_wall_s": round(w2, 1),
        "full_recount_wall_s": 468.8,
    }
    with open("/tmp/inc_tri_scale.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
