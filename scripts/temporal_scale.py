"""Time-respecting reachability at the 111M-edge scale.

Evidence for the temporal kernel's cost shape: h hop-rounds, each ONE
O(nnz) hash join (with the t >= arrival predicate evaluated inside the
join) + a min-agg — PageRank-superstep currency with a wider key.
Timestamps are synthesized deterministically (xxhash64 of the edge) so
the run replays bit-identically; sources are the k lowest node ids.

Usage: python scripts/temporal_scale.py [edges_parquet] [cores] [hops] [n_src]
Writes /tmp/temporal_scale.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from graphblas_algorithms_spark.operators.temporal import temporal_reachability
from graphblas_algorithms_spark.session import get_spark, stop_spark


def main():
    edges_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_scale_edges"
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    hops = int(sys.argv[3]) if len(sys.argv) > 3 else 6
    n_src = int(sys.argv[4]) if len(sys.argv) > 4 else 8
    if not os.path.exists(edges_path):
        import bench

        bench.SCALE_DIR = edges_path
        bench._scaling_build()
        stop_spark()
    spark = get_spark(cores=cores, shuffle_partitions=2 * cores, driver_memory="48g")
    raw = spark.read.parquet(edges_path).select("src", "dst")
    # deterministic timestamp in [0, 1e9): a pure function of the edge
    edges = raw.select(
        "src", "dst", F.pmod(F.xxhash64("src", "dst"), F.lit(1_000_000_000)).alias("t")
    )
    m = edges.count()
    sources = [
        r["id"]
        for r in raw.select(F.col("src").alias("id"))
        .distinct()
        .orderBy("id")
        .limit(n_src)
        .collect()
    ]
    t0 = time.time()
    out = temporal_reachability(edges, sources, max_hops=hops).persist()
    rows = out.count()
    wall = time.time() - t0
    res = {
        "cores": cores,
        "edges": m,
        "hops": hops,
        "sources": n_src,
        "reached_pairs": rows,
        "wall_s": round(wall, 1),
        "wall_per_hop_s": round(wall / hops, 1),
        "edge_visits_per_s": round(m * hops / wall),
    }
    print(json.dumps(res), flush=True)
    with open("/tmp/temporal_scale.json", "w") as f:
        json.dump(res, f)


if __name__ == "__main__":
    main()
