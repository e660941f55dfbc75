"""End-to-end bucketed edge-sink bench (VERDICT r2 "Next round" #8).

Three ways to feed the per-superstep ``state ⋈ edges`` join of the
PageRank kernel with the same 111M-edge parquet:

  A. naive      — plain parquet scan, no pre-partitioning: EVERY
                  superstep pays the O(nnz) edge-side exchange.
  B. session    — ``repartition(N, src).persist()`` once per session
                  (the kernel default): one prep shuffle, then pinned.
  C. bucketed   — ``write_edges_bucketed`` table: ZERO prep in the
                  consuming session, edge side exchange-free straight
                  off the scan (the partitioning survives ACROSS jobs).

Reports: one-time prep wall (B: repartition+materialize; C: none),
steady per-superstep wall (min/median of ``reps`` after 1 warmup), and
whether the physical plan shows an Exchange above the edge scan.

Usage: python scripts/bucketed_bench.py [edges_parquet] [cores] [reps]
Writes /tmp/bucketed_bench.json.  The bucketed table is written once to
spark-warehouse (skipped if it already exists — delete to re-measure
the write cost, which is reported separately when it happens).
"""

from __future__ import annotations

import json
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from graphblas_algorithms_spark.session import get_spark
from graphblas_algorithms_spark.sources.edges import (
    read_edges_bucketed,
    write_edges_bucketed,
)

TABLE = "bench_edges_bucketed"


def superstep(edges, state):
    """One plus-times vxm with the kernel's join shape."""
    return (
        state.join(edges, state["id"] == edges["src"])
        .groupBy(edges["dst"].alias("id"))
        .agg(F.sum(state["value"]).alias("value"))
    )


def main():
    edges_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_scale_edges"
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    buckets = 2 * cores

    spark = get_spark(cores=cores, shuffle_partitions=buckets, driver_memory="48g")
    raw = spark.read.parquet(edges_path).select("src", "dst")

    # one-time bucketed write (the producer side of the sink)
    t0 = time.time()
    if not spark.catalog.tableExists(TABLE):
        write_edges_bucketed(raw, TABLE, buckets=buckets)
        write_wall = round(time.time() - t0, 1)
    else:
        write_wall = None  # already present from an earlier run

    nodes = (
        raw.select(F.col("src").alias("id"))
        .unionByName(raw.select(F.col("dst").alias("id")))
        .distinct()
    )
    n = nodes.count()
    state = (
        nodes.select("id", (F.lit(1.0) / n).alias("value"))
        .repartition(buckets, "id")
        .localCheckpoint(eager=True)
    )

    results = {}

    def timed(label, edges, prep_wall):
        walls = []
        for i in range(reps + 1):
            t0 = time.time()
            superstep(edges, state).count()
            w = time.time() - t0
            if i > 0:
                walls.append(w)
        plan = superstep(edges, state)._jdf.queryExecution().executedPlan().toString()
        results[label] = {
            "prep_s": prep_wall,
            "superstep_min_s": round(min(walls), 2),
            "superstep_median_s": round(statistics.median(walls), 2),
            "n_exchanges_in_plan": plan.count("Exchange"),
            "bucketed_scan": "Bucketed: true" in plan or "SelectedBucketsCount" in plan,
        }
        print(label, results[label], flush=True)

    # A. naive: plain scan, no prep
    timed("A_naive_scan", raw, 0.0)

    # B. session-pinned: repartition + persist, prep timed
    t0 = time.time()
    pinned = raw.repartition(buckets, "src").persist()
    m = pinned.count()
    timed("B_session_pinned", pinned, round(time.time() - t0, 2))
    pinned.unpersist()

    # C. bucketed table: zero prep
    bucketed = read_edges_bucketed(spark, TABLE).select("src", "dst")
    timed("C_bucketed_table", bucketed, 0.0)

    out = {
        "edges": m,
        "nodes": n,
        "cores": cores,
        "buckets": buckets,
        "reps": reps,
        "bucketed_write_wall_s": write_wall,
        "variants": results,
    }
    with open("/tmp/bucketed_bench.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
