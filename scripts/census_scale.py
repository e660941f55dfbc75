"""Triad census at the 27.8M-edge scale (one disjoint copy of the
111M-edge scaling fixture), with the documented hub-cap workflow.

The full 6M-node fixture overflows the 003 complement (C(n,3) >= 2^63)
and its power-law hubs blow the wedge budget — both by design: the
kernel REFUSES and tells the user to census a capped subgraph.  This
script demonstrates that workflow end-to-end at scale on the r5
single-pass plan (triangle-arithmetic 012/102, no wedge cache):

1. load one 1.5M-node copy (ids < n_base) of the shared edge parquet;
2. price the uncapped job from one degree aggregate (the same
   pre-flight the kernel runs) and report the estimate;
3. cap support-degree at ``K`` (drop nodes with linked-pair degree
   > K, keep the induced subgraph) so sum C(d,2) fits the budget;
4. run the census and report the wall + the 16-class counts.

Usage: python scripts/census_scale.py [edges_parquet] [n_base] [K]
Writes one JSON line to stdout (and /tmp/census_scale.json).
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

EDGES = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_scale_edges"
N_BASE = int(sys.argv[2]) if len(sys.argv) > 2 else 1_500_000
K = int(sys.argv[3]) if len(sys.argv) > 3 else 32


def main() -> None:
    from graphblas_algorithms_spark.classes.graph import DiGraph
    from graphblas_algorithms_spark.operators.triads import _linked_pairs, triadic_census
    from graphblas_algorithms_spark.session import get_spark

    spark = get_spark(cores=16, shuffle_partitions=64, app_name="census-scale")
    edges = (
        spark.read.parquet(EDGES)
        .filter((F.col("src") < N_BASE) & (F.col("dst") < N_BASE))
        .persist()
    )
    m = edges.count()

    lp = _linked_pairs(edges)
    deg = (
        lp.select(F.col("u").alias("id"))
        .unionByName(lp.select(F.col("v").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("d"))
        .persist()
    )
    est_raw = int(
        deg.agg(F.sum(F.col("d") * (F.col("d") - 1) / 2).alias("w")).collect()[0]["w"]
    )
    hubs = deg.filter(F.col("d") > K).select("id").persist()
    n_hubs = hubs.count()

    capped = (
        edges.join(hubs.withColumnRenamed("id", "src"), "src", "left_anti")
        .join(hubs.withColumnRenamed("id", "dst"), "dst", "left_anti")
        .select("src", "dst")
        .persist()
    )
    m_cap = capped.count()
    nodes = (
        capped.select(F.col("src").alias("id"))
        .unionByName(capped.select(F.col("dst").alias("id")))
        .distinct()
        .persist()
    )
    n_cap = nodes.count()

    G = DiGraph(capped, nodes, dedup=True)
    t0 = time.time()
    rows = {r["triad_type"]: r["n"] for r in triadic_census(G).collect()}
    wall = time.time() - t0

    out = {
        "edges_copy": m,
        "wedges_uncapped_est": est_raw,
        "hub_cap_degree": K,
        "hubs_dropped": n_hubs,
        "edges_capped": m_cap,
        "nodes_capped": n_cap,
        "census_wall_s": round(wall, 2),
        "census": rows,
    }
    line = json.dumps(out)
    print(line)
    with open("/tmp/census_scale.json", "w") as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()
