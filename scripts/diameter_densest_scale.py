"""Double-sweep diameter + Bahmani densest-subgraph peel at the
111M-edge scale (the same synthesized source-code link graph every
other scale run uses).

Double sweep = 2 BFS passes — the cheapest whole-graph statistic we
ship; the densest peel = O(log n) rounds on a geometrically shrinking
edge set.  Records wall, rounds, and the result statistics.

Usage: python scripts/diameter_densest_scale.py [edges_parquet] [cores]
Writes /tmp/diameter_densest_scale.json.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from graphblas_algorithms_spark.classes.graph import Graph
from graphblas_algorithms_spark.operators.densest import densest_subgraph
from graphblas_algorithms_spark.operators.diameter import double_sweep
from graphblas_algorithms_spark.session import get_spark


def main():
    edges_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_scale_edges"
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    spark = get_spark(cores=cores, shuffle_partitions=2 * cores, driver_memory="48g")
    raw = spark.read.parquet(edges_path).select("src", "dst")
    nodes = (
        raw.select(F.col("src").alias("id"))
        .unionByName(raw.select(F.col("dst").alias("id")))
        .distinct()
    )
    G = Graph(raw, nodes, canonicalize=True)
    m = G.edges.count()
    print(f"graph: {G.n} nodes, {m} canonical edges", flush=True)

    t0 = time.time()
    row = double_sweep(G).collect()[0]
    ds_wall = time.time() - t0
    print(f"double_sweep: {dict(row.asDict())} in {ds_wall:.1f}s", flush=True)

    t1 = time.time()
    out, stats = densest_subgraph(G, eps_num=1, eps_den=10, return_stats=True)
    n_best = out.count()
    dn_wall = time.time() - t1
    best = max(stats, key=lambda s: (s[3], -s[0]))
    print(
        f"densest: best snapshot r={best[0]} n={best[1]} m={best[2]} "
        f"rho={best[3]:.2f} ({len(stats)} snapshots, {dn_wall:.1f}s)",
        flush=True,
    )

    result = {
        "cores": cores,
        "edges_canonical": m,
        "nodes": G.n,
        "double_sweep": dict(row.asDict()),
        "double_sweep_wall_s": round(ds_wall, 1),
        "densest_best_round": best[0],
        "densest_best_n": best[1],
        "densest_best_m": best[2],
        "densest_best_density": round(best[3], 3),
        "densest_rounds": len(stats),
        "densest_returned_n": n_best,
        "densest_wall_s": round(dn_wall, 1),
    }
    with open("/tmp/diameter_densest_scale.json", "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
