"""Deterministic multilevel Louvain at the 111M-edge scale: wall per
level, community count, final modularity (vs label-propagation's).

Usage: python scripts/louvain_scale.py [edges_parquet] [cores] [rounds] [levels]
Writes /tmp/louvain_scale.json.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from graphblas_algorithms_spark.classes.graph import Graph
from graphblas_algorithms_spark.operators.louvain import louvain_communities
from graphblas_algorithms_spark.operators.metrics import modularity
from graphblas_algorithms_spark.session import get_spark


def main():
    edges_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_scale_edges"
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    levels = int(sys.argv[4]) if len(sys.argv) > 4 else 3
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
    comm = louvain_communities(G, rounds=rounds, levels=levels).persist()
    n_rows = comm.count()
    wall = time.time() - t0
    k = comm.select("community").distinct().count()
    top = (
        comm.groupBy("community")
        .count()
        .orderBy(F.desc("count"), "community")
        .limit(5)
        .collect()
    )
    print(f"louvain: {k} communities over {n_rows} nodes in {wall:.1f}s", flush=True)
    print("top-5 sizes:", [(r["community"], r["count"]) for r in top], flush=True)

    t1 = time.time()
    q = modularity(G, comm)
    q_wall = time.time() - t1
    print(f"modularity: {q:.6f} (computed in {q_wall:.1f}s)", flush=True)

    out = {
        "cores": cores,
        "rounds": rounds,
        "levels": levels,
        "edges_canonical": m,
        "nodes": n_rows,
        "communities": k,
        "top5_sizes": [int(r["count"]) for r in top],
        "modularity": q,
        "wall_s": round(wall, 1),
        "modularity_wall_s": round(q_wall, 1),
    }
    with open("/tmp/louvain_scale.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
