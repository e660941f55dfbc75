"""Pivot-sampled betweenness + harmonic centrality at the 111M-edge scale.

Evidence for the two new distance-based centralities on the same
6M-node / 111M-edge corpus graph the scaling/SCC/ANF rows use: the
pivot estimators' cost is (supersteps x one-O(nnz)-shuffle), i.e. the
SAME per-superstep shape the scaling gate measures, independent of n
beyond the BFS itself — so a pivot count fixed by the estimator's
variance target prices centrality at 100 TB the way fixed-iteration
PageRank is priced.

Usage: python scripts/centrality_scale.py [edges_parquet] [cores] [k_btw] [k_harm]
Writes /tmp/centrality_scale.json.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from graphblas_algorithms_spark.classes.graph import Graph
from graphblas_algorithms_spark.operators.betweenness import betweenness_centrality
from graphblas_algorithms_spark.operators.centrality import harmonic_centrality
from graphblas_algorithms_spark.session import get_spark


def main():
    edges_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_scale_edges"
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    k_btw = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    k_harm = int(sys.argv[4]) if len(sys.argv) > 4 else 8
    spark = get_spark(cores=cores, shuffle_partitions=2 * cores, driver_memory="48g")
    raw = spark.read.parquet(edges_path).select("src", "dst")
    nodes = (
        raw.select(F.col("src").alias("id"))
        .unionByName(raw.select(F.col("dst").alias("id")))
        .distinct()
    )
    G = Graph(raw, nodes, canonicalize=True)
    m = G.edges.count()
    n = G.n
    print(f"undirected graph: {n} nodes, {m} canonical edges", flush=True)
    out = {"cores": cores, "nodes": n, "edges_canonical": m}

    # deterministic pivots: lowest ids (one per disjoint copy region is
    # irrelevant here — cost evidence, not estimate quality)
    pivots = [r["id"] for r in G.nodes.orderBy("id").limit(max(k_btw, k_harm)).collect()]

    t0 = time.time()
    h = harmonic_centrality(G, sources=pivots[:k_harm], dense=False).persist()
    nh = h.count()
    harm_wall = time.time() - t0
    print(f"harmonic k={k_harm}: {harm_wall:.1f}s, {nh} scored nodes", flush=True)
    out["harmonic"] = {"k": k_harm, "wall_s": round(harm_wall, 1), "rows": nh}
    h.unpersist()

    t0 = time.time()
    b = betweenness_centrality(
        G, sources=pivots[:k_btw], normalized=False, dense=False
    ).persist()
    nb = b.count()
    btw_wall = time.time() - t0
    top = b.orderBy(F.desc("betweenness")).limit(3).collect()
    print(
        f"betweenness k={k_btw}: {btw_wall:.1f}s, {nb} scored nodes, "
        f"top={[(r['id'], round(r['betweenness'], 1)) for r in top]}",
        flush=True,
    )
    out["betweenness"] = {"k": k_btw, "wall_s": round(btw_wall, 1), "rows": nb}
    b.unpersist()

    with open("/tmp/centrality_scale.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
