"""Walk-corpus generation at the 111M-edge scale.

Prices the embedding-corpus feeder the way the other kernels are
priced: hops x one-shuffle-per-hop, chains batched as one frontier.

Usage: python scripts/walks_scale.py [edges_parquet] [cores] [n_starts] [hops]
Writes /tmp/walks_scale.json.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from graphblas_algorithms_spark.classes.graph import Graph
from graphblas_algorithms_spark.operators.walks import random_walks
from graphblas_algorithms_spark.session import get_spark


def main():
    edges_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_scale_edges"
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    n_starts = int(sys.argv[3]) if len(sys.argv) > 3 else 100_000
    hops = int(sys.argv[4]) if len(sys.argv) > 4 else 5
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

    starts = G.nodes.orderBy("id").limit(n_starts).select("id")
    t0 = time.time()
    w = random_walks(G, walk_length=hops, num_walks=1, starts=starts).persist()
    rows = w.count()
    wall = time.time() - t0
    print(
        f"walks: {n_starts} starts x {hops} hops -> {rows} positions in "
        f"{wall:.1f}s ({wall / hops:.1f}s/hop)",
        flush=True,
    )
    out = {
        "cores": cores,
        "edges_canonical": m,
        "n_starts": n_starts,
        "hops": hops,
        "rows": rows,
        "wall_s": round(wall, 1),
        "s_per_hop": round(wall / hops, 2),
    }
    with open("/tmp/walks_scale.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
