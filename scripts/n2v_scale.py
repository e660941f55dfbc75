"""node2vec second-order walks at the 111M-edge scale (r4: measures the
co-located prev-adjacency join — VERDICT r3 'Next round' #4; r3's
unbucketed join cost 120.5 s/hop vs first-order's 14.4).

Usage: python scripts/n2v_scale.py [edges_parquet] [cores] [n_starts] [hops] [method]
``method``: es (default) or rejection (r5, KnightKing-style — VERDICT r4 #6).
Writes /tmp/n2v_scale_<method>.json.  Build the edge parquet with
SPARK_GRAFT_SCALING=1 python bench.py (bench._scaling_build) or any
(src, dst) parquet of comparable size.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from graphblas_algorithms_spark.classes.graph import Graph
from graphblas_algorithms_spark.operators.walks import node2vec_walks
from graphblas_algorithms_spark.session import get_spark


def main():
    edges_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_scale_edges"
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    n_starts = int(sys.argv[3]) if len(sys.argv) > 3 else 100_000
    hops = int(sys.argv[4]) if len(sys.argv) > 4 else 5
    method = sys.argv[5] if len(sys.argv) > 5 else "es"
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
    w = node2vec_walks(
        G, walk_length=hops, p=2.0, q=0.5, num_walks=1, starts=starts,
        method=method,
    ).persist()
    rows = w.count()
    wall = time.time() - t0
    print(
        f"node2vec[{method}]: {n_starts} starts x {hops} hops -> {rows} positions "
        f"in {wall:.1f}s ({wall / hops:.1f}s/hop)",
        flush=True,
    )
    out = {
        "cores": cores,
        "method": method,
        "edges_canonical": m,
        "n_starts": n_starts,
        "hops": hops,
        "rows": rows,
        "wall_s": round(wall, 1),
        "s_per_hop": round(wall / hops, 2),
    }
    with open(f"/tmp/n2v_scale_{method}.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
