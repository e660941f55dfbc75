"""k-hop neighbor-sampled block generation at the 111M-edge scale.

Seeds = every 60th node (~100k of 6M — a large GNN minibatch), fanouts
(10, 5).  The hop-1 window ranks each seed's full neighbor list (hub
seeds have 10^4-degree lists — the skew case the operator's per-src
window is designed to absorb); hop 2 runs over the distinct sampled
frontier.  Checks per-(hop, src) caps and a bit-identical re-run.

Usage: python scripts/khop_scale.py [edges_parquet] [cores]
Writes /tmp/khop_scale.json.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from graphblas_algorithms_spark.classes.graph import Graph
from graphblas_algorithms_spark.session import get_spark


def main():
    edges_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_scale_edges"
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    spark = get_spark(cores=cores, shuffle_partitions=2 * cores, driver_memory="48g")
    from graphblas_algorithms_spark.operators.sampling import khop_neighbor_sample

    canon = (
        spark.read.parquet(edges_path)
        .select(F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .persist()
    )
    m = canon.count()
    G = Graph(canon, canonicalize=False)
    seeds = G.nodes.filter(F.col("id") % 60 == 0).persist()
    n_seeds = seeds.count()
    print(f"graph: {m} canonical edges; {n_seeds} seeds", flush=True)

    t0 = time.time()
    blocks = khop_neighbor_sample(G, seeds=seeds, fanouts=(10, 5)).persist()
    per_hop = {r["hop"]: r["c"] for r in blocks.groupBy("hop").agg(F.count("*").alias("c")).collect()}
    wall = time.time() - t0
    print(f"blocks: {per_hop} in {wall:.1f}s", flush=True)

    over = (
        blocks.groupBy("hop", "src")
        .count()
        .filter(
            ((F.col("hop") == 1) & (F.col("count") > 10))
            | ((F.col("hop") == 2) & (F.col("count") > 5))
        )
        .count()
    )
    print(f"(hop, src) groups over cap: {over}", flush=True)

    blocks2 = khop_neighbor_sample(G, seeds=seeds, fanouts=(10, 5))
    sym_diff = (
        blocks.unionByName(blocks2)
        .groupBy("hop", "src", "dst")
        .count()
        .filter(F.col("count") != 2)
        .count()
    )
    print(f"determinism sym-diff: {sym_diff}", flush=True)

    out = {
        "cores": cores,
        "canonical_edges": m,
        "seeds": n_seeds,
        "fanouts": [10, 5],
        "hop1_rows": per_hop.get(1, 0),
        "hop2_rows": per_hop.get(2, 0),
        "wall_s": round(wall, 1),
        "groups_over_cap": over,
        "determinism_sym_diff": sym_diff,
    }
    with open("/tmp/khop_scale.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()


