"""Negative edge sampling at the 111M-edge / 6M-node scale.

Runs operators/sampling.py::negative_edge_sample with k=5, factor=4 over
the full scale corpus: 6M nodes x 20 draws = 120M candidates mapped
through the frozen dense index, anti-joined against 222M symmetric
edges, ranked to <= 5 survivors per node.  Checks the invariants that
matter at scale (no sampled pair is a real edge; per-node cap holds;
the draw is deterministic across two runs) on a 100k-node sample.

Usage: python scripts/negsample_scale.py [edges_parquet] [cores]
Writes /tmp/negsample_scale.json.
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
    from graphblas_algorithms_spark.operators.sampling import negative_edge_sample

    canon = (
        spark.read.parquet(edges_path)
        .select(F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .persist()
    )
    m = canon.count()
    G = Graph(canon, canonicalize=False)
    n = G.nodes.count()
    print(f"graph: {n} nodes, {m} canonical edges", flush=True)

    t0 = time.time()
    neg = negative_edge_sample(G, k=5, factor=4).persist()
    n_neg = neg.count()
    wall = time.time() - t0
    print(f"sampled {n_neg} negatives in {wall:.1f}s", flush=True)

    # invariant 1: no sampled pair is a real edge (exact, full anti check)
    t1 = time.time()
    sym = G.get_property("sym_offdiag").select("src", "dst")
    leaked = neg.join(sym, ["src", "dst"], "inner").count()
    w_inv = time.time() - t1
    print(f"leaked real edges: {leaked} (checked in {w_inv:.1f}s)", flush=True)

    # invariant 2: per-node cap
    over = neg.groupBy("src").count().filter(F.col("count") > 5).count()
    cover = neg.select("src").distinct().count()
    print(f"nodes over cap: {over}; nodes covered: {cover}/{n}", flush=True)

    # invariant 3: determinism — re-run on a fresh lineage, compare 100k nodes
    neg2 = negative_edge_sample(G, k=5, factor=4).filter(F.col("src") < 100_000)
    a = neg.filter(F.col("src") < 100_000)
    sym_diff = a.unionByName(neg2).groupBy("src", "dst", "j").count().filter(
        F.col("count") != 2
    ).count()
    print(f"determinism sym-diff on <100k-node sample: {sym_diff}", flush=True)

    out = {
        "cores": cores,
        "nodes": n,
        "canonical_edges": m,
        "k": 5,
        "factor": 4,
        "negatives": n_neg,
        "sample_wall_s": round(wall, 1),
        "leaked_real_edges": leaked,
        "nodes_over_cap": over,
        "nodes_covered": cover,
        "determinism_sym_diff": sym_diff,
    }
    with open("/tmp/negsample_scale.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
