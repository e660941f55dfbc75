"""Incremental CC maintenance at the 111M-edge scale: after a bulk
load, how much does keeping the labeling current cost per delta batch,
vs recomputing CC from scratch?

Protocol: split the 111M-edge corpus graph into a 99% bulk set and K
1%-ish delta batches (deterministic hash split).  Bootstrap the label
store from batch CC over the bulk set (the right way to initialize —
star/min-label at full width), then stream the delta batches through
``merge_edge_batch`` and time each merge.  Compare against the full
recompute wall measured on the same host (scripts/star_scale.py).
Verifies the final labels against a direct batch CC over ALL edges
(join-exact, all 6M nodes).

Usage: python scripts/inc_cc_scale.py [edges_parquet] [cores] [k_deltas]
Writes /tmp/inc_cc_scale.json.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from graphblas_algorithms_spark.classes.graph import Graph
from graphblas_algorithms_spark.operators.components import connected_components
from graphblas_algorithms_spark.session import get_spark
from graphblas_algorithms_spark.streaming.components import merge_edge_batch


def main():
    edges_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_scale_edges"
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    spark = get_spark(cores=cores, shuffle_partitions=2 * cores, driver_memory="48g")

    raw = spark.read.parquet(edges_path).select("src", "dst")
    bucket = F.abs(F.xxhash64("src", "dst")) % 100
    bulk = raw.filter(bucket >= k).persist()
    m_bulk = bulk.count()
    deltas = [raw.filter(bucket == i).persist() for i in range(k)]
    m_deltas = [d.count() for d in deltas]
    print(f"bulk={m_bulk} deltas={m_deltas}", flush=True)

    nodes = (
        bulk.select(F.col("src").alias("id"))
        .unionByName(bulk.select(F.col("dst").alias("id")))
        .distinct()
    )
    t0 = time.time()
    labels = connected_components(Graph(bulk, nodes)).persist()
    labels.count()
    wall_bootstrap = round(time.time() - t0, 1)
    print(f"bootstrap CC: {wall_bootstrap}s", flush=True)

    merge_walls = []
    for i, d in enumerate(deltas):
        t0 = time.time()
        labels2 = merge_edge_batch(labels, d).persist()
        labels2.count()
        merge_walls.append(round(time.time() - t0, 1))
        labels.unpersist()
        labels = labels2
        print(f"delta {i}: {m_deltas[i]} edges merged in {merge_walls[-1]}s", flush=True)

    # verify: labels over all edges == direct batch CC
    all_nodes = (
        raw.select(F.col("src").alias("id"))
        .unionByName(raw.select(F.col("dst").alias("id")))
        .distinct()
    )
    t0 = time.time()
    direct = connected_components(Graph(raw, all_nodes)).persist()
    direct.count()
    wall_full = round(time.time() - t0, 1)
    mismatches = (
        labels.withColumnRenamed("component", "a")
        .join(direct.withColumnRenamed("component", "b"), "id")
        .filter(F.col("a") != F.col("b"))
        .count()
    )
    out = {
        "cores": cores,
        "m_bulk": m_bulk,
        "m_deltas": m_deltas,
        "wall_bootstrap_s": wall_bootstrap,
        "delta_merge_walls_s": merge_walls,
        "wall_full_recompute_s": wall_full,
        "label_mismatches": mismatches,
    }
    print(json.dumps(out), flush=True)
    assert mismatches == 0
    with open("/tmp/inc_cc_scale.json", "w") as f:
        json.dump(out, f, indent=2)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
