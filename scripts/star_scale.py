"""Star-contraction CC at scale: the diameter-independence evidence.

Two workloads:

1. A 20M-node path graph (diameter 20M-1) — the adversarial case for
   min-label propagation, which needs one superstep per diameter unit
   (~20M supersteps; at the measured ~1 s/superstep that is months of
   wall — infeasible, reported as a projected bound, not run).  Star
   contraction collapses it in O(log n) alternations.

2. The 111M-edge synthesized source-code link graph (low diameter —
   the regime min-label is designed for): both methods run, walls
   compared, labels checked identical via a join (exact integer
   equality, not sampling).

Usage: python scripts/star_scale.py [edges_parquet] [cores] [path_n]
Writes /tmp/star_scale.json.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from graphblas_algorithms_spark.classes.graph import Graph
from graphblas_algorithms_spark.operators.components import (
    connected_components,
    connected_components_star,
)
from graphblas_algorithms_spark.session import get_spark


def main():
    edges_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_scale_edges"
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    path_n = int(sys.argv[3]) if len(sys.argv) > 3 else 20_000_000
    spark = get_spark(cores=cores, shuffle_partitions=2 * cores, driver_memory="48g")
    out: dict = {"cores": cores}

    # -- 1. the high-diameter path ------------------------------------
    pe = (
        spark.range(path_n - 1)
        .select(F.col("id").alias("src"), (F.col("id") + 1).alias("dst"))
        .repartition(2 * cores)
        .persist()
    )
    pe.count()
    Gp = Graph(pe, spark.range(path_n).select("id"), canonicalize=False)
    stats: dict = {}
    t0 = time.time()
    labels = connected_components_star(Gp, stats=stats).persist()
    n_lab = labels.count()
    wall_star = time.time() - t0
    bad = labels.filter(F.col("component") != 0).count()
    out["path"] = {
        "n_nodes": path_n,
        "rounds": stats["rounds"],
        "supersteps": stats["supersteps"],
        "wall_star_s": round(wall_star, 1),
        "labels_emitted": n_lab,
        "mislabeled": bad,
        "minlabel_projected": (
            f"~{path_n - 1} supersteps at ~1 s/superstep — infeasible; "
            "not run"
        ),
    }
    print(json.dumps(out["path"]), flush=True)
    assert bad == 0 and n_lab == path_n
    labels.unpersist()
    Gp  # noqa: B018
    pe.unpersist()

    # -- 2. the 111M-edge link graph (low diameter) --------------------
    raw = spark.read.parquet(edges_path).select("src", "dst")
    nodes = (
        raw.select(F.col("src").alias("id"))
        .unionByName(raw.select(F.col("dst").alias("id")))
        .distinct()
        .persist()
    )
    n = nodes.count()
    G = Graph(raw, nodes)
    m = G.edges.count()
    print(f"corpus graph: {n} nodes, {m} canonical edges", flush=True)

    t0 = time.time()
    ml = connected_components(G).persist()
    ml.count()
    wall_ml = time.time() - t0

    stats2: dict = {}
    t0 = time.time()
    st = connected_components_star(G, stats=stats2).persist()
    st.count()
    wall_st = time.time() - t0

    mismatches = (
        ml.withColumnRenamed("component", "a")
        .join(st.withColumnRenamed("component", "b"), "id")
        .filter(F.col("a") != F.col("b"))
        .count()
    )
    out["corpus"] = {
        "n_nodes": n,
        "m_edges": m,
        "wall_minlabel_s": round(wall_ml, 1),
        "wall_star_s": round(wall_st, 1),
        "star_rounds": stats2["rounds"],
        "label_mismatches": mismatches,
    }
    print(json.dumps(out["corpus"]), flush=True)
    assert mismatches == 0

    with open("/tmp/star_scale.json", "w") as f:
        json.dump(out, f, indent=2)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
