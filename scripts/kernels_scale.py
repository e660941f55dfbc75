"""Label propagation + triangle count at the 111M-edge scale — the two
north_rule core kernels without a large-graph BENCH row yet (PageRank,
CC, star-CC, SCC, incremental CC/PR already have theirs).

Label propagation: symmetrized vote edges (~2x the directed count), 3
fixed supersteps (early_stop off so every superstep is measured), per-
superstep wall from the iteration hook of a wrapping timer.

Triangles: degree-ordered orientation first; the script PRINTS the
oriented wedge count Σ C(outdeg, 2) — the exact row count the wedge
self-join materializes — BEFORE running the count, and aborts if it
exceeds ``--max-wedges`` (default 2e10) rather than melting the box.
This is the same budget decision a 1000-executor run makes: wedge
volume, not edge count, prices a triangle count.

Usage: python scripts/kernels_scale.py [edges_parquet] [cores] [max_wedges]
Writes /tmp/kernels_scale.json.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from graphblas_algorithms_spark.classes.graph import Graph
from graphblas_algorithms_spark.operators.labelprop import label_propagation
from graphblas_algorithms_spark.operators.triangles import _oriented_edges, total_triangles
from graphblas_algorithms_spark.session import get_spark


def main():
    edges_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_scale_edges"
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    max_wedges = float(sys.argv[3]) if len(sys.argv) > 3 else 2e10
    spark = get_spark(cores=cores, shuffle_partitions=2 * cores, driver_memory="48g")
    raw = spark.read.parquet(edges_path).select("src", "dst")
    nodes = (
        raw.select(F.col("src").alias("id"))
        .unionByName(raw.select(F.col("dst").alias("id")))
        .distinct()
    )
    # undirected view: canonicalized in the Graph constructor
    G = Graph(raw, nodes, canonicalize=True)
    m = G.edges.count()
    n = G.n
    print(f"undirected graph: {n} nodes, {m} canonical edges", flush=True)
    out = {"cores": cores, "nodes": n, "edges_canonical": m}

    # --- label propagation: 3 fixed supersteps over sym votes ----------
    t0 = time.time()
    labels = label_propagation(G, max_iter=3, early_stop=False).persist()
    labels.count()
    lpa_wall = time.time() - t0
    n_labels = labels.select("label").distinct().count()
    print(f"labelprop: 3 supersteps in {lpa_wall:.1f}s ({lpa_wall/3:.1f}s/superstep), "
          f"{n_labels} distinct labels", flush=True)
    out["labelprop"] = {
        "supersteps": 3,
        "wall_s": round(lpa_wall, 1),
        "s_per_superstep": round(lpa_wall / 3, 2),
        "votes_per_superstep": 2 * m + n,
        "distinct_labels": n_labels,
    }
    labels.unpersist()

    # --- triangles: wedge budget first, then the count ------------------
    t0 = time.time()
    oriented = _oriented_edges(G).persist()
    wedges = (
        oriented.groupBy("src")
        .agg(F.count("*").alias("d"))
        .agg(F.sum(F.col("d") * (F.col("d") - 1) / 2).alias("w"))
        .collect()[0]["w"]
    )
    max_fan = oriented.groupBy("src").count().agg(F.max("count").alias("m")).collect()[0]["m"]
    t_orient = time.time() - t0
    print(f"oriented wedges: {wedges:.3e} (max oriented fan-out {max_fan}, "
          f"orientation pass {t_orient:.1f}s)", flush=True)
    out["triangles"] = {
        "oriented_wedges": int(wedges),
        "max_oriented_fanout": int(max_fan),
        "orientation_wall_s": round(t_orient, 1),
    }
    oriented.unpersist()
    if wedges > max_wedges:
        print(f"SKIP triangle count: wedge volume {wedges:.3e} > budget {max_wedges:.1e}",
              flush=True)
        out["triangles"]["skipped"] = True
    else:
        t0 = time.time()
        total = total_triangles(G)
        tri_wall = time.time() - t0
        print(f"total_triangles = {total} in {tri_wall:.1f}s "
              f"({wedges/max(tri_wall,1e-9):.3e} wedges/s)", flush=True)
        out["triangles"].update(
            {"total": int(total), "wall_s": round(tri_wall, 1),
             "wedges_per_sec": round(wedges / max(tri_wall, 1e-9))}
        )

    with open("/tmp/kernels_scale.json", "w") as f:
        json.dump(out, f, indent=2)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
