"""Butterfly counting at the 111M-edge scale (bipartite importer x
imported view of the corpus link graph).

The side-pricing decision is the point of the run: the imported side
carries power-law hubs (a popular module is imported by millions of
files — one hub's C(d,2) alone exceeds any cluster), while the importer
side is bounded by max_imports, so the wedge join MUST pivot on the
importer.  The script prints both priced volumes, then counts through
the cheap side; an optional cap demonstrates the hub guard.

Usage: python scripts/butterfly_scale.py [edges_parquet] [cores] [cap]
Writes /tmp/butterfly_scale.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from graphblas_algorithms_spark.operators.bipartite import (
    _wedge_volumes,
    butterfly_count,
)
from graphblas_algorithms_spark.session import get_spark, stop_spark


def main():
    edges_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_scale_edges"
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    cap = int(sys.argv[3]) if len(sys.argv) > 3 else 0
    if not os.path.exists(edges_path):
        import bench

        bench.SCALE_DIR = edges_path
        bench._scaling_build()
        stop_spark()
    spark = get_spark(cores=cores, shuffle_partitions=2 * cores, driver_memory="48g")
    raw = spark.read.parquet(edges_path)
    # bipartite view: importer (src part) x imported (dst part, offset)
    n_off = 100_000_000
    edges = raw.select("src", (F.col("dst") + n_off).alias("dst")).distinct().persist()
    m = edges.count()
    t0 = time.time()
    v_dst, v_src = _wedge_volumes(edges)
    price_wall = time.time() - t0
    print(f"m={m}; wedge volume via dst {v_dst:.3e} vs via src {v_src:.3e} "
          f"(priced in {price_wall:.1f}s)", flush=True)
    t0 = time.time()
    bf = butterfly_count(
        edges, pivot="dst" if v_dst <= v_src else "src",
        max_pivot_degree=(cap or None),
    )
    wall = time.time() - t0
    out = {
        "cores": cores,
        "edges": m,
        "wedge_vol_via_dst": v_dst,
        "wedge_vol_via_src": v_src,
        "cap": cap,
        "butterflies": bf,
        "count_wall_s": round(wall, 1),
        "price_wall_s": round(price_wall, 1),
    }
    print(json.dumps(out), flush=True)
    with open("/tmp/butterfly_scale.json", "w") as f:
        json.dump(out, f)


if __name__ == "__main__":
    main()
