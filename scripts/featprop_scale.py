"""Feature propagation at the 111M-edge scale.

One SGC smoothing round over d-dim features for all 6M nodes: the
long-format join emits nnz*d = 222M * d rows into a map-side-combined
(dst, pos) aggregation — the honest cost model is O(nnz * d) shuffle
rows, so walls should scale ~linearly in d (measured at d=4 and d=8).
Features are deterministic md5-derived doubles (no parquet needed).

Usage: python scripts/featprop_scale.py [edges_parquet] [cores]
Writes /tmp/featprop_scale.json.
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
    from graphblas_algorithms_spark.operators.features import propagate_features

    canon = (
        spark.read.parquet(edges_path)
        .select(F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .persist()
    )
    m = canon.count()
    G = Graph(canon, canonicalize=False)
    print(f"graph: {m} canonical edges", flush=True)

    out = {"cores": cores, "canonical_edges": m, "iters": 1, "runs": {}}
    for d in (4, 8):
        feats = G.nodes.select(
            "id",
            F.array(
                *[
                    (
                        F.conv(
                            F.substring(F.md5(F.concat_ws(":", F.lit("fp"), F.col("id"), F.lit(i))), 1, 15),
                            16,
                            10,
                        ).cast("double")
                        / F.lit(1152921504606846976.0)
                    )
                    for i in range(d)
                ]
            ).alias("vec"),
        )
        t0 = time.time()
        res = propagate_features(G, feats, iters=1)
        n_rows = res.count()
        wall = time.time() - t0
        # sanity: mean of uniforms stays in (0, 1)
        mu = res.agg(F.avg("val")).collect()[0][0]
        print(f"d={d}: {n_rows} rows in {wall:.1f}s (mean val {mu:.4f})", flush=True)
        out["runs"][f"d{d}"] = {"rows": n_rows, "wall_s": round(wall, 1), "mean_val": round(mu, 4)}

    with open("/tmp/featprop_scale.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
