"""CSR-block pandas-UDF vxm vs pure-SQL vxm — north-star evidence.

Times one plus-times semiring y = x @ A superstep over the same edge
parquet via both execution paths at a given parallelism:

* ``sql``  — :func:`functions.semiring.vxm` (JVM join + hash-agg,
  whole-stage codegen end to end);
* ``csr``  — :func:`functions.csr_udf.vxm_csr_sum` (JVM join, then
  per-src-block Arrow batch -> numpy segment-sum -> small JVM combine).

Usage: python scripts/csr_bench.py [edges_parquet] [cores] [iters]
Prints one JSON line: min/median wall per path + the ratio.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EDGES = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_scale_edges"
CORES = int(sys.argv[2]) if len(sys.argv) > 2 else 16
ITERS = int(sys.argv[3]) if len(sys.argv) > 3 else 3


def main() -> None:
    from pyspark.sql import functions as F

    from graphblas_algorithms_spark.functions.csr_udf import vxm_csr_sum
    from graphblas_algorithms_spark.functions.semiring import vxm
    from graphblas_algorithms_spark.session import get_spark, stop_spark

    stop_spark()
    spark = get_spark(cores=CORES, shuffle_partitions=CORES,
                      app_name=f"csr-bench-{CORES}", driver_memory="48g")
    edges = spark.read.parquet(EDGES).repartition(CORES, "src").persist()
    m = edges.count()
    nodes = (edges.select(F.col("src").alias("id"))
             .unionByName(edges.select(F.col("dst").alias("id")))).distinct()
    n = nodes.count()
    x = (nodes.select("id", (F.lit(1.0) / n).alias("value"))
         .repartition(CORES, "id").localCheckpoint(eager=True))

    out = {"edges": m, "nodes": n, "cores": CORES, "iters": ITERS}
    for name, fn in (("sql", lambda: vxm(x, edges)),
                     ("csr", lambda: vxm_csr_sum(x, edges))):
        walls = []
        for _ in range(ITERS + 1):  # +1 warmup
            t0 = time.time()
            fn().agg(F.sum("value" if name == "sql" else "value")).collect()
            walls.append(time.time() - t0)
        walls = walls[1:]
        out[name] = {
            "min_wall_s": round(min(walls), 2),
            "median_wall_s": round(sorted(walls)[len(walls) // 2], 2),
            "edges_per_sec": round(m / min(walls), 1),
        }
    out["csr_over_sql_wall_ratio"] = round(
        out["csr"]["min_wall_s"] / out["sql"]["min_wall_s"], 3
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
