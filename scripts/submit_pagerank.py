"""spark-submit job: PageRank over an edge parquet, checkpointed + resumable.

The cluster entrypoint the north_star packages for:

    spark-submit --master <cluster> \
        --py-files dist/graphblas_algorithms_spark.zip \
        scripts/submit_pagerank.py <edges_parquet> <out_parquet> \
        [--checkpoint-dir DIR] [--resume] [--fixed-iters N] [--tol T]

Imports the engine ONLY from --py-files (this file must not assume a
repo checkout on the workers or the driver), reuses the session
spark-submit created, writes (id, rank) parquet, and prints one JSON
metrics line: {"nodes": N, "edges": M, "iterations": K, "wall_s": S}.
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("edges_parquet")
    ap.add_argument("out_parquet")
    ap.add_argument("--checkpoint-dir", default=None)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--fixed-iters", type=int, default=None)
    ap.add_argument("--tol", type=float, default=1e-6)
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from graphblas_algorithms_spark.classes.graph import DiGraph
    from graphblas_algorithms_spark.operators.pagerank import pagerank

    spark = SparkSession.builder.getOrCreate()
    t0 = time.time()
    edges = spark.read.parquet(args.edges_parquet).select(
        F.col("src").cast("long"), F.col("dst").cast("long")
    )
    G = DiGraph(edges)
    kw: dict = {"tol": args.tol}
    if args.fixed_iters is not None:
        kw = {"fixed_iters": args.fixed_iters}
    if args.checkpoint_dir:
        kw["checkpoint_dir"] = args.checkpoint_dir
        kw["resume"] = args.resume
    ranks = pagerank(G, **kw)
    ranks.write.mode("overwrite").parquet(args.out_parquet)
    out = spark.read.parquet(args.out_parquet)
    print(
        json.dumps(
            {
                "nodes": out.count(),
                "edges": G.m,
                "wall_s": round(time.time() - t0, 2),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
