"""Node renumbering and key<->id translation utilities.

Reference semantics: arbitrary hashable node keys are renumbered once at
ingest to dense ``0..n-1`` integer ids (``_key_to_id`` built in
``graphblas_algorithms/classes/_utils.py:11-18``); all kernels operate on
int ids; keys reappear only at the output boundary
(``_utils.py:112-119,132-144``).

Spark-first: a global ``row_number()`` window would serialize through a
single task, so dense ids are assigned with the scalable two-phase trick —
bucket keys by FROZEN split points, count rows per bucket, broadcast the
tiny per-bucket offset table, then ``row_number`` *within* each bucket.

Recompute safety (the 100 TB requirement): every value the id mapping
depends on — split points AND offsets — is frozen into the plan as
literals, so the mapping is a pure deterministic function of the key set
and re-executes identically after block loss.  The earlier formulation
(``repartitionByRange`` + ``spark_partition_id()`` + driver-frozen
offsets) was only correct for its FIRST materialization: a cache
eviction, executor loss, or ``clearCache()`` re-ran the range sampler
under different runtime stats, re-bucketed keys against the stale offset
table, and silently produced colliding/missing ids (observed: two
identical PageRank runs with a ``clearCache()`` between them returned
different scores).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def assign_dense_ids(
    keys: DataFrame, key_col: str = "key", num_partitions: int | None = None
) -> DataFrame:
    """Map distinct keys to dense ids ``0..n-1`` by sorted key order.

    Returns ``(id: long, <key_col>)``. Scales: the only driver-side data is
    one row-count per partition.
    """
    distinct = keys.select(key_col).distinct().persist()
    spark = keys.sparkSession
    if num_partitions is None:
        num_partitions = spark.sparkContext.defaultParallelism

    # Phase 1: deterministic split points.  A pseudo-uniform fixed-size
    # sample = the smallest xxhash64 values (per-partition top-k merge,
    # never a full sort), frozen as LITERALS so re-execution cannot
    # re-sample.  ~64 sampled keys per bucket keeps bucket skew low.
    sample = [
        r[key_col]
        for r in distinct.orderBy(F.xxhash64(key_col), F.col(key_col))
        .limit(max(1, num_partitions) * 64)
        .collect()
    ]
    sample.sort()
    step = max(1, len(sample) // max(1, num_partitions))
    bounds = sorted(set(sample[step::step]))[: num_partitions - 1]
    if bounds:
        barr = F.array(*[F.lit(b) for b in bounds])
        # bucket = #bounds <= key: O(n_buckets) vectorized JVM array ops
        # per row, no join.  (At many thousands of buckets switch to an
        # interval join / binary-search expression — same frozen bounds.)
        bucket = F.size(F.filter(barr, lambda b: b <= F.col(key_col)))
    else:
        bucket = F.lit(0)
    bucketed = distinct.withColumn("_bkt", bucket)

    # Phase 2: per-bucket counts -> frozen offset literals.  Counts are a
    # pure function of (key set, literal bounds), so the offset table is
    # reproducible — unlike per-shuffle-partition row counts.
    counts = {
        r["_bkt"]: r["cnt"]
        for r in bucketed.groupBy("_bkt").agg(F.count("*").alias("cnt")).collect()
    }
    offsets, acc = [], 0
    for bkt in range(len(bounds) + 1):
        offsets.append((bkt, acc))
        acc += counts.get(bkt, 0)
    offsets_df = spark.createDataFrame(offsets, "_bkt int, _offset long")
    w = Window.partitionBy("_bkt").orderBy(key_col)
    out = (
        bucketed.withColumn("_rn", F.row_number().over(w) - F.lit(1))
        .join(F.broadcast(offsets_df), "_bkt")
        .select((F.col("_offset") + F.col("_rn")).cast("long").alias("id"), key_col)
    )
    out = out.persist()
    out.count()
    distinct.unpersist()
    return out


def edges_from_keys(
    raw: DataFrame, src_key: str, dst_key: str, weight: str | None = None
) -> tuple[DataFrame, DataFrame]:
    """Renumber a key-typed edge list; returns ``(edges, nodes)``.

    ``edges``: (src:long, dst:long[, weight:double]);
    ``nodes``: (id:long, key:string). Renumber-once rule (SURVEY §1.2).
    """
    keys = raw.select(F.col(src_key).alias("key")).unionByName(
        raw.select(F.col(dst_key).alias("key"))
    )
    nodes = assign_dense_ids(keys, "key")
    cols = [F.col("_sid").alias("src"), F.col("_did").alias("dst")]
    if weight is not None:
        cols.append(F.col(weight).cast("double").alias("weight"))
    edges = (
        raw.join(nodes.withColumnRenamed("id", "_sid"), raw[src_key] == F.col("key"))
        .drop("key")
        .join(nodes.withColumnRenamed("id", "_did"), raw[dst_key] == F.col("key"))
        .select(*cols)
    )
    return edges, nodes


def vector_to_dict(vec: DataFrame, id_col: str = "id", val_col: str | None = None) -> dict:
    """Collect a node-keyed vector DataFrame to a python dict (test boundary).

    Mirrors ``vector_to_dict`` (reference ``classes/_utils.py:112-119``) —
    absent rows stay absent (sparsity = missing id).
    """
    if val_col is None:
        val_col = [c for c in vec.columns if c != id_col][0]
    return {r[id_col]: r[val_col] for r in vec.select(id_col, val_col).collect()}
