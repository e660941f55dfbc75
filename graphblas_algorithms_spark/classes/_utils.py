"""Node renumbering and key<->id translation utilities.

Reference semantics: arbitrary hashable node keys are renumbered once at
ingest to dense ``0..n-1`` integer ids (``_key_to_id`` built in
``graphblas_algorithms/classes/_utils.py:11-18``); all kernels operate on
int ids; keys reappear only at the output boundary
(``_utils.py:112-119,132-144``).

Spark-first: a global ``row_number()`` window would serialize through a
single task, so dense ids are assigned with the scalable two-phase trick —
range-partition by key, count rows per partition, broadcast the tiny
per-partition offset table, then ``row_number`` *within* each partition.
Deterministic (pure function of the sorted key set) and fully parallel.
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
    distinct = keys.select(key_col).distinct()
    if num_partitions is None:
        num_partitions = distinct.sparkSession.sparkContext.defaultParallelism
    parted = (
        distinct.repartitionByRange(num_partitions, key_col)
        .withColumn("_pid", F.spark_partition_id())
    )
    parted = parted.persist()
    counts = {
        r["_pid"]: r["cnt"]
        for r in parted.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    spark = keys.sparkSession
    offsets_df = spark.createDataFrame(
        [(int(p), int(o)) for p, o in offsets.items()], "_pid int, _offset long"
    )
    w = Window.partitionBy("_pid").orderBy(key_col)
    out = (
        parted.withColumn("_rn", F.row_number().over(w) - F.lit(1))
        .join(F.broadcast(offsets_df), "_pid")
        .select((F.col("_offset") + F.col("_rn")).cast("long").alias("id"), key_col)
    )
    out = out.persist()
    out.count()
    parted.unpersist()
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
