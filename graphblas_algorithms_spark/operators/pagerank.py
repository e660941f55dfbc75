"""PageRank as an iterative DataFrame program (the flagship kernel).

Reference semantics: ``algorithms/link_analysis/pagerank_alg.py:12-101``
— power iteration ``x <- alpha*(x@S) + alpha*danglemass*dangling_p +
(1-alpha)*p`` with the alpha/out-degree factor folded into the matrix
once (``:49-51``), dangling handling (``:62-75``), and L1 convergence
``err < n*tol`` (``_helpers.py:21-29``).

Spark-first plan (SURVEY §7 step 3):

* ``adj_coef`` built once: edges joined to out-degrees, carrying
  ``coef = alpha * weight / out_strength`` per edge — O4 constant
  folding; persisted and reused every superstep.
* per superstep, ONE action: ``new_ranks`` is persisted and the L1 error
  computed via a single agg (O12).  The dangling mass is a 1-row agg
  cross-joined in *lazily*, so it rides inside the same job rather than
  being a separate collect.
* lineage truncated / checkpointed per superstep via
  :class:`~graphblas_algorithms_spark.plans.superstep.Superstep`
  (resume = read newest complete iter).
* skew: ``skew_salt=S`` switches the contribution join to the salted
  form (north_rule names power-law hubs explicitly); AQE skew-join
  handles the rest.
* ``use_csr_udf=True`` routes the x@A product through the vectorized
  CSR-block gather-scatter pandas UDF (north_star mandate); the pure
  DataFrame path is the correctness reference.

At 100 TB: edges hash-partitioned by src once (``Graph.partition_by_src``),
rank vector shuffles are O(n) per iter vs O(nnz) for edges — the edge
side never re-shuffles after the initial placement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..exceptions import ConvergenceFailure
from ..functions.csr_udf import vxm_csr_sum
from ..functions.semiring import salted_vxm_sum, vxm
from ..plans.superstep import Superstep, scalar_agg


def _normalized_vector(nodes: DataFrame, mapping: dict | None, default_dense: bool) -> DataFrame:
    """(id, value) with values summing to 1; dense 1/n when mapping None."""
    spark = nodes.sparkSession
    if mapping is None:
        if not default_dense:
            return None
        n = nodes.count()
        return nodes.select("id", (F.lit(1.0) / F.lit(float(n))).alias("value"))
    total = float(sum(mapping.values()))
    if total <= 0:
        raise ZeroDivisionError("vector sums to 0")
    df = spark.createDataFrame(
        [(int(k), float(v) / total) for k, v in mapping.items()], "id long, value double"
    )
    return df


def pagerank(
    G,
    alpha: float = 0.85,
    personalization: dict | None = None,
    max_iter: int = 100,
    tol: float | None = 1e-6,
    nstart: dict | None = None,
    dangling: dict | None = None,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 1,
    resume: bool = False,
    fixed_iters: int | None = None,
    use_csr_udf: bool = False,
    skew_salt: int | None = None,
    iteration_hook=None,
) -> DataFrame:
    """Returns (id: long, rank: double), dense over G.nodes.

    ``fixed_iters`` runs exactly that many supersteps with no convergence
    action (used by the DuckDB-oracle parity queries and benches where
    the iteration count must be deterministic).
    """
    spark = G.spark
    nodes = G.nodes
    n = G.n
    if n == 0:
        return nodes.select("id", F.lit(0.0).alias("rank"))

    adj = G.edges if G.is_directed_flag else G.get_property("sym_edges")
    weighted = "weight" in adj.columns

    # --- fold alpha / out-degree into the edges once (ref :49-51) --------
    if weighted:
        outdeg = adj.groupBy("src").agg(F.sum("weight").alias("_od"))
        adj_coef = adj.join(outdeg, "src").select(
            "src", "dst", (F.lit(alpha) * F.col("weight") / F.col("_od")).alias("weight")
        )
    else:
        outdeg = adj.groupBy("src").agg(F.count("*").alias("_od"))
        adj_coef = adj.join(outdeg, "src").select(
            "src", "dst", (F.lit(alpha) / F.col("_od")).alias("weight")
        )
    num_part = spark.sparkContext.defaultParallelism
    adj_coef = adj_coef.repartition(num_part, "src").persist()

    # --- teleport & dangling vectors (ref :62-75) -------------------------
    p = _normalized_vector(nodes, personalization, default_dense=True)
    dangling_w = p if dangling is None else _normalized_vector(nodes, dangling, False)
    # dangling node ids: no out-edges
    dangling_ids = nodes.join(
        adj.select(F.col("src").alias("id")).distinct(), "id", "left_anti"
    ).persist()
    has_dangling = dangling_ids.limit(1).count() > 0

    # base[id] = ((1-alpha)*p, dangling_w) — the per-node constants
    base = (
        p.select("id", (F.lit(1.0 - alpha) * F.col("value")).alias("_tele"))
        .join(dangling_w.select("id", F.col("value").alias("_dw")), "id", "left")
        .select("id", "_tele", F.coalesce("_dw", F.lit(0.0)).alias("_dw"))
        .persist()
    )

    # --- x0 ---------------------------------------------------------------
    if nstart is None:
        x = nodes.select("id", (F.lit(1.0) / F.lit(float(n))).alias("value"))
    else:
        total = float(sum(nstart.values()))
        x = spark.createDataFrame(
            [(int(k), float(v) / total) for k, v in nstart.items()],
            "id long, value double",
        )
        x = nodes.join(x, "id", "left").select(
            "id", F.coalesce("value", F.lit(0.0)).alias("value")
        )

    harness = Superstep(spark, checkpoint_dir, checkpoint_every)
    start_iter = 0
    if resume and checkpoint_dir is not None:
        got = harness.latest()
        if got is not None:
            start_iter, x = got[0] + 1, got[1]
    else:
        x = x.persist()
        x.count()

    iters = fixed_iters if fixed_iters is not None else max_iter
    for it in range(start_iter, iters):
        # contribution sum: y[dst] = sum_src x[src] * coef(src,dst)  (P1)
        if skew_salt:
            contribs = salted_vxm_sum(x, adj_coef, salt=skew_salt, mul="times")
        elif use_csr_udf:
            contribs = vxm_csr_sum(x, adj_coef, mul="times")
        else:
            contribs = vxm(x, adj_coef, add="sum", mul="times")
        contribs = contribs.withColumnRenamed("value", "_c")

        if has_dangling:
            # 1-row lazy aggregate, cross-joined so it runs inside the same job
            mass = (
                x.join(dangling_ids, "id", "left_semi")
                .agg(F.coalesce(F.sum("value"), F.lit(0.0)).alias("_mass"))
            )
            new_x = (
                base.join(contribs, "id", "left")
                .crossJoin(F.broadcast(mass))
                .select(
                    "id",
                    (
                        F.coalesce(F.col("_c"), F.lit(0.0))
                        + F.lit(alpha) * F.col("_mass") * F.col("_dw")
                        + F.col("_tele")
                    ).alias("value"),
                )
            )
        else:
            new_x = base.join(contribs, "id", "left").select(
                "id",
                (F.coalesce(F.col("_c"), F.lit(0.0)) + F.col("_tele")).alias("value"),
            )

        if fixed_iters is not None:
            # deterministic iteration count: no convergence action
            new_x = harness.materialize(new_x, it, {"kernel": "pagerank"})
            x = new_x
            if iteration_hook:
                iteration_hook(it, None)
            continue

        new_x = harness.materialize(new_x, it, {"kernel": "pagerank"})
        # single blocking action per superstep: L1 error (O12)
        err = scalar_agg(
            new_x.join(x.withColumnRenamed("value", "_prev"), "id", "left"),
            err=F.sum(F.abs(F.col("value") - F.coalesce("_prev", F.lit(0.0)))),
        )["err"]
        x = new_x
        if iteration_hook:
            iteration_hook(it, err)
        if err is not None and err < n * tol:
            result = x.select("id", F.col("value").alias("rank"))
            adj_coef.unpersist()
            return result

    if fixed_iters is not None:
        result = x.select("id", F.col("value").alias("rank"))
        adj_coef.unpersist()
        return result
    raise ConvergenceFailure(f"pagerank: no convergence in {max_iter} iterations")
