"""PageRank as an iterative DataFrame program (the flagship kernel).

Reference semantics: ``algorithms/link_analysis/pagerank_alg.py:12-101``
— power iteration ``x <- alpha*(x@S) + alpha*danglemass*dangling_p +
(1-alpha)*p`` with the alpha/out-degree factor folded into the matrix
once (``:49-51``), dangling handling (``:62-75``), and L1 convergence
``err < n*tol`` (``_helpers.py:21-29``).

Spark-first plan (SURVEY §7 step 3), fused-state formulation:

* ``adj_coef`` built once: edges joined to out-degrees, carrying
  ``coef = alpha * weight / out_strength`` per edge — O4 constant
  folding; hash-partitioned by ``src`` and persisted, reused every
  superstep with no further edge-side shuffle.
* the iteration state carries the per-node CONSTANTS inline:
  ``(id, value, _tele, _dw, _dang)`` — teleport term, dangling weight
  and dangling flag ride with the rank value, so a superstep is ONE
  join + ONE aggregation + ONE join-back, not a chain of joins against
  separate constant tables.
* the convergence diff ``|x_k - x_{k-1}|`` is computed in the SAME
  projection that produces the new value (the previous value is already
  a column of the join), so the L1 error is a plain column sum over the
  checkpointed state — no extra join against the previous iterate (O12).
* ``localCheckpoint`` preserves the physical hash-partitioning of the
  state (Spark's LogicalRDD keeps outputPartitioning), and the state is
  keyed/partitioned on ``id`` == the join key ``src``: with
  ``shuffle_partitions == adj partitions`` the state->edges join and the
  join-back of contributions are both exchange-free, leaving the
  ``groupBy(dst)`` shuffle as the superstep's single exchange.  This is
  the plan that survives a 100x scale-up: per superstep, exactly one
  O(nnz) shuffle.
* dangling mass = a 1-row agg over the cached state, broadcast-joined
  lazily so it rides inside the same job (O12); skipped entirely when
  the graph has no dangling vertices (detected once).
* superstep checkpoint/resume via
  :class:`~graphblas_algorithms_spark.plans.superstep.Superstep`.
* skew: ``skew_salt=S`` switches the contribution join to the salted
  form (north_rule names power-law hubs explicitly); AQE skew-join
  handles the rest.
* ``use_csr_udf=True`` routes the x@A product through the vectorized
  CSR-block gather-scatter pandas UDF (north_star mandate); the pure
  DataFrame path is the correctness reference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..exceptions import ConvergenceFailure
from ..functions.csr_udf import vxm_csr_sum
from ..functions.semiring import salted_vxm_sum, vxm
from ..plans.superstep import Superstep


def _normalized_vector(
    nodes: DataFrame, mapping: dict | DataFrame | None, default_dense: bool
):
    """(id, value) with values summing to 1; dense 1/n when mapping None.

    The DataFrame form (id, value) is the scale-correct way to pass
    personalization / dangling weights: at web scale those vectors are
    O(n) and cannot live in a driver-side dict.  Same semantics as the
    dict form — L1-normalized, nodes absent from the vector get 0."""
    spark = nodes.sparkSession
    if mapping is None:
        if not default_dense:
            return None
        n = nodes.count()
        return nodes.select("id", (F.lit(1.0) / F.lit(float(n))).alias("value"))
    if isinstance(mapping, DataFrame):
        vcol = "value" if "value" in mapping.columns else mapping.columns[-1]
        row = mapping.agg(F.sum(vcol).alias("t")).collect()[0]
        total = float(row["t"]) if row["t"] is not None else 0.0
        if total <= 0:
            raise ZeroDivisionError("vector sums to 0")
        return mapping.select(
            "id", (F.col(vcol) / F.lit(total)).alias("value")
        )
    total = float(sum(mapping.values()))
    if total <= 0:
        raise ZeroDivisionError("vector sums to 0")
    return spark.createDataFrame(
        [(int(k), float(v) / total) for k, v in mapping.items()], "id long, value double"
    )


_STATE_COLS = ("id", "value", "_tele", "_dw", "_dang")


def pagerank(
    G,
    alpha: float = 0.85,
    personalization: dict | DataFrame | None = None,
    max_iter: int = 100,
    tol: float | None = 1e-6,
    tol_abs: float | None = None,
    nstart: dict | DataFrame | None = None,
    dangling: dict | DataFrame | None = None,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 1,
    checkpoint_table: str | None = None,
    resume: bool = False,
    fixed_iters: int | None = None,
    use_csr_udf: bool = False,
    skew_salt: int | None = None,
    iteration_hook=None,
    check_every: int = 1,
) -> DataFrame:
    """Returns (id: long, rank: double), dense over G.nodes.

    ``fixed_iters`` runs exactly that many supersteps with no convergence
    action (used by the DuckDB-oracle parity queries and benches where
    the iteration count must be deterministic).

    ``check_every=k`` evaluates the convergence criterion only every k-th
    superstep.  Because the lineage cut is lazy (superstep.py), the k-1
    unchecked supersteps ride inside the next convergence job: k
    supersteps cost ONE driver action instead of k, trading at most k-1
    extra (cheap, post-convergence) iterations for a k-fold cut in
    job-scheduling floor.  The criterion itself is unchanged — the L1
    step difference of the LATEST superstep vs the same threshold — so
    the returned scores are at least as converged as with k=1.

    ``tol`` follows the reference's n-scaled criterion ``L1(x_k - x_{k-1})
    < n*tol`` (_helpers.py:21-29) for parity.  That criterion degenerates
    at web scale: the score vector has unit mass, so once n >= ~1e6 the
    threshold n*tol exceeds any possible step difference and the loop
    "converges" after one superstep.  ``tol_abs`` instead gates on the
    ABSOLUTE L1 step difference (e.g. 1e-4 of total mass) independent of
    n — use it for large graphs; distance to the unique fixpoint is then
    bounded by alpha/(1-alpha) * tol_abs.
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
    num_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    # NOTE: pre-sorting this cache by src (so SMJ skips its edge-side
    # sort) was measured NEUTRAL at 111M edges/local[16] — 8.16 vs 8.36
    # s/superstep, within noise; the shuffle dominates — so the cache
    # stays sort-free.
    adj_coef = adj_coef.repartition(num_part, "src").persist()

    # --- per-node constants, carried INSIDE the state ---------------------
    p = _normalized_vector(nodes, personalization, default_dense=True)
    dangling_w = p if dangling is None else _normalized_vector(nodes, dangling, False)
    dangling_ids = nodes.join(
        adj.select(F.col("src").alias("id")).distinct(), "id", "left_anti"
    )
    has_dangling = dangling_ids.limit(1).count() > 0

    if nstart is None:
        x0 = nodes.select("id", (F.lit(1.0) / F.lit(float(n))).alias("value"))
    elif isinstance(nstart, DataFrame):
        # distributed warm start (e.g. streaming/pagerank.py: previous
        # epoch's scores) — same semantics as the dict form: L1-normalize,
        # nodes missing from the start vector enter at 0 (ref
        # pagerank_alg.py nstart missing keys)
        vcol = "value" if "value" in nstart.columns else "rank"
        row = nstart.agg(F.sum(vcol).alias("t")).collect()[0]
        total = float(row["t"]) if row["t"] else 1.0
        x0 = nodes.join(
            nstart.select("id", (F.col(vcol) / F.lit(total)).alias("value")),
            "id",
            "left",
        ).select("id", F.coalesce("value", F.lit(0.0)).alias("value"))
    else:
        total = float(sum(nstart.values()))
        x0 = spark.createDataFrame(
            [(int(k), float(v) / total) for k, v in nstart.items()],
            "id long, value double",
        )
        x0 = nodes.join(x0, "id", "left").select(
            "id", F.coalesce("value", F.lit(0.0)).alias("value")
        )

    state = (
        # LEFT join: a partial personalization dict means missing nodes get
        # teleport 0 but remain in the iteration (ref pagerank_alg.py missing
        # keys -> p=0), exactly like the _dw/_dang handling below.
        x0.join(
            p.select("id", (F.lit(1.0 - alpha) * F.col("value")).alias("_tele")),
            "id",
            "left",
        )
        .join(dangling_w.select("id", F.col("value").alias("_dw")), "id", "left")
        .join(dangling_ids.select("id", F.lit(True).alias("_dang")), "id", "left")
        .select(
            "id",
            "value",
            F.coalesce("_tele", F.lit(0.0)).alias("_tele"),
            F.coalesce("_dw", F.lit(0.0)).alias("_dw"),
            F.coalesce("_dang", F.lit(False)).alias("_dang"),
        )
        # pre-place the state on the contraction key so every superstep's
        # state->edges join and contribs join-back are exchange-free
        .repartition(num_part, "id")
    )

    harness = Superstep(spark, checkpoint_dir, checkpoint_every,
                        checkpoint_table=checkpoint_table)
    start_iter = 0
    if resume and (checkpoint_dir is not None or checkpoint_table is not None):
        got = harness.latest()
        if got is not None:
            start_iter, state = got[0] + 1, got[1]
    else:
        state = state.localCheckpoint(eager=True)

    iters = fixed_iters if fixed_iters is not None else max_iter
    err = None
    for it in range(start_iter, iters):
        # contribution sum: y[dst] = sum_src x[src] * coef(src,dst)  (P1)
        if skew_salt:
            contribs = salted_vxm_sum(state, adj_coef, salt=skew_salt, mul="times")
        elif use_csr_udf:
            contribs = vxm_csr_sum(state, adj_coef, mul="times")
        else:
            contribs = vxm(state, adj_coef, add="sum", mul="times")
        contribs = contribs.withColumnRenamed("value", "_c")

        if has_dangling:
            # 1-row lazy aggregate over the cached state, broadcast so it
            # rides inside the same job rather than a separate collect
            mass = state.filter(F.col("_dang")).agg(
                F.coalesce(F.sum("value"), F.lit(0.0)).alias("_mass")
            )
            new_value = (
                F.coalesce(F.col("_c"), F.lit(0.0))
                + F.lit(alpha) * F.col("_mass") * F.col("_dw")
                + F.col("_tele")
            )
            joined = state.join(contribs, "id", "left").crossJoin(F.broadcast(mass))
        else:
            new_value = F.coalesce(F.col("_c"), F.lit(0.0)) + F.col("_tele")
            joined = state.join(contribs, "id", "left")

        # the previous value is already a column — fold the L1 diff into
        # the same projection so convergence needs NO join (O12)
        new_state = joined.select(
            "id",
            new_value.alias("value"),
            "_tele",
            "_dw",
            "_dang",
            F.abs(new_value - F.col("value")).alias("_diff"),
        )

        new_state = harness.materialize(new_state, it, {"kernel": "pagerank"})
        state = new_state
        if fixed_iters is not None:
            if iteration_hook:
                iteration_hook(it, None)
            continue
        if (it + 1) % max(1, check_every) != 0 and it != iters - 1:
            # unchecked superstep: the lazy lineage cut defers this
            # step's compute into the next convergence job (no action)
            if iteration_hook:
                iteration_hook(it, None)
            continue
        # single blocking action per k supersteps: plain column sum
        err = state.agg(F.sum("_diff").alias("err")).collect()[0]["err"]
        if iteration_hook:
            iteration_hook(it, err)
        threshold = tol_abs if tol_abs is not None else n * tol
        if err is not None and err < threshold:
            result = state.select("id", F.col("value").alias("rank"))
            adj_coef.unpersist()
            return result

    if fixed_iters is not None:
        result = state.select("id", F.col("value").alias("rank"))
        adj_coef.unpersist()
        return result
    raise ConvergenceFailure(f"pagerank: no convergence in {max_iter} iterations")


def spam_mass(
    G,
    trusted,
    alpha: float = 0.85,
    tol: float = 1e-6,
    max_iter: int = 100,
    fixed_iters: int | None = None,
) -> "DataFrame":
    """(id, rank, trusted_rank, spam_mass) — TrustRank spam mass
    (Gyongyi-Garcia-Molina-Pedersen, VLDB'04): how much of a node's
    PageRank is NOT attributable to a trusted seed set.

    ``trusted``: list of node ids or a (id) / (id, weight) DataFrame.
    ``spam_mass = (rank - trusted_rank) / rank`` — near 1 means the
    node's rank flows from outside the trusted region (link-farm
    signal on a repo link graph: rank earned only from other spam).
    Clamped to [0, 1]; rank-0 nodes get 0.

    Two converged PageRank runs sharing the folded edge table — the
    same O(nnz)-per-superstep plan as :func:`pagerank`; no new
    machinery, which is the point of keeping the teleport vector a
    first-class argument."""
    from pyspark.sql import functions as F  # local: keep module header slim

    if isinstance(trusted, (list, tuple, set)):
        pers = {int(t): 1.0 for t in trusted}
    else:
        cols = trusted.columns
        pers = trusted.select(
            "id",
            (F.col(cols[1]) if len(cols) > 1 else F.lit(1.0)).alias("weight"),
        )
    base = pagerank(G, alpha=alpha, tol=tol, max_iter=max_iter, fixed_iters=fixed_iters)
    tr = pagerank(
        G,
        alpha=alpha,
        personalization=pers,
        tol=tol,
        max_iter=max_iter,
        fixed_iters=fixed_iters,
    ).withColumnRenamed("rank", "trusted_rank")
    return (
        base.join(tr, "id", "left")
        .select(
            "id",
            "rank",
            F.coalesce("trusted_rank", F.lit(0.0)).alias("trusted_rank"),
            F.when(
                F.col("rank") > 0,
                F.greatest(
                    F.lit(0.0),
                    F.least(
                        F.lit(1.0),
                        (F.col("rank") - F.coalesce("trusted_rank", F.lit(0.0)))
                        / F.col("rank"),
                    ),
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("spam_mass"),
        )
    )
