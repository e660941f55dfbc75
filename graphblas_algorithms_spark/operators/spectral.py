"""Fiedler vector / spectral bisection via deflated power iteration.

Completes the linalg surface (``linalg.py`` builds the Laplacian the
reference exposes at ``linalg/laplacianmatrix.py``; this kernel USES it):
the eigenvector for the second-smallest Laplacian eigenvalue — the
classic spectral graph PARTITIONER (sign split minimizes a relaxation of
the normalized cut), directly relevant to placing a 10^12-file link
graph across executors.

Method: power iteration on ``B = c·I − L`` with ``c = 2·d_max`` (so B is
PSD and its spectrum mirrors L's reversed); the all-ones vector — B's
top eigenvector — is deflated by subtracting the mean every step, so the
iteration converges to the eigenvector of L's λ₂ (the Fiedler vector).

Per iteration, engine-shaped like ``eigenvector_centrality``:
one O(nnz) edge join + sum agg ((A·x) with state hash-partitioned on
``id``), the mean/norm scalars folded in as broadcast 1-row aggregates
(no extra driver action), lineage hard-cut per superstep.  The
deterministic md5-uniform start vector makes fixed-iteration runs
bit-replayable across engines (the DuckDB oracle unrolls the same
arithmetic; same convention as the walk/Luby kernels).

Connected graphs only for a meaningful λ₂ (on a disconnected graph the
0-eigenspace is multidimensional and the split returns one side of SOME
component cut); callers wanting components should use
``connected_components`` — this kernel is for cutting a connected graph.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.joins import edge_join
from ..plans.superstep import Superstep, lineage_cut


def _uniform(col, tag: str):
    """md5-uniform in [-0.5, 0.5) — engine-portable (Spark conv ==
    DuckDB ('0x'||substr)::UBIGINT; 2^60 = 1152921504606846976)."""
    u = F.conv(F.substring(F.md5(F.concat_ws("|", F.lit(tag), col)), 1, 15), 16, 10)
    return u.cast("double") / F.lit(1152921504606846976.0) - F.lit(0.5)


def fiedler_vector(
    G,
    iterations: int = 80,
    seed: int = 42,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 1,
    resume: bool = False,
) -> DataFrame:
    """(id: long, f: double) — unit-norm Fiedler vector estimate after a
    FIXED number of deflated power-iteration steps (fixed so resumed and
    replayed runs are trajectory-identical; pick iterations by the
    spectral gap you expect — 80 covers the test corpora to ~1e-6)."""
    spark = G.spark
    num_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    adj = (
        G.get_property("sym_offdiag")
        .select("src", "dst")
        .repartition(num_part, "src")
        .persist()
    )
    deg = adj.groupBy(F.col("src").alias("id")).agg(
        F.count("*").cast("double").alias("_d")
    )
    d_max = deg.agg(F.max("_d").alias("m")).collect()[0]["m"] or 0.0
    c = 2.0 * float(d_max)

    state = (
        G.nodes.select("id")
        .join(deg, "id", "left")
        .select(
            "id",
            F.coalesce("_d", F.lit(0.0)).alias("_d"),
            _uniform(F.col("id"), f"fiedler|{int(seed)}").alias("x"),
        )
        .repartition(num_part, "id")
    )

    harness = Superstep(spark, checkpoint_dir, checkpoint_every)
    start_iter = 0
    if resume and checkpoint_dir is not None:
        got = harness.latest()
        if got is not None:
            start_iter, state = got[0] + 1, got[1]
    else:
        state = state.localCheckpoint(eager=True)

    for it in range(start_iter, iterations):
        # deflate the all-ones direction: x <- x - mean(x)
        mean = state.agg(F.avg("x").alias("_mean"))
        xc = state.crossJoin(F.broadcast(mean)).select(
            "id", "_d", (F.col("x") - F.col("_mean")).alias("_xc")
        )
        # y = (c - d_i)·xc_i + Σ_{j∈N(i)} xc_j   (B·xc with B = c·I − L)
        nb = edge_join(xc.select("id", "_xc"), adj, payload=["_xc"])
        contrib = nb.groupBy("id").agg(F.sum("_xc").alias("_s"))
        y = xc.join(contrib, "id", "left").select(
            "id",
            "_d",
            (
                (F.lit(c) - F.col("_d")) * F.col("_xc")
                + F.coalesce("_s", F.lit(0.0))
            ).alias("_y"),
        )
        norm = y.agg(F.sqrt(F.sum(F.col("_y") * F.col("_y"))).alias("_norm"))
        new_state = y.crossJoin(F.broadcast(norm)).select(
            "id",
            "_d",
            F.when(F.col("_norm") > 0, F.col("_y") / F.col("_norm"))
            .otherwise(F.col("_y"))
            .alias("x"),
        )
        state = harness.materialize(new_state, it, {"kernel": "fiedler"})

    adj.unpersist()
    return state.select("id", F.col("x").alias("f"))


def spectral_bisection(G, iterations: int = 80, seed: int = 42) -> DataFrame:
    """(id: long, side: int) — sign split of the Fiedler vector (0/1;
    f >= 0 → side 1).  The relaxed minimum-normalized-cut bipartition."""
    f = fiedler_vector(G, iterations=iterations, seed=seed)
    return f.select(
        "id", F.when(F.col("f") >= 0, F.lit(1)).otherwise(F.lit(0)).alias("side")
    )


def algebraic_connectivity(G, iterations: int = 80, seed: int = 42) -> float:
    """λ₂ estimate: the Rayleigh quotient x·L·x / x·x of the converged
    Fiedler iterate (x·x = 1 by construction)."""
    f = fiedler_vector(G, iterations=iterations, seed=seed).persist()
    adj = G.get_property("sym_offdiag").select("src", "dst")
    nb = edge_join(f.select("id", "f"), adj, payload=["f"])
    cross = (
        nb.withColumnRenamed("f", "_fn")
        .join(f, "id")
        .agg(F.sum(F.col("_fn") * F.col("f")).alias("s"))
        .collect()[0]["s"]
        or 0.0
    )
    deg_term = (
        f.join(
            adj.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("_d")),
            "id",
            "left",
        )
        .agg(F.sum(F.coalesce("_d", F.lit(0)) * F.col("f") * F.col("f")).alias("s"))
        .collect()[0]["s"]
        or 0.0
    )
    f.unpersist()
    # x·L·x = Σ d_i x_i² − Σ_i Σ_{j∈N(i)} x_i x_j
    return float(deg_term - cross)


def spectral_embedding(
    G, dims: int = 2, iterations: int = 80, seed: int = 42
) -> DataFrame:
    """(id, f1[, f2, ...]) — the first ``dims`` nontrivial Laplacian
    eigenvector estimates (f1 = the Fiedler vector), computed one at a
    time by power iteration on B = cI - L with deflation against the
    all-ones direction AND every previously-found vector (classic
    deflated power method; same fixed-iteration determinism as
    :func:`fiedler_vector`).

    This is the spectral LAYOUT / multiway-partition primitive: sign
    patterns over (f1, f2) give 4-way spectral partitioning, and the
    rows are 2-D drawing coordinates (nx ``spectral_layout`` analog).
    Cost: dims x the fiedler cost — each extra dimension re-runs the
    same one-shuffle superstep with one extra broadcast dot product per
    prior vector."""
    spark = G.spark
    num_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    adj = (
        G.get_property("sym_offdiag")
        .select("src", "dst")
        .repartition(num_part, "src")
        .persist()
    )
    deg = adj.groupBy(F.col("src").alias("id")).agg(
        F.count("*").cast("double").alias("_d")
    )
    d_max = deg.agg(F.max("_d").alias("m")).collect()[0]["m"] or 0.0
    c = 2.0 * float(d_max)

    base = (
        G.nodes.select("id")
        .join(deg, "id", "left")
        .select("id", F.coalesce("_d", F.lit(0.0)).alias("_d"))
        .repartition(num_part, "id")
        .persist()
    )
    found: list = []  # column names of committed vectors on `vecs`
    vecs = base  # (id, _d, f1, f2, ...)
    for k in range(1, dims + 1):
        x = vecs.select(
            "id", "_d", *found,
            _uniform(F.col("id"), f"spect{k}|{int(seed)}").alias("x"),
        ).localCheckpoint(eager=True)
        for it in range(iterations):
            aggs = [F.avg("x").alias("_mean")] + [
                F.sum(F.col("x") * F.col(f)).alias(f"_dot{f}") for f in found
            ]
            coefs = x.agg(*aggs)
            expr = F.col("x") - F.col("_mean")
            for f in found:
                expr = expr - F.col(f"_dot{f}") * F.col(f)
            xc = x.crossJoin(F.broadcast(coefs)).select(
                "id", "_d", *found, expr.alias("_xc")
            )
            nb = edge_join(xc.select("id", "_xc"), adj, payload=["_xc"])
            contrib = nb.groupBy("id").agg(F.sum("_xc").alias("_s"))
            y = xc.join(contrib, "id", "left").select(
                "id", "_d", *found,
                (
                    (F.lit(c) - F.col("_d")) * F.col("_xc")
                    + F.coalesce("_s", F.lit(0.0))
                ).alias("_y"),
            )
            norm = y.agg(F.sqrt(F.sum(F.col("_y") * F.col("_y"))).alias("_n"))
            x = y.crossJoin(F.broadcast(norm)).select(
                "id", "_d", *found,
                F.when(F.col("_n") > 0, F.col("_y") / F.col("_n"))
                .otherwise(F.col("_y"))
                .alias("x"),
            )
            # cut EVERY iteration like fiedler_vector: a lazy chain of
            # broadcast crossJoins blows up Catalyst analysis memory
            prev = x
            x = lineage_cut(x).persist()
            prev.unpersist()
        vecs = x.withColumnRenamed("x", f"f{k}").localCheckpoint(eager=True)
        found.append(f"f{k}")
    adj.unpersist()
    base.unpersist()
    return vecs.select("id", *found)
