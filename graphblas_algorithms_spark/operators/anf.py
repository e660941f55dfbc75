"""Approximate neighborhood function / effective diameter via
Flajolet-Martin bitmask supersteps (ANF: Palmer, Gibbons, Faloutsos,
KDD'02; the HyperANF lineage).

Engine extension — the reference (graphblas-algorithms) ships no
neighborhood-function operator; at the link-graph tier the question
"what fraction of node pairs lie within h hops" (and its q-quantile,
the effective diameter) can't run all-pairs BFS at 10^12 files, while
the reference's exact kernels stop at single/multi-source distances.

Algorithm: every node carries ``k`` independent FM bitmasks.  Bit j of
a fresh mask is set with probability 2^-(j+1) (here: j = trailing
zeros of a deterministic md5-derived hash, so runs, resumes AND the
driver's DuckDB oracle reproduce bit-exactly).  One superstep ORs each node's masks with its
out-neighbors' masks — after h supersteps node v's masks describe the
set reached within h hops, because OR is exactly set-union on the
sketch.  |N(v,h)| ~= 2^R_v / 0.77351 with R_v = mean over the k masks
of the lowest-zero-bit index.

Spark-first shape: the k bitmasks are k LONG columns, the superstep is
ONE O(nnz) edge join + groupBy with ``bit_or`` aggregates, and the
estimator is a column expression — trailing ones of m =
``bit_count(m & ~(m+1))`` — so the whole operator is codegen'd
JVM-side SQL: no UDF, no per-register row explosion, no driver data.
Convergence (masks globally unchanged == every reachable set closed)
and the per-h estimate ride in the SAME single-row aggregate, one
Spark action per superstep, with the standard lineage cut
(plans/superstep.py) keeping iteration depth safe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.superstep import Superstep

_MASKS = 64  # usable bit positions per long (we cap init at bit 62)


def _mask_cols(k: int) -> list[str]:
    return [f"m{i}" for i in range(k)]


def _init_state(nodes: DataFrame, k: int, seed: int) -> DataFrame:
    """One geometric bit per mask: j = trailing zeros of md5(id|i|seed)
    (capped at 62 so the estimator's +1 arithmetic never touches the
    sign bit).  Deterministic pure function of (id, i, seed) — and the
    md5 recipe (shared with HyperBall, :func:`hb_mask_init_sql`) is
    engine-portable, so the driver's DuckDB oracle replays the exact
    sketch trajectory (r4: ported from xxhash64, which DuckDB lacks —
    this was the last graph-side rows-only oracle)."""
    cols = [
        F.expr(hb_mask_init_sql(i, seed, "spark")).alias(f"m{i}")
        for i in range(k)
    ]
    return nodes.select("id", *cols)


def neighborhood_function(
    G,
    max_h: int = 64,
    k: int = 32,
    seed: int = 42,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 1,
    stop_early: bool = True,
) -> list[dict]:
    """[{'h': 0, 'reachable_pairs': n}, {'h': 1, ...}, ...] — the
    estimated number of (source, target) pairs within distance h,
    for h = 0..convergence (masks stable) or ``max_h``.

    Directed graphs count ordered pairs (reach via out-edges);
    undirected graphs propagate over the symmetrized edge set.
    N(0) = n exactly; later points carry the FM sketch's ~1/sqrt(k)
    relative error (pytest-gated differentially vs exact networkx
    closures).  ``stop_early=False`` runs EXACTLY ``max_h`` supersteps
    and emits every h — the fixed-trajectory form the driver's unrolled
    SQL oracle replays.

    Every estimate is engine-exact: per-node ball from the
    correctly-rounded :func:`hb_ball_sql` expression, snapped to a
    2^-20 dyadic grid and summed as BIGINT (order-independent), so
    Spark and DuckDB agree bit-for-bit.
    """
    spark = G.spark
    n = G.n
    if n == 0:
        return [{"h": 0, "reachable_pairs": 0.0}]
    edges = G.edges if G.is_directed_flag else G.get_property("sym_edges")
    edges = edges.select("src", "dst")
    num_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    edges = edges.repartition(num_part, "dst").persist()

    mcols = _mask_cols(k)
    state = _init_state(G.nodes, k, seed).repartition(num_part, "id")

    harness = Superstep(spark, checkpoint_dir, checkpoint_every)
    state = state.localCheckpoint(eager=True)

    # estimate: sum over nodes of the reproducible-float ball estimate,
    # snapped to an exact dyadic (x * 2^20 rounded to BIGINT) so the
    # cross-node sum is integer-exact and ORDER-INDEPENDENT — the same
    # number falls out of any engine that replays the sketch
    ball = hb_ball_sql(k)
    est_expr = F.sum(
        F.expr(f"cast(floor(({ball}) * 1048576.0 + 0.5) as bigint)")
    ).alias("_est")
    bits_expr = F.sum(sum(F.bit_count(F.col(c)) for c in mcols)).alias("_bits")

    out = [{"h": 0, "reachable_pairs": float(n)}]
    prev_bits = None
    for h in range(1, max_h + 1):
        gathered = (
            edges.join(state.withColumnRenamed("id", "dst"), "dst")
            .groupBy(F.col("src").alias("id"))
            .agg(*[F.bit_or(c).alias(f"_g{i}") for i, c in enumerate(mcols)])
        )
        new_state = state.join(gathered, "id", "left").select(
            "id",
            *[
                F.col(c)
                .bitwiseOR(F.coalesce(F.col(f"_g{i}"), F.lit(0)))
                .alias(c)
                for i, c in enumerate(mcols)
            ],
        )
        new_state = harness.materialize(new_state, h - 1, {"kernel": "anf", "h": h})
        row = new_state.agg(est_expr, bits_expr).collect()[0]
        state = new_state
        bits = int(row["_bits"])
        if stop_early and prev_bits is not None and bits == prev_bits:
            break  # no mask gained a bit anywhere: every ball is closed
        prev_bits = bits
        out.append({"h": h, "reachable_pairs": int(row["_est"]) / 1048576.0})
    return out


def effective_diameter(
    G, q: float = 0.9, max_h: int = 64, k: int = 32, seed: int = 42
) -> float:
    """Smallest (interpolated) h such that N(h) >= q * N(converged) —
    the standard q-effective diameter over the ANF curve."""
    nf = neighborhood_function(G, max_h=max_h, k=k, seed=seed)
    total = nf[-1]["reachable_pairs"]
    target = q * total
    prev = nf[0]["reachable_pairs"]
    if prev >= target:
        return 0.0
    for point in nf[1:]:
        cur = point["reachable_pairs"]
        if cur >= target:
            # linear interpolation inside the step, as in ANF/HyperANF
            return point["h"] - 1 + (target - prev) / max(cur - prev, 1e-12)
        prev = cur
    return float(nf[-1]["h"])


# ---------------------------------------------------------------------------
# HyperBall: per-node centralities from the same FM sketches
# ---------------------------------------------------------------------------
#
# Boldi-Rosa-Vigna "HyperBall: four degrees of separation, twenty
# billion edges" (2013): while running the ball-growing supersteps, the
# per-hop DELTA |B(v,h)| - |B(v,h-1)| prices every newly-reached node at
# distance exactly h, so harmonic centrality (sum 1/d), total distance
# (sum d) and reachable-set size for EVERY node fall out of the same
# O(nnz)-per-round sketch pass — the only per-node whole-graph
# centrality that survives 10^12 files (exact closeness is one BFS per
# node).  Engine extension: the reference stops at exact single/multi
# source distances.
#
# Like ``neighborhood_function`` (since r4), these sketches are
# md5-seeded and every float step is decomposed into operations that are
# correctly rounded in IEEE double on BOTH Spark and DuckDB
# (integer-exponent pow, a literal-constant table for the fractional
# part, add/sub/mul/div) — so the approximate result is still EXACTLY
# value-oracle-able: the driver oracle replays the identical sketch
# trajectory in SQL and hashes must match bit-for-bit at 6dp.

_HB_PHI = "0.77351"  # literal text shared by Spark exprs and the SQL oracle


def hb_mask_init_sql(i: int, seed: int, engine: str) -> str:
    """One geometric FM bit from md5(id|i|seed) — the engine-portable
    sketch seed.  ``engine``: 'spark' | 'duckdb' (hex->int differs)."""
    h = (
        f"cast(conv(substr(md5(concat_ws('|', id, {i}, {seed})), 1, 15), 16, 10) as bigint)"
        if engine == "spark"
        else f"cast(('0x' || substring(md5(concat_ws('|', id, {i}, {seed})), 1, 15)) as BIGINT)"
    )
    tz = f"bit_count(~({h}) & (({h}) - 1))"
    if engine == "spark":
        return f"shiftleft(cast(1 as bigint), cast(least({tz}, 62) as int))"
    return f"(cast(1 as BIGINT) << least({tz}, 62))"


def hb_ball_sql(k: int) -> str:
    """Reproducible-float ball estimate from mask columns m0..m{k-1}:
    2^(rsum div k) * C[rsum % k] / phi with C[j] = 2^(j/k) embedded as
    literal doubles — identical text runs on Spark SQL and DuckDB, and
    every operation is correctly rounded, so both engines produce the
    SAME double."""
    # DuckDB's bit_count returns TINYINT — cast each term so the k-term
    # sum (up to 62k) can't overflow; Spark parses the same cast
    tones = " + ".join(
        f"cast(bit_count(m{i} & ~(m{i} + 1)) as int)" for i in range(k)
    )
    consts = [repr(2.0 ** (j / k)) for j in range(k)]
    whens = " ".join(f"WHEN {j} THEN {c}" for j, c in enumerate(consts))
    rsum = f"({tones})"
    # floor(rsum/k) instead of integer `div`: the same text parses on
    # Spark SQL and DuckDB, and rsum <= 62k is exact in double
    return (
        f"(pow(2.0, floor({rsum} / cast({k} as double))) * "
        f"(CASE {rsum} % {k} {whens} END) / {_HB_PHI})"
    )


def hyperball(
    G,
    h: int = 8,
    k: int = 16,
    seed: int = 42,
    mode: str = "in",
    checkpoint_dir: str | None = None,
    resume: bool = False,
) -> DataFrame:
    """(id, reachable, harmonic, sum_dist) — HyperBall sketch
    centralities after EXACTLY ``h`` ball-growing rounds (fixed
    trajectory: deterministic in (G, h, k, seed) and replayable in SQL).

    ``harmonic`` estimates nx ``harmonic_centrality`` (sum over u of
    1/d(u,v)); ``sum_dist`` the total incoming distance; ``reachable``
    the ball size |{u: d(u,v) <= h}| including v.  ``mode='in'``
    (default) prices incoming distances — the nx convention for
    harmonic/closeness on digraphs; ``'out'`` grows forward balls.
    Undirected graphs use the symmetrized edges either way.  Relative
    error ~1.06/sqrt(k) per ball (FM); pick h >= diameter for the
    converged centrality."""
    spark = G.spark
    num_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    if G.is_directed_flag:
        edges = G.edges.select("src", "dst")
        if mode == "in":
            # gather masks from tail (src) into head (dst)
            gather_key, group_key = "src", "dst"
        else:
            gather_key, group_key = "dst", "src"
    else:
        edges = G.get_property("sym_edges").select("src", "dst")
        gather_key, group_key = "dst", "src"
    edges = edges.repartition(num_part, gather_key).persist()

    mcols = _mask_cols(k)
    init = [F.expr(hb_mask_init_sql(i, seed, "spark")).alias(f"m{i}") for i in range(k)]
    ball0 = F.expr(hb_ball_sql(k))
    state = G.nodes.select("id", *init).select(
        "id",
        *mcols,
        ball0.alias("ball"),
        F.lit(0.0).alias("harm"),
        F.lit(0.0).alias("sumd"),
    )
    state = state.repartition(num_part, "id")

    harness = Superstep(spark, checkpoint_dir, 1)
    start_round = 1
    if resume and checkpoint_dir is not None:
        got = harness.latest()
        if got is not None:
            # checkpoints are written as round r-1 -> resume at r+1
            start_round, state = got[0] + 2, got[1]
    if start_round == 1:
        state = state.localCheckpoint(eager=True)
    for r in range(start_round, h + 1):
        gathered = (
            edges.join(state.withColumnRenamed("id", gather_key), gather_key)
            .groupBy(F.col(group_key).alias("id"))
            .agg(*[F.bit_or(c).alias(f"_g{i}") for i, c in enumerate(mcols)])
        )
        merged = state.join(gathered, "id", "left").select(
            "id",
            *[
                F.col(c).bitwiseOR(F.coalesce(F.col(f"_g{i}"), F.lit(0))).alias(c)
                for i, c in enumerate(mcols)
            ],
            "ball",
            "harm",
            "sumd",
        )
        newball = F.expr(hb_ball_sql(k))
        # masks only gain bits, so the delta is >= 0 by construction
        state = merged.select(
            "id",
            *mcols,
            newball.alias("ball"),
            (F.col("harm") + (newball - F.col("ball")) / F.lit(float(r))).alias("harm"),
            (F.col("sumd") + (newball - F.col("ball")) * F.lit(float(r))).alias("sumd"),
        )
        state = harness.materialize(state, r - 1, {"kernel": "hyperball", "h": r})
    out = state.select("id", F.col("ball").alias("reachable"), "harm", "sumd").select(
        "id",
        "reachable",
        F.col("harm").alias("harmonic"),
        F.col("sumd").alias("sum_dist"),
    )
    edges.unpersist()
    return out


def hyperball_harmonic(G, h: int = 8, k: int = 32, seed: int = 42) -> DataFrame:
    """(id, harmonic) — sketch harmonic centrality for every node."""
    return hyperball(G, h=h, k=k, seed=seed).select("id", "harmonic")


def hyperball_closeness(G, h: int = 8, k: int = 32, seed: int = 42) -> DataFrame:
    """(id, closeness) — sketch closeness (nx ``wf_improved``
    convention): ((r-1)/(n-1)) * ((r-1)/sum_dist), 0 when nothing
    reaches the node."""
    n = G.n
    hb = hyperball(G, h=h, k=k, seed=seed)
    r1 = F.col("reachable") - F.lit(1.0)
    return hb.select(
        "id",
        F.when(
            F.col("sum_dist") > 0.0,
            r1 / F.lit(float(max(n - 1, 1))) * (r1 / F.col("sum_dist")),
        )
        .otherwise(F.lit(0.0))
        .alias("closeness"),
    )
