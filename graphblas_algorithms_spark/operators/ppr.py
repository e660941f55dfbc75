"""Batched multi-seed personalized PageRank (PPR).

Reference analog: ``pagerank(personalization={seed: 1})`` run per seed
(``algorithms/link_analysis/pagerank_alg.py:12-101``) — but per-seed
loops waste the dominant cost, the edge shuffle.  This kernel applies
the engine's queries-as-matrix trick (SURVEY O9, the multi-source BFS
shape) to link analysis: the state is (seed, id, rank) and ONE
contributions shuffle per superstep serves every seed, so k PPR vectors
cost the same superstep count as one.  Multi-seed PPR is the standard
feature generator for recommendation / similarity-by-random-walk over
a web-scale link graph.

Semantics per seed: teleport and dangling redistribution both
concentrate on the seed (nx ``personalization={seed: 1}`` with
``dangling=None`` defaulting to the personalization), fixed-iteration
power iteration from the uniform start.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.superstep import lineage_cut


def personalized_pagerank_multi(
    G,
    seeds: list[int],
    alpha: float = 0.85,
    iters: int = 20,
) -> DataFrame:
    """(seed: long, id: long, rank: double) — dense over G.nodes per seed."""
    spark = G.spark
    nodes = G.nodes
    n = G.n
    sd = spark.createDataFrame([(int(s),) for s in seeds], "seed long")
    if n == 0 or not seeds:
        return (
            nodes.select("id", F.lit(0.0).alias("rank"))
            .crossJoin(sd)
            .select("seed", "id", "rank")
            .limit(0)
        )

    adj = G.edges if G.is_directed_flag else G.get_property("sym_edges")
    weighted = "weight" in adj.columns
    if weighted:
        outdeg = adj.groupBy("src").agg(F.sum("weight").alias("_od"))
        adj_coef = adj.join(outdeg, "src").select(
            "src", "dst", (F.lit(alpha) * F.col("weight") / F.col("_od")).alias("coef")
        )
    else:
        outdeg = adj.groupBy("src").agg(F.count("*").alias("_od"))
        adj_coef = adj.join(outdeg, "src").select(
            "src", "dst", (F.lit(alpha) / F.col("_od")).alias("coef")
        )
    num_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    adj_coef = adj_coef.repartition(num_part, "src").persist()

    dangling_ids = nodes.join(
        adj.select(F.col("src").alias("id")).distinct(), "id", "left_anti"
    )
    # state carries its constants, like the single-seed fused kernel:
    # _tele/_dw concentrate on the seed, _dang marks dangling rows
    state = (
        nodes.crossJoin(F.broadcast(sd))
        .join(dangling_ids.select("id", F.lit(True).alias("_dang")), "id", "left")
        .select(
            "seed",
            "id",
            (F.lit(1.0) / F.lit(float(n))).alias("value"),
            F.when(F.col("id") == F.col("seed"), F.lit(1.0 - alpha))
            .otherwise(0.0)
            .alias("_tele"),
            F.when(F.col("id") == F.col("seed"), F.lit(1.0))
            .otherwise(0.0)
            .alias("_dw"),
            F.coalesce("_dang", F.lit(False)).alias("_dang"),
        )
        .repartition(num_part, "id")
        .localCheckpoint(eager=True)
    )
    for _ in range(iters):
        contribs = (
            state.join(adj_coef, state["id"] == adj_coef["src"])
            .groupBy("seed", "dst")
            .agg(F.sum(F.col("value") * F.col("coef")).alias("_c"))
            .withColumnRenamed("dst", "id")
        )
        mass = state.filter(F.col("_dang")).groupBy("seed").agg(
            F.coalesce(F.sum("value"), F.lit(0.0)).alias("_mass")
        )
        new_value = (
            F.coalesce(F.col("_c"), F.lit(0.0))
            + F.lit(alpha) * F.coalesce(F.col("_mass"), F.lit(0.0)) * F.col("_dw")
            + F.col("_tele")
        )
        state = (
            state.join(contribs, ["seed", "id"], "left")
            .join(F.broadcast(mass), "seed", "left")
            .select(
                "seed", "id", new_value.alias("value"), "_tele", "_dw", "_dang"
            )
            .transform(lineage_cut)
        )
    adj_coef.unpersist()
    return state.select("seed", "id", F.col("value").alias("rank"))


def forward_push_ppr(
    G,
    seeds: list[int],
    alpha: float = 0.15,
    eps: float = 1e-4,
    max_rounds: int = 200,
    dyadic_bits: int = 40,
) -> DataFrame:
    """(seed, id, p, residual) — sparse approximate PPR via batched
    forward push (Andersen-Chung-Lang local clustering push, run
    bulk-synchronously: EVERY above-threshold residual pushes each
    round).

    This is the sub-linear many-seed path the dense kernel cannot offer:
    state holds only touched (seed, node) pairs — O(1/(eps*alpha))
    nonzeros per seed independent of n — so thousands of seeds fit where
    the dense (seed x n) state cannot.  ``alpha`` here is the TELEPORT
    probability (ACL convention: p(u) += alpha*r(u); (1-alpha)*r(u)
    spreads uniformly over out-neighbors).  At termination every
    residual is <= eps * deg(node), giving the standard per-node
    approximation bound |ppr(v) - p(v)| <= eps * deg(v) on undirected
    graphs.

    Determinism contract (the ANF dyadic scaled-integer recipe): p and r
    are carried as BIGINTs on the 2^-dyadic_bits grid.  A push moves
    floor(alpha*r) units to p and q = floor((1-alpha)*r/deg) units to
    EACH neighbor; the <= deg+1 leftover units stay in the pusher's r,
    so total mass p+r is conserved EXACTLY in integer units and the
    incoming-spread SUM is a BIGINT sum — aggregation-order-independent,
    where a float sum is not.  Every float op involved (power-of-two
    scaling, one multiply, one divide, floor) is correctly-rounded IEEE
    and thus bit-identical across engines; a residual can therefore
    never sit within a ULP of the push threshold differently on two
    runs, which is what made the float formulation's whole trajectory
    run-order-sensitive.  The per-push truncation (~2^-40) is absorbed
    by the eps*deg approximation bound."""
    spark = G.spark
    if G.is_directed_flag:
        adj = G.edges.select("src", "dst").filter(F.col("src") != F.col("dst"))
    else:
        adj = G.get_property("sym_offdiag")
    adj = adj.persist()
    deg = adj.groupBy("src").agg(F.count("*").alias("deg")).withColumnRenamed(
        "src", "id"
    ).persist()
    scale = float(2**dyadic_bits)
    # threshold in scaled units: r_s > (eps*scale) * deg — one exact
    # BIGINT->double conversion and one correctly-rounded product
    thresh = F.lit(eps * scale)
    state = (
        spark.createDataFrame([(int(s), int(s)) for s in seeds], "seed long, id long")
        .join(deg, "id", "left")
        .select(
            "seed",
            "id",
            F.lit(0).cast("long").alias("p"),
            F.lit(int(scale)).cast("long").alias("r"),
            F.coalesce("deg", F.lit(0)).alias("deg"),
        )
        .localCheckpoint(eager=True)
    )
    try:
        for _ in range(max_rounds):
            active = F.col("r") > thresh * F.col("deg")
            # sink nodes (deg 0) cannot push: their residual is terminal mass
            can_push = active & (F.col("deg") > 0)
            n_active = state.filter(can_push).limit(1).count()
            if n_active == 0:
                break
            pushing = state.filter(can_push)
            # identical per-edge quantum q for all deg neighbors
            q = F.floor(F.lit(1.0 - alpha) * F.col("r") / F.col("deg")).cast("long")
            spread = (
                pushing.join(adj, pushing["id"] == adj["src"])
                .groupBy("seed", "dst")
                .agg(F.sum(q).alias("_in"))
                .withColumnRenamed("dst", "id")
            )
            is_push = (
                (F.coalesce("r", F.lit(0)) > thresh * F.coalesce("deg", F.lit(0)))
                & (F.coalesce("deg", F.lit(0)) > 0)
            )
            pa = F.floor(F.lit(alpha) * F.col("r")).cast("long")
            qm = F.floor(
                F.lit(1.0 - alpha) * F.col("r") / F.col("deg")
            ).cast("long")
            merged = state.join(spread, ["seed", "id"], "full_outer").select(
                "seed",
                "id",
                (
                    F.coalesce("p", F.lit(0))
                    + F.when(is_push, pa).otherwise(F.lit(0))
                ).alias("p"),
                (
                    F.when(
                        is_push,
                        # keep the floor crumbs: exact integer mass balance
                        F.col("r") - pa - F.col("deg") * qm,
                    ).otherwise(F.coalesce("r", F.lit(0)))
                    + F.coalesce("_in", F.lit(0))
                ).alias("r"),
                F.col("deg").alias("_olddeg"),
            )
            state = (
                merged.join(deg, "id", "left")
                .select(
                    "seed",
                    "id",
                    "p",
                    "r",
                    F.coalesce("_olddeg", F.coalesce("deg", F.lit(0))).alias("deg"),
                )
                .transform(lineage_cut)
            )
        else:
            raise RuntimeError(
                f"forward_push_ppr did not settle in {max_rounds} rounds"
            )
    finally:
        # release on BOTH the normal and the did-not-converge path
        adj.unpersist()
        deg.unpersist()
    return state.select(
        "seed",
        "id",
        (F.col("p") / F.lit(scale)).alias("p"),
        (F.col("r") / F.lit(scale)).alias("residual"),
    )
