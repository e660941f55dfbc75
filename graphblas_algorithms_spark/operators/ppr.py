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
    graphs.  Deterministic: pure arithmetic, no sampling."""
    spark = G.spark
    if G.is_directed_flag:
        adj = G.edges.select("src", "dst").filter(F.col("src") != F.col("dst"))
    else:
        adj = G.get_property("sym_offdiag")
    adj = adj.persist()
    deg = adj.groupBy("src").agg(F.count("*").alias("deg")).withColumnRenamed(
        "src", "id"
    ).persist()
    state = (
        spark.createDataFrame([(int(s), int(s)) for s in seeds], "seed long, id long")
        .join(deg, "id", "left")
        .select(
            "seed",
            "id",
            F.lit(0.0).alias("p"),
            F.lit(1.0).alias("r"),
            F.coalesce("deg", F.lit(0)).alias("deg"),
        )
        .localCheckpoint(eager=True)
    )
    for _ in range(max_rounds):
        active = F.col("r") > F.lit(eps) * F.col("deg")
        # sink nodes (deg 0) cannot push: their residual is terminal mass
        can_push = active & (F.col("deg") > 0)
        n_active = state.filter(can_push).limit(1).count()
        if n_active == 0:
            break
        pushing = state.filter(can_push)
        spread = (
            pushing.join(adj, pushing["id"] == adj["src"])
            .groupBy("seed", "dst")
            .agg(F.sum(F.lit(1.0 - alpha) * F.col("r") / F.col("deg")).alias("_in"))
            .withColumnRenamed("dst", "id")
        )
        merged = state.join(spread, ["seed", "id"], "full_outer").select(
            "seed",
            "id",
            (
                F.coalesce("p", F.lit(0.0))
                + F.when(
                    F.coalesce("r", F.lit(0.0)) > F.lit(eps) * F.coalesce("deg", F.lit(0)),
                    F.when(F.coalesce("deg", F.lit(0)) > 0, F.lit(alpha) * F.col("r")).otherwise(0.0),
                ).otherwise(0.0)
            ).alias("p"),
            (
                F.when(
                    (F.coalesce("r", F.lit(0.0)) > F.lit(eps) * F.coalesce("deg", F.lit(0)))
                    & (F.coalesce("deg", F.lit(0)) > 0),
                    F.lit(0.0),
                ).otherwise(F.coalesce("r", F.lit(0.0)))
                + F.coalesce("_in", F.lit(0.0))
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
        adj.unpersist()
        deg.unpersist()
        raise RuntimeError(f"forward_push_ppr did not settle in {max_rounds} rounds")
    adj.unpersist()
    deg.unpersist()
    return state.select("seed", "id", "p", F.col("r").alias("residual"))
