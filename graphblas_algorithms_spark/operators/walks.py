"""Deterministic random-walk corpus generation (DeepWalk/node2vec input).

Not in the reference (it has no sampling surface) — added as the
graph-side feeder of the embedding-training pipeline: random-walk
corpora are the standard way a 10^12-file link graph becomes
embedding-model training data.

Determinism is load-bearing (the engine's resume/replay contract):
the "random" next step at each hop is
``argmin over out-neighbors of md5(seed|walk|step|cur|nbr)`` — md5 is
the engine-portable hash the dedup family already standardizes on
(``pipeline/dedup.py``), so the SAME walks replay across Spark
restarts, DuckDB oracles, and any other engine; no RNG state, no
collect.  Each hash draw is uniform over the neighbor set, i.e. this
is an unweighted first-order walk (DeepWalk semantics).

Scale shape: all (start x walk) chains advance together as ONE frontier
DataFrame — one edge join + one argmin agg per hop (the O9
queries-as-matrix superstep again).  Cost: walk_length shuffles of
|starts| x num_walks rows joined against the adjacency — independent of
n beyond the join itself.  Dead ends (sink nodes) end their walk early.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.superstep import lineage_cut


# 16^15: an md5 15-hex-digit prefix is uniform on [0, 16^15); exact in a
# double and in BIGINT range, so Spark conv() and DuckDB ::UBIGINT agree
# bit-for-bit (same constant as pipeline/curation.py)
_HEX15 = 1152921504606846976.0


def _walk_inputs(G, starts, weighted):
    """(starts_df, adjacency, use_weight) shared by both walk kernels.

    Self-loops are excluded in BOTH directed and undirected graphs (a
    self-loop that won the draw would trap the walk at one node for the
    rest of its length — degenerate training sentences).  Requesting
    ``weighted=True`` on a graph without a weight column raises rather
    than silently producing a uniform corpus."""
    if starts is None:
        sdf = G.nodes.select("id")
    elif isinstance(starts, DataFrame):
        sdf = starts.select("id")
    else:
        sdf = G.spark.createDataFrame([(int(s),) for s in starts], "id long")
    if weighted and "weight" not in G.edges.columns:
        raise ValueError(
            "weighted=True on a graph without a weight column — the corpus "
            "would silently degrade to uniform walks"
        )
    wcols = ["weight"] if weighted else []
    if G.is_directed_flag:
        adj = G.edges.select("src", "dst", *wcols).filter(F.col("src") != F.col("dst"))
    else:
        adj = (
            G.get_property("sym_edges")
            .select("src", "dst", *wcols)
            .filter(F.col("src") != F.col("dst"))
        )
    return sdf, adj.persist(), weighted


def random_walks(
    G,
    walk_length: int,
    num_walks: int = 1,
    starts: DataFrame | list[int] | None = None,
    seed: int = 42,
    weighted: bool = False,
) -> DataFrame:
    """(start: long, walk: long, step: long, node: long) — one row per
    visited position, step 0 = the start node, up to ``walk_length``
    hops (fewer if the walk hits a sink).  ``starts`` defaults to every
    node; pass a list or an (id) DataFrame to restrict.

    ``weighted=True`` draws each hop proportionally to edge weight via
    Efraimidis-Spirakis keys: pick argmax over neighbors of
    ``ln(u)/w`` where ``u`` is the same md5 hash-uniform — still fully
    deterministic and engine-replayable."""
    sdf, adj, use_w = _walk_inputs(G, starts, weighted)
    walks = G.spark.range(num_walks).select(F.col("id").alias("walk"))
    cur = sdf.select(F.col("id").alias("start")).crossJoin(walks).select(
        "start", "walk", F.col("start").alias("node")
    )
    steps = [cur.select("start", "walk", F.lit(0).alias("step"), "node").persist()]
    for step in range(1, walk_length + 1):
        draw = F.md5(
            F.concat_ws(
                "|",
                F.lit(int(seed)),
                F.col("walk"),
                F.lit(step),
                F.col("node"),
                F.col("dst"),
            )
        )
        if use_w:
            u = F.conv(F.substring(draw, 1, 15), 16, 10).cast("double") / F.lit(_HEX15)
            pick = F.max_by("dst", F.log(u) / F.col("weight"))
        else:
            pick = F.min_by("dst", draw)
        # the draw depends on (walk, step, node, dst) — NOT on start — so
        # every chain of the same walk id sitting on the same node takes
        # the same hop.  Advancing per DISTINCT (walk, node) and joining
        # back bounds the hub fan-out at num_walks x deg(hub) instead of
        # chains_on_hub x deg(hub): the skew killer when thousands of
        # chains converge onto a power-law hub (measured: a 100k-chain
        # step at 111M edges straggled indefinitely on one task without
        # this; seconds with it).
        hop = (
            cur.select("walk", "node")
            .distinct()
            .join(adj, F.col("node") == adj["src"])
            .groupBy("walk", "node")
            .agg(pick.alias("_next"))
        )
        nxt = cur.join(hop, ["walk", "node"]).select(
            "start", "walk", F.col("_next").alias("node")
        )
        # each step is cut once and APPENDED — unioning per step and
        # re-cutting the growing prefix would rewrite the whole corpus
        # every hop (O(walk_length^2) data movement)
        cur = nxt.transform(lineage_cut)
        steps.append(cur.select("start", "walk", F.lit(step).alias("step"), "node"))
    adj.unpersist()
    out = steps[0]
    for s in steps[1:]:
        out = out.unionByName(s)
    return out


def walk_sentences(walks: DataFrame) -> DataFrame:
    """(start, walk, sentence: array<long>) — step-ordered node sequences,
    the shape an embedding trainer consumes."""
    return walks.groupBy("start", "walk").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("step", "node"))),
            lambda s: s["node"],
        ).alias("sentence")
    )


def node2vec_walks(
    G,
    walk_length: int,
    p: float = 1.0,
    q: float = 1.0,
    num_walks: int = 1,
    starts: DataFrame | list[int] | None = None,
    seed: int = 42,
    weighted: bool = False,
    method: str = "es",
    attempts: int = 4,
) -> DataFrame:
    """Second-order biased walks (node2vec, Grover & Leskovec 2016):
    from edge (prev -> cur), candidate dst is drawn proportional to
    w * alpha where alpha = 1/p if dst == prev (return), 1 if dst is a
    neighbor of prev (BFS-like), 1/q otherwise (DFS-like).  Step 1 is
    first-order.  Same deterministic Efraimidis-Spirakis draw as
    :func:`random_walks` (argmax of ln(u)/(w*alpha)) so corpora replay
    across engines.

    ``method="es"`` (default, the oracle-replayed contract): per hop,
    one edge join producing sum(deg) candidate rows + one LEFT join of
    ALL candidates against the neighbor-pair set (the prev-adjacency
    test) + one argmax agg.  That second pair-keyed join over sum(deg)
    rows is the measured scale price (120.5 s/hop at 111M edges vs
    first-order's 14.4; r3/r4 layout changes made it WORSE — skew-bound,
    BENCH/BASELINE.md).

    ``method="rejection"`` (KnightKing-style, VERDICT r4 #6): draw up to
    ``attempts`` first-order proposals per (walk, node) in ONE edge pass
    (T min_by/max_by aggregates in the same groupBy), then test the
    prev-adjacency of the T PROPOSED nodes only — |states| x T pair
    probes instead of sum(deg) — accepting proposal t with probability
    alpha(cand_t)/alpha_max via an independent md5 uniform; the rare
    state with T rejections falls back to the exact ES draw, so the
    sampled law is EXACTLY the node2vec distribution (proposal ~ w,
    accept ~ alpha/alpha_max, residual exact).  Still md5-deterministic
    and engine-replayable, just a different (documented) draw sequence
    than "es".
    """
    if method not in ("es", "rejection"):
        raise ValueError(f"method must be 'es' or 'rejection', got {method!r}")
    if method == "rejection":
        return _node2vec_walks_rejection(
            G, walk_length, p, q, num_walks, starts, seed, weighted, attempts
        )
    sdf, adj, use_w = _walk_inputs(G, starts, weighted)
    nbr = adj.select(
        F.col("src").alias("_np"), F.col("dst").alias("_nd"), F.lit(1).alias("_is_nbr")
    )
    walks = G.spark.range(num_walks).select(F.col("id").alias("walk"))
    cur = sdf.select(F.col("id").alias("start")).crossJoin(walks).select(
        "start", "walk", F.lit(None).cast("long").alias("prev"), F.col("start").alias("node")
    )
    steps = [cur.select("start", "walk", F.lit(0).alias("step"), "node")]
    wexpr = F.col("weight") if use_w else F.lit(1.0)
    for step in range(1, walk_length + 1):
        # hop computed per DISTINCT (walk, prev, node) and joined back —
        # the same hub-skew bound as random_walks (the second-order draw
        # depends on (walk, step, prev, node, dst), never on start)
        states = cur.select("walk", "prev", "node").distinct()
        cand = states.join(adj, states["node"] == adj["src"])
        draw = F.md5(
            F.concat_ws(
                "|",
                F.lit(int(seed)),
                F.col("walk"),
                F.lit(step),
                F.col("node"),
                F.col("dst"),
            )
        )
        u = F.conv(F.substring(draw, 1, 15), 16, 10).cast("double") / F.lit(_HEX15)
        if step == 1:
            key = F.log(u) / wexpr
        else:
            cand = cand.join(
                nbr,
                (cand["prev"] == F.col("_np")) & (cand["dst"] == F.col("_nd")),
                "left",
            )
            alpha = (
                F.when(F.col("dst") == F.col("prev"), F.lit(1.0 / p))
                .when(F.col("_is_nbr") == 1, F.lit(1.0))
                .otherwise(F.lit(1.0 / q))
            )
            key = F.log(u) / (wexpr * alpha)
        hop = (
            cand.groupBy("walk", "prev", "node")
            .agg(F.max_by("dst", key).alias("_next"))
            .withColumnsRenamed({"walk": "_hw", "prev": "_hp", "node": "_hn"})
        )
        nxt = cur.join(
            hop,
            (cur["walk"] == F.col("_hw"))
            & cur["prev"].eqNullSafe(F.col("_hp"))
            & (cur["node"] == F.col("_hn")),
        ).select(
            "start", "walk", F.col("node").alias("prev"), F.col("_next").alias("node")
        )
        cur = nxt.transform(lineage_cut)
        steps.append(cur.select("start", "walk", F.lit(step).alias("step"), "node"))
    adj.unpersist()
    out = steps[0]
    for s in steps[1:]:
        out = out.unionByName(s)
    return out


def _node2vec_walks_rejection(
    G,
    walk_length: int,
    p: float,
    q: float,
    num_walks: int,
    starts,
    seed: int,
    weighted: bool,
    attempts: int,
) -> DataFrame:
    """The ``method="rejection"`` body of :func:`node2vec_walks` — see
    its docstring for the algorithm and the scale rationale."""
    if attempts < 1:
        raise ValueError(f"attempts must be >= 1, got {attempts}")
    sdf, adj, use_w = _walk_inputs(G, starts, weighted)
    nbr = adj.select(
        F.col("src").alias("_np"), F.col("dst").alias("_nd"), F.lit(1).alias("_is_nbr")
    )
    a_ret, a_nbr, a_oth = 1.0 / p, 1.0, 1.0 / q
    a_max = max(a_ret, a_nbr, a_oth)
    # acceptance probabilities as python-float literals (engine-portable:
    # an oracle replays the identical repr)
    acc_ret, acc_nbr, acc_oth = a_ret / a_max, a_nbr / a_max, a_oth / a_max
    walks = G.spark.range(num_walks).select(F.col("id").alias("walk"))
    cur = sdf.select(F.col("id").alias("start")).crossJoin(walks).select(
        "start", "walk", F.lit(None).cast("long").alias("prev"), F.col("start").alias("node")
    )
    steps = [cur.select("start", "walk", F.lit(0).alias("step"), "node")]
    wexpr = F.col("weight") if use_w else F.lit(1.0)
    # Broadcast decision per hop: the rejection path's whole advantage at
    # scale is that its probe side is |states| x T rows (vs es's
    # sum(deg)) — small enough to BROADCAST against the giant adjacency,
    # which then never shuffles (222M-row exchanges per hop dominated
    # both methods at 111M edges).  Guarded by an exact count so an
    # all-nodes start set degrades to plain shuffled joins instead of
    # OOMing the driver.
    # env override is the A/B lever (0 forces the shuffled-join path)
    bcast_max = int(os.environ.get("SPARK_GRAFT_N2V_BCAST_MAX", "5000000"))
    for step in range(1, walk_length + 1):
        states = cur.select("walk", "prev", "node").distinct().persist()
        hop_release = [states]
        n_states = states.count()
        small = n_states * attempts <= bcast_max
        if step == 1:
            # first-order, exactly the es path's step 1
            srcst = F.broadcast(states) if small else states
            cand = srcst.join(adj, srcst["node"] == adj["src"])
            draw = F.md5(
                F.concat_ws(
                    "|", F.lit(int(seed)), F.col("walk"), F.lit(step),
                    F.col("node"), F.col("dst"),
                )
            )
            if use_w:
                u = F.conv(F.substring(draw, 1, 15), 16, 10).cast("double") / F.lit(_HEX15)
                pick = F.max_by("dst", F.log(u) / wexpr)
            else:
                pick = F.min_by("dst", draw)
            hop = cand.groupBy("walk", "prev", "node").agg(pick.alias("_next"))
        else:
            # ONE edge pass draws all T proposals per (walk, node): the
            # T aggregates share the single sum(deg)-row shuffle
            dstates = states.select("walk", "node").distinct()
            if small:
                dstates = F.broadcast(dstates)
            cand = dstates.join(adj, dstates["node"] == adj["src"])
            aggs = []
            for t in range(1, attempts + 1):
                draw_t = F.md5(
                    F.concat_ws(
                        "|", F.lit(int(seed)), F.col("walk"), F.lit(step),
                        F.lit(t), F.col("node"), F.col("dst"),
                    )
                )
                if use_w:
                    u_t = (
                        F.conv(F.substring(draw_t, 1, 15), 16, 10).cast("double")
                        / F.lit(_HEX15)
                    )
                    aggs.append(F.max_by("dst", F.log(u_t) / wexpr).alias(f"_c{t}"))
                else:
                    aggs.append(F.min_by("dst", draw_t).alias(f"_c{t}"))
            props = cand.groupBy("walk", "node").agg(*aggs)
            expanded = states.join(props, ["walk", "node"]).select(
                "walk",
                "prev",
                "node",
                F.posexplode(
                    F.array(*[F.col(f"_c{t}") for t in range(1, attempts + 1)])
                ).alias("_tpos", "_cand"),
            )
            # prev-adjacency probe of the T PROPOSED nodes only:
            # |states| x T pair lookups instead of sum(deg).  When the
            # probe side is broadcastable, flip the join to right_outer
            # with the probe side as the broadcast build side — the
            # giant adjacency then streams in place with NO exchange
            # (the per-hop 2m-row shuffle that dominated 111M edges).
            cond_cols = (F.col("prev") == F.col("_np")) & (
                F.col("_cand") == F.col("_nd")
            )
            if small:
                probed = nbr.join(F.broadcast(expanded), cond_cols, "right_outer")
            else:
                probed = expanded.join(nbr, cond_cols, "left")
            acc_p = (
                F.when(F.col("_cand") == F.col("prev"), F.lit(acc_ret))
                .when(F.col("_is_nbr") == 1, F.lit(acc_nbr))
                .otherwise(F.lit(acc_oth))
            )
            ua = (
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat_ws(
                                "|", F.lit(int(seed)), F.col("walk"), F.lit(step),
                                F.col("_tpos") + 1, F.lit("a"), F.col("prev"),
                                F.col("node"), F.col("_cand"),
                            )
                        ),
                        1,
                        15,
                    ),
                    16,
                    10,
                ).cast("double")
                / F.lit(_HEX15)
            )
            hop_acc = (
                probed.filter(ua < acc_p)
                .groupBy("walk", "prev", "node")
                .agg(
                    F.min(
                        F.struct(F.col("_tpos").alias("t"), F.col("_cand").alias("c"))
                    ).alias("_m")
                )
                .select("walk", "prev", "node", F.col("_m.c").alias("_next"))
            )
            # residual (all T proposals rejected): exact ES draw — keeps
            # the sampled law exactly node2vec (proposal ~ w, accept
            # ~ alpha/a_max, residual exact)
            resid = states.join(
                hop_acc.select("walk", "prev", "node"),
                ["walk", "prev", "node"],
                "left_anti",
            )
            if small:
                resid = F.broadcast(resid)
            rc0 = resid.join(adj, resid["node"] == adj["src"])
            if small:
                # sum(deg) over the (rare) all-rejected states — count it
                # exactly and keep the adjacency exchange-free if it fits
                rc0 = rc0.persist()
                hop_release.append(rc0)
                rc_small = rc0.count() <= bcast_max
            else:
                rc_small = False
            rcond = (F.col("prev") == F.col("_np")) & (
                F.col("dst") == F.col("_nd")
            )
            if rc_small:
                rcand = nbr.join(F.broadcast(rc0), rcond, "right_outer")
            else:
                rcand = rc0.join(nbr, rcond, "left")
            draw = F.md5(
                F.concat_ws(
                    "|", F.lit(int(seed)), F.col("walk"), F.lit(step),
                    F.col("node"), F.col("dst"),
                )
            )
            u = F.conv(F.substring(draw, 1, 15), 16, 10).cast("double") / F.lit(_HEX15)
            alpha = (
                F.when(F.col("dst") == F.col("prev"), F.lit(a_ret))
                .when(F.col("_is_nbr") == 1, F.lit(a_nbr))
                .otherwise(F.lit(a_oth))
            )
            hop_res = rcand.groupBy("walk", "prev", "node").agg(
                F.max_by("dst", F.log(u) / (wexpr * alpha)).alias("_next")
            )
            hop = hop_acc.unionByName(hop_res)
        hop = hop.withColumnsRenamed({"walk": "_hw", "prev": "_hp", "node": "_hn"})
        nxt = cur.join(
            hop,
            (cur["walk"] == F.col("_hw"))
            & cur["prev"].eqNullSafe(F.col("_hp"))
            & (cur["node"] == F.col("_hn")),
        ).select(
            "start", "walk", F.col("node").alias("prev"), F.col("_next").alias("node")
        )
        cur = nxt.transform(lineage_cut)
        for _df in hop_release:
            _df.unpersist()
        steps.append(cur.select("start", "walk", F.lit(step).alias("step"), "node"))
    adj.unpersist()
    out = steps[0]
    for s in steps[1:]:
        out = out.unionByName(s)
    return out
