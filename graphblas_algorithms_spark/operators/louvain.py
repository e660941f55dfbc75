"""Louvain community detection (synchronous, deterministic, multilevel).

Not in the reference (graphblas-algorithms stops at label propagation
for communities); BASELINE.json's link-graph tier makes modularity
communities a first-class report next to PageRank, and
``operators/metrics.py`` already carries the modularity arithmetic this
optimizes.  Classic Louvain (Blondel et al. 2008) is sequential — each
node moves one at a time against the *current* partition — which does
not distribute.  We pin a synchronous variant (Prat-Pérez-style
parallel local moving) whose every step is a deterministic DataFrame
program, so results are reproducible AND replicable bit-for-bit in the
DuckDB oracle:

* labels initialized to node id;
* each round r, HALF the nodes are active — those with
  ``md5(id || '|' || r)`` 15-hex-prefix even (the repo's
  engine-portable randomness standard); inactive nodes keep their
  label.  Fully synchronous moving oscillates (simultaneous pairwise
  swaps park Q near 0 — measured, see tests); stochastic half-round
  activation is the standard mitigation (Sotera DGA / Grappolo-style
  parallel Louvain) and measured Q matches networkx's sequential
  louvain_communities to the third decimal on karate / G(n,m) /
  powerlaw-cluster / planted-partition graphs (tests/test_louvain.py);
* an active node v scores each candidate community c drawn from its
  neighbors' *previous-round* labels (plus its own label):

      gain2m(v, c) = 2*m*k(v,c) - deg(v) * (sig(c) - deg(v)*[c = own])

  which is the standard Louvain modularity gain times the constant
  2*m^2 > 0 — argmax-equivalent, but (on integral weights) computed in
  exact BIGINT arithmetic, so the argmax is engine-portable with NO
  floating-point tie hazards.  k(v,c) = weight from v to c, sig(c) =
  total degree of c (self-loops count twice, networkx convention),
  own = v's current community (its own degree is excluded from sig);
* swap prevention (Grappolo rule): a singleton community may not merge
  INTO a singleton community with a larger id — the one residual
  symmetric-swap case the activation halving leaves open;
* argmax tie-break: highest gain, then v's own community (stability),
  then MIN community id — fully deterministic;
* after ``rounds`` rounds communities are relabeled to their MIN member
  node id and the graph is contracted (intra-community weight becomes
  a self-loop); the next level repeats local moving on the
  super-graph.  Contracted weights stay integral, so every level keeps
  the exact-integer argmax;
* fixed ``levels`` x ``rounds`` (data-dependent stopping only via the
  level-boundary fixed-point check, which cannot change the output) —
  the same exactness rule the label-propagation kernel pins (SURVEY §7).

Scale shape per round (same discipline as labelprop.py): the
symmetrized adjacency is hash-pinned by ``dst`` once per level, labels
stay hash-partitioned on ``id``, so the neighbor-label join is
exchange-free on both sides; the ONE exchange is the
``groupBy(src, c)`` weight rollup, whose map-side partial agg absorbs
hub fan-in.  sig/cand/score joins are all keyed on ``id``/``c`` over
O(n) rows.  Contraction is one groupBy on the (shrinking) edge table.

Overflow bound: gain2m uses 2*m*k in BIGINT — safe while
2 * total_weight * max_degree < 2^63 (at 10^12 unweighted edges that
allows hub degree ~4.6M; beyond that switch scores to DOUBLE and give
up bit-exact oracle parity, not correctness).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.superstep import Superstep, lineage_cut


def _weighted_parts(edges: DataFrame, integral: bool):
    """(sym, deg, m): both-direction offdiag view with weight, the
    modularity degree vector (self-loops twice), and total weight m."""
    wcol = (
        F.col("weight").cast("long" if integral else "double")
        if "weight" in edges.columns
        else F.lit(1).cast("long" if integral else "double")
    )
    e = edges.select("src", "dst", wcol.alias("w"))
    off = e.filter(F.col("src") != F.col("dst"))
    diag = e.filter(F.col("src") == F.col("dst"))
    sym = off.unionByName(
        off.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "w")
    )
    deg = (
        sym.select(F.col("src").alias("id"), "w")
        .unionByName(diag.select(F.col("src").alias("id"), (F.lit(2) * F.col("w")).alias("w")))
        .groupBy("id")
        .agg(F.sum("w").alias("deg"))
    )
    m = e.agg(F.sum("w")).collect()[0][0] or 0
    return sym, deg, m


def _move_rounds(
    spark,
    sym: DataFrame,
    deg: DataFrame,
    nodes: DataFrame,
    m,
    rounds: int,
    num_part: int,
    level: int = 0,
) -> DataFrame:
    """Synchronous local-moving on one level; returns (id, c)."""
    adj = sym.repartition(num_part, "dst").persist()
    degp = (
        nodes.select("id")
        .join(deg.select(F.col("id").alias("_did"), "deg"), F.col("id") == F.col("_did"), "left")
        .select("id", F.coalesce("deg", F.lit(0)).alias("deg"))
        .repartition(num_part, "id")
        .persist()
    )
    labels = nodes.select("id", F.col("id").alias("c")).repartition(num_part, "id")

    def _active(col, r: int):
        """Engine-portable half-activation: md5 15-hex prefix even."""
        return (
            F.conv(
                F.substring(F.md5(F.concat_ws("|", col.cast("string"), F.lit(str(r)))), 1, 15),
                16,
                10,
            ).cast("long")
            % 2
            == 0
        )

    for r in range(rounds):
        lab = labels.select("id", "c")
        # per-community totals from the PREVIOUS round's labels: degree
        # mass (sig) for the gain, member count (sz) for swap prevention
        stats = (
            lab.join(degp, "id")
            .groupBy("c")
            .agg(F.sum("deg").alias("sig"), F.count("*").alias("sz"))
        )
        active = lab.filter(_active(F.col("id"), r))
        inactive = lab.filter(~_active(F.col("id"), r))
        # weight from each ACTIVE node to each neighboring community —
        # the src-side activation filter halves the round's one big
        # exchange (the groupBy rollup below)
        kvc = (
            adj.filter(_active(F.col("src"), r))
            .join(lab.select(F.col("id").alias("dst"), F.col("c")), "dst")
            .groupBy(F.col("src").alias("id"), "c")
            .agg(F.sum("w").alias("k"))
        )
        # every active node always has its own community as a candidate
        cand = (
            kvc.unionByName(
                active.select("id", "c", F.lit(0).cast(kvc.schema["k"].dataType).alias("k"))
            )
            .groupBy("id", "c")
            .agg(F.sum("k").alias("k"))
            .repartition(num_part, "id")
        )
        scored = (
            cand.join(active.withColumnRenamed("c", "own"), "id")
            .join(degp, "id")
            .join(stats, "c")
            .join(
                stats.select(F.col("c").alias("own"), F.col("sz").alias("_own_sz")),
                "own",
            )
            # Grappolo swap prevention: singleton -> larger-id singleton
            # moves are barred (own candidate row survives: c > own false)
            .filter(
                ~(
                    (F.col("_own_sz") == 1)
                    & (F.col("sz") == 1)
                    & (F.col("c") > F.col("own"))
                )
            )
            .select(
                "id",
                "c",
                (
                    F.lit(2) * F.lit(m) * F.col("k")
                    - F.col("deg")
                    * (F.col("sig") - F.when(F.col("c") == F.col("own"), F.col("deg")).otherwise(F.lit(0)))
                ).alias("gain2m"),
                (F.col("c") == F.col("own")).cast("int").alias("is_own"),
            )
        )
        moved = scored.groupBy("id").agg(
            F.expr("max_by(c, struct(gain2m, is_own, -c))").alias("c")
        )
        new_labels = moved.unionByName(inactive)
        # hard lineage cut per round (plans/superstep.py rationale): keeps
        # the per-round plan flat instead of a persist-only chain
        labels = lineage_cut(new_labels.repartition(num_part, "id"), eager=True)
    adj.unpersist()
    degp.unpersist()
    return labels


def _relabel_min_member(labels: DataFrame) -> DataFrame:
    """Communities renamed to their MIN member id (stable, portable)."""
    rep = labels.groupBy("c").agg(F.min("id").alias("_rep"))
    return labels.join(rep, "c").select("id", F.col("_rep").alias("c"))


def _contract_by(G, mapping: DataFrame, integral: bool) -> DataFrame:
    """Super-graph of the ORIGINAL edges under ``mapping`` (id, c):
    one canonical (src<=dst) row per community pair, intra-community
    weight folded into self-loops.  Contracting from level 0 each time
    (instead of iteratively) is associative-weight-sum identical and
    makes every level a pure function of (G, mapping) — which is what
    lets resume rebuild any level from the checkpointed mapping alone."""
    wcol = (
        F.col("weight").cast("long" if integral else "double")
        if "weight" in G.edges.columns
        else F.lit(1).cast("long" if integral else "double")
    )
    e = G.edges.select("src", "dst", wcol.alias("w"))
    cu = mapping.select(F.col("id").alias("src"), F.col("c").alias("_cu"))
    cv = mapping.select(F.col("id").alias("dst"), F.col("c").alias("_cv"))
    return (
        e.join(cu, "src")
        .join(cv, "dst")
        .select(
            F.least("_cu", "_cv").alias("src"),
            F.greatest("_cu", "_cv").alias("dst"),
            "w",
        )
        .groupBy("src", "dst")
        .agg(F.sum("w").alias("weight"))
    )


def louvain_communities(
    G,
    rounds: int = 12,
    levels: int = 4,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 1,
    resume: bool = False,
) -> DataFrame:
    """(id: long, community: long) — community = MIN member node id.

    Deterministic multilevel Louvain as pinned in the module docstring.
    ``rounds`` local-moving sweeps per level, ``levels`` contraction
    levels.  Integral edge weights (or unweighted) keep the gain argmax
    in exact BIGINT arithmetic end-to-end — including contracted
    levels, whose weights are sums of level-0 weights.

    Checkpoint/resume: the node->community mapping is durably written
    at every level boundary; resume rebuilds the contracted super-graph
    from (original edges, mapping) and continues with the next level —
    results are bit-identical to an uninterrupted run.
    """
    spark = G.spark
    num_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    integral = True
    if G.weighted:
        wtype = dict(G.edges.dtypes)["weight"]
        integral = wtype in ("bigint", "int", "smallint", "tinyint")

    harness = Superstep(spark, checkpoint_dir, checkpoint_every)
    mapping: DataFrame | None = None  # orig id -> community (super-node id)
    start_level = 0
    if resume and checkpoint_dir is not None:
        got = harness.latest()
        if got is not None:
            start_level, mapping = got[0] + 1, got[1].select("id", "c")
    for level in range(start_level, levels):
        if mapping is None:
            sym, deg, m = _weighted_parts(G.edges, integral)
            nodes = G.nodes.select("id")
        else:
            super_edges = _contract_by(G, mapping, integral).persist()
            sym, deg, m = _weighted_parts(super_edges, integral)
            nodes = mapping.select(F.col("c").alias("id")).distinct().persist()
        if m == 0:
            break
        lab = _relabel_min_member(
            _move_rounds(spark, sym, deg, nodes, m, rounds, num_part, level=level)
        ).persist()
        lab.count()
        if mapping is None:
            new_map = lab
        else:
            new_map = (
                mapping.select("id", F.col("c").alias("_mc"))
                .join(
                    lab.select(F.col("id").alias("_mc"), F.col("c").alias("_nc")),
                    "_mc",
                )
                .select("id", F.col("_nc").alias("c"))
            )
        new_map = harness.materialize(
            new_map, level, {"kernel": "louvain", "level": level}, eager=True
        )
        # fixed point: an unchanged mapping reproduces itself on every
        # further level (same super-graph -> same deterministic moves),
        # so stopping here cannot change the output
        if mapping is not None:
            changed = (
                new_map.withColumnRenamed("c", "_new")
                .join(mapping, "id")
                .filter(F.col("_new") != F.col("c"))
                .limit(1)
                .count()
            )
            mapping = new_map
            if changed == 0:
                break
        else:
            mapping = new_map
    if mapping is None:  # empty graph: every node is its own community
        return G.nodes.select("id", F.col("id").alias("community"))
    return mapping.select("id", F.col("c").alias("community"))


def louvain_move_phase(G, rounds: int = 8) -> DataFrame:
    """(id, community) after one level of local moving (no contraction),
    communities relabeled to MIN member id.  The oracle-pinned form."""
    spark = G.spark
    num_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    integral = True
    if G.weighted:
        integral = dict(G.edges.dtypes)["weight"] in ("bigint", "int", "smallint", "tinyint")
    sym, deg, m = _weighted_parts(G.edges, integral)
    if m == 0:
        return G.nodes.select("id", F.col("id").alias("community"))
    lab = _move_rounds(spark, sym, deg, G.nodes.select("id"), m, rounds, num_part)
    return _relabel_min_member(lab).select("id", F.col("c").alias("community"))
