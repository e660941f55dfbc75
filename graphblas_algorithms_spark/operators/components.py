"""Connected components & reachability kernels.

The reference only has single-source reachability BFS
(``algorithms/_bfs.py:15-45``, ``components/connected.py:5-12``,
``weakly_connected.py:5-8``); the north_rule additionally requires a
full per-vertex component labeling — implemented here as min-label
propagation with a delta frontier (SURVEY §2.2 "[N] connected
components"), converging in O(diameter) supersteps with shrinking
shuffles (O7 frontier-delta).

Exactness: labels are min node id per component — integer ops +
deterministic min only, so results are exact and reproducible.

Strongly connected components (north_star names them) use the classic
distributed forward-backward coloring: propagate max id forward within
the active subgraph to a fixpoint, then nodes that reach their color
root backwards within the same color form an SCC; peel and repeat.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.joins import edge_join
from ..plans.superstep import lineage_cut, Superstep, _release_state


def _sym_adj(G) -> DataFrame:
    """Undirected/bidirectional adjacency (both directions, no weights)."""
    return G.get_property("sym_edges").select("src", "dst")


def connected_components(
    G,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 1,
    resume: bool = False,
    method: str = "minlabel",
) -> DataFrame:
    """(id: long, component: long); component = min node id reachable.

    Works on Graph (connected components) and DiGraph (WEAKLY connected:
    edges symmetrized first, matching ``digraph.py:604-612`` +
    ``weakly_connected.py:5-8`` semantics).

    ``method="minlabel"`` (default) is O(diameter) rounds at one shuffle
    per round — right for low-diameter link graphs.  ``method="star"``
    dispatches to :func:`connected_components_star`: O(log n) rounds at
    ~3 shuffles per round, diameter-independent.
    """
    if method == "star":
        return connected_components_star(
            G, checkpoint_dir, checkpoint_every, resume
        )
    if method != "minlabel":
        raise ValueError(f"unknown method {method!r}: use 'minlabel' or 'star'")
    spark = G.spark
    adj = _sym_adj(G).persist()
    labels = G.nodes.select("id", F.col("id").alias("component"))

    harness = Superstep(spark, checkpoint_dir, checkpoint_every)
    start_iter = 0
    frontier = labels
    if resume and checkpoint_dir is not None:
        got = harness.latest()
        if got is not None:
            start_iter, labels = got[0] + 1, got[1]
            frontier = labels  # conservative: re-propagate all current labels once
    else:
        labels = labels.persist()

    it = start_iter
    while True:
        # candidate labels: min over incoming frontier labels (P1 min_first)
        cand = edge_join(frontier, adj).groupBy("id").agg(
            F.min("component").alias("_cand")
        )
        improved = (
            cand.join(labels.withColumnRenamed("component", "_cur"), "id")
            .filter(F.col("_cand") < F.col("_cur"))
            .select("id", F.col("_cand").alias("component"))
        )
        # frontier AND labels cross-reference each other, so without a hard
        # plan cut every superstep the lineage tree grows exponentially
        # (Fibonacci-style); localCheckpoint truncates it in the same action
        improved = improved.transform(lineage_cut)
        n_improved = improved.count()
        if n_improved == 0:
            improved.unpersist()
            break
        new_labels = (
            labels.join(improved.withColumnRenamed("component", "_new"), "id", "left")
            .select("id", F.coalesce("_new", "component").alias("component"))
        )
        labels = harness.materialize(
            new_labels, it, {"kernel": "components", "improved": n_improved}
        )
        frontier = improved
        it += 1
    harness_result = labels.select("id", "component")
    adj.unpersist()
    return harness_result


def _star_round(edges: DataFrame, large: bool) -> DataFrame:
    """One large-star or small-star contraction round (Kiveris et al.,
    "Connected Components in MapReduce and Beyond", SoCC 2014, Alg. 2).

    ``edges`` is an undirected edge set, one row per edge in arbitrary
    orientation.  Per node u with neighborhood G(u) and
    m = min(G(u) + {u}):

    * large-star emits (v, m) for every neighbor v > u — hooks every
      heavy endpoint onto its neighborhood minimum;
    * small-star emits (v, m) for every neighbor v <= u plus (u, m)
      itself — collapses chains onto local minima.

    Both keep the second column pointing at the (eventual) component
    minimum, so the fixpoint is a disjoint union of stars centered at
    each component's min node id.  Plan shape per round: one shuffle to
    group by u (min agg is map-side combined), the m-join reuses that
    partitioning, one distinct on the emitted set to keep it bounded."""
    sym = edges.unionByName(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    # shuffle-byte accounting per phase (explain-verified): the min agg
    # is map-side combined, so its exchange moves only per-task minima
    # (~|V| rows, hubs pre-reduced); the join moves sym once (~2m rows,
    # ENSURE_REQUIREMENTS, so AQE skew-split stays eligible); the output
    # distinct moves the emitted set.  A repartition("u")-first variant
    # measures worse: Catalyst does not reuse the exchange across the
    # agg and join consumers, so sym shuffles twice at full width.
    mins = sym.groupBy("u").agg(F.least(F.min("v"), F.col("u")).alias("m"))
    j = sym.join(mins, "u")
    if large:
        out = j.filter(F.col("v") > F.col("u")).select(
            F.col("v").alias("u"), F.col("m").alias("v")
        )
    else:
        out = j.filter(F.col("v") <= F.col("u")).select(
            F.col("v").alias("u"), F.col("m").alias("v")
        ).unionByName(mins.select("u", F.col("m").alias("v")))
    return out.filter(F.col("u") != F.col("v")).distinct()


def connected_components_star(
    G,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 1,
    resume: bool = False,
    stats: dict | None = None,
    max_rounds: int = 200,
) -> DataFrame:
    """(id: long, component: long) by alternating star contraction —
    identical output contract to :func:`connected_components` (component
    = min node id), but O(log n) rounds INDEPENDENT of graph diameter.

    Min-label propagation needs O(diameter) supersteps: fine on web/link
    graphs (diameter ~20), catastrophic on chain- or mesh-shaped
    dependency graphs (a 2M-node path needs 2M rounds).  Star
    contraction hooks whole subtrees per round, so a path collapses in
    ~log2(n) alternations.  The per-round cost is ~3 shuffles vs
    min-label's 1, so min-label stays the default for low-diameter
    graphs; pick this variant when diameter is unknown or large
    (``connected_components(method="star")`` dispatches here).

    The edge set is the iterated state: checkpointed through the same
    Superstep harness (lineage cut per round, resumable mid-run).
    Convergence = (count, xor of row hashes) unchanged over a full
    large+small alternation — one 1-row agg action per phase.
    """
    spark = G.spark
    harness = Superstep(spark, checkpoint_dir, checkpoint_every)
    edges = (
        G.get_property("offdiag")
        .select(F.col("src").alias("u"), F.col("dst").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .transform(lineage_cut)
    )
    start_iter = 0
    if resume and checkpoint_dir is not None:
        got = harness.latest()
        if got is not None:
            start_iter = got[0] + 1
            edges = got[1].select("u", "v")

    def _sig(df: DataFrame) -> tuple:
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            # xor-fold is order-independent, map-side combined, O(1) state
            F.coalesce(F.expr("bit_xor(xxhash64(u, v))"), F.lit(0)).alias("h"),
        ).collect()[0]
        return (row["n"], row["h"])

    sig = _sig(edges)
    rounds = 0
    it = start_iter
    while rounds < max_rounds:
        changed = False
        for large in (True, False):
            # lazy cut: the _sig agg is the ONE job that both computes
            # the new edge set into its checkpoint blocks and reads the
            # convergence signature (O12 single-action superstep); a
            # durable harness checkpoint replaces the cut when configured
            nxt = _star_round(edges, large)
            if harness.dir is not None:
                nxt = harness.materialize(
                    nxt,
                    it,
                    {"kernel": "components_star",
                     "phase": "large" if large else "small"},
                )
            else:
                nxt = lineage_cut(nxt, eager=False)
            nsig = _sig(nxt)
            _release_state(edges)
            edges = nxt
            it += 1
            if nsig != sig:
                changed = True
            sig = nsig
        rounds += 1
        if not changed:
            break
    else:
        # never exit the alternation on the round cap with a possibly
        # non-star edge set: labels derived from it would be silently
        # wrong (log2-ish convergence means 200 rounds ~ graphs beyond
        # 2^100 nodes — hitting this is a bug or adversarial input)
        raise RuntimeError(
            f"star contraction did not converge within {max_rounds} rounds"
        )
    if stats is not None:
        stats["rounds"] = rounds
        stats["supersteps"] = it - start_iter
    labels = (
        G.nodes.join(
            edges.groupBy(F.col("u").alias("id")).agg(
                F.min("v").alias("_comp")
            ),
            "id",
            "left",
        )
        .select("id", F.coalesce("_comp", F.col("id")).alias("component"))
    )
    out = labels.transform(lineage_cut)
    _release_state(edges)
    return out


def bfs_reach(G, source: int, transpose: bool = False) -> DataFrame:
    """Reachability set as (id) DataFrame — ``_bfs_plain``
    (``algorithms/_bfs.py:15-45``): frontier loop with complement-mask
    (left-anti join) visited set."""
    adj = (
        G.edges.select("src", "dst")
        if G.is_directed_flag
        else G.get_property("sym_edges").select("src", "dst")
    )
    if transpose:
        adj = adj.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    adj = adj.persist()
    spark = G.spark
    visited = spark.createDataFrame([(int(source),)], "id long").persist()
    frontier = visited
    while True:
        nxt = (
            edge_join(frontier, adj)
            .distinct()
            .join(visited, "id", "left_anti")  # q(~v.S, replace) — _bfs.py:39
            .persist()
        )
        if nxt.count() == 0:
            nxt.unpersist()
            break
        visited = visited.unionByName(nxt).persist()
        visited.count()
        frontier = nxt
    adj.unpersist()
    return visited


def is_connected(G) -> bool:
    """BFS from an arbitrary node covers all n (``connected.py:5-8``)."""
    first = G.nodes.orderBy("id").limit(1).collect()
    if not first:
        from ..exceptions import PointlessConcept

        raise PointlessConcept("connectivity undefined for the null graph")
    return bfs_reach(G, first[0]["id"]).count() == G.n


def is_weakly_connected(G) -> bool:
    """``weakly_connected.py:5-8``: BFS over A | A.T without symmetrizing
    the stored graph."""
    H = _WeakView(G)
    return is_connected(H)


class _WeakView:
    """Lightweight undirected view over a DiGraph (bidirectional BFS edges,
    reference ``_bfs.py:141-178`` avoids materializing the symmetrized
    graph; our sym view is a lazy DataFrame anyway)."""

    is_directed_flag = False

    def __init__(self, G):
        self._G = G
        self.spark = G.spark
        self.nodes = G.nodes
        self.n = G.n

    def get_property(self, name: str) -> DataFrame:
        assert name == "sym_edges"
        return self._G.get_property("sym_edges")


def node_connected_component(G, source: int) -> DataFrame:
    """(id) — reachability set (``connected.py:11-12``)."""
    return bfs_reach(G, source)


def number_connected_components(G) -> int:
    return connected_components(G).select("component").distinct().count()


def _scc_trim(edges, active, parts, max_trim_rounds: int = 64) -> DataFrame:
    """Bulk-peel trivial SCCs: any active node with no in-edge or no
    out-edge inside the active subgraph is its own SCC (it cannot sit on a
    cycle).  Iterated to a (bounded) fixpoint, this collapses DAG-like
    regions — the many-small-SCC worst case — in O(1) cheap jobs per
    layer instead of a full forward-backward fixpoint per SCC batch."""
    for _ in range(max_trim_rounds):
        act_edges = (
            edges.join(active.withColumnRenamed("id", "src"), "src", "left_semi")
            .join(active.withColumnRenamed("id", "dst"), "dst", "left_semi")
        )
        have_out = act_edges.select(F.col("src").alias("id")).distinct()
        have_in = act_edges.select(F.col("dst").alias("id")).distinct()
        nontrivial = (
            active.join(have_out, "id", "left_semi")
            .join(have_in, "id", "left_semi")
            .transform(lineage_cut)
        )
        n_active = active.count()
        n_nontrivial = nontrivial.count()
        if n_nontrivial == n_active:
            _release_state(nontrivial)
            break
        trivial = active.join(nontrivial, "id", "left_anti").select(
            "id", F.col("id").alias("component")
        )
        parts.append(trivial.transform(lineage_cut))
        _release_state(active)
        active = nontrivial
        if n_nontrivial == 0:
            break
    return active


def strongly_connected_components(
    G, max_rounds: int = 100, trim: bool = True, stats: dict | None = None
) -> DataFrame:
    """(id: long, component: long) with component = min node id in SCC.

    Forward-backward coloring, peeling one batch of SCCs per round, with a
    bulk trivial-SCC trim (degree-0 in the active subgraph) before each round.
    Not in the reference (north_star requires it).  All per-round state
    (color / reached / active / act_edges) is released when the round
    retires — nothing accumulates in the block manager across rounds.

    ``stats`` (optional dict, filled in place) records scale evidence:
    ``rounds`` (peel rounds run), ``active_per_round`` (node count entering
    each round, post-trim), ``rdd_storage_per_round`` (block-manager entry
    count at each round boundary — must stay flat; the r2 hardening is
    exactly that nothing leaks across rounds).
    """
    spark = G.spark
    edges = G.edges.select("src", "dst").persist()
    active = G.nodes.select("id").transform(lineage_cut)
    parts: list[DataFrame] = []  # (id, component) batches

    def _n_rdd_blocks() -> int:
        try:
            return len(list(spark.sparkContext._jsc.sc().getRDDStorageInfo()))
        except Exception:
            return -1

    for round_idx in range(max_rounds):
        if trim:
            active = _scc_trim(edges, active, parts)
        n_active = active.count()
        if stats is not None:
            stats["rounds"] = round_idx
            stats.setdefault("active_per_round", []).append(n_active)
            stats.setdefault("rdd_storage_per_round", []).append(_n_rdd_blocks())
        if n_active == 0:
            break
        act_edges = (
            edges.join(active.withColumnRenamed("id", "src"), "src", "left_semi")
            .join(active.withColumnRenamed("id", "dst"), "dst", "left_semi")
            .persist()
        )
        # min-id color propagation to fixpoint within the active subgraph.
        # The direction ALTERNATES per round: forward colors = "min id that
        # reaches u", backward colors = "min id u reaches".  Either way the
        # found component label is the SCC's min id (the root r both reaches
        # and is reached by every member found with it), but a chain of
        # small SCCs monotone in node ids smears to ONE class in one
        # direction while staying one-class-per-SCC in the other — the
        # alternation collapses the r1-flagged O(#SCC * diameter) worst
        # case to a couple of rounds.
        if round_idx % 2 == 0:
            color_adj = act_edges
        else:
            color_adj = act_edges.select(
                F.col("dst").alias("src"), F.col("src").alias("dst")
            )
        # color must OWN its checkpoint blocks: _release_state walks the
        # plan's LogicalRDD leaves, so a plain select over `active` would
        # release ACTIVE's blocks when the first color generation retires
        color = (
            active.select("id", F.col("id").alias("color")).transform(lineage_cut)
        )
        frontier = color
        retired_frontier = None
        while True:
            cand = edge_join(frontier, color_adj).groupBy("id").agg(
                F.min("color").alias("_cand")
            )
            # frontier lineage is CUT every superstep: a persisted-only
            # frontier chain retains every generation's nested plan in the
            # cache manager (O(k^2) plan nodes by iteration k — observed as
            # a driver OOM rendering explain strings on deep fixpoints)
            improved = (
                cand.join(color.withColumnRenamed("color", "_cur"), "id")
                .filter(F.col("_cand") < F.col("_cur"))
                .select("id", F.col("_cand").alias("color"))
                .transform(lineage_cut)
            )
            if retired_frontier is not None:
                _release_state(retired_frontier)
                retired_frontier = None
            if improved.count() == 0:
                _release_state(improved)
                break
            new_color = (
                color.join(improved.withColumnRenamed("color", "_new"), "id", "left")
                .select("id", F.coalesce("_new", "color").alias("color"))
                .transform(lineage_cut)
            )
            _release_state(color)
            color = new_color
            if frontier is not color:
                retired_frontier = frontier
            frontier = improved
        if frontier is not color:
            # last productive improved-frontier was never retired (r4 fix:
            # 2 RDDs leaked per peel round through the two inner loops)
            _release_state(frontier)
        # membership BFS from the color roots along same-color edges in the
        # TRANSPOSE of the coloring direction (reached => mutual reach)
        same_color_rev = (
            color_adj.join(color.withColumnRenamed("id", "src").withColumnRenamed("color", "_sc"), "src")
            .join(color.withColumnRenamed("id", "dst").withColumnRenamed("color", "_dc"), "dst")
            .filter(F.col("_sc") == F.col("_dc"))
            .select(F.col("dst").alias("src"), F.col("src").alias("dst"))
            .persist()
        )
        reached = color.filter(F.col("id") == F.col("color")).select("id", "color").transform(lineage_cut)
        frontier = reached
        retired_frontier = None
        while True:
            nxt = (
                edge_join(frontier, same_color_rev, payload=["color"])
                .distinct()
                .join(reached.select("id"), "id", "left_anti")
                .transform(lineage_cut)
            )
            if retired_frontier is not None:
                _release_state(retired_frontier)
                retired_frontier = None
            if nxt.count() == 0:
                _release_state(nxt)
                break
            new_reached = reached.unionByName(nxt).transform(lineage_cut)
            if frontier is not reached:
                retired_frontier = frontier
            _release_state(reached)
            reached = new_reached
            frontier = nxt
        if frontier is not reached:
            # same dangling-frontier release as the coloring loop above
            _release_state(frontier)
        parts.append(
            reached.select("id", F.col("color").alias("component")).localCheckpoint(
                eager=True
            )
        )
        new_active = active.join(reached.select("id"), "id", "left_anti").localCheckpoint(
            eager=True
        )
        # round retires: release everything it pinned
        _release_state(active)
        _release_state(color)
        _release_state(reached)
        act_edges.unpersist()
        same_color_rev.unpersist()
        active = new_active
    edges.unpersist()
    if not parts:
        return G.nodes.select("id", F.col("id").alias("component"))
    result = parts[0]
    for p in parts[1:]:
        result = result.unionByName(p)
    # the union reads the parts' checkpoint blocks; hand ownership to the
    # caller so _release_state(result) frees every part (r4 leak fix)
    result._gas_parts = parts
    return result
