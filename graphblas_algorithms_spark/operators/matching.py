"""Maximal matching — parallel locally-dominant edges, deterministic.

Not in the reference (graphblas-algorithms has no matching kernel);
added as the third classic symmetry-breaking primitive next to Luby
MIS and speculative coloring (operators/mis.py) — matching IS the MIS
of the line graph, and the dominant-edge scheme (Preis 1999 /
Manne-Bisseling 2007) computes it without materializing the line
graph: each round, an edge whose priority is the minimum among ALL
live edges touching either endpoint joins the matching; both endpoints
retire and every incident edge dies.

Determinism: edge priority = md5(seed|src|dst) on the canonical
(src < dst) edge, suffixed with '|src|dst' so priorities are globally
UNIQUE strings — the lexicographic min is strict in every engine, no
RNG, no ties.  The result is a pure function of (graph, seed); the
driver oracle (`graph_matching`) unrolls the same rounds in DuckDB SQL
and hash-matches the emitted edge set.

Scale shape: identical currency to MIS — per round one explode +
min-agg over live edges (O(nnz(live)) map-side-combinable shuffle)
plus two anti-joins against the matched-node set; the global-min edge
always wins, and with random-oracle priorities the live edge set
shrinks geometrically (Luby's analysis on the line graph), so the
round count is O(log m) independent of diameter.  Every round is
lineage-cut so the plan stays flat (plans/superstep.py rationale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.superstep import lineage_cut


def maximal_matching(G, seed: int = 42, max_rounds: int = 64) -> DataFrame:
    """(src: long, dst: long) — a maximal matching (src < dst rows),
    deterministic in (G, seed).  No two output edges share an endpoint;
    every non-self-loop edge of G has a matched endpoint (maximality).
    Self-loops are ignored (a node cannot match itself).  Raises if
    ``max_rounds`` is hit (never observed beyond ~2 log2 m rounds).
    """
    pri = F.concat_ws(
        "|",
        F.md5(F.concat_ws("|", F.lit(int(seed)), F.col("src"), F.col("dst"))),
        F.col("src"),
        F.col("dst"),
    )
    live = (
        G.get_property("U_minus")
        .select("src", "dst")
        .withColumn("pri", pri)
        .transform(lineage_cut)
        .persist()
    )
    matching = None
    done = live.limit(1).count() == 0
    rounds = 0
    while not done and rounds < max_rounds:
        rounds += 1
        # min live-edge priority per endpoint: one both-direction explode
        # + map-side-combinable min agg (the round's one big exchange)
        node_min = (
            live.select(F.col("src").alias("id"), "pri")
            .unionByName(live.select(F.col("dst").alias("id"), "pri"))
            .groupBy("id")
            .agg(F.min("pri").alias("_minp"))
        )
        # locally dominant: the edge is the min at BOTH endpoints
        # (priorities are unique strings, so min == strict min)
        won = (
            live.join(
                node_min.select(F.col("id").alias("src"), F.col("_minp").alias("_ms")),
                "src",
            )
            .join(
                node_min.select(F.col("id").alias("dst"), F.col("_minp").alias("_md")),
                "dst",
            )
            .filter((F.col("pri") == F.col("_ms")) & (F.col("pri") == F.col("_md")))
            .select("src", "dst")
            .transform(lineage_cut)
            .persist()
        )
        matching = (
            won if matching is None else matching.unionByName(won).transform(lineage_cut)
        )
        # retire both endpoints: every edge touching a matched node dies
        matched_ids = (
            won.select(F.col("src").alias("id"))
            .unionByName(won.select(F.col("dst").alias("id")))
            .distinct()
        )
        nxt = (
            live.join(matched_ids.withColumnRenamed("id", "src"), "src", "left_anti")
            .join(matched_ids.withColumnRenamed("id", "dst"), "dst", "left_anti")
            .transform(lineage_cut)
            .persist()
        )
        live.unpersist()
        live = nxt
        done = live.limit(1).count() == 0
    live.unpersist()
    if not done:
        raise RuntimeError(f"maximal_matching did not converge in {max_rounds} rounds")
    if matching is None:
        return G.edges.select("src", "dst").limit(0)
    return matching.select("src", "dst")


def matching_number_lower_bound(G, seed: int = 42) -> float:
    """|maximal matching| — a deterministic >= 1/2 approximation of the
    maximum matching size (any maximal matching is a 2-approximation)."""
    return float(maximal_matching(G, seed=seed).count())


def min_vertex_cover_2approx(G, seed: int = 42) -> DataFrame:
    """(id: long) — the endpoints of a maximal matching: a vertex cover
    at most 2x the minimum (Gavril/Yannakakis).  Cover: a live edge with
    neither endpoint in the set would contradict the matching's
    maximality.  2-approx: the matching's edges are disjoint, so ANY
    cover needs one node per matched edge, |cover| = 2|M| <= 2 OPT.
    Deterministic in (G, seed); one extra union+distinct over the
    matching result — scale currency identical to maximal_matching."""
    m = maximal_matching(G, seed=seed)
    return (
        m.select(F.col("src").alias("id"))
        .unionByName(m.select(F.col("dst").alias("id")))
        .distinct()
    )


def coarsen_graph(G, seed: int = 42, max_rounds: int = 64):
    """(coarse_edges, node_map) — one multilevel-coarsening step: contract
    every edge of the deterministic maximal matching into a supernode
    (the matched pair's lower id), relabel the edge list, and merge
    parallel edges into an integer ``weight`` (the classic heavy-edge /
    Metis-style V-cycle step, and Louvain's inter-level contraction).

    ``coarse_edges``: (src, dst, weight) canonical, self-loops dropped;
    ``node_map``: (id, rep) for EVERY node of G (unmatched nodes map to
    themselves), so levels compose by joining maps.

    Scale shape: the matching is O(log m) supersteps (see
    ``maximal_matching``); contraction itself is two node-keyed hash
    joins of the edge list against the <= n/2-row map plus one
    map-side-combinable count agg — the same currency as one pagerank
    superstep, and a matching contracts >= 1/2 of the non-isolated
    nodes per level, so the level count to any target size is
    logarithmic.  Deterministic in (G, seed): the map, the coarse edge
    set, and the weights are pure functions of them (the DuckDB oracle
    replays all of it)."""
    m = maximal_matching(G, seed=seed, max_rounds=max_rounds)
    mapping = m.select(F.col("dst").alias("id"), F.col("src").alias("rep"))
    e = G.get_property("U_minus").select("src", "dst")
    ma = mapping.select(F.col("id").alias("src"), F.col("rep").alias("_ra"))
    mb = mapping.select(F.col("id").alias("dst"), F.col("rep").alias("_rb"))
    rel = (
        e.join(ma, "src", "left")
        .join(mb, "dst", "left")
        .select(
            F.coalesce("_ra", F.col("src")).alias("a"),
            F.coalesce("_rb", F.col("dst")).alias("b"),
        )
    )
    coarse = (
        rel.filter(F.col("a") != F.col("b"))
        .select(F.least("a", "b").alias("src"), F.greatest("a", "b").alias("dst"))
        .groupBy("src", "dst")
        .agg(F.count("*").alias("weight"))
    )
    node_map = (
        G.nodes.join(mapping, "id", "left")
        .select("id", F.coalesce("rep", F.col("id")).alias("rep"))
    )
    return coarse, node_map
