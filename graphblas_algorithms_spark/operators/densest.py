"""Densest subgraph — 2(1+eps)-approx greedy peeling (Bahmani et al.).

Engine extension: not in the reference (graphblas-algorithms has no
dense-subgraph primitive), but densest-subgraph extraction is a staple
on web/link graphs (link-spam farms, mutual-citation cliques, community
cores — the k_core/k_truss family's optimization-flavored sibling).
The sequential exact/greedy algorithms (max-flow; Charikar's one-node-
at-a-time peel) do not distribute, so we pin the MapReduce variant of
Bahmani, Kumar & Vassilvitskii, "Densest Subgraph in Streaming and
MapReduce" (PVLDB 5(5), 2012): repeatedly delete EVERY node whose
degree is at most 2(1+eps) times the current average density rho =
|E(S)|/|S|; the best-density snapshot over all rounds is a 2(1+eps)-
approximation of the maximum-density subgraph, and the node count
shrinks by a (1+eps) factor per round, so O(log_{1+eps} n) rounds
total — the same diameter-independent round shape as Luby MIS and the
SCC trim.

Determinism / oracle portability: eps is pinned as a RATIONAL
(eps_num/eps_den), so the per-node survive test

    deg_S(v) * |S| * eps_den  >  2 * (eps_den + eps_num) * |E(S)|

is exact BIGINT arithmetic in both Spark and DuckDB (no float
threshold).  Snapshot ranking uses density = m/n in DOUBLE: IEEE
division is correctly rounded, so equal true ratios produce identical
doubles in every engine — ties broken toward the EARLIEST round.
The driver oracle (`graph_densest`) unrolls the same peel in SQL.

Scale shape per round (same discipline as kcore.py's peel): one
degree groupBy over the live edges + two semi-joins to induce the
surviving subgraph + two tiny counts — all on a geometrically
shrinking edge set, lineage hard-cut and retired rounds released.
Peeled nodes are recorded as (id, round) increments (O(n) rows total
across the whole run), so reconstructing the best snapshot is one
filter, not a replay.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.superstep import _release_state, lineage_cut


def densest_subgraph(
    G,
    eps_num: int = 1,
    eps_den: int = 10,
    max_rounds: int = 400,
    return_stats: bool = False,
):
    """(id: long) — the node set of the best-density peel snapshot; a
    2(1+eps)-approximation of the densest subgraph with eps =
    eps_num/eps_den.  ``return_stats=True`` additionally returns the
    per-round [(round, n, m, density), ...] trace.

    Snapshot r=0 is (V, E) itself; round r >= 1 drops every node with
    deg * n * eps_den <= 2*(eps_den+eps_num) * m in snapshot r-1 (a
    node with no live edge counts degree 0, so isolates go in round 1).
    Peeling always reaches the empty set: survivors per round number
    < n/(1+eps) while edges remain, and the first edgeless snapshot
    clears in one more round.
    """
    if eps_num <= 0 or eps_den <= 0:
        raise ValueError("eps must be a positive rational eps_num/eps_den")
    coef = 2 * (eps_den + eps_num)

    nodes = G.nodes.select("id")
    edges = G.get_property("offdiag").select("src", "dst").transform(lineage_cut)
    n = nodes.count()
    m = edges.count()

    if max(n * n * eps_den, coef * m) >= 2**63:
        # deg <= n, so deg * n * eps_den <= n^2 * eps_den bounds the
        # exact cross-multiply; past int64 use a coarser eps_den
        raise ValueError(
            f"exact BIGINT threshold overflows int64 at n={n}, "
            f"eps_den={eps_den}; reduce eps_den (coarser eps granularity)"
        )
    live = nodes  # snapshot r's node set
    stats = [(0, n, m, (m / n) if n else 0.0)]
    removed_parts: list[DataFrame] = []  # (id, round) increments
    r = 0
    while n > 0 and r < max_rounds:
        r += 1
        # survivors: degree (over live edges) strictly above the
        # 2(1+eps)*rho bar, in exact BIGINT cross-multiplied form
        deg = (
            edges.select(F.col("src").alias("id"))
            .unionByName(edges.select(F.col("dst").alias("id")))
            .groupBy("id")
            .agg(F.count("*").alias("_d"))
        )
        # thresholds pre-multiplied in Python: exact bigint arithmetic,
        # and F.lit() promotes to LongType when the product exceeds int32
        # (coef * m overflows a 32-bit literal multiply at ~100M edges)
        keep = (
            deg.filter(
                F.col("_d") * F.lit(n * eps_den) > F.lit(coef * m)
            )
            .select("id")
            .transform(lineage_cut)
        )
        removed_parts.append(
            live.join(keep, "id", "left_anti")
            .select("id", F.lit(r).alias("_round"))
            .transform(lineage_cut)
        )
        kept_edges = (
            edges.join(keep.withColumnRenamed("id", "src"), "src", "left_semi")
            .join(keep.withColumnRenamed("id", "dst"), "dst", "left_semi")
            .select("src", "dst")
            .transform(lineage_cut)
        )
        n2, m2 = keep.count(), kept_edges.count()
        _release_state(edges)
        _release_state(live)
        live, edges, n, m = keep, kept_edges, n2, m2
        if n > 0:
            stats.append((r, n, m, m / n))

    # best snapshot: max density, ties to the earliest round (IEEE
    # correctly-rounded division makes this ranking engine-portable)
    best_r = max(stats, key=lambda s: (s[3], -s[0]))[0]
    removal = reduce(DataFrame.unionByName, removed_parts, live.select(
        "id", F.lit(r + 1).alias("_round")
    ))
    out = removal.filter(F.col("_round") > best_r).select("id")
    if return_stats:
        return out, stats
    return out
