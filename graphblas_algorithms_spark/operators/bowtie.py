"""Bow-tie macro-structure of a directed graph (Broder et al., "Graph
structure in the Web", WWW 2000).

Engine extension — THE whole-graph summary for web-scale link graphs:
every node lands in exactly one region relative to the giant SCC,

* CORE     — the largest strongly connected component,
* IN       — reaches CORE but isn't in it,
* OUT      — reachable from CORE but isn't in it,
* TUBE     — on an IN -> OUT path that bypasses CORE,
* TENDRIL  — hangs off IN (forward) or into OUT (backward), no CORE
             contact,
* DISC     — everything else (other weak components).

Composition of kernels the engine already certifies: one SCC labeling
(operators/components.py, north-star kernel) + four delta-frontier
reachability sweeps seeded by SETS (CORE forward/backward, IN forward,
OUT backward) — each sweep the same O(nnz)-total BFS the scaling
evidence prices.  Deterministic: the core is the largest SCC with
min-label tie-break.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.superstep import _release_state, lineage_cut


def _reach_from(edges: DataFrame, seeds: DataFrame) -> DataFrame:
    """(id) — nodes reachable from the seed SET over ``edges`` (seeds
    included); delta-frontier, O(nnz) total."""
    # the initial visited OWNS its blocks via lineage_cut: _release_state
    # on a plain persist would leaf-walk into the SEEDS' lineage and free
    # checkpoint blocks still owned by the caller (e.g. the SCC parts)
    visited = seeds.select("id").distinct().transform(lineage_cut).persist()
    frontier = visited
    while frontier.limit(1).count() > 0:
        nxt = (
            edges.join(frontier.withColumnRenamed("id", "src"), "src", "left_semi")
            .select(F.col("dst").alias("id"))
            .distinct()
            .join(visited, "id", "left_anti")
            .transform(lineage_cut)
            .persist()
        )
        if frontier is not visited:
            _release_state(frontier)
        frontier = nxt
        prev_visited = visited
        visited = visited.unionByName(frontier).transform(lineage_cut).persist()
        _release_state(prev_visited)
    if frontier is not visited:
        _release_state(frontier)
    return visited


def bowtie_structure(G, scc: DataFrame | None = None) -> DataFrame:
    """(id, region) — region in {CORE, IN, OUT, TUBE, TENDRIL, DISC}.
    Pass a precomputed ``strongly_connected_components`` labeling to
    skip recomputation."""
    own_scc = scc is None
    if own_scc:
        from .components import strongly_connected_components

        scc = strongly_connected_components(G)
    edges = G.edges.select("src", "dst").persist()
    redges = edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))

    sizes = scc.groupBy("component").agg(F.count(F.lit(1)).alias("_n"))
    core_label = sizes.orderBy(F.desc("_n"), F.asc("component")).limit(1)
    core = scc.join(
        core_label.select("component"), "component", "left_semi"
    ).select("id").persist()

    fwd = _reach_from(edges, core).persist()      # CORE + OUT
    bwd = _reach_from(redges, core).persist()     # CORE + IN
    out_r = fwd.join(core, "id", "left_anti").persist()
    in_r = bwd.join(core, "id", "left_anti").persist()

    # tendril sweeps: forward from IN, backward from OUT, minus the
    # already-classified regions
    known = core.unionByName(out_r).unionByName(in_r).persist()
    in_reach = _reach_from(edges, in_r)
    out_reach = _reach_from(redges, out_r)
    t_fwd = in_reach.join(known, "id", "left_anti").persist()
    t_bwd = out_reach.join(known, "id", "left_anti").persist()
    tube = t_fwd.join(t_bwd, "id", "left_semi")

    tagged = (
        core.select("id", F.lit("CORE").alias("region"))
        .unionByName(in_r.select("id", F.lit("IN").alias("region")))
        .unionByName(out_r.select("id", F.lit("OUT").alias("region")))
        .unionByName(tube.select("id", F.lit("TUBE").alias("region")))
        .unionByName(
            t_fwd.unionByName(t_bwd)
            .distinct()
            .join(tube, "id", "left_anti")
            .select("id", F.lit("TENDRIL").alias("region"))
        )
    )
    out = G.nodes.join(tagged, "id", "left").select(
        "id", F.coalesce("region", F.lit("DISC")).alias("region")
    )
    # materialize before releasing every cached intermediate (same
    # per-round-release discipline as the SCC kernel, components.py) —
    # repeated calls must not accumulate block-manager state.
    out = lineage_cut(out)
    # lineage_cut-owned sweeps release through their checkpoints; the
    # plain persists get bare unpersist() — their plan leaves include LIVE
    # checkpoints (scc parts, sweep frames) that _release_state's leaf
    # walk would free out from under a caller-supplied scc
    for df in (fwd, bwd, in_reach, out_reach):
        _release_state(df)
    for df in (edges, core, out_r, in_r, known, t_fwd, t_bwd):
        df.unpersist()
    if own_scc:
        _release_state(scc)
    return out
