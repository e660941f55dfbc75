"""Landmark (pivot) distance oracle: approximate point-to-point
shortest-path distances at web scale.

Engine extension — the reference answers exact distance queries with a
BFS per source (``algorithms/shortest_paths``); at 10^12 files the
production pattern (Potamias et al. CIKM'09 landmark selection; the
2-hop-cover family it approximates) is to PRECOMPUTE distances from a
few dozen landmarks and answer any (u, v) query from the two cached
rows by the triangle inequality:

    d(u,v) <= min_L d(u,L) + d(L,v)        (upper bound, exact when
                                            some shortest path passes a
                                            landmark)
    d(u,v) >= max_L |d(u,L) - d(L,v)|      (lower bound)

One batched multi-source BFS (the engine's existing
``bfs_levels_multi`` — one frontier join per level serves ALL
landmarks) builds the whole table; queries are two hash-joins against
it, no traversal at query time.  Landmarks default to the top-degree
nodes (min-id tie-break, deterministic), the selection Potamias et al.
measure as near-best on power-law graphs.

Scale shape: the precompute is k-sources O(nnz)-per-level supersteps;
the landmark table is (n x k) rows partitioned by node id; a query
batch of Q pairs costs two broadcast-or-hash joins and one
groupBy(pair) — no per-query BFS, which is the entire point.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def select_landmarks(G, k: int = 16) -> list[int]:
    """Top-k ids by (symmetrized) degree, min-id tie-break —
    deterministic landmark choice."""
    deg = G.get_property("degrees_plus") if not G.is_directed_flag else (
        G.get_property("total_degrees")
    )
    dcol = [c for c in deg.columns if c != "id"][0]
    rows = deg.orderBy(F.desc(dcol), F.asc("id")).limit(k).collect()
    return [int(r["id"]) for r in rows]


def landmark_distance_table(
    G, landmarks: list[int] | None = None, k: int = 16
) -> DataFrame:
    """(id, landmark, dist) — BFS distance from every landmark to every
    reachable node.  Undirected graphs run one batched BFS; digraphs run
    forward AND reverse sweeps and the table carries ``direction``
    ('out': landmark->node, 'in': node->landmark) so queries can compose
    d(u,L,'in') + d(L,v,'out')."""
    if landmarks is None:
        landmarks = select_landmarks(G, k)
    from .traversal import bfs_levels_multi

    fwd = bfs_levels_multi(G, landmarks).select(
        F.col("source").alias("landmark"), "id", F.col("level").alias("dist")
    )
    if not G.is_directed_flag:
        return fwd
    bwd = bfs_levels_multi(G, landmarks, transpose=True).select(
        F.col("source").alias("landmark"), "id", F.col("level").alias("dist")
    )
    return fwd.withColumn("direction", F.lit("out")).unionByName(
        bwd.withColumn("direction", F.lit("in"))
    )


def approx_distances(
    G_or_table, pairs: DataFrame, landmarks: list[int] | None = None, k: int = 16
) -> DataFrame:
    """(u, v, dist_upper, dist_lower) for each row of ``pairs`` (u, v).

    ``G_or_table``: a Graph (table built on the fly) or a precomputed
    ``landmark_distance_table`` result — pass the table when answering
    many batches, which is the deployment shape.  Pairs with no common
    landmark (different components) come back with NULL bounds.
    Exact when u or v IS a landmark, or a shortest path crosses one.
    """
    if isinstance(G_or_table, DataFrame):
        tbl = G_or_table
    else:
        tbl = landmark_distance_table(G_or_table, landmarks, k)
    directed = "direction" in tbl.columns
    if directed:
        du = tbl.filter(F.col("direction") == "in").select(
            F.col("id").alias("u"), "landmark", F.col("dist").alias("du")
        )
        dv = tbl.filter(F.col("direction") == "out").select(
            F.col("id").alias("v"), "landmark", F.col("dist").alias("dv")
        )
    else:
        du = tbl.select(F.col("id").alias("u"), "landmark", F.col("dist").alias("du"))
        dv = tbl.select(F.col("id").alias("v"), "landmark", F.col("dist").alias("dv"))
    joined = pairs.join(du, "u", "left").join(dv, ["v", "landmark"], "left")
    lower = (
        F.max(F.abs(F.col("du") - F.col("dv")))
        if not directed
        else F.max(F.lit(None).cast("long"))
    )
    return (
        joined.groupBy("u", "v")
        .agg(
            F.min(F.col("du") + F.col("dv")).alias("dist_upper"),
            lower.alias("dist_lower"),
        )
    )
