"""BFS family: levels, parents, layers, reachability-at-distance, DAG ops.

Reference kernel ``algorithms/_bfs.py``: frontier loop
``q(~v.S, replace) << any_pair(q @ A)`` (``:39``) — the complement mask
is a left-anti join against the visited set (SURVEY P8/O2); the level
variant adds the superstep index (``:48-75``); the parent variant uses
the ``min_first`` semiring (``:110-137``) = min(src) agg for a
deterministic parent; the multi-source variant batches sources as a
(source × node) matrix (``:78-107``) = an extra ``source`` key column
(O9 — one shuffle serves k queries).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.joins import edge_join

from ..plans.superstep import lineage_cut


def _adj(G, transpose: bool = False) -> DataFrame:
    adj = (
        G.edges.select("src", "dst")
        if G.is_directed_flag
        else G.get_property("sym_edges").select("src", "dst")
    )
    if transpose:
        adj = adj.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    return adj


def bfs_levels(G, source: int, cutoff: int | None = None, transpose: bool = False) -> DataFrame:
    """(id: long, level: long) — ``_bfs_level`` (``_bfs.py:48-75``).
    Sparse: unreachable nodes are absent rows."""
    adj = _adj(G, transpose).persist()
    spark = G.spark
    visited = spark.createDataFrame([(int(source), 0)], "id long, level long").persist()
    frontier = visited.select("id")
    level = 0
    while cutoff is None or level < cutoff:
        level += 1
        nxt = (
            edge_join(frontier, adj)
            .distinct()
            .join(visited.select("id"), "id", "left_anti")
            .persist()
        )
        if nxt.count() == 0:
            nxt.unpersist()
            break
        visited = visited.unionByName(
            nxt.select("id", F.lit(level).alias("level"))
        ).transform(lineage_cut)
        frontier = nxt
    adj.unpersist()
    return visited


def bfs_levels_multi(G, sources: list[int], transpose: bool = False) -> DataFrame:
    """(source: long, id: long, level: long) — batched multi-source BFS
    (``_bfs.py:78-107``; the reference's own queries-as-matrix trick)."""
    adj = _adj(G, transpose).persist()
    spark = G.spark
    visited = spark.createDataFrame(
        [(int(s), int(s), 0) for s in sources], "source long, id long, level long"
    ).persist()
    frontier = visited.select("source", "id")
    level = 0
    while True:
        level += 1
        nxt = (
            edge_join(frontier, adj, payload=["source"])
            .select("source", "id")
            .distinct()
            .join(visited.select("source", "id"), ["source", "id"], "left_anti")
            .persist()
        )
        if nxt.count() == 0:
            nxt.unpersist()
            break
        visited = visited.unionByName(
            nxt.select("source", "id", F.lit(level).alias("level"))
        ).transform(lineage_cut)
        frontier = nxt
    adj.unpersist()
    return visited


def bfs_parent(G, source: int) -> DataFrame:
    """(id: long, parent: long) — BFS tree via min_first semiring
    (``_bfs.py:110-137``): deterministic min-src parent; source's parent
    is itself."""
    adj = _adj(G).persist()
    spark = G.spark
    visited = spark.createDataFrame([(int(source), int(source))], "id long, parent long").persist()
    frontier = visited.select("id")
    while True:
        nxt = (
            edge_join(frontier, adj, payload=[], keep_src="_src")
            .groupBy("id")
            .agg(F.min("_src").alias("parent"))  # min_first — _bfs.py:126
            .join(visited.select("id"), "id", "left_anti")
            .persist()
        )
        if nxt.count() == 0:
            nxt.unpersist()
            break
        visited = visited.unionByName(nxt).transform(lineage_cut)
        frontier = nxt.select("id")
    adj.unpersist()
    return visited


def bfs_layers(G, sources) -> list[DataFrame]:
    """List of frontier DataFrames (id) per depth —
    ``traversal/breadth_first_search.py:10-27`` (generator there)."""
    if isinstance(sources, int):
        sources = [sources]
    adj = _adj(G).persist()
    spark = G.spark
    frontier = spark.createDataFrame([(int(s),) for s in sources], "id long").distinct().persist()
    visited = frontier
    layers = [frontier]
    while True:
        nxt = (
            edge_join(frontier, adj)
            .distinct()
            .join(visited, "id", "left_anti")
            .persist()
        )
        if nxt.count() == 0:
            nxt.unpersist()
            break
        layers.append(nxt)
        visited = visited.unionByName(nxt).transform(lineage_cut)
        frontier = nxt
    adj.unpersist()
    return layers


def descendants_at_distance(G, source: int, distance: int) -> DataFrame:
    """Frontier after exactly d steps (``breadth_first_search.py:30-45``)."""
    lv = bfs_levels(G, source, cutoff=distance)
    return lv.filter(F.col("level") == distance).select("id")


def descendants(G, source: int) -> DataFrame:
    """All nodes reachable from source, minus source (``dag.py:6-11``)."""
    lv = bfs_levels(G, source)
    return lv.filter(F.col("id") != source).select("id")


def ancestors(G, source: int) -> DataFrame:
    """All nodes that reach source (``dag.py:14-17``) — transpose BFS."""
    lv = bfs_levels(G, source, transpose=True)
    return lv.filter(F.col("id") != source).select("id")
