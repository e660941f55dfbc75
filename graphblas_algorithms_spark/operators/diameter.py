"""Eccentricity / diameter family: exact (all-pairs BFS) + double sweep.

Engine extension along the nx distance-measure surface
(``nx.eccentricity / diameter / radius / center / periphery``): the
reference (graphblas-algorithms) stops at the BFS kernels in
``algorithms/_bfs.py``; we compose them the way nx's
``distance_measures.py`` does, on top of our chunked multi-source BFS
(`all_pairs_shortest_path_length`), so exact eccentricities cost the
same bounded |chunk| x n state as the existing all-pairs path.

Exact all-pairs is O(n * m) work — fine at survey scale, wrong at
10^9 nodes, so the scale path is the classic **double sweep** lower
bound (Magnien, Latapy & Habib, "Fast computation of empirically tight
bounds for the diameter of massive graphs", JEA 13, 2009): BFS from a
deterministic high-degree seed, then BFS again from the farthest node
found; the second eccentricity is a lower bound on the diameter that
is empirically exact on web/link graphs.  Two BFS passes = O(diameter)
rounds of one shuffle each, no n^2 state anywhere.

Determinism: the seed is the max-degree node (ties to min id); the
"farthest" pick is (level DESC, id ASC) — both integer orderings, so
the Spark plan and the DuckDB recursive-CTE oracle (driver query
``graph_diameter``) agree exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .shortest_paths import all_pairs_shortest_path_length
from .traversal import _adj, bfs_levels


def eccentricity(G, sources: list[int] | None = None) -> DataFrame:
    """(id, ecc: long) — nx ``eccentricity``: max shortest-path length
    from each node.  Raises if the graph is disconnected (nx raises
    ``NetworkXError`` there too) — use ``double_sweep`` per component
    at scale instead."""
    n = G.n
    d = all_pairs_shortest_path_length(G, sources=sources)
    ecc = d.groupBy("source").agg(
        F.max("length").alias("ecc"), F.count("*").alias("_reach")
    )
    bad = ecc.filter(F.col("_reach") < n).limit(1).count()
    if bad:
        raise ValueError(
            "eccentricity is undefined on a disconnected graph "
            "(some node cannot reach all others)"
        )
    return ecc.select(F.col("source").alias("id"), "ecc")


def diameter(G) -> int:
    """nx ``diameter`` — max eccentricity (exact; all-pairs BFS)."""
    return eccentricity(G).agg(F.max("ecc")).collect()[0][0]


def radius(G) -> int:
    """nx ``radius`` — min eccentricity (exact)."""
    return eccentricity(G).agg(F.min("ecc")).collect()[0][0]


def center(G) -> DataFrame:
    """(id) — nodes at eccentricity == radius (nx ``center``)."""
    ecc = eccentricity(G).persist()
    r = ecc.agg(F.min("ecc")).collect()[0][0]
    return ecc.filter(F.col("ecc") == r).select("id")


def periphery(G) -> DataFrame:
    """(id) — nodes at eccentricity == diameter (nx ``periphery``)."""
    ecc = eccentricity(G).persist()
    d = ecc.agg(F.max("ecc")).collect()[0][0]
    return ecc.filter(F.col("ecc") == d).select("id")


def _farthest(levels: DataFrame) -> tuple[int, int]:
    row = levels.orderBy(F.desc("level"), F.asc("id")).limit(1).collect()[0]
    return int(row["id"]), int(row["level"])


def double_sweep(G, seed: int | None = None) -> DataFrame:
    """One row (seed, far_node, periphery_node, ecc_seed: long,
    diameter_lb: long) — the Magnien-Latapy-Habib double-sweep diameter
    lower bound, restricted to the seed's component.

    ``seed`` defaults to the max-degree node (ties to min id) — the
    standard heuristic start (a hub sits near the graph's core, so its
    BFS tree reaches a true peripheral node).  ``diameter_lb`` =
    ecc(far_node) >= the true diameter of the component / 2, and is
    empirically the exact diameter on power-law link graphs.
    """
    if seed is None:
        deg = _adj(G).groupBy("src").agg(F.count("*").alias("_d"))
        row = deg.orderBy(F.desc("_d"), F.asc("src")).limit(1).collect()[0]
        seed = int(row["src"])
    l1 = bfs_levels(G, seed).persist()
    far, ecc1 = _farthest(l1)
    l1.unpersist()
    l2 = bfs_levels(G, far).persist()
    per, lb = _farthest(l2)
    l2.unpersist()
    return G.spark.createDataFrame(
        [(seed, far, per, ecc1, lb)],
        "seed long, far_node long, periphery_node long, "
        "ecc_seed long, diameter_lb long",
    )
