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
from ..plans.superstep import Superstep


def _sym_adj(G) -> DataFrame:
    """Undirected/bidirectional adjacency (both directions, no weights)."""
    return G.get_property("sym_edges").select("src", "dst")


def connected_components(
    G,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 1,
    resume: bool = False,
) -> DataFrame:
    """(id: long, component: long); component = min node id reachable.

    Works on Graph (connected components) and DiGraph (WEAKLY connected:
    edges symmetrized first, matching ``digraph.py:604-612`` +
    ``weakly_connected.py:5-8`` semantics).
    """
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
        improved = improved.localCheckpoint(eager=True)
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


def strongly_connected_components(G, max_rounds: int = 100) -> DataFrame:
    """(id: long, component: long) with component = min node id in SCC.

    Forward-backward coloring, peeling one batch of SCCs per round.
    Not in the reference (north_star requires it).
    """
    spark = G.spark
    edges = G.edges.select("src", "dst").persist()
    active = G.nodes.select("id").persist()
    result = None  # (id, component)

    for _ in range(max_rounds):
        if active.count() == 0:
            break
        act_edges = (
            edges.join(active.withColumnRenamed("id", "src"), "src", "left_semi")
            .join(active.withColumnRenamed("id", "dst"), "dst", "left_semi")
            .persist()
        )
        # forward min-id color propagation to fixpoint within active subgraph
        color = active.select("id", F.col("id").alias("color")).persist()
        frontier = color
        while True:
            cand = edge_join(frontier, act_edges).groupBy("id").agg(
                F.min("color").alias("_cand")
            )
            improved = (
                cand.join(color.withColumnRenamed("color", "_cur"), "id")
                .filter(F.col("_cand") < F.col("_cur"))
                .select("id", F.col("_cand").alias("color"))
                .persist()
            )
            if improved.count() == 0:
                improved.unpersist()
                break
            color = (
                color.join(improved.withColumnRenamed("color", "_new"), "id", "left")
                .select("id", F.coalesce("_new", "color").alias("color"))
                .localCheckpoint(eager=True)
            )
            frontier = improved
        # backward BFS from color roots along same-color reversed edges
        same_color_rev = (
            act_edges.join(color.withColumnRenamed("id", "src").withColumnRenamed("color", "_sc"), "src")
            .join(color.withColumnRenamed("id", "dst").withColumnRenamed("color", "_dc"), "dst")
            .filter(F.col("_sc") == F.col("_dc"))
            .select(F.col("dst").alias("src"), F.col("src").alias("dst"))
            .persist()
        )
        reached = color.filter(F.col("id") == F.col("color")).select("id", "color").persist()
        frontier = reached
        while True:
            nxt = (
                edge_join(frontier, same_color_rev, payload=["color"])
                .distinct()
                .join(reached.select("id"), "id", "left_anti")
                .persist()
            )
            if nxt.count() == 0:
                nxt.unpersist()
                break
            reached = reached.unionByName(nxt).localCheckpoint(eager=True)
            frontier = nxt
        scc = reached.select("id", F.col("color").alias("component"))
        result = scc if result is None else result.unionByName(scc)
        result = result.localCheckpoint(eager=True)
        active = active.join(reached.select("id"), "id", "left_anti").persist()
        act_edges.unpersist()
        same_color_rev.unpersist()
    edges.unpersist()
    return result if result is not None else G.nodes.select(
        "id", F.col("id").alias("component")
    )
