"""Structure predicates & misc operators (SURVEY §2.2 [x] tier).

Reference files: ``isolate.py``, ``regular.py``, ``reciprocity.py``,
``smetric.py``, ``structuralholes.py``, ``simple_paths.py``,
``tournament.py``, ``dominating.py``, ``efficiency_measures.py``,
``lowest_common_ancestors.py``, ``isomorphism/isomorph.py``,
``generators/ego.py`` — each a handful of joins/aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..classes.graph import DiGraph, Graph
from .shortest_paths import bellman_ford_path_length
from .traversal import bfs_levels


def _deg(G) -> DataFrame:
    """(id, degree) over all nodes (0 for isolates)."""
    if G.is_directed_flag:
        d = G.get_property("total_degrees")
    else:
        d = G.get_property("degrees_plus")
    return G.nodes.join(d, "id", "left").select(
        "id", F.coalesce("degree", F.lit(0)).alias("degree")
    )


def isolates(G) -> DataFrame:
    """(id) nodes with no edges (``isolate.py:11-18``) — anti-join nodes
    vs edge endpoints."""
    endpoints = (
        G.edges.select(F.col("src").alias("id"))
        .unionByName(G.edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    return G.nodes.join(endpoints, "id", "left_anti")


def is_isolate(G, n: int) -> bool:
    """``isolate.py:4-8``."""
    return isolates(G).filter(F.col("id") == n).limit(1).count() > 0


def number_of_isolates(G) -> int:
    """``isolate.py:21-26``."""
    return isolates(G).count()


def is_regular(G) -> bool:
    """All degrees equal (``regular.py:6-24``); digraph: in==out per node."""
    if not G.is_directed_flag:
        return _deg(G).select("degree").distinct().count() <= 1
    ind = G.nodes.join(G.get_property("in_degrees"), "id", "left").select(
        "id", F.coalesce("degree", F.lit(0)).alias("_in")
    )
    outd = G.nodes.join(G.get_property("out_degrees"), "id", "left").select(
        "id", F.coalesce("degree", F.lit(0)).alias("_out")
    )
    j = ind.join(outd, "id")
    if j.filter(F.col("_in") != F.col("_out")).limit(1).count() > 0:
        return False
    return j.select("_in").distinct().count() <= 1


def is_k_regular(G, k: int) -> bool:
    """``regular.py:27-30`` (undirected only in reference)."""
    distinct = _deg(G).select("degree").distinct().collect()
    return len(distinct) == 1 and distinct[0]["degree"] == k


def reciprocity(G: DiGraph, nodes=None) -> DataFrame:
    """Per-node reciprocity (``reciprocity.py:8-14``):
    recip_degree / total_degree over off-diagonal edges."""
    e = G.edges.select("src", "dst").filter(F.col("src") != F.col("dst"))
    rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    recip = e.join(rev, ["src", "dst"], "left_semi")
    recip_deg = (
        recip.select(F.col("src").alias("id"))
        .unionByName(recip.select(F.col("dst").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("_r"))
    )
    tot_deg = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("_t"))
    )
    out = G.nodes.join(recip_deg, "id", "left").join(tot_deg, "id", "left").select(
        "id",
        F.when(
            F.col("_t").isNotNull(),
            F.coalesce("_r", F.lit(0)) / F.col("_t"),
        ).alias("reciprocity"),
    )
    if nodes is not None:
        ids = G.spark.createDataFrame([(int(i),) for i in nodes], "id long")
        out = out.join(ids, "id", "left_semi")
    return out


def overall_reciprocity(G: DiGraph) -> float:
    """``reciprocity.py:17-22``: reciprocated / total off-diag edges."""
    e = G.edges.select("src", "dst").filter(F.col("src") != F.col("dst")).persist()
    rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    n_recip = e.join(rev, ["src", "dst"], "left_semi").count()
    n_total = e.count()
    e.unpersist()
    if n_total == 0:
        raise ZeroDivisionError("graph has no edges")
    return n_recip / n_total


def s_metric(G) -> float:
    """``smetric.py:6-11``: sum d(u)*d(v) over edges (each undirected edge
    once — networkx>=3 convention without normalization)."""
    deg = _deg(G)
    e = G.get_property("offdiag") if not G.is_directed_flag else G.edges
    j = (
        e.select("src", "dst")
        .join(deg.select(F.col("id").alias("src"), F.col("degree").alias("_du")), "src")
        .join(deg.select(F.col("id").alias("dst"), F.col("degree").alias("_dv")), "dst")
    )
    row = j.agg(F.sum(F.col("_du") * F.col("_dv")).alias("s")).collect()[0]
    return float(row["s"] or 0)


def mutual_weight(G, u: int, v: int) -> float:
    """w(u,v) + w(v,u) (``structuralholes.py:4-11``)."""
    e = G.edges
    w = F.col("weight") if "weight" in e.columns else F.lit(1.0)
    if not G.is_directed_flag:
        e = G.get_property("sym_edges")
        w = F.col("weight") if "weight" in e.columns else F.lit(1.0)
    rows = e.filter(
        ((F.col("src") == u) & (F.col("dst") == v))
        | ((F.col("src") == v) & (F.col("dst") == u))
    ).agg(F.sum(w).alias("s")).collect()
    return float(rows[0]["s"] or 0.0)


def effective_size(G: Graph) -> DataFrame:
    """(id: long, effective_size: double) — Burt's effective size for every
    node with degree >= 1, under the unweighted-undirected simplification
    (Borgatti 1997): ``ES(u) = deg(u) - 2 * triangles(u) / deg(u)``.

    Extends the reference's structural-holes surface (``structuralholes.py``
    stops at ``mutual_weight``) to the node-level metric networkx exposes as
    ``effective_size``.  The whole thing is one wedge join (shared with
    ``triangles``) plus a degree aggregate — at 100 TB the triangle count is
    the dominant exchange and it is already degree-oriented (low-degree
    wedge centers), so hub skew is bounded the same way ``triangles`` is.
    Self-loops are excluded (networkx simple-graph semantics)."""
    from .triangles import triangles as _triangles

    deg = G.get_property("degrees_minus")
    tri = _triangles(G, dense=False)
    return (
        deg.join(tri, "id", "left")
        .select(
            "id",
            (
                F.col("degree")
                - 2.0 * F.coalesce(F.col("triangles"), F.lit(0)) / F.col("degree")
            ).alias("effective_size"),
        )
    )


def local_bridges(G: Graph, with_span: bool = False) -> DataFrame:
    """(src, dst) — canonical undirected edges that are *local bridges*:
    their endpoints share no common neighbor, i.e. the edge lies on no
    triangle (span > 2; Easley-Kleinberg ch. 3, networkx ``local_bridges``).

    One pass of the k-truss support join (``ktruss._edge_support``) filtered
    to support 0 — no new exchange shapes beyond what ``k_truss`` already
    pays, and the support join is wedge-oriented so hubs cost one wide task,
    not a stage.  ``with_span`` is accepted for networkx parity but only the
    infinite/non-infinite distinction is computed here (span enumeration is
    an all-pairs problem); it adds a ``span_gt_2`` literal column."""
    from .ktruss import _edge_support

    e = G.get_property("U_minus").select("src", "dst")
    sup = _edge_support(e)
    out = sup.filter(F.col("support") == 0).select("src", "dst")
    if with_span:
        out = out.withColumn("span_gt_2", F.lit(True))
    return out


def is_simple_path(G, path: list[int]) -> bool:
    """Consecutive pairs all edges, no repeated node (``simple_paths.py:6-21``)."""
    if len(path) == 0 or len(set(path)) != len(path):
        return False
    node_ids = G.spark.createDataFrame([(int(i),) for i in path], "id long")
    if node_ids.join(G.nodes, "id", "left_semi").count() != len(path):
        return False
    if len(path) == 1:
        return True
    pairs = G.spark.createDataFrame(
        [(int(a), int(b)) for a, b in zip(path, path[1:])], "src long, dst long"
    )
    adj = (
        G.edges.select("src", "dst")
        if G.is_directed_flag
        else G.get_property("sym_edges").select("src", "dst")
    )
    missing = pairs.join(adj, ["src", "dst"], "left_anti").count()
    return missing == 0


def is_tournament(G: DiGraph) -> bool:
    """``tournament.py:7-12``: exactly one arc between each pair, no
    self-loops, n(n-1)/2 edges."""
    n = G.n
    e = G.edges.select("src", "dst")
    if e.filter(F.col("src") == F.col("dst")).limit(1).count() > 0:
        return False
    if e.count() != n * (n - 1) // 2:
        return False
    rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    return e.join(rev, ["src", "dst"], "left_semi").limit(1).count() == 0


def score_sequence(G: DiGraph) -> list[int]:
    """Sorted out-degrees (``tournament.py:15-21``)."""
    deg = G.nodes.join(G.get_property("out_degrees"), "id", "left").select(
        F.coalesce("degree", F.lit(0)).alias("d")
    )
    return [r["d"] for r in deg.orderBy("d").collect()]


def tournament_matrix(G: DiGraph) -> DataFrame:
    """A - A.T as a (row, col, value) DataFrame (``tournament.py:24-27``)."""
    e = G.edges.select("src", "dst")
    pos = e.select(F.col("src").alias("row"), F.col("dst").alias("col"), F.lit(1.0).alias("value"))
    neg = e.select(F.col("dst").alias("row"), F.col("src").alias("col"), F.lit(-1.0).alias("value"))
    return (
        pos.unionByName(neg)
        .groupBy("row", "col")
        .agg(F.sum("value").alias("value"))
        .filter(F.col("value") != 0)
    )


def is_dominating_set(G, s) -> bool:
    """N(S) ∪ S covers V (``dominating.py:6-8``)."""
    from .boundary import _ids_df, node_boundary

    S = _ids_df(G, s)
    nb = node_boundary(G, S)
    covered = S.unionByName(nb).distinct().count()
    return covered == G.n


def efficiency(G, u: int, v: int) -> float:
    """1 / shortest-path length (``efficiency_measures.py:7-12``)."""
    lv = bfs_levels(G, u)
    row = lv.filter(F.col("id") == v).collect()
    if not row or row[0]["level"] == 0:
        return 0.0 if not row else float("inf")
    return 1.0 / row[0]["level"]


def lowest_common_ancestor(G: DiGraph, u: int, v: int, default=None):
    """``lowest_common_ancestors.py:9-21``: common ancestors of u and v
    (including themselves), drop any with a successor in the set, return
    max id (the reference's deterministic pick)."""
    anc_u = bfs_levels(G, u, transpose=True).select("id")
    anc_v = bfs_levels(G, v, transpose=True).select("id")
    common = anc_u.join(anc_v, "id", "left_semi").persist()
    if common.count() == 0:
        return default
    # drop nodes that have an out-edge to another node in the set
    e = G.edges.select("src", "dst").filter(F.col("src") != F.col("dst"))
    inner = e.join(common.withColumnRenamed("id", "src"), "src", "left_semi").join(
        common.withColumnRenamed("id", "dst"), "dst", "left_semi"
    )
    with_succ = inner.select(F.col("src").alias("id")).distinct()
    frontier = common.join(with_succ, "id", "left_anti")
    row = frontier.agg(F.max("id").alias("m")).collect()[0]
    common.unpersist()
    return row["m"] if row["m"] is not None else default


def could_be_isomorphic(G, H, fast: bool = True) -> bool:
    """Sorted (degree[, triangles]) profiles equal
    (``isomorphism/isomorph.py:12-56``). fast=False adds triangle counts."""
    if G.n != H.n or G.m != H.m:
        return False

    def profile(X, with_tri: bool):
        d = _deg(X)
        if with_tri:
            from .triangles import triangles as tri_fn

            t = tri_fn(X, dense=True)
            d = d.join(t, "id")
            rows = d.select("degree", "triangles").orderBy("degree", "triangles").collect()
            return [(r["degree"], r["triangles"]) for r in rows]
        rows = d.select("degree").orderBy("degree").collect()
        return [r["degree"] for r in rows]

    return profile(G, not fast) == profile(H, not fast)


def ego_graph(G, source: int, radius: int = 1, center: bool = True, distance: str | None = None):
    """BFS/Bellman-Ford ball then induced subgraph (``generators/ego.py:7-24``)."""
    if distance is not None:
        d = bellman_ford_path_length(G, source)
        ball = d.filter(F.col("dist") <= radius).select("id")
    else:
        ball = bfs_levels(G, source, cutoff=radius).select("id")
    if not center:
        ball = ball.filter(F.col("id") != source)
    ball = ball.persist()
    e = G.edges.join(ball.withColumnRenamed("id", "src"), "src", "left_semi").join(
        ball.withColumnRenamed("id", "dst"), "dst", "left_semi"
    )
    cls = DiGraph if G.is_directed_flag else Graph
    kw = {"canonicalize": False} if cls is Graph else {"dedup": False}
    return cls(e, ball.select("id"), **kw)


def is_triad(G) -> bool:
    """``triads.py:6-12``: directed, exactly 3 nodes, no self-loops."""
    if not G.is_directed_flag:
        return False
    if G.n != 3:
        return False
    return not G.has_self_edges


def eulerian_summary(G) -> DataFrame:
    """One-row (odd_degree_nodes, unbalanced_nodes, spanning_components,
    is_eulerian, has_eulerian_path) — the degree-parity / balance facts
    behind nx ``is_eulerian`` / ``has_eulerian_path`` (engine extension;
    the reference has no Eulerian predicates).

    Undirected: eulerian iff no odd-degree node and the graph is ONE
    component (isolates disconnect, matching nx); a path additionally
    allows exactly two odd nodes.  Directed: eulerian iff every node
    balanced (in == out) and ONE component of the symmetrized graph
    over ALL nodes — isolates disconnect here too, matching installed
    networkx (3.6.x: "graphs with isolated vertices are not considered
    to have an Eulerian path"; ADVICE r3 flagged the old docstring's
    nonzero-degree claim, which described a different nx lineage —
    the CODE matches nx, the docstring was wrong).  Balance + weak
    connectivity => strong, so no separate SCC pass is needed for the
    circuit.  A path allows one +1 and one -1 imbalance.  Two degree
    aggregates + one CC labeling — O(nnz), no per-node work."""
    from .components import connected_components

    spark = G.spark
    if G.is_directed_flag:
        outd = G.edges.groupBy(F.col("src").alias("id")).agg(
            F.count(F.lit(1)).alias("o")
        )
        ind = G.edges.groupBy(F.col("dst").alias("id")).agg(
            F.count(F.lit(1)).alias("i")
        )
        bal = (
            outd.join(ind, "id", "full")
            .select(
                "id",
                (F.coalesce("o", F.lit(0)) - F.coalesce("i", F.lit(0))).alias("b"),
            )
        )
        n_unbal = bal.filter(F.col("b") != 0).count()
        n_plus1 = bal.filter(F.col("b") == 1).count()
        n_minus1 = bal.filter(F.col("b") == -1).count()
        n_odd = n_unbal  # parity unused for digraphs; report imbalance
        path_deg_ok = (n_unbal == 0) or (
            n_plus1 == 1 and n_minus1 == 1 and n_unbal == 2
        )
        circuit_deg_ok = n_unbal == 0
    else:
        # nx degree parity: a self-loop adds 2 (so never flips parity) —
        # count both endpoints of every stored edge
        deg = (
            G.edges.select(F.col("src").alias("id"))
            .unionByName(G.edges.select(F.col("dst").alias("id")))
            .groupBy("id")
            .agg(F.count(F.lit(1)).alias("degree"))
        )
        n_odd = deg.filter(F.col("degree") % 2 == 1).count()
        n_unbal = n_odd
        path_deg_ok = n_odd in (0, 2)
        circuit_deg_ok = n_odd == 0

    # components over ALL nodes, nx convention: isolates disconnect
    # (weak connectivity for digraphs; balance + weak => strong, since a
    # weakly-connected balanced digraph is Eulerian hence strong, and an
    # imbalanced one already fails the degree test)
    comp = connected_components(G)
    n_comps = comp.select("component").distinct().count()
    connected_ok = n_comps <= 1

    is_euler = bool(circuit_deg_ok and connected_ok)
    has_path = bool(path_deg_ok and connected_ok)
    return spark.createDataFrame(
        [
            (
                int(n_odd),
                int(n_unbal),
                int(n_comps),
                is_euler,
                has_path,
            )
        ],
        "odd_degree_nodes int, unbalanced_nodes int, spanning_components int, "
        "is_eulerian boolean, has_eulerian_path boolean",
    )


def is_eulerian(G) -> bool:
    """nx ``is_eulerian``: an Eulerian circuit exists."""
    return bool(eulerian_summary(G).collect()[0]["is_eulerian"])


def has_eulerian_path(G) -> bool:
    """nx ``has_eulerian_path``: an Eulerian path exists."""
    return bool(eulerian_summary(G).collect()[0]["has_eulerian_path"])
