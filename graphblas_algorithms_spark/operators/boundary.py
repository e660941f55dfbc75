"""Boundary / cuts / community-quality operators.

Reference ``algorithms/boundary.py``, ``cuts.py``,
``community/quality.py`` — all are semi/anti joins plus aggregates over
the degree properties (SURVEY §2.2 table)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _ids_df(G, ids) -> DataFrame:
    if isinstance(ids, DataFrame):
        return ids.select("id")
    return G.spark.createDataFrame([(int(i),) for i in ids], "id long")


def _adj(G) -> DataFrame:
    return (
        G.edges.select("src", "dst")
        if G.is_directed_flag
        else G.get_property("sym_edges").select("src", "dst")
    )


def edge_boundary(G, s, t=None) -> DataFrame:
    """Edges from S to T (default: complement of S) — ``boundary.py:7-20``.
    Two semi-joins (directed view; undirected graphs use both directions)."""
    S = _ids_df(G, s)
    adj = _adj(G)
    out = adj.join(S.withColumnRenamed("id", "src"), "src", "left_semi")
    if t is None:
        out = out.join(S.withColumnRenamed("id", "dst"), "dst", "left_anti")
    else:
        T = _ids_df(G, t)
        out = out.join(T.withColumnRenamed("id", "dst"), "dst", "left_semi")
    return out


def node_boundary(G, s) -> DataFrame:
    """Nodes adjacent to S but not in S — ``boundary.py:23-29``:
    ``any_pair(S @ A)`` masked to ~S = semi-join + distinct + anti-join."""
    S = _ids_df(G, s)
    adj = _adj(G)
    return (
        adj.join(S.withColumnRenamed("id", "src"), "src", "left_semi")
        .select(F.col("dst").alias("id"))
        .distinct()
        .join(S, "id", "left_anti")
    )


def cut_size(G, s, t=None) -> int:
    """# boundary edges (``cuts.py:18-30``); directed graphs count both
    directions when t given? — reference adds the reverse for digraphs."""
    n = edge_boundary(G, s, t).count()
    if G.is_directed_flag:
        S = _ids_df(G, s)
        T = _ids_df(G, t) if t is not None else None
        rev = G.edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        back = rev.join(S.withColumnRenamed("id", "src"), "src", "left_semi")
        if T is None:
            back = back.join(S.withColumnRenamed("id", "dst"), "dst", "left_anti")
        else:
            back = back.join(T.withColumnRenamed("id", "dst"), "dst", "left_semi")
        n += back.count()
    return n


def volume(G, s) -> int:
    """Sum of (out-)degrees over S (``cuts.py:33-38``)."""
    S = _ids_df(G, s)
    deg = (
        G.get_property("out_degrees")
        if G.is_directed_flag
        else G.get_property("sym_edges")
        .groupBy(F.col("src").alias("id"))
        .agg(F.count("*").alias("degree"))
    )
    row = deg.join(S, "id", "left_semi").agg(F.sum("degree").alias("v")).collect()[0]
    return int(row["v"] or 0)


def normalized_cut_size(G, s, t=None) -> float:
    """``cuts.py:41-48``."""
    num = cut_size(G, s, t)
    vol_s = volume(G, s)
    if t is None:
        all_ids = G.nodes
        t_df = all_ids.join(_ids_df(G, s), "id", "left_anti")
        vol_t = volume(G, t_df)
    else:
        vol_t = volume(G, t)
    return num * (1.0 / vol_s + 1.0 / vol_t)


def conductance(G, s, t=None) -> float:
    """``cuts.py:51-58``."""
    num = cut_size(G, s, t)
    vol_s = volume(G, s)
    if t is None:
        t_df = G.nodes.join(_ids_df(G, s), "id", "left_anti")
        vol_t = volume(G, t_df)
    else:
        vol_t = volume(G, t)
    return num / min(vol_s, vol_t)


def edge_expansion(G, s, t=None) -> float:
    """``cuts.py:61-66``."""
    num = cut_size(G, s, t)
    s_n = _ids_df(G, s).count()
    if t is None:
        t_n = G.n - s_n
    else:
        t_n = _ids_df(G, t).count()
    return num / min(s_n, t_n)


def mixing_expansion(G, s, t=None) -> float:
    """``cuts.py:69-72``."""
    num = cut_size(G, s, t)
    m = G.m
    return num / (2.0 * m)


def node_expansion(G, s) -> float:
    """``cuts.py:75-?``: |N(S) ∪ S| / |S| where N = neighborhood."""
    S = _ids_df(G, s)
    nb = node_boundary(G, S)
    return (nb.count() + S.count()) / S.count()


def boundary_expansion(G, s) -> float:
    """``cuts.py``: |node_boundary(S)| / |S|."""
    S = _ids_df(G, s)
    return node_boundary(G, S).count() / S.count()


def intra_inter_community_edges(G, labels: DataFrame) -> tuple[int, int]:
    """(intra, inter) edge counts for a labeling (id, label) —
    ``community/quality.py:6-21``.  ONE pass for all blocks via
    edges ⋈ labels(src) ⋈ labels(dst) (better than the reference's
    per-block masked matmul loop — SURVEY §2.2 note)."""
    e = G.edges.select("src", "dst")
    lab_s = labels.select(F.col("id").alias("src"), F.col("label").alias("_ls"))
    lab_d = labels.select(F.col("id").alias("dst"), F.col("label").alias("_ld"))
    tagged = e.join(lab_s, "src").join(lab_d, "dst")
    row = tagged.agg(
        F.sum(F.when(F.col("_ls") == F.col("_ld"), 1).otherwise(0)).alias("intra"),
        F.sum(F.when(F.col("_ls") != F.col("_ld"), 1).otherwise(0)).alias("inter"),
    ).collect()[0]
    return int(row["intra"] or 0), int(row["inter"] or 0)
