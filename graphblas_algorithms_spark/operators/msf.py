"""Minimum spanning forest — Borůvka's algorithm as component supersteps.

Not in the reference; added as the classic O(log n)-round distributed
MST (the only MST algorithm whose parallel shape survives a cluster:
Prim/Kruskal are inherently sequential).  Each round:

1. every component picks its minimum outgoing edge (one groupBy with a
   deterministic ``min(struct(weight, u, v))`` tie-break — total order,
   so the result is a pure function of the graph);
2. the chosen edges are contracted by running the engine's own
   min-label connected-components kernel on the COMPONENT graph (one
   node per current component — geometrically shrinking, so the inner
   fixpoint runs on ever-smaller data);
3. edges are relabeled; intra-component edges drop out.

Components at least halve per round, so rounds <= log2(n).  The chosen
edge set is cycle-free by the standard Borůvka argument WHEN edge
weights are distinct; the deterministic (weight, u, v) total order
makes every weight tie behave like a distinct weight, so the guarantee
holds on arbitrary inputs (this is the classic lexicographic
tie-breaking trick).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.superstep import lineage_cut


def minimum_spanning_forest(
    G, max_rounds: int = 64, cc_method: str = "star"
) -> DataFrame:
    """(src: long, dst: long, weight: double) — edges of the minimum
    spanning forest (one tree per connected component), canonical
    src < dst.  Unweighted graphs get weight 1.0 (any spanning forest is
    minimal; the lexicographic order still fixes WHICH one).

    ``cc_method``: contraction CC variant — "star" (default; the chosen
    edges form pseudo-trees whose chains can be long, so the
    diameter-independent kernel is the safe default) or "minlabel"."""
    has_w = "weight" in G.edges.columns
    wcol = F.col("weight").cast("double") if has_w else F.lit(1.0)
    base = (
        G.get_property("offdiag")
        .select(
            F.least("src", "dst").alias("u"),
            F.greatest("src", "dst").alias("w"),
            wcol.alias("wt"),
        )
        .groupBy("u", "w")
        .agg(F.min("wt").alias("wt"))  # parallel edges: keep the lightest
        .persist()
    )
    spark = G.spark
    # working edge list between CURRENT components, carrying the original
    # endpoints so forest edges are reported in input terms
    work = base.select(
        F.col("u").alias("cu"), F.col("w").alias("cw"), "wt", "u", "w"
    )
    forest = None
    for _ in range(max_rounds):
        work = work.filter(F.col("cu") != F.col("cw")).transform(lineage_cut).persist()
        if work.limit(1).count() == 0:
            break
        # 1. per-component minimum outgoing edge, deterministic total order
        both = work.unionByName(
            work.select(
                F.col("cw").alias("cu"), F.col("cu").alias("cw"), "wt", "u", "w"
            )
        )
        pick = (
            both.groupBy("cu")
            .agg(F.min(F.struct("wt", "u", "w", "cw")).alias("_m"))
            .select(
                F.col("cu").alias("a"),
                F.col("_m.cw").alias("b"),
                F.col("_m.u").alias("u"),
                F.col("_m.w").alias("w"),
                F.col("_m.wt").alias("wt"),
            )
        )
        chosen = pick.select("u", "w", "wt").distinct().transform(lineage_cut).persist()
        forest = (
            chosen
            if forest is None
            else forest.unionByName(chosen).transform(lineage_cut)
        )
        # 2. contract: min-label CC over the component graph
        from ..classes.graph import Graph

        comp_nodes = work.select(F.col("cu").alias("id")).unionByName(
            work.select(F.col("cw").alias("id"))
        ).distinct()
        comp_graph = Graph(
            pick.select(F.col("a").alias("src"), F.col("b").alias("dst")),
            comp_nodes,
            canonicalize=True,
        )
        from .components import connected_components

        labels = connected_components(comp_graph, method=cc_method).select(
            F.col("id"), F.col("component").alias("_new")
        )
        # 3. relabel both endpoints
        work = (
            work.join(labels.withColumnRenamed("id", "cu"), "cu")
            .withColumnRenamed("_new", "_ncu")
            .join(labels.withColumnRenamed("id", "cw"), "cw")
            .withColumnRenamed("_new", "_ncw")
            .select(
                F.col("_ncu").alias("cu"), F.col("_ncw").alias("cw"), "wt", "u", "w"
            )
        )
    else:
        base.unpersist()
        raise RuntimeError(
            f"minimum_spanning_forest did not converge in {max_rounds} rounds"
        )
    base.unpersist()
    if forest is None:
        sch = "src long, dst long, weight double"
        return spark.createDataFrame([], sch)
    return forest.select(
        F.col("u").alias("src"), F.col("w").alias("dst"), F.col("wt").alias("weight")
    )
