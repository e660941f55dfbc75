"""DAG analytics: topological generations / order, acyclicity test,
longest-path depths, and the cyclic core.

Engine extension — the reference (graphblas-algorithms) ships BFS-family
traversals (reference ``algorithms/_bfs.py``) but no DAG layer; at the
link-graph tier the import/dependency digraph of a source-code corpus is
*the* canonical DAG workload (build order, dependency depth, cycle
detection across packages), so the Kahn peel belongs next to BFS as a
first-class superstep kernel.

Algorithm (Kahn 1962, delta-frontier form): generation 0 is every node
with remaining in-degree 0; removing a generation decrements the
remaining in-degree of its out-neighbors, exposing the next generation.
Rather than rescanning the graph per round, the superstep is incremental
exactly like the engine's delta-BFS: each round joins ONLY the frontier
against the edge table (O(out-edges of frontier)), so the total work
across all rounds is one pass over the edges — O(nnz) shuffled bytes
end-to-end, independent of the number of generations.  ``layer(v)`` =
1 + max(layer(predecessors)) = the LONGEST path length from any source
to v, so the same peel yields ``dag_longest_path_length`` for free.

Nodes never exposed by the peel have an ancestor cycle; the graph is a
DAG iff the peel exhausts all nodes.  ``cyclic_core`` peels from both
directions (zero in-degree and zero out-degree) leaving exactly the
nodes that lie ON a directed cycle or on a path between two cycles —
the SCC condensation's non-trivial region, cheaper than full SCC when
only "where are the cycles" is asked.

Scale shape: state is one (id, indeg) row per unpeeled node, the
frontier shrinks to empty, every join is hash-partitioned on the node
key, and each round is lineage-cut so thousand-generation dependency
chains run flat (plans/superstep.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.superstep import _release_state, lineage_cut


def topological_generations(
    G, max_rounds: int = 100_000, require_dag: bool = True
) -> DataFrame:
    """(id: long, layer: long) — Kahn generation per node; ``layer`` is
    also the longest path length (in edges) from any source to the node.

    Directed graphs only.  If the graph has a cycle: raises when
    ``require_dag`` (default), else returns only the acyclic prefix
    (nodes with no ancestor cycle).  Deterministic; self-loops make
    their node cyclic (never peeled), matching networkx.
    """
    if not G.is_directed_flag:
        raise ValueError("topological_generations: directed graphs only")
    spark = G.spark
    num_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    edges = G.edges.select("src", "dst").repartition(num_part, "src").persist()

    # remaining in-degree per node (missing row == 0)
    indeg = (
        G.nodes.join(
            edges.groupBy(F.col("dst").alias("id")).agg(
                F.count(F.lit(1)).alias("indeg")
            ),
            "id",
            "left",
        )
        .select("id", F.coalesce("indeg", F.lit(0)).alias("indeg"))
        .repartition(num_part, "id")
    )
    frontier = indeg.filter(F.col("indeg") == 0).select("id").persist()
    pending = indeg.filter(F.col("indeg") > 0).persist()

    out = None
    layer = 0
    n_front = frontier.count()
    while n_front > 0:
        tagged = frontier.select("id", F.lit(layer).cast("long").alias("layer"))
        out = tagged if out is None else out.unionByName(tagged)
        # decrement successors' remaining in-degree by edges FROM frontier
        dec = (
            edges.join(frontier.withColumnRenamed("id", "src"), "src", "left_semi")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.count(F.lit(1)).alias("_dec"))
        )
        nxt = (
            pending.join(dec, "id", "left")
            .select(
                "id",
                (F.col("indeg") - F.coalesce("_dec", F.lit(0))).alias("indeg"),
            )
            .transform(lineage_cut)
            .persist()
        )
        frontier.unpersist()
        pending.unpersist()
        pending = nxt
        frontier = pending.filter(F.col("indeg") == 0).select("id").persist()
        pending = pending.filter(F.col("indeg") > 0)
        layer += 1
        if layer > max_rounds:
            raise RuntimeError(f"topological_generations: exceeded {max_rounds} rounds")
        n_front = frontier.count()

    leftover = pending.limit(1).count() > 0
    edges.unpersist()
    frontier.unpersist()
    if leftover and require_dag:
        raise ValueError("topological_generations: graph has a directed cycle")
    if out is None:
        return G.nodes.select("id", F.lit(0).cast("long").alias("layer")).limit(0)
    return out.select("id", F.col("layer").cast("long"))


def topological_sort(G, max_rounds: int = 100_000) -> DataFrame:
    """(id, layer, pos) — one valid topological order, deterministic:
    nodes sorted by (generation, id); ``pos`` is the 0-based rank.

    The global rank is a single window over the layered result — fine
    whenever the ORDER itself must be materialized (a build schedule);
    plan on (layer, id) alone when only precedence is needed.
    """
    gens = topological_generations(G, max_rounds=max_rounds)
    from pyspark.sql import Window

    w = Window.orderBy("layer", "id")
    return gens.select(
        "id", "layer", (F.row_number().over(w) - 1).cast("long").alias("pos")
    )


def is_directed_acyclic_graph(G, max_rounds: int = 100_000) -> bool:
    """True iff the digraph has no directed cycle (networkx
    ``is_directed_acyclic_graph``); one Kahn peel."""
    peeled = topological_generations(G, max_rounds=max_rounds, require_dag=False)
    return peeled.count() == G.n


def dag_longest_path_length(G, weight: bool = False) -> int | float:
    """Length of the longest directed path (networkx
    ``dag_longest_path_length``).  Unweighted: max Kahn layer — free
    from the peel.  Weighted: one max_plus pass per generation over the
    layered nodes (layer(v) bounds the DP order)."""
    gens = topological_generations(G)
    if not weight:
        row = gens.agg(F.max("layer").alias("m")).collect()[0]
        return int(row["m"] or 0)
    # weighted DP in generation order: dist(v) = max(dist(u) + w(u,v))
    spark = G.spark
    num_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    wcol = "weight" if "weight" in G.edges.columns else None
    edges = G.edges.select(
        "src",
        "dst",
        (F.col(wcol) if wcol else F.lit(1.0)).cast("double").alias("w"),
    ).repartition(num_part, "src")
    layers = [r["layer"] for r in gens.select("layer").distinct().orderBy("layer").collect()]
    # seed EVERY node at 0, not just layer 0: nx floors each node's dist
    # at (0, v), so with negative edge weights a maximal path may start
    # mid-graph (ADVICE r3).  Keeping the 0-row per node alongside the
    # relaxed rows realizes exactly that floor — the per-id max of acc
    # rows is max(0, max_pred(dist+w)), and successors reading ALL rows
    # through the max aggregate see the floored value.
    dist = gens.select("id", F.lit(0.0).alias("dist"))
    best = 0.0
    # lineage-cut the seed so releases never walk into gens' live blocks
    acc = dist.transform(lineage_cut).persist()
    for layer in layers[1:]:
        tgt = gens.filter(F.col("layer") == layer).select("id")
        step = (
            edges.join(acc.withColumnRenamed("id", "src"), "src")
            .join(tgt.withColumnRenamed("id", "dst"), "dst", "left_semi")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.max(F.col("dist") + F.col("w")).alias("dist"))
        )
        prev = acc
        acc = acc.unionByName(step).transform(lineage_cut).persist()
        _release_state(prev)  # ADVICE r3: one pinned frame per layer
    row = acc.agg(F.max("dist").alias("m")).collect()[0]
    best = float(row["m"] or 0.0)
    _release_state(acc)
    return best


def cyclic_core(G, max_rounds: int = 100_000) -> DataFrame:
    """(id) — nodes on a directed cycle or on a directed path from one
    cycle to another (the non-trivial region of the SCC condensation).
    Empty iff the graph is a DAG.  Two Kahn peels (forward + reverse):
    cheaper than full SCC when only cycle *location* is needed."""
    fwd = topological_generations(G, max_rounds=max_rounds, require_dag=False)
    bwd = topological_generations(
        G.reverse(), max_rounds=max_rounds, require_dag=False
    )
    return (
        G.nodes.select("id")
        .join(fwd.select("id"), "id", "left_anti")
        .join(bwd.select("id"), "id", "left_anti")
    )


def condensation(G, scc: DataFrame | None = None) -> tuple[DataFrame, DataFrame]:
    """(cond_edges, cond_nodes) — the SCC quotient digraph (nx
    ``condensation``, but labeled by SCC min-node-id instead of nx's
    arbitrary integers): cond_nodes = (component), cond_edges =
    distinct (src_comp, dst_comp) for edges crossing SCCs.  Always a
    DAG, so the whole DAG layer (topological generations, longest
    path) applies to it — the standard way to read a cyclic graph's
    macro-structure.  Pass a precomputed ``strongly_connected_components``
    labeling to skip recomputation."""
    if scc is None:
        from .components import strongly_connected_components

        scc = strongly_connected_components(G)
    lab_src = scc.select(F.col("id").alias("src"), F.col("component").alias("_cs"))
    lab_dst = scc.select(F.col("id").alias("dst"), F.col("component").alias("_cd"))
    cond_edges = (
        G.edges.select("src", "dst")
        .join(lab_src, "src")
        .join(lab_dst, "dst")
        .filter(F.col("_cs") != F.col("_cd"))
        .select(F.col("_cs").alias("src"), F.col("_cd").alias("dst"))
        .distinct()
    )
    cond_nodes = scc.select(F.col("component").alias("id")).distinct()
    return cond_edges, cond_nodes


def condensation_layers(G, scc: DataFrame | None = None) -> DataFrame:
    """(component, layer) — topological generation of each SCC in the
    condensation DAG: layer 0 = source SCCs (nothing upstream), and
    layer(v) is the longest chain of SCCs above it.  The macro "build
    order" of a cyclic dependency graph."""
    cond_edges, cond_nodes = condensation(G, scc)
    cls = type(G)
    quotient = cls(cond_edges, cond_nodes, dedup=False)
    gens = topological_generations(quotient)
    return gens.select(F.col("id").alias("component"), "layer")
