"""k-core subgraph + core numbers (degeneracy decomposition).

Engine extension: the reference ships k_truss (``core.py:8-37``) but no
k-core, although core decomposition is the standard cheaper cousin on
link graphs (spam/quality tiers, dense-subgraph seeding).  Same
operator family as k_truss: iterated filter to fixpoint, node-degree
support instead of edge-triangle support.

``k_core``: peel nodes with degree < k to fixpoint — O(peel rounds)
supersteps, each one groupBy + two semi-joins, same lineage/release
discipline as k_truss (lineage_cut per round, retired rounds freed).

``core_number``: every node's largest k with v in k-core, via the
iterated neighborhood h-index (Lu et al., "The H-index of a network
node", 2016): start from degree, repeatedly set c(v) = H({c(u): u ~ v})
where H is the h-index; the sequence is non-increasing and reaches the
coreness in finitely many rounds — a FIXED number of distributed rounds
per convergence check, unlike sequential min-degree peeling whose round
count is the degeneracy ordering length.  Per round: one edge join +
one ranked window + one max aggregate, all JVM-side; convergence is a
single changed-row count.  Differential-tested vs networkx
k_core/core_number; driver-oracled (`graph_kcore`, `graph_core_number`)
against the same loops unrolled in SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..classes.graph import Graph
from ..plans.superstep import _release_state, lineage_cut


def _degrees(edges: DataFrame) -> DataFrame:
    return (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("degree"))
    )


def k_core(G: Graph, k: int) -> Graph:
    """Maximal subgraph where every node has degree >= k (self-loops
    excluded, parallel edges already canonicalized by Graph).  Isolate
    nodes are dropped, matching k_truss's output contract."""
    edges = G.get_property("offdiag").select("src", "dst").transform(lineage_cut)
    m = edges.count()
    while m > 0:
        keep = _degrees(edges).filter(F.col("degree") >= k).select("id")
        kept = (
            edges.join(keep.withColumnRenamed("id", "src"), "src", "left_semi")
            .join(keep.withColumnRenamed("id", "dst"), "dst", "left_semi")
            .select("src", "dst")
            .transform(lineage_cut)
        )
        m2 = kept.count()
        _release_state(edges)
        edges = kept
        if m2 == m:
            break
        m = m2
    nodes = (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    return Graph(edges, nodes, canonicalize=False)


def core_number(G: Graph, max_rounds: int = 100) -> DataFrame:
    """(id: long, core: long) dense over G.nodes — the coreness of every
    node, by iterated neighborhood h-index from the degree vector."""
    sym = G.get_property("sym_edges").select("src", "dst").persist()
    nodes = G.nodes
    c = nodes.join(
        sym.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("core")),
        "id",
        "left",
    ).select("id", F.coalesce("core", F.lit(0)).alias("core"))
    c = lineage_cut(c)
    w = Window.partitionBy("id").orderBy(F.desc("_c"))
    for _ in range(max_rounds):
        nbr = sym.join(
            c.select(F.col("id").alias("dst"), F.col("core").alias("_c")), "dst"
        ).select(F.col("src").alias("id"), "_c")
        h = (
            nbr.withColumn("_r", F.row_number().over(w))
            .filter(F.col("_c") >= F.col("_r"))
            .groupBy("id")
            .agg(F.max("_r").alias("_h"))
        )
        new_c = (
            nodes.join(h, "id", "left")
            .select("id", F.coalesce("_h", F.lit(0)).cast("long").alias("core"))
            .transform(lineage_cut)
        )
        changed = (
            new_c.join(c.withColumnRenamed("core", "_old"), "id")
            .filter(F.col("core") != F.col("_old"))
            .count()
        )
        _release_state(c)
        c = new_c
        if changed == 0:
            break
    sym.unpersist()
    return c


def onion_layers(G: Graph, max_rounds: int = 100_000) -> DataFrame:
    """(id: long, layer: long) dense over G.nodes — the onion
    decomposition (Hebert-Dufresne, Grochow & Allard, Sci. Rep. 6,
    31708 (2016)): the k-core peel's ROUND INDEX, refining coreness
    with each shell's internal organization (nx ``onion_layers``).

    Exact nx semantics, bulk-synchronous: isolates are layer 1 (and
    shift later layers by one); each round removes EVERY node whose
    degree in the current remnant is <= the running core bound (the
    bound only ever rises, to the remnant's min degree), and layer
    membership is decided on the round-start snapshot — nx's
    sequential within-layer decrements never add members mid-layer, so
    the batch formulation is trajectory-identical.

    Unlike ``core_number``'s h-index fixpoint (round count independent
    of the peel order), the layer count IS the output here, so the
    round count equals the number of onion layers — empirically tens
    on link graphs (each layer strips a positive fraction of the
    remaining min-core).  Per round: one degree groupBy + two
    semi-joins on the shrinking remnant, lineage hard-cut, retired
    rounds released — the ``k_core``/``densest`` peel discipline.
    Driver-oracled (`graph_onion`) against the same rounds unrolled in
    SQL with the core bound chained through one-row CTEs.
    """
    sym = G.get_property("sym_edges").select("src", "dst")
    nodes = G.nodes.select("id")
    deg0 = (
        nodes.join(
            sym.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("d")),
            "id",
            "left",
        )
        .select("id", F.coalesce("d", F.lit(0)).alias("d"))
        .transform(lineage_cut)
    )
    parts: list[DataFrame] = []
    iso = deg0.filter(F.col("d") == 0).select("id")
    n_iso = iso.count()
    layer = 1
    if n_iso:
        parts.append(iso.select("id", F.lit(1).cast("long").alias("layer")))
        layer = 2
    live = deg0.filter(F.col("d") > 0).persist()
    edges = sym.transform(lineage_cut)
    core = 1
    r = 0
    while r < max_rounds:
        r += 1
        row = live.agg(
            F.min("d").alias("_min"), F.count("*").alias("_n")
        ).collect()[0]
        if row["_n"] == 0:
            break
        core = max(core, int(row["_min"]))
        batch = live.filter(F.col("d") <= core).select("id").persist()
        parts.append(batch.select("id", F.lit(layer).cast("long").alias("layer")))
        layer += 1
        kept_edges = (
            edges.join(batch.withColumnRenamed("id", "src"), "src", "left_anti")
            .join(batch.withColumnRenamed("id", "dst"), "dst", "left_anti")
            .select("src", "dst")
            .transform(lineage_cut)
        )
        survivors = live.select("id").join(batch, "id", "left_anti")
        new_live = (
            survivors.join(
                kept_edges.groupBy(F.col("src").alias("id")).agg(
                    F.count("*").alias("_d2")
                ),
                "id",
                "left",
            )
            .select("id", F.coalesce("_d2", F.lit(0)).alias("d"))
            .transform(lineage_cut)
        )
        _release_state(live)
        _release_state(edges)
        live, edges = new_live.persist(), kept_edges
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
