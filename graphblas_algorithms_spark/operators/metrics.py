"""Whole-graph mixing / community-quality metrics.

Beyond the reference's operator list (graphblas-algorithms stops at
reciprocity / s_metric, ``structure.py`` here), these are the standard
link-graph health metrics a 100 TB corpus run reports next to PageRank:
degree assortativity, average neighbor degree, rich-club curve, partition
modularity, density.  All are one-or-two-shuffle DataFrame programs:

* one edge-degree join (hash on id, same partitioning the kernels use),
* tiny follow-up aggregates (per-degree histograms, per-community sums)
  that AQE coalesces to a handful of partitions.

Semantics are differential-tested against networkx 3.x
(tests/test_metrics.py); self-loop-free graphs match exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..classes.graph import DiGraph, Graph


def _sym_deg_pairs(G) -> DataFrame:
    """(src, dst, du, dv) over BOTH directions of every undirected edge.

    The joint degree distribution sample networkx builds in
    ``degree_mixing_matrix``: each undirected edge contributes (du, dv)
    and (dv, du).  One broadcast-free hash join per endpoint, both on the
    id key, so a graph already partitioned by src reuses its exchange.
    """
    deg = G.get_property("degrees_minus")
    e = G.get_property("sym_offdiag").select("src", "dst")
    return e.join(
        deg.select(F.col("id").alias("src"), F.col("degree").alias("du")), "src"
    ).join(deg.select(F.col("id").alias("dst"), F.col("degree").alias("dv")), "dst")


def degree_assortativity_coefficient(
    G, x: str = "out", y: str = "in"
) -> float:
    """Pearson correlation of endpoint degrees over edges.

    networkx ``degree_assortativity_coefficient``.  Undirected: both
    orientations of each edge enter the sample (the mixing matrix is
    symmetric); Pearson r is normalization-invariant, so engine-side
    sample ``corr`` equals networkx's population value exactly.
    Directed: ``x``/``y`` pick which degree of src/dst correlates
    (default out-degree of src vs in-degree of dst, the networkx
    default).
    """
    if isinstance(G, DiGraph) and G.is_directed_flag:
        dx = G.get_property("out_degrees" if x == "out" else "in_degrees")
        dy = G.get_property("in_degrees" if y == "in" else "out_degrees")
        j = (
            G.edges.select("src", "dst")
            .join(dx.select(F.col("id").alias("src"), F.col("degree").alias("du")), "src")
            .join(dy.select(F.col("id").alias("dst"), F.col("degree").alias("dv")), "dst")
        )
    else:
        j = _sym_deg_pairs(G)
    # Pearson by hand with try_divide: ANSI mode makes corr() raise on a
    # zero stddev (regular graph); networkx returns nan there — we raise.
    row = j.agg(
        F.try_divide(
            F.covar_samp("du", "dv"),
            F.stddev_samp("du") * F.stddev_samp("dv"),
        ).alias("r")
    ).collect()[0]
    if row["r"] is None:
        raise ValueError("degree assortativity undefined (constant degrees or no edges)")
    return float(row["r"])


def average_neighbor_degree(G, source: str = "out", target: str = "out") -> DataFrame:
    """(id, avg_nbr_deg) — mean degree of each node's neighbors.

    networkx ``average_neighbor_degree``.  Undirected: neighbors via the
    symmetric adjacency, neighbor degree = plain degree.  Directed:
    ``source`` picks which edges leave n (out = successors), ``target``
    which degree of the neighbor is averaged (networkx defaults
    out/out).  Nodes with no qualifying neighbors get 0.0 (networkx
    convention).  One join + one groupBy, both keyed on id.
    """
    if isinstance(G, DiGraph) and G.is_directed_flag:
        e = G.edges.select("src", "dst")
        if source == "in":
            e = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        deg = G.get_property("out_degrees" if target == "out" else "in_degrees")
    else:
        e = G.get_property("sym_edges").select("src", "dst")
        deg = G.get_property("degrees_minus")
    nbr = e.join(
        deg.select(F.col("id").alias("dst"), F.col("degree").alias("_nd")), "dst", "left"
    )
    avg = (
        nbr.groupBy(F.col("src").alias("id"))
        .agg(F.avg(F.coalesce("_nd", F.lit(0))).alias("avg_nbr_deg"))
    )
    return (
        G.nodes.join(avg, "id", "left")
        .select("id", F.coalesce("avg_nbr_deg", F.lit(0.0)).alias("avg_nbr_deg"))
    )


def modularity_by_community(
    G: Graph, communities: DataFrame, weighted: bool = False
) -> DataFrame:
    """Per-community modularity contributions for a given partition.

    ``communities``: (id, community).  Returns one row per community:
    (community, intra_edges, degree_sum, contrib) where
    ``contrib = intra/m - (degree_sum/(2m))^2`` and
    ``sum(contrib) == networkx.community.modularity`` (resolution 1;
    ``weighted=True`` sums edge weights exactly like networkx's
    ``weight="weight"``).  Scale shape: the label table joins the edge
    table twice on the id key (no broadcast needed — labels are O(n) and
    co-partitioned), then two tiny groupBys.
    """
    use_w = weighted and G.weighted
    wcol = F.col("weight").cast("double") if use_w else F.lit(1.0)
    m = float(
        G.edges.agg(F.sum(wcol).alias("w")).collect()[0]["w"] or 0.0
    )
    if m == 0:
        raise ZeroDivisionError("modularity undefined for an empty graph")
    lab = communities.select("id", "community")
    ecols = ["src", "dst"] + (["weight"] if use_w else [])
    e = (
        G.edges.select(*ecols)
        .join(lab.select(F.col("id").alias("src"), F.col("community").alias("_cu")), "src")
        .join(lab.select(F.col("id").alias("dst"), F.col("community").alias("_cv")), "dst")
    )
    intra = (
        e.filter(F.col("_cu") == F.col("_cv"))
        .groupBy(F.col("_cu").alias("community"))
        .agg(F.sum(wcol).alias("intra_edges"))
    )
    # degree_sum uses degrees_plus semantics doubled for self-loops:
    # networkx degree counts a self-loop twice
    off = G.get_property("offdiag")
    diag = G.get_property("diag")
    dparts = [
        off.select(F.col("src").alias("id"), wcol.alias("_w")),
        off.select(F.col("dst").alias("id"), wcol.alias("_w")),
        diag.select(F.col("src").alias("id"), wcol.alias("_w")),
        diag.select(F.col("src").alias("id"), wcol.alias("_w")),
    ]
    dtab = (
        dparts[0]
        .unionByName(dparts[1])
        .unionByName(dparts[2])
        .unionByName(dparts[3])
        .groupBy("id")
        .agg(F.sum("_w").alias("degree"))
    )
    dsum = (
        lab.join(dtab, "id", "left")
        .groupBy("community")
        .agg(F.sum(F.coalesce("degree", F.lit(0.0))).alias("degree_sum"))
    )
    two_m = 2.0 * m
    return (
        dsum.join(intra, "community", "left")
        .select(
            "community",
            F.coalesce("intra_edges", F.lit(0.0)).alias("intra_edges"),
            "degree_sum",
            (
                F.coalesce("intra_edges", F.lit(0.0)) / F.lit(m)
                - (F.col("degree_sum") / F.lit(two_m)) ** 2
            ).alias("contrib"),
        )
    )


def modularity(G: Graph, communities: DataFrame, weighted: bool = False) -> float:
    """networkx ``community.modularity`` (resolution 1)."""
    row = (
        modularity_by_community(G, communities, weighted=weighted)
        .agg(F.sum("contrib").alias("q"))
        .collect()[0]
    )
    return float(row["q"])


def rich_club_coefficient(G: Graph) -> DataFrame:
    """(k, n_nodes, n_edges, phi) — unnormalized rich-club curve.

    networkx ``rich_club_coefficient(G, normalized=False)``: for each
    degree threshold k, phi(k) = 2*E_k / (N_k*(N_k-1)) over the subgraph
    of nodes with degree > k; rows emitted while N_k >= 2 (networkx
    stops when the denominator vanishes).

    Scale shape — NO per-k subgraph materialization: one edge-degree
    join computes min(du, dv) per undirected edge, then two per-degree
    histograms + descending cumulative-sum windows give every N_k / E_k
    in a single pass over tiny aggregates.  The windows run over
    #distinct-degree rows (<= a few thousand even at 10^12 files), so
    the single-partition window is not a bottleneck.
    """
    deg = G.get_property("degrees_minus")
    # node-degree histogram (isolates have degree 0 and never enter deg;
    # networkx counts them in N_0 via degree 0)
    iso_count = G.n - deg.count()
    nhist = deg.groupBy(F.col("degree").alias("d")).agg(F.count("*").alias("n_d"))
    if iso_count:
        zero = G.spark.createDataFrame([(0, iso_count)], "d long, n_d long")
        nhist = nhist.unionByName(zero).groupBy("d").agg(F.sum("n_d").alias("n_d"))
    # per-edge min endpoint degree, each undirected edge once
    e = (
        G.get_property("offdiag")
        .filter(F.col("src") < F.col("dst"))
        .select("src", "dst")
        .join(deg.select(F.col("id").alias("src"), F.col("degree").alias("du")), "src")
        .join(deg.select(F.col("id").alias("dst"), F.col("degree").alias("dv")), "dst")
        .select(F.least("du", "dv").alias("d"))
    )
    ehist = e.groupBy("d").agg(F.count("*").alias("e_d"))
    hist = nhist.join(ehist, "d", "full").select(
        "d",
        F.coalesce("n_d", F.lit(0)).alias("n_d"),
        F.coalesce("e_d", F.lit(0)).alias("e_d"),
    )
    # inclusive descending cumulative: ge(d) = nodes with degree >= d,
    # eg(d) = edges with min endpoint degree >= d
    w = Window.orderBy(F.desc("d")).rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.select(
        "d",
        F.sum("n_d").over(w).alias("ge"),
        F.sum("e_d").over(w).alias("eg"),
    )
    max_k = hist.agg(F.max("d")).collect()[0][0]
    if max_k is None:
        return G.spark.createDataFrame(
            [], "k long, n_nodes long, n_edges long, phi double"
        )
    # N_k = ge(D) at the smallest observed degree D >= k+1: enumerate k,
    # left-join cum at d = k+1, forward-fill (first non-null at larger k
    # is exactly ge at that smallest observed D)
    ks = G.spark.range(0, int(max_k)).select(F.col("id").alias("k"))
    joined = ks.join(cum.select((F.col("d") - 1).alias("k"), "ge", "eg"), "k", "left")
    wfill = Window.orderBy("k").rowsBetween(0, Window.unboundedFollowing)
    filled = joined.select(
        "k",
        F.first("ge", ignorenulls=True).over(wfill).alias("n_nodes"),
        F.coalesce(F.first("eg", ignorenulls=True).over(wfill), F.lit(0)).alias(
            "n_edges"
        ),
    ).filter(F.col("n_nodes") >= 2)
    return filled.select(
        "k",
        "n_nodes",
        "n_edges",
        (2.0 * F.col("n_edges") / (F.col("n_nodes") * (F.col("n_nodes") - 1))).alias(
            "phi"
        ),
    )


def density(G) -> float:
    """networkx ``density``: 2m/(n(n-1)) undirected, m/(n(n-1)) directed."""
    n = G.n
    if n <= 1:
        return 0.0
    m = G.m
    if G.is_directed_flag:
        return m / (n * (n - 1))
    return 2.0 * m / (n * (n - 1))


def degree_histogram(G) -> DataFrame:
    """(degree, n_nodes, frac_ge) — degree distribution with the
    survival fraction P(D >= degree): the power-law tail view a link
    graph is triaged with (nx ``degree_histogram`` + the CCDF plotted
    in every web-graph paper).  Zero-degree nodes included.  One degree
    agg + one histogram agg + a window cumsum over the (tiny) distinct-
    degree table — the only full-data pass is the degree count."""
    from pyspark.sql import Window

    deg = (
        G.nodes.join(
            G.get_property(
                "total_degrees" if G.is_directed_flag else "degrees_plus"
            ),
            "id",
            "left",
        )
        .select(F.coalesce("degree", F.lit(0)).alias("degree"))
    )
    hist = deg.groupBy("degree").agg(F.count(F.lit(1)).alias("n_nodes"))
    n = G.n
    w = Window.orderBy(F.desc("degree")).rowsBetween(Window.unboundedPreceding, 0)
    return hist.select(
        "degree",
        "n_nodes",
        F.round(F.sum("n_nodes").over(w) / F.lit(float(max(n, 1))), 6).alias(
            "frac_ge"
        ),
    )


def powerlaw_alpha(G, d_min: int = 2) -> dict:
    """{'alpha': float, 'd_min': int, 'n_tail': int} — discrete
    power-law exponent by the Clauset-Shalizi-Newman continuous
    approximation MLE over degrees >= d_min:
    alpha = 1 + n_tail / sum ln(d / (d_min - 0.5)).  The number that
    decides whether hub salting is needed (SURVEY: power-law hubs) —
    alpha < 2.5 means heavy hubs, plan the salted vxm."""
    deg = G.get_property("total_degrees" if G.is_directed_flag else "degrees_plus")
    row = (
        deg.filter(F.col("degree") >= d_min)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.log(F.col("degree") / F.lit(d_min - 0.5))).alias("s"),
        )
        .collect()[0]
    )
    n_tail = int(row["n"] or 0)
    if n_tail == 0 or not row["s"]:
        return {"alpha": float("nan"), "d_min": d_min, "n_tail": n_tail}
    return {"alpha": 1.0 + n_tail / float(row["s"]), "d_min": d_min, "n_tail": n_tail}
