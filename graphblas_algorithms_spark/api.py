"""nxapi-analog convenience layer: key<->id translation + dict outputs.

The reference wraps every kernel in an nxapi shim that converts inputs,
maps ids, and wraps outputs (``nxapi/``, SURVEY §2.3).  Kernels in this
engine speak dense long ids; this module is the only place string keys
appear (renumber-once rule, reference ``classes/_utils.py:11-18``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .classes._utils import edges_from_keys, vector_to_dict
from .classes.graph import DiGraph, Graph


def graph_from_key_edges(
    raw: DataFrame,
    src_key: str,
    dst_key: str,
    weight: str | None = None,
    directed: bool = False,
):
    """Key-typed edge list -> (Graph/DiGraph, nodes dim table).

    ``nodes`` is the (id, key) dim table joined back only at the output
    boundary."""
    edges, nodes = edges_from_keys(raw, src_key, dst_key, weight)
    cls = DiGraph if directed else Graph
    return cls(edges, nodes.select("id")), nodes


def result_with_keys(result: DataFrame, nodes: DataFrame) -> DataFrame:
    """Join keys back onto an (id, ...) result vector for display."""
    return result.join(nodes, "id").select(
        "key", *[c for c in result.columns if c != "id"]
    )


def result_to_dict(result: DataFrame, nodes: DataFrame | None = None, val_col: str | None = None) -> dict:
    """Collect a result vector to {key_or_id: value} (test boundary;
    reference ``vector_to_dict`` ``_utils.py:112-119``)."""
    if nodes is None:
        return vector_to_dict(result, "id", val_col)
    keyed = result_with_keys(result, nodes)
    if val_col is None:
        val_col = [c for c in keyed.columns if c != "key"][0]
    return {r["key"]: r[val_col] for r in keyed.select("key", val_col).collect()}


def pagerank(raw: DataFrame, src_key: str, dst_key: str, **kw) -> dict:
    """End-to-end convenience: key edge list in, {key: rank} out."""
    from .operators.pagerank import pagerank as _pr

    G, nodes = graph_from_key_edges(raw, src_key, dst_key, directed=True)
    return result_to_dict(_pr(G, **kw), nodes, "rank")


class KeyedGraph:
    """The nxapi-analog convenience shell (reference ``nxapi/`` tree,
    SURVEY §2.3): holds the id-typed kernel graph plus the (id, key) dim
    table, translates source keys in and joins keys back onto every
    vector result.  Kernels stay dense-long-id; this is the only string
    boundary.  Covers link analysis, centrality, components, triangles/
    clustering, truss, traversal (incl. multi-source BFS), boundary/cuts,
    keyed matrices (adjacency/laplacian), and binary setops — the setops
    align operands on node KEYS through one combined renumbering, since
    each KeyedGraph's id space is private (r3; reference
    ``nxapi/operators/binary.py`` semantics).

    >>> kg = KeyedGraph(raw_edges, "from_repo", "to_repo", directed=True)
    >>> kg.pagerank().show()          # (key, rank)
    >>> kg.bfs_levels("torch/torch")  # (key, level)
    >>> kg.union(other_kg).edges_with_keys()  # key-aligned setop
    """

    def __init__(
        self,
        raw: DataFrame,
        src_key: str,
        dst_key: str,
        weight: str | None = None,
        directed: bool = False,
    ):
        self.G, self._dim = graph_from_key_edges(
            raw, src_key, dst_key, weight, directed
        )

    # -- boundary helpers --------------------------------------------------
    def _keyed(self, result: DataFrame) -> DataFrame:
        return result_with_keys(result, self._dim)

    def _id_of(self, key) -> int:
        rows = self._dim.filter(F.col("key") == key).limit(1).collect()
        if not rows:
            raise KeyError(key)
        return int(rows[0]["id"])

    def to_dict(self, result: DataFrame, val_col: str | None = None) -> dict:
        if "key" in result.columns:  # already joined back by a method here
            if val_col is None:
                val_col = [c for c in result.columns if c != "key"][0]
            return {r["key"]: r[val_col] for r in result.select("key", val_col).collect()}
        return result_to_dict(result, self._dim, val_col)

    # -- link analysis -----------------------------------------------------
    def pagerank(self, **kw) -> DataFrame:
        from .operators.pagerank import pagerank as _pr

        return self._keyed(_pr(self.G, **kw))

    def hits(self, **kw) -> tuple[DataFrame, DataFrame]:
        from .operators.centrality import hits as _hits

        h, a = _hits(self.G, **kw)
        return self._keyed(h), self._keyed(a)

    def spam_mass(self, trusted_keys, **kw) -> DataFrame:
        """(key, rank, trusted_rank, spam_mass) — TrustRank spam mass
        from a trusted key set."""
        from .operators.pagerank import spam_mass as _f

        ids = [self._id_of(k) for k in trusted_keys]
        return self._keyed(_f(self.G, ids, **kw))

    def personalized_pagerank_multi(self, seed_keys, **kw) -> DataFrame:
        """(seed_key, key, rank) — batched PPR, one shuffle per superstep
        for all seeds."""
        from .operators.ppr import personalized_pagerank_multi as _f

        seeds = self._pivot_ids(seed_keys)
        r = _f(self.G, seeds, **kw)
        dim = self._dim
        return (
            r.join(dim.withColumnRenamed("id", "seed"), "seed")
            .withColumnRenamed("key", "seed_key")
            .join(dim.withColumnRenamed("id", "id"), "id")
            .select("seed_key", "key", "rank")
        )

    # -- centrality --------------------------------------------------------
    def degree_centrality(self) -> DataFrame:
        from .operators.centrality import degree_centrality as _f

        return self._keyed(_f(self.G))

    def in_degree_centrality(self) -> DataFrame:
        from .operators.centrality import in_degree_centrality as _f

        return self._keyed(_f(self.G))

    def out_degree_centrality(self) -> DataFrame:
        from .operators.centrality import out_degree_centrality as _f

        return self._keyed(_f(self.G))

    def eigenvector_centrality(self, **kw) -> DataFrame:
        from .operators.centrality import eigenvector_centrality as _f

        return self._keyed(_f(self.G, **kw))

    def katz_centrality(self, **kw) -> DataFrame:
        from .operators.centrality import katz_centrality as _f

        return self._keyed(_f(self.G, **kw))

    # -- components / communities -----------------------------------------
    def connected_components(self, **kw) -> DataFrame:
        from .operators.components import connected_components as _f

        return self._keyed(_f(self.G, **kw))

    def strongly_connected_components(self, **kw) -> DataFrame:
        from .operators.components import strongly_connected_components as _f

        return self._keyed(_f(self.G, **kw))

    def label_propagation(self, **kw) -> DataFrame:
        from .operators.labelprop import label_propagation as _f

        return self._keyed(_f(self.G, **kw))

    def is_connected(self) -> bool:
        from .operators.components import is_connected as _f

        return _f(self.G)

    # -- triangles / clustering --------------------------------------------
    def triangles(self, **kw) -> DataFrame:
        from .operators.triangles import triangles as _f

        return self._keyed(_f(self.G, **kw))

    def clustering(self, **kw) -> DataFrame:
        from .operators.triangles import clustering as _f

        return self._keyed(_f(self.G, **kw))

    def clustering_directed(self, **kw) -> DataFrame:
        from .operators.cluster_extra import clustering_directed as _f

        return self._keyed(_f(self.G, **kw))

    def square_clustering(self, **kw) -> DataFrame:
        from .operators.cluster_extra import square_clustering as _f

        return self._keyed(_f(self.G, **kw))

    def generalized_degree(self) -> DataFrame:
        from .operators.cluster_extra import generalized_degree as _f

        return self._keyed(_f(self.G))

    def transitivity(self) -> float:
        from .operators.triangles import transitivity as _f

        return _f(self.G)

    def average_clustering(self, **kw) -> float:
        from .operators.triangles import average_clustering as _f

        return _f(self.G, **kw)

    def total_triangles(self) -> int:
        from .operators.triangles import total_triangles as _f

        return _f(self.G)

    def k_truss(self, k: int) -> DataFrame:
        """Surviving edges of the k-truss, keyed (src_key, dst_key)."""
        from .operators.ktruss import k_truss as _f

        K = _f(self.G, k)
        dim = self._dim
        return (
            K.edges.join(dim.withColumnRenamed("id", "src"), "src")
            .withColumnRenamed("key", "src_key")
            .join(dim.withColumnRenamed("id", "dst"), "dst")
            .withColumnRenamed("key", "dst_key")
            .select("src_key", "dst_key")
        )

    def truss_decomposition(self, **kw) -> DataFrame:
        """(src_key, dst_key, trussness) — per-edge trussness."""
        from .operators.ktruss import truss_decomposition as _f

        return self._keyed_pairs(_f(self.G, **kw), ["trussness"])

    def k_core(self, k: int) -> DataFrame:
        """Surviving edges of the k-core, keyed (src_key, dst_key)."""
        from .operators.kcore import k_core as _f

        K = _f(self.G, k)
        dim = self._dim
        return (
            K.edges.join(dim.withColumnRenamed("id", "src"), "src")
            .withColumnRenamed("key", "src_key")
            .join(dim.withColumnRenamed("id", "dst"), "dst")
            .withColumnRenamed("key", "dst_key")
            .select("src_key", "dst_key")
        )

    def core_number(self, **kw) -> DataFrame:
        """(key, core) — every node's coreness."""
        from .operators.kcore import core_number as _f

        return self._keyed(_f(self.G, **kw))

    def onion_layers(self, **kw) -> DataFrame:
        """(key, layer) — onion decomposition (k-core peel round index)."""
        from .operators.kcore import onion_layers as _f

        return self._keyed(_f(self.G, **kw))

    def neighborhood_function(self, **kw) -> list:
        """ANF distance-distribution estimate (aggregate — no key join)."""
        from .operators.anf import neighborhood_function as _f

        return _f(self.G, **kw)

    def hyperball(self, **kw) -> DataFrame:
        """(key, reachable, harmonic, sum_dist) — sketch centralities
        for every node from one O(nnz)-per-round HyperBall pass."""
        from .operators.anf import hyperball as _f

        return self._keyed(_f(self.G, **kw))

    def hyperball_harmonic(self, **kw) -> DataFrame:
        """(key, harmonic) — sketch harmonic centrality, all nodes."""
        from .operators.anf import hyperball_harmonic as _f

        return self._keyed(_f(self.G, **kw))

    def hyperball_closeness(self, **kw) -> DataFrame:
        """(key, closeness) — sketch closeness (wf_improved), all nodes."""
        from .operators.anf import hyperball_closeness as _f

        return self._keyed(_f(self.G, **kw))

    def effective_diameter(self, **kw) -> float:
        from .operators.anf import effective_diameter as _f

        return _f(self.G, **kw)

    def _pivot_ids(self, keys) -> list[int]:
        """Resolve pivot keys to ids, RAISING on unknown keys — a typo'd
        pivot must not silently shrink the sample (``_ids_of``'s inner
        join drops misses, which is right for set ops but not here)."""
        keys = list(keys)
        ids = [r["id"] for r in self._ids_of(keys).collect()]
        if len(ids) != len(set(keys)):
            found = {
                r["key"]
                for r in self._dim.join(
                    self._dim.sparkSession.createDataFrame(
                        [(k,) for k in keys], "key string"
                    ),
                    "key",
                    "left_semi",
                ).collect()
            }
            raise KeyError(sorted(set(keys) - found))
        return ids

    def harmonic_centrality(self, source_keys=None, **kw) -> DataFrame:
        """(key, harmonic) — pass ``source_keys`` for the sampled-pivot form."""
        from .operators.centrality import harmonic_centrality as _f

        srcs = self._pivot_ids(source_keys) if source_keys is not None else None
        return self._keyed(_f(self.G, sources=srcs, **kw))

    def closeness_centrality(self, **kw) -> DataFrame:
        from .operators.centrality import closeness_centrality as _f

        return self._keyed(_f(self.G, **kw))

    def betweenness_centrality(self, source_keys=None, **kw) -> DataFrame:
        """(key, betweenness) — pass ``source_keys`` pivots for the sampled
        Brandes estimator."""
        from .operators.betweenness import betweenness_centrality as _f

        srcs = self._pivot_ids(source_keys) if source_keys is not None else None
        return self._keyed(_f(self.G, sources=srcs, **kw))

    def edge_betweenness_centrality(self, source_keys=None, **kw) -> DataFrame:
        """(src_key, dst_key, betweenness) — Girvan-Newman edge scores
        (exact, or pivot-sampled via source_keys)."""
        from .operators.betweenness import edge_betweenness_centrality as _f

        kw2 = dict(kw)
        if source_keys is not None:
            kw2["sources"] = self._pivot_ids(source_keys)
        return self._keyed_pairs(_f(self.G, **kw2), ["betweenness"])

    def link_prediction(self, pairs=None, **kw) -> DataFrame:
        """(u_key, w_key, cn, jaccard, adamic_adar, resource_allocation,
        pref_attachment) — candidate generation when ``pairs`` is None,
        else scores for the given (u_key, w_key) tuples IN the caller's
        orientation (the kernel canonicalizes by id internally; the
        output here preserves the tuples as passed so callers can join
        results back onto their candidate table)."""
        from .operators.linkpred import _score_pairs, link_prediction_scores

        dim = self._dim
        score_cols = [
            "cn",
            "jaccard",
            "adamic_adar",
            "resource_allocation",
            "pref_attachment",
        ]
        if pairs is None:
            scored = link_prediction_scores(self.G, **kw)
            return (
                scored.join(dim.withColumnRenamed("id", "u"), "u")
                .withColumnRenamed("key", "u_key")
                .join(dim.withColumnRenamed("id", "w"), "w")
                .withColumnRenamed("key", "w_key")
                .select("u_key", "w_key", *score_cols)
            )
        pdf = self.G.spark.createDataFrame(
            list(pairs), "u_key string, w_key string"
        )
        pdf = (
            pdf.join(dim.withColumnRenamed("key", "u_key"), "u_key")
            .withColumnRenamed("id", "_uid")
            .join(dim.withColumnRenamed("key", "w_key"), "w_key")
            .withColumnRenamed("id", "_wid")
            .select(
                "u_key",
                "w_key",
                F.least("_uid", "_wid").alias("u"),
                F.greatest("_uid", "_wid").alias("w"),
            )
        )
        scored = _score_pairs(self.G, pdf.select("u", "w"))
        return pdf.join(scored, ["u", "w"]).select("u_key", "w_key", *score_cols)

    def random_walks(self, walk_length: int, start_keys=None, **kw) -> DataFrame:
        """(start_key, walk, step, key) — deterministic walk corpus."""
        from .operators.walks import random_walks as _f

        starts = self._ids_of(start_keys) if start_keys is not None else None
        w = _f(self.G, walk_length, starts=starts, **kw)
        dim = self._dim
        return (
            w.join(dim.withColumnRenamed("id", "start"), "start")
            .withColumnRenamed("key", "start_key")
            .join(dim.withColumnRenamed("id", "node"), "node")
            .select("start_key", "walk", "step", "key")
        )

    def node2vec_walks(self, walk_length: int, start_keys=None, **kw) -> DataFrame:
        """(start_key, walk, step, key) — p/q-biased walk corpus."""
        from .operators.walks import node2vec_walks as _f

        starts = self._ids_of(start_keys) if start_keys is not None else None
        w = _f(self.G, walk_length, starts=starts, **kw)
        dim = self._dim
        return (
            w.join(dim.withColumnRenamed("id", "start"), "start")
            .withColumnRenamed("key", "start_key")
            .join(dim.withColumnRenamed("id", "node"), "node")
            .select("start_key", "walk", "step", "key")
        )

    def maximal_independent_set(self, **kw) -> DataFrame:
        """(key) — deterministic Luby MIS."""
        from .operators.mis import maximal_independent_set as _f

        return self._keyed(_f(self.G, **kw))

    def greedy_color(self, **kw) -> DataFrame:
        """(key, color) — speculative greedy coloring."""
        from .operators.mis import greedy_color as _f

        return self._keyed(_f(self.G, **kw))

    def bridges(self, **kw) -> DataFrame:
        """(src_key, dst_key) — true bridge edges (cycle-space XOR)."""
        from .operators.bridges import bridges as _f

        return self._keyed_edges(_f(self.G, **kw))

    def two_edge_components(self, **kw) -> DataFrame:
        """(key, component) — 2-edge-connected component labeling."""
        from .operators.bridges import two_edge_components as _f

        return self._keyed(_f(self.G, **kw))

    def has_bridges(self, **kw) -> bool:
        from .operators.bridges import has_bridges as _f

        return _f(self.G, **kw)

    def _bipartite_edges(self, fn: str) -> DataFrame:
        """Edges with the bipartite src/dst parts INTACT — only a
        directed KeyedGraph preserves them: the undirected Graph
        canonicalizes every edge to (least, greatest) over the shared
        dense-id space, interleaving the two parts and silently pairing
        nodes ACROSS parts in the wedge join (ADVICE r3)."""
        if not self.G.is_directed_flag:
            raise ValueError(
                f"{fn} needs the bipartite parts intact, but an undirected "
                "KeyedGraph canonicalizes edges to (least, greatest), "
                "scrambling which side is which.  Build the KeyedGraph "
                "with directed=True (src part -> dst part)."
            )
        return self.G.edges

    def butterfly_count(self, **kw) -> int:
        """Total 2x2 bicliques (bipartite src/dst parts; requires
        directed=True so the parts survive ingest)."""
        from .operators.bipartite import butterfly_count as _f

        return _f(self._bipartite_edges("butterfly_count"), **kw)

    def butterfly_counts(self, side: str = "src", **kw) -> DataFrame:
        """(key, butterflies) — per-node butterfly participation
        (requires directed=True so the parts survive ingest)."""
        from .operators.bipartite import butterfly_counts as _f

        return self._keyed(
            _f(self._bipartite_edges("butterfly_counts"), side=side, **kw)
        )

    def temporal_reachability(
        self, raw: DataFrame, src_col: str, dst_col: str, t_col: str,
        source_keys, **kw
    ) -> DataFrame:
        """(source_key, key, arrival) — time-respecting earliest
        arrival over a keyed timestamped edge DataFrame; keys are
        resolved through this graph's dim table."""
        from .operators.temporal import temporal_reachability as _f

        dim = self._dim
        edges = (
            raw.join(dim.withColumnRenamed("key", src_col), src_col)
            .withColumnRenamed("id", "src")
            .join(
                dim.withColumnRenamed("key", dst_col).withColumnRenamed("id", "dst"),
                dst_col,
            )
            .select("src", "dst", F.col(t_col).alias("t"))
        )
        ids = [self._id_of(k) for k in source_keys]
        out = _f(edges, ids, **kw)
        return (
            out.join(dim.withColumnRenamed("id", "source"), "source")
            .withColumnRenamed("key", "source_key")
            .join(dim, "id")
            .select("source_key", "key", "arrival")
        )

    def spectral_embedding(self, **kw) -> DataFrame:
        """(key, f1, f2, ...) — deflated-power-iteration Laplacian
        eigenvector coordinates (spectral layout / multiway partition)."""
        from .operators.spectral import spectral_embedding as _f

        return self._keyed(_f(self.G, **kw))

    def landmark_distances(self, **kw) -> DataFrame:
        """(key, landmark_key, dist) — precomputed landmark BFS table."""
        from .operators.landmarks import landmark_distance_table as _f

        out = _f(self.G, **kw)
        dim = self._dim
        keyed = (
            out.join(dim, "id")
            .withColumnRenamed("key", "node_key")
            .join(dim.withColumnRenamed("id", "landmark"), "landmark")
            .withColumnRenamed("key", "landmark_key")
        )
        extra = ["direction"] if "direction" in out.columns else []
        return keyed.select("node_key", "landmark_key", "dist", *extra)

    def approx_distances(self, pairs: DataFrame, **kw) -> DataFrame:
        """(u_key, v_key, dist_upper, dist_lower) for key pairs
        (columns u_key, v_key)."""
        from .operators.landmarks import approx_distances as _f

        dim = self._dim
        idp = (
            pairs.join(dim.withColumnRenamed("key", "u_key"), "u_key")
            .withColumnRenamed("id", "u")
            .join(dim.withColumnRenamed("key", "v_key").withColumnRenamed("id", "v"), "v_key")
            .select("u", "v")
        )
        out = _f(self.G, idp, **kw)
        return (
            out.join(dim.withColumnRenamed("id", "u"), "u")
            .withColumnRenamed("key", "u_key")
            .join(dim.withColumnRenamed("id", "v"), "v")
            .withColumnRenamed("key", "v_key")
            .select("u_key", "v_key", "dist_upper", "dist_lower")
        )

    def degree_histogram(self) -> DataFrame:
        from .operators.metrics import degree_histogram as _f

        return _f(self.G)

    def powerlaw_alpha(self, **kw) -> dict:
        from .operators.metrics import powerlaw_alpha as _f

        return _f(self.G, **kw)

    def is_eulerian(self) -> bool:
        from .operators.structure import is_eulerian as _f

        return _f(self.G)

    def has_eulerian_path(self) -> bool:
        from .operators.structure import has_eulerian_path as _f

        return _f(self.G)

    def dominating_set(self, **kw) -> DataFrame:
        """(key) — dominating (and independent) set via the Luby kernel."""
        from .operators.mis import dominating_set as _f

        return self._keyed(_f(self.G, **kw))

    def topological_generations(self, **kw) -> DataFrame:
        """(key, layer) — Kahn generation = longest-path depth (DAG)."""
        from .operators.dag import topological_generations as _f

        return self._keyed(_f(self.G, **kw))

    def topological_sort(self, **kw) -> DataFrame:
        """(key, layer, pos) — deterministic topological order."""
        from .operators.dag import topological_sort as _f

        return self._keyed(_f(self.G, **kw))

    def is_dag(self, **kw) -> bool:
        """True iff no directed cycle (one Kahn peel)."""
        from .operators.dag import is_directed_acyclic_graph as _f

        return _f(self.G, **kw)

    def dag_longest_path_length(self, **kw):
        """Longest directed path length (edges, or weight-summed)."""
        from .operators.dag import dag_longest_path_length as _f

        return _f(self.G, **kw)

    def condensation_layers(self, **kw) -> DataFrame:
        """(component_key, layer) — topological depth of each SCC in
        the condensation DAG (component labeled by its min node key)."""
        from .operators.dag import condensation_layers as _f

        out = _f(self.G, **kw)
        return (
            out.join(self._dim.withColumnRenamed("id", "component"), "component")
            .withColumnRenamed("key", "component_key")
            .select("component_key", "layer")
        )

    def cyclic_core(self, **kw) -> DataFrame:
        """(key) — nodes on or between directed cycles."""
        from .operators.dag import cyclic_core as _f

        return self._keyed(_f(self.G, **kw))

    def maximal_matching(self, **kw) -> DataFrame:
        """(src_key, dst_key) — deterministic dominant-edge matching."""
        from .operators.matching import maximal_matching as _f

        return self._keyed_edges(_f(self.G, **kw))

    def four_cliques(self, **kw) -> DataFrame:
        """(key, cliques4) — per-node 4-clique participation."""
        from .operators.triangles import four_cliques as _f

        return self._keyed(_f(self.G, **kw))

    def effective_size(self, **kw) -> DataFrame:
        """(key, effective_size) — Burt's structural-holes metric."""
        from .operators.structure import effective_size as _f

        return self._keyed(_f(self.G, **kw))

    def local_bridges(self, **kw) -> DataFrame:
        """(src_key, dst_key) — edges on no triangle (span > 2)."""
        from .operators.structure import local_bridges as _f

        return self._keyed_edges(_f(self.G, **kw))

    def coarsen(self, **kw) -> DataFrame:
        """(src_key, dst_key, weight) — one matching-contraction level;
        supernode keys are the representatives' original keys."""
        from .operators.matching import coarsen_graph as _f

        coarse, _ = _f(self.G, **kw)
        return self._keyed_pairs(coarse, ["weight"])

    def min_vertex_cover(self, **kw) -> DataFrame:
        """(key) — 2-approx min vertex cover (matching endpoints)."""
        from .operators.matching import min_vertex_cover_2approx as _f

        return self._keyed(_f(self.G, **kw))

    def densest_subgraph(self, **kw) -> DataFrame:
        """(key) — 2(1+eps)-approx densest-subgraph node set."""
        from .operators.densest import densest_subgraph as _f

        return self._keyed(_f(self.G, **kw))

    def triadic_census(self) -> DataFrame:
        """(triad_type, n) — full 16-class census (no node keys)."""
        from .operators.triads import triadic_census as _f

        return _f(self.G)

    def double_sweep(self, seed_key=None) -> DataFrame:
        """(seed_key_out, far_key, periphery_key, ecc_seed,
        diameter_lb) — double-sweep diameter bound, node columns keyed."""
        from .operators.diameter import double_sweep as _f

        seed = None if seed_key is None else self._id_of(seed_key)
        r = _f(self.G, seed=seed)
        dim = self._dim
        for col, out in [
            ("seed", "seed_key_out"),
            ("far_node", "far_key"),
            ("periphery_node", "periphery_key"),
        ]:
            r = (
                r.join(dim.withColumnRenamed("id", col), col)
                .withColumnRenamed("key", out)
                .drop(col)
            )
        return r.select(
            "seed_key_out", "far_key", "periphery_key", "ecc_seed", "diameter_lb"
        )

    def minimum_spanning_forest(self, **kw) -> DataFrame:
        """(src_key, dst_key, weight) — Borůvka MSF edges."""
        from .operators.msf import minimum_spanning_forest as _f

        t = _f(self.G, **kw)
        dim = self._dim
        return (
            t.join(dim.withColumnRenamed("id", "src"), "src")
            .withColumnRenamed("key", "src_key")
            .join(dim.withColumnRenamed("id", "dst"), "dst")
            .withColumnRenamed("key", "dst_key")
            .select("src_key", "dst_key", "weight")
        )

    # -- traversal / shortest paths ----------------------------------------
    def bfs_levels(self, source_key, **kw) -> DataFrame:
        from .operators.traversal import bfs_levels as _f

        return self._keyed(_f(self.G, self._id_of(source_key), **kw))

    def bfs_parent(self, source_key, **kw) -> DataFrame:
        from .operators.traversal import bfs_parent as _f

        return self._keyed(_f(self.G, self._id_of(source_key), **kw))

    def shortest_path_length(self, source_key, **kw) -> DataFrame:
        from .operators.shortest_paths import bellman_ford_path_length as _f

        return self._keyed(_f(self.G, self._id_of(source_key), **kw))

    def has_path(self, source_key, target_key) -> bool:
        from .operators.shortest_paths import has_path as _f

        return _f(self.G, self._id_of(source_key), self._id_of(target_key))

    def ego_graph(self, source_key, radius: int = 1) -> DataFrame:
        from .operators.structure import ego_graph as _f

        K = _f(self.G, self._id_of(source_key), radius=radius)
        return self._keyed(K.nodes.select("id"))

    # -- structure scalars --------------------------------------------------
    def reciprocity(self) -> float:
        from .operators.structure import overall_reciprocity as _f

        return _f(self.G)

    def s_metric(self) -> float:
        from .operators.structure import s_metric as _f

        return _f(self.G)

    def isolates(self) -> DataFrame:
        from .operators.structure import isolates as _f

        return self._keyed(_f(self.G))

    # -- construction from kernel parts -------------------------------------
    @classmethod
    def _from_parts(cls, G, dim: DataFrame) -> "KeyedGraph":
        """Wrap an already-built id-typed graph + (id, key) dim table."""
        kg = cls.__new__(cls)
        kg.G = G
        kg._dim = dim
        return kg

    def _ids_of(self, keys) -> DataFrame:
        """(id) DataFrame for an iterable of keys (or pass a DataFrame
        with a ``key`` column through the dim join)."""
        if isinstance(keys, DataFrame):
            kdf = keys.select("key")
        else:
            kdf = self._dim.sparkSession.createDataFrame(
                [(k,) for k in keys], "key string"
            )
        return self._dim.join(kdf, "key").select("id")

    def edges_with_keys(self) -> DataFrame:
        """(src_key, dst_key[, weight]) — the id-typed edge list joined
        back to keys (display/interchange boundary)."""
        dim = self._dim
        cols = ["src_key", "dst_key"] + (
            ["weight"] if "weight" in self.G.edges.columns else []
        )
        return (
            self.G.edges.join(dim.withColumnRenamed("id", "src"), "src")
            .withColumnRenamed("key", "src_key")
            .join(dim.withColumnRenamed("id", "dst"), "dst")
            .withColumnRenamed("key", "dst_key")
            .select(*cols)
        )

    # -- binary setops (nxapi analog: operands align on node KEYS) ----------
    def _align(self, other: "KeyedGraph"):
        """Re-express both operands over ONE shared key->id space.

        Each KeyedGraph renumbered its keys independently, so the raw id
        spaces are incomparable; the reference's nxapi setops operate on
        node keys (``nxapi/operators/binary.py``).  One combined
        renumbering (renumber-once rule), then both edge lists remapped —
        each aligned graph keeps its OWN node set inside the shared space
        (intersection/difference semantics need that)."""
        from .classes._utils import assign_dense_ids

        if self.G.is_directed_flag != other.G.is_directed_flag:
            raise ValueError("operands must both be directed or both undirected")
        cls = type(self.G)
        all_keys = self._dim.select("key").unionByName(other._dim.select("key"))
        dim = assign_dense_ids(all_keys, "key")

        def remap(kg):
            ke = kg.edges_with_keys()
            cols = ["src", "dst"] + (["weight"] if "weight" in ke.columns else [])
            edges = (
                ke.join(dim.withColumnRenamed("key", "src_key"), "src_key")
                .withColumnRenamed("id", "src")
                .join(
                    dim.select(
                        F.col("id").alias("dst"), F.col("key").alias("dst_key")
                    ),
                    "dst_key",
                )
                .select(*cols)
            )
            nodes = dim.join(kg._dim.select("key"), "key").select("id")
            return cls(edges, nodes)

        return remap(self), remap(other), dim

    def _binary_setop(self, other: "KeyedGraph", op) -> "KeyedGraph":
        Ga, Hb, dim = self._align(other)
        R = op(Ga, Hb)
        # keep only keys of surviving nodes in the result's dim
        rdim = dim.join(R.nodes, "id")
        return KeyedGraph._from_parts(R, rdim)

    def union(self, other: "KeyedGraph") -> "KeyedGraph":
        from .operators.setops import union as _op

        return self._binary_setop(other, _op)

    def intersection(self, other: "KeyedGraph") -> "KeyedGraph":
        from .operators.setops import intersection as _op

        return self._binary_setop(other, _op)

    def difference(self, other: "KeyedGraph") -> "KeyedGraph":
        from .operators.setops import difference as _op

        return self._binary_setop(other, _op)

    def symmetric_difference(self, other: "KeyedGraph") -> "KeyedGraph":
        from .operators.setops import symmetric_difference as _op

        return self._binary_setop(other, _op)

    def compose(self, other: "KeyedGraph") -> "KeyedGraph":
        from .operators.setops import compose as _op

        return self._binary_setop(other, _op)

    # -- unary graph->graph --------------------------------------------------
    def complement(self) -> "KeyedGraph":
        from .operators.setops import complement as _op

        return KeyedGraph._from_parts(_op(self.G), self._dim)

    def reverse(self) -> "KeyedGraph":
        from .operators.setops import reverse as _op

        return KeyedGraph._from_parts(_op(self.G), self._dim)

    def to_undirected(self) -> "KeyedGraph":
        from .operators.setops import to_undirected as _op

        return KeyedGraph._from_parts(_op(self.G), self._dim)

    # -- boundary / cuts -----------------------------------------------------
    def _keyed_edges(self, edges: DataFrame) -> DataFrame:
        dim = self._dim
        return (
            edges.join(dim.withColumnRenamed("id", "src"), "src")
            .withColumnRenamed("key", "src_key")
            .join(dim.withColumnRenamed("id", "dst"), "dst")
            .withColumnRenamed("key", "dst_key")
            .select("src_key", "dst_key")
        )

    def _keyed_pairs(self, df: DataFrame, extra: list[str]) -> DataFrame:
        """(src_key, dst_key, *extra) — like _keyed_edges but keeps the
        payload columns sampling results carry (hop/j/label/split)."""
        dim = self._dim
        return (
            df.join(dim.withColumnRenamed("id", "src"), "src")
            .withColumnRenamed("key", "src_key")
            .join(dim.withColumnRenamed("id", "dst"), "dst")
            .withColumnRenamed("key", "dst_key")
            .select("src_key", "dst_key", *extra)
        )

    # -- training-set sampling ------------------------------------------------
    def negative_edge_sample(self, k: int, **kw) -> DataFrame:
        """(src_key, dst_key, j) — deterministic non-edge draws."""
        from .operators.sampling import negative_edge_sample as _f

        return self._keyed_pairs(_f(self.G, k, **kw), ["j"])

    def khop_neighbor_sample(self, fanouts=(10, 5), seed_keys=None, **kw) -> DataFrame:
        """(src_key, dst_key, hop) — layer-wise fanout-sampled blocks."""
        from .operators.sampling import khop_neighbor_sample as _f

        seeds = self._ids_of(seed_keys) if seed_keys is not None else None
        return self._keyed_pairs(
            _f(self.G, seeds=seeds, fanouts=fanouts, **kw), ["hop"]
        )

    def linkpred_training_set(self, k: int, **kw) -> DataFrame:
        """(src_key, dst_key, label, split) — positives + sampled negatives."""
        from .operators.sampling import linkpred_training_set as _f

        return self._keyed_pairs(_f(self.G, k, **kw), ["label", "split"])

    def edge_boundary(self, s_keys, t_keys=None) -> DataFrame:
        from .operators.boundary import edge_boundary as _f

        t = self._ids_of(t_keys) if t_keys is not None else None
        return self._keyed_edges(_f(self.G, self._ids_of(s_keys), t))

    def node_boundary(self, s_keys) -> DataFrame:
        from .operators.boundary import node_boundary as _f

        return self._keyed(_f(self.G, self._ids_of(s_keys)))

    def cut_size(self, s_keys, t_keys=None) -> int:
        from .operators.boundary import cut_size as _f

        t = self._ids_of(t_keys) if t_keys is not None else None
        return _f(self.G, self._ids_of(s_keys), t)

    def volume(self, s_keys) -> int:
        from .operators.boundary import volume as _f

        return _f(self.G, self._ids_of(s_keys))

    def conductance(self, s_keys, t_keys=None) -> float:
        from .operators.boundary import conductance as _f

        t = self._ids_of(t_keys) if t_keys is not None else None
        return _f(self.G, self._ids_of(s_keys), t)

    def normalized_cut_size(self, s_keys, t_keys=None) -> float:
        from .operators.boundary import normalized_cut_size as _f

        t = self._ids_of(t_keys) if t_keys is not None else None
        return _f(self.G, self._ids_of(s_keys), t)

    # -- linalg (matrices keyed on both axes) --------------------------------
    def _keyed_matrix(self, M: DataFrame) -> DataFrame:
        dim = self._dim
        return (
            M.join(dim.withColumnRenamed("id", "row"), "row")
            .withColumnRenamed("key", "row_key")
            .join(dim.withColumnRenamed("id", "col"), "col")
            .withColumnRenamed("key", "col_key")
            .select("row_key", "col_key", "value")
        )

    def adjacency_matrix(self, weighted: bool = True) -> DataFrame:
        from .operators.linalg import adjacency_matrix as _f

        return self._keyed_matrix(_f(self.G, weighted))

    def laplacian_matrix(self) -> DataFrame:
        from .operators.linalg import laplacian_matrix as _f

        return self._keyed_matrix(_f(self.G))

    def normalized_laplacian_matrix(self) -> DataFrame:
        from .operators.linalg import normalized_laplacian_matrix as _f

        return self._keyed_matrix(_f(self.G))

    # -- multi-source traversal ----------------------------------------------
    def bfs_levels_multi(self, source_keys, **kw) -> DataFrame:
        """(source_key, key, level) — batched multi-source BFS."""
        from .operators.traversal import bfs_levels_multi as _f

        srcs = [self._id_of(k) for k in source_keys]
        res = _f(self.G, srcs, **kw)
        dim = self._dim
        return (
            res.join(dim.withColumnRenamed("id", "source"), "source")
            .withColumnRenamed("key", "source_key")
            .join(dim, "id")
            .select("source_key", "key", "level")
        )

    def descendants(self, source_key) -> DataFrame:
        from .operators.traversal import descendants as _f

        return self._keyed(_f(self.G, self._id_of(source_key)))

    def ancestors(self, source_key) -> DataFrame:
        from .operators.traversal import ancestors as _f

        return self._keyed(_f(self.G, self._id_of(source_key)))

    def descendants_at_distance(self, source_key, distance: int) -> DataFrame:
        from .operators.traversal import descendants_at_distance as _f

        return self._keyed(_f(self.G, self._id_of(source_key), distance))
