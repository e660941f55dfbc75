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
    boundary.

    >>> kg = KeyedGraph(raw_edges, "from_repo", "to_repo", directed=True)
    >>> kg.pagerank().show()          # (key, rank)
    >>> kg.bfs_levels("torch/torch")  # (key, level)
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
