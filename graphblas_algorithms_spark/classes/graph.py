"""Graph / DiGraph: EdgeFrame + NodeFrame + property cache.

Reference data model (``graphblas_algorithms/classes/graph.py:303-449``,
``digraph.py:444-622``): a square sparse adjacency Matrix plus a
``_key_to_id`` dict plus a ``_cache`` of derived properties with a
cheapest-derivation network (``graph.py:272-361``, ``_caching.py:7-185``).

Spark-first redesign (NOT a port):

* adjacency Matrix  -> ``edges`` DataFrame ``(src:long, dst:long
  [, weight:double])``.  Unweighted graphs carry NO weight column — the
  Spark analog of SuiteSparse iso-valued matrices (``graph.py:217-249``):
  the constant folds into the plan instead of being stored per edge.
* undirected Graph stores each edge ONCE in canonical orientation
  ``src <= dst`` (the reference's U/L triangular views,
  ``graph.py:40-111``); the symmetrized both-directions view is a derived,
  persisted property.
* ``_cache`` -> ``properties`` dict of persisted DataFrames.  The
  reference's elaborate derivation-shortcut web exists because SuiteSparse
  re-scans are expensive; with persisted base edges + Catalyst, plain
  memoization suffices (SURVEY §1.4).
* node ids are dense longs (renumber-once, ``classes/_utils.py:11-18``);
  ``nodes`` is the optional ``(id, key)`` dim table joined back only at
  the output boundary.

Scale notes: ``partition_by_src()`` hash-partitions edges once and
persists, so every per-superstep join against a rank/frontier vector
reuses the same partitioning (one shuffle side pre-placed).  Degrees and
counts are persisted scalar/vector properties — computed once, reused by
every kernel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _has_weight(df: DataFrame) -> bool:
    return "weight" in df.columns


class _BaseGraph:
    """Shared property-cache machinery (reference ``_cache``, graph.py:272-300)."""

    is_directed_flag = False

    def __init__(self, edges: DataFrame, nodes: DataFrame | None = None):
        self.spark = edges.sparkSession
        self.edges = edges
        self._nodes = nodes
        self._cache: dict[str, DataFrame] = {}
        self._scalars: dict[str, object] = {}

    # -- property cache ---------------------------------------------------
    def get_property(self, name: str) -> DataFrame:
        """Memoized derived DataFrame, persisted on first access."""
        if name not in self._cache:
            df = getattr(self, f"_prop_{name}")()
            self._cache[name] = df.persist()
        return self._cache[name]

    def get_scalar(self, name: str):
        if name not in self._scalars:
            self._scalars[name] = getattr(self, f"_scalar_{name}")()
        return self._scalars[name]

    def clear_cache(self) -> None:
        """Reference bench protocol clears the cache between runs
        (``scripts/bench.py:166``)."""
        for df in self._cache.values():
            df.unpersist()
        self._cache.clear()
        self._scalars.clear()

    # -- shared properties -------------------------------------------------
    @property
    def weighted(self) -> bool:
        return _has_weight(self.edges)

    @property
    def nodes(self) -> DataFrame:
        """(id: long) node table; derived from edge endpoints if not given."""
        if self._nodes is None:
            self._nodes = (
                self.edges.select(F.col("src").alias("id"))
                .unionByName(self.edges.select(F.col("dst").alias("id")))
                .distinct()
                .persist()
            )
        return self._nodes

    def _scalar_n(self) -> int:
        return self.nodes.count()

    @property
    def n(self) -> int:
        return self.get_scalar("n")

    def _scalar_has_self_edges(self) -> bool:
        # reference: graph.py:195-214 (with ~10 inference shortcuts we drop)
        return self.edges.filter(F.col("src") == F.col("dst")).limit(1).count() > 0

    @property
    def has_self_edges(self) -> bool:
        return self.get_scalar("has_self_edges")

    def _prop_offdiag(self) -> DataFrame:
        # select.offdiag — graph.py:24-37
        return self.edges.filter(F.col("src") != F.col("dst"))

    def _prop_sym_offdiag(self) -> DataFrame:
        """Both-direction simple adjacency (src, dst): off-diagonal edges
        symmetrized — the neighbor relation the undirected kernels
        (linkpred / MIS / Brandes) all share.  Duplicate-free here
        because Graph stores one canonical row per undirected edge;
        DiGraph overrides with a distinct."""
        off = self.get_property("offdiag").select("src", "dst")
        return off.unionByName(
            off.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )

    def partition_by_src(self, num_partitions: int | None = None) -> None:
        """Hash-partition edges by ``src`` once; every frontier/rank join in
        the superstep loops then reuses this placement (SURVEY O14)."""
        if num_partitions is None:
            num_partitions = self.spark.sparkContext.defaultParallelism
        self.edges = self.edges.repartition(num_partitions, "src").persist()
        self.edges.count()

    def persist(self) -> "_BaseGraph":
        self.edges = self.edges.persist()
        return self


class Graph(_BaseGraph):
    """Undirected graph; edges stored once in canonical ``src <= dst``.

    Mirrors reference ``classes/graph.py:303-449`` semantics: self-edges
    allowed (the diagonal); ``+``/``-`` property suffix = with/without
    self-edges (``graph.py:307``).
    """

    is_directed_flag = False

    def __init__(
        self,
        edges: DataFrame,
        nodes: DataFrame | None = None,
        canonicalize: bool = True,
    ):
        if canonicalize:
            lo = F.least("src", "dst")
            hi = F.greatest("src", "dst")
            cols = [lo.alias("src"), hi.alias("dst")]
            if _has_weight(edges):
                # max() is an arbitrary-but-deterministic dedup for weights of
                # duplicate undirected entries
                edges = (
                    edges.select(*cols, "weight")
                    .groupBy("src", "dst")
                    .agg(F.max("weight").alias("weight"))
                )
            else:
                edges = edges.select(*cols).distinct()
        super().__init__(edges, nodes)

    # -- structural views (graph.py:40-131) --------------------------------
    def _prop_U_minus(self) -> DataFrame:
        """Strict upper triangle (``select.triu(A, 1)``, graph.py:85)."""
        return self.edges.filter(F.col("src") < F.col("dst"))

    def _prop_diag(self) -> DataFrame:
        return self.edges.filter(F.col("src") == F.col("dst"))

    def _prop_sym_edges(self) -> DataFrame:
        """Both-directions adjacency (the actual square matrix A).

        Self-edges appear once.  Every mxv/vxm kernel runs over this view.
        """
        fwd = self.edges
        cols = ["dst", "src"] + (["weight"] if self.weighted else [])
        bwd = (
            self.edges.filter(F.col("src") != F.col("dst"))
            .select(*cols)
            .toDF(*fwd.columns)
        )
        return fwd.unionByName(bwd)

    def _prop_degrees_minus(self) -> DataFrame:
        """Degree excluding self-edges — ``count_rowwise-`` (graph.py:354-361).

        (id: long, degree: long)
        """
        off = self.get_property("offdiag")
        return (
            off.select(F.col("src").alias("id"))
            .unionByName(off.select(F.col("dst").alias("id")))
            .groupBy("id")
            .agg(F.count("*").alias("degree"))
        )

    def _prop_degrees_plus(self) -> DataFrame:
        """Degree including self-edges (counted once), ``count_rowwise+``."""
        return (
            self.edges.select(F.col("src").alias("id"))
            .unionByName(
                self.edges.filter(F.col("src") != F.col("dst")).select(
                    F.col("dst").alias("id")
                )
            )
            .groupBy("id")
            .agg(F.count("*").alias("degree"))
        )

    def _scalar_m(self) -> int:
        """Number of undirected edges (diagonal counted once)."""
        return self.edges.count()

    @property
    def m(self) -> int:
        return self.get_scalar("m")

    def to_directed(self) -> "DiGraph":
        return DiGraph(self.get_property("sym_edges"), self._nodes)


class DiGraph(_BaseGraph):
    """Directed graph; edges as given (reference ``digraph.py:444-622``)."""

    is_directed_flag = True

    def __init__(self, edges: DataFrame, nodes: DataFrame | None = None, dedup: bool = True):
        if dedup:
            if _has_weight(edges):
                edges = edges.groupBy("src", "dst").agg(F.max("weight").alias("weight"))
            else:
                edges = edges.distinct()
        super().__init__(edges, nodes)

    def _prop_AT(self) -> DataFrame:
        """Transpose = column swap (``digraph.py:24-30``)."""
        cols = ["dst", "src"] + (["weight"] if self.weighted else [])
        return self.edges.select(*cols).toDF(*self.edges.columns)

    def _prop_sym_edges(self) -> DataFrame:
        """``A | A.T`` pattern union — ``to_undirected`` semantics
        (``digraph.py:604-612``), unweighted."""
        return (
            self.edges.select("src", "dst")
            .unionByName(self.edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
            .distinct()
        )

    def _prop_sym_offdiag(self) -> DataFrame:
        """Undirected simple neighbor relation of a digraph: off-diagonal
        ``A | A.T`` pattern (distinct — reciprocal edges collapse)."""
        off = self.get_property("offdiag").select("src", "dst")
        return (
            off.unionByName(
                off.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
            ).distinct()
        )

    def _prop_out_degrees(self) -> DataFrame:
        """(id, degree) — ``plus_rowwise+`` analog (digraph.py:450-484)."""
        return self.edges.groupBy(F.col("src").alias("id")).agg(
            F.count("*").alias("degree")
        )

    def _prop_in_degrees(self) -> DataFrame:
        return self.edges.groupBy(F.col("dst").alias("id")).agg(
            F.count("*").alias("degree")
        )

    def _prop_total_degrees(self) -> DataFrame:
        """in+out (``total_degrees±`` digraph.py:238-295); self-edges count
        twice, matching ``nx.DiGraph.degree``."""
        return (
            self.edges.select(F.col("src").alias("id"))
            .unionByName(self.edges.select(F.col("dst").alias("id")))
            .groupBy("id")
            .agg(F.count("*").alias("degree"))
        )

    def _scalar_m(self) -> int:
        return self.edges.count()

    @property
    def m(self) -> int:
        return self.get_scalar("m")

    def reverse(self) -> "DiGraph":
        """Edge-reversed view (``operators/unary.py:15-18``)."""
        return DiGraph(self.get_property("AT"), self._nodes, dedup=False)

    def to_undirected(self, weighted: bool = False) -> Graph:
        """``binary.any(A | A.T)`` (``digraph.py:604-612``).

        ``weighted=True`` keeps weights: reciprocal pairs merge by max
        (the Graph constructor's arbitrary-but-deterministic dedup,
        matching the undirected-dup rule in ``Graph.__init__``) — the
        weighted undirected view VERDICT r2 flagged as unconstructible."""
        if weighted and self.weighted:
            return Graph(
                self.edges.select("src", "dst", "weight"),
                self._nodes,
                canonicalize=True,
            )
        return Graph(self.edges.select("src", "dst"), self._nodes, canonicalize=True)


def from_edgelist(
    spark,
    pairs,
    directed: bool = False,
    weighted: bool = False,
    nodes: list[int] | None = None,
):
    """Test-boundary constructor from python tuples.

    ``pairs``: [(src, dst)] or [(src, dst, weight)].
    ``nodes``: optional explicit node-id list (for isolated vertices).
    """
    if weighted:
        df = spark.createDataFrame(
            [(int(s), int(d), float(w)) for s, d, w in pairs],
            "src long, dst long, weight double",
        )
    else:
        df = spark.createDataFrame(
            [(int(s), int(d)) for s, d, *rest in pairs], "src long, dst long"
        )
    nodes_df = None
    if nodes is not None:
        nodes_df = spark.createDataFrame([(int(i),) for i in nodes], "id long")
    cls = DiGraph if directed else Graph
    return cls(df, nodes_df)


def from_networkx(spark, nxg):
    """Oracle-side ingest for differential tests (reference
    ``classes/_utils.py:11-18``). Node labels must already be ints."""
    weighted = any("weight" in d for _, _, d in nxg.edges(data=True))
    pairs = [
        (u, v, d.get("weight", 1.0)) if weighted else (u, v)
        for u, v, d in nxg.edges(data=True)
    ]
    return from_edgelist(
        spark,
        pairs,
        directed=nxg.is_directed(),
        weighted=weighted,
        nodes=list(nxg.nodes()),
    )
