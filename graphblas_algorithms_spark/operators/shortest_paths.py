"""Shortest paths: unweighted (BFS) and weighted (delta Bellman-Ford).

Reference ``algorithms/shortest_paths/``:

* ``single_source_shortest_path_length`` -> ``_bfs_level``
  (``unweighted.py:14-15``).
* ``single_source_bellman_ford_path_length`` (``weighted.py:17-111``):
  frontier-delta Bellman-Ford — only improved vertices stay in ``cur``
  (``:66-83``); iso-weight graphs degrade to BFS (``:25-38``, our O3
  analog: no weight column -> BFS); negative-cycle check after n-1
  rounds (``:87-100``).
* multi-source variant batches sources as a matrix (``weighted.py:118-197``)
  -> extra ``source`` key column.
* ``bellman_ford_path`` reconstructs parents (``weighted.py:213-308``) —
  here a single ``min_by(struct(dist, src))`` carries (dist, parent) in
  one agg (SURVEY table row).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..exceptions import Unbounded
from ..functions.joins import edge_join

from ..plans.superstep import lineage_cut
from .traversal import bfs_levels, bfs_levels_multi


def _wadj(G, transpose: bool = False) -> DataFrame:
    if G.is_directed_flag:
        adj = G.edges
    else:
        adj = G.get_property("sym_edges")
    if "weight" not in adj.columns:
        adj = adj.withColumn("weight", F.lit(1.0))
    cols = ["src", "dst", "weight"]
    if transpose:
        return adj.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), "weight"
        )
    return adj.select(*cols)


def single_source_shortest_path_length(G, source: int, cutoff: int | None = None) -> DataFrame:
    """(id, length: long) — BFS levels (``unweighted.py:14-15``)."""
    return bfs_levels(G, source, cutoff=cutoff).withColumnRenamed("level", "length")


def single_target_shortest_path_length(G, target: int, cutoff: int | None = None) -> DataFrame:
    """Transpose BFS (``unweighted.py:18-19``)."""
    return bfs_levels(G, target, cutoff=cutoff, transpose=True).withColumnRenamed(
        "level", "length"
    )


#: refusal threshold for the IMPLICIT all-pivots (sources=None) exact
#: centrality paths: n BFS sweeps price O(n * nnz) work — a week-long job
#: at web scale.  Mirrors pipeline/similarity.py's ALL_PAIRS_MAX_N guard.
EXACT_SOURCES_MAX = 10_000


def _source_chunks(
    G,
    sources: list[int] | None,
    chunk_size: int | None,
    max_sources: int | None = None,
    caller: str = "all_pairs_shortest_path_length",
    alt: str = "an explicit pivot-sampled source list",
):
    """Split the source list into bounded batches — the Spark analog of the
    nxapi "10 MiB" chunker (``nxapi/shortest_paths/unweighted.py:30-45``):
    each batch's dense state is |chunk| x n rows; the default bounds that
    at ~4M rows (~64 MiB of (source,id,level) longs) so one unbounded
    batch never owns the whole n^2 state.

    ``max_sources`` guards the implicit sources=None expansion (checked
    against G.n BEFORE collecting node ids): above it the call refuses,
    naming the pivot-sampled estimator — the exact path is priced out of
    reach by design, and unlike a slow answer a refusal is actionable."""
    if sources is None:
        if max_sources is not None and G.n > max_sources:
            raise ValueError(
                f"{caller} with sources=None schedules one BFS per node "
                f"({G.n:,} nodes > max_sources={max_sources:,}) — the exact "
                f"all-pivots form is O(n*nnz).  Use {alt}, or pass "
                "max_sources=None to force the exact sweep."
            )
        sources = [r["id"] for r in G.nodes.orderBy("id").collect()]
    if chunk_size is None:
        n = max(G.n, 1)
        chunk_size = max(1, 4_000_000 // n)
    return [sources[i : i + chunk_size] for i in range(0, len(sources), chunk_size)]


def all_pairs_shortest_path_length(
    G,
    sources: list[int] | None = None,
    chunk_size: int | None = None,
    transpose: bool = False,
    max_sources: int | None = None,
) -> DataFrame:
    """(source, id, length) — batched multi-source BFS
    (``unweighted.py:22-29``), source list chunked per
    ``nxapi/shortest_paths/unweighted.py:30-45`` so each batch's frontier
    state stays bounded; chunk results are materialized then unioned.
    ``transpose`` walks reversed edges (incoming distances)."""
    chunks = _source_chunks(G, sources, chunk_size, max_sources=max_sources)
    parts = []
    for chunk in chunks:
        part = bfs_levels_multi(G, chunk, transpose=transpose).withColumnRenamed(
            "level", "length"
        )
        if len(chunks) > 1:
            part = part.transform(lineage_cut)
        parts.append(part)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def bellman_ford_path_length(
    G,
    source: int,
    fixed_iters: int | None = None,
    check_negative_cycle: bool = True,
) -> DataFrame:
    """(id, dist: double) — frontier-delta Bellman-Ford
    (``weighted.py:17-111``). Unweighted graphs take the BFS fast path
    (``:25-38``)."""
    if not G.weighted and fixed_iters is None:
        lv = bfs_levels(G, source)
        return lv.select("id", F.col("level").cast("double").alias("dist"))
    spark = G.spark
    adj = _wadj(G).persist()
    dist = spark.createDataFrame([(int(source), 0.0)], "id long, dist double").persist()
    frontier = dist
    n = G.n
    rounds = fixed_iters if fixed_iters is not None else n - 1
    improved_after = False
    for it in range(max(rounds, 0) + (1 if check_negative_cycle and fixed_iters is None else 0)):
        # min_plus semiring step over the delta frontier only (O7)
        cand = (
            edge_join(frontier, adj, payload=["dist"], keep_weight="_w")
            .groupBy("id")
            .agg(F.min(F.col("dist") + F.col("_w")).alias("_cand"))
        )
        improved = (
            cand.join(dist.withColumnRenamed("dist", "_cur"), "id", "left")
            .filter(F.col("_cur").isNull() | (F.col("_cand") < F.col("_cur")))
            .select("id", F.col("_cand").alias("dist"))
            .persist()
        )
        n_improved = improved.count()
        if n_improved == 0:
            improved.unpersist()
            break
        if it >= rounds:
            improved_after = True
            break
        dist = (
            dist.join(improved.withColumnRenamed("dist", "_new"), "id", "full")
            .select(
                "id",
                F.when(
                    F.col("_new").isNotNull()
                    & (F.col("dist").isNull() | (F.col("_new") < F.col("dist"))),
                    F.col("_new"),
                )
                .otherwise(F.col("dist"))
                .alias("dist"),
            )
            .transform(lineage_cut)
        )
        frontier = improved
    adj.unpersist()
    if improved_after:
        raise Unbounded("negative cycle detected")  # weighted.py:87-100
    return dist


def bellman_ford_path_lengths(
    G, sources: list[int], chunk_size: int | None = None
) -> DataFrame:
    """(source, id, dist) — multi-source batched (``weighted.py:118-197``),
    source list chunked like :func:`all_pairs_shortest_path_length` so the
    per-batch (source, id) state stays bounded."""
    chunks = _source_chunks(G, list(sources), chunk_size)
    if len(chunks) > 1:
        parts = [
            _bellman_ford_path_lengths_batch(G, c).transform(lineage_cut)
            for c in chunks
        ]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out
    return _bellman_ford_path_lengths_batch(G, chunks[0])


def _bellman_ford_path_lengths_batch(G, sources: list[int]) -> DataFrame:
    spark = G.spark
    adj = _wadj(G).persist()
    dist = spark.createDataFrame(
        [(int(s), int(s), 0.0) for s in sources], "source long, id long, dist double"
    ).persist()
    frontier = dist
    n = G.n
    for _ in range(n - 1):
        cand = (
            edge_join(frontier, adj, payload=["source", "dist"], keep_weight="_w")
            .groupBy("source", "id")
            .agg(F.min(F.col("dist") + F.col("_w")).alias("_cand"))
        )
        improved = (
            cand.join(
                dist.withColumnRenamed("dist", "_cur"), ["source", "id"], "left"
            )
            .filter(F.col("_cur").isNull() | (F.col("_cand") < F.col("_cur")))
            .select("source", "id", F.col("_cand").alias("dist"))
            .persist()
        )
        if improved.count() == 0:
            improved.unpersist()
            break
        dist = (
            dist.join(
                improved.withColumnRenamed("dist", "_new"), ["source", "id"], "full"
            )
            .select(
                "source",
                "id",
                F.when(
                    F.col("_new").isNotNull()
                    & (F.col("dist").isNull() | (F.col("_new") < F.col("dist"))),
                    F.col("_new"),
                )
                .otherwise(F.col("dist"))
                .alias("dist"),
            )
            .transform(lineage_cut)
        )
        frontier = improved
    adj.unpersist()
    return dist


def bellman_ford_path(G, source: int) -> DataFrame:
    """(id, dist, parent) — parent carried through the min agg as
    min(struct(dist, parent)) (vs the reference's reverse-engineering at
    ``weighted.py:268-284``)."""
    spark = G.spark
    adj = _wadj(G).persist()
    dist = spark.createDataFrame(
        [(int(source), 0.0, int(source))], "id long, dist double, parent long"
    ).persist()
    frontier = dist.select("id", "dist")
    n = G.n
    for _ in range(n - 1):
        cand = (
            edge_join(frontier, adj, payload=["dist"], keep_src="_p", keep_weight="_w")
            .groupBy("id")
            .agg(
                F.min(
                    F.struct(
                        (F.col("dist") + F.col("_w")).alias("d"),
                        F.col("_p").alias("p"),
                    )
                ).alias("_m")
            )
            .select("id", F.col("_m.d").alias("_cand"), F.col("_m.p").alias("_par"))
        )
        improved = (
            cand.join(dist.select("id", F.col("dist").alias("_cur")), "id", "left")
            .filter(F.col("_cur").isNull() | (F.col("_cand") < F.col("_cur")))
            .select("id", F.col("_cand").alias("dist"), F.col("_par").alias("parent"))
            .persist()
        )
        if improved.count() == 0:
            improved.unpersist()
            break
        dist = (
            dist.join(
                improved.select(
                    "id", F.col("dist").alias("_nd"), F.col("parent").alias("_np")
                ),
                "id",
                "full",
            )
            .select(
                "id",
                F.when(
                    F.col("_nd").isNotNull()
                    & (F.col("dist").isNull() | (F.col("_nd") < F.col("dist"))),
                    F.col("_nd"),
                )
                .otherwise(F.col("dist"))
                .alias("dist"),
                F.when(
                    F.col("_nd").isNotNull()
                    & (F.col("dist").isNull() | (F.col("_nd") < F.col("dist"))),
                    F.col("_np"),
                )
                .otherwise(F.col("parent"))
                .alias("parent"),
            )
            .transform(lineage_cut)
        )
        frontier = improved.select("id", "dist")
    adj.unpersist()
    return dist


def bidirectional_shortest_path_length(G, source: int, target: int) -> int | None:
    """Meet-in-the-middle BFS (``unweighted.py:32-64``): expand the smaller
    frontier each round; stop when the frontiers intersect
    (``any_pair(q_src @ q_dst)`` meet test at ``:53``).  Returns the hop
    count, or None if unreachable."""
    if source == target:
        return 0
    spark = G.spark
    fwd_adj = _wadj(G).select("src", "dst").persist()
    bwd_adj = _wadj(G, transpose=True).select("src", "dst").persist()
    f = spark.createDataFrame([(int(source),)], "id long").persist()
    b = spark.createDataFrame([(int(target),)], "id long").persist()
    seen_f, seen_b = f, b
    df = db = 0
    nf = nb = 1
    for _ in range(G.n):
        expand_fwd = nf <= nb
        if expand_fwd:
            adj, frontier, seen = fwd_adj, f, seen_f
        else:
            adj, frontier, seen = bwd_adj, b, seen_b
        nxt = (
            edge_join(frontier, adj)
            .select("id")
            .distinct()
            .join(seen, "id", "left_anti")
            .persist()
        )
        cnt = nxt.count()
        if cnt == 0:
            fwd_adj.unpersist()
            bwd_adj.unpersist()
            return None
        if expand_fwd:
            f, df, nf = nxt, df + 1, cnt
            seen_f = seen_f.unionByName(nxt).transform(lineage_cut)
        else:
            b, db, nb = nxt, db + 1, cnt
            seen_b = seen_b.unionByName(nxt).transform(lineage_cut)
        # meet test: the new frontier against the OTHER side's visited set
        other = seen_b if expand_fwd else seen_f
        if nxt.join(other, "id", "left_semi").limit(1).count() > 0:
            fwd_adj.unpersist()
            bwd_adj.unpersist()
            return df + db
    fwd_adj.unpersist()
    bwd_adj.unpersist()
    return None


def floyd_warshall(G, predecessors: bool = False):
    """All-pairs shortest paths, (row, col, value) DataFrame.

    The reference (``shortest_paths/dense.py:9-111``) runs n serial pivot
    updates ``D(binary.min) << any_plus(Col @ Row)`` — inherently
    O(n³) with a serial outer loop, an anti-pattern at scale (SURVEY
    table: "skip at scale, keep for tiny-graph test parity only").  We
    keep exactly that contract: collected to the driver, numpy
    relaxation, guarded to small n.  Use ``bellman_ford_path_lengths``
    (distributed, multi-source batched) for anything big.
    """
    import numpy as np

    n_cap = 2000
    if G.n > n_cap:
        raise ValueError(
            f"floyd_warshall is a tiny-graph parity op (n <= {n_cap}); "
            "use bellman_ford_path_lengths for large graphs"
        )
    ids = sorted(r["id"] for r in G.nodes.collect())
    pos = {v: i for i, v in enumerate(ids)}
    n = len(ids)
    dist = np.full((n, n), np.inf)
    np.fill_diagonal(dist, 0.0)
    pred = np.full((n, n), -1, dtype=np.int64)
    adj = _wadj(G)
    for r in adj.collect():
        i, j, w = pos[r["src"]], pos[r["dst"]], float(r["weight"])
        if w < dist[i, j]:
            dist[i, j] = w
            pred[i, j] = i
    for k in range(n):
        alt = dist[:, k : k + 1] + dist[k : k + 1, :]
        better = alt < dist
        dist = np.where(better, alt, dist)
        pred = np.where(better, pred[k : k + 1, :], pred)
    rows = []
    for i in range(n):
        for j in range(n):
            if np.isfinite(dist[i, j]):
                rows.append(
                    (ids[i], ids[j], float(dist[i, j]), int(ids[pred[i, j]]) if pred[i, j] >= 0 else None)
                )
    spark = G.spark
    df = spark.createDataFrame(
        rows, "row long, col long, value double, pred long"
    )
    if predecessors:
        return df
    return df.select("row", "col", "value")


def has_path(G, source: int, target: int) -> bool:
    """``generic.py:7-12`` via bidirectional meet (``unweighted.py:32-64``)."""
    return bidirectional_shortest_path_length(G, source, target) is not None


def negative_edge_cycle(G) -> bool:
    """``weighted.py:311-348``: BF from a virtual super-source connected to
    all nodes; improvement after n-1 rounds = negative cycle."""
    spark = G.spark
    adj = _wadj(G).persist()
    dist = G.nodes.select("id", F.lit(0.0).alias("dist")).persist()
    frontier = dist
    n = G.n
    for it in range(n):
        cand = (
            edge_join(frontier, adj, payload=["dist"], keep_weight="_w")
            .groupBy("id")
            .agg(F.min(F.col("dist") + F.col("_w")).alias("_cand"))
        )
        improved = (
            cand.join(dist.withColumnRenamed("dist", "_cur"), "id", "left")
            .filter(F.col("_cur").isNull() | (F.col("_cand") < F.col("_cur")))
            .select("id", F.col("_cand").alias("dist"))
            .persist()
        )
        cnt = improved.count()
        if cnt == 0:
            adj.unpersist()
            return False
        if it == n - 1:
            adj.unpersist()
            return True
        dist = (
            dist.join(improved.withColumnRenamed("dist", "_new"), "id", "full")
            .select(
                "id",
                F.when(
                    F.col("_new").isNotNull()
                    & (F.col("dist").isNull() | (F.col("_new") < F.col("dist"))),
                    F.col("_new"),
                )
                .otherwise(F.col("dist"))
                .alias("dist"),
            )
            .transform(lineage_cut)
        )
        frontier = improved
    adj.unpersist()
    return False
