"""Deterministic edge sampling for link-prediction / embedding training
sets: negative sampling (non-edges) and positive/negative set assembly.

No reference analog (graphblas-algorithms computes link-prediction
SCORES — jaccard/adamic-adar, algorithms/link_analysis + nxapi — but
never materializes a training set); the semantics follow the standard
GNN/skip-gram recipe: for each node draw candidate partners uniformly
over the node set, reject real edges and self-pairs, keep the first k
survivors in draw order.

Scale shape (the 100 TB plan):

* candidate generation is a scan-side ``explode(sequence(0, ck-1))``
  over the node table — linear in n*ck, no shuffle;
* candidate index -> node id reuses ``assign_dense_ids``
  (classes/_utils.py): the same frozen-literal two-phase dense index
  every kernel already builds at ingest, so the join side is the
  renumber table the session owns anyway — broadcast when small,
  hash join on the dense id otherwise;
* edge rejection is ONE left-anti hash join against the symmetric
  adjacency, partitioned on (src, dst) — the only corpus-sized shuffle;
* per-node top-k ranks by the INTEGER draw index j (min-j per distinct
  partner, then row_number <= k within src) — bounded windows of
  ~k*factor rows, and pure integer ordering so re-runs, resumes, and
  the DuckDB value oracle select identical pairs bit-for-bit.

Everything derives from md5(salt:src:j), the engine-portable uniform
used across the repo (pipeline/curation.py, operators/walks.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..classes._utils import assign_dense_ids

# 16^15: md5 15-hex-digit prefix -> exact uniform in [0, 1) (walks.py:35)
_HEX15 = 1152921504606846976.0


def _uniform(*cols) -> F.Column:
    h = F.md5(F.concat_ws(":", *cols))
    return F.conv(F.substring(h, 1, 15), 16, 10).cast("double") / F.lit(_HEX15)


def negative_edge_sample(
    G,
    k: int,
    factor: int = 4,
    salt: str = "neg",
) -> DataFrame:
    """(src, dst, j) — up to ``k`` deterministic NON-edges per node.

    For node v, candidate j (j = 0..k*factor-1) is the node at dense
    index floor(u_j * n), u_j = md5-uniform of (salt, v, j); self-pairs
    and existing (symmetric) edges are rejected and the k surviving
    candidates with the smallest j win.  ``j`` is returned so callers
    can weight or further thin the draw.  A node adjacent to almost
    every other node may yield fewer than k rows — raise ``factor``
    (expected survivors ~= k*factor*(1 - deg(v)/n)).

    Deterministic in (node set, edge set, salt, k, factor) alone: the
    dense index is by sorted node-id order (assign_dense_ids) and the
    ranking is pure integer arithmetic, so the draw is reproducible
    across runs, partitionings, and engines.
    """
    if k < 1 or factor < 1:
        raise ValueError(f"k and factor must be >= 1, got k={k} factor={factor}")
    adj = G.get_property("sym_offdiag").select("src", "dst")
    nodes = G.nodes.select("id")
    nidx = assign_dense_ids(nodes.select(F.col("id").alias("key")), "key")
    n = nidx.count()  # already persisted+counted by assign_dense_ids
    ck = int(k) * int(factor)

    u = _uniform(F.lit(salt), F.col("src"), F.col("j"))
    # least(floor(u*n), n-1): u*n can round UP to exactly n in double
    # arithmetic when u -> 1-2^-60 and n is large (granularity at 1e10
    # is ~2e-6 >> n*2^-60), so the clamp is load-bearing, not paranoia
    idx = F.least(F.floor(u * F.lit(float(n))).cast("long"), F.lit(int(n) - 1))
    cand = (
        nodes.select(F.col("id").alias("src"))
        .select(
            "src", F.explode(F.sequence(F.lit(0), F.lit(ck - 1))).alias("j")
        )
        .select("src", "j", idx.alias("_idx"))
        .join(
            nidx.select(F.col("id").alias("_idx"), F.col("key").alias("dst")),
            "_idx",
        )
        .filter(F.col("src") != F.col("dst"))
        .join(adj, ["src", "dst"], "left_anti")
        .groupBy("src", "dst")
        .agg(F.min("j").alias("j"))
    )
    w = Window.partitionBy("src").orderBy("j", "dst")
    return (
        cand.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select("src", "dst", "j")
    )


def khop_neighbor_sample(
    G,
    seeds: DataFrame | None = None,
    fanouts: tuple[int, ...] = (10, 5),
    salt: str = "khop",
) -> DataFrame:
    """(hop, src, dst) — layer-wise deterministic neighbor-sampled
    adjacency blocks, the GNN-minibatch primitive (GraphSAGE/FastGCN
    family): hop h keeps at most ``fanouts[h-1]`` neighbors per frontier
    node, ranked by an md5 uniform of (salt, hop, src, dst); the next
    frontier is the distinct sampled targets.

    Layer-wise (one shared sample per node per hop), NOT per-seed trees:
    per-seed sampling multiplies work by |seeds| x prod(fanouts), while
    the shared block is what batched GNN trainers consume anyway.  Scale
    shape: hop h is one join frontier x adjacency (partitioned on src)
    plus a per-src window of at most deg(src) rows — the window never
    sees more than one node's neighbor list, so hub skew degrades a
    task, not the stage.  Deterministic in (edge set, seeds, fanouts,
    salt): re-runs, resumes, and the DuckDB oracle sample identical
    blocks.

    ``seeds``: one-column (id) DataFrame; default = every node.
    """
    if not fanouts or any(f < 1 for f in fanouts):
        raise ValueError(f"fanouts must be non-empty positive, got {fanouts!r}")
    adj = G.get_property("sym_offdiag").select("src", "dst")
    frontier = (seeds if seeds is not None else G.nodes).select(
        F.col(seeds.columns[0] if seeds is not None else "id").alias("id")
    ).distinct()

    blocks = []
    for hop, fan in enumerate(fanouts, start=1):
        u = _uniform(F.lit(salt), F.lit(hop), F.col("src"), F.col("dst"))
        w = Window.partitionBy("src").orderBy(u, "dst")
        block = (
            frontier.join(adj, frontier["id"] == adj["src"])
            .select("src", "dst")
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= fan)
            .select(F.lit(hop).alias("hop"), "src", "dst")
        )
        blocks.append(block)
        frontier = block.select(F.col("dst").alias("id")).distinct()
    out = blocks[0]
    for b in blocks[1:]:
        out = out.unionByName(b)
    return out


def linkpred_training_set(
    G,
    k: int,
    factor: int = 4,
    holdout_rate: float = 0.2,
    salt: str = "lp",
) -> DataFrame:
    """(src, dst, label, split) — a ready link-prediction training set:
    every canonical edge as a positive (label 1) and ``k`` sampled
    non-edges per node as negatives (label 0), each row deterministically
    assigned to 'train' or 'test' by an md5-uniform of the PAIR at
    ``holdout_rate`` — so the split never leaks an edge into both sides,
    survives re-runs/resumes bit-identically, and downstream trainers
    need zero extra shuffles (the split column is a scan-side projection).
    """
    pos = (
        G.get_property("sym_offdiag")
        .select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
        )
        .distinct()
        .select("src", "dst", F.lit(1).alias("label"))
    )
    neg = negative_edge_sample(G, k=k, factor=factor, salt=salt + ":neg").select(
        "src", "dst", F.lit(0).alias("label")
    )
    both = pos.unionByName(neg)
    split = F.when(
        _uniform(F.lit(salt + ":split"), F.col("src"), F.col("dst"))
        < F.lit(float(holdout_rate)),
        F.lit("test"),
    ).otherwise(F.lit("train"))
    return both.select("src", "dst", "label", split.alias("split"))
