"""Weisfeiler-Lehman node/graph hashing as label-refinement supersteps.

Extends the reference's structural-fingerprint surface
(``matching/isomorphism.py:6-26`` stops at degree-sequence /
triangle-histogram ``fast/faster_could_be_isomorphic``): WL subtree
hashing is the canonical next rung on that ladder — identical hashes
are a strong (not conclusive) isomorphism signal, and per-node hashes
give structural-role equivalence classes (the features GNN papers call
"WL colors").

Engine-portable semantics (pinned so the DuckDB oracle replays them
bit-for-bit — same convention as Luby MIS / the walk kernels):

* neighborhood = symmetric, self-loop-free adjacency (``sym_offdiag``);
* ``lab_0 = md5(cast(degree as string))`` with degree = #neighbors;
* each round, a node's new label digests its own label plus its
  neighbors' label MULTISET.  nx sorts and concatenates neighbor
  labels; a power-law hub would make that a multi-hundred-MB string,
  so the multiset is instead folded with an order-independent
  commutative sum of two disjoint 60-bit integer projections of each
  neighbor label (exact DECIMAL(38,0) arithmetic — no float, no
  overflow below ~1e37 aggregate mass) plus the neighbor count:

    ``lab' = md5(lab | sum(hex[1:15]) | sum(hex[17:31]) | count)``

  Collisions of the 120-bit multiset fold are ~2^-120 per comparison —
  negligible statistically, though (unlike nx's sorted concat) an
  adversary could construct one;
* labels chain their own history, so the FINAL label multiset is as
  discriminating as nx's all-iterations accumulation (two graphs that
  ever differ can only re-converge via a hash collision).

Plan shape per round: one edge join (state hash-partitioned on ``id``,
adjacency pinned by ``src``) + one exchange-free partial-agg groupBy —
hub neighbor multisets combine map-side exactly like the label-prop
vote counts.  Isomorphism invariance holds because ids only enter
through degree and the graph structure, never as tie-breaks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.joins import edge_join
from ..plans.superstep import Superstep

_DEC = "decimal(38,0)"


def _fold1(lab):
    return F.conv(F.substring(lab, 1, 15), 16, 10).cast(_DEC)


def _fold2(lab):
    return F.conv(F.substring(lab, 17, 15), 16, 10).cast(_DEC)


def wl_node_hashes(
    G,
    iterations: int = 3,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 1,
    resume: bool = False,
) -> DataFrame:
    """(id: long, wl: string) — 32-hex WL subtree hash after
    ``iterations`` refinement rounds.  Nodes with equal ``wl`` are
    WL-indistinguishable (same rooted subtree up to that depth)."""
    spark = G.spark
    num_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    adj = (
        G.get_property("sym_offdiag")
        .select("src", "dst")
        .repartition(num_part, "src")
        .persist()
    )
    deg = adj.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("_d"))
    labs = (
        G.nodes.select("id")
        .join(deg, "id", "left")
        .select(
            "id",
            F.md5(F.coalesce(F.col("_d"), F.lit(0)).cast("string")).alias("wl"),
        )
        .repartition(num_part, "id")
    )

    harness = Superstep(spark, checkpoint_dir, checkpoint_every)
    start_iter = 0
    if resume and checkpoint_dir is not None:
        got = harness.latest()
        if got is not None:
            start_iter, labs = got[0] + 1, got[1]
    else:
        labs = labs.localCheckpoint(eager=True)

    for it in range(start_iter, iterations):
        nb = edge_join(labs, adj, payload=["wl"])
        digest = nb.groupBy("id").agg(
            F.sum(_fold1(F.col("wl"))).alias("_s1"),
            F.sum(_fold2(F.col("wl"))).alias("_s2"),
            F.count("*").alias("_c"),
        )
        new_labs = (
            labs.join(digest, "id", "left")
            .select(
                "id",
                F.md5(
                    F.concat_ws(
                        "|",
                        F.col("wl"),
                        F.coalesce(F.col("_s1").cast("string"), F.lit("0")),
                        F.coalesce(F.col("_s2").cast("string"), F.lit("0")),
                        F.coalesce(F.col("_c").cast("string"), F.lit("0")),
                    )
                ).alias("wl"),
            )
        )
        labs = harness.materialize(new_labs, it, {"kernel": "wl"})

    adj.unpersist()
    return labs


def wl_graph_hash(G, iterations: int = 3) -> str:
    """32-hex whole-graph WL hash: the order-independent fold of the
    final node-label multiset plus (n, iterations).  Equal hashes =>
    WL-indistinguishable graphs (the practical could-be-isomorphic
    upgrade); unequal hashes => certainly non-isomorphic."""
    labs = wl_node_hashes(G, iterations=iterations)
    row = labs.agg(
        F.sum(_fold1(F.col("wl"))).alias("s1"),
        F.sum(_fold2(F.col("wl"))).alias("s2"),
        F.count("*").alias("n"),
    ).collect()[0]
    import hashlib

    payload = "|".join(
        [str(int(row["n"])), str(int(iterations)), str(int(row["s1"] or 0)), str(int(row["s2"] or 0))]
    )
    return hashlib.md5(payload.encode()).hexdigest()
