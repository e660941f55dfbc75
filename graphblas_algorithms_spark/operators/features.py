"""Graph feature propagation (SGC / GraphSAGE-mean preprocessing):
iterated neighborhood mean-smoothing of per-node feature vectors.

x'_v = (x_v + sum_{u ~ v} x_u) / (deg(v) + 1)  — the self-loop form of
D^-1 (A + I) x, applied ``iters`` times.  This is the "simplifying graph
convolution" trick: precompute the smoothed features once, then train a
plain (non-graph) model on them — i.e. it is a TRAINING-DATA operator,
which is why it lives here rather than in a model library.

No reference analog (graphblas-algorithms has no feature-matrix ops);
the linear-algebra shape is the reference's vxm with an array payload —
re-expressed in LONG format (id, pos, val) so Spark aggregates it as a
plain (dst, pos) groupBy instead of a per-row Python loop over arrays:

* explode once: n x d rows, a scan-side ``posexplode`` (no shuffle);
* per iteration: one join feats x symmetric-adjacency partitioned on
  the join key + one (dst, pos) partial-agg groupBy — the SAME two
  exchanges as a PageRank superstep, times nothing (d rides along as
  rows, and Catalyst's map-side combine keeps the shuffle at
  O(nnz + n*d));
* degrees are computed once and broadcast-joined back.

Long format is the 100 TB answer: array-typed aggregation would force
either a d-wide codegen expression per column or a pandas UDF; the long
form stays entirely in whole-stage codegen for any d.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def propagate_features(
    G,
    feats: DataFrame,
    iters: int = 2,
    vec_col: str = "vec",
    id_col: str = "id",
    dyadic_bits: int | None = None,
) -> DataFrame:
    """(id, pos, val) — ``iters`` rounds of self-loop mean smoothing of
    ``feats`` (``id_col``, ``vec_col``: array<numeric>) over ``G``.

    Nodes present in the graph but absent from ``feats`` contribute
    nothing and acquire features only through neighbors (their self-term
    is empty); nodes in ``feats`` but not in the graph keep their
    features verbatim (their neighborhood is just themselves).  Output
    is long-format with ``val`` as double — pivot back with
    ``collect_list(struct(pos, val))``/``array_sort`` at the boundary if
    an array column is needed.

    ``dyadic_bits`` (e.g. 20) switches the arithmetic to the
    engine-determinism contract used by the ANF sketch: inputs are
    snapped to the 2**-bits dyadic grid, each round's neighborhood sum
    is carried as an exact BIGINT (order-independent — float sums are
    not), the mean is a floor-division snap back to the grid, and the
    final values are the scaled integers divided by 2**bits (an exact
    power-of-two division).  The result is bit-identical across run
    orders, core counts, and engines; the price is a <=2**-bits
    truncation per round, which is noise for ML feature smoothing.
    """
    if iters < 0:
        raise ValueError(f"iters must be >= 0, got {iters}")
    long0 = feats.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("pos", "val"),
    )
    if dyadic_bits is not None:
        scale = F.lit(float(2**dyadic_bits))
        long0 = long0.select(
            "id", "pos", F.floor(F.col("val") * scale).cast("long").alias("val")
        )
    if iters == 0:
        if dyadic_bits is not None:
            return long0.select("id", "pos", (F.col("val") / scale).alias("val"))
        return long0

    sym = G.get_property("sym_offdiag").select("src", "dst")
    # deg+1 per node (self-loop); nodes outside the graph keep deg 0 -> /1
    deg = sym.groupBy(F.col("dst").alias("id")).agg(
        (F.count("*") + F.lit(1)).alias("_d")
    )

    cur = long0
    for _ in range(iters):
        nbr = (
            cur.join(sym, cur["id"] == sym["src"])
            .select(F.col("dst").alias("id"), "pos", "val")
        )
        mean = F.col("_s") / F.coalesce(F.col("_d"), F.lit(1))
        if dyadic_bits is not None:
            # BIGINT sum is exact; floor of the correctly-rounded IEEE
            # quotient is deterministic and engine-portable (|_s| << 2^53)
            mean = F.floor(mean).cast("long")
        cur = (
            cur.unionByName(nbr)
            .groupBy("id", "pos")
            .agg(F.sum("val").alias("_s"))
            .join(deg, "id", "left")
            .select("id", "pos", mean.alias("val"))
        )
    if dyadic_bits is not None:
        return cur.select("id", "pos", (F.col("val") / scale).alias("val"))
    return cur
