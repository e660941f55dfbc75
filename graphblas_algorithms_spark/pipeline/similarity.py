"""Similarity search over an embedding column (array<float>).

* ``cosine_topk`` — brute-force exact top-k per query: cross join +
  ``zip_with``/``aggregate`` dot product (JVM-side, codegen'd) + window
  rank.  The correctness baseline; O(n*q) — fine when the query set is
  small or as the per-bucket inner loop.
* ``ivf_topk`` — the scale path: coarse quantization.  Centroids are a
  deterministic sample of the corpus (every (n/m)-th vector by id — no
  RNG, reproducible); vectors are assigned to their nearest centroid
  (one broadcast join against m centroids); a query probes the
  ``n_probe`` nearest cells only.  At 100 TB this turns all-pairs into
  (m·q) + (q·n/m·n_probe) work with the centroid table broadcast.
* ``ivf_topk_pandas`` — same IVF structure, but the per-cell exact
  scoring is one numpy matmul per cell via cogrouped ``applyInPandas``:
  the distributed sanctioned-Python path for wide embeddings where the
  fold-based ``aggregate`` dot product becomes the bottleneck.
* ``cosine_topk_pandas`` — brute force through a driver-broadcast
  corpus matmul; bench-scale demo only (documented as such).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..plans.superstep import lineage_cut


def _norm_vec(emb: DataFrame, id_col: str = "vec_id") -> DataFrame:
    """(id, v: array<double> L2-normalized)."""
    v = emb.select(
        F.col(id_col).alias("id"), F.col("embedding").cast("array<double>").alias("v")
    )
    norm = F.sqrt(F.aggregate(F.col("v"), F.lit(0.0), lambda a, x: a + x * x))
    return v.select(
        "id",
        F.transform(F.col("v"), lambda x: x / F.greatest(norm, F.lit(1e-12))).alias("v"),
    )


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)


#: Default corpus-size cap for the all-pairs verifiers below.  The
#: O(n*q) crossJoin is exact and oracled but is NOT the 100 TB plan;
#: past this size callers must either pass ``max_n=None`` explicitly
#: (accepting the cost) or use the bucketed paths (``ivf_topk`` /
#: ``embedding_lsh_near_duplicates``).  Mirrors the ``google_matrix`` /
#: ``floyd_warshall`` tiny-n guards (operators/linalg.py,
#: operators/shortest_paths.py).
ALL_PAIRS_MAX_N = 200_000


def _guard_all_pairs(df: DataFrame, max_n: int | None, fn: str, alt: str) -> None:
    if max_n is None:
        return
    n = df.limit(max_n + 1).count()
    if n > max_n:
        raise ValueError(
            f"{fn} is an all-pairs O(n^2) verifier and the corpus exceeds "
            f"max_n={max_n}; use {alt} for the bucketed scale path, or pass "
            f"max_n=None to force the exact scan."
        )


def cosine_topk(
    emb: DataFrame,
    queries: DataFrame | None = None,
    k: int = 10,
    max_n: int | None = ALL_PAIRS_MAX_N,
) -> DataFrame:
    """(query_id, neighbor_id, rank, cosine) — exact brute force.

    ``queries`` defaults to the corpus itself (self-join, excluding self
    matches).  Deterministic tie-break: (cosine desc, neighbor_id asc).
    Guarded to ``max_n`` corpus rows — this is the tiny-scale exact
    verifier; ``ivf_topk`` is the scale path.
    """
    _guard_all_pairs(emb, max_n, "cosine_topk", "ivf_topk / ivf_topk_pandas")
    corpus = _norm_vec(emb).select(F.col("id").alias("neighbor_id"), F.col("v").alias("vc"))
    qs = _norm_vec(queries if queries is not None else emb).select(
        F.col("id").alias("query_id"), F.col("v").alias("vq")
    )
    pairs = qs.crossJoin(corpus).filter(F.col("query_id") != F.col("neighbor_id"))
    scored = pairs.select(
        "query_id", "neighbor_id", F.round(_dot(F.col("vq"), F.col("vc")), 6).alias("cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("long").alias("rank"), "cosine")
    )


def deterministic_centroids(emb: DataFrame, m: int, refine_iters: int = 1) -> DataFrame:
    """(centroid_id, cv) — seeded with the min-id vector of each
    ``pmod(id, m)`` residue class (fully distributed: one small groupBy,
    no global sort — the old row_number-over-everything seeding pulled
    every vector through a single partition), then ``refine_iters``
    deterministic Lloyd steps (assign each vector to its nearest centroid,
    recompute centroids as normalized cell means).  No RNG anywhere
    (resume/oracle-safe); the refinement makes the cells follow the data
    distribution, which is what IVF recall lives on."""
    vecs = _norm_vec(emb)
    seeds = (
        vecs.select(F.pmod(F.col("id"), F.lit(m)).alias("centroid_id"), "id")
        .groupBy("centroid_id")
        .agg(F.min("id").alias("id"))
    )
    cents = seeds.join(vecs, "id").select("centroid_id", F.col("v").alias("cv"))
    for _ in range(refine_iters):
        assigned = (
            vecs.crossJoin(F.broadcast(cents))
            .select("id", "v", "centroid_id", _dot(F.col("v"), F.col("cv")).alias("_sim"))
            .withColumn(
                "_rk",
                F.row_number().over(
                    Window.partitionBy("id").orderBy(F.desc("_sim"), F.asc("centroid_id"))
                ),
            )
            .filter(F.col("_rk") == 1)
        )
        # cell means: posexplode -> per-dimension avg -> reassemble sorted
        means = (
            assigned.select("centroid_id", F.posexplode("v").alias("_pos", "_x"))
            .groupBy("centroid_id", "_pos")
            .agg(F.avg("_x").alias("_mx"))
            .groupBy("centroid_id")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct("_pos", "_mx"))
                ).alias("_pairs")
            )
            .select(
                "centroid_id",
                F.transform(F.col("_pairs"), lambda s: s["_mx"]).alias("_mean"),
            )
        )
        # L2-normalize the mean so _dot stays a cosine; a zero-norm mean
        # would divide by 0 and poison every downstream _dot with NaN
        nrm = F.sqrt(
            F.aggregate(F.col("_mean"), F.lit(0.0), lambda a, x: a + x * x)
        )
        refined = means.select(
            "centroid_id",
            F.when(
                nrm > 0, F.transform(F.col("_mean"), lambda x: x / nrm)
            ).alias("_cv_new"),
        )
        # LEFT-join refined means onto the seeded set: an empty cell keeps
        # its seed vector, so the centroid count never silently drops below m
        cents = (
            cents.join(refined, "centroid_id", "left")
            .select("centroid_id", F.coalesce("_cv_new", "cv").alias("cv"))
            .transform(lineage_cut)
        )
    return cents


def _ivf_parts(emb: DataFrame, m: int, n_probe: int):
    """Shared IVF front half: (assigned, probes).

    ``assigned`` = (id, v, centroid_id): each vector in its nearest cell.
    ``probes``   = (query_id, vq, centroid_id): each query replicated to
    its ``n_probe`` nearest cells.  The vecs x centroids similarity pass
    runs ONCE — assignment (rank 1) and the probe list are two filters
    of the same persisted frame; the m-row centroid table is broadcast.
    """
    cents = F.broadcast(deterministic_centroids(emb, m).persist())
    vecs = _norm_vec(emb).persist()
    scored = (
        vecs.crossJoin(cents)
        .select("id", "v", "centroid_id", _dot(F.col("v"), F.col("cv")).alias("_sim"))
        .withColumn(
            "_rk",
            F.row_number().over(
                Window.partitionBy("id").orderBy(F.desc("_sim"), F.asc("centroid_id"))
            ),
        )
        .filter(F.col("_rk") <= max(n_probe, 1))
        .persist()
    )
    assigned = scored.filter(F.col("_rk") == 1).select("id", "v", "centroid_id")
    probes = scored.filter(F.col("_rk") <= n_probe).select(
        F.col("id").alias("query_id"), F.col("v").alias("vq"), "centroid_id"
    )
    return assigned, probes


def ivf_topk(
    emb: DataFrame,
    k: int = 10,
    m: int = 16,
    n_probe: int = 4,
) -> DataFrame:
    """(query_id, neighbor_id, rank, cosine) — IVF-style ANN.

    Assignment and probing both broadcast the m-row centroid table; the
    expensive exact scoring runs only within probed cells.
    """
    assigned, probes = _ivf_parts(emb, m, n_probe)
    cand = probes.join(
        assigned.select(
            F.col("id").alias("neighbor_id"), F.col("v").alias("vc"), "centroid_id"
        ),
        "centroid_id",
    ).filter(F.col("query_id") != F.col("neighbor_id"))
    # No .distinct(): each neighbor lives in exactly ONE cell (_rk == 1
    # assignment) and each query probes n_probe DISTINCT cells, so every
    # (query_id, neighbor_id) pair appears at most once — a distinct here
    # was a pure extra shuffle (uniqueness is asserted in
    # tests/test_pipeline.py::test_ivf_candidates_unique).
    scored = cand.select(
        "query_id", "neighbor_id", F.round(_dot(F.col("vq"), F.col("vc")), 6).alias("cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("long").alias("rank"), "cosine")
    )


def ivf_topk_pandas(
    emb: DataFrame,
    k: int = 10,
    m: int = 16,
    n_probe: int = 4,
) -> DataFrame:
    """(query_id, neighbor_id, rank, cosine) — IVF ANN with the per-cell
    exact scoring done as ONE numpy matmul per cell via a cogrouped
    ``applyInPandas``.

    The distributed sanctioned-Python path: queries and cell members are
    cogrouped on ``centroid_id`` (one shuffle each, keyed exactly like
    the SQL variant's candidate join), each cell scores Q @ M.T in a
    single Arrow-batched matmul and emits only its per-cell top-k
    candidates, then a global window merges the <= n_probe partial
    lists per query.  Same candidates and tie-break as ``ivf_topk``;
    no driver collect, no full-corpus broadcast — per-task memory is
    O(|cell|·d), bounded by the centroid count m.
    """
    import numpy as np

    assigned, probes = _ivf_parts(emb, m, n_probe)
    # both sides derive from the same scored frame — rename the member
    # side's key so the cogroup isn't an ambiguous self-reference
    # (cogroup keys pair positionally, names need not match)
    members = assigned.select(
        F.col("centroid_id").alias("cell"),
        F.col("id").alias("neighbor_id"),
        F.col("v").alias("vc"),
    )

    def score_cell(key, qpdf: pd.DataFrame, mpdf: pd.DataFrame):
        if qpdf.empty or mpdf.empty:
            return pd.DataFrame(columns=["query_id", "neighbor_id", "cosine"])
        qm = np.vstack(qpdf["vq"].to_numpy())  # (q, d)
        mm = np.vstack(mpdf["vc"].to_numpy())  # (c, d)
        nids = mpdf["neighbor_id"].to_numpy()
        sims = np.round(qm @ mm.T, 6)  # (q, c)
        rows = []
        for i, qid in enumerate(qpdf["query_id"].to_numpy()):
            s = sims[i]
            keep = nids != qid
            # per-cell partial top-k, same tie-break as the SQL path:
            # cosine desc, neighbor_id asc
            order = np.lexsort((nids[keep], -s[keep]))[:k]
            kn, ks = nids[keep], s[keep]
            for j in order:
                rows.append((int(qid), int(kn[j]), float(ks[j])))
        return pd.DataFrame(rows, columns=["query_id", "neighbor_id", "cosine"])

    partial = (
        probes.groupBy("centroid_id")
        .cogroup(members.groupBy("cell"))
        .applyInPandas(score_cell, schema="query_id long, neighbor_id long, cosine double")
    )
    # Same uniqueness argument as ivf_topk: one cell per neighbor, distinct
    # probe cells per query — no dedup shuffle needed before the merge.
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("long").alias("rank"), "cosine")
    )


def cosine_topk_pandas(
    emb: DataFrame, k: int = 10, max_n: int | None = ALL_PAIRS_MAX_N
) -> DataFrame:
    """Brute-force top-k via a vectorized pandas UDF: the whole corpus is
    broadcast to each Arrow batch and scored with one numpy matmul —
    the O13-style sanctioned Python path (never per-row).  The corpus is
    collect()ed to the driver, so this is guarded to ``max_n`` rows;
    ``ivf_topk_pandas`` is the distributed sanctioned-Python path."""
    import numpy as np

    _guard_all_pairs(emb, max_n, "cosine_topk_pandas", "ivf_topk_pandas")
    spark = emb.sparkSession
    vecs = _norm_vec(emb)
    corpus = vecs.collect()  # guarded above; IVF is the big path
    ids = np.array([r["id"] for r in corpus])
    mat = np.array([r["v"] for r in corpus])  # (n, d)
    b_ids = spark.sparkContext.broadcast(ids)
    b_mat = spark.sparkContext.broadcast(mat)

    def score(batches):
        for pdf in batches:
            q = np.array(list(pdf["v"]))  # (b, d)
            sims = q @ b_mat.value.T  # one matmul per batch
            for row_i, qid in enumerate(pdf["id"]):
                s = sims[row_i]
                order = np.lexsort((b_ids.value, -np.round(s, 6)))
                out_rows = []
                rank = 0
                for j in order:
                    if b_ids.value[j] == qid:
                        continue
                    rank += 1
                    out_rows.append((qid, int(b_ids.value[j]), rank, float(round(s[j], 6))))
                    if rank >= k:
                        break
                yield pd.DataFrame(
                    out_rows, columns=["query_id", "neighbor_id", "rank", "cosine"]
                )

    return vecs.mapInPandas(
        score, schema="query_id long, neighbor_id long, rank long, cosine double"
    )
