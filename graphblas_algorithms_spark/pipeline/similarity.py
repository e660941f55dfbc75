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
        # cell means: posexplode -> per-dimension mean -> reassemble sorted.
        # The mean is carried on the 2^-20 dyadic grid as an exact BIGINT
        # sum + floor division (the ANF recipe): a float avg() is
        # aggregation-order-dependent, which made the refined centroids —
        # and everything downstream of them — differ across runs at the
        # last ULP and blocked a value oracle for the whole IVF family.
        means = (
            assigned.select("centroid_id", F.posexplode("v").alias("_pos", "_x"))
            .groupBy("centroid_id", "_pos")
            .agg(
                (
                    F.floor(
                        F.sum(F.floor(F.col("_x") * F.lit(1048576.0)).cast("long"))
                        / F.count("*")
                    ).cast("long")
                    / F.lit(1048576.0)
                ).alias("_mx")
            )
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
    lists per query.  Same candidates as ``ivf_topk``; no driver
    collect, no full-corpus broadcast — per-task memory is O(|cell|·d),
    bounded by the centroid count m.

    Scoring is EXACT integer arithmetic on the 2^-26 dyadic grid (r5):
    both matrices are snapped with ``floor(x * 2^26)`` to int64 and the
    matmul runs in int64, so every dot product is a single exact
    integer — no float-summation order anywhere (numpy's BLAS float
    matmul blocks sums in an implementation-defined order, which is why
    this path was the one remaining rows-only oracle).  Bounds: after
    L2 normalization |x| <= 1, so each product <= 2^52 and a 64-dim sum
    <= 2^58 < int64 max; the snap error per cosine is <= 2d/2^26 ≈
    2e-6 worst-case (~1.5e-8 typical), inside the parity test's
    tolerance vs the float-fold SQL path.  The reported cosine is the
    dyadic quotient ``dint / 2^52`` rounded to 6, and the rank window
    orders by the UNROUNDED integer — bit-identical across runs,
    partitionings, and engines (DuckDB replays the same snapped sums as
    exact BIGINTs; see ``_SQL_ANN_IVF_PANDAS`` in __spark_entry__.py).
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

    scale = float(1 << 26)  # dyadic grid: 2^26

    def score_cell(key, qpdf: pd.DataFrame, mpdf: pd.DataFrame):
        if qpdf.empty or mpdf.empty:
            return pd.DataFrame(columns=["query_id", "neighbor_id", "dint"])
        qm = np.floor(np.vstack(qpdf["vq"].to_numpy()) * scale).astype(np.int64)
        mm = np.floor(np.vstack(mpdf["vc"].to_numpy()) * scale).astype(np.int64)
        nids = mpdf["neighbor_id"].to_numpy()
        sims = qm @ mm.T  # (q, c) exact int64 — order-independent
        rows = []
        for i, qid in enumerate(qpdf["query_id"].to_numpy()):
            s = sims[i]
            keep = nids != qid
            # per-cell partial top-k, same tie-break as the SQL path:
            # similarity desc, neighbor_id asc
            order = np.lexsort((nids[keep], -s[keep]))[:k]
            kn, ks = nids[keep], s[keep]
            for j in order:
                rows.append((int(qid), int(kn[j]), int(ks[j])))
        return pd.DataFrame(rows, columns=["query_id", "neighbor_id", "dint"])

    partial = (
        probes.groupBy("centroid_id")
        .cogroup(members.groupBy("cell"))
        .applyInPandas(score_cell, schema="query_id long, neighbor_id long, dint long")
    )
    # Same uniqueness argument as ivf_topk: one cell per neighbor, distinct
    # probe cells per query — no dedup shuffle needed before the merge.
    # Rank on the exact integer; surface the dyadic cosine (exact double:
    # dint < 2^53, and division by 2^52 is a power-of-two scale).
    w = Window.partitionBy("query_id").orderBy(F.desc("dint"), F.asc("neighbor_id"))
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.col("rank").cast("long").alias("rank"),
            F.round(F.col("dint") / F.lit(float(1 << 52)), 6).alias("cosine"),
        )
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


# ---------------------------------------------------------------------------
# IVF-PQ: product quantization + asymmetric-distance scoring
# ---------------------------------------------------------------------------


def pq_train(
    emb: DataFrame,
    m_sub: int = 8,
    k_codes: int = 256,
    iters: int = 10,
    train_max: int = 100_000,
    rotation_seed: int | None = None,
) -> DataFrame:
    """(sub_id, code_id, code_vec) — per-subspace k-means codebooks.

    The d-dim normalized vectors are split into ``m_sub`` contiguous
    subspaces; each subspace learns ``k_codes`` centers by Lloyd
    iterations over a DETERMINISTIC md5-uniform sample of at most
    ``train_max`` vectors (codebook training on a bounded sample is the
    standard PQ recipe — the codebook is a tiny model, the corpus is
    not).  Each subspace trains independently inside one
    ``applyInPandas`` group: per-task memory is O(train_max * d/m_sub),
    bounded regardless of corpus size.  Init = deterministic
    farthest-point (greedy maxmin from the lowest-id sample row); no
    RNG anywhere, so resumes and re-runs rebuild the identical codebook.

    r4 defaults: ``k_codes=256`` (8-bit codes, the standard PQ setting)
    and ``iters=10`` — measured on isotropic d=64 data, 8x16 codes are
    a resolution floor (recall .28 vs the .55 IVF probe ceiling) while
    8x256 reaches .48 and 16x256 the ceiling itself; codebook INIT and
    iteration count move recall by <.02, and an OPQ-style rotation
    cannot help at all on isotropic corpora (the distribution is
    rotation-invariant — measured, scripts/pq_recall.py).
    ``rotation_seed`` applies a seeded orthonormal rotation before the
    subspace split — the OPQ-lite lever for ANISOTROPIC corpora whose
    correlated dimensions straddle subspace boundaries; pass the same
    seed to ``pq_encode``/``ivf_pq_topk``.
    """
    import numpy as np

    vecs = _norm_vec(emb)
    d = len(vecs.select("v").first()["v"])
    if d % m_sub != 0:
        raise ValueError(f"dim {d} not divisible by m_sub={m_sub}")
    d_sub = d // m_sub

    n = vecs.count()
    rate = min(1.0, train_max / max(n, 1))
    h = F.md5(F.concat(F.lit("pqtrain:"), F.col("id").cast("string")))
    u = F.conv(F.substring(h, 1, 15), 16, 10).cast("double") / F.lit(
        1152921504606846976.0
    )
    sample = vecs.filter(u < rate)

    if rotation_seed is not None:
        R = _pq_rotation(d, rotation_seed)

        def _rot_batch(batches):
            for pdf in batches:
                X = np.vstack(pdf["v"].to_numpy()) @ R.T
                yield pd.DataFrame({"id": pdf["id"].to_numpy(), "v": [x.tolist() for x in X]})

        sample = sample.select("id", "v").mapInPandas(
            _rot_batch, schema="id long, v array<double>"
        )
    subs = sample.select(
        "id",
        F.posexplode(
            F.array(*[F.slice("v", s * d_sub + 1, d_sub) for s in range(m_sub)])
        ).alias("sub_id", "sv"),
    )

    def train(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        pdf = pdf.sort_values("id")
        X = np.vstack(pdf["sv"].to_numpy())  # (t, d_sub)
        kk = min(k_codes, len(X))
        # deterministic farthest-point init: max-min-distance greedy from
        # the lowest-id row — spreads centers over the sample's support
        # (head-of-sample init wastes codes on near-duplicate rows)
        chosen = [0]
        dist = ((X - X[0]) ** 2).sum(axis=1)
        for _ in range(kk - 1):
            if dist.max() == 0.0:
                # fewer distinct rows than codes: argmax would return
                # row 0 forever, silently duplicating centers (dead
                # codes, ADVICE r4).  Fill from unused rows instead and
                # truncate the codebook to what the sample supports.
                unused = [i for i in range(len(X)) if i not in set(chosen)]
                chosen.extend(unused[: kk - len(chosen)])
                break
            nxt = int(np.argmax(dist))
            chosen.append(nxt)
            dist = np.minimum(dist, ((X - X[nxt]) ** 2).sum(axis=1))
        kk = len(chosen)
        C = X[chosen].copy()
        for _ in range(iters):
            # argmin ||x-c||^2 = argmax x.c - 0.5||c||^2
            scores = X @ C.T - 0.5 * (C * C).sum(axis=1)
            a = np.argmax(scores, axis=1)
            for j in range(kk):
                mask = a == j
                if mask.any():
                    C[j] = X[mask].mean(axis=0)
                # empty cluster keeps its previous center (deterministic)
        sid = int(pdf["sub_id"].iloc[0])
        return pd.DataFrame(
            {
                "sub_id": sid,
                "code_id": range(kk),
                "code_vec": [C[j].tolist() for j in range(kk)],
            }
        )

    return subs.groupBy("sub_id").applyInPandas(
        train, schema="sub_id int, code_id int, code_vec array<double>"
    )


def _pq_rotation(d: int, seed: int):
    """Deterministic orthonormal d x d rotation: product of d seeded
    Householder reflections (numpy PCG64 with a fixed seed — bit-stable
    across runs and hosts for a given numpy).  OPQ-lite: decorrelates
    dimensions across the subspace split for anisotropic corpora; a
    no-op statistically on isotropic data (rotation-invariant)."""
    import numpy as np

    rng = np.random.default_rng(int(seed))
    R = np.eye(d)
    for _ in range(d):
        v = rng.normal(size=d)
        v /= np.linalg.norm(v)
        R = R - 2.0 * np.outer(v, v @ R)
    return R


def _codebook_np(codebooks: DataFrame):
    """Collect the tiny (m_sub*k_codes)-row codebook to a dense numpy
    (m_sub, k_codes, d_sub) tensor for closure-shipping to executors."""
    import numpy as np

    rows = codebooks.collect()
    m_sub = 1 + max(r["sub_id"] for r in rows)
    k_codes = 1 + max(r["code_id"] for r in rows)
    d_sub = len(rows[0]["code_vec"])
    cb = np.zeros((m_sub, k_codes, d_sub))
    for r in rows:
        cb[r["sub_id"], r["code_id"]] = r["code_vec"]
    return cb


def pq_encode(
    vecs: DataFrame,
    codebooks: DataFrame,
    rotation_seed: int | None = None,
    dyadic_bits: int | None = None,
) -> DataFrame:
    """(id, codes: array<int>) — each vector compressed to m_sub code
    ids (argmin L2 per subspace).  One Arrow-batched numpy pass; the
    codebook rides in the UDF closure (KBs).  At d=768 float64 -> 8
    uint8 codes this is a ~768x memory cut on the candidate-scoring
    side, which is what lets a 100 TB corpus's index live in cluster
    RAM.  ``vecs`` must be (id, v) as produced by ``_norm_vec``.

    ``dyadic_bits``: snap vectors AND codebook to the 2^-bits grid and
    argmax over the integer score 2*(x.c) - ||c||^2 (same ordering,
    doubled to stay integral) — int64-exact, so the chosen codes are
    bit-identical across runs/engines and SQL-replayable (the ANF
    determinism contract).
    """
    import numpy as np

    cb = _codebook_np(codebooks)
    m_sub, k_codes, d_sub = cb.shape
    R = _pq_rotation(m_sub * d_sub, rotation_seed) if rotation_seed is not None else None
    if dyadic_bits is not None:
        cbi = np.floor(cb * float(2**dyadic_bits)).astype(np.int64)
        cnorm = (cbi * cbi).sum(axis=2)  # (s, k) int64

        def encode(batches):
            for pdf in batches:
                X = np.vstack(pdf["v"].to_numpy())
                if R is not None:
                    X = X @ R.T
                Xi = np.floor(X * float(2**dyadic_bits)).astype(np.int64)
                Xs = Xi.reshape(len(Xi), m_sub, d_sub)
                # integer argmax of 2*x.c - ||c||^2 == argmax x.c - 0.5||c||^2
                scores = 2 * np.einsum("bsd,skd->bsk", Xs, cbi) - cnorm
                codes = np.argmax(scores, axis=2).astype("int32")
                yield pd.DataFrame(
                    {"id": pdf["id"].to_numpy(), "codes": [c.tolist() for c in codes]}
                )

        return vecs.mapInPandas(encode, schema="id long, codes array<int>")
    flat = cb.reshape(m_sub * k_codes, d_sub)
    half_norm = 0.5 * (flat * flat).sum(axis=1).reshape(m_sub, k_codes)

    def encode(batches):
        for pdf in batches:
            X = np.vstack(pdf["v"].to_numpy())  # (b, d)
            if R is not None:
                X = X @ R.T
            Xs = X.reshape(len(X), m_sub, d_sub)  # (b, s, ds)
            # scores[b, s, k] = x_bs . c_sk - 0.5||c_sk||^2
            scores = np.einsum("bsd,skd->bsk", Xs, cb) - half_norm
            codes = np.argmax(scores, axis=2).astype("int32")  # (b, s)
            yield pd.DataFrame(
                {"id": pdf["id"].to_numpy(), "codes": [c.tolist() for c in codes]}
            )

    return vecs.mapInPandas(encode, schema="id long, codes array<int>")


def ivf_pq_topk(
    emb: DataFrame,
    k: int = 10,
    m: int = 16,
    n_probe: int = 4,
    m_sub: int = 8,
    k_codes: int = 256,
    rerank: int = 4,
    rotation_seed: int | None = None,
    dyadic_bits: int | None = None,
) -> DataFrame:
    """(query_id, neighbor_id, rank, cosine) — IVF + product quantization.

    The scale ANN path when even the per-cell float vectors are too big
    to scan: cell members are stored as m_sub-byte PQ codes; each probed
    cell scores candidates with an asymmetric-distance LUT (one
    (m_sub x k_codes) table per query, score = sum of table lookups — no
    float vectors touched), keeps the top ``k*rerank`` per cell, and the
    global top ``k*rerank`` approximate candidates are re-ranked with
    exact cosines (one join back to the float vectors, O(q*k*rerank)
    rows).  Final scores are therefore EXACT cosines — PQ only decides
    which candidates reach the re-rank, trading recall for a ~(8B*d/m_sub)
    per-vector memory cut.  Deterministic end-to-end (seeded centroids,
    seeded codebooks, id tie-breaks).

    ``dyadic_bits``: carry the ADC entirely in int64 on the 2^-bits grid
    (snapped queries x snapped codebook; approx = exact integer LUT sum),
    making the candidate-selection trajectory bit-identical across
    runs/engines — the contract that lets the driver value-oracle this
    query (the float path's einsum sums are order-dependent).
    """
    import numpy as np

    assigned, probes = _ivf_parts(emb, m, n_probe)
    codebooks = pq_train(emb, m_sub=m_sub, k_codes=k_codes, rotation_seed=rotation_seed)
    cb = _codebook_np(codebooks)
    ms, kc, d_sub = cb.shape
    R = _pq_rotation(ms * d_sub, rotation_seed) if rotation_seed is not None else None
    cbi = (
        np.floor(cb * float(2**dyadic_bits)).astype(np.int64)
        if dyadic_bits is not None
        else None
    )

    codes = pq_encode(
        assigned.select("id", "v"),
        codebooks,
        rotation_seed=rotation_seed,
        dyadic_bits=dyadic_bits,
    )
    members = assigned.select(
        F.col("centroid_id").alias("cell"), F.col("id").alias("neighbor_id")
    ).join(codes.withColumnRenamed("id", "neighbor_id"), "neighbor_id")

    n_cand = k * rerank

    def score_cell(key, qpdf: pd.DataFrame, mpdf: pd.DataFrame):
        if qpdf.empty or mpdf.empty:
            return pd.DataFrame(columns=["query_id", "neighbor_id", "approx"])
        Q = np.vstack(qpdf["vq"].to_numpy())  # (q, d)
        if R is not None:
            Q = Q @ R.T  # rotated LUT vs rotated codes: q.x == Rq.Rx
        if cbi is not None:
            Qi = np.floor(Q * float(2**dyadic_bits)).astype(np.int64)
            Qs = Qi.reshape(len(Qi), ms, d_sub)
            lut = np.einsum("qsd,skd->qsk", Qs, cbi)  # int64-exact
        else:
            Qs = Q.reshape(len(Q), ms, d_sub)
            lut = np.einsum("qsd,skd->qsk", Qs, cb)  # (q, s, k_codes)
        C = np.vstack(mpdf["codes"].to_numpy())  # (c, s) int
        nids = mpdf["neighbor_id"].to_numpy()
        rows = []
        for i, qid in enumerate(qpdf["query_id"].to_numpy()):
            # ADC: approx cosine = sum_s lut[i, s, C[:, s]]
            approx = lut[i, np.arange(ms), C].sum(axis=1)  # (c,)
            keep = nids != qid
            kn, ks = nids[keep], approx[keep]
            if cbi is not None:
                # integer scores: exact, no rounding needed for the sort
                order = np.lexsort((kn, -ks))[:n_cand]
            else:
                order = np.lexsort((kn, -np.round(ks, 6)))[:n_cand]
            for j in order:
                rows.append((int(qid), int(kn[j]), float(ks[j])))
        return pd.DataFrame(rows, columns=["query_id", "neighbor_id", "approx"])

    partial = (
        probes.groupBy("centroid_id")
        .cogroup(members.groupBy("cell"))
        .applyInPandas(
            score_cell, schema="query_id long, neighbor_id long, approx double"
        )
    )
    w_a = Window.partitionBy("query_id").orderBy(F.desc("approx"), F.asc("neighbor_id"))
    cand = (
        partial.withColumn("_rk", F.row_number().over(w_a))
        .filter(F.col("_rk") <= n_cand)
        .select("query_id", "neighbor_id")
    )

    # exact re-rank of the surviving candidates (tiny: q * k * rerank rows)
    vecs = _norm_vec(emb)
    scored = (
        cand.join(vecs.select(F.col("id").alias("query_id"), F.col("v").alias("vq")), "query_id")
        .join(vecs.select(F.col("id").alias("neighbor_id"), F.col("v").alias("vc")), "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(_dot(F.col("vq"), F.col("vc")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("long").alias("rank"), "cosine")
    )
