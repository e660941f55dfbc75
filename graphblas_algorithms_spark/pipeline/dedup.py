"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Driver mandate: first-class pipeline components over the ``documents``
and ``embeddings`` tables, each with a DuckDB-SQL oracle.

Engine-portable hashing: every hash is ``md5`` of a string — identical
in Spark and DuckDB — and MinHash minimizes over the HEX STRING (fixed
length, lowercase), which is order-isomorphic to the underlying 128-bit
integer.  No engine-specific hash (Spark's murmur3 ``hash()`` would not
reproduce in an oracle).

Scale shapes:
* exact: one groupBy on the fingerprint — minimal shuffle, partial agg.
* MinHash+LSH: shingle explode -> per-doc signature agg -> band keys ->
  self-join on band key.  Candidate pairs only (never all-pairs); the
  verify step computes true Jaccard only on candidates.
* SimHash: per-token bit votes aggregated per doc — explode + sum, all
  codegen'd integer math.
* n-gram Jaccard: inverted-index self-join on shingle -> pair intersect
  counts -> filter by threshold (exact but O(pairs-sharing-a-shingle);
  the LSH path is the 100TB route).
* embedding cosine: brute-force pair filter at small scale; the ANN
  module (similarity.py) holds the bucketed scale path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_duplicates(docs: DataFrame) -> DataFrame:
    """(doc_id, canonical_id) for every doc in a >=2-member exact-dup
    group; canonical = min doc_id of the group (normalized-text md5)."""
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    fp = docs.select("doc_id", F.md5(norm).alias("fp"))
    groups = fp.groupBy("fp").agg(
        F.min("doc_id").alias("canonical_id"), F.count("*").alias("_n")
    )
    return (
        fp.join(groups.filter(F.col("_n") >= 2), "fp")
        .select("doc_id", "canonical_id")
    )


# ---------------------------------------------------------------------------
# shingling
# ---------------------------------------------------------------------------


def word_shingles(docs: DataFrame, k: int = 3) -> DataFrame:
    """(doc_id, shingle) — distinct k-word shingles of the lowercased,
    whitespace-normalized text.  Docs shorter than k words contribute
    their full text as one shingle."""
    words = F.split(F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " "), " ")
    n = F.size(words)
    idx = F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1)))
    sh = F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(words, i, k))
    )
    return docs.select(
        "doc_id", F.explode(F.array_distinct(sh)).alias("shingle")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def minhash_signatures(docs: DataFrame, k: int = 3, n_hashes: int = 12) -> DataFrame:
    """(doc_id, sig: array<string>) — n_hashes MinHash values; hash i of a
    shingle is md5(i || ':' || shingle), minimized as hex string."""
    sh = word_shingles(docs, k)
    mins = [
        F.min(F.md5(F.concat(F.lit(f"{i}:"), F.col("shingle")))).alias(f"h{i}")
        for i in range(n_hashes)
    ]
    agg = sh.groupBy("doc_id").agg(*mins)
    return agg.select(
        "doc_id", F.array(*[F.col(f"h{i}") for i in range(n_hashes)]).alias("sig")
    )


def _band_keys(docs: DataFrame, k: int, n_hashes: int, bands: int) -> DataFrame:
    """(doc_id, band, key) — one LSH bucket key per band: md5 of the
    band's MinHash rows joined with '|'."""
    rows = n_hashes // bands
    sig = minhash_signatures(docs, k, n_hashes)
    band_cols = []
    for b in range(bands):
        band_key = F.md5(
            F.concat_ws("|", *[F.col("sig")[b * rows + r] for r in range(rows)])
        )
        band_cols.append(
            sig.select("doc_id", F.lit(b).alias("band"), band_key.alias("key"))
        )
    banded = band_cols[0]
    for extra in band_cols[1:]:
        banded = banded.unionByName(extra)
    return banded


def lsh_candidate_pairs(
    docs: DataFrame, k: int = 3, n_hashes: int = 12, bands: int = 4
) -> DataFrame:
    """(doc_a, doc_b) candidate near-dup pairs: docs agreeing on ALL
    rows of at least one band (n_hashes/bands rows per band)."""
    banded = _band_keys(docs, k, n_hashes, bands)
    left = banded.select("band", "key", F.col("doc_id").alias("doc_a"))
    right = banded.select("band", "key", F.col("doc_id").alias("doc_b"))
    return (
        left.join(right, ["band", "key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def minhash_near_duplicates(
    docs: DataFrame,
    k: int = 3,
    n_hashes: int = 12,
    bands: int = 4,
    threshold: float = 0.7,
) -> DataFrame:
    """(doc_a, doc_b, jaccard) — LSH candidates verified with TRUE shingle
    Jaccard >= threshold (computed only on candidates)."""
    cand = lsh_candidate_pairs(docs, k, n_hashes, bands)
    return _verify_jaccard(docs, cand, k, threshold)


def incremental_near_duplicates(
    base: DataFrame,
    incoming: DataFrame,
    k: int = 3,
    n_hashes: int = 12,
    bands: int = 4,
    threshold: float = 0.7,
) -> DataFrame:
    """(doc_id, dup_of, jaccard) — every INCOMING doc that near-duplicates
    some BASE doc: LSH candidates from an incoming→base band join,
    verified with true shingle Jaccard >= threshold.

    The snapshot-refresh dedup step: when a corpus is extended, only the
    new slice is deduped — against the base, not base-vs-base.  At
    100 TB the asymmetry is the point: the base side's band table is a
    compact precomputable signature index (n_hashes hex strings per
    doc, ~1e-4 of corpus bytes), so the only corpus-scale work is
    signing the incoming slice; the band join touches base text again
    only for verification, and only on candidate doc pairs.  doc_ids
    must be disjoint across the two frames."""
    cand = (
        _band_keys(incoming, k, n_hashes, bands)
        .select("band", "key", F.col("doc_id").alias("doc_a"))
        .join(
            _band_keys(base, k, n_hashes, bands).select(
                "band", "key", F.col("doc_id").alias("doc_b")
            ),
            ["band", "key"],
        )
        .select("doc_a", "doc_b")
        .distinct()
    )
    both = base.select("doc_id", "text").unionByName(incoming.select("doc_id", "text"))
    ver = _verify_jaccard(both, cand, k, threshold)
    return ver.select(
        F.col("doc_a").alias("doc_id"), F.col("doc_b").alias("dup_of"), "jaccard"
    )


def dedup_incremental(
    base: DataFrame,
    incoming: DataFrame,
    k: int = 3,
    n_hashes: int = 12,
    bands: int = 4,
    threshold: float = 0.7,
) -> DataFrame:
    """The surviving incoming slice: ``incoming`` minus every doc
    ``incremental_near_duplicates`` matched to the base corpus."""
    dups = incremental_near_duplicates(
        base, incoming, k, n_hashes, bands, threshold
    ).select("doc_id")
    return incoming.join(dups, "doc_id", "left_anti")


def near_duplicate_clusters(
    docs: DataFrame,
    k: int = 3,
    n_hashes: int = 12,
    bands: int = 4,
    threshold: float = 0.7,
) -> DataFrame:
    """(doc_id, cluster_id, is_survivor) — corpus-level dedup.

    Pairwise near-dup detection is not enough to deduplicate a corpus:
    "keep one copy per near-dup PAIR" over-deletes when dups chain
    (A~B, B~C but not A~C).  The industry-standard answer is the
    transitive closure — cluster = connected component of the verified
    candidate-pair graph — which this operator gets by feeding
    ``minhash_near_duplicates`` edges into the engine's own
    ``connected_components`` kernel (min-label delta-frontier).

    * ``cluster_id`` = min doc_id reachable through near-dup links;
      singleton docs are their own cluster.
    * ``is_survivor`` = the canonical kept copy (min doc_id per
      cluster) — deterministic, engine-portable.

    100 TB shape: LSH banding is a bucketed self-join, Jaccard verify
    touches candidates only, and the CC fixpoint shuffles a shrinking
    delta frontier — no all-pairs step anywhere.
    """
    from ..classes.graph import Graph
    from ..operators.components import connected_components

    pairs = minhash_near_duplicates(docs, k, n_hashes, bands, threshold)
    # doc_a < doc_b already holds — Graph's canonical src <= dst for free
    edges = pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    nodes = docs.select(F.col("doc_id").alias("id"))
    comp = connected_components(Graph(edges, nodes=nodes))
    return comp.select(
        F.col("id").alias("doc_id"),
        F.col("component").alias("cluster_id"),
        (F.col("id") == F.col("component")).alias("is_survivor"),
    )


def _verify_jaccard(
    docs: DataFrame, pairs: DataFrame, k: int, threshold: float
) -> DataFrame:
    sh = word_shingles(docs, k).persist()
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    inter = (
        pairs.join(sh.select(F.col("doc_id").alias("doc_a"), "shingle"), "doc_a")
        .join(sh.select(F.col("doc_id").alias("doc_b"), F.col("shingle").alias("_s2")), "doc_b")
        .filter(F.col("shingle") == F.col("_s2"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("inter"))
    )
    out = (
        inter.join(sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("_na")), "doc_a")
        .join(sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("_nb")), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("inter") / (F.col("_na") + F.col("_nb") - F.col("inter")), 6
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return out


# ---------------------------------------------------------------------------
# n-gram Jaccard (exact all-candidate variant)
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(
    docs: DataFrame, k: int = 3, threshold: float = 0.5, max_df: int | None = None
) -> DataFrame:
    """(doc_a, doc_b, jaccard) — exact: inverted-index join on shingles,
    so only pairs sharing >=1 shingle are scored.

    ``max_df`` (scale knob, default off): drop shingles present in more
    than ``max_df`` docs from the *candidate-generation* join.  A shingle
    in d docs fans out to d² pair rows, so one boilerplate shingle across
    1M docs is a 10¹² -row skew bomb at corpus scale; capping df bounds
    the join at O(max_df · Σdf).  Intersections are still counted over
    capped shingles only, so a pair sharing ONLY hot shingles is missed —
    documented recall trade; the exact default keeps the oracle exact."""
    sh = word_shingles(docs, k).persist()
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    idx = sh
    if max_df is not None:
        rare = (
            sh.groupBy("shingle")
            .agg(F.count("*").alias("_df"))
            .filter(F.col("_df") <= max_df)
            .select("shingle")
        )
        idx = sh.join(rare, "shingle")
    pairs = (
        idx.select(F.col("doc_id").alias("doc_a"), "shingle")
        .join(idx.select(F.col("doc_id").alias("doc_b"), "shingle"), "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("inter"))
    )
    return (
        pairs.join(sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("_na")), "doc_a")
        .join(sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("_nb")), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("inter") / (F.col("_na") + F.col("_nb") - F.col("inter")), 6
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash(docs: DataFrame, bits: int = 16) -> DataFrame:
    """(doc_id, simhash: long) — per-token md5, one vote per bit,
    bit set iff positive vote sum.  Bits come from the first bits/4
    hex nibbles of the token hash (engine-portable integer math).

    Up to 64 bits: the value is the signed two's-complement view of the
    bit pattern (bit 63 contributes -2^63), so the full corpus-scale
    64-bit hash fits a BIGINT in both Spark and DuckDB."""
    assert bits % 4 == 0 and bits <= 64
    tok = docs.select(
        "doc_id",
        F.explode(
            F.split(F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " "), " ")
        ).alias("token"),
    ).withColumn("h", F.md5("token"))
    hexmap = "0123456789abcdef"
    # decode each hex nibble ONCE in a projection (bits/4 string ops per
    # token), then derive the 4 bit votes per nibble with integer
    # shift/mask — the r2-flagged 64-wide string-expression tree did the
    # instr+substring work per BIT (4x the string ops) and relied on
    # codegen CSE that the aggregate planner does not guarantee
    nibs = [
        (F.instr(F.lit(hexmap), F.substring(F.col("h"), nib + 1, 1)) - 1).alias(
            f"n{nib}"
        )
        for nib in range(bits // 4)
    ]
    tok = tok.select("doc_id", *nibs)
    votes = []
    for b in range(bits):
        nib = b // 4
        shift = b % 4
        bit = F.shiftright(F.col(f"n{nib}"), shift).bitwiseAND(F.lit(1))
        votes.append(F.sum(bit * 2 - 1).alias(f"v{b}"))
    agg = tok.groupBy("doc_id").agg(*votes)
    sim = None
    for b in range(bits):
        # bit 63 is the sign bit of the BIGINT two's-complement view; the
        # remaining sum of lower bits is < 2^63 so the addition never
        # overflows in either engine
        val = -(2 ** 63) if b == 63 else 2 ** b
        term = F.when(F.col(f"v{b}") > 0, F.lit(val)).otherwise(F.lit(0))
        sim = term if sim is None else sim + term
    return agg.select("doc_id", sim.cast("long").alias("simhash"))


def simhash_near_duplicates(docs: DataFrame, bits: int = 16, max_hamming: int = 2) -> DataFrame:
    """(doc_a, doc_b, hamming) — pairs within Hamming distance over the
    simhash; banded by the two halves of the hash (a pair within distance
    <= bits/2-1 shares at least one exact half — classic pigeonhole LSH)."""
    sh = simhash(docs, bits).persist()
    half = bits // 2
    # bitwise ops, not %/floor-div: the 64-bit hash is a SIGNED long (bit
    # 63 = sign), where arithmetic mod/div would mangle the halves
    lo = F.col("simhash").bitwiseAND(F.lit(2 ** half - 1)).alias("k")
    hi = F.shiftrightunsigned(F.col("simhash"), half).alias("k")
    banded = sh.select("doc_id", "simhash", F.lit(0).alias("band"), lo).unionByName(
        sh.select("doc_id", "simhash", F.lit(1).alias("band"), hi)
    )
    cand = (
        banded.select("band", "k", F.col("doc_id").alias("doc_a"), F.col("simhash").alias("_sa"))
        .join(
            banded.select("band", "k", F.col("doc_id").alias("doc_b"), F.col("simhash").alias("_sb")),
            ["band", "k"],
        )
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "_sa", "_sb")
        .distinct()
    )
    ham = F.bit_count(F.col("_sa").bitwiseXOR(F.col("_sb")))
    return cand.select(
        "doc_a", "doc_b", ham.cast("long").alias("hamming")
    ).filter(F.col("hamming") <= max_hamming)


# ---------------------------------------------------------------------------
# embedding cosine near-dup
# ---------------------------------------------------------------------------


def hyperplanes(n_planes: int, dim: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (no RNG: component (i,j) is
    derived from md5(i:j)), identical across engines/runs — the LSH bucket
    keys they induce can therefore be replicated verbatim in a SQL oracle."""
    import hashlib

    planes = []
    for i in range(n_planes):
        comps = []
        for j in range(dim):
            h = hashlib.md5(f"{i}:{j}".encode()).hexdigest()
            comps.append((int(h[:8], 16) % 2001 - 1000) / 1000.0)
        planes.append(comps)
    return planes


def embedding_lsh_near_duplicates(
    emb: DataFrame,
    threshold: float = 0.35,
    n_planes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """(id_a, id_b, cosine) — bucketed random-hyperplane LSH near-dup:

    1. per vector, ``n_planes`` sign bits (dot with deterministic
       hyperplanes — plain scan-side projections, no shuffle);
    2. band the bits (pigeonhole): pairs agreeing on a full band become
       candidates via a band-key self-join — candidates only, NEVER
       all-pairs;
    3. exact cosine verify >= threshold on the candidates.

    This is the 100 TB shape (the brute-force
    :func:`embedding_near_duplicates` is the tiny-scale exact verifier).
    Output is the LSH-recalled subset of the exact result — deterministic,
    so a SQL oracle can reproduce it bit-for-bit."""
    rows_per_band = n_planes // bands
    assert rows_per_band * bands == n_planes
    dim = len(emb.select("embedding").first()["embedding"])
    planes = hyperplanes(n_planes, dim)
    v = emb.select(
        F.col("vec_id"),
        F.col("embedding").cast("array<double>").alias("v"),
    ).withColumn(
        "norm",
        F.sqrt(F.aggregate(F.col("v"), F.lit(0.0), lambda a, x: a + x * x)),
    )

    def _dot_plane(plane):
        arr = F.array(*[F.lit(float(c)) for c in plane])
        return F.aggregate(
            F.zip_with(F.col("v"), arr, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    bit_cols = [
        F.when(_dot_plane(planes[i]) >= 0, F.lit("1")).otherwise(F.lit("0")).alias(f"b{i}")
        for i in range(n_planes)
    ]
    bits = v.select("vec_id", "v", "norm", *bit_cols).persist()
    banded = None
    for b in range(bands):
        key = F.concat(*[F.col(f"b{b * rows_per_band + r}") for r in range(rows_per_band)])
        part = bits.select("vec_id", F.lit(b).alias("band"), key.alias("key"))
        banded = part if banded is None else banded.unionByName(part)
    cand = (
        banded.select("band", "key", F.col("vec_id").alias("id_a"))
        .join(banded.select("band", "key", F.col("vec_id").alias("id_b")), ["band", "key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    va = bits.select(F.col("vec_id").alias("id_a"), F.col("v").alias("_va"), F.col("norm").alias("_na"))
    vb = bits.select(F.col("vec_id").alias("id_b"), F.col("v").alias("_vb"), F.col("norm").alias("_nb"))
    dot = F.aggregate(
        F.zip_with(F.col("_va"), F.col("_vb"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .select(
            "id_a",
            "id_b",
            # greatest(..., 1e-12) only guards pathological zero vectors;
            # identical to the SQL oracle on any nonzero input
            F.round(dot / F.greatest(F.col("_na") * F.col("_nb"), F.lit(1e-12)), 6).alias(
                "cosine"
            ),
        )
        .filter(F.col("cosine") >= threshold)
    )


def embedding_near_duplicates(
    emb: DataFrame, threshold: float = 0.95, max_n: int | None = -1
) -> DataFrame:
    """(id_a, id_b, cosine) — brute-force pair scan with cosine >=
    threshold.  Exact but O(n²): the tiny-scale verifier; the bucketed
    scale path is :func:`embedding_lsh_near_duplicates` (and IVF in
    similarity.py).  Guarded to ``max_n`` corpus rows (default
    ``ALL_PAIRS_MAX_N`` from similarity.py; ``None`` disables)."""
    from .similarity import ALL_PAIRS_MAX_N, _guard_all_pairs

    _guard_all_pairs(
        emb,
        ALL_PAIRS_MAX_N if max_n == -1 else max_n,
        "embedding_near_duplicates",
        "embedding_lsh_near_duplicates",
    )
    v = emb.select(
        F.col("vec_id"),
        F.col("embedding").cast("array<double>").alias("v"),
    ).withColumn(
        "norm",
        F.sqrt(F.aggregate(F.col("v"), F.lit(0.0), lambda a, x: a + x * x)),
    )
    a = v.select(F.col("vec_id").alias("id_a"), F.col("v").alias("va"), F.col("norm").alias("na"))
    b = v.select(F.col("vec_id").alias("id_b"), F.col("v").alias("vb"), F.col("norm").alias("nb"))
    pairs = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
    dot = F.aggregate(
        F.zip_with(F.col("va"), F.col("vb"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        pairs.select(
            "id_a",
            "id_b",
            F.round(dot / F.greatest(F.col("na") * F.col("nb"), F.lit(1e-12)), 6).alias(
                "cosine"
            ),
        )
        .filter(F.col("cosine") >= threshold)
    )


def semantic_dedup(
    emb: DataFrame,
    m: int = 16,
    threshold: float = 0.35,
    refine_iters: int = 0,
    max_cell_pairs: int | None = 50_000_000,
) -> DataFrame:
    """(vec_id, centroid_id) — the KEPT corpus after SemDeDup-style
    cluster-then-dedup (Abbas et al., "SemDeDup: Data-efficient learning
    at web-scale through semantic deduplication", arXiv:2303.09540):

    1. k-means-partition the embedding space (deterministic_centroids,
       similarity.py — min-id residue seeds + optional Lloyd steps);
    2. assign every vector to its nearest centroid (one broadcast join
       against the m-row centroid table, round-6 cosine, ties to the
       smaller centroid_id);
    3. WITHIN each cell only, drop every vector with a cosine >=
       threshold to any smaller-id vector of the same cell.

    The within-cell restriction is the whole point: pairwise work is
    sum(|cell|^2) instead of n^2, and the self-join shuffles on
    centroid_id only — at 100 TB size m ~ n/10^4 so cells stay bounded,
    exactly the IVF sizing story (similarity.py).  The paper keeps one
    representative per epsilon-ball; we pin the deterministic,
    join-expressible variant "drop iff a smaller-id in-cell neighbor
    clears the threshold" (min-id representative).

    ``max_cell_pairs`` prices the pair join from the assignment counts
    BEFORE running it (one tiny agg — the wedge-budget pattern from
    triadic_census): a pathological corpus whose vectors collapse into
    one dominant cell re-creates the all-pairs join inside that cell,
    and the right behavior at scale is to refuse with the measured
    number rather than melt an executor.  Raise it deliberately (or
    pass None) for a corpus known to be cell-balanced; the durable fix
    for a dominant cell is a larger ``m`` or an extra Lloyd step.

    With ``refine_iters=0`` the centroids are exact normalized corpus
    vectors, so every comparison is a round-6 vector-vector cosine and
    the driver oracle (``pipe_semdedup``) replays the full pipeline in
    SQL; ``refine_iters>=1`` is the quality path (since r5 the Lloyd
    cell means are dyadic scaled-integer exact — see
    ``deterministic_centroids`` — so this path is SQL-replayable too,
    as ``pipe_ann_ivf``'s oracle demonstrates).
    """
    from pyspark.sql import Window

    from .similarity import _dot, _norm_vec, deterministic_centroids

    vecs = _norm_vec(emb, id_col="vec_id")
    cents = deterministic_centroids(emb, m, refine_iters=refine_iters)
    assigned = (
        vecs.crossJoin(F.broadcast(cents))
        .select(
            "id", "v", "centroid_id",
            F.round(_dot(F.col("v"), F.col("cv")), 6).alias("_sim"),
        )
        .withColumn(
            "_rk",
            F.row_number().over(
                Window.partitionBy("id").orderBy(F.desc("_sim"), F.asc("centroid_id"))
            ),
        )
        .filter(F.col("_rk") == 1)
        .select("id", "v", "centroid_id")
        .persist()
    )
    if max_cell_pairs is not None:
        pairs_priced = (
            assigned.groupBy("centroid_id")
            .agg(F.count(F.lit(1)).alias("c"))
            .agg(F.sum(F.col("c") * (F.col("c") - 1) / 2).alias("p"))
            .collect()[0]["p"]
        )
        pairs_priced = int(pairs_priced or 0)
        if pairs_priced > max_cell_pairs:
            assigned.unpersist()
            raise ValueError(
                f"semantic_dedup would materialize ~{pairs_priced:,} within-cell "
                f"pairs (> max_cell_pairs={max_cell_pairs:,}) — the corpus "
                "collapses into dominant cells.  Raise m / refine_iters to "
                "split the cells, or raise max_cell_pairs deliberately."
            )
    a = assigned.select(
        "centroid_id", F.col("id").alias("_ida"), F.col("v").alias("_va")
    )
    b = assigned.select(
        "centroid_id", F.col("id").alias("_idb"), F.col("v").alias("_vb")
    )
    dropped = (
        a.join(b, "centroid_id")
        .filter(F.col("_ida") < F.col("_idb"))
        .select(
            F.col("_idb").alias("id"),
            F.round(_dot(F.col("_va"), F.col("_vb")), 6).alias("_cos"),
        )
        .filter(F.col("_cos") >= threshold)
        .select("id")
        .distinct()
    )
    return assigned.join(dropped, "id", "left_anti").select(
        F.col("id").alias("vec_id"), "centroid_id"
    )
