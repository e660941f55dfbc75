"""Corpus-curation operators: benchmark decontamination and
deterministic stratified sampling for training-data mixes.

These close the loop the other pipeline modules open: dedup/quality
(pipeline/dedup.py, pipeline/text.py) decide WHAT may enter a training
corpus; these decide what must be REMOVED because an eval set contains
it, and HOW MUCH of each source to keep for a target mixture.  No
reference analog (the reference is graph-only); the semantics follow the
published pretraining-hygiene recipes (GPT-3 appendix C / Gopher A.3
style n-gram overlap decontamination; The Pile / DoReMi style source
mixing), re-expressed as Catalyst plans.

Scale notes (the 100 TB shapes):

* ``decontaminate`` — the benchmark shingle set is tiny next to the
  corpus (MBs vs TBs), so it is distinct-ed and broadcast; the corpus
  side is one scan + generator explode feeding a broadcast hash join.
  The corpus is never shuffled; only matching (doc_id, shingle) hits
  reach the final groupBy, whose input is bounded by |benchmark| x
  contamination rate, not corpus size.
* ``stratified_sample`` / ``token_budget_sample`` — sampling decisions
  are pure scan-side expressions on an md5-derived uniform, so the
  filter is a zero-shuffle projection Catalyst pushes into the scan;
  determinism means re-runs, resumes, and other engines (the DuckDB
  oracle) pick the exact same rows.  ``token_budget_sample`` adds one
  tiny per-source aggregate (|sources| rows) broadcast back onto the
  scan — two passes over the corpus, zero corpus shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import word_shingles

# 16^15 — an md5 15-hex-digit prefix is uniform on [0, 16^15); dividing
# by this maps it to [0, 1).  15 digits = 60 bits: exact in a double AND
# inside BIGINT range, so Spark's conv() and DuckDB's ::UBIGINT produce
# bit-identical uniforms (the oracle replicates this arithmetic).
_HEX15 = 1152921504606846976.0


def _uniform(col, salt: str):
    """Deterministic hash-uniform double in [0, 1) from any column.

    md5 (not xxhash64) so the DuckDB value oracle can reproduce the
    exact same doubles: both engines compute
    int(md5(salt || ':' || value)[:15], 16) / 16^15.
    """
    h = F.md5(F.concat(F.lit(salt + ":"), col.cast("string")))
    return F.conv(F.substring(h, 1, 15), 16, 10).cast("double") / F.lit(_HEX15)


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    k: int = 3,
    min_hits: int = 1,
) -> DataFrame:
    """(doc_id, bench_hits) — training documents sharing >= ``min_hits``
    distinct k-word shingles with a held-out benchmark corpus.

    ``benchmark`` needs a ``text`` column (eval prompts/completions).
    Shingling matches pipeline/dedup.py:word_shingles (lowercased,
    whitespace-normalized) so dedup and decontamination agree on what a
    "shared n-gram" is.  Join is on the raw shingle string for oracle
    exactness; at 100 TB map both sides through xxhash64(shingle) first
    to shrink the broadcast (collisions only add false positives, which
    is the safe direction for decontamination).

    Returns only contaminated docs; anti-join ``docs`` against the
    result for the clean corpus (see ``decontaminated_corpus``).
    """
    # bench doc identity is irrelevant — only the distinct shingle set is
    # kept — so a constant id avoids a nondeterministic mono-id lineage
    bench_sh = (
        word_shingles(benchmark.select(F.lit(0).alias("doc_id"), "text"), k=k)
        .select("shingle")
        .distinct()
    )
    corpus_sh = word_shingles(docs, k=k)
    hits = (
        corpus_sh.join(F.broadcast(bench_sh), "shingle")
        .groupBy("doc_id")
        .agg(F.count("*").alias("bench_hits"))
        .filter(F.col("bench_hits") >= min_hits)
    )
    return hits.select("doc_id", "bench_hits")


def decontaminated_corpus(
    docs: DataFrame,
    benchmark: DataFrame,
    k: int = 3,
    min_hits: int = 1,
) -> DataFrame:
    """``docs`` minus everything ``decontaminate`` flags (left-anti)."""
    flagged = decontaminate(docs, benchmark, k=k, min_hits=min_hits)
    return docs.join(flagged, "doc_id", "left_anti")


def stratified_sample(
    docs: DataFrame,
    rates: dict[str, float],
    default_rate: float = 0.0,
    salt: str = "sample",
) -> DataFrame:
    """Deterministic per-source Bernoulli sample: keep a row iff
    uniform(doc_id) < rates[source].

    Zero-shuffle: the rate lookup is a literal CASE chain and the keep
    test a scan-side predicate, so Catalyst pushes the whole thing into
    the parquet scan.  Deterministic in doc_id alone — adding or
    removing OTHER rows never flips a row's fate (unlike df.sample,
    whose per-partition RNG reshuffles under repartitioning), which is
    what makes incremental corpus refreshes reproducible.
    """
    rate = F.lit(float(default_rate))
    for src, r in sorted(rates.items()):
        rate = F.when(F.col("source") == src, F.lit(float(r))).otherwise(rate)
    return docs.filter(_uniform(F.col("doc_id"), salt) < rate)


def token_budget_sample(
    docs: DataFrame,
    budget_tokens: int,
    salt: str = "budget",
) -> DataFrame:
    """(doc_id, source, ws_tokens) — sample each source down to ~``budget_tokens``
    whitespace tokens: rate(source) = min(1, budget / total_tokens(source)).

    The mixture table (one row per source) is a tiny aggregate joined
    back broadcast; the keep decision is the same scan-side md5 uniform
    as ``stratified_sample``.  Expected sampled tokens per source ≈ the
    budget; sources under budget are kept whole (rate 1).  This is the
    distributed form of the "sample source X down to Y tokens" step in
    every published data-mix recipe.
    """
    ws_tokens = (
        F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long").alias("ws_tokens")
    )
    toks = docs.select("doc_id", "source", ws_tokens)
    totals = toks.groupBy("source").agg(F.sum("ws_tokens").alias("total_tokens"))
    rates = totals.select(
        "source",
        F.least(
            F.lit(1.0), F.lit(float(budget_tokens)) / F.col("total_tokens")
        ).alias("rate"),
    )
    return (
        toks.join(F.broadcast(rates), "source")
        .filter(_uniform(F.col("doc_id"), salt) < F.col("rate"))
        .select("doc_id", "source", "ws_tokens")
    )


def pack_sequences(
    docs: DataFrame,
    seq_len: int,
    n_buckets: int = 64,
    salt: str = "pack",
) -> DataFrame:
    """(doc_id, ws_tokens, begin_tok, first_seq, last_seq) — concat-and-chop
    sequence packing: shuffle documents into a deterministic order, lay
    their tokens end-to-end on one global tape, and cut the tape into
    fixed ``seq_len`` training windows.  ``begin_tok`` is each document's
    global token offset; ``first_seq``/``last_seq`` are the window ids it
    lands in (a doc longer than the remaining window straddles —
    standard causal-LM packing, no padding waste).

    The global offset is a distributed prefix sum, NOT a single global
    window (``Window.orderBy`` with no partition key drags the whole
    corpus through one task):

    1. bucket = floor(uniform * n_buckets) — the shuffle order and the
       bucketing derive from the SAME md5 uniform, so ordering by
       (bucket, u) equals ordering by u alone;
    2. per-bucket token totals -> exclusive running offsets, a window
       over an ``n_buckets``-row aggregate (bounded, never corpus-sized);
    3. within-bucket exclusive cumsum, a window partitioned by bucket —
       the one corpus shuffle, each partition ~|corpus|/n_buckets.

    At 100 TB raise ``n_buckets`` so a bucket fits an executor (the
    only scale knob); everything is integer arithmetic on deterministic
    hashes, so re-runs and the DuckDB oracle reproduce offsets exactly.
    """
    from pyspark.sql import Window

    u = _uniform(F.col("doc_id"), salt)
    toks = docs.select(
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long").alias("ws_tokens"),
        u.alias("u"),
        F.floor(u * F.lit(float(n_buckets))).cast("long").alias("bucket"),
    )
    bucket_tot = toks.groupBy("bucket").agg(F.sum("ws_tokens").alias("btot"))
    w_b = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    offsets = bucket_tot.select(
        "bucket", F.coalesce(F.sum("btot").over(w_b), F.lit(0)).alias("boff")
    )
    w_in = (
        Window.partitionBy("bucket")
        .orderBy("u", "doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    begin = F.col("boff") + F.coalesce(F.sum("ws_tokens").over(w_in), F.lit(0))
    laid = toks.join(F.broadcast(offsets), "bucket").select(
        "doc_id", "ws_tokens", begin.alias("begin_tok")
    )
    # integer `div`, not `/`: double division loses exactness past 2^53
    # total tokens, and a 100 TB corpus is ~1e13-1e14 tokens — too close
    return laid.select(
        "doc_id",
        "ws_tokens",
        "begin_tok",
        F.expr(f"begin_tok div {int(seq_len)}").alias("first_seq"),
        F.expr(f"(begin_tok + ws_tokens - 1) div {int(seq_len)}").alias("last_seq"),
    )


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 128,
    stride: int = 96,
) -> DataFrame:
    """(doc_id, chunk_id, begin_tok, n_toks) — sliding-window document
    chunking: window ``chunk_tokens`` wide advancing by ``stride``
    (overlap = chunk_tokens - stride), the RAG-indexing / long-doc
    pretraining prep step.  Short docs yield one whole-doc chunk; the
    final window is clipped, never empty (requires stride <=
    chunk_tokens).  Pure integer scan-side arithmetic — explode over a
    computed ``sequence()``, zero shuffles, exact at any scale — and the
    chunk manifest references token offsets so the (heavy) text column
    is never duplicated per chunk.
    """
    if not (1 <= stride <= chunk_tokens):
        raise ValueError(
            f"need 1 <= stride <= chunk_tokens, got stride={stride} "
            f"chunk_tokens={chunk_tokens}"
        )
    n = F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long")
    # chunks = 1 + ceil(max(0, n - chunk) / stride); integer `div` so the
    # count is exact for any doc length (cf. pack_sequences)
    n_chunks = F.expr(
        f"1 + (greatest(_n - {int(chunk_tokens)}, 0) + {int(stride) - 1}) "
        f"div {int(stride)}"
    )
    begin = F.col("chunk_id").cast("long") * F.lit(stride)
    return (
        docs.select("doc_id", n.alias("_n"))
        .select("doc_id", "_n", n_chunks.alias("_c"))
        .select(
            "doc_id",
            "_n",
            F.explode(F.sequence(F.lit(0), (F.col("_c") - 1).cast("int"))).alias(
                "chunk_id"
            ),
        )
        .select(
            "doc_id",
            "chunk_id",
            begin.alias("begin_tok"),
            F.least(F.lit(chunk_tokens).cast("long"), F.col("_n") - begin).alias(
                "n_toks"
            ),
        )
    )


def weighted_sample(
    docs: DataFrame,
    k: int,
    salt: str = "wsample",
) -> DataFrame:
    """(doc_id, source, ws_tokens) — k documents sampled WITHOUT
    replacement with probability proportional to token count, via the
    Efraimidis-Spirakis A-Res key: key = u^(1/weight), keep the k
    largest.  The standard one-pass distributed weighted reservoir:
    token-heavy docs are proportionally likelier, yet the draw is a
    plain top-k, so Spark plans it as TakeOrderedAndProject — each
    partition keeps a local k, only n_partitions*k rows ever merge
    (never a global sort).  Deterministic: u is the md5 uniform of
    doc_id, so re-runs, resumes, and the DuckDB oracle select the
    identical k rows.  This is the "sample k docs by token mass" step
    of mixture building when a source must be represented by a fixed
    COUNT of documents rather than a rate (cf. ``token_budget_sample``).
    """
    key = F.pow(_uniform(F.col("doc_id"), salt), 1.0 / F.col("ws_tokens"))
    return (
        docs.select(
            "doc_id",
            "source",
            F.size(F.split(F.trim(F.col("text")), r"\s+"))
            .cast("long")
            .alias("ws_tokens"),
        )
        .select("doc_id", "source", "ws_tokens", key.alias("_k"))
        .orderBy(F.desc("_k"), "doc_id")
        .limit(k)
        .select("doc_id", "source", "ws_tokens")
    )


def domain_cap(
    docs: DataFrame,
    cap: int,
    by: str = "source",
) -> DataFrame:
    """Cap every domain/source at ``cap`` documents, keeping the longest
    (``n_chars`` DESC, ``doc_id`` ASC tiebreak) — the per-domain cap step
    of CommonCrawl-style curation (C4 / RefinedWeb keep at most N pages
    per registered domain so megadomains don't dominate the mix).

    Skew-aware two-phase plan — the naive ``row_number() OVER
    (PARTITION BY source)`` ships every row of a hot domain to one task,
    which is exactly the domain the cap exists for.  Instead:

    1. Aggregate the per-(source, n_chars) histogram — map-side
       combinable, output is |sources| x |distinct lengths| rows, corpus
       never shuffles.
    2. A window over the HISTOGRAM (tiny) finds, per source, the length
       threshold where the running count crosses ``cap``: rows strictly
       above the threshold are kept outright, rows below are dropped
       outright — both decided by a broadcast semi-join, zero corpus
       shuffle.
    3. Only the boundary band (docs tied AT the threshold length) is
       ranked by doc_id to fill the remaining quota; its size is bounded
       by the tie count at one length value, not by domain size.

    Deterministic in (doc set) alone, so the DuckDB oracle and re-runs
    select identical rows.  Returns the input columns unchanged.
    """
    from pyspark.sql import Window

    hist = docs.groupBy(by, "n_chars").agg(F.count("*").alias("cnt"))
    w = Window.partitionBy(by).orderBy(F.col("n_chars").desc())
    running = hist.select(
        by, "n_chars", "cnt", (F.sum("cnt").over(w) - F.col("cnt")).alias("above")
    )
    keep_whole = running.filter(F.col("above") + F.col("cnt") <= cap).select(
        by, "n_chars"
    )
    boundary = running.filter(
        (F.col("above") < cap) & (F.col("above") + F.col("cnt") > cap)
    ).select(by, "n_chars", (F.lit(cap) - F.col("above")).alias("_quota"))

    kept_full = docs.join(F.broadcast(keep_whole), [by, "n_chars"], "left_semi")
    wb = Window.partitionBy(by).orderBy(F.col("doc_id").asc())
    kept_boundary = (
        docs.join(F.broadcast(boundary), [by, "n_chars"])
        .withColumn("_rn", F.row_number().over(wb))
        .filter(F.col("_rn") <= F.col("_quota"))
        .select(*docs.columns)
    )
    return kept_full.unionByName(kept_boundary)


def training_shards(
    docs: DataFrame,
    shard_tokens: int,
    n_buckets: int = 64,
    salt: str = "shard",
) -> DataFrame:
    """(doc_id, ws_tokens, shard) — assign every document to a
    token-balanced training shard: documents are laid end-to-end in the
    deterministic md5 pseudo-shuffle order (``pack_sequences``'s tape)
    and a doc's shard is its start offset div ``shard_tokens``.  Docs are
    never split, so shard sizes deviate from the target by at most one
    document; the assignment is a pure function of (doc set, salt) —
    re-runs, resumes, and the DuckDB oracle agree shard-for-shard.

    Same scale currency as ``pack_sequences``: a bounded bucket-offset
    window plus one per-bucket corpus window — never a global
    single-task sort."""
    laid = pack_sequences(docs, seq_len=shard_tokens, n_buckets=n_buckets, salt=salt)
    return laid.select("doc_id", "ws_tokens", F.col("first_seq").alias("shard"))


def shard_manifest(
    docs: DataFrame,
    shard_tokens: int,
    n_buckets: int = 64,
    salt: str = "shard",
) -> DataFrame:
    """(shard, n_docs, tokens) — the balance report for
    ``training_shards``: one row per shard with its document count and
    token mass (every shard lands within one straddling document of
    ``shard_tokens``)."""
    s = training_shards(docs, shard_tokens, n_buckets, salt)
    return s.groupBy("shard").agg(
        F.count("*").alias("n_docs"), F.sum("ws_tokens").alias("tokens")
    )


def write_training_shards(
    docs: DataFrame,
    path: str,
    shard_tokens: int,
    n_buckets: int = 64,
    salt: str = "shard",
) -> None:
    """Materialize the sharded corpus: one parquet directory per shard
    (``shard=K/``), rows = the input columns.  ``repartition(shard)``
    before ``partitionBy`` so each shard is written by one task as one
    file — the layout training dataloaders expect — while the shard
    count (corpus_tokens / shard_tokens) stays the parallelism unit at
    any scale."""
    s = training_shards(docs, shard_tokens, n_buckets, salt).select("doc_id", "shard")
    (
        docs.join(s, "doc_id")
        .repartition(F.col("shard"))
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )
