"""Text-analysis operators for large-scale training-data pipelines.

Beyond the reference's graph surface (driver mandate): language-ID,
quality scoring, token counting, document fingerprinting — all pure
Catalyst expressions (JVM-side, whole-stage-codegen'd; no Python in the
hot path), each with an exact DuckDB-SQL oracle in __spark_entry__.py.

Input: the ``documents`` table (doc_id: long, text: string,
lang: string, source: string, n_chars: long).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# tiny per-language stopword profiles for the n-gram/stopword heuristic.
# (The sf documents corpus is synthetic English-ish; the operator's value
# is the plan shape — scan-side scoring with zero shuffles.)
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "in", "is", "data", "value"],
    "de": ["der", "die", "und", "nicht", "das", "ist"],
    "fr": ["le", "la", "les", "des", "est", "une"],
    "es": ["el", "la", "los", "que", "una", "por"],
}

_BPE_ISH = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"


def token_counts(docs: DataFrame) -> DataFrame:
    """(doc_id, ws_tokens, bpe_tokens) — whitespace tokens and a BPE-ish
    regex token count (letters runs / digit runs / single punctuation)."""
    return docs.select(
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long").alias("ws_tokens"),
        F.size(
            F.regexp_extract_all(F.col("text"), F.lit(_BPE_ISH), F.lit(0))
        ).cast("long").alias("bpe_tokens"),
    )


def quality_scores(docs: DataFrame) -> DataFrame:
    """(doc_id, n_chars_q, n_tokens, mean_token_len, punct_ratio,
    stopword_ratio, quality) — length/punct/stopword heuristics; the
    composite ``quality`` in [0,1] mirrors common pretraining filters
    (Gopher-style rules re-expressed as one scan projection)."""
    toks = F.split(F.trim(F.col("text")), r"\s+")
    n_tok = F.size(toks)
    n_chars = F.length("text")
    punct = F.size(F.regexp_extract_all(F.col("text"), F.lit(r"[^\w\s]"), F.lit(0)))
    stop_arr = F.array(*[F.lit(w) for w in LANG_MARKERS["en"]])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    mean_len = (n_chars - (n_tok - 1)) / n_tok  # chars net of single spaces
    punct_ratio = punct / F.greatest(n_chars, F.lit(1))
    stop_ratio = n_stop / F.greatest(n_tok, F.lit(1))
    quality = (
        F.when(n_tok < 5, 0.0)
        .otherwise(
            F.least(
                F.lit(1.0),
                F.lit(0.5) * (1.0 - punct_ratio * 10.0)
                + F.lit(0.3) * F.least(stop_ratio * 5.0, F.lit(1.0))
                + F.lit(0.2) * F.least(n_tok / 100.0, F.lit(1.0)),
            )
        )
    )
    return docs.select(
        "doc_id",
        n_chars.cast("long").alias("n_chars_q"),
        n_tok.cast("long").alias("n_tokens"),
        F.round(mean_len, 6).alias("mean_token_len"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(F.greatest(quality, F.lit(0.0)), 6).alias("quality"),
    )


def language_id(docs: DataFrame) -> DataFrame:
    """(doc_id, pred_lang, score) — stopword-profile language ID: count
    marker hits per language over whitespace tokens; argmax with
    lexicographic tie-break.  One scan, one projection, no shuffle."""
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    scores = []
    for lang, markers in sorted(LANG_MARKERS.items()):
        arr = F.array(*[F.lit(w) for w in markers])
        cnt = F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))
        scores.append(F.struct(cnt.alias("hits"), F.lit(lang).alias("lang")))
    # argmax hits, tie -> lexicographically SMALLEST lang: max over
    # struct(hits, negated-rank) is awkward for strings, so order the
    # candidates descending by preference and use greatest()'s
    # first-wins-on-tie... greatest is value-based; instead build struct
    # (hits, rev) where rev = reverse alphabetical rank as int
    ranked = []
    langs = sorted(LANG_MARKERS)
    for i, s in enumerate(scores):
        ranked.append(
            F.struct(
                s["hits"].alias("hits"),
                F.lit(len(langs) - 1 - i).alias("rev"),
                s["lang"].alias("lang"),
            )
        )
    best = F.greatest(*ranked)
    return docs.select(
        "doc_id",
        best["lang"].alias("pred_lang"),
        best["hits"].cast("long").alias("score"),
    )


def fingerprints(docs: DataFrame) -> DataFrame:
    """(doc_id, fingerprint) — content fingerprint: md5 of the
    whitespace/case-normalized text (rolling-hash analog that is engine
    portable; the normalization is the part that matters for dedup)."""
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    return docs.select("doc_id", F.md5(norm).alias("fingerprint"))


def repetition_scores(docs: DataFrame) -> DataFrame:
    """(doc_id, n_words, dup2_frac, dup3_frac) — intra-document
    repetition: the fraction of duplicate word 2-grams / 3-grams
    (Gopher-style "repetition" quality signals; high values flag
    boilerplate, keyword stuffing, and degenerate generations).

    100 TB shape: pure scan-side Catalyst projection — the n-gram
    arrays, distinct counts and fractions are all array expressions
    inside one whole-stage-codegen'd project, zero shuffles and zero
    Python.  Docs shorter than n words score 0.0 (nothing to repeat).
    """
    w = F.split(F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " "), " ")

    def dup_frac(n: int):
        grams = F.transform(
            F.sequence(F.lit(1), F.size(w) - n + 1),
            lambda i: F.concat_ws(" ", F.slice(w, i, n)),
        )
        return F.when(
            F.size(w) >= n,
            F.round(
                F.lit(1.0) - F.size(F.array_distinct(grams)) / F.size(grams), 6
            ),
        ).otherwise(F.lit(0.0))

    return docs.select(
        "doc_id",
        F.size(w).cast("long").alias("n_words"),
        dup_frac(2).alias("dup2_frac"),
        dup_frac(3).alias("dup3_frac"),
    )


def source_mix(docs: DataFrame) -> DataFrame:
    """(source, n_docs, ws_tokens, token_share) — the mixture table a
    token-budget planner starts from: per-source document and
    whitespace-token totals and each source's share of the corpus.

    100 TB shape: token counting is scan-side; the groupBy(source)
    partial-aggregates before the (tiny, #sources-row) shuffle; the
    share window runs over the K aggregated rows, not the corpus.
    """
    from pyspark.sql import Window

    tok = docs.select(
        "source",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long").alias("t"),
    )
    agg = tok.groupBy("source").agg(
        F.count("*").alias("n_docs"), F.sum("t").alias("ws_tokens")
    )
    total = F.sum("ws_tokens").over(Window.partitionBy())
    return agg.select(
        "source",
        "n_docs",
        "ws_tokens",
        F.round(F.col("ws_tokens") / total, 6).alias("token_share"),
    )


def clean_corpus(
    docs: DataFrame,
    min_quality: float = 0.65,
    langs: tuple[str, ...] = ("en",),
) -> DataFrame:
    """(doc_id, pred_lang, n_tokens, quality) — composed training-data
    cleaning pipeline: exact-dedup (keep the min-doc_id canonical of each
    normalized-text md5 group), language filter, quality floor.

    The 100 TB shape: quality and language scores are scan-side
    projections (zero shuffle); dedup is ONE groupBy on the fingerprint;
    the three doc_id-keyed joins reuse one hash partitioning.  This is
    the end-to-end composition a pretraining ingest actually runs, with
    every stage individually oracled (pipe_quality / pipe_langid /
    pipe_exact_dups) and the composition oracled as pipe_clean_corpus.
    """
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    fp = docs.select("doc_id", F.md5(norm).alias("fp"))
    canonical = fp.groupBy("fp").agg(F.min("doc_id").alias("doc_id"))
    kept = fp.join(canonical, ["fp", "doc_id"], "left_semi").select("doc_id")
    q = quality_scores(docs).select("doc_id", "n_tokens", "quality")
    lg = language_id(docs).select("doc_id", "pred_lang")
    return (
        kept.join(q, "doc_id")
        .join(lg, "doc_id")
        .filter((F.col("quality") >= min_quality) & F.col("pred_lang").isin(*langs))
        .select("doc_id", "pred_lang", "n_tokens", "quality")
    )


def common_ngrams(
    docs: DataFrame, n: int = 3, min_docs: int = 2, top: int = 100
) -> DataFrame:
    """(ngram, n_docs, n_occurrences) — corpus-level frequent word
    n-grams: the boilerplate-mining primitive (license headers, site
    chrome, template text) that feeds span-removal and contamination
    probes.  Returns the ``top`` most frequent n-grams appearing in at
    least ``min_docs`` distinct documents, totally ordered
    (occurrences desc, ngram asc) so the selected set is deterministic.

    100 TB shape: the n-gram array is a scan-side Catalyst projection;
    the explode feeds ONE groupBy(ngram) whose count() partial-aggregates
    map-side before the shuffle (count_distinct(doc_id) is the only
    expand); the top-N is a TakeOrdered over the aggregated (already
    small) ngram table, never the corpus.
    """
    w = F.split(F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " "), " ")
    # guard: sequence(1, size-n+1) DESCENDS when size < n (Spark infers
    # step -1), yielding invalid slice starts — short docs contribute none
    grams = F.when(
        F.size(w) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(w) - n + 1),
            lambda i: F.concat_ws(" ", F.slice(w, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        docs.select("doc_id", F.explode(grams).alias("ngram"))
        .groupBy("ngram")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count("*").alias("n_occurrences"),
        )
        .filter(F.col("n_docs") >= min_docs)
        .orderBy(F.desc("n_occurrences"), F.asc("ngram"))
        .limit(top)
    )


def tfidf_top_terms(docs: DataFrame, k: int = 5) -> DataFrame:
    """(doc_id, term, tf, df, tfidf) — per-document top-k terms by
    tf-idf (idf = ln(N/df)), the keyword-extraction primitive behind
    topic tagging and quality-aware sampling.  Deterministic: rank by
    (tfidf desc, term asc) within each doc.

    100 TB shape: explode -> ONE groupBy(doc_id, term) with map-side
    partial counts; df comes from a second groupBy over the already
    term-deduped pairs (far smaller than the corpus); N is a broadcast
    1-row aggregate; the per-doc top-k is a window over doc_id-hashed
    partitions — the same partitioning the pair table already has.
    """
    from pyspark.sql import Window

    w = F.split(F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " "), " ")
    pairs = (
        docs.select("doc_id", F.explode(w).alias("term"))
        .filter(F.col("term") != "")
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    df_tbl = pairs.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = docs.agg(F.countDistinct("doc_id").alias("_n"))
    scored = (
        pairs.join(df_tbl, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            F.round(F.col("tf") * F.log(F.col("_n") / F.col("df")), 6).alias("tfidf"),
        )
    )
    rk = F.row_number().over(
        Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    )
    return scored.withColumn("_rk", rk).filter(F.col("_rk") <= k).drop("_rk")


def lm_scores(docs: DataFrame, prefix_len: int | None = None) -> DataFrame:
    """(doc_id, lm_logprob: double, lm_per_token: double) — corpus-trained
    add-one-smoothed word-bigram language-model score per document.

    The KenLM-style quality-filter proxy: documents whose token
    transitions are improbable under the corpus's own bigram statistics
    (boilerplate, shuffled text, OCR noise) score low.  Two passes, both
    plain aggregations: (1) corpus bigram/unigram counts (one groupBy
    each — partial-agg friendly, the "train" shuffle is bounded by the
    vocabulary, not the corpus); (2) per-document sum of
    log((c(w1,w2) + 1) / (c(w1) + V)) via one join of the document's
    bigrams against the count tables.  Deterministic and exactly
    replayable in SQL (integer counts + ln of their ratio).

    ``prefix_len`` truncates each document to its first N whitespace
    tokens before scoring (bounds the explode at web scale)."""
    w = F.split(F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " "), " ")
    if prefix_len is not None:
        w = F.slice(w, 1, prefix_len)
    toks = docs.select("doc_id", F.posexplode(w).alias("pos", "w1"))
    bi = toks.withColumn(
        "w2", F.lead("w1").over(Window.partitionBy("doc_id").orderBy("pos"))
    ).filter(F.col("w2").isNotNull())
    uni_c = bi.groupBy("w1").agg(F.count("*").alias("c1"))
    bi_c = bi.groupBy("w1", "w2").agg(F.count("*").alias("c2"))
    vocab = toks.select("w1").distinct().count()
    scored = (
        bi.join(bi_c, ["w1", "w2"])
        .join(uni_c, "w1")
        .groupBy("doc_id")
        .agg(
            F.sum(
                F.log((F.col("c2") + 1.0) / (F.col("c1") + F.lit(float(vocab))))
            ).alias("lm_logprob"),
            F.count("*").alias("_nb"),
        )
    )
    return docs.select("doc_id").join(scored, "doc_id", "left").select(
        "doc_id",
        F.coalesce("lm_logprob", F.lit(0.0)).alias("lm_logprob"),
        F.coalesce(F.col("lm_logprob") / F.col("_nb"), F.lit(0.0)).alias(
            "lm_per_token"
        ),
    )


def pmi_bigrams(docs: DataFrame, min_count: int = 5, top: int = 100) -> DataFrame:
    """(w1, w2, n_pair, pmi) — the ``top`` adjacent-word collocations by
    pointwise mutual information: pmi = ln(N * c(w1,w2) / (c(w1)*c(w2)))
    with N = total bigram occurrences.  The classic collocation /
    multiword-expression miner (Church-Hanks 1990) — at corpus-curation
    time it surfaces glued boilerplate ("rights reserved", "click here")
    that plain frequency ranking buries under stopword pairs.

    100 TB shape: two scan-side explodes (bigrams, unigrams) each feeding
    one map-side-combinable count agg; the PMI join runs on the
    aggregated vocabulary tables (dim-sized, the bigram side already
    filtered to ``min_count``), never on corpus rows; top-N is a
    TakeOrdered over the scored vocabulary.  ``min_count`` also keeps the
    estimator sane (PMI of singletons is noise).  Rounded to 6 dp and
    totally ordered (pmi desc, w1, w2) so the set is deterministic and
    engine-portable (the DuckDB oracle replays it verbatim)."""
    w = F.split(F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " "), " ")
    grams = F.when(
        F.size(w) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(w) - 1),
            lambda i: F.concat_ws(" ", F.slice(w, i, 2)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    big = (
        docs.select(F.explode(grams).alias("bg"))
        .groupBy("bg")
        .agg(F.count("*").alias("n_pair"))
        .filter(F.col("n_pair") >= min_count)
        .select(
            F.split_part(F.col("bg"), F.lit(" "), F.lit(1)).alias("w1"),
            F.split_part(F.col("bg"), F.lit(" "), F.lit(2)).alias("w2"),
            "n_pair",
        )
    )
    uni = (
        docs.select(F.explode(w).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("n_tok"))
    )
    n_pairs_total = docs.select(
        F.sum(F.greatest(F.size(w) - 1, F.lit(0))).alias("n")
    ).collect()[0]["n"]
    return (
        big.join(uni.select(F.col("tok").alias("w1"), F.col("n_tok").alias("_c1")), "w1")
        .join(uni.select(F.col("tok").alias("w2"), F.col("n_tok").alias("_c2")), "w2")
        .select(
            "w1",
            "w2",
            "n_pair",
            F.round(
                F.log(
                    F.lit(float(n_pairs_total))
                    * F.col("n_pair")
                    / (F.col("_c1") * F.col("_c2"))
                ),
                6,
            ).alias("pmi"),
        )
        .orderBy(F.desc("pmi"), "w1", "w2")
        .limit(top)
    )


def doc_entropy(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, entropy) — per-document unigram Shannon entropy
    (nats): H = -sum_w p_w ln p_w over the doc's own token distribution.
    The cheap gibberish/repetition detector — near-zero entropy flags
    keyword-stuffed or looping text, abnormally high entropy flags random
    strings; quality filters cut both tails (complements
    ``repetition_scores``'s positional signal with a distributional one).

    One explode + one (doc_id, token) count agg + one per-doc sum —
    every stage map-side combinable, keyed on doc_id, no corpus-wide
    state.  Rounded to 6 dp for engine-portable comparison."""
    w = F.split(F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " "), " ")
    tok = docs.select("doc_id", F.explode(w).alias("tok"))
    cnt = tok.groupBy("doc_id", "tok").agg(F.count("*").alias("c"))
    tot = cnt.groupBy("doc_id").agg(F.sum("c").alias("n_tokens"))
    return (
        cnt.join(tot, "doc_id")
        .groupBy("doc_id")
        .agg(
            F.first("n_tokens").alias("n_tokens"),
            F.round(
                -F.sum(
                    (F.col("c") / F.col("n_tokens"))
                    * F.log(F.col("c") / F.col("n_tokens"))
                ),
                6,
            ).alias("entropy"),
        )
    )


def strip_repeated_spans(
    docs: DataFrame, span_tokens: int = 8, min_docs: int = 2
) -> DataFrame:
    """(doc_id, clean_text, n_spans, n_spans_dropped) — CCNet-style
    span-level dedup: drop every non-overlapping ``span_tokens``-token
    window whose exact text occurs in >= ``min_docs`` distinct documents
    (license headers, site chrome, template boilerplate), then reassemble
    each document from its surviving windows in order.  Complements
    ``common_ngrams`` (which only MINES boilerplate) by actually removing
    it; the line-level analog of ``exact_duplicates``'s doc-level pass.

    Deterministic: windows are fixed offsets of the whitespace-normalized
    token array, the duplicate test is exact text equality (keyed on md5
    so the corpus-wide shuffle carries 16-byte keys, not span text), and
    reassembly orders by window index — a pure function of the corpus.

    100 TB shape: windows are a scan-side projection (sequence+transform,
    no self-join); the global duplicate set is ONE groupBy(md5) with
    map-side partial aggregation; removal is a left-anti hash join of the
    exploded windows against that (much smaller) set; reassembly is ONE
    groupBy(doc_id) — all exchanges keyed and combinable, no corpus-wide
    broadcast or driver state.  A duplicated mega-span (every doc sharing
    one window) lands on one reducer only in the dup-set agg, where the
    partial count has already collapsed it to one row per partition.
    """
    if span_tokens < 1:
        raise ValueError(f"span_tokens must be >= 1, got {span_tokens}")
    w = F.split(F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " "), " ")
    n_spans = F.ceil(F.size(w) / F.lit(float(span_tokens)))
    span_arr = F.transform(
        F.sequence(F.lit(0), (n_spans - 1).cast("int")),
        lambda i: F.concat_ws(" ", F.slice(w, i * span_tokens + 1, span_tokens)),
    )
    base = docs.select("doc_id", n_spans.alias("n_spans"), span_arr.alias("spans"))
    spans = base.select(
        "doc_id", F.posexplode("spans").alias("idx", "span")
    ).withColumn("h", F.md5("span"))
    dup = (
        spans.groupBy("h")
        .agg(F.countDistinct("doc_id").alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
        .select("h")
    )
    kept = spans.join(dup, "h", "left_anti")
    clean = kept.groupBy("doc_id").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("idx", "span"))),
                lambda s: s["span"],
            ),
        ).alias("clean_text"),
        F.count("*").alias("n_kept"),
    )
    return (
        base.select("doc_id", "n_spans")
        .join(clean, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            F.col("n_spans").cast("long").alias("n_spans"),
            (F.col("n_spans") - F.coalesce("n_kept", F.lit(0)))
            .cast("long")
            .alias("n_spans_dropped"),
        )
    )
