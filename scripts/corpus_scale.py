"""Corpus-curation kernels at the multi-million-document scale.

Synthesizes a deterministic corpus with PLANTED duplicate structure
(exact dups every 50th doc, near-dups every 20th: parent text + one
extra word), then times the curation surface and checks the planted
structure is recovered:

  * exact_duplicates        — must find exactly the planted exact pairs
  * incremental MinHash LSH — planted near-dup recall (expected ~1.0 at
                              12 hashes / 4 bands and jaccard ~0.95)
  * domain_cap              — histogram-threshold cap over a zipf-ish
                              source skew (one source holds ~10%)
  * shard_manifest          — token-balanced shards over the full tape

Usage: python scripts/corpus_scale.py [n_docs] [cores]
Writes /tmp/corpus_scale.json.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from graphblas_algorithms_spark.session import get_spark


def synth_docs(spark, n: int):
    """(doc_id, text, source, n_chars) — pure function of doc_id.

    seed = doc_id rounded down to its dup parent; text = 50-200 words
    'w<h>' from a 5000-word vocabulary, all md5-derived.  doc_id%20==0
    (and not %50==0) appends one unique word -> a planted near-dup of
    doc_id-1's text; doc_id%50==0 shares the parent seed verbatim -> a
    planted exact dup of doc_id-1."""
    d = spark.range(n).select(F.col("id").alias("doc_id"))
    is_exact = (F.col("doc_id") % 50 == 0) & (F.col("doc_id") > 0)
    is_near = (F.col("doc_id") % 20 == 0) & (~is_exact) & (F.col("doc_id") > 0)
    seed = F.when(is_exact | is_near, F.col("doc_id") - 1).otherwise(F.col("doc_id"))
    d = d.select("doc_id", seed.alias("seed"), is_near.alias("is_near"), is_exact.alias("is_exact"))
    length = (50 + F.pmod(F.conv(F.substring(F.md5(F.concat_ws(":", F.lit("len"), F.col("seed"))), 1, 8), 16, 10).cast("long"), F.lit(150))).cast("int")
    words = F.transform(
        F.sequence(F.lit(1), length),
        lambda i: F.concat(
            F.lit("w"),
            F.pmod(
                F.conv(F.substring(F.md5(F.concat_ws(":", F.col("seed"), i)), 1, 8), 16, 10).cast("long"),
                F.lit(5000),
            ),
        ),
    )
    text = F.array_join(words, " ")
    text = F.when(F.col("is_near"), F.concat(text, F.lit(" x"), F.col("doc_id"))).otherwise(text)
    src_u = F.conv(F.substring(F.md5(F.concat_ws(":", F.lit("src"), F.col("seed"))), 1, 15), 16, 10).cast("double") / F.lit(1152921504606846976.0)
    source = F.concat(F.lit("s"), F.floor(F.pow(src_u, 3.0) * 200).cast("long"))
    return d.select(
        "doc_id",
        text.alias("text"),
        source.alias("source"),
        F.length(text).alias("n_chars"),
        "is_near",
        "is_exact",
    )


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    spark = get_spark(cores=cores, shuffle_partitions=2 * cores, driver_memory="48g")
    out = {"n_docs": n, "cores": cores}

    t0 = time.time()
    docs = synth_docs(spark, n).repartition(4 * cores).persist()
    n_act = docs.count()
    planted_exact = docs.filter("is_exact").count()
    planted_near = docs.filter("is_near").count()
    out["synth_s"] = round(time.time() - t0, 1)
    print(f"synth: {n_act} docs ({planted_exact} exact / {planted_near} near planted) in {out['synth_s']}s", flush=True)

    from graphblas_algorithms_spark.pipeline.dedup import (
        exact_duplicates,
        incremental_near_duplicates,
    )

    t0 = time.time()
    ex = exact_duplicates(docs).persist()
    n_ex_groups = ex.count()
    wall = time.time() - t0
    out["exact_dedup"] = {"dup_groups": n_ex_groups, "wall_s": round(wall, 1)}
    print(f"exact dedup: {n_ex_groups} dup rows in {wall:.1f}s", flush=True)

    # near-dup recall: incoming = the planted near-dups, base = the rest
    t0 = time.time()
    base = docs.filter("NOT is_near").select("doc_id", "text")
    incoming = docs.filter("is_near").select("doc_id", "text")
    hits = incremental_near_duplicates(base, incoming, k=3, n_hashes=12, bands=4, threshold=0.7)
    matched_to_parent = (
        hits.filter(F.col("dup_of") == F.col("doc_id") - 1).select("doc_id").distinct().count()
    )
    wall = time.time() - t0
    recall = matched_to_parent / planted_near if planted_near else 1.0
    out["minhash_incremental"] = {
        "planted": planted_near,
        "recovered": matched_to_parent,
        "recall": round(recall, 4),
        "wall_s": round(wall, 1),
    }
    print(f"incremental LSH: {matched_to_parent}/{planted_near} planted near-dups (recall {recall:.4f}) in {wall:.1f}s", flush=True)

    from graphblas_algorithms_spark.pipeline.curation import domain_cap, shard_manifest

    t0 = time.time()
    capped = domain_cap(docs.select("doc_id", "source", "n_chars"), cap=10_000)
    n_kept = capped.count()
    over = capped.groupBy("source").count().filter("count > 10000").count()
    wall = time.time() - t0
    out["domain_cap"] = {"kept": n_kept, "sources_over_cap": over, "wall_s": round(wall, 1)}
    print(f"domain cap: kept {n_kept} (0 over-cap check: {over}) in {wall:.1f}s", flush=True)

    t0 = time.time()
    man = shard_manifest(docs, shard_tokens=1_000_000).persist()
    n_shards = man.count()
    from pyspark.sql import functions as FF

    stats = man.agg(
        FF.min("tokens").alias("mn"), FF.max("tokens").alias("mx"), FF.sum("tokens").alias("tot")
    ).collect()[0]
    wall = time.time() - t0
    out["shard_manifest"] = {
        "shards": n_shards,
        "min_tokens": int(stats["mn"]),
        "max_tokens": int(stats["mx"]),
        "total_tokens": int(stats["tot"]),
        "wall_s": round(wall, 1),
    }
    print(f"shards: {n_shards} x ~1M tokens (min {stats['mn']}, max {stats['mx']}) in {wall:.1f}s", flush=True)

    # span-level dedup: plant a fixed 16-word boilerplate header on every
    # 5th doc (2 aligned 8-token windows), run strip_repeated_spans, and
    # check every planted header is fully removed
    from graphblas_algorithms_spark.pipeline.text import strip_repeated_spans

    header = " ".join(f"hdr{i}" for i in range(16))
    spanned = docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 5 == 0, F.concat(F.lit(header + " "), F.col("text")))
        .otherwise(F.col("text"))
        .alias("text"),
    )
    n_hdr = n_act // 5 + (1 if n_act % 5 else 0)
    t0 = time.time()
    cleaned = strip_repeated_spans(spanned, span_tokens=8, min_docs=2).persist()
    n_cleaned = cleaned.count()
    hdr_stripped = (
        cleaned.filter(F.col("doc_id") % 5 == 0)
        .filter(~F.col("clean_text").contains("hdr0"))
        .filter(F.col("n_spans_dropped") >= 2)
        .count()
    )
    wall = time.time() - t0
    out["span_dedup"] = {
        "docs": n_cleaned,
        "planted_headers": n_hdr,
        "headers_removed": hdr_stripped,
        "wall_s": round(wall, 1),
    }
    print(
        f"span dedup: {hdr_stripped}/{n_hdr} planted headers removed "
        f"({n_cleaned} docs) in {wall:.1f}s",
        flush=True,
    )
    cleaned.unpersist()

    with open("/tmp/corpus_scale.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
