"""Physical-plan regression tests.

Correctness tests prove the kernels compute the right rows; these prove
they compute them with the PLAN we designed — the properties that decide
whether the same program survives a 100x scale-up:

* column pruning / filter pushdown reach the parquet scan,
* the default paths never degenerate into a CartesianProduct,
* the quarantined all-pairs verifiers remain the ONLY cross-join sites,
* the pagerank superstep keeps its one-O(nnz)-exchange shape.

A Catalyst or kernel change that silently regresses one of these would
pass every value oracle and still be the wrong engine at scale — that is
why they are pinned here, the same way the bucketed-sink exchange test
pins its one-shuffle plan (test_corpus.py).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

SF = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def _physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


@pytest.fixture(scope="module", autouse=True)
def _pristine_cache(spark):
    """Plan assertions need cache-free plans: a persisted entry matching any
    scanned subtree (leaked by an earlier module against the session-scoped
    session) substitutes an InMemoryRelation whose child FileScan reads ALL
    columns, falsifying the pruning checks without any engine regression."""
    spark.catalog.clearCache()
    yield


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_token_counts_prunes_scan_columns(spark, docs):
    """token_counts needs (doc_id, text); the parquet scan must not read
    lang/source/n_chars — at 100 TB that pruning is most of the I/O."""
    from graphblas_algorithms_spark.pipeline.text import token_counts

    plan = _physical(token_counts(docs))
    scan = [ln for ln in plan.splitlines() if "FileScan" in ln]
    assert scan, plan
    line = scan[0]
    assert "doc_id" in line and "text" in line, line
    for dropped in ("lang", "source", "n_chars"):
        assert dropped not in line, f"scan reads pruned column {dropped}: {line}"


def test_quality_filter_pushes_down(spark, docs):
    """A predicate on a scanned column must reach PushedFilters."""
    filtered = docs.filter(F.col("n_chars") > 100).select("doc_id", "n_chars")
    plan = _physical(filtered)
    assert "PushedFilters" in plan and "GreaterThan(n_chars,100)" in plan, plan


def _assert_no_cartesian(df, label):
    plan = _physical(df)
    for marker in ("CartesianProduct", "BroadcastNestedLoopJoin"):
        assert marker not in plan, f"{label} degenerated to {marker}:\n{plan}"


def test_default_paths_have_no_cross_join(spark, docs, emb):
    """Every DEFAULT (scale-path) operator must plan pure hash/sort-merge
    joins. The brute-force verifiers (cosine_topk, embedding_near_
    duplicates) are allowed cross joins and are n-capped elsewhere."""
    from graphblas_algorithms_spark.pipeline.dedup import (
        embedding_lsh_near_duplicates,
        minhash_near_duplicates,
        simhash,
    )
    from graphblas_algorithms_spark.pipeline.similarity import ivf_topk

    _assert_no_cartesian(
        minhash_near_duplicates(docs, threshold=0.5), "minhash_near_duplicates"
    )
    _assert_no_cartesian(simhash(docs), "simhash")
    _assert_no_cartesian(
        embedding_lsh_near_duplicates(emb, threshold=0.8),
        "embedding_lsh_near_duplicates",
    )
    # ivf_topk's centroid scoring is a deliberate broadcast of an m-row
    # table (m ~ sqrt(n) tiny): BroadcastNestedLoopJoin over THAT side is
    # the designed plan, a CartesianProduct anywhere is not.
    plan = _physical(ivf_topk(emb, k=3, m=4, n_probe=2))
    assert "CartesianProduct" not in plan, plan


def test_triangle_count_plan_shape(spark):
    """Oriented wedge join: no cross join, and the output-pattern mask is
    a (left-)semi join applied in the same plan as the wedge join."""
    from graphblas_algorithms_spark.classes.graph import Graph

    e = spark.createDataFrame(
        [(0, 1), (1, 2), (0, 2), (2, 3)], "src long, dst long"
    )
    nodes = spark.range(4).select(F.col("id"))
    from graphblas_algorithms_spark.operators.triangles import triangles

    tri = triangles(Graph(e, nodes))
    plan = _physical(tri)
    assert "CartesianProduct" not in plan
    assert "LeftSemi" in plan, plan


def test_pagerank_superstep_exchange_count(spark):
    """The fused superstep = ONE exchange on the contribution groupBy
    plus the state's pinned partitioning — a regression that adds a
    per-iteration exchange (e.g. losing the co-partitioning) shows up
    here as extra Exchange nodes in the per-superstep slice."""
    from graphblas_algorithms_spark.functions.semiring import vxm

    edges = spark.createDataFrame(
        [(0, 1, 0.5), (1, 2, 0.5), (2, 0, 1.0)], "src long, dst long, weight double"
    ).repartition(4, "src")
    state = spark.createDataFrame(
        [(0, 1.0), (1, 1.0), (2, 1.0)], "id long, value double"
    ).repartition(4, "id")
    y = vxm(state, edges, add="sum", mul="times")
    plan = _physical(y)
    n_exchanges = plan.count("Exchange hashpartitioning")
    # state->src realign + groupBy(dst) agg; the edge side is pinned by
    # the caller's repartition (reused, AQE may elide it)
    assert n_exchanges <= 3, f"vxm grew to {n_exchanges} exchanges:\n{plan}"
    assert "CartesianProduct" not in plan


def test_chunk_documents_zero_exchanges(spark, docs):
    """Chunking is a pure scan-side explode: no shuffle anywhere, and
    the scan prunes to (doc_id, text)."""
    from graphblas_algorithms_spark.pipeline.curation import chunk_documents

    plan = _physical(chunk_documents(docs, chunk_tokens=128, stride=96))
    assert "Exchange" not in plan, plan


def test_pack_sequences_bounded_exchanges(spark, docs):
    """The distributed prefix sum = the one corpus shuffle (bucket
    window) + the tiny n_buckets-row aggregate side; a regression to a
    global un-partitioned window would plan Window with an empty
    partition spec over a SinglePartition exchange of the CORPUS — the
    corpus-side Window must be partitioned by bucket."""
    from graphblas_algorithms_spark.pipeline.curation import pack_sequences

    df = pack_sequences(docs, seq_len=256, n_buckets=8)
    plan = _physical(df)
    assert "CartesianProduct" not in plan
    # corpus-sized exchanges: bucket repartition for the within-bucket
    # window (+ its agg input reuse). The offsets side is an 8-row agg;
    # its SinglePartition exchange is bounded, not corpus-sized.
    n_hash = plan.count("Exchange hashpartitioning")
    assert n_hash <= 3, f"pack_sequences grew to {n_hash} hash exchanges:\n{plan}"
    # the within-bucket window must carry the bucket partition spec —
    # Spark prints it first inside windowspecdefinition(...)
    wins = [ln for ln in plan.splitlines() if "windowspecdefinition(" in ln]
    assert wins and any(
        "windowspecdefinition(bucket" in ln for ln in wins
    ), "\n".join(wins)


def test_negative_sample_no_cartesian(spark):
    """Candidate mapping + rejection are hash joins end-to-end."""
    from graphblas_algorithms_spark.classes.graph import Graph
    from graphblas_algorithms_spark.operators.sampling import (
        khop_neighbor_sample,
        negative_edge_sample,
    )

    e = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 0), (0, 2)], "src long, dst long"
    )
    G = Graph(e, spark.range(4).select("id"))
    plan = _physical(negative_edge_sample(G, k=2, factor=2))
    assert "CartesianProduct" not in plan, plan

    plan2 = _physical(khop_neighbor_sample(G, fanouts=(2, 2)))
    assert "CartesianProduct" not in plan2, plan2


def test_domain_cap_corpus_never_shuffled(spark, docs):
    """The cap's windows run over the per-(source, n_chars) HISTOGRAM,
    not corpus rows: every windowspec in the plan sits above the
    aggregated histogram or the tie band, and the kept_full corpus path
    reaches its join through a broadcast exchange (no corpus hash
    shuffle on the semi-join side)."""
    from graphblas_algorithms_spark.pipeline.curation import domain_cap

    plan = _physical(domain_cap(docs, cap=20))
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan, plan
    # the histogram running-count window partitions by the group key
    wins = [ln for ln in plan.splitlines() if "windowspecdefinition(" in ln]
    assert wins and all("windowspecdefinition(source" in ln for ln in wins), "\n".join(wins)


def test_pmi_bigrams_joins_are_dim_sized(spark, docs):
    """PMI joins run on aggregated vocabulary tables: both unigram joins
    hash tiny aggregates, and the corpus contributes only two scan-side
    explodes feeding partial aggs (no corpus-row join)."""
    from graphblas_algorithms_spark.pipeline.text import pmi_bigrams

    plan = _physical(pmi_bigrams(docs, min_count=5, top=20))
    assert "CartesianProduct" not in plan
    # every HashAggregate below the joins is preceded by a partial agg
    assert "partial_count" in plan, plan


def test_shard_manifest_no_global_window(spark, docs):
    """Shard assignment inherits pack_sequences' two-phase prefix sum:
    the corpus window must stay bucket-partitioned (a regression to a
    global ORDER BY-only window would single-task the corpus)."""
    from graphblas_algorithms_spark.pipeline.curation import shard_manifest

    plan = _physical(shard_manifest(docs, shard_tokens=2000))
    wins = [ln for ln in plan.splitlines() if "windowspecdefinition(" in ln]
    assert wins and any("windowspecdefinition(bucket" in ln for ln in wins), "\n".join(wins)


def test_incremental_dedup_no_cartesian(spark, docs):
    """Incoming-vs-base banding joins on (band, key) and verification on
    doc ids — never a cross join."""
    from graphblas_algorithms_spark.pipeline.curation import _uniform
    from graphblas_algorithms_spark.pipeline.dedup import incremental_near_duplicates
    from pyspark.sql import functions as F

    u = _uniform(F.col("doc_id"), "t")
    df = incremental_near_duplicates(docs.filter(u < 0.5), docs.filter(u >= 0.5))
    _assert_no_cartesian(df, "incremental_near_duplicates")
