"""Source-table synthesizer + edge extraction tests.

Covers the BASELINE.json input_hint contract: table shape, per-row
content sha256 determinism (the row invariant), extraction == embedded
ground truth, hub skew, and renumber-once dense ids."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from graphblas_algorithms_spark.sources.corpus import expected_sha, synthesize_source_table
from graphblas_algorithms_spark.sources.edges import build_link_graph, extract_import_pairs


def test_schema_and_determinism(spark):
    src1 = synthesize_source_table(spark, n_repos=5, files_per_repo=10)
    assert [f.name for f in src1.schema.fields[:5]] == [
        "repo", "path", "commit", "lang", "content",
    ]
    assert src1.count() == 50
    # per-row sha256 invariant: two independent generations are identical
    src2 = synthesize_source_table(spark, n_repos=5, files_per_repo=10)
    sha1 = {(r["repo"], r["path"]): r["sha256"] for r in expected_sha(src1).collect()}
    sha2 = {(r["repo"], r["path"]): r["sha256"] for r in expected_sha(src2).collect()}
    assert sha1 == sha2
    # commit format: 40 hex chars
    for r in src1.select("commit").collect():
        assert re.fullmatch(r"[0-9a-f]{40}", r["commit"])


def test_extraction_matches_embedded_ground_truth(spark):
    """The synthesizer embeds imports in content; extraction via regex must
    recover exactly the generated pairs (oracle: python re over content)."""
    src = synthesize_source_table(spark, n_repos=8, files_per_repo=12).persist()
    got = {
        (r["src_module"], r["dst_module"])
        for r in extract_import_pairs(src).collect()
    }
    want = set()
    for r in src.select("module", "lang", "content").collect():
        pats = {
            "py": r"(?m)^import ([a-z0-9_.]+)$",
            "js": r"require\('([a-z0-9_/]+)'\)",
            "go": r'(?m)^import "([a-z0-9_/]+)"$',
            "java": r"(?m)^import ([a-z0-9_.]+);$",
        }
        for m in re.findall(pats[r["lang"]], r["content"]):
            dst = m.replace("/", ".")
            if dst != r["module"]:
                want.add((r["module"], dst))
    assert got == want
    assert len(got) > 50  # non-trivial graph
    src.unpersist()


def test_link_graph_ids_dense_and_deterministic(spark):
    src = synthesize_source_table(spark, n_repos=6, files_per_repo=10)
    edges, nodes = build_link_graph(src)
    n = nodes.count()
    ids = sorted(r["id"] for r in nodes.collect())
    assert ids == list(range(n))  # dense 0..n-1 (renumber-once, SURVEY §1.2)
    # deterministic: same key -> same id across builds
    edges2, nodes2 = build_link_graph(src)
    m1 = {r["key"]: r["id"] for r in nodes.collect()}
    m2 = {r["key"]: r["id"] for r in nodes2.collect()}
    assert m1 == m2
    # edge endpoints within id range
    mx = edges.agg(F.max("src").alias("a"), F.max("dst").alias("b")).collect()[0]
    assert mx["a"] < n and mx["b"] < n


def test_dense_ids_survive_cache_loss(spark):
    """The id mapping must be a pure function of the key set: after every
    cached block is dropped (the local stand-in for executor loss at
    cluster scale), re-collecting the SAME nodes DataFrame must yield the
    identical key->id mapping.  Regression: the repartitionByRange +
    spark_partition_id formulation re-sampled ranges on recompute against
    a driver-frozen offset table and silently reassigned ids."""
    from graphblas_algorithms_spark.classes._utils import assign_dense_ids

    keys = spark.createDataFrame([(f"mod.{i % 97:03d}.{i:05d}",) for i in range(3000)],
                                 "key string")
    ids_df = assign_dense_ids(keys, "key", 16)
    before = {r["key"]: r["id"] for r in ids_df.collect()}
    assert sorted(before.values()) == list(range(3000))
    assert [k for k, _ in sorted(before.items(), key=lambda kv: kv[1])] == sorted(before)
    spark.catalog.clearCache()
    after = {r["key"]: r["id"] for r in ids_df.collect()}
    assert before == after


def test_hub_skew_present(spark):
    """FIXTURES.md F1: a hub vertex should hold >=5% of all edges."""
    src = synthesize_source_table(spark, n_repos=40, files_per_repo=25)
    edges, nodes = build_link_graph(src)
    total = edges.count()
    top = (
        edges.groupBy("dst").count().orderBy(F.desc("count")).limit(1).collect()[0]
    )
    assert top["count"] >= 0.05 * total, (top["count"], total)


def test_bucketed_edge_sink_join_is_exchange_free(spark, tmp_path):
    """write_edges_bucketed persists the src-hash partitioning across jobs:
    a fresh read joined on src must need NO exchange on the edge side
    (the scan itself reports its buckets), and round-trip the rows."""
    from graphblas_algorithms_spark.sources.edges import (
        read_edges_bucketed,
        write_edges_bucketed,
    )

    src = synthesize_source_table(spark, n_repos=6, files_per_repo=10)
    edges, nodes = build_link_graph(src)
    spark.sql("DROP TABLE IF EXISTS gas_test_edges_bucketed")
    write_edges_bucketed(
        edges, "gas_test_edges_bucketed", buckets=8, path=str(tmp_path / "eb")
    )
    back = read_edges_bucketed(spark, "gas_test_edges_bucketed")
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, edges.collect()))

    # minimal-lineage state side so the plan has exactly two branches;
    # merge hint defeats the tiny-data broadcast so the partitioning
    # requirement is actually exercised: with the edge side bucketed the
    # ONLY exchange in the final plan is the state side's
    state = spark.range(0, 500).select(F.col("id").alias("src"), F.lit(1.0).alias("value"))
    joined = back.join(state.hint("merge"), "src")
    joined.collect()
    plan = joined._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert "Bucketed: true" in final, final
    assert final.count("Exchange hashpartitioning") == 1, final
    spark.sql("DROP TABLE IF EXISTS gas_test_edges_bucketed")


def test_snapshot_latest_dedups_to_head(spark):
    """With historical versions of the same (repo, path) present, only
    the lexicographically-last commit's row survives — so superseded
    imports contribute no edges — and an already-single-version table
    passes through unchanged."""
    from graphblas_algorithms_spark.sources.edges import snapshot_latest

    src = synthesize_source_table(spark, n_repos=4, files_per_repo=5).persist()
    # single-version table: identity (same rows back)
    same = snapshot_latest(src)
    assert same.count() == src.count()
    assert (
        same.exceptAll(src.select("repo", "path", "commit", "lang", "content")).count()
        == 0
    )

    # plant two older versions of one file with different content
    victim = src.orderBy("repo", "path").limit(1).collect()[0]
    hist = spark.createDataFrame(
        [
            (victim["repo"], victim["path"], "0" * 40, victim["lang"], "import old.one\n"),
            (victim["repo"], victim["path"], "1" * 40, victim["lang"], "import old.two\n"),
        ],
        "repo string, path string, commit string, lang string, content string",
    )
    merged = src.select("repo", "path", "commit", "lang", "content").unionByName(hist)
    head = snapshot_latest(merged)
    assert head.count() == src.count()  # still one row per (repo, path)
    got = head.filter(
        (F.col("repo") == victim["repo"]) & (F.col("path") == victim["path"])
    ).collect()[0]
    # synthesized commits are hex sha prefixes > "11...1" lexicographically
    assert got["commit"] == victim["commit"] and got["content"] == victim["content"]


def test_read_source_table_path_and_catalog_forms(spark, tmp_path):
    """read_source_table resolves both a parquet path and a catalog/view
    identifier (the Iceberg-table form: any V2 catalog resolves through
    spark.table the same way) and rejects wrong-schema inputs early."""
    import pytest

    from graphblas_algorithms_spark.sources.edges import read_source_table

    src = synthesize_source_table(spark, n_repos=3, files_per_repo=4)
    p = str(tmp_path / "src_table")
    src.write.parquet(p)

    by_path = read_source_table(spark, p)
    assert by_path.count() == 12

    src.createOrReplaceTempView("repos_view")
    by_table = read_source_table(spark, "repos_view")
    assert by_table.count() == 12
    # both forms feed the same extraction
    assert extract_import_pairs(by_path).count() == extract_import_pairs(by_table).count()

    spark.range(3).createOrReplaceTempView("not_a_corpus")
    with pytest.raises(ValueError, match="missing column"):
        read_source_table(spark, "not_a_corpus")
