"""KeyedGraph convenience-layer tests: key-typed edges in, keyed results
out, against networkx on the same small graph (nxapi-analog breadth,
reference ``nxapi/`` tree)."""

from __future__ import annotations

import networkx as nx
import pytest

from graphblas_algorithms_spark.api import KeyedGraph


@pytest.fixture(scope="module")
def kg_and_nx(spark):
    nxg = nx.gnp_random_graph(30, 0.15, seed=7, directed=True)
    key = {i: f"repo/{i:02d}" for i in nxg.nodes}
    rows = [(key[u], key[v]) for u, v in nxg.edges]
    raw = spark.createDataFrame(rows, "from_repo string, to_repo string")
    kg = KeyedGraph(raw, "from_repo", "to_repo", directed=True)
    return kg, nxg, key


def test_keyed_pagerank(kg_and_nx):
    kg, nxg, key = kg_and_nx
    got = kg.to_dict(kg.pagerank(fixed_iters=15), "rank")
    from .oracles import pagerank_oracle

    want = pagerank_oracle(nxg, fixed_iters=15)
    for u, v in want.items():
        assert got[key[u]] == pytest.approx(v, abs=1e-9)


def test_keyed_components_and_scalars(kg_and_nx):
    kg, nxg, key = kg_and_nx
    got = kg.to_dict(kg.strongly_connected_components(), "component")
    comp_of = {}
    for comp in nx.strongly_connected_components(nxg):
        m = min(comp)
        for u in comp:
            comp_of[u] = m
    # same partition (labels are ids, compare as partitions of keys)
    by_label_got = {}
    for k, c in got.items():
        by_label_got.setdefault(c, set()).add(k)
    by_label_want = {}
    for u, c in comp_of.items():
        by_label_want.setdefault(c, set()).add(key[u])
    assert sorted(map(sorted, by_label_got.values())) == sorted(
        map(sorted, by_label_want.values())
    )
    assert kg.reciprocity() == pytest.approx(nx.overall_reciprocity(nxg))


def test_keyed_bfs_and_degree(kg_and_nx):
    kg, nxg, key = kg_and_nx
    src = key[0]
    got = kg.to_dict(kg.bfs_levels(src), "level")
    want = nx.single_source_shortest_path_length(nxg, 0)
    assert got == {key[u]: lv for u, lv in want.items()}
    gd = kg.to_dict(kg.in_degree_centrality(), "centrality")
    wd = nx.in_degree_centrality(nxg)
    for u, v in wd.items():
        assert gd[key[u]] == pytest.approx(v, abs=1e-9)


def test_keyed_triangles_undirected(spark):
    nxg = nx.gnp_random_graph(25, 0.2, seed=3)
    key = {i: f"n{i}" for i in nxg.nodes}
    raw = spark.createDataFrame(
        [(key[u], key[v]) for u, v in nxg.edges], "a string, b string"
    )
    kg = KeyedGraph(raw, "a", "b", directed=False)
    got = kg.to_dict(kg.triangles(), "triangles")
    want = nx.triangles(nxg)
    assert got == {key[u]: t for u, t in want.items()}
    assert kg.transitivity() == pytest.approx(nx.transitivity(nxg))


def test_tune_shuffle_partitions(spark):
    from graphblas_algorithms_spark.session import tune_shuffle_partitions

    orig = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        assert tune_shuffle_partitions(spark, 77_000, max_parts=32) == 7
        assert spark.conf.get("spark.sql.shuffle.partitions") == "7"
        assert tune_shuffle_partitions(spark, 10, max_parts=32) == 2       # floor
        assert tune_shuffle_partitions(spark, 10**9, max_parts=32) == 32   # cap
        assert tune_shuffle_partitions(spark, 0, max_parts=32) == 2        # degenerate
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", orig)
