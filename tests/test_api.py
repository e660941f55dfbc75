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
        # cap wins over the floor: a local[1]-style cap of 1 must not be
        # silently raised to min_parts (ADVICE r2)
        assert tune_shuffle_partitions(spark, 77_000, max_parts=1) == 1
        assert tune_shuffle_partitions(spark, 10, max_parts=1) == 1
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", orig)


@pytest.fixture(scope="module")
def two_kgs(spark):
    """Two undirected key graphs over OVERLAPPING but different key sets —
    the case where naive id-space setops would be wrong (each KeyedGraph
    renumbers independently; alignment must happen on keys)."""
    g1 = nx.gnp_random_graph(18, 0.25, seed=11)
    g2 = nx.gnp_random_graph(18, 0.25, seed=12)
    g2 = nx.relabel_nodes(g2, {i: i + 8 for i in g2.nodes})  # keys 8..25
    key = {i: f"k{i:02d}" for i in range(30)}
    r1 = spark.createDataFrame(
        [(key[u], key[v]) for u, v in g1.edges], "a string, b string"
    )
    r2 = spark.createDataFrame(
        [(key[u], key[v]) for u, v in g2.edges], "a string, b string"
    )
    kg1 = KeyedGraph(r1, "a", "b", directed=False)
    kg2 = KeyedGraph(r2, "a", "b", directed=False)
    return kg1, kg2, g1, g2, key


def _edge_keyset(kg):
    return {
        frozenset((r["src_key"], r["dst_key"]))
        for r in kg.edges_with_keys().collect()
        if r["src_key"] != r["dst_key"]
    }


def _nx_edge_keyset(nxg, key):
    return {frozenset((key[u], key[v])) for u, v in nxg.edges if u != v}


def test_keyed_setops_align_on_keys(two_kgs):
    kg1, kg2, g1, g2, key = two_kgs
    # union / intersection / difference / symmetric_difference on KEYS
    assert _edge_keyset(kg1.union(kg2)) == _nx_edge_keyset(g1, key) | _nx_edge_keyset(
        g2, key
    )
    inter = kg1.intersection(kg2)
    assert _edge_keyset(inter) == _nx_edge_keyset(g1, key) & _nx_edge_keyset(g2, key)
    assert _edge_keyset(kg1.difference(kg2)) == _nx_edge_keyset(
        g1, key
    ) - _nx_edge_keyset(g2, key)
    assert _edge_keyset(kg1.symmetric_difference(kg2)) == _nx_edge_keyset(
        g1, key
    ) ^ _nx_edge_keyset(g2, key)
    # compose == union for unweighted operands (right-biased weights moot)
    assert _edge_keyset(kg1.compose(kg2)) == _edge_keyset(kg1.union(kg2))
    # result dim covers exactly the surviving node keys
    union_keys = {r["key"] for r in kg1.union(kg2)._dim.select("key").collect()}
    assert union_keys == {key[u] for u in set(g1.nodes) | set(g2.nodes)}


def test_keyed_boundary_and_cuts(kg_and_nx):
    kg, nxg, key = kg_and_nx
    s_nodes = [0, 1, 2, 3, 4, 5]
    s_keys = [key[u] for u in s_nodes]
    got_eb = {
        (r["src_key"], r["dst_key"]) for r in kg.edge_boundary(s_keys).collect()
    }
    want_eb = {(key[u], key[v]) for u, v in nx.edge_boundary(nxg, s_nodes)}
    assert got_eb == want_eb
    got_nb = {r["key"] for r in kg.node_boundary(s_keys).collect()}
    assert got_nb == {key[u] for u in nx.node_boundary(nxg, s_nodes)}
    t_nodes = sorted(set(nxg.nodes) - set(s_nodes))
    # nx.cut_size(digraph, S, T=None) raises in this nx version; pass T
    assert kg.cut_size(s_keys) == nx.cut_size(nxg, s_nodes, t_nodes)
    assert kg.cut_size(s_keys, [key[u] for u in t_nodes]) == nx.cut_size(
        nxg, s_nodes, t_nodes
    )
    assert kg.volume(s_keys) == nx.volume(nxg, s_nodes)
    assert kg.conductance(s_keys) == pytest.approx(nx.conductance(nxg, s_nodes))
    assert kg.normalized_cut_size(s_keys) == pytest.approx(
        nx.normalized_cut_size(nxg, s_nodes)
    )


def test_keyed_linalg_and_reverse(kg_and_nx):
    import numpy as np

    kg, nxg, key = kg_and_nx
    und = kg.to_undirected()
    got = {
        (r["row_key"], r["col_key"]): r["value"]
        for r in und.laplacian_matrix().collect()
    }
    # hand-rolled L = D - A (nx.laplacian_matrix needs scipy, absent here)
    ug = nxg.to_undirected()
    want = {}
    for u in ug.nodes:
        d = float(ug.degree(u))
        if d:
            want[(key[u], key[u])] = d
    for u, v in ug.edges:
        if u == v:
            want[(key[u], key[u])] = want.get((key[u], key[u]), 0.0) - 1.0
            continue
        want[(key[u], key[v])] = -1.0
        want[(key[v], key[u])] = -1.0
    want = {k: v for k, v in want.items() if v != 0}
    assert got == want
    # reverse flips every directed edge
    fwd = {(r["src_key"], r["dst_key"]) for r in kg.edges_with_keys().collect()}
    rev = {(r["src_key"], r["dst_key"]) for r in kg.reverse().edges_with_keys().collect()}
    assert rev == {(b, a) for a, b in fwd}
    assert np is not None


def test_keyed_multi_source_bfs(kg_and_nx):
    kg, nxg, key = kg_and_nx
    srcs = [0, 7]
    got = {
        (r["source_key"], r["key"]): r["level"]
        for r in kg.bfs_levels_multi([key[s] for s in srcs]).collect()
    }
    want = {}
    for s in srcs:
        for u, lv in nx.single_source_shortest_path_length(nxg, s).items():
            want[(key[s], key[u])] = lv
    assert got == want
    got_d = {r["key"] for r in kg.descendants(key[0]).collect()}
    assert got_d == {key[u] for u in nx.descendants(nxg, 0)}
    got_a = {r["key"] for r in kg.ancestors(key[0]).collect()}
    assert got_a == {key[u] for u in nx.ancestors(nxg, 0)}


def test_keyed_kcore_and_anf(spark):
    nxg = nx.gnp_random_graph(40, 0.15, seed=17)
    key = {i: f"m{i:02d}" for i in nxg.nodes}
    rows = [(key[u], key[v]) for u, v in nxg.edges]
    raw = spark.createDataFrame(rows, "a string, b string")
    kg = KeyedGraph(raw, "a", "b", directed=False)

    want = {tuple(sorted((key[u], key[v]))) for u, v in nx.k_core(nxg, 3).edges()}
    got = {
        tuple(sorted((r["src_key"], r["dst_key"]))) for r in kg.k_core(3).collect()
    }
    assert got == want

    got_core = kg.to_dict(kg.core_number(), "core")
    want_core = nx.core_number(nxg)
    assert got_core == {key[u]: int(c) for u, c in want_core.items()}

    nf = kg.neighborhood_function(k=32)
    assert nf[0]["reachable_pairs"] == float(kg.G.n)
    assert kg.effective_diameter(k=32) > 0.0


def test_keyed_closeness_and_harmonic(kg_and_nx):
    kg, nxg, key = kg_and_nx
    got_c = kg.to_dict(kg.closeness_centrality(), "closeness")
    want_c = nx.closeness_centrality(nxg)
    for u, v in want_c.items():
        assert got_c[key[u]] == pytest.approx(v, abs=1e-9)
    pivots = [key[i] for i in (0, 3, 9)]
    got_h = kg.to_dict(kg.harmonic_centrality(source_keys=pivots), "harmonic")
    want_h = nx.harmonic_centrality(nxg, sources=[0, 3, 9])
    for u, v in want_h.items():
        assert got_h[key[u]] == pytest.approx(v, abs=1e-9)


def test_keyed_betweenness(kg_and_nx):
    kg, nxg, key = kg_and_nx
    got = kg.to_dict(kg.betweenness_centrality(), "betweenness")
    want = nx.betweenness_centrality(nxg)
    for u, v in want.items():
        assert got[key[u]] == pytest.approx(v, abs=1e-9)


def test_keyed_link_prediction(spark):
    nxg = nx.gnp_random_graph(25, 0.15, seed=12)
    key = {i: f"pkg/{i:02d}" for i in nxg.nodes}
    rows = [(key[u], key[v]) for u, v in nxg.edges]
    raw = spark.createDataFrame(rows, "a string, b string")
    kg = KeyedGraph(raw, "a", "b", directed=False)
    got = {
        tuple(sorted((r["u_key"], r["w_key"]))): r["jaccard"]
        for r in kg.link_prediction().collect()
    }
    pairs = [
        (u, w)
        for u in nxg
        for w in nxg
        if u < w and not nxg.has_edge(u, w)
    ]
    want = {
        tuple(sorted((key[u], key[w]))): p
        for u, w, p in nx.jaccard_coefficient(nxg, pairs)
        if p > 0
    }
    assert got == {k: pytest.approx(v, abs=1e-12) for k, v in want.items()}
    # explicit key pairs
    some = [(key[0], key[1]), (key[2], key[3])]
    scored = kg.link_prediction(pairs=some).collect()
    assert len(scored) == 2


def test_keyed_random_walks(spark):
    nxg = nx.cycle_graph(8)
    key = {i: f"n{i}" for i in nxg.nodes}
    raw = spark.createDataFrame(
        [(key[u], key[v]) for u, v in nxg.edges], "a string, b string"
    )
    kg = KeyedGraph(raw, "a", "b", directed=False)
    rows = kg.random_walks(walk_length=3, start_keys=["n0", "n4"], num_walks=2).collect()
    assert {r["start_key"] for r in rows} == {"n0", "n4"}
    assert len(rows) == 2 * 2 * 4  # starts x walks x (steps 0..3)
    by_chain = {}
    for r in rows:
        by_chain.setdefault((r["start_key"], r["walk"]), {})[r["step"]] = r["key"]
    for (s, _), seq in by_chain.items():
        assert seq[0] == s


def test_keyed_mis_and_coloring(spark):
    nxg = nx.gnp_random_graph(30, 0.15, seed=9)
    key = {i: f"m{i}" for i in nxg.nodes}
    raw = spark.createDataFrame(
        [(key[u], key[v]) for u, v in nxg.edges], "a string, b string"
    )
    kg = KeyedGraph(raw, "a", "b", directed=False)
    mis = {r["key"] for r in kg.maximal_independent_set().collect()}
    inv = {v: k for k, v in key.items()}
    ids = {inv[k] for k in mis}
    for u, v in nxg.edges:
        assert not (u in ids and v in ids)
    col = {inv[r["key"]]: r["color"] for r in kg.greedy_color().collect()}
    for u, v in nxg.edges:
        assert col[u] != col[v]


def test_keyed_matching(spark):
    nxg = nx.gnp_random_graph(30, 0.15, seed=9)
    key = {i: f"m{i}" for i in nxg.nodes}
    raw = spark.createDataFrame(
        [(key[u], key[v]) for u, v in nxg.edges], "a string, b string"
    )
    kg = KeyedGraph(raw, "a", "b", directed=False)
    inv = {v: k for k, v in key.items()}
    got = {
        (inv[r["src_key"]], inv[r["dst_key"]])
        for r in kg.maximal_matching().collect()
    }
    seen = set()
    for u, v in got:
        assert nxg.has_edge(u, v)
        assert u not in seen and v not in seen
        seen |= {u, v}
    for u, v in nxg.edges:
        if u != v:
            assert u in seen or v in seen


def test_keyed_triad_census_and_double_sweep(kg_and_nx, spark):
    kg, nxg, key = kg_and_nx
    got = {r["triad_type"]: r["n"] for r in kg.triadic_census().collect()}
    assert got == nx.triadic_census(nxg)
    # double sweep on an undirected keyed path: tight diameter, keyed ends
    raw = spark.createDataFrame(
        [(f"p{i}", f"p{i+1}") for i in range(8)], "a string, b string"
    )
    pkg = KeyedGraph(raw, "a", "b", directed=False)
    row = pkg.double_sweep().collect()[0]
    assert row["diameter_lb"] == 8
    assert {row["far_key"], row["periphery_key"]} == {"p0", "p8"}
    assert row["seed_key_out"].startswith("p")


def test_keyed_sampling_wrappers(spark):
    """negative_edge_sample / khop_neighbor_sample / linkpred_training_set
    through the key-typed shell: keys round-trip, payload columns survive,
    and negatives never collide with real (undirected) edges."""
    nxg = nx.gnp_random_graph(25, 0.2, seed=13)
    key = {i: f"repo/{i:02d}" for i in nxg.nodes}
    rows = [(key[u], key[v]) for u, v in nxg.edges]
    raw = spark.createDataFrame(rows, "from_repo string, to_repo string")
    kg = KeyedGraph(raw, "from_repo", "to_repo", directed=False)
    rev = {v: k for k, v in key.items()}

    neg = kg.negative_edge_sample(k=2).collect()
    assert neg and set(neg[0].asDict()) == {"src_key", "dst_key", "j"}
    for r in neg:
        assert not nxg.has_edge(rev[r["src_key"]], rev[r["dst_key"]])

    blocks = kg.khop_neighbor_sample(fanouts=(3, 2)).collect()
    assert {r["hop"] for r in blocks} == {1, 2}
    for r in blocks:
        assert nxg.has_edge(rev[r["src_key"]], rev[r["dst_key"]])

    seeded = kg.khop_neighbor_sample(
        fanouts=(2,), seed_keys=[key[0], key[1]]
    ).collect()
    assert {rev[r["src_key"]] for r in seeded} <= {0, 1}

    ts = kg.linkpred_training_set(k=2).collect()
    assert {(r["label"], r["split"]) for r in ts} <= {
        (0, "train"), (0, "test"), (1, "train"), (1, "test")
    }
    pos = {(rev[r["src_key"]], rev[r["dst_key"]]) for r in ts if r["label"] == 1}
    assert pos == {(min(u, v), max(u, v)) for u, v in nxg.edges}


def test_keyed_structural_holes_and_coarsen(spark):
    """effective_size / local_bridges / coarsen through the key-typed
    shell: keys round-trip and values match the id-typed kernels."""
    nxg = nx.gnp_random_graph(25, 0.15, seed=3)
    key = {i: f"repo/{i:02d}" for i in nxg.nodes}
    rows = [(key[u], key[v]) for u, v in nxg.edges]
    raw = spark.createDataFrame(rows, "from_repo string, to_repo string")
    kg = KeyedGraph(raw, "from_repo", "to_repo", directed=False)
    rev = {v: k for k, v in key.items()}

    es = {rev[r["key"]]: r["effective_size"] for r in kg.effective_size().collect()}
    want = nx.effective_size(nxg)
    assert all(es[n] == pytest.approx(want[n]) for n in es)
    assert set(es) == {n for n, d in nxg.degree() if d > 0}

    lb = {(rev[r["src_key"]], rev[r["dst_key"]]) for r in kg.local_bridges().collect()}
    assert lb == {tuple(sorted(e)) for e in nx.local_bridges(nxg, with_span=False)}

    q4 = {rev[r["key"]]: r["cliques4"] for r in kg.four_cliques().collect()}
    from itertools import combinations
    adj = {n: set(nxg[n]) for n in nxg.nodes}
    want4 = {n: 0 for n in nxg.nodes}
    for quad in combinations(sorted(nxg.nodes), 4):
        if all(v in adj[u] for u, v in combinations(quad, 2)):
            for n in quad:
                want4[n] += 1
    assert q4 == want4

    co = kg.coarsen().collect()
    assert co and set(co[0].asDict()) == {"src_key", "dst_key", "weight"}
    ids = {rev[r["src_key"]] for r in co} | {rev[r["dst_key"]] for r in co}
    assert ids <= set(nxg.nodes)
