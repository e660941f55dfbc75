"""PageRank differential tests vs a numpy power-iteration oracle that
mirrors the reference's comparison baseline
(``/root/reference/scripts/scipy_impl.py:7-54``) — same math, same
``err < n*tol`` stop rule (``_helpers.py:21-29``).

Fixtures follow FIXTURES.md F2: the 4-node weighted digraph from the
reference README (README.md:41-48), the dangling-node digraph, the
two-component graph, and ER G(200, 0.05, seed=42).

Most tests pin ``fixed_iters`` so the Spark and oracle trajectories are
iteration-identical (tight tolerance, few supersteps); two tests run the
real convergence loop end-to-end.
"""

from __future__ import annotations

import networkx as nx
import pytest

from graphblas_algorithms_spark import from_networkx
from graphblas_algorithms_spark.classes._utils import vector_to_dict
from graphblas_algorithms_spark.operators.pagerank import pagerank

from .oracles import pagerank_oracle


def _check(spark, nxg, atol=1e-9, **kw):
    G = from_networkx(spark, nxg)
    got = vector_to_dict(pagerank(G, **kw), val_col="rank")
    want = pagerank_oracle(nxg, **kw)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=atol), f"node {k}"


def test_readme_weighted_digraph_converged(spark):
    # reference README.md:41-48 COO example — full convergence loop
    rows = [0, 0, 1, 2, 2, 3]
    cols = [1, 3, 0, 0, 1, 2]
    vals = [1, 2, 3, 4, 5, 6]
    nxg = nx.DiGraph()
    for r, c, v in zip(rows, cols, vals):
        nxg.add_edge(r, c, weight=float(v))
    _check(spark, nxg, atol=1e-5)


def test_er200_converged(spark):
    nxg = nx.gnp_random_graph(200, 0.05, seed=42)
    _check(spark, nxg, atol=1e-5)


def test_dangling_digraph(spark):
    # FIXTURES.md F2.5: 0->1->2, 2 dangling, 3 isolated
    nxg = nx.DiGraph()
    nxg.add_edges_from([(0, 1), (1, 2)])
    nxg.add_node(3)
    _check(spark, nxg, fixed_iters=12)


def test_two_component_undirected(spark):
    nxg = nx.Graph([(0, 1), (1, 2), (3, 4), (4, 5), (3, 5)])
    _check(spark, nxg, fixed_iters=12)


def test_personalization_and_nstart(spark):
    nxg = nx.gnp_random_graph(60, 0.08, seed=7, directed=True)
    pers = {i: (i % 3) + 1.0 for i in nxg.nodes}
    nstart = {i: 1.0 + (i % 5) for i in nxg.nodes}
    _check(
        spark, nxg, alpha=0.9, personalization=pers, nstart=nstart, fixed_iters=10
    )


def test_partial_personalization_keeps_all_nodes(spark):
    # missing keys -> teleport 0 but the node STAYS in the iteration
    # (ADVICE r1: an inner join on p silently dropped uncovered nodes)
    nxg = nx.gnp_random_graph(40, 0.1, seed=11, directed=True)
    pers = {i: 1.0 for i in nxg.nodes if i % 4 == 0}  # 1/4 coverage
    _check(spark, nxg, alpha=0.9, personalization=pers, fixed_iters=10)


def test_partial_dangling_dict(spark):
    nxg = nx.DiGraph([(0, 1), (1, 2), (2, 3), (4, 2)])  # 3 dangling
    dang = {0: 2.0, 2: 1.0}  # partial dangling-weight dict
    _check(spark, nxg, dangling=dang, fixed_iters=12)


def test_dangling_weights(spark):
    nxg = nx.DiGraph([(0, 1), (1, 2), (2, 3)])  # 3 dangling
    dang = {i: float(i + 1) for i in nxg.nodes}
    _check(spark, nxg, dangling=dang, fixed_iters=12)


def test_dataframe_vector_forms_match_dicts(spark):
    """personalization/dangling as DataFrames (the scale-correct O(n)
    form — a 10^12-node teleport vector can't live in a driver dict)
    must agree exactly with the dict forms."""
    nxg = nx.gnp_random_graph(50, 0.08, seed=19, directed=True)
    pers = {i: (i % 3) + 1.0 for i in nxg.nodes}
    dang = {i: float(i % 4) + 0.5 for i in nxg.nodes}
    G = from_networkx(spark, nxg)

    def as_df(d):
        return spark.createDataFrame(
            [(int(k), float(v)) for k, v in d.items()], "id long, value double"
        )

    pers_df = as_df(pers)
    dang_df = as_df(dang)
    for kw_dict, kw_df in (
        ({"personalization": pers}, {"personalization": pers_df}),
        ({"dangling": dang}, {"dangling": dang_df}),
    ):
        a = vector_to_dict(pagerank(G, fixed_iters=8, **kw_dict), val_col="rank")
        b = vector_to_dict(pagerank(G, fixed_iters=8, **kw_df), val_col="rank")
        assert a.keys() == b.keys()
        for k in a:
            assert a[k] == pytest.approx(b[k], abs=1e-12), f"node {k}"


def test_csr_udf_path_matches(spark):
    # CSR-block pandas-UDF gather-scatter path == pure-SQL path
    nxg = nx.gnp_random_graph(80, 0.1, seed=3)
    G = from_networkx(spark, nxg)
    got = vector_to_dict(pagerank(G, use_csr_udf=True, fixed_iters=10), val_col="rank")
    want = pagerank_oracle(nxg, fixed_iters=10)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-9)


def test_salted_path_matches(spark):
    # star graph = one hub: the skew-salting target shape
    nxg = nx.star_graph(50)
    G = from_networkx(spark, nxg)
    got = vector_to_dict(pagerank(G, skew_salt=4, fixed_iters=10), val_col="rank")
    want = pagerank_oracle(nxg, fixed_iters=10)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-9)


def test_self_loops(spark):
    nxg = nx.Graph([(0, 0), (0, 1), (1, 2), (2, 2)])
    _check(spark, nxg, fixed_iters=12)


def test_tol_abs_overrides_n_scaled(spark):
    """tol_abs gates on absolute L1 step diff: the n-scaled criterion
    (err < n*tol) degenerates as n grows — tol_abs must not."""
    nxg = nx.gnp_random_graph(400, 0.02, seed=7, directed=True)
    G = from_networkx(spark, nxg)
    counts = {}
    for name, kw in {
        "loose_nscaled": {"tol": 1e-3},          # n*tol = 0.4: stops ~instantly
        "tight_abs": {"tol": 1e-3, "tol_abs": 1e-8},  # absolute gate wins
    }.items():
        seen = []
        pagerank(G, iteration_hook=lambda it, err: seen.append(it), **kw)
        counts[name] = len(seen)
    assert counts["loose_nscaled"] <= 3
    assert counts["tight_abs"] > counts["loose_nscaled"] + 5, counts
    # and the tight-abs result still matches the oracle
    got = vector_to_dict(pagerank(G, tol_abs=1e-10), val_col="rank")
    want = pagerank_oracle(nxg, tol=1e-12)
    assert max(abs(got[k] - want[k]) for k in want) < 1e-8


def test_check_every_batches_convergence_actions(spark):
    """check_every=3 runs the same criterion every 3rd superstep: scores
    match the k=1 run within the fixpoint bound, only every 3rd hook call
    carries an err value, and convergence still stops the loop."""
    nxg = nx.gnp_random_graph(300, 0.03, seed=11, directed=True)
    G = from_networkx(spark, nxg)

    base = vector_to_dict(pagerank(G, tol=1e-9), val_col="rank")

    seen = []
    got = vector_to_dict(
        pagerank(G, tol=1e-9, check_every=3,
                 iteration_hook=lambda it, err: seen.append((it, err))),
        val_col="rank",
    )
    # k=3 result is at least as converged: both within alpha/(1-alpha)*n*tol
    # of the fixpoint, so their mutual L1 distance is bounded by twice that
    bound = 2 * 0.85 / 0.15 * 300 * 1e-9
    assert sum(abs(got[k] - base[k]) for k in base) < bound
    # only checked supersteps (every 3rd) carry an err measurement
    checked = [it for it, err in seen if err is not None]
    unchecked = [it for it, err in seen if err is None]
    assert checked and all((it + 1) % 3 == 0 or it == seen[-1][0] for it in checked)
    assert unchecked, "k-1 of every k supersteps must skip the action"
    # loop actually stopped on the criterion (not max_iter exhaustion)
    assert len(seen) < 100
