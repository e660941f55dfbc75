"""Luby MIS: property checks (independence + maximality), Python replay
of the deterministic rule, and seed sensitivity."""

from __future__ import annotations

import hashlib

import networkx as nx

from graphblas_algorithms_spark import from_networkx
from graphblas_algorithms_spark.operators.mis import maximal_independent_set


def _py_mis(nxg, seed=42):
    pri = {v: hashlib.md5(f"{seed}|{v}".encode()).hexdigest() for v in nxg}
    undecided = set(nxg)
    mis = set()
    while undecided:
        cand = {
            v
            for v in undecided
            if all(pri[v] < pri[u] for u in nxg[v] if u in undecided and u != v)
        }
        mis |= cand
        undecided -= cand
        for v in cand:
            undecided -= set(nxg[v])
    return mis


def _check_mis(nxg, mis):
    for u, v in nxg.edges:
        if u != v:
            assert not (u in mis and v in mis), (u, v)
    for v in nxg:
        assert v in mis or any(u in mis for u in nxg[v] if u != v), v


def test_mis_matches_python_replay(spark):
    nxg = nx.gnp_random_graph(80, 0.08, seed=13)
    nxg.add_node(500)  # isolate always enters
    G = from_networkx(spark, nxg)
    got = {r["id"] for r in maximal_independent_set(G).collect()}
    assert got == _py_mis(nxg)
    _check_mis(nxg, got)
    assert 500 in got


def test_mis_properties_denser_graph(spark):
    nxg = nx.gnp_random_graph(60, 0.25, seed=21)
    G = from_networkx(spark, nxg)
    got = {r["id"] for r in maximal_independent_set(G).collect()}
    _check_mis(nxg, got)
    assert got == _py_mis(nxg)


def test_mis_seed_changes_set_but_not_validity(spark):
    nxg = nx.gnp_random_graph(50, 0.15, seed=5)
    G = from_networkx(spark, nxg)
    a = {r["id"] for r in maximal_independent_set(G, seed=1).collect()}
    b = {r["id"] for r in maximal_independent_set(G, seed=2).collect()}
    _check_mis(nxg, a)
    _check_mis(nxg, b)
    assert a == _py_mis(nxg, seed=1) and b == _py_mis(nxg, seed=2)


def test_mis_complete_graph_single_winner(spark):
    nxg = nx.complete_graph(12)
    G = from_networkx(spark, nxg)
    got = {r["id"] for r in maximal_independent_set(G).collect()}
    assert len(got) == 1 and got == _py_mis(nxg)


def test_mis_converging_on_final_round_is_success(spark):
    # regression: fixpoint landing exactly on max_rounds must not raise
    nxg = nx.path_graph(2)
    G = from_networkx(spark, nxg)
    got = {r["id"] for r in maximal_independent_set(G, max_rounds=1).collect()}
    assert got == _py_mis(nxg)


def _py_color(nxg, seed=42):
    # speculative pick + conflict resolution (mirrors greedy_color)
    pri = {v: hashlib.md5(f"{seed}|{v}".encode()).hexdigest() for v in nxg}
    undecided = set(nxg)
    color = {}
    while undecided:
        pick = {}
        for v in undecided:
            used = {color[u] for u in nxg[v] if u in color and u != v}
            c = 0
            while c in used:
                c += 1
            pick[v] = c
        losers = set()
        for v in undecided:
            for u in nxg[v]:
                if u != v and u in undecided and pick[u] == pick[v] and pri[u] < pri[v]:
                    losers.add(v)
                    break
        for v in undecided - losers:
            color[v] = pick[v]
        undecided = losers
    return color


def test_greedy_color_matches_python_replay(spark):
    from graphblas_algorithms_spark.operators.mis import greedy_color

    nxg = nx.gnp_random_graph(70, 0.1, seed=17)
    nxg.add_node(777)
    G = from_networkx(spark, nxg)
    got = {r["id"]: r["color"] for r in greedy_color(G).collect()}
    assert got == _py_color(nxg)
    # proper coloring + Delta+1 bound
    for u, v in nxg.edges:
        if u != v:
            assert got[u] != got[v]
    maxdeg = max(d for _, d in nxg.degree)
    assert max(got.values()) <= maxdeg


def test_greedy_color_complete_graph_uses_n_colors(spark):
    from graphblas_algorithms_spark.operators.mis import greedy_color

    nxg = nx.complete_graph(7)
    G = from_networkx(spark, nxg)
    got = {r["id"]: r["color"] for r in greedy_color(G).collect()}
    assert sorted(got.values()) == list(range(7))
    assert got == _py_color(nxg)
