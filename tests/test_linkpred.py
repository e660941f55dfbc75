"""Link-prediction differential tests vs networkx."""

from __future__ import annotations

import math

import networkx as nx
import pytest

from graphblas_algorithms_spark import from_networkx
from graphblas_algorithms_spark.operators.linkpred import (
    adamic_adar_index,
    jaccard_coefficient,
    link_prediction_scores,
    preferential_attachment,
    resource_allocation_index,
)


def _nx_pairs(nxg):
    """All non-edge pairs with >= 1 common neighbor, canonical u < w."""
    out = set()
    for v in nxg:
        nbrs = sorted(nxg[v])
        for i, u in enumerate(nbrs):
            for w in nbrs[i + 1 :]:
                if not nxg.has_edge(u, w):
                    out.add((u, w))
    return out


def test_scores_match_networkx(spark):
    nxg = nx.gnp_random_graph(70, 0.09, seed=7)
    G = from_networkx(spark, nxg)
    got = {
        (r["u"], r["w"]): r
        for r in link_prediction_scores(G).collect()
    }
    pairs = _nx_pairs(nxg)
    assert set(got) == pairs
    jac = dict(
        ((u, w), p) for u, w, p in nx.jaccard_coefficient(nxg, sorted(pairs))
    )
    aa = dict(
        ((u, w), p) for u, w, p in nx.adamic_adar_index(nxg, sorted(pairs))
    )
    ra = dict(
        ((u, w), p)
        for u, w, p in nx.resource_allocation_index(nxg, sorted(pairs))
    )
    pa = dict(
        ((u, w), p)
        for u, w, p in nx.preferential_attachment(nxg, sorted(pairs))
    )
    for key, row in got.items():
        assert math.isclose(row["jaccard"], jac[key], rel_tol=1e-9), key
        assert math.isclose(row["adamic_adar"], aa[key], rel_tol=1e-9), key
        assert math.isclose(row["resource_allocation"], ra[key], rel_tol=1e-9), key
        assert row["pref_attachment"] == pa[key], key
        assert row["cn"] == len(list(nx.common_neighbors(nxg, *key))), key


def test_explicit_pairs_ebunch(spark):
    nxg = nx.gnp_random_graph(50, 0.1, seed=3)
    G = from_networkx(spark, nxg)
    ebunch = [(0, 1), (2, 40), (5, 9), (10, 11)]
    pairs = spark.createDataFrame(ebunch, "u long, w long")
    got = {(r["u"], r["w"]): r for r in jaccard_coefficient(G, pairs).collect()}
    want = dict(((u, w), p) for u, w, p in nx.jaccard_coefficient(nxg, ebunch))
    assert set(got) == set(want)
    for key in want:
        assert math.isclose(got[key]["jaccard"], want[key], rel_tol=1e-9), key
    gpa = {
        (r["u"], r["w"]): r["pref_attachment"]
        for r in preferential_attachment(G, pairs).collect()
    }
    wpa = dict(((u, w), p) for u, w, p in nx.preferential_attachment(nxg, ebunch))
    assert gpa == wpa
    # zero-common-neighbor pairs score 0.0, matching nx
    for u, w in ebunch:
        if not list(nx.common_neighbors(nxg, u, w)):
            assert got[(u, w)]["jaccard"] == 0.0


def test_min_common_and_hub_cap(spark):
    # star hub (degree 12) + a detached path 20-21-22: capping centers at
    # degree 5 must remove every hub-mediated pair but keep (20, 22),
    # whose only shared neighbor 21 has degree 2
    nxg = nx.star_graph(12)
    nxg.add_edge(1, 2)  # one real edge among leaves
    nxg.add_edges_from([(20, 21), (21, 22)])
    G = from_networkx(spark, nxg)
    allp = {(r["u"], r["w"]) for r in link_prediction_scores(G).collect()}
    assert allp == _nx_pairs(nxg)
    capped = {
        (r["u"], r["w"])
        for r in link_prediction_scores(G, max_center_degree=5).collect()
    }
    assert capped == {(20, 22)}
    uncapped = {
        (r["u"], r["w"])
        for r in link_prediction_scores(G, max_center_degree=100).collect()
    }
    assert uncapped == allp
    # min_common prunes: only pair (1,2) has 2 shared nbrs but is an edge,
    # so every surviving candidate here has exactly 1 common neighbor
    mc = link_prediction_scores(G, min_common=2).collect()
    assert mc == []
    assert {r["cn"] for r in link_prediction_scores(G, min_common=1).collect()} == {1}


def test_adamic_adar_and_ra_wrappers(spark):
    nxg = nx.karate_club_graph()
    G = from_networkx(spark, nxg)
    got_aa = {(r["u"], r["w"]): r["adamic_adar"] for r in adamic_adar_index(G).collect()}
    got_ra = {
        (r["u"], r["w"]): r["resource_allocation"]
        for r in resource_allocation_index(G).collect()
    }
    pairs = sorted(_nx_pairs(nxg))
    for u, w, p in nx.adamic_adar_index(nxg, pairs):
        assert math.isclose(got_aa[(u, w)], p, rel_tol=1e-9), (u, w)
    for u, w, p in nx.resource_allocation_index(nxg, pairs):
        assert math.isclose(got_ra[(u, w)], p, rel_tol=1e-9), (u, w)
