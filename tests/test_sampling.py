"""Differential tests for deterministic negative edge sampling and the
link-prediction training-set assembler (operators/sampling.py) vs a
single-threaded python replay of the same md5 draws."""

from __future__ import annotations

import hashlib

import networkx as nx
from pyspark.sql import functions as F

from graphblas_algorithms_spark import from_networkx
from graphblas_algorithms_spark.operators.sampling import (
    linkpred_training_set,
    negative_edge_sample,
)


def _u(s: str) -> float:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16) / 16**15


def _python_neg(nxg, k: int, factor: int, salt: str = "neg"):
    """Replay: dense index by sorted node order, md5 draws, min-j dedup,
    (j, dst) ranking — the exact contract sampling.py documents."""
    ids = sorted(nxg.nodes())
    n = len(ids)
    out = {}
    for v in ids:
        best = {}
        for j in range(k * factor):
            u = _u(f"{salt}:{v}:{j}")
            w = ids[min(int(u * n), n - 1)]
            if w == v or nxg.has_edge(v, w):
                continue
            if w not in best or j < best[w]:
                best[w] = j
        ranked = sorted((j, w) for w, j in best.items())
        out[v] = {(w, j) for j, w in ranked[:k]}
    return out


def test_negative_sample_matches_python_replay(spark):
    nxg = nx.gnp_random_graph(60, 0.12, seed=11)
    G = from_networkx(spark, nxg)
    k, factor = 3, 4

    got = {}
    for r in negative_edge_sample(G, k=k, factor=factor).collect():
        got.setdefault(r["src"], set()).add((r["dst"], r["j"]))
    want = {v: s for v, s in _python_neg(nxg, k, factor).items() if s}
    assert got == want

    # invariants: never a real edge / self-pair, at most k per node
    for v, pairs in got.items():
        assert len(pairs) <= k
        for w, _ in pairs:
            assert w != v and not nxg.has_edge(v, w)

    # input partitioning is invisible to the draw
    G2 = from_networkx(spark, nxg)
    G2.edges = G2.edges.repartition(7)
    again = {}
    for r in negative_edge_sample(G2, k=k, factor=factor).collect():
        again.setdefault(r["src"], set()).add((r["dst"], r["j"]))
    assert again == got


def test_linkpred_training_set_shape_and_split(spark):
    nxg = nx.gnp_random_graph(50, 0.1, seed=5)
    G = from_networkx(spark, nxg)
    rows = linkpred_training_set(G, k=2, factor=4, holdout_rate=0.25).collect()

    pos = {(r["src"], r["dst"]) for r in rows if r["label"] == 1}
    neg = {(r["src"], r["dst"]) for r in rows if r["label"] == 0}
    want_pos = {(min(u, w), max(u, w)) for u, w in nxg.edges()}
    assert pos == want_pos
    for s, d in neg:
        assert not nxg.has_edge(s, d)
    assert all((min(s, d), max(s, d)) not in want_pos for s, d in neg)

    # split is a pure function of the pair: replay it
    for r in rows:
        u = _u(f"lp:split:{r['src']}:{r['dst']}")
        assert r["split"] == ("test" if u < 0.25 else "train")
    splits = {r["split"] for r in rows}
    assert splits == {"train", "test"}
