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


def _python_khop(nxg, fanouts, salt="khop"):
    frontier = set(nxg.nodes())
    out = set()
    for hop, fan in enumerate(fanouts, 1):
        nxt = set()
        for v in sorted(frontier):
            ranked = sorted(nxg[v], key=lambda w: (_u(f"{salt}:{hop}:{v}:{w}"), w))
            for w in ranked[:fan]:
                out.add((hop, v, w))
                nxt.add(w)
        frontier = nxt
    return out


def test_khop_neighbor_sample_matches_python_replay(spark):
    from graphblas_algorithms_spark.operators.sampling import khop_neighbor_sample

    nxg = nx.gnp_random_graph(40, 0.15, seed=3)
    G = from_networkx(spark, nxg)
    got = {
        (r["hop"], r["src"], r["dst"])
        for r in khop_neighbor_sample(G, fanouts=(3, 2)).collect()
    }
    assert got == _python_khop(nxg, (3, 2))

    # every sampled pair is a real edge; per-(hop, src) cap holds
    from collections import Counter

    per = Counter((h, s) for h, s, _ in got)
    for (h, s), c in per.items():
        assert c <= (3 if h == 1 else 2)
    for _, s, d in got:
        assert nxg.has_edge(s, d)

    # explicit seed set restricts hop 1 to the seeds' neighborhoods
    seeds = spark.createDataFrame([(0,), (1,)], "id long")
    sub = {
        (r["hop"], r["src"], r["dst"])
        for r in khop_neighbor_sample(G, seeds=seeds, fanouts=(3, 2)).collect()
    }
    assert {s for h, s, _ in sub if h == 1} <= {0, 1}
    assert sub <= _python_khop_seeded(nxg, {0, 1}, (3, 2))


def _python_khop_seeded(nxg, seeds, fanouts, salt="khop"):
    frontier = set(seeds)
    out = set()
    for hop, fan in enumerate(fanouts, 1):
        nxt = set()
        for v in sorted(frontier):
            ranked = sorted(nxg[v], key=lambda w: (_u(f"{salt}:{hop}:{v}:{w}"), w))
            for w in ranked[:fan]:
                out.add((hop, v, w))
                nxt.add(w)
        frontier = nxt
    return out


def test_chunk_documents_integer_replay(spark):
    from graphblas_algorithms_spark.pipeline.curation import chunk_documents

    rows = [
        (1, " ".join(["w"] * 5)),      # shorter than one window
        (2, " ".join(["w"] * 128)),    # exactly one window
        (3, " ".join(["w"] * 129)),    # one token over -> 2 chunks
        (4, " ".join(["w"] * 400)),    # several strides
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["doc_id"], r["chunk_id"]): (r["begin_tok"], r["n_toks"])
        for r in chunk_documents(docs, chunk_tokens=128, stride=96).collect()
    }
    want = {}
    for did, text in rows:
        n = len(text.split())
        n_chunks = 1 + (max(n - 128, 0) + 95) // 96
        for i in range(n_chunks):
            want[(did, i)] = (i * 96, min(128, n - i * 96))
    assert got == want
    # every chunk is non-empty and windows tile the doc with overlap
    assert all(t > 0 for _, t in got.values())

    import pytest as _pytest

    with _pytest.raises(ValueError):
        chunk_documents(docs, chunk_tokens=64, stride=65)
