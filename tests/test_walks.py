"""Random-walk corpus generation: differential vs a pure-Python replay of
the same md5-argmin rule (determinism IS the spec)."""

from __future__ import annotations

import hashlib

import networkx as nx

from graphblas_algorithms_spark import from_networkx
from graphblas_algorithms_spark.operators.walks import random_walks, walk_sentences


def _py_walks(nxg, walk_length, num_walks, starts, seed=42, directed=False):
    rows = set()
    for s in starts:
        for w in range(num_walks):
            cur = s
            rows.add((s, w, 0, s))
            for step in range(1, walk_length + 1):
                # self-loops excluded in both orientations (kernel contract)
                nbrs = (
                    [v for v in nxg.successors(cur) if v != cur]
                    if directed
                    else [v for v in nxg[cur] if v != cur]
                )
                if not nbrs:
                    break
                cur = min(
                    nbrs,
                    key=lambda d: hashlib.md5(
                        f"{seed}|{w}|{step}|{cur}|{d}".encode()
                    ).hexdigest(),
                )
                rows.add((s, w, step, cur))
    return rows


def test_walks_match_python_replay_undirected(spark):
    nxg = nx.gnp_random_graph(40, 0.1, seed=19)
    G = from_networkx(spark, nxg)
    starts = [0, 1, 2, 3, 4, 5]
    got = {
        (r["start"], r["walk"], r["step"], r["node"])
        for r in random_walks(G, walk_length=6, num_walks=3, starts=starts).collect()
    }
    want = _py_walks(nxg, 6, 3, starts)
    assert got == want


def test_walks_directed_dead_end(spark):
    nxg = nx.DiGraph([(0, 1), (1, 2), (2, 3)])  # 3 is a sink
    nxg.add_edge(3, 3)  # self-loop at the sink: must NOT trap the walk
    nxg.add_node(9)  # isolated start: walk is just step 0
    G = from_networkx(spark, nxg)
    got = {
        (r["start"], r["walk"], r["step"], r["node"])
        for r in random_walks(G, walk_length=5, num_walks=1, starts=[0, 9]).collect()
    }
    want = _py_walks(nxg, 5, 1, [0, 9], directed=True)
    assert got == want
    # the chain walk visits 0->1->2->3 then stops (self-loop excluded)
    assert (0, 0, 3, 3) in got and not any(s == 4 for (_, _, s, _) in got)


def test_weighted_requires_weight_column(spark):
    import pytest as _pytest

    nxg = nx.path_graph(5)
    G = from_networkx(spark, nxg)
    with _pytest.raises(ValueError, match="weight"):
        random_walks(G, walk_length=2, starts=[0], weighted=True)


def test_walk_sentences_ordered(spark):
    nxg = nx.cycle_graph(6)
    G = from_networkx(spark, nxg)
    w = random_walks(G, walk_length=4, num_walks=2, starts=[0, 3])
    sent = {
        (r["start"], r["walk"]): r["sentence"]
        for r in walk_sentences(w).collect()
    }
    assert len(sent) == 4
    for (s, _), seq in sent.items():
        assert seq[0] == s and len(seq) == 5
        # consecutive nodes are graph neighbors
        for a, b in zip(seq, seq[1:]):
            assert nxg.has_edge(a, b)


def test_walks_deterministic_across_sessions(spark):
    nxg = nx.gnp_random_graph(25, 0.15, seed=3)
    G = from_networkx(spark, nxg)
    a = {
        tuple(r)
        for r in random_walks(G, walk_length=5, num_walks=2, starts=[1, 2]).collect()
    }
    b = {
        tuple(r)
        for r in random_walks(G, walk_length=5, num_walks=2, starts=[1, 2]).collect()
    }
    assert a == b
    c = {
        tuple(r)
        for r in random_walks(
            G, walk_length=5, num_walks=2, starts=[1, 2], seed=7
        ).collect()
    }
    assert c != a  # different seed, different corpus


def test_weighted_walks_match_python_replay(spark):
    import math

    from graphblas_algorithms_spark.classes.graph import Graph

    nxg = nx.gnp_random_graph(30, 0.15, seed=8)
    for u, v in nxg.edges:
        nxg[u][v]["weight"] = 1.0 + ((u * 7 + v) % 5)
    G = from_networkx(spark, nxg)
    assert "weight" in G.edges.columns
    got = {
        tuple(r)
        for r in random_walks(
            G, walk_length=5, num_walks=2, starts=[0, 1, 2], weighted=True
        ).collect()
    }

    HEX15 = 1152921504606846976.0

    def key(w, step, cur, d):
        h = hashlib.md5(f"42|{w}|{step}|{cur}|{d}".encode()).hexdigest()
        u = int(h[:15], 16) / HEX15
        return math.log(u) / nxg[cur][d]["weight"]

    want = set()
    for s in (0, 1, 2):
        for w in range(2):
            cur = s
            want.add((s, w, 0, s))
            for step in range(1, 6):
                nbrs = [v for v in nxg[cur] if v != cur]
                if not nbrs:
                    break
                cur = max(nbrs, key=lambda d: key(w, step, cur, d))
                want.add((s, w, step, cur))
    assert got == want


def test_weighted_walks_bias_toward_heavy_edges(spark):
    # star: center 0 with one heavy spoke; weighted walks from 0 should
    # pick the heavy neighbor far more often than 1/degree
    nxg = nx.Graph()
    for i in range(1, 21):
        nxg.add_edge(0, i, weight=100.0 if i == 1 else 1.0)
    G = from_networkx(spark, nxg)
    w = random_walks(G, walk_length=1, num_walks=64, starts=[0], weighted=True)
    firsts = [r["node"] for r in w.filter("step = 1").collect()]
    frac_heavy = sum(1 for n in firsts if n == 1) / len(firsts)
    assert frac_heavy > 0.5  # expectation ~100/119; uniform would be 0.05


def _n2v_py(nxg, walk_length, num_walks, starts, p, q, seed=42, weighted=False):
    import math

    HEX15 = 1152921504606846976.0

    def u(w, step, cur, d):
        h = hashlib.md5(f"{seed}|{w}|{step}|{cur}|{d}".encode()).hexdigest()
        return int(h[:15], 16) / HEX15

    def wt(a, b):
        return nxg[a][b]["weight"] if weighted else 1.0

    rows = set()
    for s in starts:
        for w in range(num_walks):
            prev, cur = None, s
            rows.add((s, w, 0, s))
            for step in range(1, walk_length + 1):
                nbrs = [v for v in nxg[cur] if v != cur]
                if not nbrs:
                    break
                if prev is None:
                    nxt = max(nbrs, key=lambda d: math.log(u(w, step, cur, d)) / wt(cur, d))
                else:

                    def key(d):
                        if d == prev:
                            alpha = 1.0 / p
                        elif nxg.has_edge(prev, d):
                            alpha = 1.0
                        else:
                            alpha = 1.0 / q
                        return math.log(u(w, step, cur, d)) / (wt(cur, d) * alpha)

                    nxt = max(nbrs, key=key)
                rows.add((s, w, step, nxt))
                prev, cur = cur, nxt
    return rows


def test_node2vec_matches_python_replay(spark):
    from graphblas_algorithms_spark.operators.walks import node2vec_walks

    nxg = nx.gnp_random_graph(35, 0.12, seed=29)
    G = from_networkx(spark, nxg)
    got = {
        tuple(r)
        for r in node2vec_walks(
            G, walk_length=6, p=2.0, q=0.5, num_walks=2, starts=[0, 1, 2, 3]
        ).collect()
    }
    want = _n2v_py(nxg, 6, 2, [0, 1, 2, 3], p=2.0, q=0.5)
    assert got == want


def test_node2vec_weighted_matches_python_replay(spark):
    from graphblas_algorithms_spark.operators.walks import node2vec_walks

    nxg = nx.gnp_random_graph(30, 0.15, seed=6)
    for a, b in nxg.edges:
        nxg[a][b]["weight"] = 1.0 + ((a + 3 * b) % 4)
    G = from_networkx(spark, nxg)
    got = {
        tuple(r)
        for r in node2vec_walks(
            G, walk_length=5, p=0.5, q=4.0, num_walks=1, starts=[0, 5], weighted=True
        ).collect()
    }
    want = _n2v_py(nxg, 5, 1, [0, 5], p=0.5, q=4.0, weighted=True)
    assert got == want


def test_node2vec_rejection_valid_and_deterministic(spark):
    """method='rejection' (the scale path): every hop is a real edge,
    the corpus is bit-identical across runs, and dead ends truncate."""
    import networkx as nx

    from graphblas_algorithms_spark import from_networkx
    from graphblas_algorithms_spark.operators.walks import node2vec_walks

    nxg = nx.gnp_random_graph(40, 0.12, seed=11)
    G = from_networkx(spark, nxg)
    a = node2vec_walks(
        G, walk_length=5, p=2.0, q=0.5, num_walks=2, starts=[0, 1, 2, 3],
        method="rejection",
    ).collect()
    b = node2vec_walks(
        G, walk_length=5, p=2.0, q=0.5, num_walks=2, starts=[0, 1, 2, 3],
        method="rejection",
    ).collect()
    key = lambda r: (r["start"], r["walk"], r["step"], r["node"])
    assert sorted(map(key, a)) == sorted(map(key, b))
    chains = {}
    for r in a:
        chains.setdefault((r["start"], r["walk"]), {})[r["step"]] = r["node"]
    for (s, w), seq in chains.items():
        assert seq[0] == s
        for st in range(1, max(seq) + 1):
            assert nxg.has_edge(seq[st - 1], seq[st]), (s, w, st)


def test_node2vec_rejection_distribution(spark):
    """Exactness of the rejection sampler's law: conditioned on walks
    whose step 1 went v0 -> v1, the step-2 draw from (prev=v0, node=v1)
    must follow alpha-weights {return 1/p, shared-nbr 1, other 1/q}
    over {v0, v2, v3}.  ~1500 of 3000 deterministic walks qualify
    (step 1 is a fair draw between v0's neighbors {v1, v2});
    +-0.05 tolerance (3 sigma ~ 0.04)."""
    from graphblas_algorithms_spark import from_edgelist
    from graphblas_algorithms_spark.operators.walks import node2vec_walks

    # v1-{v0,v2,v3}; v0-v2 makes v2 a shared neighbor of (v0, v1);
    # v3 is the DFS-ish 'other'
    G = from_edgelist(spark, [(0, 1), (1, 2), (1, 3), (0, 2)])
    p, q = 2.0, 0.5
    out = node2vec_walks(
        G, walk_length=2, p=p, q=q, num_walks=3000, starts=[0], method="rejection"
    ).persist()
    via_v1 = {r["walk"] for r in out.filter("step = 1 AND node = 1").collect()}
    step2 = [
        r["node"] for r in out.filter("step = 2").collect() if r["walk"] in via_v1
    ]
    n = len(step2)
    assert 1000 < n < 2000  # fair-ish split of 3000 between v1 and v2
    w = {0: 1.0 / p, 2: 1.0, 3: 1.0 / q}
    tot = sum(w.values())
    for v, wv in w.items():
        frac = step2.count(v) / n
        assert abs(frac - wv / tot) < 0.05, (v, frac, wv / tot)
    out.unpersist()
