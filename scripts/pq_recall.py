"""Measure IVF-PQ recall@k and wall vs exact and vs plain IVF at bench
scale — same discipline as scripts/ivf_recall.py: an approximate
operator ships with its measured quality number or it doesn't ship.

Two corpora:
  1. the sf embeddings table (isotropic — the hard, structure-free case);
  2. a planted-cluster corpus of the same size (the regime real
     embedding corpora live in).

Usage: python scripts/pq_recall.py [sf_dir] [k]
Writes /tmp/pq_recall.json and prints markdown rows for BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

from graphblas_algorithms_spark.pipeline.similarity import (
    cosine_topk,
    ivf_pq_topk,
    ivf_topk,
)
from graphblas_algorithms_spark.session import get_spark


def topk_sets(df):
    out = {}
    for r in df.collect():
        out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return out


def recall(exact, approx):
    rs = [len(exact[q] & approx.get(q, set())) / len(exact[q]) for q in exact]
    return round(sum(rs) / len(rs), 3)


def clustered(spark, n, d=64, n_clusters=50, sigma=0.08):
    rng = np.random.default_rng(7)
    centers = rng.normal(size=(n_clusters, d))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    for i in range(n):
        c = i % n_clusters
        v = centers[c] + sigma * rng.normal(size=d)
        rows.append((i, [float(x) for x in v]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def bench_corpus(spark, emb, k, label, results):
    emb = emb.persist()
    n = emb.count()
    t0 = time.time()
    exact = topk_sets(cosine_topk(emb, k=k, max_n=None))
    t_exact = round(time.time() - t0, 1)
    print(f"[{label}] n={n} exact: {t_exact}s", flush=True)

    for name, fn, kwargs in [
        ("ivf m=16 np=8", ivf_topk, dict(m=16, n_probe=8)),
        ("ivf_pq m=16 np=8 ksub=8x16 rr=4", ivf_pq_topk,
         dict(m=16, n_probe=8, m_sub=8, k_codes=16, rerank=4)),
        ("ivf_pq m=16 np=8 ksub=8x32 rr=4", ivf_pq_topk,
         dict(m=16, n_probe=8, m_sub=8, k_codes=32, rerank=4)),
        ("ivf_pq m=16 np=8 ksub=8x16 rr=8", ivf_pq_topk,
         dict(m=16, n_probe=8, m_sub=8, k_codes=16, rerank=8)),
        ("ivf_pq m=16 np=8 ksub=8x256 rr=4 (r4 default)", ivf_pq_topk,
         dict(m=16, n_probe=8, m_sub=8, k_codes=256, rerank=4)),
        ("ivf_pq m=16 np=8 ksub=8x256 rr=4 rot", ivf_pq_topk,
         dict(m=16, n_probe=8, m_sub=8, k_codes=256, rerank=4, rotation_seed=42)),
    ]:
        t0 = time.time()
        approx = topk_sets(fn(emb, k=k, **kwargs))
        wall = round(time.time() - t0, 1)
        rec = recall(exact, approx)
        results.append(
            {"corpus": label, "variant": name, "wall_s": wall,
             "recall": rec, "exact_wall_s": t_exact, "n": n}
        )
        print(f"[{label}] {name}: recall@{k}={rec} wall={wall}s", flush=True)
    emb.unpersist()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_spark(cores=16, shuffle_partitions=32, driver_memory="24g")
    results: list[dict] = []

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    bench_corpus(spark, emb, k, "isotropic(sf)", results)
    n = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    bench_corpus(spark, clustered(spark, n), k, "clustered", results)

    with open("/tmp/pq_recall.json", "w") as f:
        json.dump(results, f, indent=2)
    print("| corpus | variant | recall@10 | wall (s) | exact wall (s) |")
    print("|---|---|---|---|---|")
    for r in results:
        print(
            f"| {r['corpus']} | {r['variant']} | {r['recall']} "
            f"| {r['wall_s']} | {r['exact_wall_s']} |"
        )


if __name__ == "__main__":
    main()
