"""Measure IVF ANN recall@k against the exact brute-force top-k at bench
scale (VERDICT r2 "Next round" #2: an approximate operator without a
measured quality number is a liability).

Runs `cosine_topk` (exact, oracled) once as ground truth on the sf
embeddings table, then `ivf_topk` across an (m, n_probe) grid, reporting
mean recall@k and wall seconds per config, plus one `ivf_topk_pandas`
spot-check (it is rank-for-rank identical to ivf_topk by test, so its
recall is the same by construction).

Usage: python scripts/ivf_recall.py [sf_dir] [k]
Writes JSON to /tmp/ivf_recall.json and prints a markdown table for
BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from graphblas_algorithms_spark.session import get_spark
from graphblas_algorithms_spark.pipeline.similarity import cosine_topk, ivf_topk


def topk_sets(df):
    out = {}
    for r in df.collect():
        out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_spark(cores=16, shuffle_partitions=32, driver_memory="24g")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").persist()
    n = emb.count()
    print(f"corpus: {n} vectors from {sf_dir}", flush=True)

    t0 = time.time()
    exact = topk_sets(cosine_topk(emb, k=k, max_n=None))
    t_exact = time.time() - t0
    print(f"exact cosine_topk@{k}: {t_exact:.1f}s", flush=True)

    grid = [(8, 2), (8, 4), (16, 2), (16, 4), (16, 8), (32, 4), (32, 8)]
    rows = []
    for m, n_probe in grid:
        t0 = time.time()
        approx = topk_sets(ivf_topk(emb, k=k, m=m, n_probe=n_probe))
        wall = time.time() - t0
        recalls = [
            len(exact[q] & approx.get(q, set())) / len(exact[q]) for q in exact
        ]
        rec = sum(recalls) / len(recalls)
        frac_probed = min(1.0, n_probe / m)
        rows.append(
            {
                "m": m,
                "n_probe": n_probe,
                "recall": round(rec, 4),
                "wall_s": round(wall, 2),
                "frac_cells_probed": round(frac_probed, 3),
            }
        )
        print(
            f"ivf m={m:3d} n_probe={n_probe} recall@{k}={rec:.4f} wall={wall:.1f}s",
            flush=True,
        )

    out = {"sf_dir": sf_dir, "n_vectors": n, "k": k, "exact_wall_s": round(t_exact, 2), "grid": rows}
    with open("/tmp/ivf_recall.json", "w") as f:
        json.dump(out, f, indent=2)

    print("\n| m | n_probe | cells probed | recall@%d | wall (s) |" % k)
    print("|---|---|---|---|---|")
    for r in rows:
        print(
            f"| {r['m']} | {r['n_probe']} | {r['frac_cells_probed']:.0%} "
            f"| {r['recall']:.3f} | {r['wall_s']} |"
        )
    print(f"\nexact brute force: {t_exact:.1f}s (ground truth)")


if __name__ == "__main__":
    main()
