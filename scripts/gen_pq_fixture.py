"""Generate fixtures/pq_codebook_sf001.json — the PQ codebook the
driver's pipe_ann_ivf_pq oracle replays against.

The codebook itself is a tiny trained model (farthest-point init + 10
fixed Lloyd iterations over the md5-uniform sample, similarity.py
pq_train) and is fully deterministic for a given corpus — but Lloyd's
numpy means are not expressible in SQL, so the oracle PINS the trained
codebook (snapped to the 2^-20 dyadic grid, matching the kernel's
dyadic ADC path) as a JSON fixture and replays everything downstream —
encode, ADC candidate selection, exact re-rank — independently in SQL.
``tests/test_pipeline.py::test_pq_codebook_matches_fixture`` guards the
fixture against silent drift: it retrains on the same sf0.01 data and
asserts snapped-int equality.

Usage: python scripts/gen_pq_fixture.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from graphblas_algorithms_spark.pipeline.similarity import pq_train
from graphblas_algorithms_spark.session import get_spark

BITS = 20


def snapped_codebook_rows(spark, sf_dir: str) -> list[dict]:
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cbdf = pq_train(emb, m_sub=8, k_codes=256)
    rows = []
    for r in cbdf.collect():
        vec = np.floor(np.asarray(r["code_vec"]) * float(2**BITS)).astype(np.int64)
        rows.append({"s": int(r["sub_id"]), "k": int(r["code_id"]), "c": vec.tolist()})
    rows.sort(key=lambda x: (x["s"], x["k"]))
    return rows


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(cores=8, shuffle_partitions=8, driver_memory="8g")
    rows = snapped_codebook_rows(spark, sf_dir)
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "fixtures",
        "pq_codebook_sf001.json",
    )
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(rows, f)
    print(f"wrote {out}: {len(rows)} codebook rows")


if __name__ == "__main__":
    main()
