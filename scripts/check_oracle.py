"""Local emulation of the driver's correctness gate: run every
__spark_entry__.queries() entry on Spark AND its oracle_sql() on DuckDB
at sf0.01, compare row count + column names + sorted values.

Usage: python scripts/check_oracle.py [sf_dir] [only_query ...]
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb

import __spark_entry__ as entrymod
from graphblas_algorithms_spark.session import get_spark

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for row in rows:
        vals = []
        for i in idx:
            v = row[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "nan"
                else:
                    v = round(v, 6)
                    if v == -0.0:
                        v = 0.0
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=lambda t: tuple(str(x) for x in t))
    return [c for c in sorted(cols)], out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(cores=16, shuffle_partitions=16, driver_memory="16g")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {type(e).__name__}: {e}", flush=True)
            n_fail += 1
            continue
        spark_t = time.time() - t0
        if name not in oracles:
            print(f"SKIP-ORACLE {name}: rows={len(s_rows)} ({spark_t:.1f}s)", flush=True)
            continue
        t0 = time.time()
        try:
            res = con.execute(oracles[name])
            d_cols = [d[0] for d in res.description]
            d_rows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {type(e).__name__}: {e}", flush=True)
            n_fail += 1
            continue
        duck_t = time.time() - t0
        sc, sr = norm_rows(s_cols, s_rows)
        dc, dr = norm_rows(d_cols, d_rows)
        if sc != dc:
            print(f"FAIL {name}: columns {sc} vs {dc}", flush=True)
            n_fail += 1
            continue
        if len(sr) != len(dr):
            print(f"FAIL {name}: rows {len(sr)} vs {len(dr)}", flush=True)
            n_fail += 1
            continue
        bad = [(a, b) for a, b in zip(sr, dr) if a != b]
        if bad:
            print(f"FAIL {name}: {len(bad)} mismatched rows; first: {bad[0]}", flush=True)
            n_fail += 1
            continue
        print(
            f"PASS {name}: rows={len(sr)} spark={spark_t:.1f}s duck={duck_t:.1f}s",
            flush=True,
        )
        n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail", flush=True)
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
