"""Measure plain vxm vs salted_vxm_sum on a hub-skewed graph (VERDICT r2
"Next round" #4: the north_rule names power-law hubs; the salted kernel
exists and is correctness-tested but had no measured crossover).

Graph shape: `n_hubs` sources each own `hub_deg` out-edges (one join key
-> one shuffle task without mitigation) on top of `n_bg` uniformly
distributed background edges.  One plus-times superstep y = x @ A is
timed per variant:

  * plain  — vxm() with AQE skew-join ON (the engine session default)
  * plain-noaqe — vxm() with AQE disabled (what a static planner does)
  * salted S=4 / S=16 — salted_vxm_sum()

Each variant runs `reps` times after one warmup; min + median reported.
Writes /tmp/skew_bench.json and prints a markdown table.

Usage: python scripts/skew_bench.py [n_hubs] [hub_deg] [n_bg] [reps]
"""

from __future__ import annotations

import json
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from graphblas_algorithms_spark.functions.semiring import salted_vxm_sum, vxm
from graphblas_algorithms_spark.session import get_spark


def build_graph(spark, n_hubs: int, hub_deg: int, n_bg: int, n_nodes: int):
    """Deterministic hub-skewed edge table, persisted and pre-counted."""
    hubs = (
        spark.range(n_hubs * hub_deg)
        .select(
            (F.col("id") % n_hubs).alias("src"),
            # spread hub fan-out over the whole node space
            F.pmod(F.xxhash64("id"), F.lit(n_nodes)).alias("dst"),
        )
    )
    bg = (
        spark.range(n_bg)
        .select(
            F.pmod(F.xxhash64("id", F.lit(1)), F.lit(n_nodes)).alias("src"),
            F.pmod(F.xxhash64("id", F.lit(2)), F.lit(n_nodes)).alias("dst"),
        )
    )
    edges = hubs.unionByName(bg).persist()
    m = edges.count()
    return edges, m


def time_variant(fn, reps: int):
    walls = []
    for i in range(reps + 1):
        t0 = time.time()
        fn()
        w = time.time() - t0
        if i > 0:  # first rep is warmup
            walls.append(w)
    return min(walls), statistics.median(walls)


def main():
    n_hubs = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    hub_deg = int(sys.argv[2]) if len(sys.argv) > 2 else 5_000_000
    n_bg = int(sys.argv[3]) if len(sys.argv) > 3 else 20_000_000
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 3
    n_nodes = 2_000_000

    spark = get_spark(cores=16, shuffle_partitions=32, driver_memory="48g")
    edges, m = build_graph(spark, n_hubs, hub_deg, n_bg, n_nodes)
    print(
        f"graph: {m} edges, {n_hubs} hubs x {hub_deg} out-edges "
        f"({n_hubs * hub_deg / m:.0%} of edges in hub keys)",
        flush=True,
    )
    x = (
        spark.range(n_nodes)
        .select(F.col("id"), (F.lit(1.0) / n_nodes).alias("value"))
        .persist()
    )
    x.count()

    results = []

    def run(label, fn, aqe: bool):
        spark.conf.set("spark.sql.adaptive.enabled", str(aqe).lower())
        mn, md = time_variant(fn, reps)
        thr = m / mn / 1e6
        results.append(
            {"variant": label, "min_s": round(mn, 2), "median_s": round(md, 2), "medges_per_s": round(thr, 2)}
        )
        print(f"{label}: min {mn:.2f}s median {md:.2f}s ({thr:.1f} M edges/s)", flush=True)

    # -- regime 0: state vector fits the broadcast threshold ------------
    # (engine session default 64 MB).  A broadcast-hash join never
    # partitions edges by src, so hub skew cannot bite — the measured
    # reason small-state supersteps are skew-immune.  At 10^12-file scale
    # the state is NOT broadcastable, hence regime 1 below.
    run("plain vxm, state broadcast (AQE on)", lambda: vxm(x, edges).count(), aqe=True)

    # -- regime 1: force the shuffle join (the 100 TB shape) ------------
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    run("plain vxm, shuffle join (AQE skew-join on)", lambda: vxm(x, edges).count(), aqe=True)
    run("plain vxm, shuffle join (AQE off)", lambda: vxm(x, edges).count(), aqe=False)
    for s in (4, 16):
        # salting must not depend on AQE to work — measure with AQE off,
        # then the production combination (salted + AQE) as well
        run(f"salted S={s}, shuffle join (AQE off)", lambda s=s: salted_vxm_sum(x, edges, salt=s).count(), aqe=False)
        run(f"salted S={s}, shuffle join (AQE on)", lambda s=s: salted_vxm_sum(x, edges, salt=s).count(), aqe=True)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    spark.conf.set("spark.sql.adaptive.enabled", "true")

    out = {
        "edges": m,
        "n_hubs": n_hubs,
        "hub_deg": hub_deg,
        "n_bg": n_bg,
        "reps": reps,
        "results": results,
    }
    with open("/tmp/skew_bench.json", "w") as f:
        json.dump(out, f, indent=2)
    print("\n| variant | min (s) | median (s) | M edges/s |")
    print("|---|---|---|---|")
    for r in results:
        print(f"| {r['variant']} | {r['min_s']} | {r['median_s']} | {r['medges_per_s']} |")


if __name__ == "__main__":
    main()
