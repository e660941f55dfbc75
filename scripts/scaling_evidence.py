"""Two-parallelism scaling evidence for the north_rule.

Runs the SAME fused-state PageRank superstep job over the SAME edge
parquet at two local[] parallelism levels, alternating short bursts so
both levels sample the same host-noise windows, and reports:

* min steady-state per-superstep wall per level (min over many bursts
  filters the sandbox host's bursty contention, which we measured at
  2-3x over minutes on identical CPU-bound work);
* throughput = edges / min-wall, and wall-clock scaling efficiency
  (thr_hi / thr_lo) / (hi / lo);
* JVM CPU-seconds per superstep per level (utime+stime of the local JVM
  around each burst) — work-inflation evidence that the extra cores do
  not add wasted work, complementing the noisy wall numbers.

Usage: python scripts/scaling_evidence.py [edges_parquet] [lo] [hi] [reps]
Writes one JSON line to stdout.

Config variants (each needs a FRESH process — JVM flags are fixed at
gateway launch):
* ``SPARK_GRAFT_SCALE_CONF``   — JSON dict of extra Spark conf applied to
  every session (e.g. ``{"spark.shuffle.compress": "false"}``).
* ``SPARK_GRAFT_SCALE_JAVAOPTS`` — replaces the default driver JVM opts
  (e.g. ``-XX:+UseParallelGC -XX:ParallelGCThreads={cores}``; the literal
  ``{cores}`` is substituted per burst — only honoured on the burst that
  first launches the JVM, hence GC-thread sweeps pin LO==HI per process).
* ``SPARK_GRAFT_SCALE_SHUFPARTS`` — shuffle partitions per burst as a
  multiple of cores (default 1).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EDGES = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_scale_edges"
LO = int(sys.argv[2]) if len(sys.argv) > 2 else 4
HI = int(sys.argv[3]) if len(sys.argv) > 3 else 16
REPS = int(sys.argv[4]) if len(sys.argv) > 4 else 5
ITERS = int(os.environ.get("SPARK_GRAFT_SCALE_ITERS", "3"))
EXTRA_CONF = json.loads(os.environ.get("SPARK_GRAFT_SCALE_CONF", "{}"))
JAVAOPTS = os.environ.get("SPARK_GRAFT_SCALE_JAVAOPTS", "")
SHUFX = float(os.environ.get("SPARK_GRAFT_SCALE_SHUFPARTS", "1"))


def _jvm_cpu_seconds(spark) -> float:
    pid = spark._jvm.java.lang.ProcessHandle.current().pid()
    with open(f"/proc/{pid}/stat") as f:
        parts = f.read().split()
    hz = os.sysconf("SC_CLK_TCK")
    return (int(parts[13]) + int(parts[14])) / hz


def burst(cores: int, iters: int):
    """One fresh-session burst; returns (per-iter walls, per-iter cpu_s, edges)."""
    from pyspark.sql import functions as F

    from graphblas_algorithms_spark.session import get_spark, stop_spark

    stop_spark()
    conf = dict(EXTRA_CONF)
    if JAVAOPTS:
        conf["spark.driver.extraJavaOptions"] = JAVAOPTS.replace("{cores}", str(cores))
    spark = get_spark(cores=cores, shuffle_partitions=max(1, int(cores * SHUFX)),
                      app_name=f"scaling-{cores}", driver_memory="48g",
                      extra_conf=conf)
    edges = spark.read.parquet(EDGES)
    adj = edges.repartition(cores, "src").persist()
    m = adj.count()
    nodes = (edges.select(F.col("src").alias("id"))
             .unionByName(edges.select(F.col("dst").alias("id")))).distinct()
    n = nodes.count()
    state = nodes.select("id", (F.lit(1.0) / n).alias("value"),
                         (F.lit(0.15) / n).alias("_tele"))
    state = state.repartition(cores, "id").localCheckpoint(eager=True)
    from graphblas_algorithms_spark.plans.superstep import _release_state

    walls, cpus = [], []
    prev = None
    for _ in range(iters + 1):  # +1 warmup
        t0, c0 = time.time(), _jvm_cpu_seconds(spark)
        contribs = (state.join(adj, state.id == adj.src)
                    .groupBy(F.col("dst").alias("cid"))
                    .agg(F.sum(F.col("value") * 0.85).alias("_c")))
        ns = (state.join(contribs, state.id == contribs.cid, "left")
              .select("id",
                      (F.coalesce("_c", F.lit(0.0)) + F.col("_tele")).alias("value"),
                      "_tele", F.abs(F.coalesce("_c", F.lit(0.0))).alias("_diff")))
        ns = ns.localCheckpoint(eager=False)
        ns.agg(F.sum("_diff")).collect()
        if prev is not None:
            _release_state(prev)  # free retired checkpoint blocks (GC pressure)
        prev = state
        state = ns.select("id", "value", "_tele")
        walls.append(time.time() - t0)
        cpus.append(_jvm_cpu_seconds(spark) - c0)
    return walls[1:], cpus[1:], m


def main() -> None:
    levels = (LO,) if LO == HI else (LO, HI)  # pinned single-level mode for JVM-opt sweeps
    res = {c: {"walls": [], "cpus": []} for c in levels}
    m = None
    for rep in range(REPS):
        for c in levels:  # tight interleave: both levels see the same noise
            w, cp, m = burst(c, ITERS)
            res[c]["walls"] += w
            res[c]["cpus"] += cp
            print(f"# rep{rep} cores={c} walls={[round(x,1) for x in w]} "
                  f"cpu={[round(x,1) for x in cp]}", file=sys.stderr, flush=True)
    out = {"edges": m, "iters_per_burst": ITERS, "reps": REPS}
    for c in levels:
        mn = min(res[c]["walls"])
        out[f"local{c}"] = {
            "min_wall_s": round(mn, 2),
            "median_wall_s": round(sorted(res[c]["walls"])[len(res[c]["walls"]) // 2], 2),
            "edges_per_sec": round(m / mn, 1),
            "min_cpu_s": round(min(res[c]["cpus"]), 2),
        }
    if LO != HI:
        eff = (out[f"local{HI}"]["edges_per_sec"] / out[f"local{LO}"]["edges_per_sec"]) / (HI / LO)
        out["wall_efficiency"] = round(eff, 4)
        # work inflation: cpu-seconds per superstep should be ~flat across levels
        out["cpu_work_inflation"] = round(
            out[f"local{HI}"]["min_cpu_s"] / out[f"local{LO}"]["min_cpu_s"], 4
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
