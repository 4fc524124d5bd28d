"""Build-vs-exec decomposition of CORE_32 (VERDICT r15 next-round #4).

The frozen CORE_32 headline is full of sub-second entries where the
number the 2x gate grades is increasingly the PYTHON-side cost of
constructing + analyzing the DataFrame tree (py4j round trips +
Catalyst analysis — driver single-thread), not distributed execution:
the r15 `text_semantic_contamination` decomposition measured
0.60-1.09 s build vs 0.53 s exec, and `build_sentinel_sec` (0.116 s for
a fixed 23-expression plan) showed the build epoch drifting
independently of the serial/parallel sentinels.

Protocol (the SCALE.md round-15 decomposition recipe, applied to all of
CORE_32 in one session): per entry, N repeats of
  t_build — call the registered builder (DSL + eager per-op analysis),
  t_plan  — force queryExecution().executedPlan() (optimization +
            physical planning),
  t_exec  — noop write of the ALREADY-PLANNED frame (pure execution;
            Spark re-plans for the write's QueryExecution, so this
            still includes one more plan pass — the split is an upper
            bound on exec, lower bound on build share).
Prints one JSON line, sorted by build share, so the flattening work
(withColumn chains → single select / withColumns, hoisted subplans)
targets measured offenders, not guesses.

Usage: python profile_build_r16.py   (quiet host; sf0.1).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench import CORE_32, SENTINEL_R7_FLOOR_S
from numalogic_prometheus_spark import plans
from numalogic_prometheus_spark.session import get_session

REPEATS = 3


def main() -> None:
    ncpu = os.cpu_count() or 8
    if os.getloadavg()[0] > ncpu / 4:
        print(json.dumps({"error": "host loaded; rerun on a quiet window",
                          "loadavg": os.getloadavg()[0]}))
        return
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.environ.setdefault("SPARK_DRIVER_MEM", "12g")
    spark = get_session(app_name="profile_build_r16")
    queries = plans.all_queries()

    # warm: one full pass of every CORE_32 entry at sf0.001 (JIT) and
    # the two hot tables' footers at sf0.1
    warm_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    for t in ("events", "lineitem"):
        df = spark.read.parquet(f"{sf_dir}/{t}.parquet")
        df.groupBy(df.columns[0]).count().write.mode("overwrite").format(
            "noop"
        ).save()
    for name in CORE_32:
        queries[name](spark, warm_dir).write.mode("overwrite").format(
            "noop"
        ).save()

    rows = []
    sentinel: list[float] = []
    for name in CORE_32:
        t_build = []
        t_plan = []
        t_exec = []
        for _ in range(REPEATS):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            df = queries[name](spark, sf_dir)
            t1 = time.perf_counter()
            df._jdf.queryExecution().executedPlan()
            t2 = time.perf_counter()
            df.write.mode("overwrite").format("noop").save()
            t3 = time.perf_counter()
            t_build.append(t1 - t0)
            t_plan.append(t2 - t1)
            t_exec.append(t3 - t2)
        # interleaved serial sentinel tick for epoch attribution
        t0 = time.perf_counter()
        queries["counter_hourly"](spark, sf_dir).write.mode(
            "overwrite"
        ).format("noop").save()
        sentinel.append(round(time.perf_counter() - t0, 4))
        b, p, e = min(t_build), min(t_plan), min(t_exec)
        rows.append(
            {
                "name": name,
                "build_s": round(b, 4),
                "plan_s": round(p, 4),
                "exec_s": round(e, 4),
                "total_s": round(b + p + e, 4),
                "build_share": round((b + p) / (b + p + e), 3),
            }
        )

    rows.sort(key=lambda r: r["build_s"] + r["plan_s"], reverse=True)
    out = {
        "sf_dir": sf_dir,
        "repeats": REPEATS,
        "sentinel_series": sentinel,
        "sentinel_floor_ratio": round(
            min(sentinel) / SENTINEL_R7_FLOOR_S, 3
        ),
        "sum_build_s": round(sum(r["build_s"] for r in rows), 4),
        "sum_plan_s": round(sum(r["plan_s"] for r in rows), 4),
        "sum_exec_s": round(sum(r["exec_s"] for r in rows), 4),
        "loadavg": [round(x, 2) for x in os.getloadavg()],
        "entries": rows,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
