"""Parallel-sentinel adjudication of the three r10 drift suspects
(VERDICT r10 next-round #3).

r10 shipped the instrument (bench.py parallel sentinel: a fixed,
data-independent full-width aggregation measuring multi-core
throughput); this run uses it: interleave the serial sentinel S, the
parallel sentinel P and the three suspects in one session —
S P mad spans contam | S P mad spans contam | ... — and report MIN and
MEDIAN of 5 passes plus load averages. Interpretation grid:

  * P flat across rounds AND suspects back at their r8 times → the r10
    elevated readings were window noise (the driver's contended
    one-shot), nothing to fix;
  * P flat AND suspects still elevated → host story FALSIFIED →
    profile the suspect's stages (plan cost is real);
  * P elevated in proportion → multi-core host epoch; suspects
    exonerated.

Usage: python ab_parallel.py   (prints one JSON line; SCALE.md records it)
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from numalogic_prometheus_spark import plans
from numalogic_prometheus_spark.session import get_session

SENTINEL = "counter_hourly"
SUSPECTS = (
    "promql_mad_over_time",           # 2.1x r8 in the r10 quiet artifact
    "dedup_substring_spans",          # ~1.3x
    "text_contamination_eval_overlap",  # ~1.3x
)
PASSES = 5
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _noop(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def main() -> None:
    os.environ.setdefault("SPARK_DRIVER_MEM", "12g")
    spark = get_session(app_name="ab-parallel")
    queries = plans.all_queries()
    loadavg_start = os.getloadavg()

    def parallel_tick() -> float:
        t0 = time.perf_counter()
        _noop(
            spark.range(0, 200_000_000, 1, 32).selectExpr(
                "sum(id * 2654435761 % 1000003) AS s"
            )
        )
        return time.perf_counter() - t0

    # warm each suspect once at sf0.001 (plan compile, shuffle services)
    for name in (SENTINEL, *SUSPECTS):
        _noop(queries[name](spark, "/root/testdata/sf0.001"))
    parallel_tick()

    series: dict[str, list[float]] = {n: [] for n in (SENTINEL, "parallel", *SUSPECTS)}
    for _ in range(PASSES):
        t0 = time.perf_counter()
        _noop(queries[SENTINEL](spark, SF_DIR))
        series[SENTINEL].append(round(time.perf_counter() - t0, 4))
        series["parallel"].append(round(parallel_tick(), 4))
        for name in SUSPECTS:
            t0 = time.perf_counter()
            _noop(queries[name](spark, SF_DIR))
            series[name].append(round(time.perf_counter() - t0, 4))

    out = {
        "metric": "ab_parallel_adjudication",
        "sf_dir": SF_DIR,
        "passes": PASSES,
        "series": series,
        "min": {n: min(v) for n, v in series.items()},
        "median": {n: round(statistics.median(v), 4) for n, v in series.items()},
        "loadavg_start": [round(x, 2) for x in loadavg_start],
        "loadavg_end": [round(x, 2) for x in os.getloadavg()],
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
