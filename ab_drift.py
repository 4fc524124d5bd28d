"""Interleaved A/B of the 5 most-drifted common-32 queries vs their r4
times (VERDICT r8 next-round #5): is the residual 1.26× on the common-32
a plan regression or a host-environment floor?

Protocol (the ab_heap.py / ab_rollup.py discipline): one process, one
session; warm each query once at sf0.001; then run passes interleaved
S A B C D E S A B C D E ... (S = the unchanged `counter_hourly`
sentinel) and report per-query MIN and MEDIAN of 5 passes plus load
averages. Interpretation grid:

  * suspect min ≈ its r4 time          → the bench one-shot was noise;
  * suspect min ≈ its r8 time AND the sentinel is ALSO ≈ its r8/r4
    ratio → uniform host floor (environment), not a plan problem;
  * suspect min ≫ r4 while the sentinel matches r4 → real plan cost.

r4 reference numbers are read from the committed BENCH_r04.json, so the
comparison is against the recorded artifact, not memory.

Usage: python ab_drift.py    (prints one JSON line; SCALE.md records it)
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
# the 5 largest absolute drifts among the common-32, BENCH_r08 vs r04
SUSPECTS = (
    "dedup_shingle_minhash_pairs",
    "tpch_q8_market_share",
    "tpch_q5_region_volume",
    "tpch_q18_large_volume_customers",
    "ts_step_resample",
)
PASSES = 5


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.environ.setdefault("SPARK_DRIVER_MEM", "12g")
    load_before = os.getloadavg()
    spark = get_session(app_name="ab-drift")
    queries = plans.all_queries()
    names = (SENTINEL, *SUSPECTS)

    with open(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_r04.json")
    ) as f:
        r4 = json.load(f)["parsed"]["queries"]

    warm_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    for name in names:
        if os.path.isdir(warm_dir):
            queries[name](spark, warm_dir).write.mode("overwrite").format(
                "noop"
            ).save()

    times: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(PASSES):
        for name in names:
            t0 = time.perf_counter()
            queries[name](spark, sf_dir).write.mode("overwrite").format(
                "noop"
            ).save()
            times[name].append(time.perf_counter() - t0)

    out = {
        "sf_dir": sf_dir,
        "passes": PASSES,
        "loadavg_before": load_before,
        "loadavg_after": os.getloadavg(),
        "queries": {
            n: {
                "min": round(min(ts), 3),
                "median": round(statistics.median(ts), 3),
                "r4": r4.get(n),
                "min_vs_r4": round(min(ts) / r4[n], 2) if n in r4 else None,
            }
            for n, ts in times.items()
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
