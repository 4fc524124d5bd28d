"""Re-measurement of `rollup_daily_from_hourly` (VERDICT r7 next-round
#2): BENCH_r07 showed it at 0.736 s — 2.02x its r6 time and 3.62x its
r4 time on unchanged code — while the 35 other common queries averaged
0.73x of r6. Hypothesis (from the r7 heap A/B): transient host
contention, not a plan regression.

Protocol (the `ab_heap.py` discipline): interleave passes of the suspect
query with an unchanged sentinel (`counter_hourly`, a same-table
groupBy-agg scan) inside one process — S R S R S R ... — and report the
min of each plus host load averages. If the suspect's min is back in
band while the sentinel stays in ITS band, the r7 number was
contention; if the suspect is slow while the sentinel is fast, it's a
real plan problem.

Usage: python ab_rollup.py   (prints one JSON line)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from numalogic_prometheus_spark import plans
from numalogic_prometheus_spark.session import get_session

SUSPECT = "rollup_daily_from_hourly"
SENTINEL = "counter_hourly"
PASSES = 5


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.environ.setdefault("SPARK_DRIVER_MEM", "12g")
    load_before = os.getloadavg()
    spark = get_session(app_name="ab-rollup")
    queries = plans.all_queries()

    warm_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    for name in (SENTINEL, SUSPECT):
        if os.path.isdir(warm_dir):
            queries[name](spark, warm_dir).write.mode("overwrite").format(
                "noop"
            ).save()

    times: dict[str, list[float]] = {SUSPECT: [], SENTINEL: []}
    for _ in range(PASSES):
        for name in (SENTINEL, SUSPECT):
            spark.catalog.clearCache()
            start = time.perf_counter()
            queries[name](spark, sf_dir).write.mode("overwrite").format(
                "noop"
            ).save()
            times[name].append(round(time.perf_counter() - start, 4))

    print(
        json.dumps(
            {
                "suspect": SUSPECT,
                "suspect_min": min(times[SUSPECT]),
                "suspect_passes": times[SUSPECT],
                "sentinel": SENTINEL,
                "sentinel_min": min(times[SENTINEL]),
                "sentinel_passes": times[SENTINEL],
                "loadavg_before": load_before,
                "loadavg_after": os.getloadavg(),
                "sf_dir": sf_dir,
            }
        )
    )


if __name__ == "__main__":
    main()
