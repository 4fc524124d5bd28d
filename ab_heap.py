"""Controlled A/B of driver-heap size on the bench sentinels (VERDICT r6
next-round #2): BENCH_r06's 32 common queries ran 1.93x slower than
BENCH_r04 on identical code for 4 of the 8 worst cases; r4 ran with a
64g heap, r6 with 12g. This harness times the 5 unchanged sentinel
queries under ONE heap setting per process run; the driver shell
interleaves 12g/64g runs (A/B/A/B) so host drift cancels.

Usage: SPARK_DRIVER_MEM=12g [SPARK_GRAFT_SF_DIR=...] python ab_heap.py
Prints one JSON line {"mem": ..., "queries": {name: best_sec}, ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from numalogic_prometheus_spark import plans
from numalogic_prometheus_spark.session import get_session

SENTINELS = [
    "counter_hourly",
    "tpch_q21_sole_late_supplier",
    "text_contamination_eval_overlap",
    "dedup_shingle_minhash_pairs",
    "tpch_q18_large_volume_customers",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    mem = os.environ.get("SPARK_DRIVER_MEM", "12g")
    spark = get_session(app_name=f"ab-heap-{mem}")
    queries = plans.all_queries()

    # identical warmup to bench.py: footers + one tiny-SF pass per plan
    for t in ("events", "lineitem"):
        df = spark.read.parquet(f"{sf_dir}/{t}.parquet")
        df.groupBy(df.columns[0]).count().write.mode("overwrite").format(
            "noop"
        ).save()
    warm_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    for name in SENTINELS:
        if os.path.isdir(warm_dir):
            try:
                queries[name](spark, warm_dir).write.mode(
                    "overwrite"
                ).format("noop").save()
            except Exception:
                pass

    timings = {}
    for name in SENTINELS:
        best = float("inf")
        for _ in range(3):
            spark.catalog.clearCache()
            start = time.perf_counter()
            queries[name](spark, sf_dir).write.mode("overwrite").format(
                "noop"
            ).save()
            best = min(best, time.perf_counter() - start)
        timings[name] = round(best, 4)
    print(
        json.dumps(
            {
                "mem": mem,
                "total": round(sum(timings.values()), 4),
                "queries": timings,
                "sf_dir": sf_dir,
                "t_wall": round(time.monotonic(), 1),
            }
        )
    )


if __name__ == "__main__":
    main()
