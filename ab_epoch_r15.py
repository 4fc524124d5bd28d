"""Same-epoch re-measure of the r14 vs-r13 2x drift cluster (VERDICT
r14 next-round #3): the five entries that measured 2.0-2.2x their
quiet-r13 values in the r14 quiet twin, flagged as "fast r13 epoch +
single-pass tail timing", not as plan regressions. This run settles it.

Protocol (the ab_drift.py discipline): one process, one session; warm
each suspect once at sf0.001; then interleave passes
S A B C D E  S A B C D E ...  (S = the unchanged `counter_hourly`
sentinel) for 5 rounds and report per-query MIN plus load averages.
Comparison target: each suspect's INTRODUCTION-round quiet value
(BENCH_quiet_r11.json — all five entered the registry in r11), scaled
by this window's sentinel ratio (sentinel_min_now / 0.1809, the r11
quiet sentinel floor). VERDICT "Done =": every entry within ~1.2x of
its sentinel-scaled expectation, or a named plan fix.

Usage: python ab_epoch_r15.py   (prints one JSON line; SCALE.md records
it). Refuses to run on a loaded host so the numbers mean something.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from numalogic_prometheus_spark import plans
from numalogic_prometheus_spark.session import get_session

SENTINEL = "counter_hourly"
SUSPECTS = (
    "promql_native_histogram_fraction_rate",
    "promql_native_histogram_rate_quantile_agg",
    "promql_burn_rate_multiwindow",
    "text_semantic_contamination",
    "dedup_semantic_survivors",
)
# introduction-round quiet references (BENCH_quiet_r11.json, committed)
R11_QUIET = {
    "promql_native_histogram_fraction_rate": 2.6081,
    "promql_native_histogram_rate_quantile_agg": 4.1683,
    "promql_burn_rate_multiwindow": 0.5503,
    "text_semantic_contamination": 0.5337,
    "dedup_semantic_survivors": 1.8816,
}
R11_SENTINEL_FLOOR = 0.1809
PASSES = 5


def _noop(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def main() -> None:
    ncpu = os.cpu_count() or 8
    if os.getloadavg()[0] > ncpu / 4:
        print(json.dumps({"error": "host loaded; rerun on a quiet window",
                          "loadavg": os.getloadavg()[0]}))
        return
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.environ.setdefault("SPARK_DRIVER_MEM", "12g")
    spark = get_session(app_name="ab_epoch_r15")
    queries = plans.all_queries()
    warm_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    for name in (SENTINEL,) + SUSPECTS:
        _noop(queries[name](spark, warm_dir))

    series: dict[str, list[float]] = {n: [] for n in (SENTINEL,) + SUSPECTS}
    loadavg_start = os.getloadavg()
    for _ in range(PASSES):
        for name in (SENTINEL,) + SUSPECTS:
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            _noop(queries[name](spark, sf_dir))
            series[name].append(round(time.perf_counter() - t0, 4))

    sentinel_min = min(series[SENTINEL])
    scale = sentinel_min / R11_SENTINEL_FLOOR
    rows = {}
    for name in SUSPECTS:
        got = min(series[name])
        expect = R11_QUIET[name] * scale
        rows[name] = {
            "min": got,
            "series": series[name],
            "r11_quiet": R11_QUIET[name],
            "expected_scaled": round(expect, 4),
            "ratio_vs_expected": round(got / expect, 3),
        }
    print(json.dumps({
        "sentinel_min": sentinel_min,
        "sentinel_series": series[SENTINEL],
        "sentinel_scale_vs_r11": round(scale, 3),
        "suspects": rows,
        "loadavg_start": [round(x, 2) for x in loadavg_start],
        "loadavg_end": [round(x, 2) for x in os.getloadavg()],
    }))


if __name__ == "__main__":
    main()
