"""Quiet-window re-audit of the 12 entries HEADLINE_EXCLUDED gained in
r16 (ADVICE r16: they were excluded on the evidence of ONE contended
sf0.1 sweep window — 1074 s vs r15's 695 s on identical oracle code —
and the spark-side re-measures themselves ran against a 2.3x-floor
sentinel). This script produces the re-auditable record the advice
asked for: spark-side min-of-3 at sf0.1 for each excluded entry,
interleaved with the serial sentinel, refusing to run on a loaded
host, and with the sentinel floor ratio stamped into the artifact so
the window's quality is part of the evidence.

Decision rule (bench.py's own r11 threshold): an entry whose QUIET
spark-side min-of-3 exceeds 2 s belongs in HEADLINE — the audit prints
a `should_promote` list; an empty list means the exclusions stand on
quiet evidence. Artifact: EXCLUDED_AUDIT_r17.json (committed).

Usage: python excluded_audit_r17.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench import SENTINEL_R7_FLOOR_S
from numalogic_prometheus_spark import plans
from numalogic_prometheus_spark.session import get_session

R16_EXCLUDED = (
    "profile_drift_halves",
    "promql_comparison_bool",
    "promql_increase_total",
    "promql_resets_changes",
    "promql_scalar_binop",
    "promql_sort_by_label",
    "subquery_scalar_above_avg",
    "text_bm25_topk",
    "text_boilerplate_segments",
    "text_quality_by_source",
    "text_simhash_signatures",
    "tpch_q9_product_profit",
)
SENTINEL = "counter_hourly"
PASSES = 3


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
    spark = get_session(app_name="excluded_audit_r17")
    queries = plans.all_queries()
    warm_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    for name in (SENTINEL,) + R16_EXCLUDED:
        _noop(queries[name](spark, warm_dir))

    sentinel_series: list[float] = []
    series: dict[str, list[float]] = {n: [] for n in R16_EXCLUDED}
    for _ in range(PASSES):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        _noop(queries[SENTINEL](spark, sf_dir))
        sentinel_series.append(round(time.perf_counter() - t0, 4))
        for name in R16_EXCLUDED:
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            _noop(queries[name](spark, sf_dir))
            series[name].append(round(time.perf_counter() - t0, 4))

    floor_ratio = round(min(sentinel_series) / SENTINEL_R7_FLOOR_S, 3)
    rows = {n: {"min": min(s), "series": s} for n, s in series.items()}
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "sentinel_series": sentinel_series,
                "sentinel_floor_ratio": floor_ratio,
                "quiet_window": floor_ratio <= 1.3,
                "entries": rows,
                "should_promote": sorted(
                    n for n, r in rows.items() if r["min"] > 2.0
                ),
                "loadavg_end": [round(x, 2) for x in os.getloadavg()],
            }
        )
    )


if __name__ == "__main__":
    main()
