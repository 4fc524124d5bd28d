"""Same-epoch A/B of the five r16 quiet-twin regressions (VERDICT r16
next-round #3): dedup_cdc_chunk_pairs (1.67x r15-quiet — above the
1.45x par-epoch ratio, the one genuine suspect) and the four
multimodal lines (1.33-1.49x, attributed to the parallel epoch).

Protocol (ab_epoch_r15/r16 discipline) with the directive's amendment:
these are multi-core-throughput entries, so expectations scale by the
PARALLEL sentinel (bench.py's fixed full-width 32-slice aggregation),
not the serial scan. One process, one session; warm each suspect once
at sf0.001; interleave P A B C D E  P A B C D E ... (P = one parallel
sentinel tick) for 5 rounds; report per-query MIN vs the r15-quiet
reference scaled by (par_min_now / 0.0943), the r15-quiet parallel
floor. "Done =" each within ~1.2x of par-scaled expectation, or a
named plan/kernel fix.

r17 CONTEXT for the four multimodal suspects: the pre-decode
narrow-key spread (operators/multimodal.py:_spread_ids, this round)
deliberately changed their plans — the old shape decoded the whole
corpus on one core. Expect ratios far BELOW 1.0 for those; the A/B
then both adjudicates the r16 regression (epoch vs plan) and records
the spread win on a same-epoch protocol. dedup_cdc_chunk_pairs is
code-unchanged since r15 and carries the open question.

Usage: python ab_epoch_r17.py  (one JSON line; SCALE.md records it).
Refuses a loaded host so the numbers mean something.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from numalogic_prometheus_spark import plans
from numalogic_prometheus_spark.session import get_session

SUSPECTS = (
    "dedup_cdc_chunk_pairs",
    "multimodal_frame_sample",
    "multimodal_image_row_stats",
    "multimodal_image_resize_features",
    "multimodal_video_avi_mjpeg_frames",
)
# r15 quiet-twin references (BENCH_quiet_r15.json, committed)
R15_QUIET = {
    "dedup_cdc_chunk_pairs": 1.927,
    "multimodal_frame_sample": 3.7046,
    "multimodal_image_row_stats": 3.812,
    "multimodal_image_resize_features": 3.7233,
    "multimodal_video_avi_mjpeg_frames": 3.1106,
}
R15_PAR_FLOOR = 0.0943  # BENCH_quiet_r15.json parallel_sentinel_sec
PASSES = 5


def _noop(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def _par_tick(spark) -> float:
    """bench.py's parallel sentinel, verbatim: fixed full-width
    32-slice aggregation — multi-core throughput, data-free."""
    t0 = time.perf_counter()
    spark.range(0, 200_000_000, 1, 32).selectExpr(
        "sum(id * 2654435761 % 1000003) AS s"
    ).write.mode("overwrite").format("noop").save()
    return round(time.perf_counter() - t0, 4)


def main() -> None:
    ncpu = os.cpu_count() or 8
    if os.getloadavg()[0] > ncpu / 4:
        print(json.dumps({"error": "host loaded; rerun on a quiet window",
                          "loadavg": os.getloadavg()[0]}))
        return
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.environ.setdefault("SPARK_DRIVER_MEM", "12g")
    spark = get_session(app_name="ab_epoch_r17")
    queries = plans.all_queries()
    warm_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    _par_tick(spark)  # absorb the par plan's first-run JIT
    for name in SUSPECTS:
        _noop(queries[name](spark, warm_dir))

    par_series: list[float] = []
    series: dict[str, list[float]] = {n: [] for n in SUSPECTS}
    loadavg_start = os.getloadavg()
    for _ in range(PASSES):
        par_series.append(_par_tick(spark))
        for name in SUSPECTS:
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            _noop(queries[name](spark, sf_dir))
            series[name].append(round(time.perf_counter() - t0, 4))

    par_min = min(par_series)
    scale = par_min / R15_PAR_FLOOR
    rows = []
    for name in SUSPECTS:
        now = min(series[name])
        expected = R15_QUIET[name] * scale
        rows.append(
            {
                "name": name,
                "min_now": now,
                "r15_quiet": R15_QUIET[name],
                "expected_par_scaled": round(expected, 4),
                "ratio_vs_expected": round(now / expected, 3),
                "series": series[name],
            }
        )
    print(
        json.dumps(
            {
                "par_sentinel_min": par_min,
                "par_scale_vs_r15": round(scale, 3),
                "par_sentinel_series": par_series,
                "loadavg_start": [round(x, 2) for x in loadavg_start],
                "loadavg_end": [round(x, 2) for x in os.getloadavg()],
                "suspects": rows,
            }
        )
    )


if __name__ == "__main__":
    main()
