"""Golden-semantics pins for promql_native_histogram_rate
(plans/promql7.py; VERDICT r9 #3). The DuckDB oracle shares the
bucket/epoch/extrapolation arithmetic, so parity alone cannot catch a
shared semantics bug — this hand-computes histogramRate on a crafted
series instead, pinning (a) a counter reset strictly inside the window
(bucket-wise DetectReset + `.Add(prev)` correction) and (b) the
boundary-extrapolation edge (gap ≥ 1.1× average spacing → half-average
substitution)."""

from __future__ import annotations

from datetime import datetime, timezone

import pytest


def _ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


@pytest.fixture()
def nh_counter_fixture(spark, tmp_path):
    """Series 'svc' on the 90-min epoch grid (boundaries 00:00, 01:30,
    03:00, ...). Hour 01:00 contains the 01:30 restart; hour 05:00 has
    no restart but a big edge gap on both sides.

    value 1.5 → bucket idx 1 ((1, 2]); value 3.0 → idx 2 ((2, 4])."""
    rows = []
    eid = 0

    def add(ts: str, value: float, k: int = 1) -> None:
        nonlocal eid
        for _ in range(k):
            eid += 1
            rows.append(("svc", _ts(ts), eid, value))

    # hour 01: scrapes 01:05, 01:20 | RESET at 01:30 | 01:40, 01:50
    add("2024-01-01T01:05:00", 1.5, 3)
    add("2024-01-01T01:05:00", 3.0, 1)
    add("2024-01-01T01:20:00", 1.5, 2)
    add("2024-01-01T01:40:00", 1.5, 1)   # new epoch: cum restarts
    add("2024-01-01T01:40:00", 3.0, 1)
    add("2024-01-01T01:50:00", 3.0, 1)
    # hour 05: scrapes 05:30, 05:35, 05:40 — ds0/de both ≥ 1.1×avg
    add("2024-01-01T05:30:00", 1.5, 1)
    add("2024-01-01T05:35:00", 1.5, 2)
    add("2024-01-01T05:40:00", 1.5, 1)
    df = spark.createDataFrame(
        rows, "event_type string, ts timestamp, event_id long, value double"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))


def test_reset_and_extrapolation_edges(spark, tmp_path, nh_counter_fixture):
    from numalogic_prometheus_spark.plans.promql7 import (
        promql_native_histogram_rate,
    )

    got = {
        (r["hour"].replace(tzinfo=timezone.utc).hour, r["idx"]): (
            r["n_scrapes"],
            r["delta_n"],
            r["rate_per_sec"],
        )
        for r in promql_native_histogram_rate(spark, str(tmp_path)).collect()
    }

    # --- hour 01: reset correction -------------------------------------
    # cums: idx1 3→5 | reset (5→1 drop detected) → 1→1 ; idx2 1→1 | 1→2.
    # increase = last − first + prev-at-reset:
    #   idx1: 1 − 3 + 5 = 3 (true in-window observations after 01:05)
    #   idx2: 2 − 1 + 1 = 2 — idx2 did NOT drop, but DetectReset is
    #   histogram-wide, so .Add(prev) applies to every bucket
    # extrapolation: si=45min, n=4, avg=15min, thr=16.5min;
    #   ds0=5min < thr, de=10min < thr → actual gaps → factor
    #   = (45+5+10)/45 = 4/3
    f1 = (2700e6 + 300e6 + 600e6) / 2700e6
    assert got[(1, 1)] == (4, 3, 3.0 * f1 / 3600.0)
    assert got[(1, 2)] == (4, 2, 2.0 * f1 / 3600.0)

    # --- hour 05: big-gap substitution, no reset ------------------------
    # si=10min, n=3, avg=5min, thr=5.5min; ds0=30min ≥ thr and
    # de=20min ≥ thr → BOTH substitute avg/2 = 2.5min → factor
    # = (10+2.5+2.5)/10 = 1.5. delta = 4 − 1 = 3.
    f5 = (600e6 + 150e6 + 150e6) / 600e6
    assert f5 == 1.5
    assert got[(5, 1)] == (3, 3, 3.0 * f5 / 3600.0)

    # nothing else: zero-delta buckets drop, n<2 windows drop
    assert set(got) == {(1, 1), (1, 2), (5, 1)}
