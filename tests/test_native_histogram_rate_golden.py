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


def test_rate_quantile_composition(spark, tmp_path, nh_counter_fixture):
    """histogram_quantile(0.9, rate(...)) on the same fixture: the
    extrapolation factor cancels, so the quantile runs on the exact
    integer deltas — hour 01 has deltas {idx1: 3, idx2: 2} (total 5,
    rank 4.5 → idx2, frac (4.5−3)/2) and hour 05 a single bucket
    (total 3, rank 2.7, frac 0.9)."""
    from numalogic_prometheus_spark.plans.promql7 import (
        promql_native_histogram_rate_quantile,
    )

    got = {
        r["hour"].replace(tzinfo=timezone.utc).hour: (r["n_inc"], r["p90_rate"])
        for r in promql_native_histogram_rate_quantile(
            spark, str(tmp_path)
        ).collect()
    }
    assert set(got) == {1, 5}
    # JVM Math.pow is allowed 1 ulp off Python's pow — approx matches
    # the engine-level 1e-6 canonicalization that absorbs it
    approx = pytest.approx
    assert got[1][0] == 5
    assert got[1][1] == approx(2.0 ** (2 - 1) * 2.0 ** ((4.5 - 3.0) / 2.0), abs=1e-9)
    assert got[5][0] == 3
    assert got[5][1] == approx(2.0 ** (1 - 1) * 2.0 ** (2.7 / 3.0), abs=1e-9)


def test_native_fraction_exponential_interpolation(spark, tmp_path):
    """promql_native_histogram_fraction golden: hand-computed v2.50+
    exponential interpolation at schema 0. Counts {(0.5,1]: 4,
    (32,64]: 2, (256,512]: 2}; CDF(48) = 4 + 2·(log2 48 − 5),
    CDF(0.7) = 0 + 4·(log2 0.7 + 1); fraction = (Δ)/8 — exact-integer
    partials times two plan-time literals."""
    import math

    from numalogic_prometheus_spark.plans.promql7 import (
        promql_native_histogram_fraction,
    )

    rows = (
        [("svc", _ts("2024-01-01T00:00:00"), i, 0.8) for i in range(4)]
        + [("svc", _ts("2024-01-01T00:01:00"), 10 + i, 40.0) for i in range(2)]
        + [("svc", _ts("2024-01-01T00:02:00"), 20 + i, 300.0) for i in range(2)]
    )
    spark.createDataFrame(
        rows, "event_type string, ts timestamp, event_id long, value double"
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))

    out = promql_native_histogram_fraction(spark, str(tmp_path)).collect()
    assert len(out) == 1 and out[0]["n_obs"] == 8
    cdf_hi = 4 + 2 * (math.log2(48.0) - 5)
    cdf_lo = 0 + 4 * (math.log2(0.7) - -1)
    assert out[0]["fraction"] == (cdf_hi - cdf_lo) / 8.0


def test_rate_fraction_composition(spark, tmp_path):
    """histogram_fraction(0.7, 48, rate(...)) golden: the extrapolation
    factor cancels, so the CDF arithmetic runs on the exact integer
    window deltas with both endpoints exponentially interpolated inside
    their buckets. One no-reset window (scrapes 05:05/05:15/05:25,
    strictly inside the [04:30, 06:00) counter epoch) with deltas
    {b0 (0.5,1]: 3, b2 (2,4]: 1, b6 (32,64]: 4, b8 (128,512]…: 5} —
    n_inc 13, CDF(48) = (3+1) + 4·(log2 48 − 5),
    CDF(0.7) = 0 + 3·(log2 0.7 + 1)."""
    import math

    from numalogic_prometheus_spark.plans.promql7 import (
        promql_native_histogram_fraction_rate,
    )

    rows = []
    eid = 0

    def add(ts: str, value: float, k: int = 1) -> None:
        nonlocal eid
        for _ in range(k):
            eid += 1
            rows.append(("svc", _ts(ts), eid, value))

    add("2024-01-01T05:05:00", 0.8, 1)    # b0
    add("2024-01-01T05:05:00", 3.0, 1)    # b2
    add("2024-01-01T05:15:00", 0.8, 1)
    add("2024-01-01T05:15:00", 40.0, 2)   # b6
    add("2024-01-01T05:25:00", 0.8, 2)
    add("2024-01-01T05:25:00", 3.0, 1)
    add("2024-01-01T05:25:00", 40.0, 2)
    add("2024-01-01T05:25:00", 300.0, 5)  # b8 (beyond the hi endpoint)
    spark.createDataFrame(
        rows, "event_type string, ts timestamp, event_id long, value double"
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))

    out = promql_native_histogram_fraction_rate(
        spark, str(tmp_path)
    ).collect()
    assert len(out) == 1
    (row,) = out
    # deltas: b0 cums 1,2,4 → 3; b2 cums 1,1,2 → 1; b6 cums 0,2,4 → 4;
    # b8 cums 0,0,5 → 5 (dense zero back-fill gives first_m cum 0)
    assert row["n_inc"] == 13
    cdf_hi = (3 + 1) + 4 * (math.log2(48.0) - 5)
    cdf_lo = 0 + 3 * (math.log2(0.7) - -1)
    assert row["fraction"] == (cdf_hi - cdf_lo) / 13.0


def test_rate_quantile_fleet_aggregation(spark, tmp_path):
    """histogram_quantile(0.9, sum(rate(...))) golden: two series'
    bucket deltas merge BEFORE the quantile. svc-a contributes
    {idx1: 3}, svc-b {idx1: 1, idx2: 2} → fleet {idx1: 4, idx2: 2},
    total 6, rank 5.4 lands in idx2 with frac (5.4−4)/2 = 0.7."""
    import pytest

    from numalogic_prometheus_spark.plans.promql7 import (
        promql_native_histogram_rate_quantile_agg,
    )

    rows = []
    eid = 0

    def add(svc: str, ts: str, value: float, k: int = 1) -> None:
        nonlocal eid
        for _ in range(k):
            eid += 1
            rows.append((svc, _ts(ts), eid, value))

    add("svc-a", "2024-01-01T05:05:00", 1.5, 1)
    add("svc-a", "2024-01-01T05:25:00", 1.5, 3)   # idx1 cums 1,4 → delta 3
    add("svc-b", "2024-01-01T05:05:00", 3.0, 1)
    add("svc-b", "2024-01-01T05:25:00", 3.0, 2)   # idx2 cums 1,3 → delta 2
    add("svc-b", "2024-01-01T05:25:00", 1.5, 1)   # idx1 cums 0,1 → delta 1
    spark.createDataFrame(
        rows, "event_type string, ts timestamp, event_id long, value double"
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))

    out = promql_native_histogram_rate_quantile_agg(
        spark, str(tmp_path)
    ).collect()
    assert len(out) == 1
    (row,) = out
    assert row["n_inc"] == 6 and row["n_series"] == 2
    assert row["p90_rate"] == pytest.approx(
        2.0 ** (2 - 1) * 2.0 ** ((5.4 - 4.0) / 2.0), abs=1e-9
    )
