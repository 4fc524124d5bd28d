"""Golden-semantics pins for the round-7 PromQL range functions
(plans/promql3.py). The DuckDB oracles share each query's grid/window
arithmetic, so parity alone cannot catch a shared boundary bug — these
tests hand-compute the expected outputs on crafted series instead."""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

import pytest

US = 1_000_000
GRID_S = 900


def _ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


def _epoch_us(dt: datetime) -> int:
    # naive datetimes are UTC here (the session pins UTC; .timestamp()
    # alone would reinterpret them in the host's local zone)
    return int(dt.replace(tzinfo=timezone.utc).timestamp() * US)


@pytest.fixture()
def presence_fixture(spark, tmp_path):
    """Series 'svc': one sample exactly ON a 15-min grid boundary
    (00:00:00) and one strictly inside a grid cell (02:10:30)."""
    t0 = _ts("2024-01-01T00:00:00")
    rows = [
        ("svc", t0, 1, 1.0),
        ("svc", _ts("2024-01-01T02:10:30"), 2, 2.0),
    ]
    df = spark.createDataFrame(
        rows, "event_type string, ts timestamp, event_id long, value double"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    return t0


def test_present_over_time_left_open_boundary(spark, tmp_path, presence_fixture):
    """A sample at grid point t is present at evaluations t..t+45min but
    NOT at t+1h — the lookback is the left-open (t−1h, t] of Prometheus
    3.x range selectors. A mid-cell sample first appears at the ceil'd
    next grid point."""
    from numalogic_prometheus_spark.plans.promql3 import (
        promql_present_over_time,
    )

    t0 = presence_fixture
    got = {
        r["eval_us"]
        for r in promql_present_over_time(spark, str(tmp_path)).collect()
    }
    # sample@00:00 covers 00:00, 00:15, 00:30, 00:45 (itself is ON the
    # grid, so k0 = its own point); sample@02:10:30 ceils to 02:15 and
    # covers 02:15 .. 03:00.
    expect = {
        _epoch_us(t0 + timedelta(seconds=GRID_S * k)) for k in (0, 1, 2, 3)
    } | {
        _epoch_us(t0 + timedelta(seconds=GRID_S * k)) for k in (9, 10, 11, 12)
    }
    assert got == expect
    # the left-open edge: eval at 01:00 (= sample ts + exactly 1h) must
    # NOT see the 00:00 sample.
    assert _epoch_us(t0 + timedelta(hours=1)) not in got


def test_absent_over_time_complements_spine(spark, tmp_path, presence_fixture):
    """absent = the evaluation spine (first covered point .. last covered
    point) minus the present set: here the 5 points 01:00 .. 02:00."""
    from numalogic_prometheus_spark.plans.promql3 import (
        promql_absent_over_time,
    )

    t0 = presence_fixture
    rows = promql_absent_over_time(spark, str(tmp_path)).collect()
    assert all(r["event_type"] == "svc" and r["absent"] == 1 for r in rows)
    got = {r["eval_us"] for r in rows}
    expect = {
        _epoch_us(t0 + timedelta(seconds=GRID_S * k)) for k in (4, 5, 6, 7, 8)
    }
    assert got == expect


def test_mad_over_time_hand_computed(spark, tmp_path):
    """Trailing-1h MAD on crafted series, covering: singleton windows,
    the left-open (t−1h, t] range frame (a sample exactly 1h back is
    NOT a peer — the unified r8 engine convention, rangeBetween(−1h+1µs,
    0)), duplicate-timestamp peers, and even-count median interpolation
    landing on the quarter-cent grid."""
    from numalogic_prometheus_spark.plans.promql3 import promql_mad_over_time

    t0 = _ts("2024-01-01T00:00:00")
    rows = [
        # series a: windows {1}, {1,3}, then {3,2} — the t0 sample is
        # exactly 3600s back from event 3 and falls OUTSIDE the
        # left-open window; then an isolated sample with an empty
        # lookback besides itself
        ("a", t0, 1, 1.0),
        ("a", t0 + timedelta(seconds=1800), 2, 3.0),
        ("a", t0 + timedelta(seconds=3600), 3, 2.0),
        ("a", t0 + timedelta(seconds=7300), 4, 10.0),
        # series b: two samples at the SAME timestamp — RANGE peers, both
        # anchors see both values
        ("b", t0, 5, 1.0),
        ("b", t0, 6, 3.0),
        # series c: even-count window with interpolated medians
        ("c", t0, 7, 0.0),
        ("c", t0 + timedelta(seconds=600), 8, 1.0),
        ("c", t0 + timedelta(seconds=1200), 9, 1.01),
        ("c", t0 + timedelta(seconds=1800), 10, 3.01),
    ]
    df = spark.createDataFrame(
        rows, "event_type string, ts timestamp, event_id long, value double"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    got = {
        r["event_id"]: r["mad_1h"]
        for r in promql_mad_over_time(spark, str(tmp_path))
        .join(
            df.select("event_type", "event_id"),
            ["event_type", "event_id"],
        )
        .collect()
    }
    assert got == {
        1: 0.0,  # {100}: med 100, deviations {0}
        2: 1.0,  # {100,300}: med 200, deviations {100,100}
        3: 0.5,  # {300,200} (t0 excluded, left-open): med 250, dev {50,50}
        4: 0.0,  # singleton window
        5: 1.0,  # peers {100,300} at same ts
        6: 1.0,
        7: 0.0,
        8: 0.5,  # {0,100}: med 50, deviations {50,50}
        9: 0.01,  # {0,100,101}: med 100, deviations sorted {0,1,100} -> 1
        10: 0.505,  # {0,100,101,301}: med 100.5, dev sorted
        #            {0.5,0.5,100.5,200.5} -> (0.5+100.5)/2 = 50.5 cents
    }

    # the quantile_cont oracle must agree on the crafted duplicates /
    # interpolation fixture too (independent formulation of both medians)
    from tests.oracle_harness import compare_crafted

    compare_crafted(spark, tmp_path, "promql_mad_over_time")


def test_quantile_over_time_sliding_hand_computed(spark, tmp_path):
    """Sliding p95/p50 on crafted series: R-7 interpolation (rank =
    φ(n−1), v_lo + (v_hi−v_lo)·frac), the left-open (t−1h, t] edge
    (sample exactly 1h back excluded), singleton windows, and a
    4-element window where both quantiles interpolate strictly between
    elements."""
    from numalogic_prometheus_spark.plans.promql3 import (
        promql_quantile_over_time_sliding,
    )

    t0 = _ts("2024-01-01T00:00:00")
    rows = [
        ("a", t0, 1, 1.0),
        ("a", t0 + timedelta(seconds=1800), 2, 3.0),
        # exactly 3600s after t0: the t0 sample is OUTSIDE (left-open)
        ("a", t0 + timedelta(seconds=3600), 3, 2.0),
        ("c", t0, 7, 0.0),
        ("c", t0 + timedelta(seconds=600), 8, 1.0),
        ("c", t0 + timedelta(seconds=1200), 9, 1.01),
        ("c", t0 + timedelta(seconds=1800), 10, 3.01),
    ]
    df = spark.createDataFrame(
        rows, "event_type string, ts timestamp, event_id long, value double"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    got = {
        r["event_id"]: (r["q95_1h"], r["q50_1h"])
        for r in promql_quantile_over_time_sliding(
            spark, str(tmp_path)
        ).collect()
    }
    assert got == {
        1: (1.0, 1.0),      # {100}
        2: (2.9, 2.0),      # {100,300}: 100+200*.95 / 100+200*.5
        3: (2.95, 2.5),     # {200,300} (t0 excluded): 200+100*.95 / 250
        7: (0.0, 0.0),      # {0}
        8: (0.95, 0.5),     # {0,100}
        9: (1.009, 1.0),    # {0,100,101}: rank95=1.9 -> 100+1*.9 = 100.9;
        #                     q50 rank=1.0 -> exactly the middle, 100
        10: (2.71, 1.005),  # {0,100,101,301}: 101+200*.85 / 100+1*.5
    }

    from tests.oracle_harness import compare_crafted

    compare_crafted(spark, tmp_path, "promql_quantile_over_time_sliding")
