"""Golden + property pins for plans/promql6.py.

The double_exponential_smoothing recurrence has three edge regimes the
shipped testdata can't isolate: a singleton series (must emit nothing),
an exactly-two-sample series (the seed row: trend stays v2−v1, the
trend update must NOT run at the second sample), and a timestamp tie
(event_id tiebreak changes v1/v2 and therefore every downstream
value). Each is pinned against a hand-computed expectation AND against
the RECURSIVE-CTE oracle on the same crafted table (compare_crafted).

The property test re-implements the recurrence in the structural shape
of Prometheus's functions.go (an explicit calcTrendValue helper called
with i−1, state rotated exactly as the Go loop does) and checks the
registered kernel agrees bit-for-bit on pseudo-random series — so a
mapping error between the Go loop and the registry's streamlined
formulation would surface even where the goldens are too small."""

from __future__ import annotations

import math
import random
from datetime import datetime, timedelta

from tests.oracle_harness import compare_crafted

_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def _write_events(spark, tmp_path, rows) -> None:
    spark.createDataFrame(rows, _SCHEMA).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )


def _prometheus_des(values, sf=0.3, tf=0.1):
    """Literal transcription of promql/functions.go's smoothing loop
    (s0/s1 state rotation, calcTrendValue called with i−1), except the
    1−sf / 1−tf coefficients are the 0.7 / 0.9 double LITERALS the
    registry and oracle share (plans/promql6.py module docstring)."""

    def calc_trend(i, s0, s1, b):
        if i == 0:
            return b
        return tf * (s1 - s0) + 0.9 * b

    s0, s1 = 0.0, values[0]
    b = values[1] - values[0]
    for i in range(1, len(values)):
        x = sf * values[i]
        b = calc_trend(i - 1, s0, s1, b)
        y = 0.7 * (s1 + b)
        s0, s1 = s1, x + y
    return s1, b


def test_des_edge_semantics(spark, tmp_path):
    from numalogic_prometheus_spark.plans.promql6 import (
        promql_double_exponential_smoothing,
    )

    t = datetime(2024, 3, 1)
    rows = [
        # series "solo": single sample → must emit NOTHING
        (1, t, 1, "solo", 5.0, "{}"),
        # series "pair": exactly two samples → seed row only:
        # trend = v2 - v1, smoothed = 0.3*v2 + 0.7*(v1 + (v2 - v1))
        (2, t, 1, "pair", 10.0, "{}"),
        (3, t + timedelta(hours=1), 1, "pair", 16.0, "{}"),
        # series "tie": two samples at the SAME ts → event_id order
        # decides which is v1; a wrong tiebreak flips the trend sign
        (5, t, 1, "tie", 8.0, "{}"),
        (4, t, 1, "tie", 2.0, "{}"),
        # series "walk": 4 samples through the full recurrence
        (6, t, 1, "walk", 1.0, "{}"),
        (7, t + timedelta(hours=1), 1, "walk", 3.0, "{}"),
        (8, t + timedelta(hours=2), 1, "walk", 2.0, "{}"),
        (9, t + timedelta(hours=3), 1, "walk", 6.0, "{}"),
    ]
    _write_events(spark, tmp_path, rows)

    got = {
        r["event_type"]: (r["n_samples"], r["smoothed"], r["trend"])
        for r in promql_double_exponential_smoothing(
            spark, str(tmp_path)
        ).collect()
    }
    assert "solo" not in got
    # pair: seed only — trend unchanged from init
    assert got["pair"] == (2, 0.3 * 16.0 + 0.7 * (10.0 + 6.0), 6.0)
    # tie: event_id 4 (value 2.0) is v1, event_id 5 (8.0) is v2
    assert got["tie"] == (2, 0.3 * 8.0 + 0.7 * (2.0 + 6.0), 6.0)
    # walk: independently-shaped reference loop
    s, b = _prometheus_des([1.0, 3.0, 2.0, 6.0])
    assert got["walk"] == (4, s, b)
    compare_crafted(spark, tmp_path, "promql_double_exponential_smoothing")


def test_des_matches_go_shaped_reference_on_random_series(spark, tmp_path):
    from numalogic_prometheus_spark.plans.promql6 import (
        promql_double_exponential_smoothing,
    )

    rng = random.Random(20240315)
    t0 = datetime(2024, 3, 1)
    rows, expected = [], {}
    eid = 0
    for series in range(12):
        n = rng.randint(2, 40)
        values = [round(rng.uniform(-50, 50), 4) for _ in range(n)]
        for i, v in enumerate(values):
            eid += 1
            rows.append(
                (eid, t0 + timedelta(minutes=i), series, f"s{series}", v, "{}")
            )
        s, b = _prometheus_des(values)
        expected[f"s{series}"] = (n, s, b)
    _write_events(spark, tmp_path, rows)

    got = {
        r["event_type"]: (r["n_samples"], r["smoothed"], r["trend"])
        for r in promql_double_exponential_smoothing(
            spark, str(tmp_path)
        ).collect()
    }
    assert got == expected  # bit-exact, no tolerance
    for (n, s, b) in got.values():
        assert math.isfinite(s) and math.isfinite(b) and n >= 2
    compare_crafted(spark, tmp_path, "promql_double_exponential_smoothing")


def test_histogram_avg_family(spark, tmp_path):
    from numalogic_prometheus_spark.plans.promql6 import promql_histogram_avg

    t = datetime(2024, 3, 1)
    rows = [
        # (a, 1): count 3, sum 6.00 → avg 2.00 exactly
        (1, t, 1, "a", 1.25, "{}"),
        (2, t, 1, "a", 1.75, "{}"),
        (3, t, 1, "a", 3.00, "{}"),
        # (a, 2): singleton — avg == the sample
        (4, t, 2, "a", 0.07, "{}"),
        # (b, 1): a non-terminating ratio (1/3) must match the oracle's
        # identical sum_cents ÷ n ÷ 100.0 operand order unrounded
        (5, t, 1, "b", 0.01, "{}"),
        (6, t, 1, "b", 0.01, "{}"),
        (7, t, 1, "b", 0.01, "{}"),
    ]
    _write_events(spark, tmp_path, rows)

    got = {
        (r["event_type"], r["user_id"]): (
            r["hist_count"], r["hist_sum"], r["hist_avg"]
        )
        for r in promql_histogram_avg(spark, str(tmp_path)).collect()
    }
    assert got[("a", 1)] == (3, 6.00, 2.00)
    assert got[("a", 2)] == (1, 0.07, 0.07)
    assert got[("b", 1)] == (3, 0.03, 3 / 3 / 100.0)
    compare_crafted(spark, tmp_path, "promql_histogram_avg")
