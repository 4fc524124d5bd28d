"""Golden pins for plans/funnel.py on crafted fixtures.

The shipped testdata has every user emitting every event type many
times over, so every user trivially completes the funnel — it can't
exercise the ORDERING rules that define the operator: a view BEFORE
any signup must not count (and a later view must), a purchase before
the first qualifying view must not count, equal-ts stage pairs resolve
by event_id, and users stalling at each stage land in the right
counter. Cohort: a user active before their signup day must not
produce negative week indexes, and the week-9+ tail is capped. Each
case is pinned against a hand computation AND the DuckDB twin
(compare_crafted)."""

from __future__ import annotations

from datetime import datetime, timedelta

from tests.oracle_harness import compare_crafted

_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def _write(spark, tmp_path, rows) -> None:
    spark.createDataFrame(rows, _SCHEMA).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )


def test_funnel_ordering_rules(spark, tmp_path):
    from numalogic_prometheus_spark.plans.funnel import (
        funnel_signup_view_purchase,
    )

    t = datetime(2024, 3, 1)
    m = lambda k: t + timedelta(minutes=k)  # noqa: E731
    rows = [
        # user 1: full funnel in order -> converts in 20 min
        (1, m(0), 1, "signup", 1.0, "{}"),
        (2, m(10), 1, "view", 1.0, "{}"),
        (3, m(20), 1, "purchase", 1.0, "{}"),
        # user 2: view BEFORE signup (doesn't count), no later view ->
        # stalls at signup; the purchase can't count either
        (4, m(0), 2, "view", 1.0, "{}"),
        (5, m(5), 2, "signup", 1.0, "{}"),
        (6, m(9), 2, "purchase", 1.0, "{}"),
        # user 3: purchase BEFORE the qualifying view -> stalls at view
        (7, m(0), 3, "signup", 1.0, "{}"),
        (8, m(1), 3, "purchase", 1.0, "{}"),
        (9, m(2), 3, "view", 1.0, "{}"),
        # user 4: never signs up -> counted in n_users only
        (10, m(0), 4, "click", 1.0, "{}"),
        # user 5: signup and view at the SAME ts — event_id order makes
        # the view qualify; purchase converts in 8 min
        (11, m(0), 5, "signup", 1.0, "{}"),
        (12, m(0), 5, "view", 1.0, "{}"),
        (13, m(8), 5, "purchase", 1.0, "{}"),
    ]
    _write(spark, tmp_path, rows)
    (row,) = funnel_signup_view_purchase(spark, str(tmp_path)).collect()
    assert row["n_users"] == 5
    assert row["n_signup"] == 4               # users 1, 2, 3, 5
    assert row["n_view_after_signup"] == 3    # users 1, 3, 5
    assert row["n_purchase_after_view"] == 2  # users 1, 5
    # converters: user 1 in 20 min, user 5 in 8 min
    assert row["sum_convert_us"] == (20 + 8) * 60 * 1_000_000
    assert row["mean_convert_us"] == row["sum_convert_us"] / 2
    compare_crafted(spark, tmp_path, "funnel_signup_view_purchase")


def test_cohort_retention_windows(spark, tmp_path):
    from numalogic_prometheus_spark.plans.funnel import (
        cohort_retention_weekly,
    )

    t = datetime(2024, 3, 1)  # midnight UTC
    d = lambda k: t + timedelta(days=k)  # noqa: E731
    rows = [
        # user 1: signs up day 0, active day 0 (week 0), day 8
        # (week 1), day 70 (week 10 -> capped out)
        (1, d(0), 1, "signup", 1.0, "{}"),
        (2, d(8), 1, "click", 1.0, "{}"),
        (3, d(70), 1, "click", 1.0, "{}"),
        # user 2: ACTIVE BEFORE signup (day 1 activity, day 3 signup):
        # the pre-signup event must not create a negative week; the
        # signup itself is week-0 activity
        (4, d(1), 2, "click", 1.0, "{}"),
        (5, d(3), 2, "signup", 1.0, "{}"),
        (6, d(11), 2, "click", 1.0, "{}"),  # day 8 after signup -> week 1
        # user 3: never signs up -> no cohort rows at all
        (7, d(2), 3, "click", 1.0, "{}"),
    ]
    _write(spark, tmp_path, rows)
    got = {
        (r["cohort_day"], r["week_idx"]): (r["n_active"], r["n_cohort"],
                                           r["retention"])
        for r in cohort_retention_weekly(spark, str(tmp_path)).collect()
    }
    day0 = int(t.timestamp()) // 86_400
    # cohort day0: week 0 and week 1 active (day-70 event is week 10,
    # beyond the cap -> absent)
    assert got[(day0, 0)] == (1, 1, 1.0)
    assert got[(day0, 1)] == (1, 1, 1.0)
    assert (day0, 10) not in got
    # cohort day3 (user 2): signup-day activity week 0, day-11 week 1;
    # no negative week from the pre-signup event
    assert got[(day0 + 3, 0)] == (1, 1, 1.0)
    assert got[(day0 + 3, 1)] == (1, 1, 1.0)
    assert all(w >= 0 for (_, w) in got)
    assert len(got) == 4
    compare_crafted(spark, tmp_path, "cohort_retention_weekly")
