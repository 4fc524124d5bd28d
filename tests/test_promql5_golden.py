"""Golden pins for plans/promql5.py on crafted fixtures: the shipped
testdata can't force the @-modifier's edge semantics (a sample exactly
AT the pinned instant, a tie at T, a series missing the offset
operand), so this fixture does — and the DuckDB twin must agree on the
same crafted table (compare_crafted), proving the one-scan
conditional-struct-max plan equals the oracle's two-pass row_number
form on the edges, not just on smooth data."""

from __future__ import annotations

from datetime import datetime

from tests.oracle_harness import compare_crafted

_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def _write_events(spark, tmp_path, rows) -> None:
    spark.createDataFrame(rows, _SCHEMA).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )


def test_at_modifier_edges(spark, tmp_path):
    from numalogic_prometheus_spark.plans.promql5 import promql_at_modifier

    rows = [
        # series "a": tie exactly AT T (2024-01-15) → event_id 3 wins;
        # the sample 1µs after T must be invisible to the @ selection
        (1, datetime(2024, 1, 14), 7, "a", 1.00, "{}"),
        (2, datetime(2024, 1, 15), 7, "a", 2.00, "{}"),
        (3, datetime(2024, 1, 15), 7, "a", 3.00, "{}"),
        (4, datetime(2024, 1, 15, 0, 0, 0, 1), 7, "a", 9.99, "{}"),
        # series "b": exists at T but has NO sample <= T-1d → the
        # offset operand is missing, so the series drops out entirely
        (5, datetime(2024, 1, 14, 12), 7, "b", 5.00, "{}"),
        # series "c": one sample before T-1d serves BOTH operands
        (6, datetime(2024, 1, 13, 23, 59, 59), 7, "c", 4.00, "{}"),
    ]
    _write_events(spark, tmp_path, rows)

    got = {
        r["event_type"]: (r["value_at"], r["value_at_offset"], r["delta_1d"])
        for r in promql_at_modifier(spark, str(tmp_path)).collect()
    }
    assert got == {
        "a": (3.00, 1.00, 2.00),
        "c": (4.00, 4.00, 0.00),
    }
    compare_crafted(spark, tmp_path, "promql_at_modifier")


def test_agg_family_latest_then_aggregate(spark, tmp_path):
    from numalogic_prometheus_spark.plans.promql5 import promql_agg_family

    rows = [
        # (a, u1): stale 9.0 must lose to the later 2.0
        (1, datetime(2024, 1, 10), 1, "a", 9.00, "{}"),
        (2, datetime(2024, 1, 20), 1, "a", 2.00, "{}"),
        # (a, u2): ts tie → event_id 4 wins with 4.0
        (3, datetime(2024, 1, 20), 2, "a", 7.00, "{}"),
        (4, datetime(2024, 1, 20), 2, "a", 4.00, "{}"),
        # (b, u1): singleton series
        (5, datetime(2024, 1, 5), 1, "b", 10.00, "{}"),
    ]
    _write_events(spark, tmp_path, rows)

    got = {r["event_type"]: r.asDict() for r in
           promql_agg_family(spark, str(tmp_path)).collect()}
    a = got["a"]
    assert (a["sum_v"], a["min_v"], a["max_v"]) == (6.00, 2.00, 4.00)
    assert (a["avg_v"], a["count_series"], a["group_one"]) == (3.00, 2, 1)
    b = got["b"]
    assert (b["sum_v"], b["min_v"], b["max_v"]) == (10.00, 10.00, 10.00)
    assert (b["avg_v"], b["count_series"], b["group_one"]) == (10.00, 1, 1)
    compare_crafted(spark, tmp_path, "promql_agg_family")
