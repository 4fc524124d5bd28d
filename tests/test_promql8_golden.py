"""Golden pins for plans/promql8.py on crafted fixtures.

The shipped testdata is NULL-free, all-positive-heavy and never puts
two samples of one series at the same value, so it can't exercise the
edges that define these operators: ln/sqrt gating at zero and negative
inputs (PromQL NaN vs DuckDB raise — both engines must emit NULL),
sgn at exactly zero, comparison equality exactly ON the literal,
ts_of_* value ties (Go's >=/<= ascending scan → LATEST timestamp
wins), and the tf-major tfidf selection rule at a tf tie broken by
rarity. Every case is pinned against a hand computation AND the
DuckDB twin on the same crafted table (compare_crafted)."""

from __future__ import annotations

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


def test_math_functions_gating_and_sgn(spark, tmp_path):
    from numalogic_prometheus_spark.plans.promql8 import (
        promql_math_functions,
    )

    t = datetime(2024, 3, 1)
    rows = [
        (1, t, 1, "a", -4.0, "{}"),   # negative: sqrt/ln NULL, sgn -1
        (2, t, 2, "a", 0.0, "{}"),    # zero: sqrt 0, ln NULL, sgn 0
        (3, t, 3, "a", 6.25, "{}"),   # positive: sqrt exact 2.5
        (4, t, 4, "a", 1.0, "{}"),    # ln(1) = 0 exactly
    ]
    _write_events(spark, tmp_path, rows)
    got = {
        r["user_id"]: r
        for r in promql_math_functions(spark, str(tmp_path)).collect()
    }
    assert got[1]["sqrt_v"] is None and got[1]["ln_v"] is None
    assert got[1]["sgn_v"] == -1.0 and got[1]["abs_v"] == 4.0
    assert got[2]["sqrt_v"] == 0.0 and got[2]["ln_v"] is None
    assert got[2]["sgn_v"] == 0.0
    assert got[3]["sqrt_v"] == 2.5 and got[3]["sgn_v"] == 1.0
    assert got[4]["ln_v"] == 0.0
    # ceil/floor bracket the value; rad/deg round-trip the sign
    assert got[3]["ceil_v"] == 7.0 and got[3]["floor_v"] == 6.0
    assert got[1]["rad_v"] < 0 < got[3]["deg_v"]
    compare_crafted(spark, tmp_path, "promql_math_functions")


def test_comparison_bool_boundary_on_literal(spark, tmp_path):
    from numalogic_prometheus_spark.plans.promql8 import (
        promql_comparison_bool,
    )

    t = datetime(2024, 3, 1)
    rows = [
        (1, t, 1, "a", 30.0, "{}"),   # exactly ON: ge/eq yes, gt no
        (2, t, 2, "a", 30.01, "{}"),  # one cent above: gt yes
        (3, t, 3, "a", 29.99, "{}"),  # one cent below: none
        # stale sample ABOVE the threshold superseded by one below —
        # the instant vector must use the latest sample only
        (4, t, 4, "a", 99.0, "{}"),
        (5, t + timedelta(minutes=1), 4, "a", 1.0, "{}"),
    ]
    _write_events(spark, tmp_path, rows)
    (row,) = promql_comparison_bool(spark, str(tmp_path)).collect()
    assert row["n_series"] == 4
    assert row["n_gt_bool"] == 1          # only 30.01
    assert row["n_ge_bool"] == 2          # 30.00 and 30.01
    assert row["n_eq_bool"] == 1          # 30.00
    assert row["n_ne_bool"] == 3
    assert row["sum_filtered"] == 30.01   # filter keeps the value
    compare_crafted(spark, tmp_path, "promql_comparison_bool")


def test_scalar_binop_ratio(spark, tmp_path):
    from numalogic_prometheus_spark.plans.promql8 import (
        promql_scalar_binop,
    )

    t = datetime(2024, 3, 1)
    # series values 10, 20, 30 -> mean 20; ratios 0.5, 1.0, 1.5
    rows = [
        (1, t, 1, "a", 10.0, "{}"),
        (2, t, 2, "a", 20.0, "{}"),
        (3, t, 3, "a", 30.0, "{}"),
    ]
    _write_events(spark, tmp_path, rows)
    got = {
        r["user_id"]: r
        for r in promql_scalar_binop(spark, str(tmp_path)).collect()
    }
    assert all(r["scalar_mean"] == 20.0 for r in got.values())
    assert [got[u]["ratio_to_mean"] for u in (1, 2, 3)] == [0.5, 1.0, 1.5]
    assert all(r["vector_one"] == 1.0 for r in got.values())
    compare_crafted(spark, tmp_path, "promql_scalar_binop")


def test_ts_of_ties_resolve_to_latest(spark, tmp_path):
    from numalogic_prometheus_spark.plans.promql8 import (
        promql_ts_of_over_time,
    )

    t = datetime(2024, 3, 1)

    def us(dt):
        return int(dt.timestamp() * 1_000_000)

    rows = [
        # max value 50 occurs twice: ts_of_max must be the LATER one
        (1, t, 1, "a", 50.0, "{}"),
        (2, t + timedelta(minutes=5), 1, "a", 7.0, "{}"),
        (3, t + timedelta(minutes=10), 1, "a", 50.0, "{}"),
        # min value 7 occurs twice: ts_of_min must be the LATER one
        (4, t + timedelta(minutes=15), 1, "a", 7.0, "{}"),
        (5, t + timedelta(minutes=20), 1, "a", 9.0, "{}"),
    ]
    _write_events(spark, tmp_path, rows)
    (row,) = promql_ts_of_over_time(spark, str(tmp_path)).collect()
    assert row["ts_of_max"] == us(t + timedelta(minutes=10))
    assert row["ts_of_min"] == us(t + timedelta(minutes=15))
    assert row["ts_of_last"] == us(t + timedelta(minutes=20))
    assert row["max_v"] == 50.0 and row["min_v"] == 7.0
    compare_crafted(spark, tmp_path, "promql_ts_of_over_time")


def test_tfidf_tf_major_rule(spark, tmp_path):
    from numalogic_prometheus_spark.plans.text5 import text_tfidf_topterms

    docs = [
        # doc 0: 'x' tf=3; 'rare'/'common' tf=1 tie broken by df
        (0, "x x x rare common", "en", "s", 18),
        (1, "common common y", "en", "s", 15),
        (2, "common z z", "en", "s", 10),
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string,"
        " n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    rows = text_tfidf_topterms(spark, str(tmp_path)).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    d0 = sorted(by_doc[0], key=lambda r: r["rank"])
    # tf-major: x (tf 3) first; then the tf=1 tie goes to the RARER
    # term (rare df=1 beats common df=3)
    assert [r["term"] for r in d0] == ["x", "rare", "common"]
    assert [r["tf"] for r in d0] == [3, 1, 1]
    assert [r["df"] for r in d0] == [1, 1, 3]
    assert all(len(v) <= 3 for v in by_doc.values())
    compare_crafted(spark, tmp_path, "text_tfidf_topterms")
