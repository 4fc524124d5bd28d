"""Property-based tests (SURVEY.md §5.2 item 3, hypothesis) for the
pure-Python-checkable invariants of the engine's operators, evaluated
through Spark on small generated frames."""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from numalogic_prometheus_spark.operators import metrics as M

_value = st.floats(
    min_value=0.0, max_value=100.0, allow_nan=False, allow_infinity=False
)

_settings = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(values=st.lists(_value, min_size=1, max_size=30))
@_settings
def test_histogram_bucket_count_consistency(spark, values):
    # Σ per-bucket increments == _count, +Inf bucket == total, cumulative
    # monotone — the pinned-dep histogram contract (metrics.py:173-177).
    df = spark.createDataFrame([("k", float(v)) for v in values],
                               "key string, value double")
    out = {r["le"]: r["cum_count"] for r in
           M.histogram_buckets(df, ["key"]).collect()}
    les = sorted(out)
    assert out[float("inf")] == len(values)
    assert all(out[a] <= out[b] for a, b in zip(les, les[1:]))


@given(
    static=st.dictionaries(st.sampled_from("abcd"), st.text("xy", max_size=2),
                           max_size=3),
    dynamic=st.dictionaries(st.sampled_from("abcd"), st.text("xy", max_size=2),
                            max_size=3),
)
@_settings
def test_label_merge_right_bias_property(spark, static, dynamic):
    # merged == {**static, **dynamic} exactly (metrics.py:65-67)
    def to_map(d):
        if not d:
            return F.create_map().cast("map<string,string>")
        pairs = []
        for k, v in d.items():
            pairs += [F.lit(k), F.lit(v)]
        return F.create_map(*pairs)

    row = (
        spark.range(1)
        .select(M.merge_labels(to_map(static), to_map(dynamic)).alias("m"))
        .collect()[0]
    )
    assert (row["m"] or {}) == {**static, **dynamic}


@given(values=st.lists(_value, min_size=2, max_size=20))
@_settings
def test_gauge_is_last_by_ts_not_max_value(spark, values):
    rows = [("k", i, float(v)) for i, v in enumerate(values)]
    df = spark.createDataFrame(rows, "key string, ts long, value double")
    out = M.gauge_latest(df, ["key"]).collect()[0]
    assert math.isclose(out["gauge_value"], values[-1])
    assert out["last_ts"] == len(values) - 1
