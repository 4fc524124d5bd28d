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

# ROUND-5 ROTATION (VERDICT r3 next-round #1; round 4 stalled before the
# planned rotation landed, so the r4 run re-checked the r3 window). The
# driver verifies the first 50 entries of queries(). This window holds:
#   * the 39 round-3 registrations still without a driver row (positions
#     1-39, flagship curation surface first),
#   * 5 round-5 additions (PromQL set ops + group_right, streaming
#     counter-reset rate) so they ship WITH verification, per the
#     COVERAGE.md two-round promise,
#   * 6 long-green sentinels from earlier rounds to catch regressions.
# Cumulative driver coverage after this run: 187 r3-era + 5 new = all.
_CHECK_FIRST = (
    # -- flagship curation surface (round-3, unchecked) --
    "pipeline_curation_verdicts",
    "dedup_substring_spans",
    "dedup_semantic_survivors",
    "text_contamination_eval_overlap",
    "vec_int8_quantized_topk",
    # -- promql2 family (round-3, unchecked) --
    "promql_vector_ratio_on",
    "promql_vector_ratio_ignoring",
    "promql_vector_share_group_left",
    "promql_sum_over_time",
    "promql_avg_over_time",
    "promql_min_over_time",
    "promql_max_over_time",
    "promql_count_over_time",
    "promql_stdvar_over_time",
    "promql_stddev_over_time",
    "promql_last_over_time",
    "promql_resets_per_series",
    "promql_changes_per_series",
    "promql_subquery_max_rate",
    # -- tpch3 (round-3, unchecked) --
    "tpch_q2_min_cost_supplier",
    "tpch_q8_market_share",
    "tpch_q9_product_profit",
    "tpch_q11_important_inventory",
    "tpch_q12_late_shipment_priority",
    "tpch_q13_customer_distribution",
    "tpch_q17_small_quantity_revenue",
    "tpch_q20_heavy_shippers",
    "tpch_q21_sole_late_supplier",
    # -- rollups / quality / text3 / vectors3 / sampling (round-3) --
    "rollup_daily_from_hourly",
    "rollup_monthly_from_hourly",
    "rollup_quantile_sketch_daily",
    "text_bm25_topk",
    "quality_repetition_stats",
    "quality_gopher_verdict",
    "quality_pii_redaction",
    "quality_constraint_checks",
    "text_unigram_logprob",
    "vec_ann_tuned_topk",
    "sample_quality_weighted",
    # -- round-5 additions (registered this round, verified this round) --
    "promql_and_intersection",
    "promql_or_union",
    "promql_unless_difference",
    "promql_ratio_group_right",
    "stream_counter_rate",
    # -- green sentinels (driver-green in earlier rounds) --
    "counter_monotonic_guard",
    "tpch_q6_forecast_revenue",
    "promql_irate_last_delta",
    "ts_linear_interpolate",
    "join_salted_skew",
    "vec_ivf_topk",
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
