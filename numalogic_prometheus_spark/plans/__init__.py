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

# ROUND-3 ROTATION (VERDICT r2 next-round #1): the driver verifies the
# first 50 entries of queries(); rounds 1+2 verified 98 of 148 with zero
# mismatches, leaving exactly these 50 without a driver row (the round-2
# session-2 tail). They are pinned to positions 1-50 for the round-3 run.
# Cumulative driver coverage after this run: 148/148.
# ROUND-4 PLAN: drop this list (or repopulate it with the round-3
# additions + any red rows) once CORRECTNESS_r03 lands; per COVERAGE.md
# every entry must get a driver row within two rounds of registration.
_CHECK_FIRST = (
    "mllib_minmax_scaler",
    "mllib_brp_lsh_neighbors",
    "mllib_kmeans_profiles",
    "counter_monotonic_guard",
    "exposition_all_families",
    "promql_clamp_values",
    "promql_absent_series",
    "promql_irate_last_delta",
    "promql_predict_linear",
    "promql_sort_desc",
    "promql_count_values",
    "promql_bottomk_users",
    "promql_offset_day_over_day",
    "promql_delta_gauge",
    "tpch_q6_forecast_revenue",
    "tpch_q4_order_priority",
    "tpch_q7_nation_volume",
    "tpch_q14_promo_revenue",
    "tpch_q15_top_supplier",
    "tpch_q16_supplier_part_counts",
    "tpch_q18_large_volume_customers",
    "tpch_q19_discounted_revenue",
    "tpch_q22_dormant_high_balance",
    "ts_step_resample",
    "ts_linear_interpolate",
    "ts_ohlc_hourly",
    "ts_sessionize_gap",
    "ts_ewma_irregular",
    "ts_holt_winters_level_trend",
    "vec_ivf_topk",
    "vec_range_search",
    "text_ngram_jaccard_pairs",
    "text_token_accounting",
    "dedup_cdc_chunk_pairs",
    "pipeline_text_cleaning",
    "stream_stream_join",
    "stream_topk_event_types",
    "ml_seasonal_zscore",
    "ml_conformal_threshold",
    "join_salted_skew",
    "multimodal_frame_sample",
    "agg_hll_mergeable_daily",
    "funnel_view_click_purchase",
    "scd2_event_type_intervals",
    "join_interval_bucketed",
    "sample_stratified_hash",
    "sample_mixture_epochs",
    "sample_split_train_val_test",
    "sample_topk_hash_per_source",
    "pack_sequences_contiguous",
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
