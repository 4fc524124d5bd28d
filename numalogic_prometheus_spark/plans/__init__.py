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
    "promql3",
    "profiling",
)

# ROUND-7 ROTATION (VERDICT r6 next-round #1 and #8). The driver verifies
# the first 50 entries of queries(). This window holds:
#   * the 2 round-6 late registrations that missed the r6 check window
#     (promql_alert_firing, dedup_incremental_batch — registered after
#     commit 3d5b3d6 froze the window; their first driver rows land here,
#     closing the registry at 195/195 checked at least once),
#   * promql_rate_extrapolated — its first-sample delta semantics changed
#     this round (ADVICE r6 medium: NULL raw_delta no longer contributes
#     the counter value as a phantom reset; zero-clamp now applied after
#     the 1.1x-threshold substitution, matching promql/functions.go), so
#     the green r6 row no longer covers the shipped code,
#   * agg_approx_distinct — graduated rows-only -> oracle-backed via the
#     KMV route this round; first hash check,
#   * the 6 queries REGISTERED this round (present/absent/mad_over_time,
#     plans/promql3.py; profile_column_stats + profile_drift_halves,
#     plans/profiling.py; sample_split_by_cluster, plans/sampling.py) —
#     in-window from day one so no entry ever again ships without a
#     driver row (displacing join_cross_small, scalar_string_funcs,
#     win_first_last_nth, exposition_full_registry, agg_cube_flag_status,
#     project_computed to the round-8 stale pool; their families stay
#     represented in-window),
#   * 4 queries whose PLANS changed in round 7 (Q5/Q7 early fact-prune
#     reorder, shingle dedup single-materialization, Q21's
#     one-agg-instead-of-anti-join rewrite — displacing sort_global_topk;
#     top-k family stays via win_topk_per_group/promql_topk) — values
#     verified locally at sf0.001+sf0.01, but their cumulative green
#     rows predate the shipped plans, so they re-green here (displacing
#     scalar_math_funcs, win_rank_variants, join_left_outer_order_counts
#     to the round-8 stale pool — their families stay represented),
#   * ~6 diverse long-green sentinels (same set as r6: a TPC-H, a
#     curation, an ANN, a streaming twin, a rollup, the counter guard),
#   * the ~37 stalest entries — the rest of the round-1/2 pool gets
#     re-greened before anything seen more recently.
_CHECK_FIRST = (
    # -- the two never-driver-checked round-6 registrations --
    "promql_alert_firing",
    "dedup_incremental_batch",
    # -- semantics changed this round; r6 green row is stale --
    "promql_rate_extrapolated",
    # -- graduated rows-only -> oracle-backed this round --
    "agg_approx_distinct",
    # -- new round-7 registrations (inside the window from day one, per
    # VERDICT r6 #1: no entry ships without a driver row again) --
    "promql_present_over_time",
    "promql_absent_over_time",
    "promql_mad_over_time",
    "profile_column_stats",
    "profile_drift_halves",
    "sample_split_by_cluster",
    # -- plan changed this round (values verified locally at two SFs,
    # but the cumulative green rows predate the shipped plans): Q5/Q7
    # early fact-prune reorder, shingle dedup single-materialization --
    "tpch_q5_region_volume",
    "tpch_q7_nation_volume",
    "dedup_shingle_minhash_pairs",
    "tpch_q21_sole_late_supplier",
    # -- long-green sentinels (diverse families, same as r6) --
    "counter_monotonic_guard",
    "tpch_q6_forecast_revenue",
    "pipeline_curation_verdicts",
    "vec_ann_tuned_topk",
    "stream_counter_rate",
    "rollup_quantile_sketch_daily",
    # -- stale re-green: last driver row r1 --
    "agg_conditional_buckets",
    "agg_distinct_counts",
    "agg_rollup_region_nation",
    "agg_stats_moments",
    "exposition_counter",
    "filter_predicates",
    "histogram_cumulative",
    "info_latest_per_user",
    "join_anti_inactive_customers",
    "join_band_value_tiers",
    "join_broadcast_enrich",
    "join_fact_fact_revenue",
    "join_full_outer_keys",
    "join_semi_active_customers",
    "label_merge_right_biased",
    "promql_histogram_quantile_p90",
    "promql_label_ops",
    "promql_topk_users_hourly",
    "scalar_array_funcs",
    "scalar_json_extract",
    "scalar_nan_inf_clean",
    "set_union_intersect_except",
    "summary_by_type",
    "win_running_cumulative",
    "win_topk_per_group",
    # -- stale re-green: last driver row r2 (diverse picks) --
    "dedup_minhash_lsh_pairs",
    "tpch_q3_shipping_priority",
    "ml_ensemble_unified",
    "subquery_correlated_max_per_cust",
    "vec_cosine_topk",
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
