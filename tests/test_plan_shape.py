"""Physical-plan regression tests: the scale posture is part of the
contract, not an accident. Each assertion pins a plan property that must
survive refactors — filter pushdown reaching the parquet scan, dimension
joins staying broadcast, aggregations keeping their partial (map-side)
phase, top-k compiling to TakeOrderedAndProject instead of a global sort.
"""

from __future__ import annotations

import contextlib
import io

from numalogic_prometheus_spark import plans

QUERIES = plans.all_queries()


def _plan(spark, sf_dir, name: str) -> str:
    df = QUERIES[name](spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    plan = _plan(spark, sf_dir, "filter_predicates")
    assert "PushedFilters: [" in plan
    assert "GreaterThanOrEqual(l_quantity,10.0" in plan or "l_quantity" in plan.split(
        "PushedFilters"
    )[1].split("]")[0]


def test_projection_prunes_scan(spark, sf_dir):
    plan = _plan(spark, sf_dir, "project_computed")
    read_schema = plan.split("ReadSchema: ")[1].splitlines()[0]
    assert "p_name" not in read_schema, "unused column not pruned from scan"
    assert "p_partkey" in read_schema


def test_dim_join_is_broadcast(spark, sf_dir):
    plan = _plan(spark, sf_dir, "join_broadcast_enrich")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_band_join_is_broadcast_nested_loop(spark, sf_dir):
    plan = _plan(spark, sf_dir, "join_band_value_tiers")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_counter_agg_has_partial_phase(spark, sf_dir):
    plan = _plan(spark, sf_dir, "counter_hourly")
    assert plan.count("HashAggregate") >= 2, "partial+final aggregation expected"


def test_global_topk_avoids_full_sort(spark, sf_dir):
    plan = _plan(spark, sf_dir, "sort_global_topk")
    assert "TakeOrderedAndProject" in plan


def test_asof_join_single_exchange(spark, sf_dir):
    plan = _plan(spark, sf_dir, "join_asof_last_error")
    # union+window as-of: exactly one hash exchange on the key, no
    # cartesian/range join anywhere.
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_whole_stage_codegen_on_hot_path(spark, sf_dir):
    # formatted mode hides codegen under AdaptiveSparkPlan; codegen mode
    # reports the subtree count directly.
    df = QUERIES["agg_pricing_summary"](spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("codegen")
    assert "WholeStageCodegen" in buf.getvalue()
