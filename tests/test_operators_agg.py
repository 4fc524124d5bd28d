"""Aggregate-operator pins that the oracle gate cannot express.

agg_approx_distinct graduated to a DuckDB-reproducible KMV sketch in
round 7 (VERDICT r6 #7); Spark's native HLL++ ``approx_count_distinct``
— the engine-preferred sketch at 100 TB, but not bit-reproducible across
engines (ln/exp in its estimator) — stays covered here by a tolerance
pin against the exact counts.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from numalogic_prometheus_spark.plans.aggregates import _ADK
from numalogic_prometheus_spark.sources.tables import load_table


def test_native_hll_within_tolerance(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    rows = (
        li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_orderkey", 0.02).alias("hll_orders"),
            F.countDistinct("l_orderkey").alias("exact_orders"),
        )
        .collect()
    )
    assert rows
    for r in rows:
        # rsd=0.02 → 3σ bound of 6%; use 10% for slack on small groups.
        assert abs(r.hll_orders - r.exact_orders) <= max(
            5, 0.10 * r.exact_orders
        ), f"HLL++ drifted: {r}"


def test_kmv_estimate_within_sigma(spark, sf_dir):
    """The KMV estimate used by agg_approx_distinct must track the exact
    distinct count within 4σ, σ = 1/sqrt(k-2) (Bar-Yossef et al.)."""
    from numalogic_prometheus_spark.plans import all_queries

    est = {
        r.l_returnflag: (r.approx_orders, r.approx_parts)
        for r in all_queries()["agg_approx_distinct"](spark, sf_dir).collect()
    }
    li = load_table(spark, sf_dir, "lineitem")
    exact = {
        r.l_returnflag: (r.eo, r.ep)
        for r in li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_orderkey").alias("eo"),
            F.countDistinct("l_partkey").alias("ep"),
        )
        .collect()
    }
    sigma = (_ADK - 2) ** -0.5
    for flag, (eo, ep) in exact.items():
        ao, ap = est[flag]
        for a, e in ((ao, eo), (ap, ep)):
            if e <= _ADK:
                assert a == e, f"below-k regime must be exact: {flag} {a} {e}"
            else:
                assert abs(a - e) <= 4 * sigma * e, (
                    f"KMV drifted beyond 4 sigma: {flag} est={a} exact={e}"
                )
