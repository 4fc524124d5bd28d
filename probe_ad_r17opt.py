"""Interleaved A/B for agg_approx_distinct shapes (guide §1.1).
v0 = r16 windowed two-pass; v1 = single-scan collect_set salt merge;
v2 = single-scan salted double-window."""

from __future__ import annotations

import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from numalogic_prometheus_spark.plans.aggregates import _ADK, _ADNUM
from numalogic_prometheus_spark.session import get_session
from numalogic_prometheus_spark.sources.tables import load_table

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_session(app_name="probe_ad")
li = lambda: load_table(spark, sf_dir, "lineitem")  # noqa: E731

STACK = (
    "stack(2, 'o', conv(substring(md5(cast(l_orderkey as string)), 1, 12), 16, 10),"
    " 'p', conv(substring(md5(cast(l_partkey as string)), 1, 12), 16, 10))"
    " AS (which, h)"
)


def v0():
    def kmv_est(col):
        h = (
            F.conv(F.substring(F.md5(F.col(col).cast("string")), 1, 12), 16, 10)
            .cast("long")
            .alias("h")
        )
        dd = li().select("l_returnflag", h).groupBy("l_returnflag", "h").agg(
            F.lit(1).alias("_")
        )
        sk = dd.select(
            "l_returnflag",
            "h",
            F.row_number().over(W.partitionBy("l_returnflag").orderBy("h")).alias("rn"),
        ).filter(F.col("rn") <= _ADK)
        return sk.groupBy("l_returnflag").agg(
            F.when(F.max("rn") < _ADK, F.max("rn").cast("double"))
            .otherwise(F.lit(_ADNUM) / F.max(F.when(F.col("rn") == _ADK, F.col("h"))))
            .alias("est")
        )

    eo = kmv_est("l_orderkey").withColumnRenamed("est", "approx_orders")
    ep = kmv_est("l_partkey").withColumnRenamed("est", "approx_parts")
    return eo.join(ep, "l_returnflag")


def _pairs():
    return (
        li()
        .select("l_returnflag", F.expr(STACK))
        .select("l_returnflag", "which", F.col("h").cast("long").alias("h"))
    )


def _finish(ests):
    return ests.groupBy("l_returnflag").agg(
        F.max(F.when(F.col("which") == "o", F.col("est"))).alias("approx_orders"),
        F.max(F.when(F.col("which") == "p", F.col("est"))).alias("approx_parts"),
    )


def v1():
    bucketed = _pairs().groupBy(
        "l_returnflag", "which", F.pmod("h", F.lit(64)).alias("salt")
    ).agg(F.slice(F.array_sort(F.collect_set("h")), 1, _ADK).alias("ks"))
    merged = bucketed.groupBy("l_returnflag", "which").agg(
        F.slice(F.array_sort(F.flatten(F.collect_list("ks"))), 1, _ADK).alias("ks")
    )
    est = F.when(F.size("ks") < _ADK, F.size("ks").cast("double")).otherwise(
        F.lit(_ADNUM) / F.element_at("ks", _ADK)
    )
    return _finish(merged.select("l_returnflag", "which", est.alias("est")))


def v2():
    dd = _pairs().groupBy("l_returnflag", "which", "h").agg(F.lit(1).alias("_"))
    w1 = W.partitionBy("l_returnflag", "which", F.pmod("h", F.lit(64))).orderBy("h")
    sk1 = dd.select(
        "l_returnflag", "which", "h", F.row_number().over(w1).alias("rn1")
    ).filter(F.col("rn1") <= _ADK)
    w2 = W.partitionBy("l_returnflag", "which").orderBy("h")
    sk = sk1.select(
        "l_returnflag", "which", "h", F.row_number().over(w2).alias("rn")
    ).filter(F.col("rn") <= _ADK)
    ests = sk.groupBy("l_returnflag", "which").agg(
        F.when(F.max("rn") < _ADK, F.max("rn").cast("double"))
        .otherwise(F.lit(_ADNUM) / F.max(F.when(F.col("rn") == _ADK, F.col("h"))))
        .alias("est")
    )
    return _finish(ests)


def noop(df):
    df.write.mode("overwrite").format("noop").save()


variants = {"v0": v0, "v1": v1, "v2": v2}
# sanity: identical results
import pandas as pd  # noqa: F401

base = v0().orderBy("l_returnflag").collect()
for k in ("v1", "v2"):
    other = variants[k]().orderBy("l_returnflag").collect()
    assert [tuple(r) for r in base] == [tuple(r) for r in other], f"{k} mismatch"
print("results identical")

best = {k: float("inf") for k in variants}
series = {k: [] for k in variants}
for r in range(4):
    for k, fn in variants.items():
        spark.catalog.clearCache()
        gc.collect()
        t0 = time.perf_counter()
        noop(fn())
        took = time.perf_counter() - t0
        series[k].append(round(took, 3))
        best[k] = min(best[k], took)
for k in variants:
    print(k, round(best[k], 3), series[k])
