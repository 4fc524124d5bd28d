"""profile_column_stats consolidation probe (VERDICT r17 #6).

V0 ships: melt (stack -> 6 rows/input row) -> groupBy(column, value)
count -> groupBy(column) everything. The melt pays a full-width
exchange of ~900k value rows at sf0.1 carrying (column_name STRING,
vnum, vstr, cnt).

  V1 split — n_rows/n_null/min/max come from ONE wide aggregate over
             the UNMELTED relation (pure partial agg, 1-row output, no
             value exchange at all); only the exact distinct counts
             keep the melt, reduced to a distinct (no cnt column) and
             null-free (nulls don't count toward n_distinct, so they
             are dropped BEFORE the exchange). The 6-row wide result
             unpivots and broadcast-joins the distinct counts.
  V2 v1-nospread — V1 without the spread repartition on the distinct
             leg (scan splits feed the partial distinct directly).

Gate: output rows exactly equal V0's (sorted collect). Interleaved
min-of-3, noop sink.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(os.path.abspath(__file__)), '..', '..')))

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from numalogic_prometheus_spark.plans.profiling import (
    _PROFILE_COLS,
    _melt_expr,
    profile_column_stats,
)
from numalogic_prometheus_spark.session import get_session
from numalogic_prometheus_spark.sources.tables import load_table, spread_if_compact

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_session(app_name="probe_pcs_r18")


def v0() -> DataFrame:
    return profile_column_stats(spark, sf_dir)


def _split(spread_distinct: bool) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    # wide single-pass stats: no exchange (partial agg to one row)
    aggs = []
    for c, kind in _PROFILE_COLS:
        aggs.append(F.count(F.lit(1)).alias(f"{c}__n"))
        aggs.append(F.count(c).alias(f"{c}__nn"))
        if kind == "num":
            aggs.append(F.min(F.col(c).cast("double")).alias(f"{c}__mn"))
            aggs.append(F.max(F.col(c).cast("double")).alias(f"{c}__mx"))
        elif kind == "str":
            aggs.append(F.min(c).alias(f"{c}__mn"))
            aggs.append(F.max(c).alias(f"{c}__mx"))
        else:
            aggs.append(
                F.min(F.col(c).cast("date").cast("string")).alias(f"{c}__mn")
            )
            aggs.append(
                F.max(F.col(c).cast("date").cast("string")).alias(f"{c}__mx")
            )
    wide = orders.agg(*aggs)
    # unpivot the 1-row wide result into 6 rows
    slots = []
    for c, kind in _PROFILE_COLS:
        mn_num = f"{c}__mn" if kind == "num" else "CAST(NULL AS DOUBLE)"
        mx_num = f"{c}__mx" if kind == "num" else "CAST(NULL AS DOUBLE)"
        mn_str = f"{c}__mn" if kind != "num" else "CAST(NULL AS STRING)"
        mx_str = f"{c}__mx" if kind != "num" else "CAST(NULL AS STRING)"
        slots.append(
            f"'{c}', {c}__n, {c}__n - {c}__nn, "
            f"{mn_num}, {mx_num}, {mn_str}, {mx_str}"
        )
    base = wide.selectExpr(
        f"stack({len(_PROFILE_COLS)}, " + ", ".join(slots) + ") AS "
        "(column_name, n_rows, n_null, min_num, max_num, min_str, max_str)"
    )
    # distinct counts: melt, drop nulls pre-exchange, distinct, count
    src = (
        spread_if_compact(spark, load_table(spark, sf_dir, "orders"))
        if spread_distinct
        else load_table(spark, sf_dir, "orders")
    )
    melted = src.selectExpr(_melt_expr(_PROFILE_COLS))
    nd = (
        melted.filter(F.col("vnum").isNotNull() | F.col("vstr").isNotNull())
        .select("column_name", "vnum", "vstr")
        .distinct()
        .groupBy("column_name")
        .agg(F.count(F.lit(1)).alias("n_distinct"))
    )
    return base.join(nd, "column_name").select(
        "column_name",
        "n_rows",
        "n_null",
        "n_distinct",
        "min_num",
        "max_num",
        "min_str",
        "max_str",
    )


VARIANTS = {
    "V0": v0,
    "V1": lambda: _split(True),
    "V2": lambda: _split(False),
}

ref = sorted(map(tuple, v0().collect()))
for name, fn in VARIANTS.items():
    if name == "V0":
        continue
    got = sorted(map(tuple, fn().collect()))
    assert got == ref, f"{name} diverged:\n{got}\nvs\n{ref}"
    print(f"{name}: output identical ({len(got)} rows)", flush=True)

results = {v: [] for v in VARIANTS}
for rep in range(3):
    for v, fn in VARIANTS.items():
        spark.catalog.clearCache()
        t0 = time.monotonic()
        fn().write.format("noop").mode("overwrite").save()
        dt = time.monotonic() - t0
        results[v].append(round(dt, 3))
        print(f"rep{rep} {v}: {dt:.3f}s", flush=True)

print("---")
for v in VARIANTS:
    print(f"{v}: min={min(results[v]):.3f} series={results[v]}")
