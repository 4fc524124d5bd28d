"""Stage-cost probe for the native-histogram substrate (guide §1.1):
time each intermediate of _nh_window_deltas with the noop sink on a
warm session, min-of-3, to locate where the 4 s actually goes."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from numalogic_prometheus_spark.functions.timeutil import epoch_us_sql
from numalogic_prometheus_spark.plans.promql7 import (
    _BOUNDS,
    _EPOCH_US,
    _LO,
    _nh_deltas_from_cum,
)
from numalogic_prometheus_spark.session import get_session
from numalogic_prometheus_spark.sources.tables import load_table

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_session(app_name="probe_nh")


def noop(df):
    df.write.mode("overwrite").format("noop").save()


def timeit(tag, fn, n=3):
    best = float("inf")
    for _ in range(n):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        noop(fn())
        best = min(best, time.perf_counter() - t0)
    print(f"{tag:28s} {best:7.3f}s")


def build(upto: str):
    ev = load_table(spark, sf_dir, "events").filter(F.col("value") > 0)
    bounds = F.array(*[F.lit(b) for b in _BOUNDS])
    idx = F.lit(_LO) + F.size(F.filter(bounds, lambda b: b < F.col("value")))
    obs = ev.select(
        "event_type", F.date_trunc("minute", "ts").alias("m"), idx.alias("idx")
    )
    if upto == "obs":
        return obs
    bkt = obs.groupBy("event_type", "m", "idx").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    if upto == "bkt":
        return bkt
    scrapes = bkt.select("event_type", "m").distinct()
    if upto == "scrapes":
        return scrapes
    buckets = bkt.select("event_type", "idx").distinct()
    dense = (
        scrapes.join(buckets, "event_type")
        .join(bkt, ["event_type", "m", "idx"], "left")
        .select(
            "event_type",
            "m",
            "idx",
            F.expr(f"{epoch_us_sql('m')} DIV {_EPOCH_US}").alias("epoch"),
            F.coalesce("cnt", F.lit(0)).alias("cnt"),
        )
    )
    if upto == "dense":
        return dense
    w_epoch = W.partitionBy("event_type", "idx", "epoch").orderBy("m")
    w_series = W.partitionBy("event_type", "idx").orderBy("m")
    drop = F.when(
        F.col("prev_c").isNotNull() & (F.col("c") < F.col("prev_c")), F.lit(1)
    ).otherwise(F.lit(0))
    cum2 = (
        dense.repartition("event_type", "idx")
        .select("event_type", "m", "idx", F.sum("cnt").over(w_epoch).alias("c"))
        .withColumn("prev_c", F.lag("c").over(w_series))
    )
    if upto == "cum2":
        return cum2
    cum = cum2.withColumn(
        "reset", F.max(drop).over(W.partitionBy("event_type", "m"))
    )
    if upto == "cum":
        return cum
    return _nh_deltas_from_cum(cum, scrapes)


# counts for context
for t in ("obs", "bkt", "scrapes", "dense"):
    print(t, build(t).count())

# warm
noop(build("full"))
for tag in ("obs", "bkt", "scrapes", "dense", "cum2", "cum", "full"):
    timeit(tag, lambda tag=tag: build(tag))
