"""Same-session A/B of the NH substrate variants (guide §1.1):
v0 = r16 original (4 scans, reset via (et,m) window re-exchange)
v1 = small-relation flags, no pin (7 scans, dense shuffled once)
v2 = v1 + bkt localCheckpoint pin (1 scan)
Interleaved rounds, min-of-4 each, full per_bucket+finalize noop.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from numalogic_prometheus_spark.functions.timeutil import epoch_us_sql
from numalogic_prometheus_spark.operators.dedup import truncate_lineage
from numalogic_prometheus_spark.plans.promql7 import (
    _BOUNDS,
    _EPOCH_US,
    _LO,
    _nh_deltas_from_cum,
    _nh_rate_finalize,
)
from numalogic_prometheus_spark.session import get_session
from numalogic_prometheus_spark.sources.tables import load_table

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_session(app_name="probe_nh2")


def _obs_bkt():
    ev = load_table(spark, sf_dir, "events").filter(F.col("value") > 0)
    bounds = F.array(*[F.lit(b) for b in _BOUNDS])
    idx = F.lit(_LO) + F.size(F.filter(bounds, lambda b: b < F.col("value")))
    obs = ev.select(
        "event_type", F.date_trunc("minute", "ts").alias("m"), idx.alias("idx")
    )
    return obs.groupBy("event_type", "m", "idx").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )


def _dense(bkt, scrapes, buckets):
    return (
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


def _cum2(dense):
    w_epoch = W.partitionBy("event_type", "idx", "epoch").orderBy("m")
    w_series = W.partitionBy("event_type", "idx").orderBy("m")
    return (
        dense.repartition("event_type", "idx")
        .select("event_type", "m", "idx", F.sum("cnt").over(w_epoch).alias("c"))
        .withColumn("prev_c", F.lag("c").over(w_series))
    )


def _flags_small(bkt, scrapes, buckets):
    epoch_of_m = F.expr(f"{epoch_us_sql('m')} DIV {_EPOCH_US}")
    epoch_tot = (
        bkt.groupBy("event_type", "idx", epoch_of_m.alias("tot_epoch"))
        .agg(F.sum("cnt").alias("tot"))
        .select(
            F.col("event_type").alias("et_t"),
            F.col("idx").alias("idx_t"),
            "tot_epoch",
            "tot",
        )
    )
    scr_epochs = scrapes.select(
        "event_type", "m", epoch_of_m.alias("epoch")
    ).withColumn(
        "prev_epoch",
        F.lag("epoch").over(W.partitionBy("event_type").orderBy("m")),
    )
    boundary = scr_epochs.filter(
        F.col("prev_epoch").isNotNull() & (F.col("prev_epoch") != F.col("epoch"))
    ).select("event_type", "m", "prev_epoch")
    return (
        boundary.join(buckets, "event_type")
        .join(bkt, ["event_type", "m", "idx"], "left")
        .join(
            epoch_tot,
            (F.col("et_t") == F.col("event_type"))
            & (F.col("idx_t") == F.col("idx"))
            & (F.col("tot_epoch") == F.col("prev_epoch")),
            "left",
        )
        .groupBy("event_type", "m")
        .agg(
            F.max(
                F.when(
                    F.coalesce(F.col("cnt"), F.lit(0))
                    < F.coalesce(F.col("tot"), F.lit(0)),
                    F.lit(1),
                ).otherwise(F.lit(0))
            ).alias("reset")
        )
    )


def v0():
    bkt = _obs_bkt()
    # original: scrapes/buckets off raw obs collapse to scans anyway
    scrapes = bkt.select("event_type", "m").distinct()
    buckets = bkt.select("event_type", "idx").distinct()
    dense = _dense(bkt, scrapes, buckets)
    drop = F.when(
        F.col("prev_c").isNotNull() & (F.col("c") < F.col("prev_c")), F.lit(1)
    ).otherwise(F.lit(0))
    cum = _cum2(dense).withColumn(
        "reset", F.max(drop).over(W.partitionBy("event_type", "m"))
    )
    return _nh_rate_finalize(_nh_deltas_from_cum(cum, scrapes))


def _v_flags(pin: bool):
    bkt = _obs_bkt()
    if pin:
        bkt = truncate_lineage(bkt)
    scrapes = bkt.select("event_type", "m").distinct()
    buckets = bkt.select("event_type", "idx").distinct()
    cum2 = _cum2(_dense(bkt, scrapes, buckets))
    flags = _flags_small(bkt, scrapes, buckets)
    cum = cum2.join(F.broadcast(flags), ["event_type", "m"], "left").withColumn(
        "reset", F.coalesce("reset", F.lit(0))
    )
    return _nh_rate_finalize(_nh_deltas_from_cum(cum, scrapes))


def noop(df):
    df.write.mode("overwrite").format("noop").save()


variants = {"v0": v0, "v1": lambda: _v_flags(False), "v2": lambda: _v_flags(True)}
best = {k: float("inf") for k in variants}
series = {k: [] for k in variants}
for k, fn in variants.items():
    noop(fn())  # warm
for r in range(4):
    for k, fn in variants.items():
        spark.catalog.clearCache()
        import gc

        gc.collect()
        t0 = time.perf_counter()
        noop(fn())
        took = time.perf_counter() - t0
        series[k].append(round(took, 3))
        best[k] = min(best[k], took)
for k in variants:
    print(k, round(best[k], 3), series[k])
