"""pipeline_anomaly_scores dedup-shape probe (r18, guide §2.3).

The entry's keep-first dedup runs as Sort → WindowGroupLimit →
Window(row_number) → Filter above the (user_id, ts) exchange — two
sorts and window machinery over the full fact, and the shuffle carries
every duplicate row. A min_by hash aggregate computes the same
keep-first row (event_id is globally unique, so min_by over it is
deterministic and equals row_number(orderBy event_id) == 1) with
map-side partial aggregation: duplicates collapse BEFORE the exchange
and no sort runs at all. ml_ensemble_unified shares the same B3 dedup
stage via _b3_dedup if this wins.

  V0 shipped — window dedup
  VA min_by  — groupBy(user_id, ts).agg(min_by(struct(...), event_id))

Gate: entry output exactly equal. Interleaved min-of-4, noop sink.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(os.path.abspath(__file__)), '..', '..')))

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from numalogic_prometheus_spark.plans.pipeline import pipeline_anomaly_scores
from numalogic_prometheus_spark.session import get_session
from numalogic_prometheus_spark.sources.tables import load_table

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_session(app_name="probe_pas_r18")


def v0() -> DataFrame:
    return pipeline_anomaly_scores(spark, sf_dir)


def va() -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    first = F.min_by(F.struct("event_type", "value"), F.col("event_id"))
    deduped = (
        ev.groupBy("user_id", "ts")
        .agg(first.alias("f"))
        .select("user_id", F.col("f.event_type").alias("event_type"), "ts",
                F.col("f.value").alias("value"))
    )
    bad = F.isnan("value") | (F.abs("value") == F.lit(float("inf")))
    cleaned = deduped.withColumn(
        "value", F.when(bad, 0.0).otherwise(F.col("value"))
    )
    stats = cleaned.groupBy("event_type").agg(
        F.avg("value").alias("mu"),
        F.stddev_samp("value").alias("sigma"),
        F.percentile("value", F.lit(0.95)).alias("q95"),
    )
    z = F.when(F.col("sigma") == 0, 0.0).otherwise(
        (F.col("value") - F.col("mu")) / F.col("sigma")
    )
    static = F.when(
        F.col("value") > F.col("q95"), F.col("value") / F.col("q95")
    ).otherwise(0.0)
    scored = cleaned.join(F.broadcast(stats), ["event_type"]).select(
        "user_id",
        "event_type",
        F.abs(z).alias("model_score"),
        static.alias("static_score"),
    )
    ens = scored.withColumn(
        "ens", F.col("model_score") * 0.6 + F.col("static_score") * 0.4
    )
    unified = ens.groupBy("user_id").agg(
        F.max("ens").alias("unified_raw"),
        F.count(F.lit(1)).alias("n_samples"),
    )
    return unified.select(
        "user_id",
        "n_samples",
        F.round(F.tanh(F.col("unified_raw")) * 10.0, 6).alias("anomaly_score"),
    )


print("== gate: entry output exactly equal ==", flush=True)
ref = sorted(map(tuple, v0().collect()))
got = sorted(map(tuple, va().collect()))
assert ref == got, "VA diverged"
print(f"identical ({len(ref)} rows)", flush=True)

print("== timing (interleaved, min-of-4, noop sink) ==", flush=True)
results = {"V0": [], "VA": []}
for rep in range(4):
    for name, fn in [("V0", v0), ("VA", va)]:
        spark.catalog.clearCache()
        t0 = time.monotonic()
        fn().write.format("noop").mode("overwrite").save()
        dt = time.monotonic() - t0
        results[name].append(round(dt, 3))
        print(f"rep{rep} {name}: {dt:.3f}s", flush=True)

print("---")
for v in results:
    print(f"{v}: min={min(results[v]):.3f} series={results[v]}")
