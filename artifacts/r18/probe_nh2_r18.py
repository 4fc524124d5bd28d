"""NH bkt-pin laziness probe (r18 follow-on to the kernel rewrite).

With the r17 join web, the pinned bkt relation fed ~6 concurrent
aggregate branches, so the pin was materialized eagerly (one dedicated
job) before the web ran. The r18 kernel substrate reads bkt exactly
once (the event_type regroup) — plus a tiny scrapes distinct in the
fleet-aggregate entry — so the eager materialization job can fold into
the entry's own action via localCheckpoint(eager=False).

  V0 eager — shipped (pin job + entry job)
  VL lazy  — eager=False (one job; first action materializes the pin)

Gate: _nh_rate_finalize output identical. Interleaved min-of-4.
Also times the rate_quantile_agg composition (two consumers: per_bucket
+ scrapes) to check the lazy pin is not re-materialized.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(os.path.abspath(__file__)), '..', '..')))

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from numalogic_prometheus_spark.operators.dedup import truncate_lineage
from numalogic_prometheus_spark.plans import promql7 as P7
from numalogic_prometheus_spark.session import get_session
from numalogic_prometheus_spark.sources.tables import load_table

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_session(app_name="probe_nh2_r18")


def substrate(eager: bool) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("value") > 0)
    bounds = F.array(*[F.lit(b) for b in P7._BOUNDS])
    idx = F.lit(P7._LO) + F.size(F.filter(bounds, lambda b: b < F.col("value")))
    obs = ev.select(
        "event_type",
        F.date_trunc("minute", "ts").alias("m"),
        idx.alias("idx"),
    )
    bkt = obs.groupBy("event_type", "m", "idx").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    bkt = truncate_lineage(bkt, eager=eager)
    return bkt.groupBy("event_type").applyInPandas(
        P7._nh_series_kernel,
        "event_type string, hour timestamp, idx long, n long, "
        "si_us long, ds0 double, de double, delta_n long",
    )


print("== gate: rate output identical ==", flush=True)
ref = sorted(map(tuple, P7._nh_rate_finalize(substrate(True)).collect()))
got = sorted(map(tuple, P7._nh_rate_finalize(substrate(False)).collect()))
assert ref == got, "lazy-pin output diverged"
print(f"identical ({len(ref)} rows)", flush=True)

print("== timing (interleaved, min-of-4, noop sink) ==", flush=True)
results = {"V0": [], "VL": []}
for rep in range(4):
    for name, eager in [("V0", True), ("VL", False)]:
        spark.catalog.clearCache()
        t0 = time.monotonic()
        P7._nh_rate_finalize(substrate(eager)).write.format("noop").mode(
            "overwrite"
        ).save()
        dt = time.monotonic() - t0
        results[name].append(round(dt, 3))
        print(f"rep{rep} {name}: {dt:.3f}s", flush=True)

print("---")
for v in results:
    print(f"{v}: min={min(results[v]):.3f} series={results[v]}")
