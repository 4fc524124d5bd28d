"""Interleaved A/B of sample_split_snapshot_fed's snapshot write
(VERDICT r17 #3: scaling ratio 0.47 — write+read serial/driver-bound).
Variants for the parquet snapshot write:

  W0 base      — write the BSP output as-is (32 post-shuffle partitions
                 of a tiny relation -> 32 files + commit overhead)
  W1 rebalance — AQE REBALANCE hint before the write: partition count
                 derives from advisory partition size (bytes), so the
                 local tiny relation collapses to 1 file while a 100 TB
                 components relation still fans out (guide S6 — output
                 file sizing without a hard-coded coalesce constant)

Each timed pass runs the ENTIRE entry end-to-end (write + marker-gated
read + split assignment, noop sink) and asserts the split assignment
fingerprint is identical across variants.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from numalogic_prometheus_spark.plans import sampling as S
from numalogic_prometheus_spark.session import get_session

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_session(app_name="probe_snap_r18")

SNAP = "spark-warehouse/components_snapshot_probe_r18"


def run(variant: str):
    comp = S.build_components(spark, sf_dir)
    if variant == "W1":
        comp = comp.hint("rebalance")
    comp.write.mode("overwrite").parquet(SNAP)
    out = S.sample_split_from_snapshot(spark, sf_dir, SNAP)
    return out


def fingerprint(df):
    r = df.groupBy("split").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.pmod(F.xxhash64("doc_id", "split_key", "split"), F.lit(1000000007))).alias("h"),
    ).orderBy("split").collect()
    return tuple(map(tuple, r))


fp = {v: fingerprint(run(v)) for v in ("W0", "W1")}
assert fp["W0"] == fp["W1"], f"diverged: {fp}"
print("identical split assignments", flush=True)
for v in ("W0", "W1"):
    run(v)
    n_files = len([f for f in os.listdir(SNAP) if f.endswith(".parquet")])
    print(f"{v}: snapshot files={n_files}", flush=True)

results = {"W0": [], "W1": []}
for rep in range(3):
    for v in ("W0", "W1"):
        spark.catalog.clearCache()
        t0 = time.monotonic()
        run(v).write.format("noop").mode("overwrite").save()
        results[v].append(round(time.monotonic() - t0, 3))
        print(f"rep{rep} {v}: {results[v][-1]:.3f}s", flush=True)
print("---")
for v, series in results.items():
    print(f"{v}: min={min(series):.3f} series={series}")
