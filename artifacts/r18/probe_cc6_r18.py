"""BSP frontier probe (VERDICT r17 #1, second half: "shrink the
frontier — shuffle only the active frontier, not all labels, each
round").

Shipped loop (V1, r18 seed committed): every round joins sym against
the FULL label relation to compute neighbor minima. But labels are
monotone non-increasing and each adoption takes the min over ALL
neighbors' previous labels, so after any round lbl(a) <= lbl_prev(b)
for every neighbor b; an UNCHANGED neighbor (lbl_cur(b) = lbl_prev(b))
therefore can never lower a's label again. Hence from round 2 on the
neighbor-min join only needs the CHANGED labels (the frontier), which
the convergence count already isolates on the checkpointed result —
and the frontier collapses fast (seeded sf0.1 simhash: 798 -> 13 -> 4
-> 0), so AQE turns the per-round neighbor join into a broadcast probe
with no exchange of sym or labels.

  V1 shipped  — seeded, full-relation neighbor join each round
  V5 frontier — seeded, rounds 2+ join sym against changed labels only

Gate: identical (id, component) output. Interleaved min-of-3.
"""

from __future__ import annotations

import os
import sys
import time
import warnings

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(os.path.abspath(__file__)), '..', '..')))

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from numalogic_prometheus_spark.operators.dedup import truncate_lineage
from numalogic_prometheus_spark.plans.text import dedup_simhash_pairs
from numalogic_prometheus_spark.session import get_session

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_session(app_name="probe_cc6_r18")


def _edges() -> DataFrame:
    return dedup_simhash_pairs(spark, sf_dir).select("id_a", "id_b")


def run(frontier_mode: bool) -> tuple[DataFrame, int]:
    edges = _edges()
    sym = truncate_lineage(
        edges.select(F.col("id_a").alias("a"), F.col("id_b").alias("b"))
        .unionByName(edges.select(F.col("id_b").alias("a"), F.col("id_a").alias("b")))
        .distinct()
    )
    labels = truncate_lineage(
        sym.groupBy("a")
        .agg(F.least(F.col("a"), F.min("b")).alias("lbl"))
        .select(F.col("a").alias("id"), "lbl")
    )
    frontier = labels
    jobs = 0
    changed = 0
    for _ in range(20):
        src = frontier if frontier_mode else labels
        neighbor_min = (
            sym.join(src, sym.b == src.id)
            .groupBy("a")
            .agg(F.min("lbl").alias("nlbl"))
        )
        adopted = labels.join(
            neighbor_min, labels.id == neighbor_min.a, "left"
        ).select(
            "id",
            F.col("lbl").alias("old_lbl"),
            F.least(
                F.col("lbl"), F.coalesce(F.col("nlbl"), F.col("lbl"))
            ).alias("lbl"),
        )
        hop = adopted.select(
            F.col("id").alias("pid"), F.col("lbl").alias("plbl")
        )
        new_full = truncate_lineage(
            adopted.join(hop, adopted.lbl == hop.pid, "left").select(
                "id", F.coalesce("plbl", "lbl").alias("lbl"), "old_lbl"
            ),
            eager=False,
        )
        changed = new_full.filter(F.col("lbl") != F.col("old_lbl")).count()
        jobs += 1
        labels = new_full.select("id", "lbl")
        frontier = new_full.filter(F.col("lbl") != F.col("old_lbl")).select(
            "id", "lbl"
        )
        if changed == 0:
            break
    return labels.select("id", F.col("lbl").alias("component")), jobs


def fingerprint(df: DataFrame):
    return sorted(map(tuple, df.collect()))


fp1, j1 = None, None
for name, fm in [("V1", False), ("V5", True)]:
    df, jobs = run(fm)
    fp = fingerprint(df)
    if fp1 is None:
        fp1 = fp
    assert fp == fp1, f"{name} diverged"
    print(f"{name}: identical components, convergence jobs={jobs}", flush=True)

results = {"V1": [], "V5": []}
for rep in range(4):
    for name, fm in [("V1", False), ("V5", True)]:
        spark.catalog.clearCache()
        t0 = time.monotonic()
        df, jobs = run(fm)
        df.write.format("noop").mode("overwrite").save()
        dt = time.monotonic() - t0
        results[name].append(round(dt, 3))
        print(f"rep{rep} {name}: {dt:.3f}s jobs={jobs}", flush=True)

print("---")
for v in results:
    print(f"{v}: min={min(results[v]):.3f} series={results[v]}")
