"""BSP hop-side restriction probe (r18, follow-on to probe_cc6).

The shipped loop's pointer-doubling hop joins `adopted` against ALL of
itself on lbl == pid — the last per-round exchanges of the full label
relation (hashpartition both sides on the label key). But a hop row
(pid, plbl) is a no-op unless pid's label MOVED this round: if
lbl(pid) = old_lbl(pid), then any a with a.lbl = pid either already
saw that value applied (a pointed at pid before and last round's hop
read the same state) or adopted pid fresh this round — in which case
skipping the hop only delays one acceleration step, never the result:
adoption alone has a unique fixpoint (labels constant per component;
the constant is forced to the component min because lbl(m) <= m for
the min node m and labels never leave the component), and the loop
terminates exactly when adoption is stable for every node. So the hop
side can be restricted to this round's ADOPTION-CHANGED rows — a
frontier-sized relation AQE broadcasts, making every round
exchange-free above the checkpoint scans. Round counts may differ
(weaker doubling); output cannot.

  V5 shipped — frontier neighbor joins, full-relation hop
  V6 probe   — frontier neighbor joins, hop side = adoption-changed rows

Gate: identical (id, component). Interleaved min-of-4, noop sink,
convergence-job counts printed.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(os.path.abspath(__file__)), '..', '..')))

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from numalogic_prometheus_spark.operators.dedup import truncate_lineage
from numalogic_prometheus_spark.plans.text import dedup_simhash_pairs
from numalogic_prometheus_spark.session import get_session

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_session(app_name="probe_cc7_r18")


def _edges() -> DataFrame:
    return dedup_simhash_pairs(spark, sf_dir).select("id_a", "id_b")


def run(hop_changed_only: bool) -> tuple[DataFrame, int]:
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
        neighbor_min = (
            sym.join(frontier, sym.b == frontier.id)
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
        hop_src = (
            adopted.filter(F.col("lbl") != F.col("old_lbl"))
            if hop_changed_only
            else adopted
        )
        hop = hop_src.select(
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


fp1 = None
for name, mode in [("V5", False), ("V6", True)]:
    df, jobs = run(mode)
    fp = fingerprint(df)
    if fp1 is None:
        fp1 = fp
    assert fp == fp1, f"{name} diverged"
    print(f"{name}: identical components, convergence jobs={jobs}", flush=True)

results = {"V5": [], "V6": []}
for rep in range(4):
    for name, mode in [("V5", False), ("V6", True)]:
        spark.catalog.clearCache()
        t0 = time.monotonic()
        df, jobs = run(mode)
        df.write.format("noop").mode("overwrite").save()
        dt = time.monotonic() - t0
        results[name].append(round(dt, 3))
        print(f"rep{rep} {name}: {dt:.3f}s jobs={jobs}", flush=True)

print("---")
for v in results:
    print(f"{v}: min={min(results[v]):.3f} series={results[v]}")
