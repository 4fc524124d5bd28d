"""Interleaved A/B: shipped BSP edge pin (localCheckpoint — loses
partitioning metadata, sym re-exchanged every round) vs a
repartition('b').persist() pin (InMemoryRelation PRESERVES
outputPartitioning, so each round's neighbor join should skip the
sym-side exchange). Edges = dedup_simhash_pairs at sf0.1."""

from __future__ import annotations

import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from numalogic_prometheus_spark.operators.dedup import truncate_lineage
from numalogic_prometheus_spark.plans.text import dedup_simhash_pairs
from numalogic_prometheus_spark.session import get_session

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_session(app_name="probe_cc5")


def _sym_raw():
    edges = dedup_simhash_pairs(spark, sf_dir).select("id_a", "id_b")
    return (
        edges.select(F.col("id_a").alias("a"), F.col("id_b").alias("b"))
        .unionByName(edges.select(F.col("id_b").alias("a"), F.col("id_a").alias("b")))
        .distinct()
    )


def _loop(sym, labels) -> DataFrame:
    for _ in range(20):
        neighbor_min = (
            sym.join(labels, sym.b == labels.id)
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
        hop = adopted.select(F.col("id").alias("pid"), F.col("lbl").alias("plbl"))
        new_full = truncate_lineage(
            adopted.join(hop, adopted.lbl == hop.pid, "left").select(
                "id", F.coalesce("plbl", "lbl").alias("lbl"), "old_lbl"
            ),
            eager=False,
        )
        changed = new_full.filter(F.col("lbl") != F.col("old_lbl")).count()
        labels = new_full.select("id", "lbl")
        if changed == 0:
            break
    return labels.select("id", F.col("lbl").alias("component"))


def run_shipped() -> DataFrame:
    sym = truncate_lineage(_sym_raw())
    labels = truncate_lineage(
        sym.select(F.col("a").alias("id")).distinct().withColumn("lbl", F.col("id"))
    )
    return _loop(sym, labels)


def run_persist() -> DataFrame:
    sym = _sym_raw().repartition(F.col("b")).persist(StorageLevel.MEMORY_AND_DISK)
    labels = truncate_lineage(
        sym.select(F.col("a").alias("id")).distinct().withColumn("lbl", F.col("id"))
    )
    try:
        return _loop(sym, labels)
    finally:
        sym.unpersist()


def main() -> None:
    a = {tuple(r) for r in run_shipped().collect()}
    b = {tuple(r) for r in run_persist().collect()}
    assert a == b, f"MISMATCH: {len(a ^ b)} differing rows"
    print(f"identical components ({len(a)} rows); timing...")

    times: dict[str, list[float]] = {"shipped": [], "persist": []}
    for i in range(4):
        for name, fn in (("shipped", run_shipped), ("persist", run_persist)):
            gc.collect()
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            times[name].append(dt)
            print(f"pass {i} {name}: {dt:.2f}s", flush=True)
    for name, ts in times.items():
        print(f"{name}: min {min(ts):.2f}  all {[round(t, 2) for t in ts]}")


if __name__ == "__main__":
    main()
