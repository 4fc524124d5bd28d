"""Same-session interleaved A/B of the connected_components round
shape: shipped r17 (carried old_lbl, lazy checkpoint) vs self-loop
FUSED adoption — sym gains (a,a) loops so one groupBy computes
least(own, min neighbor) AND recovers old_lbl from the loop row,
removing the labels⋈neighbor_min adoption join per round.
Edges = dedup_simhash_pairs at sf0.1, rebuilt per pass."""

from __future__ import annotations

import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from numalogic_prometheus_spark.operators.dedup import truncate_lineage
from numalogic_prometheus_spark.plans.text import dedup_simhash_pairs
from numalogic_prometheus_spark.session import get_session

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_session(app_name="probe_cc4")


def _setup(with_loops: bool):
    edges = dedup_simhash_pairs(spark, sf_dir).select("id_a", "id_b")
    sym = (
        edges.select(F.col("id_a").alias("a"), F.col("id_b").alias("b"))
        .unionByName(edges.select(F.col("id_b").alias("a"), F.col("id_a").alias("b")))
        .distinct()
    )
    if with_loops:
        nodes = sym.select("a").distinct()
        sym = sym.unionByName(nodes.select("a", F.col("a").alias("b")))
    sym = truncate_lineage(sym)
    labels = truncate_lineage(
        sym.select(F.col("a").alias("id")).distinct().withColumn("lbl", F.col("id"))
    )
    return sym, labels


def run_shipped() -> DataFrame:
    sym, labels = _setup(False)
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


def run_fused() -> DataFrame:
    sym, labels = _setup(True)
    for _ in range(20):
        adopted = (
            sym.join(labels, sym.b == labels.id)
            .groupBy("a")
            .agg(
                F.min("lbl").alias("lbl"),
                F.min(
                    F.when(F.col("b") == F.col("a"), F.col("lbl"))
                ).alias("old_lbl"),
            )
            .withColumnRenamed("a", "id")
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


def main() -> None:
    # correctness gate first
    a = {tuple(r) for r in run_shipped().collect()}
    b = {tuple(r) for r in run_fused().collect()}
    assert a == b, f"MISMATCH: {len(a ^ b)} differing rows"
    print(f"identical components ({len(a)} rows); timing...")

    times: dict[str, list[float]] = {"shipped": [], "fused": []}
    for i in range(4):
        for name, fn in (("shipped", run_shipped), ("fused", run_fused)):
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
