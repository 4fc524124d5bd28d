"""Same-session interleaved A/B of the connected_components round
shape: old (convergence via new⋈old join+count) vs new (carried
old_lbl filter+count on the checkpoint). Edges = dedup_simhash_pairs
at sf0.1, rebuilt per pass (same work both variants)."""

from __future__ import annotations

import gc
import os
import sys
import time
import warnings

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from numalogic_prometheus_spark.operators.dedup import truncate_lineage
from numalogic_prometheus_spark.plans.text import dedup_simhash_pairs
from numalogic_prometheus_spark.session import get_session

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_session(app_name="probe_cc")


def _setup():
    edges = dedup_simhash_pairs(spark, sf_dir).select("id_a", "id_b")
    sym = truncate_lineage(
        edges.select(F.col("id_a").alias("a"), F.col("id_b").alias("b"))
        .unionByName(edges.select(F.col("id_b").alias("a"), F.col("id_a").alias("b")))
        .distinct()
    )
    labels = truncate_lineage(
        sym.select(F.col("a").alias("id")).distinct().withColumn("lbl", F.col("id"))
    )
    return sym, labels


def run_old() -> DataFrame:
    sym, labels = _setup()
    for _ in range(20):
        neighbor_min = (
            sym.join(labels, sym.b == labels.id).groupBy("a").agg(F.min("lbl").alias("nlbl"))
        )
        adopted = labels.join(neighbor_min, labels.id == neighbor_min.a, "left").select(
            "id",
            F.least(F.col("lbl"), F.coalesce(F.col("nlbl"), F.col("lbl"))).alias("lbl"),
        )
        hop = adopted.select(F.col("id").alias("pid"), F.col("lbl").alias("plbl"))
        new_labels = truncate_lineage(
            adopted.join(hop, adopted.lbl == hop.pid, "left").select(
                "id", F.coalesce("plbl", "lbl").alias("lbl")
            )
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.lbl") != F.col("o.lbl"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select("id", F.col("lbl").alias("component"))


def run_new() -> DataFrame:
    sym, labels = _setup()
    for _ in range(20):
        neighbor_min = (
            sym.join(labels, sym.b == labels.id).groupBy("a").agg(F.min("lbl").alias("nlbl"))
        )
        adopted = labels.join(neighbor_min, labels.id == neighbor_min.a, "left").select(
            "id",
            F.col("lbl").alias("old_lbl"),
            F.least(F.col("lbl"), F.coalesce(F.col("nlbl"), F.col("lbl"))).alias("lbl"),
        )
        hop = adopted.select(F.col("id").alias("pid"), F.col("lbl").alias("plbl"))
        new_full = truncate_lineage(
            adopted.join(hop, adopted.lbl == hop.pid, "left").select(
                "id", F.coalesce("plbl", "lbl").alias("lbl"), "old_lbl"
            )
        )
        changed = new_full.filter(F.col("lbl") != F.col("old_lbl")).count()
        labels = new_full.select("id", "lbl")
        if changed == 0:
            break
    return labels.select("id", F.col("lbl").alias("component"))


def run_new2() -> DataFrame:
    sym, labels = _setup()
    for _ in range(20):
        neighbor_min = (
            sym.join(labels, sym.b == labels.id).groupBy("a").agg(F.min("lbl").alias("nlbl"))
        )
        adopted = labels.join(neighbor_min, labels.id == neighbor_min.a, "left").select(
            "id",
            F.col("lbl").alias("old_lbl"),
            F.least(F.col("lbl"), F.coalesce(F.col("nlbl"), F.col("lbl"))).alias("lbl"),
        )
        hop = adopted.select(F.col("id").alias("pid"), F.col("lbl").alias("plbl"))
        new_full = (
            adopted.join(hop, adopted.lbl == hop.pid, "left").select(
                "id", F.coalesce("plbl", "lbl").alias("lbl"), "old_lbl"
            )
        ).localCheckpoint(eager=False)
        changed = new_full.filter(F.col("lbl") != F.col("old_lbl")).count()
        labels = new_full.select("id", "lbl")
        if changed == 0:
            break
    return labels.select("id", F.col("lbl").alias("component"))


def run_new3() -> DataFrame:
    sym, labels = _setup()
    for _ in range(20):
        neighbor_min = (
            sym.join(labels, sym.b == labels.id).groupBy("a").agg(F.min("lbl").alias("nlbl"))
        )
        adopted = labels.join(neighbor_min, labels.id == neighbor_min.a, "left").select(
            "id",
            F.col("lbl").alias("old_lbl"),
            F.least(F.col("lbl"), F.coalesce(F.col("nlbl"), F.col("lbl"))).alias("lbl"),
        )
        hop = adopted.select(F.col("id").alias("pid"), F.col("lbl").alias("plbl"))
        once = adopted.join(hop, adopted.lbl == hop.pid, "left").select(
            "id", F.coalesce("plbl", "lbl").alias("lbl"), "old_lbl"
        )
        hop2 = once.select(F.col("id").alias("pid"), F.col("lbl").alias("plbl"))
        new_full = (
            once.join(hop2, once.lbl == hop2.pid, "left").select(
                "id", F.coalesce("plbl", "lbl").alias("lbl"), "old_lbl"
            )
        ).localCheckpoint(eager=False)
        changed = new_full.filter(F.col("lbl") != F.col("old_lbl")).count()
        labels = new_full.select("id", "lbl")
        if changed == 0:
            break
    return labels.select("id", F.col("lbl").alias("component"))


def noop(df):
    df.write.mode("overwrite").format("noop").save()


warnings.filterwarnings("ignore")
variants = {"new2": run_new2, "new3": run_new3}
best = {k: float("inf") for k in variants}
series = {k: [] for k in variants}
for k, fn in variants.items():
    noop(fn())  # warm
for r in range(4):
    for k, fn in variants.items():
        spark.catalog.clearCache()
        gc.collect()
        t0 = time.perf_counter()
        noop(fn())
        took = time.perf_counter() - t0
        series[k].append(round(took, 3))
        best[k] = min(best[k], took)
for k in variants:
    print(k, round(best[k], 3), series[k])
