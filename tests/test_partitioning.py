"""Partitioned-layout tests: the engine's production table layout is
date-partitioned parquet (SURVEY.md §4.2 partition pruning). Verifies the
write→scan round trip actually prunes partitions and pushes residual
filters — the property that turns a 100 TB scan into a one-day scan."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from numalogic_prometheus_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def partitioned_events(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("part") / "events_by_day")
    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    (
        ev.withColumn("dt", F.to_date("ts"))
        .repartition("dt")  # one file per partition dir, not 8×
        .write.partitionBy("dt")
        .mode("overwrite")
        .parquet(out)
    )
    return out


def test_partition_pruning(spark, partitioned_events):
    df = spark.read.parquet(partitioned_events).filter(
        F.col("dt") == "2024-01-15"
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters: [" in plan
    assert "2024-01-15" in plan.split("PartitionFilters")[1].split("]")[0]
    # the pruned read touches exactly the one day
    days = df.select("dt").distinct().collect()
    assert len(days) == 1


def test_residual_filter_pushdown_on_partitioned(spark, partitioned_events):
    df = spark.read.parquet(partitioned_events).filter(
        (F.col("dt") == "2024-01-15") & (F.col("value") > 100.0)
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "GreaterThan(value,100.0)" in plan.split("PushedFilters")[1].split("]")[0]


def test_partitioned_counts_match_unpartitioned(spark, partitioned_events):
    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    a = spark.read.parquet(partitioned_events).count()
    assert a == ev.count()
