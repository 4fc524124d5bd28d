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


def test_skew_salted_join_salts_only_hot_keys(spark):
    """r2 verdict #4: build-side replication must be |build| +
    (n_salt-1)*|hot keys|, not n_salt*|build| — and the union of the
    salted-hot and plain-cold joins must equal the unsalted join."""
    from pyspark.sql import functions as F

    from numalogic_prometheus_spark.operators.relational import skew_salted_join

    # key 1 is hot (12 rows), keys 2..6 are cold (2 rows each)
    probe = spark.createDataFrame(
        [(1, i) for i in range(12)] + [(k, i) for k in range(2, 7) for i in range(2)],
        "k long, line int",
    )
    build = spark.createDataFrame([(k, f"v{k}") for k in range(1, 9)], "bk long, v string")
    out = skew_salted_join(
        probe, build, "k", "bk", F.col("line"), n_salt=4, hot_threshold=5
    )
    plain = probe.join(build, probe.k == build.bk)
    assert sorted(map(tuple, out.select("k", "line", "v").collect())) == sorted(
        map(tuple, plain.select("k", "line", "v").collect())
    )
    # the hot set is exactly {1}: build rows replicated = 1*(4-1) = 3,
    # visible as the explode feeding only the semi-joined (hot) branch
    explain = out._jdf.queryExecution().optimizedPlan().toString()
    assert explain.lower().count("generate explode") == 1
    # degenerate all-cold path: threshold above every freq → plain join
    out_cold = skew_salted_join(
        probe, build, "k", "bk", F.col("line"), n_salt=4, hot_threshold=100
    )
    assert out_cold.count() == plain.count()


def test_recurrence_segmentation_beats_series_parallelism(spark, sf_dir):
    """Round-6 re-key (VERDICT r5 #5): the EWMA/Holt-Winters kernels must
    group by (series, day) — #series × #days tasks — not by series alone
    (which capped parallelism at ~5 forever). Pin the group-key cardinality
    the scan stage distributes over."""
    from pyspark.sql import functions as F

    from numalogic_prometheus_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    n_series = ev.select("event_type").distinct().count()
    n_segments = (
        ev.select("event_type", F.to_date("ts").alias("seg"))
        .distinct()
        .count()
    )
    assert n_segments > n_series, (n_segments, n_series)
    # at every SF the fixture spans ~30 days × 5 series ⇒ >32 groups,
    # enough to fill a full local[32] stage (and scales with data)
    assert n_segments >= 32, n_segments


def test_spread_if_compact_is_conditional(spark, sf_dir):
    """sources.tables.spread_if_compact must widen a narrower-than-cores
    plan to default parallelism and leave an already-wide plan untouched
    (no gratuitous exchange at scale)."""
    from numalogic_prometheus_spark.sources.tables import (
        load_table,
        spread_if_compact,
    )

    par = spark.sparkContext.defaultParallelism
    compact = load_table(spark, sf_dir, "orders")
    assert compact.rdd.getNumPartitions() < par  # single-row-group fixture
    widened = spread_if_compact(spark, compact)
    assert widened.rdd.getNumPartitions() == par

    wide = compact.repartition(par + 4)
    untouched = spread_if_compact(spark, wide)
    assert untouched.rdd.getNumPartitions() == par + 4
    assert untouched is wide  # no new plan node at all


def test_scan_split_estimate_walks_nodes_not_strings(spark, sf_dir):
    """ADVICE r8: the scan-rooted cap must classify by analyzed-plan
    NODE CLASS, not by substring of the rendered plan — a column alias
    containing a width-token ('SortKey') must not disable the estimate,
    and every width-changing operator must (allowlist fails safe)."""
    from pyspark.sql import functions as F

    from numalogic_prometheus_spark.sources.tables import (
        _estimated_scan_splits,
        load_table,
    )

    base = load_table(spark, sf_dir, "orders")
    aliased = base.filter(F.col("o_totalprice") > 0).select(
        "o_orderkey", F.col("o_totalprice").alias("SortKeyJoinWindow")
    )
    assert _estimated_scan_splits(spark, aliased) is not None
    for widthy in (
        base.repartition(4),
        base.groupBy("o_orderstatus").count(),
        base.join(base.select("o_orderkey"), "o_orderkey"),
        base.orderBy("o_orderkey"),
        base.limit(10),  # GlobalLimit/LocalLimit: not width-preserving
    ):
        assert _estimated_scan_splits(spark, widthy) is None
