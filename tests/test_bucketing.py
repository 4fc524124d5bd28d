"""Bucketed-table co-located join: the 100 TB answer to repeated fact↔fact
joins on the same key (SURVEY.md §2C shuffle-join row). Writing both fact
tables bucketed by the join key lets every subsequent join skip its
exchange entirely — verified on the physical plan."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from numalogic_prometheus_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    li = load_table(spark, "/root/testdata/sf0.001", "lineitem")
    o = load_table(spark, "/root/testdata/sf0.001", "orders")
    (
        li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("li_bucketed")
    )
    (
        o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("ord_bucketed")
    )
    yield "li_bucketed", "ord_bucketed"
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS ord_bucketed")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    li_t, o_t = bucketed_tables
    # tiny test tables auto-broadcast, which hides the bucketed path —
    # disable it so the plan shows what a 100 TB fact↔fact join would do
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        li = spark.table(li_t)
        o = spark.table(o_t)
        joined = (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            joined.explain("formatted")
        plan = buf.getvalue()
        # co-located: the join introduces no exchange on either key; the
        # only exchange in the plan is the final group-by
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert "Exchange hashpartitioning(l_orderkey" not in plan
        assert "Exchange hashpartitioning(o_orderkey" not in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_results_match_plain(spark, bucketed_tables):
    li_t, o_t = bucketed_tables
    bucketed = (
        spark.table(li_t)
        .join(spark.table(o_t), F.col("l_orderkey") == F.col("o_orderkey"))
        .count()
    )
    li = load_table(spark, "/root/testdata/sf0.001", "lineitem")
    o = load_table(spark, "/root/testdata/sf0.001", "orders")
    plain = li.join(o, li.l_orderkey == o.o_orderkey).count()
    assert bucketed == plain
