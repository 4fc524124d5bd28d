"""Load-boundary event-time normalization (round-5 postmortem).

The driver environment surfaced ``events.ts`` (and ``lineitem.l_shipdate``,
``orders.o_orderdate``) as TIMESTAMP_NTZ — tz-naive parquet under Spark 4's
``inferTimestampNTZ`` default — which broke every ``unix_micros`` call site
and every ``withWatermark``. The engine's contract is that the canonical
relations guarantee ``TimestampType`` regardless of the parquet encoding
(LongType nanos, TIMESTAMP, TIMESTAMP_NTZ). These tests pin that contract
under BOTH encodings so the next storage-type drift fails here, not in the
driver.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from numalogic_prometheus_spark.sources.tables import (
    load_table,
    normalize_event_time,
)

TIME_COLS = {
    "events": ["ts"],
    "lineitem": ["l_shipdate"],
    "orders": ["o_orderdate"],
}


@pytest.mark.parametrize("table", sorted(TIME_COLS))
def test_load_table_yields_timestamp_type(spark, sf_dir, table):
    df = load_table(spark, sf_dir, table)
    for c in TIME_COLS[table]:
        assert isinstance(df.schema[c].dataType, T.TimestampType), (
            f"{table}.{c} must surface as TIMESTAMP, got "
            f"{df.schema[c].dataType}"
        )


def test_load_table_absorbs_ntz_encoding(spark, sf_dir):
    """Even when the session is configured to infer NTZ (a vanilla driver
    session), the loader's cast guard must still yield TIMESTAMP — and the
    values must be the UTC reinterpretation of the naive micros."""
    prev = spark.conf.get("spark.sql.parquet.inferTimestampNTZ.enabled")
    try:
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
        raw = spark.read.parquet(f"{sf_dir}/events.parquet")
        if not isinstance(raw.schema["ts"].dataType, T.TimestampNTZType):
            pytest.skip("fixture parquet is not tz-naive in this env")
        df = normalize_event_time(raw)
        assert isinstance(df.schema["ts"].dataType, T.TimestampType)
        # Pure reinterpretation under UTC: identical micros values.
        a = raw.select(
            F.unix_micros(F.col("ts").cast("timestamp")).alias("us")
        ).agg(F.sum("us"), F.min("us"), F.max("us")).collect()[0]
        b = df.select(F.unix_micros("ts").alias("us")).agg(
            F.sum("us"), F.min("us"), F.max("us")
        ).collect()[0]
        assert tuple(a) == tuple(b)
    finally:
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", prev)


def test_epoch_us_accepts_both_encodings(spark):
    from numalogic_prometheus_spark.functions.timeutil import epoch_us

    df = spark.sql(
        "SELECT timestamp'2024-01-02 03:04:05.123456' AS t_tz, "
        "timestamp_ntz'2024-01-02 03:04:05.123456' AS t_ntz"
    )
    row = df.select(
        epoch_us("t_tz").alias("a"), epoch_us("t_ntz").alias("b")
    ).collect()[0]
    assert row.a == row.b


def test_watermark_accepts_loader_output(spark, sf_dir):
    """withWatermark is the strictest consumer of event-time typing
    (rejects NTZ outright) — assert the canonical events relation
    satisfies it. Full streaming execution is covered in
    tests/test_streaming_native.py; this pins just the type contract."""
    ev = load_table(spark, sf_dir, "events")
    # Raises AnalysisException(EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE) if
    # the loader ever leaks NTZ again.
    ev.withWatermark("ts", "1 hour").schema


def test_stream_watermark_under_ntz_schema(spark, sf_dir, tmp_path):
    """Streaming twin of the loader guard: a file stream whose explicit
    schema types event time as TIMESTAMP_NTZ must still support
    withWatermark after normalize_event_time — proven end-to-end with a
    windowed aggregation into a memory sink."""
    from numalogic_prometheus_spark.streaming.runner import (
        run_stream_to_memory,
    )

    src = str(tmp_path / "stream_src")
    spark.read.parquet(f"{sf_dir}/events.parquet").limit(200).write.mode(
        "overwrite"
    ).parquet(src)
    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp_ntz, user_id long, "
            "event_type string, value double, props string"
        )
        .parquet(src)
    )
    assert isinstance(stream.schema["ts"].dataType, T.TimestampNTZType)
    stream = normalize_event_time(stream)
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .count()
    )
    out = run_stream_to_memory(agg, output_mode="complete")
    assert out.count() > 0
