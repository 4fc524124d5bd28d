"""Streaming queries (SURVEY.md §2C streaming-only rows), driven to
completion through a memory sink so the driver contract (batch DataFrame
out) holds. Tumbling/sliding/session/stream-static are oracle-checked —
their batch-equivalent SQL is exact; dedup-within-watermark and the
stateful seam are rows-only by nature.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from numalogic_prometheus_spark.plans import register
from numalogic_prometheus_spark.sources.tables import load_table
from numalogic_prometheus_spark.streaming import run_stream_to_memory, stream_events


@register(
    "stream_tumbling_counts",
    oracle="""
    SELECT date_trunc('hour', ts) AS window_start,
           event_type,
           count(*) AS n,
           round(sum(value), 4) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def stream_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window streaming aggregation (A3/B2) run as a real
    streaming query (file source → watermark → window → memory sink,
    complete mode): result must equal the batch date_trunc aggregation —
    the unified-model guarantee the engine is built on."""
    ev = stream_events(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )
    return run_stream_to_memory(agg, output_mode="complete")


@register(
    "stream_sliding_counts",
    oracle="""
    WITH starts AS (
        SELECT event_type, value,
               unnest([
                   date_trunc('hour', ts)
                       + to_minutes((minute(ts) // 30) * 30),
                   date_trunc('hour', ts)
                       + to_minutes((minute(ts) // 30) * 30 - 30)
               ]) AS window_start
        FROM events
    )
    SELECT window_start, event_type,
           count(*) AS n, round(sum(value), 4) AS sum_value
    FROM starts
    GROUP BY 1, 2
    """,
)
def stream_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window streaming aggregation (B5 rolling stats): 1h window
    sliding 30m — every event lands in exactly 2 windows; the oracle
    expands the 2 candidate starts per event explicitly."""
    ev = stream_events(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour", "30 minutes"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )
    return run_stream_to_memory(agg, output_mode="complete")


@register(
    "stream_session_windows",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts,
               -- >= not >: Spark's session ranges are end-exclusive
               -- ([start, start+gap)), so an event landing exactly on
               -- the 10-minute boundary starts a NEW session
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w >= INTERVAL 10 MINUTE
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    sessions AS (
        SELECT user_id, ts,
               sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                      ROWS UNBOUNDED PRECEDING) AS session_id
        FROM flagged
    )
    SELECT user_id, min(ts) AS session_start, count(*) AS n_events
    FROM sessions
    GROUP BY user_id, session_id
    """,
)
def stream_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (entity activity sessions over events,
    [north-star]): session_window(ts, 10 min) per user. The oracle is the
    classic lag+cumsum gap-merge — semantically identical to Spark's
    session merge."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "10 minutes"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            "n_events",
        )
    )


@register(
    "stream_static_join",
    oracle="""
    SELECT d.type_label, count(*) AS n, round(sum(e.value), 4) AS sum_value
    FROM events e
    JOIN (SELECT DISTINCT event_type, upper(event_type) AS type_label
          FROM events) d
      ON e.event_type = d.event_type
    GROUP BY d.type_label
    """,
)
def stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join (B12: per-microbatch model/dimension lookup):
    streaming events joined to a static dimension, then aggregated —
    the static side is re-resolved per micro-batch, which is exactly how
    the reference hot-reloads registry state (CHANGELOG.md:173)."""
    static_dim = (
        load_table(spark, sf_dir, "events")
        .select("event_type")
        .distinct()
        .withColumn("type_label", F.upper("event_type"))
    )
    ev = stream_events(spark, sf_dir)
    agg = (
        ev.join(F.broadcast(static_dim), "event_type")
        .groupBy("type_label")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
    )
    return run_stream_to_memory(agg, output_mode="complete")


@register("stream_dedup_within_watermark")  # streaming state → rows-only
def stream_dedup_within_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dedup (B3, CHANGELOG.md:189: payload dedup by timestamp +
    composite key): dropDuplicatesWithinWatermark on (user_id, ts) —
    state is bounded by the watermark instead of growing forever (the
    100 TB requirement for infinite streams)."""
    ev = stream_events(spark, sf_dir)
    deduped = (
        ev.withWatermark("ts", "30 minutes")
        .dropDuplicatesWithinWatermark(["user_id", "ts"])
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_unique"))
    )
    return run_stream_to_memory(deduped, output_mode="complete")


@register("stream_stateful_scaler")  # applyInPandasWithState → rows-only
def stream_stateful_scaler(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful scaler fit (B5, CHANGELOG.md:456): per-key running
    (n, Σx, Σx²) via applyInPandasWithState, emitting cumulative mean/std
    per micro-batch — the streaming replacement for the reference's
    Redis-persisted scaler artifacts."""
    from numalogic_prometheus_spark.streaming.stateful import stateful_running_stats

    ev = stream_events(spark, sf_dir)
    out = stateful_running_stats(ev.groupBy("event_type"))
    return run_stream_to_memory(out, output_mode="update")
