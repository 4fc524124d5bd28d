"""Metric-discipline queries (SURVEY.md §2A → driver `queries()` entries).

Each query binds a discipline operator (operators/metrics.py) to the
``events`` fixture (FIXTURES.md: the metric-sample relation) and pairs it
with a DuckDB oracle. Float aggregates are rounded to 4 decimals in BOTH
engines so summation-order fp noise cannot flip the driver's value hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from numalogic_prometheus_spark.operators import metrics as M
from numalogic_prometheus_spark.plans import register
from numalogic_prometheus_spark.sources.tables import load_table


@register(
    "counter_hourly",
    oracle="""
    SELECT date_trunc('hour', ts) AS hour,
           event_type,
           count(*) AS n_events,
           round(sum(value), 4) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def counter_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Counter discipline (reference metrics.py:64-68) over hourly windows:
    per-(hour, event_type) event counts + value sums. The flagship query —
    scan → project → agg → (driver collects). Single hash exchange."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        F.date_trunc("hour", "ts").alias("hour"),
        "event_type",
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    )


@register(
    "gauge_latest_per_user",
    oracle="""
    SELECT user_id,
           arg_max(value, ts) AS gauge_value,
           max(ts) AS last_ts
    FROM events
    GROUP BY user_id
    """,
)
def gauge_latest_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gauge discipline (reference metrics.py:144-152): last-write-wins per
    series via single-pass max_by — no window function, no second shuffle."""
    ev = load_table(spark, sf_dir, "events")
    return M.gauge_latest(ev, ["user_id"])


@register(
    "summary_by_type",
    oracle="""
    SELECT event_type,
           count(value) AS obs_count,
           round(sum(value), 4) AS obs_sum,
           round(quantile_cont(value, 0.5), 4) AS q50,
           round(quantile_cont(value, 0.9), 4) AS q90,
           round(quantile_cont(value, 0.99), 4) AS q99
    FROM events
    GROUP BY event_type
    """,
)
def summary_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Summary discipline (reference metrics.py:120-124): count+sum per
    series, plus exact quantiles (read-side superset; the pinned client
    emits none — SURVEY.md §2A). Exact `percentile` for oracle parity;
    production at 100 TB would use percentile_approx (mergeable sketch)."""
    ev = load_table(spark, sf_dir, "events")
    out = M.summary(ev, ["event_type"])
    return out.select(
        "event_type",
        "obs_count",
        F.round("obs_sum", 4).alias("obs_sum"),
        F.round("q50", 4).alias("q50"),
        F.round("q90", 4).alias("q90"),
        F.round("q99", 4).alias("q99"),
    )


_BOUNDS_SQL = ",".join(str(b) for b in M.DEFAULT_BUCKETS)


@register(
    "histogram_cumulative",
    oracle=f"""
    SELECT event_type, le,
           sum(CASE WHEN value <= le THEN 1 ELSE 0 END)::BIGINT AS cum_count
    FROM events
    CROSS JOIN (SELECT unnest([{_BOUNDS_SQL}, 'inf'::DOUBLE]) AS le) buckets
    GROUP BY event_type, le
    """,
)
def histogram_cumulative(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram discipline (reference metrics.py:173-177): cumulative `le`
    bucket counts with prometheus-client 0.18 default bounds + +Inf.
    Cumulative ≡ `sum(value <= le)`, so it's one conditional aggregation."""
    ev = load_table(spark, sf_dir, "events")
    return M.histogram_buckets(ev, ["event_type"])


@register(
    "info_latest_per_user",
    oracle="""
    SELECT user_id, ts AS info_ts, props AS info
    FROM (
        SELECT user_id, ts, props,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    )
    WHERE rn = 1
    """,
)
def info_latest_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Info discipline (reference metrics.py:91-99): latest metadata snapshot
    per series = row_number()==1 over ts desc (SCD read side)."""
    ev = load_table(spark, sf_dir, "events")
    return M.info_latest(ev, ["user_id"], "props", tiebreak="event_id")


@register(
    "exposition_counter",
    oracle="""
    SELECT 'events_total{event_type="' || event_type || '"} '
           || count(*)::VARCHAR AS line
    FROM events
    GROUP BY event_type
    """,
)
def exposition_counter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exposition sink (reference numaprom/monitoring/__init__.py:16-24):
    render `name{labels} value` text lines, deterministically ordered labels
    (SURVEY.md §4.3 exposition determinism)."""
    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    return M.exposition_lines(counts, "events_total", ["event_type"], "n")


@register(
    "exposition_full_registry",
    oracle="""
    SELECT 'events_total{event_type="' || event_type || '"} '
           || count(*)::VARCHAR AS line
    FROM events GROUP BY event_type
    UNION ALL
    SELECT 'events_value{event_type="' || event_type || '"} '
           || round(arg_max(value, ts), 4)::VARCHAR AS line
    FROM events GROUP BY event_type
    """,
)
def exposition_full_registry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-registry scrape (A10): every family rendered and merged via
    unionByName — the relational form of REGISTRY.collect() iterating all
    collectors per scrape (reference monitoring/__init__.py:16-24).
    Gauge values rendered through round(…,4)::string, identical casts in
    both engines."""
    ev = load_table(spark, sf_dir, "events")
    counters = M.counter(ev, ["event_type"]).select(
        "event_type", F.col("n_samples").alias("v")
    )
    counter_lines = M.exposition_lines(counters, "events_total", ["event_type"], "v")
    gauges = M.gauge_latest(ev, ["event_type"]).select(
        "event_type", F.round("gauge_value", 4).alias("v")
    )
    gauge_lines = M.exposition_lines(gauges, "events_value", ["event_type"], "v")
    return counter_lines.unionByName(gauge_lines)


@register(
    "label_merge_right_biased",
    oracle="""
    SELECT DISTINCT 'prod' AS env, event_type AS merged_region
    FROM events
    """,
)
def label_merge_right_biased(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label algebra (reference metrics.py:65-67): right-biased map union —
    per-call labels override static defaults under the session invariant
    mapKeyDedupPolicy=LAST_WIN. Result surfaced as scalar lookups so the
    oracle compares values, not map encodings."""
    ev = load_table(spark, sf_dir, "events")
    static = F.create_map(
        F.lit("env"), F.lit("prod"), F.lit("region"), F.lit("default")
    )
    dynamic = F.create_map(F.lit("region"), F.col("event_type"))
    merged = M.merge_labels(static, dynamic)
    return ev.select(
        F.element_at(merged, "env").alias("env"),
        F.element_at(merged, "region").alias("merged_region"),
    ).distinct()
