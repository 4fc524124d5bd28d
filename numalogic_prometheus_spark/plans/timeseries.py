"""Time-series alignment operators over `events` — the range-query /
resampling semantics a Prometheus-style engine owns (reference:
numaprom delegates step alignment to the Prometheus range API,
CHANGELOG.md:10 "Prometheus Query Service"; here the engine computes it).

Shared mechanics: samples are first deduplicated to one row per
(event_type, ts) via max(value) so every downstream ordering is
ties-free in both engines; grid alignment uses the *interleaved epoch*
trick — samples sort at 2·t_us, grid points at 2·t_us+1 — so a single
integer range frame expresses "latest sample in (g−lookback, g]"
deterministically, with no self-join and no sample/grid tie ambiguity.

100 TB notes: the only exchange is the per-series window partition; at
scale, partition by (series, calendar bucket) and generate each
bucket's grid inside the partition so no window partition exceeds a
task. The grid itself is generated, never materialized as a table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from numalogic_prometheus_spark.plans import register
from numalogic_prometheus_spark.sources.tables import load_table

_GRID_START = "2024-01-01 00:00:00"
_GRID_END = "2024-01-08 00:00:00"
_STEP_MIN = 5
_LOOKBACK_US = 600_000_000  # 10 minutes

# Deduped sample relation shared by the oracle CTEs.
_SAMPLES_SQL = """
    samples AS (
        SELECT event_type, ts, max(value) AS value
        FROM events GROUP BY event_type, ts
    )
"""
_GRID_SQL = f"""
    grid AS (
        SELECT unnest(generate_series(TIMESTAMP '{_GRID_START}',
                                      TIMESTAMP '{_GRID_END}',
                                      INTERVAL {_STEP_MIN} MINUTE)) AS gts
    ),
    series AS (SELECT DISTINCT event_type FROM events)
"""


def _deduped_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type", "ts").agg(F.max("value").alias("value"))


def _grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type × grid timestamp) — generated, not scanned."""
    ev = load_table(spark, sf_dir, "events").select("event_type").distinct()
    steps = F.explode(
        F.sequence(
            F.lit(_GRID_START).cast("timestamp"),
            F.lit(_GRID_END).cast("timestamp"),
            F.expr(f"interval {_STEP_MIN} minutes"),
        )
    )
    return ev.select("event_type", steps.alias("gts"))


def _interleaved_union(samples: DataFrame, grid: DataFrame) -> DataFrame:
    """Samples at even epochs (2t), grid at odd (2t+1): a range frame
    ending at a grid row then covers exactly the samples with ts ≤ g."""
    s = samples.select(
        "event_type",
        (F.unix_micros("ts") * 2).alias("e2"),
        F.unix_micros("ts").alias("s_us"),
        "value",
        F.lit(None).cast("timestamp").alias("gts"),
    )
    g = grid.select(
        "event_type",
        (F.unix_micros("gts") * 2 + 1).alias("e2"),
        F.lit(None).cast("long").alias("s_us"),
        F.lit(None).cast("double").alias("value"),
        "gts",
    )
    return s.unionByName(g)


@register(
    "ts_step_resample",
    oracle=f"""
    WITH {_SAMPLES_SQL}, {_GRID_SQL},
    joined AS (
        SELECT se.event_type, g.gts, s.value, s.ts,
               row_number() OVER (PARTITION BY se.event_type, g.gts
                                  ORDER BY s.ts DESC) AS rn
        FROM grid g
        CROSS JOIN series se
        LEFT JOIN samples s
          ON s.event_type = se.event_type
         AND s.ts <= g.gts
         AND s.ts > g.gts - INTERVAL 10 MINUTE
    )
    SELECT event_type, gts AS grid_ts, value
    FROM joined WHERE rn = 1
    """,
)
def ts_step_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL-style instant-vector alignment: for every 5-minute grid
    point, the latest sample within a 10-minute lookback (null = stale
    gap). One window over the interleaved union — the lookback is the
    integer range frame (−2L+1, 0], so no grid×samples join exists on
    the Spark side at all."""
    u = _interleaved_union(
        _deduped_samples(spark, sf_dir), _grid(spark, sf_dir)
    )
    w = (
        W.partitionBy("event_type")
        .orderBy("e2")
        .rangeBetween(-(2 * _LOOKBACK_US - 1), 0)
    )
    return (
        u.withColumn("rv", F.last("value", ignorenulls=True).over(w))
        .filter(F.col("gts").isNotNull())
        .select("event_type", F.col("gts").alias("grid_ts"), F.col("rv").alias("value"))
    )


@register(
    "ts_linear_interpolate",
    oracle=f"""
    WITH {_SAMPLES_SQL}, {_GRID_SQL},
    prevs AS (
        SELECT se.event_type, g.gts, s.value AS pv, epoch_us(s.ts) AS pt,
               row_number() OVER (PARTITION BY se.event_type, g.gts
                                  ORDER BY s.ts DESC) AS rn
        FROM grid g CROSS JOIN series se
        LEFT JOIN samples s
          ON s.event_type = se.event_type AND s.ts <= g.gts
    ),
    nexts AS (
        SELECT se.event_type, g.gts, s.value AS nv, epoch_us(s.ts) AS nt,
               row_number() OVER (PARTITION BY se.event_type, g.gts
                                  ORDER BY s.ts ASC) AS rn
        FROM grid g CROSS JOIN series se
        LEFT JOIN samples s
          ON s.event_type = se.event_type AND s.ts > g.gts
    )
    SELECT p.event_type, p.gts AS grid_ts,
           CASE WHEN p.pv IS NOT NULL AND n.nv IS NOT NULL THEN
               round(p.pv + (n.nv - p.pv)
                     * ((epoch_us(p.gts) - p.pt) / (n.nt - p.pt)), 6)
           END AS value
    FROM prevs p
    JOIN nexts n ON n.event_type = p.event_type AND n.gts = p.gts
    WHERE p.rn = 1 AND n.rn = 1
    """,
)
def ts_linear_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation at grid points: value = pv + (nv−pv)·(g−pt)/
    (nt−pt) from the nearest samples on each side (null when either side
    is missing — outside the observed range). prev is inclusive (ts ≤ g),
    next strictly after (ts > g), so a sample landing exactly on the grid
    returns itself and the denominator can never be zero. Two window
    passes over one interleaved union replace both inequality joins."""
    u = _interleaved_union(
        _deduped_samples(spark, sf_dir), _grid(spark, sf_dir)
    )
    wp = (
        W.partitionBy("event_type").orderBy("e2")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    # "nearest following" as a RUNNING frame over the REVERSED sort:
    # Spark evaluates (0, unboundedFollowing) frames by re-scanning the
    # partition tail per row — O(rows²) per series, ~50s at sf0.1 —
    # while running (unboundedPreceding, 0) frames accumulate in O(rows).
    # last(ignorenulls) over e2 DESC ≡ first(ignorenulls) over (0, ∞) ASC.
    wn = (
        W.partitionBy("event_type").orderBy(F.col("e2").desc())
        .rowsBetween(W.unboundedPreceding, 0)
    )
    g_us = F.unix_micros("gts")
    interp = F.when(
        F.col("pv").isNotNull() & F.col("nv").isNotNull(),
        F.round(
            F.col("pv")
            + (F.col("nv") - F.col("pv"))
            * ((g_us - F.col("pt")) / (F.col("nt") - F.col("pt"))),
            6,
        ),
    )
    return (
        u.withColumn("pv", F.last("value", ignorenulls=True).over(wp))
        .withColumn("pt", F.last("s_us", ignorenulls=True).over(wp))
        .withColumn("nv", F.last("value", ignorenulls=True).over(wn))
        .withColumn("nt", F.last("s_us", ignorenulls=True).over(wn))
        .filter(F.col("gts").isNotNull())
        .select(
            "event_type",
            F.col("gts").alias("grid_ts"),
            interp.alias("value"),
        )
    )


@register(
    "ts_ohlc_hourly",
    oracle="""
    WITH samples AS (
        SELECT event_type, ts, max(value) AS value
        FROM events GROUP BY event_type, ts
    )
    SELECT event_type, date_trunc('hour', ts) AS bucket,
           arg_min(value, ts) AS open,
           max(value) AS high,
           min(value) AS low,
           arg_max(value, ts) AS close,
           count(*)::BIGINT AS n_samples
    FROM samples
    GROUP BY event_type, date_trunc('hour', ts)
    """,
)
def ts_ohlc_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLC bars per series — the downsampling shape dashboards
    read instead of raw samples. min_by/max_by on the ties-free deduped
    relation; one partial-aggregating exchange, values pass through
    un-arithmetized so both engines emit identical doubles."""
    s = _deduped_samples(spark, sf_dir)
    return (
        s.groupBy("event_type", F.date_trunc("hour", "ts").alias("bucket"))
        .agg(
            F.min_by("value", "ts").alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", "ts").alias("close"),
            F.count(F.lit(1)).alias("n_samples"),
        )
    )


@register(
    "ts_sessionize_gap",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts, event_id, value,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    numbered AS (
        SELECT user_id, ts, value,
               sum(new_session) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING)::BIGINT
                   AS session_idx
        FROM flagged
    )
    SELECT user_id, session_idx,
           min(ts) AS session_start, max(ts) AS session_end,
           count(*)::BIGINT AS n_events,
           round(sum(value), 2) AS total_value
    FROM numbered
    GROUP BY user_id, session_idx
    """,
)
def ts_sessionize_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization by 30-minute inactivity gap (the batch twin
    of stream_session_windows): lag-flag new sessions, integer running
    sum numbers them (int cumsum is engine-reproducible where double
    prefix sums are not), then one agg per session. Both windows and the
    aggregate share the user_id partitioning — a single exchange."""
    ev = load_table(spark, sf_dir, "events")
    wo = W.partitionBy("user_id").orderBy("ts", "event_id")
    new_s = F.when(
        F.lag("ts").over(wo).isNull()
        | (
            F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(wo))
            > 30 * 60 * 1_000_000
        ),
        F.lit(1),
    ).otherwise(F.lit(0))
    return (
        ev.withColumn("new_session", new_s)
        .withColumn(
            "session_idx",
            F.sum("new_session")
            .over(wo.rowsBetween(W.unboundedPreceding, 0))
            .cast("long"),
        )
        .groupBy("user_id", "session_idx")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


_EWMA_TAU_US = 3_600_000_000  # 1 hour


@register("ts_ewma_irregular")  # sequential recurrence: not SQL-expressible
def ts_ewma_irregular(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Irregular-interval EWMA (τ = 1 h) per series: s_i = α·v_i +
    (1−α)·s_{i−1}, α = 1 − exp(−Δt/τ). The recurrence is inherently
    sequential per series, so it runs as an Arrow-batched applyInPandas
    over event_type groups — the per-series state pattern
    streaming/stateful.py uses, in batch form. Rows-only entry (no SQL
    oracle); determinism is pinned by the (ts, event_id) sort."""
    import numpy as np
    import pandas as pd

    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "ts", "event_id", "value"
    )

    def ewma(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"]).reset_index(drop=True)
        # Arrow hands timestamps to pandas as datetime64[ns]; the decay
        # constant is in microseconds, so convert ns -> us here or Δt/τ
        # runs 1000x hot and the 1-hour constant decays in ~3.6s.
        t_us = pdf["ts"].astype("int64").to_numpy() // 1_000
        v = pdf["value"].to_numpy()
        out = np.empty(len(v))
        state = v[0] if len(v) else 0.0
        prev_t = t_us[0] if len(v) else 0
        for i in range(len(v)):
            alpha = 1.0 - float(np.exp(-(t_us[i] - prev_t) / _EWMA_TAU_US))
            state = alpha * v[i] + (1.0 - alpha) * state
            out[i] = state
            prev_t = t_us[i]
        return pd.DataFrame(
            {
                "event_type": pdf["event_type"],
                "ts": pdf["ts"],
                "value": v,
                "ewma": np.round(out, 6),
            }
        )

    return ev.groupBy("event_type").applyInPandas(
        ewma, "event_type string, ts timestamp, value double, ewma double"
    )


@register("ts_holt_winters_level_trend")  # sequential recurrence → rows-only
def ts_holt_winters_level_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt's double exponential smoothing per series (PromQL
    `holt_winters(v[r], sf, tf)` analog): level/trend recurrence
    l_i = α·v_i + (1−α)(l_{i−1}+b_{i−1}), b_i = β(l_i−l_{i−1}) +
    (1−β)b_{i−1} with α=0.3, β=0.1. Sequential per series → Arrow-batched
    applyInPandas, (ts, event_id)-sorted for determinism; emits the final
    smoothed value and one-step forecast per series plus sample count."""
    import numpy as np
    import pandas as pd

    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "ts", "event_id", "value"
    )

    def hw(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"]).reset_index(drop=True)
        v = pdf["value"].to_numpy()
        if len(v) < 2:
            lvl, trend = (v[0] if len(v) else 0.0), 0.0
        else:
            lvl, trend = v[0], v[1] - v[0]
            for x in v[1:]:
                prev = lvl
                lvl = 0.3 * x + 0.7 * (lvl + trend)
                trend = 0.1 * (lvl - prev) + 0.9 * trend
        return pd.DataFrame(
            {
                "event_type": [pdf["event_type"].iloc[0]],
                "n_samples": [np.int64(len(v))],
                "level": [round(float(lvl), 6)],
                "trend": [round(float(trend), 6)],
                "forecast_1": [round(float(lvl + trend), 6)],
            }
        )

    return ev.groupBy("event_type").applyInPandas(
        hw,
        "event_type string, n_samples long, level double, "
        "trend double, forecast_1 double",
    )
