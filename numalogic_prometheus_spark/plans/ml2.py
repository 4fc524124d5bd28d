"""ML scoring, batch 2 — seasonal baselines and conformal thresholds,
the calibration shapes that sit beside the scalers/thresholds in
operators/ml.py (reference pipeline B5/B7: train-window statistics
applied to a score window; CHANGELOG.md:189 windowed per-key payloads).

Both queries follow the same scale template as pipeline_anomaly_scores:
the statistics relation is tiny (per series, or per series×hour-of-day)
and broadcasts back onto the fact stream — the fact table is never
reshuffled to be scored.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from numalogic_prometheus_spark.plans import register
from numalogic_prometheus_spark.sources.tables import load_table

_SPLIT = "2024-01-22"  # train/calibrate before, score after


@register(
    "ml_seasonal_zscore",
    oracle=f"""
    WITH base AS (
        SELECT event_type, hour(ts) AS hod,
               avg(value) AS mu, stddev_samp(value) AS sd
        FROM events WHERE ts < TIMESTAMP '{_SPLIT}'
        GROUP BY event_type, hour(ts)
    )
    SELECT e.event_type, e.ts, e.value,
           round((e.value - b.mu) / nullif(b.sd, 0), 6) AS z_score,
           coalesce(abs(round((e.value - b.mu) / nullif(b.sd, 0), 6)) > 3,
                    false) AS is_anomaly
    FROM events e
    JOIN base b ON b.event_type = e.event_type AND b.hod = hour(e.ts)
    WHERE e.ts >= TIMESTAMP '{_SPLIT}'
    """,
)
def ml_seasonal_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day seasonal baseline: per-(series, hour-of-day) mean/std
    from the train window scores the tail window as a seasonal z-score.
    The baseline is series×24 rows — broadcast; anomaly flags compare the
    ROUNDED z so the |z|>3 boundary resolves identically cross-engine."""
    ev = load_table(spark, sf_dir, "events")
    split = F.lit(_SPLIT).cast("timestamp")
    base = (
        ev.filter(F.col("ts") < split)
        .groupBy("event_type", F.hour("ts").alias("hod"))
        .agg(F.avg("value").alias("mu"), F.stddev_samp("value").alias("sd"))
    )
    score = ev.filter(F.col("ts") >= split)
    z = F.round(
        (F.col("value") - F.col("mu")) / F.nullif(F.col("sd"), F.lit(0.0)), 6
    )
    return (
        score.join(
            F.broadcast(base),
            (score.event_type == base.event_type) & (F.hour(score.ts) == base.hod),
        )
        .select(
            score.event_type,
            "ts",
            "value",
            z.alias("z_score"),
            # coalesce: degenerate train cells (one sample → null stddev)
            # must flag false, and null booleans canonicalize differently
            # across the two engines' pandas bridges.
            F.coalesce(F.abs(z) > 3, F.lit(False)).alias("is_anomaly"),
        )
    )


@register(
    "ml_conformal_threshold",
    oracle=f"""
    WITH cal AS (
        SELECT event_type,
               round(quantile_cont(value, 0.95), 6) AS threshold
        FROM events WHERE ts < TIMESTAMP '{_SPLIT}'
        GROUP BY event_type
    )
    SELECT e.event_type, c.threshold,
           count(*)::BIGINT AS n_scored,
           sum(CASE WHEN e.value > c.threshold THEN 1 ELSE 0 END)::BIGINT
               AS n_anomalies,
           1.0 - sum(CASE WHEN e.value > c.threshold THEN 1 ELSE 0 END)
                 / count(*)::DOUBLE AS empirical_coverage
    FROM events e
    JOIN cal c ON c.event_type = e.event_type
    WHERE e.ts >= TIMESTAMP '{_SPLIT}'
    GROUP BY e.event_type, c.threshold
    """,
)
def ml_conformal_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal threshold: the 95th percentile (exact, linear
    interpolation) of each series' calibration window becomes its score-
    window threshold; empirical coverage reports how close the holdout
    exceedance rate lands to the nominal 5%. Exact percentile is one
    shuffle of the (small) calibration slice; the threshold relation
    broadcasts onto the score slice."""
    ev = load_table(spark, sf_dir, "events")
    split = F.lit(_SPLIT).cast("timestamp")
    cal = (
        ev.filter(F.col("ts") < split)
        .groupBy("event_type")
        .agg(F.round(F.percentile("value", 0.95), 6).alias("threshold"))
    )
    score = ev.filter(F.col("ts") >= split)
    exceed = F.when(F.col("value") > F.col("threshold"), 1).otherwise(0)
    return (
        score.join(F.broadcast(cal), "event_type")
        .groupBy("event_type", "threshold")
        .agg(
            F.count(F.lit(1)).alias("n_scored"),
            F.sum(exceed).alias("n_anomalies"),
            # unrounded exact-integer ratio (r8 sweep tie class)
            (
                1.0 - F.sum(exceed) / F.count(F.lit(1)).cast("double")
            ).alias("empirical_coverage"),
        )
    )
