"""ML-pipeline queries (SURVEY.md §2B B4–B10 → §7 step 6).

Deterministic expression math everywhere except the B6 inference seam
(rows-only). Scaler/threshold fits are tiny per-key relations broadcast
back onto the fact side — no second shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from numalogic_prometheus_spark.operators import ml as ML
from numalogic_prometheus_spark.plans import register
from numalogic_prometheus_spark.sources.tables import load_table


@register(
    "ml_zscore_scaled",
    oracle="""
    SELECT e.event_id, e.event_type,
           round(CASE WHEN s.sigma = 0 THEN 0.0
                      ELSE (e.value - s.mu) / s.sigma END, 6) AS zscore
    FROM events e
    JOIN (SELECT event_type, avg(value) AS mu, stddev_samp(value) AS sigma
          FROM events GROUP BY event_type) s USING (event_type)
    """,
)
def ml_zscore_scaled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B5 standard scaler (stateful preproc, CHANGELOG.md:456): fit per-key
    (μ,σ), broadcast-join back, closed-form transform."""
    ev = load_table(spark, sf_dir, "events")
    fitted = ML.fit_zscore(ev, ["event_type"], "value")
    out = ML.transform_zscore(ev, fitted, ["event_type"], "value")
    return out.select(
        "event_id", "event_type", F.round("zscore", 6).alias("zscore")
    )


@register(
    "ml_minmax_scaled",
    oracle="""
    SELECT e.event_id, e.user_id,
           CASE WHEN s.vmax - s.vmin = 0 THEN 0.0
                ELSE (e.value - s.vmin) / (s.vmax - s.vmin) END AS scaled
    FROM events e
    JOIN (SELECT user_id, min(value) AS vmin, max(value) AS vmax
          FROM events GROUP BY user_id) s USING (user_id)
    """,
)
def ml_minmax_scaled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B5 min-max scaler per entity key.

    Unrounded (r9, closing the round-8 tie class): vmin/vmax are exact
    SELECTIONS of parquet doubles (not sums), so (v−vmin)/(vmax−vmin) is
    two IEEE subtractions and one IEEE division of bit-identical inputs —
    bit-identical cross-engine. The old round(·, 6) was the only possible
    divergence source (the .5-ulp tie class, SCALE.md round-8 section)."""
    ev = load_table(spark, sf_dir, "events")
    fitted = ML.fit_minmax(ev, ["user_id"], "value")
    out = ML.transform_minmax(ev, fitted, ["user_id"], "value")
    return out.select("event_id", "user_id", "scaled")


@register(
    "ml_tanh_scaled",
    oracle="""
    SELECT e.event_id, e.event_type,
           -- DuckDB 1.0 has no tanh(); exp-formula equivalent
           round(CASE WHEN s.sigma = 0 THEN 0.5
                      ELSE 0.5 * ((exp(2 * 0.01 * (e.value - s.mu) / s.sigma) - 1)
                                  / (exp(2 * 0.01 * (e.value - s.mu) / s.sigma) + 1)
                                  + 1)
                 END, 6) AS tanh_scaled
    FROM events e
    JOIN (SELECT event_type, avg(value) AS mu, stddev_samp(value) AS sigma
          FROM events GROUP BY event_type) s USING (event_type)
    """,
)
def ml_tanh_scaled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B5 tanh scaler (CHANGELOG.md:190): bounded (0,1), outlier-robust."""
    ev = load_table(spark, sf_dir, "events")
    fitted = ML.fit_zscore(ev, ["event_type"], "value")
    out = ev.join(F.broadcast(fitted), ["event_type"]).select(
        "event_id",
        "event_type",
        F.round(
            ML.tanh_scale(F.col("value"), F.col("mu"), F.col("sigma")), 6
        ).alias("tanh_scaled"),
    )
    return out


@register(
    "ml_static_threshold",
    oracle="""
    SELECT event_id, event_type, value,
           (value > 150.0)::INTEGER AS anomaly,
           value / 150.0 AS anomaly_score
    FROM events
    """,
)
def ml_static_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B7 static thresholding (CHANGELOG.md:369): config-limit compare +
    ratio score (the inference-failure fallback path)."""
    ev = load_table(spark, sf_dir, "events")
    out = ML.static_threshold(ev, "value", 150.0)
    return out.select(
        "event_id", "event_type", "value",
        F.col("anomaly"),
        F.col("anomaly_score").alias("anomaly_score"),
    )


@register(
    "ml_quantile_threshold",
    oracle="""
    SELECT e.event_id, e.event_type,
           (e.value > t.threshold)::INTEGER AS anomaly,
           round(t.threshold, 6) AS threshold
    FROM events e
    JOIN (SELECT event_type, quantile_cont(value, 0.95) AS threshold
          FROM events GROUP BY event_type) t USING (event_type)
    """,
)
def ml_quantile_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B7 trained thresholding (CHANGELOG.md:447): per-key p95 cutoff
    fitted from history, broadcast back, flag exceedances."""
    ev = load_table(spark, sf_dir, "events")
    fitted = ML.quantile_threshold(ev, ["event_type"], "value", 0.95)
    return ev.join(F.broadcast(fitted), ["event_type"]).select(
        "event_id",
        "event_type",
        (F.col("value") > F.col("threshold")).cast("int").alias("anomaly"),
        F.round("threshold", 6).alias("threshold"),
    )


@register(
    "ml_ensemble_unified",
    oracle="""
    WITH stats AS (
        SELECT event_type, avg(value) AS mu, stddev_samp(value) AS sigma,
               min(value) AS vmin, max(value) AS vmax
        FROM events GROUP BY event_type
    ),
    scored AS (
        SELECT e.user_id, e.event_type,
               abs(CASE WHEN s.sigma = 0 THEN 0.0
                        ELSE (e.value - s.mu) / s.sigma END) AS z_abs,
               CASE WHEN s.vmax - s.vmin = 0 THEN 0.0
                    ELSE (e.value - s.vmin) / (s.vmax - s.vmin) END AS mm
        FROM events e JOIN stats s USING (event_type)
    ),
    ensembled AS (
        SELECT user_id, event_type,
               (z_abs * 0.7 + mm * 0.3) / 1.0 AS ensemble
        FROM scored
    )
    SELECT user_id,
           -- DuckDB 1.0 has no tanh(); exp-formula equivalent
           round((exp(2 * max(ensemble)) - 1)
                 / (exp(2 * max(ensemble)) + 1) * 10.0, 6) AS unified_score
    FROM ensembled
    GROUP BY user_id
    """,
)
def ml_ensemble_unified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B8 ensemble (CHANGELOG.md:317) + B9 unified score (CHANGELOG.md:293)
    + B10 postprocess (CHANGELOG.md:42): weighted combine of two scaler
    scores per sample → max per entity → tanh-squashed to [0,10]."""
    ev = load_table(spark, sf_dir, "events")
    stats = ev.groupBy("event_type").agg(
        F.avg("value").alias("mu"),
        F.stddev_samp("value").alias("sigma"),
        F.min("value").alias("vmin"),
        F.max("value").alias("vmax"),
    )
    z = F.when(F.col("sigma") == 0, 0.0).otherwise(
        (F.col("value") - F.col("mu")) / F.col("sigma")
    )
    mm = F.when(F.col("vmax") - F.col("vmin") == 0, 0.0).otherwise(
        (F.col("value") - F.col("vmin")) / (F.col("vmax") - F.col("vmin"))
    )
    scored = ev.join(F.broadcast(stats), ["event_type"]).select(
        "user_id",
        "event_type",
        F.abs(z).alias("z_abs"),
        mm.alias("mm"),
    )
    ensembled = ML.ensemble_score(scored, ["z_abs", "mm"], [0.7, 0.3])
    unified = ML.unified_score(ensembled, ["user_id"], "ensemble", how="max")
    return unified.select(
        "user_id", ML.postprocess_norm(F.col("unified_score")).alias("unified_score")
    )


@register("ml_reconstruction_error")  # B6 inference seam → rows-only
def ml_reconstruction_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B6 model inference (CHANGELOG.md:139): window vectors per
    (user, hour) scored by the deterministic stand-in autoencoder via
    Arrow-batched applyInPandas — the engine's only Python hot path."""
    ev = load_table(spark, sf_dir, "events")
    vecs = (
        ev.groupBy("user_id", F.date_trunc("hour", "ts").alias("hour"))
        .agg(
            F.array_sort(
                F.collect_list(F.struct("ts", "event_id", "value"))
            ).alias("__sorted")
        )
        .select(
            "user_id",
            "hour",
            F.transform(F.col("__sorted"), lambda s: s.value).alias("window_vec"),
        )
    )
    return ML.reconstruction_error(
        vecs, ["user_id", "hour"], "window_vec",
        out_schema="user_id long, hour timestamp, recon_error double",
    )
