"""The composed anomaly-detection pipeline (SURVEY.md §2B end-to-end) and
skew-hardened aggregation patterns.

`pipeline_anomaly_scores` is the engine's statement piece: the reference's
whole changelog-evidenced dataflow — window assembly (B2), dedup (B3),
NaN cleaning (B4), scaling (B5), scoring w/ static-threshold fallback
(B7), ensemble (B8), unified score (B9), postprocess (B10) — as ONE
declarative plan that Catalyst optimizes end-to-end, differential-checked
against DuckDB. In the reference these were six Numaflow vertices with
Redis state between them; here the optimizer sees the whole graph.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from numalogic_prometheus_spark.plans import register
from numalogic_prometheus_spark.sources.tables import load_table


@register(
    "pipeline_anomaly_scores",
    oracle="""
    WITH deduped AS (
        SELECT * FROM (
            SELECT user_id, event_type, ts, value,
                   row_number() OVER (PARTITION BY user_id, ts
                                      ORDER BY event_id) AS rn
            FROM events
        ) WHERE rn = 1
    ),
    cleaned AS (
        SELECT user_id, event_type, ts,
               CASE WHEN isnan(value) OR isinf(value) THEN 0.0
                    ELSE value END AS value
        FROM deduped
    ),
    stats AS (
        SELECT event_type, avg(value) AS mu, stddev_samp(value) AS sigma,
               quantile_cont(value, 0.95) AS q95
        FROM cleaned GROUP BY event_type
    ),
    scored AS (
        SELECT c.user_id, c.event_type,
               abs(CASE WHEN s.sigma = 0 THEN 0.0
                        ELSE (c.value - s.mu) / s.sigma END) AS model_score,
               CASE WHEN c.value > s.q95 THEN c.value / s.q95 ELSE 0.0 END
                   AS static_score
        FROM cleaned c JOIN stats s USING (event_type)
    ),
    ensembled AS (
        SELECT user_id, event_type,
               (model_score * 0.6 + static_score * 0.4) AS ens
        FROM scored
    ),
    unified AS (
        SELECT user_id, max(ens) AS unified_raw, count(*) AS n_samples
        FROM ensembled GROUP BY user_id
    )
    SELECT user_id, n_samples,
           round((exp(2 * unified_raw) - 1) / (exp(2 * unified_raw) + 1)
                 * 10.0, 6) AS anomaly_score
    FROM unified
    """,
)
def pipeline_anomaly_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B2–B10 composed: dedup → clean → fit (per-metric μ/σ/q95, broadcast
    back) → model score with static-threshold channel → weighted ensemble →
    unified max per entity → tanh postprocess to [0,10].

    Plan shape at 100 TB: one exchange for dedup (keyed by entity+ts), one
    for the stats fit (tiny output, broadcast back — the fact table is
    scanned, never reshuffled, for scoring), one for the final per-entity
    aggregate. Three shuffles total for a six-stage pipeline."""
    ev = load_table(spark, sf_dir, "events")

    from pyspark.sql import Window as W

    # B3: dedup by (entity, ts) — deterministic keep-first
    w = W.partitionBy("user_id", "ts").orderBy("event_id")
    deduped = (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", "ts", "value")
    )
    # B4: NaN/Inf → 0.0
    bad = F.isnan("value") | (F.abs("value") == F.lit(float("inf")))
    cleaned = deduped.withColumn(
        "value", F.when(bad, 0.0).otherwise(F.col("value"))
    )
    # B5/B7 fit: per-metric stats, one tiny relation
    stats = cleaned.groupBy("event_type").agg(
        F.avg("value").alias("mu"),
        F.stddev_samp("value").alias("sigma"),
        F.percentile("value", F.lit(0.95)).alias("q95"),
    )
    # B6/B7 score: z-score "model" + static-threshold channel
    z = F.when(F.col("sigma") == 0, 0.0).otherwise(
        (F.col("value") - F.col("mu")) / F.col("sigma")
    )
    static = F.when(
        F.col("value") > F.col("q95"), F.col("value") / F.col("q95")
    ).otherwise(0.0)
    scored = cleaned.join(F.broadcast(stats), ["event_type"]).select(
        "user_id",
        "event_type",
        F.abs(z).alias("model_score"),
        static.alias("static_score"),
    )
    # B8 ensemble → B9 unified → B10 postprocess
    ens = scored.withColumn(
        "ens", F.col("model_score") * 0.6 + F.col("static_score") * 0.4
    )
    unified = ens.groupBy("user_id").agg(
        F.max("ens").alias("unified_raw"),
        F.count(F.lit(1)).alias("n_samples"),
    )
    return unified.select(
        "user_id",
        "n_samples",
        F.round(F.tanh(F.col("unified_raw")) * 10.0, 6).alias("anomaly_score"),
    )


@register(
    "agg_salted_distinct",
    oracle="""
    SELECT l_returnflag, count(DISTINCT l_orderkey) AS n_orders
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_salted_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-hardened exact distinct: 3 group keys over 600k+ rows is the
    classic skewed aggregation. Salting ON the distinct column makes the
    partial counts additive: per-(key, salt) distinct → sum. At 100 TB
    this spreads each hot group over 64 reducers instead of one; the
    oracle is the plain COUNT(DISTINCT)."""
    li = load_table(spark, sf_dir, "lineitem")
    salted = li.withColumn("__salt", (F.col("l_orderkey") % 64).cast("int"))
    per_salt = salted.groupBy("l_returnflag", "__salt").agg(
        F.countDistinct("l_orderkey").alias("nd")
    )
    return per_salt.groupBy("l_returnflag").agg(
        F.sum("nd").alias("n_orders")
    )
