"""Scalar-function queries (SURVEY.md §2C "Scalar functions").

String / datetime / math / json families, each over the fixture where the
reference needs it (label handling → strings, ts bucketing → datetime,
scoring → math, orjson payloads → json). Array/map families live in
plans/vectors.py and plans/metrics.py respectively.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from numalogic_prometheus_spark.plans import register
from numalogic_prometheus_spark.sources.tables import load_table


@register(
    "scalar_string_funcs",
    oracle="""
    SELECT p_partkey,
           lower(p_name) AS name_lc,
           upper(p_brand) AS brand_uc,
           length(p_name)::BIGINT AS name_len,
           substr(p_type, 1, 5) AS type_prefix,
           concat(p_brand, ':', p_type) AS brand_type,
           regexp_extract(p_brand, '([0-9]+)', 1) AS brand_num,
           replace(p_name, ' ', '_') AS name_snake,
           (p_name LIKE '%a%') AS has_a,
           trim(p_name) AS name_trim
    FROM part
    """,
)
def scalar_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String family (A1/A8 metric- and label-name handling)."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lower("p_name").alias("name_lc"),
        F.upper("p_brand").alias("brand_uc"),
        F.length("p_name").cast("long").alias("name_len"),
        F.substring("p_type", 1, 5).alias("type_prefix"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.regexp_extract("p_brand", r"([0-9]+)", 1).alias("brand_num"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_snake"),
        F.col("p_name").like("%a%").alias("has_a"),
        F.trim("p_name").alias("name_trim"),
    )


@register(
    "scalar_datetime_funcs",
    oracle="""
    SELECT o_orderkey,
           year(o_orderdate)::INTEGER AS y,
           month(o_orderdate)::INTEGER AS m,
           day(o_orderdate)::INTEGER AS d,
           hour(o_orderdate)::INTEGER AS h,
           date_trunc('month', o_orderdate)::TIMESTAMP AS month_start,
           floor(epoch(o_orderdate))::BIGINT AS epoch_sec,
           o_orderdate + INTERVAL 7 DAY AS plus_week
    FROM orders
    """,
)
def scalar_datetime_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime family (B2 ts bucketing): extraction, truncation, epoch,
    interval arithmetic."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("y"),
        F.month("o_orderdate").alias("m"),
        F.dayofmonth("o_orderdate").alias("d"),
        F.hour("o_orderdate").alias("h"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.unix_timestamp("o_orderdate").alias("epoch_sec"),
        (F.col("o_orderdate") + F.expr("INTERVAL 7 DAY")).alias("plus_week"),
    )


@register(
    "scalar_math_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(abs(l_discount - 0.05), 6) AS abs_c,
           round(sqrt(l_quantity), 6) AS sqrt_q,
           round(ln(l_extendedprice), 6) AS ln_p,
           round(exp(l_discount), 6) AS exp_d,
           round(pow(l_quantity, 2), 4) AS q_sq,
           -- DuckDB 1.0 has no tanh(); (e^2x-1)/(e^2x+1) agrees with
           -- Spark's tanh to ~1e-16, far inside the 6dp round
           round((exp(2 * l_discount * 10) - 1)
                 / (exp(2 * l_discount * 10) + 1), 6) AS tanh_d,
           floor(l_quantity)::BIGINT AS floor_q,
           ceil(l_quantity)::BIGINT AS ceil_q,
           (l_orderkey % 7)::BIGINT AS mod7,
           sign(l_discount - 0.05)::DOUBLE AS sgn
    FROM lineitem
    WHERE l_suppkey <= 5
    """,
)
def scalar_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math family (B5/B7/B10 scoring expressions — tanh scaler, log
    scores): all JVM built-ins inside whole-stage codegen."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_suppkey") <= 5)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.abs(F.col("l_discount") - 0.05), 6).alias("abs_c"),
        F.round(F.sqrt("l_quantity"), 6).alias("sqrt_q"),
        F.round(F.log("l_extendedprice"), 6).alias("ln_p"),
        F.round(F.exp("l_discount"), 6).alias("exp_d"),
        F.round(F.pow("l_quantity", F.lit(2)), 4).alias("q_sq"),
        F.round(F.tanh(F.col("l_discount") * 10), 6).alias("tanh_d"),
        F.floor("l_quantity").alias("floor_q"),
        F.ceil("l_quantity").alias("ceil_q"),
        (F.col("l_orderkey") % 7).alias("mod7"),
        F.signum(F.col("l_discount") - 0.05).alias("sgn"),
    )


@register(
    "scalar_json_extract",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           round(avg(json_extract_string(props, '$.k')::DOUBLE), 4) AS avg_k,
           max(json_extract_string(props, '$.k')::BIGINT) AS max_k
    FROM events
    GROUP BY event_type
    """,
)
def scalar_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON serde (B14, orjson payloads; events.props fixture): extract a
    typed field and aggregate it."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg(k.cast("double")), 4).alias("avg_k"),
        F.max(k.cast("long")).alias("max_k"),
    )


@register(
    "scalar_array_funcs",
    oracle="""
    SELECT vec_id,
           len(embedding)::INTEGER AS dim,
           round(embedding[1]::DOUBLE, 6) AS first_dim,
           round(list_aggregate(list_transform(embedding[1:8]::DOUBLE[],
                                               x -> x), 'sum'), 6) AS head8_sum,
           round(list_aggregate(embedding::DOUBLE[], 'max'), 6) AS max_dim,
           round(list_aggregate(list_transform(embedding::DOUBLE[],
                                               x -> abs(x)), 'sum'), 6) AS l1_norm,
           list_aggregate(list_transform(embedding::DOUBLE[],
               x -> CASE WHEN x > 0 THEN 1 ELSE 0 END), 'sum')::INTEGER
               AS n_positive
    FROM embeddings
    """,
)
def scalar_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array function family (B2 vectors / [north-star] embeddings):
    size, indexing, slice, element-wise transform + aggregate — all
    JVM-side higher-order functions."""
    e = load_table(spark, sf_dir, "embeddings")
    vec = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(F.element_at(vec, 1), 6).alias("first_dim"),
        F.round(
            F.aggregate(F.slice(vec, 1, 8), F.lit(0.0), lambda a, x: a + x), 6
        ).alias("head8_sum"),
        F.round(F.array_max(vec), 6).alias("max_dim"),
        F.round(
            F.aggregate(vec, F.lit(0.0), lambda a, x: a + F.abs(x)), 6
        ).alias("l1_norm"),
        F.aggregate(
            vec,
            F.lit(0),
            lambda a, x: a + F.when(x > 0, 1).otherwise(0),
        ).alias("n_positive"),
    )


@register(
    "scalar_nan_inf_clean",
    oracle="""
    WITH dirty AS (
        SELECT event_id, event_type,
               CASE WHEN value > 150 THEN 'nan'::DOUBLE
                    WHEN value < 20 THEN 'inf'::DOUBLE
                    ELSE value END AS v
        FROM events
    )
    SELECT event_id, event_type,
           CASE WHEN isnan(v) OR isinf(v) THEN 0.0 ELSE v END AS v_clean
    FROM dirty
    """,
)
def scalar_nan_inf_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NaN/Inf cleaning (B4, CHANGELOG.md:420: map NaN and ±Inf to 0.0
    before modeling). NaN/Inf are synthesized with literals because the
    fixture has none (and DuckDB raises on sqrt(-1) — engines differ on
    error-vs-NaN for math domain errors, literals sidestep that)."""
    ev = load_table(spark, sf_dir, "events")
    dirty = ev.select(
        "event_id",
        "event_type",
        F.when(F.col("value") > 150, F.lit(float("nan")))
        .when(F.col("value") < 20, F.lit(float("inf")))
        .otherwise(F.col("value"))
        .alias("v"),
    )
    is_bad = F.isnan("v") | (F.abs("v") == F.lit(float("inf")))
    return dirty.select(
        "event_id",
        "event_type",
        F.when(is_bad, 0.0).otherwise(F.col("v")).alias("v_clean"),
    )
