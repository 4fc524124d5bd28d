"""MLlib-backed operators (BASELINE.json north star: "Structured Streaming
+ MLlib for anomaly detection").

kmeans/LSH are rows-only (iterative / seeded-internals, not
SQL-expressible) but each has a deterministic expression-based twin
elsewhere in the registry that IS oracle-checked (ml_minmax_scaled,
vec_ann_signbucket_topk) — the MLlib path demonstrates the production
integration, the expression path pins the semantics.
mllib_minmax_scaler is the exception (r15): MinMaxScalerModel's
transform is the closed form (v - Emin) / (Emax - Emin) with a 0.5
constant-range case — one IEEE division on operands both engines
derive identically — so it is oracle-backed like any expression entry
(the fitted model just computes the same min/max the SQL does).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from numalogic_prometheus_spark.plans import register
from numalogic_prometheus_spark.sources.tables import load_table


@register(
    "mllib_minmax_scaler",
    oracle="""
    WITH hourly AS (
        SELECT user_id,
               date_trunc('hour', ts) AS hour,
               count(*)::DOUBLE AS f0,
               round(sum(value), 4) AS f1,
               round(avg(value), 4) AS f2
        FROM events
        GROUP BY user_id, date_trunc('hour', ts)
    ),
    mm AS (
        SELECT min(f0) AS n0, max(f0) AS x0,
               min(f1) AS n1, max(f1) AS x1,
               min(f2) AS n2, max(f2) AS x2
        FROM hourly
    )
    SELECT user_id, hour,
           CASE WHEN x0 = n0 THEN 0.5
                ELSE (f0 - n0) / (x0 - n0) END AS scaled_n,
           CASE WHEN x1 = n1 THEN 0.5
                ELSE (f1 - n1) / (x1 - n1) END AS scaled_sum,
           CASE WHEN x2 = n2 THEN 0.5
                ELSE (f2 - n2) / (x2 - n2) END AS scaled_avg
    FROM hourly CROSS JOIN mm
    """,
)
def mllib_minmax_scaler(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B5 via MLlib: window vectors → MinMaxScaler fit/transform. The
    fitted model is the registry artifact (B12) — MLlib persistence
    (model.save) is the production serialization path.

    Oracle-backed (r15, was rows-only): MinMaxScalerModel.transform with
    the default [0, 1] range computes raw = (v - Emin) / (Emax - Emin)
    (0.5 when the feature is constant) and then raw * 1.0 + 0.0, which
    is raw bit-for-bit under IEEE 754 — so NOTHING MLlib-internal enters
    the result: the scaling is one correctly-rounded division, and the
    fit's min/max (MultivariateOnlineSummarizer) are exact running
    min/max, the same doubles SQL MIN/MAX selects. The outputs ship
    UNROUNDED (rounding-lint rule: a round() of a ratio would add the
    .5-ulp tie class, not absorb one); the only remaining cross-engine
    seams are the feature-level round(sum/avg, 4) every sum-bearing
    oracle in this registry carries (the counter_hourly /
    agg_pricing_summary convention — SCALE.md round-8 tie-class
    discussion), not anything introduced by the MLlib path."""
    from pyspark.ml.feature import MinMaxScaler
    from pyspark.ml.functions import array_to_vector, vector_to_array

    ev = load_table(spark, sf_dir, "events")
    hourly = (
        ev.groupBy("user_id", F.date_trunc("hour", "ts").alias("hour"))
        .agg(
            F.array(
                F.count(F.lit(1)).cast("double"),
                F.round(F.sum("value"), 4),
                F.round(F.avg("value"), 4),
            ).alias("features_arr")
        )
        .withColumn("features", array_to_vector("features_arr"))
    )
    # Materialize ONCE before fit (ADVICE r15): fit and transform each
    # trigger an execution of `hourly`, and Spark's partial-aggregation
    # sum order can differ between the two runs — a round(sum,4)
    # boundary straddle between the fit's min/max view and the
    # transform's feature view would produce a value the oracle cannot
    # match. localCheckpoint pins one set of feature doubles for both.
    hourly = hourly.localCheckpoint(eager=True)
    model = MinMaxScaler(inputCol="features", outputCol="scaled").fit(hourly)
    out = model.transform(hourly)
    # Unpack the scaled vector to scalar columns: the driver's
    # canonicalizer sorts the frame and cannot hash array cells
    # (the round-1 agg_approx_quantiles failure mode).
    scaled = vector_to_array("scaled")
    # UNROUNDED outputs (the rounding-lint rule): the scaled values are
    # one IEEE division on operands both engines derive identically, so
    # the raw doubles are bit-identical — a round(·, 6) here would
    # ADD the .5-ulp tie class, not absorb one
    return out.select(
        "user_id",
        "hour",
        scaled.getItem(0).alias("scaled_n"),
        scaled.getItem(1).alias("scaled_sum"),
        scaled.getItem(2).alias("scaled_avg"),
    )


@register("mllib_brp_lsh_neighbors")  # MLlib internals → rows-only
def mllib_brp_lsh_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN via MLlib BucketedRandomProjectionLSH (the library-native LSH
    counterpart to vec_ann_signbucket_topk): similarity self-join under a
    Euclidean distance threshold. Deterministic seed."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    e = load_table(spark, sf_dir, "embeddings")
    vecs = e.select(
        "vec_id",
        array_to_vector(
            F.transform("embedding", lambda x: x.cast("double"))
        ).alias("features"),
    )
    lsh = BucketedRandomProjectionLSH(
        inputCol="features",
        outputCol="hashes",
        bucketLength=2.0,
        numHashTables=3,
        seed=42,
    )
    model = lsh.fit(vecs)
    # Random unit vectors concentrate around pairwise distance √2 ≈ 1.41;
    # 1.1 keeps only the close tail (~70 pairs per 500 vectors; 1.5 would
    # match ~74% of all pairs — quadratic output).
    pairs = model.approxSimilarityJoin(vecs, vecs, 1.1, distCol="dist")
    return pairs.filter(
        F.col("datasetA.vec_id") < F.col("datasetB.vec_id")
    ).select(
        F.col("datasetA.vec_id").alias("id_a"),
        F.col("datasetB.vec_id").alias("id_b"),
        F.round("dist", 6).alias("euclidean_dist"),
    )


@register("mllib_kmeans_profiles")  # MLlib internals → rows-only
def mllib_kmeans_profiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding clustering (corpus-curation stage): KMeans with fixed
    seed; emits cluster sizes — the IVF coarse quantizer a production ANN
    index would partition by."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    e = load_table(spark, sf_dir, "embeddings")
    vecs = e.select(
        "vec_id",
        array_to_vector(
            F.transform("embedding", lambda x: x.cast("double"))
        ).alias("features"),
    )
    model = KMeans(k=8, seed=42, maxIter=10).fit(vecs)
    out = model.transform(vecs)
    return out.groupBy(F.col("prediction").alias("cluster")).agg(
        F.count(F.lit(1)).alias("n_vectors")
    )
