"""Vector similarity-search queries over `embeddings` ([north-star]:
ANN over an embedding column at 100 TB design scale).

Strategy ladder:
- brute-force cosine top-k for a bounded query set — the correctness
  baseline (cross join is |Q|×N with |Q| kept small and broadcast);
- sign-bucket LSH (axis-aligned random-hyperplane family): map-only
  bucket assignment, candidates only within a bucket — the scale path
  (the bucket exchange replaces the full cross product);
- embedding-cosine near-dup pairs via the same bucketing.

All math is F.zip_with/F.aggregate built-ins (JVM, codegen) over
double-widened floats; ranking keys are rounded to 6dp BEFORE row_number
so rank order is identical in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from numalogic_prometheus_spark.functions.vectors import (
    cosine_similarity,
    dot_product,
    l2_norm,
    to_double_array,
)
from numalogic_prometheus_spark.plans import register
from numalogic_prometheus_spark.sources.tables import load_table


@register(
    "vec_norm_stats",
    oracle="""
    SELECT label,
           count(*) AS n,
           len(embedding)::BIGINT AS dim,
           round(avg(sqrt(list_aggregate(
               list_transform(embedding::DOUBLE[], x -> x * x), 'sum'))), 6)
               AS avg_l2_norm
    FROM embeddings
    GROUP BY label, len(embedding)
    """,
)
def vec_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array math sanity surface: per-label average L2 norm + dim."""
    e = load_table(spark, sf_dir, "embeddings")
    vec = to_double_array(F.col("embedding"))
    return (
        e.select("label", F.size("embedding").cast("long").alias("dim"),
                 l2_norm(vec).alias("norm"))
        .groupBy("label", "dim")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("norm"), 6).alias("avg_l2_norm"),
        )
    )


_QUERY_FILTER = "vec_id % 97 = 0"


@register(
    "vec_cosine_topk",
    oracle=f"""
    WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
               FROM embeddings WHERE {_QUERY_FILTER}),
    scored AS (
        SELECT q.query_id, e.vec_id AS neighbor_id,
               round(list_dot_product(q.qv, e.embedding::DOUBLE[])
                     / (sqrt(list_aggregate(list_transform(q.qv, x -> x*x), 'sum'))
                        * sqrt(list_aggregate(list_transform(e.embedding::DOUBLE[],
                                                             x -> x*x), 'sum'))),
                     6) AS cos_sim
        FROM q CROSS JOIN embeddings e
        WHERE e.vec_id != q.query_id
    )
    SELECT query_id, neighbor_id, cos_sim, rn FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY cos_sim DESC, neighbor_id) AS rn
        FROM scored
    ) WHERE rn <= 5
    """,
)
def vec_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 per query vector (the ANN correctness
    baseline): small query set broadcast against the corpus — |Q|×N
    map-side work, one exchange for the per-query ranking. cos_sim is
    rounded BEFORE ranking so rank order matches the oracle bit-for-bit."""
    e = load_table(spark, sf_dir, "embeddings")
    q = (
        e.filter(F.expr(_QUERY_FILTER))
        .select(F.col("vec_id").alias("query_id"),
                to_double_array(F.col("embedding")).alias("qv"))
    )
    corpus = e.select(
        F.col("vec_id").alias("neighbor_id"),
        to_double_array(F.col("embedding")).alias("ev"),
    )
    scored = (
        F.broadcast(q)
        .crossJoin(corpus)
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_similarity(F.col("qv"), F.col("ev")), 6).alias("cos_sim"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), "neighbor_id")
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 5)
    )


# Sign-bucket: bit i = (embedding[i] > 0) for the first 8 dims.
_BUCKET_SQL = (
    "list_aggregate(list_transform(range(0, 8), "
    "i -> CASE WHEN embedding[i + 1] > 0 THEN (1::BIGINT << i) ELSE 0 END), 'sum')"
)


def _bucket_col(emb) -> F.Column:
    return F.aggregate(
        F.zip_with(
            F.slice(emb, 1, 8),
            F.sequence(F.lit(0), F.lit(7)),
            lambda x, i: F.when(x > 0, F.pow(F.lit(2.0), i).cast("long")).otherwise(
                F.lit(0).cast("long")
            ),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


@register(
    "vec_ann_signbucket_topk",
    oracle=f"""
    WITH b AS (
        SELECT vec_id, embedding::DOUBLE[] AS v, {_BUCKET_SQL} AS bucket
        FROM embeddings
    ),
    q AS (SELECT vec_id AS query_id, v AS qv, bucket FROM b WHERE {_QUERY_FILTER}),
    scored AS (
        SELECT q.query_id, c.vec_id AS neighbor_id,
               round(list_dot_product(q.qv, c.v)
                     / (sqrt(list_aggregate(list_transform(q.qv, x -> x*x), 'sum'))
                        * sqrt(list_aggregate(list_transform(c.v, x -> x*x), 'sum'))),
                     6) AS cos_sim
        FROM q JOIN b c ON c.bucket = q.bucket AND c.vec_id != q.query_id
    )
    SELECT query_id, neighbor_id, cos_sim, rn FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY cos_sim DESC, neighbor_id) AS rn
        FROM scored
    ) WHERE rn <= 3
    """,
)
def vec_ann_signbucket_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed ANN (the scale path): sign-bit bucket over the first 8
    dims (an axis-aligned hyperplane family) assigns each vector to 1 of
    256 buckets map-side; candidates are only same-bucket vectors, so the
    cross product never materializes. Equi-join on bucket → AQE-planned,
    skew-splittable — this is the shape that survives 100 TB."""
    e = load_table(spark, sf_dir, "embeddings")
    b = e.select(
        "vec_id",
        to_double_array(F.col("embedding")).alias("v"),
        _bucket_col(F.col("embedding")).alias("bucket"),
    )
    q = b.filter(F.expr(_QUERY_FILTER)).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"), "bucket"
    )
    scored = (
        q.join(b.alias("c"), ["bucket"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(cosine_similarity(F.col("qv"), F.col("v")), 6).alias("cos_sim"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), "neighbor_id")
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 3)
    )


@register(
    "vec_neardup_pairs",
    oracle=f"""
    WITH b AS (
        SELECT vec_id, embedding::DOUBLE[] AS v, {_BUCKET_SQL} AS bucket
        FROM embeddings
    )
    SELECT a.vec_id AS id_a, c.vec_id AS id_b,
           round(list_dot_product(a.v, c.v)
                 / (sqrt(list_aggregate(list_transform(a.v, x -> x*x), 'sum'))
                    * sqrt(list_aggregate(list_transform(c.v, x -> x*x), 'sum'))),
                 6) AS cos_sim
    FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id < c.vec_id
    WHERE list_dot_product(a.v, c.v)
          / (sqrt(list_aggregate(list_transform(a.v, x -> x*x), 'sum'))
             * sqrt(list_aggregate(list_transform(c.v, x -> x*x), 'sum'))) >= 0.99
    """,
)
def vec_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup dedup: same sign-bucketing to avoid the
    O(n²) pair space, cosine ≥ 0.99 within buckets."""
    e = load_table(spark, sf_dir, "embeddings")
    b = e.select(
        "vec_id",
        to_double_array(F.col("embedding")).alias("v"),
        _bucket_col(F.col("embedding")).alias("bucket"),
    )
    a = b.select(F.col("vec_id").alias("id_a"), F.col("v").alias("va"), "bucket")
    c = b.select(F.col("vec_id").alias("id_b"), F.col("v").alias("vb"), "bucket")
    cos = cosine_similarity(F.col("va"), F.col("vb"))
    return (
        a.join(c, ["bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cos_sim_raw", cos)
        .filter(F.col("cos_sim_raw") >= 0.99)
        .select("id_a", "id_b", F.round("cos_sim_raw", 6).alias("cos_sim"))
    )
