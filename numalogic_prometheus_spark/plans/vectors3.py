"""Vector search, round 3: int8-quantized candidate generation with
exact re-rank over `embeddings`.

The product-quantization idea (Jégou et al., PAMI 2011) at its simplest
useful grain: store each vector as int8 codes + one per-vector scale
(4× memory/bandwidth compression vs float32, 8× vs float64), score
candidates on the compressed codes, then re-rank only the survivors
against full-precision vectors. At 100 TB the candidate stage streams
the COMPRESSED corpus (the scan is ¼ the bytes and the broadcast query
set is tiny), and the expensive exact stage touches `3k` rows per
query instead of N.

Determinism: the code dot-product is INTEGER (codes ≤ 127 → |Σ| ≤
64·127² ≈ 1e6, exact in int64), so the only float ops are the two
per-vector scales multiplied once — no accumulation-order hazard
([[spark-duckdb-parity-gotchas]]). Candidate and final ranks tiebreak
on neighbor_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from numalogic_prometheus_spark.functions.vectors import (
    cosine_similarity,
    to_double_array,
)
from numalogic_prometheus_spark.plans import register
from numalogic_prometheus_spark.sources.tables import load_table_spread

_QUERY_FILTER = "vec_id % 97 = 0"
_CAND_PER_QUERY = 9  # 3× the final k
_TOP_K = 3

_INT8_ORACLE = f"""
    WITH b AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    scaled AS (
        SELECT vec_id, v,
               list_aggregate(list_transform(v, x -> abs(x)), 'max')
                   / 127 AS scale
        FROM b
    ),
    q AS (
        SELECT vec_id, scale,
               list_transform(v, x -> CASE WHEN scale = 0 THEN 0
                   ELSE round(x / scale)::BIGINT END) AS qv
        FROM scaled
    ),
    qs AS (SELECT vec_id AS query_id, scale AS qscale, qv AS qqv
           FROM q WHERE {_QUERY_FILTER}),
    approx AS (
        SELECT qs.query_id, n.vec_id AS neighbor_id,
               list_aggregate(
                   list_transform(range(1, len(n.qv) + 1),
                                  i -> n.qv[i] * qs.qqv[i]),
                   'sum')::BIGINT * n.scale * qs.qscale AS ascore
        FROM q n JOIN qs ON n.vec_id != qs.query_id
    ),
    cand AS (
        SELECT query_id, neighbor_id FROM (
            SELECT query_id, neighbor_id,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY ascore DESC, neighbor_id) AS arn
            FROM approx
        ) WHERE arn <= {_CAND_PER_QUERY}
    ),
    exact AS (
        SELECT c.query_id, c.neighbor_id,
               round(list_dot_product(qv.v, nv.v)
                     / (sqrt(list_aggregate(list_transform(qv.v, x -> x*x), 'sum'))
                        * sqrt(list_aggregate(list_transform(nv.v, x -> x*x), 'sum'))),
                     6) AS cos_sim
        FROM cand c
        JOIN b qv ON qv.vec_id = c.query_id
        JOIN b nv ON nv.vec_id = c.neighbor_id
    )
    SELECT query_id, neighbor_id, cos_sim, rank FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY cos_sim DESC, neighbor_id) AS rank
        FROM exact
    ) WHERE rank <= {_TOP_K}
"""


@register("vec_int8_quantized_topk", oracle=_INT8_ORACLE)
def vec_int8_quantized_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """int8 symmetric-quantized top-k: per-vector max-abs/127 scale,
    integer code dot for candidates (top 3k per query, broadcast query
    codes), exact cosine re-rank of survivors only."""
    e = load_table_spread(spark, sf_dir, "embeddings", "vec_id")
    b = e.select("vec_id", to_double_array(F.col("embedding")).alias("v"))
    scale = (
        F.aggregate(
            F.transform(F.col("v"), lambda x: F.abs(x)),
            F.lit(float("-inf")),
            lambda acc, x: F.greatest(acc, x),
        )
        / 127
    )
    # scale is referenced once per element by the quantizer lambda; bind
    # it as a column first so the interpreted HOF doesn't re-reduce the
    # array per element ([[spark-perf-traps-local]]).
    withs = b.withColumn("scale", scale)
    # CASE guards the division: an all-zero vector has scale 0 and
    # quantizes to all-zero codes (ANSI-safe both engines). NOTE: the
    # lambda must stay single-parameter — a second (even defaulted)
    # parameter makes F.transform pass the array INDEX into it
    # ([[spark-duckdb-parity-gotchas]]).
    _s = F.col("scale")
    q = withs.select(
        "vec_id",
        "scale",
        F.transform(
            F.col("v"),
            lambda x: F.when(_s == 0, F.lit(0).cast("long")).otherwise(
                F.round(x / _s, 0).cast("long")
            ),
        ).alias("qv"),
    )
    qs = q.filter(F.expr(_QUERY_FILTER)).select(
        F.col("vec_id").alias("query_id"),
        F.col("scale").alias("qscale"),
        F.col("qv").alias("qqv"),
    )
    idot = F.aggregate(
        F.zip_with("qv", "qqv", lambda a, c: a * c),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    approx = (
        q.join(F.broadcast(qs), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            (idot * F.col("scale") * F.col("qscale")).alias("ascore"),
        )
    )
    aw = W.partitionBy("query_id").orderBy(F.col("ascore").desc(), "neighbor_id")
    cand = (
        approx.withColumn("arn", F.row_number().over(aw))
        .filter(F.col("arn") <= _CAND_PER_QUERY)
        .select("query_id", "neighbor_id")
    )
    qv = b.select(F.col("vec_id").alias("query_id"), F.col("v").alias("v_q"))
    nv = b.select(F.col("vec_id").alias("neighbor_id"), F.col("v").alias("v_n"))
    exact = (
        cand.join(qv, "query_id")
        .join(nv, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_similarity(F.col("v_q"), F.col("v_n")), 6).alias(
                "cos_sim"
            ),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), "neighbor_id")
    return (
        exact.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= _TOP_K)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )
