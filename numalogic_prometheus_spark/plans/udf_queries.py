"""UDF / UDAF / UDTF surface (SURVEY.md §2C) + correlated subqueries.

The UDFs here are deterministic numeric kernels, so even the Python seam
is differential-tested against DuckDB (round-6 tolerance absorbs
libm-vs-numpy ulp noise). Production guidance stands: built-ins first —
these exist to pin the seam's contract (Arrow batching, schemas, null
handling), not to move math into Python.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from numalogic_prometheus_spark.plans import register
from numalogic_prometheus_spark.sources.tables import load_table


@register(
    "udf_scalar_pandas_tanh",
    oracle="""
    SELECT event_id,
           round((exp(2 * value / 100.0) - 1) / (exp(2 * value / 100.0) + 1), 6)
               AS tanh_score
    FROM events
    """,
)
def udf_scalar_pandas_tanh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar pandas UDF (B10 postprocess seam): Arrow-vectorized numpy
    tanh, differential-checked against DuckDB's exp formula."""
    import numpy as np

    @F.pandas_udf("double")
    def tanh_score(v: pd.Series) -> pd.Series:
        return np.tanh(v / 100.0)

    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id", F.round(tanh_score("value"), 6).alias("tanh_score")
    )


@register(
    "udf_grouped_agg_threshold",
    oracle="""
    SELECT event_type,
           round(avg(value) + 3 * stddev_samp(value), 4) AS threshold3
    FROM events
    GROUP BY event_type
    """,
)
def udf_grouped_agg_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate pandas UDF (B7 custom threshold stats): μ + 3σ
    per key computed in pandas, checked against the SQL moments."""

    @F.pandas_udf("double")
    def mu_plus_3sigma(v: pd.Series) -> float:
        return float(v.mean() + 3 * v.std(ddof=1))

    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(mu_plus_3sigma("value"), 4).alias("threshold3")
    )


@register(
    "udtf_tokenize_positions",
    oracle="""
    SELECT doc_id, tok AS word, (idx - 1)::INTEGER AS pos
    FROM (
        SELECT doc_id,
               unnest(string_split(text, ' ')) AS tok,
               generate_subscripts(string_split(text, ' '), 1) AS idx
        FROM documents
        WHERE doc_id % 25 = 0
    )
    """,
)
def udtf_tokenize_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (A10 one-record→many-lines shape): tokenizer emitting
    (word, pos) rows via LATERAL join — the Spark 3.5+ table-function
    seam, checked against DuckDB's unnest WITH ORDINALITY equivalent."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="word string, pos int")
    class Tokenize:
        def eval(self, text: str):
            if text is None:
                return
            for i, w in enumerate(text.split(" ")):
                yield w, i

    spark.udtf.register("tokenize_udtf", Tokenize)
    load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 25 == 0
    ).createOrReplaceTempView("docs_sampled")
    return spark.sql(
        """
        SELECT d.doc_id, t.word, t.pos
        FROM docs_sampled d, LATERAL tokenize_udtf(d.text) t
        """
    )


@register(
    "subquery_scalar_above_avg",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders o
    WHERE o_totalprice > (SELECT avg(o_totalprice) * 1.8 FROM orders)
    """,
)
def subquery_scalar_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery (Catalyst rewrites to a broadcast of the single
    aggregate row — SURVEY.md §4.2 subquery handling)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders o
        WHERE o_totalprice > (SELECT avg(o_totalprice) * 1.8 FROM orders)
        """
    )


@register(
    "subquery_correlated_max_per_cust",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders o
    WHERE o_totalprice = (SELECT max(o2.o_totalprice) FROM orders o2
                          WHERE o2.o_custkey = o.o_custkey)
    """,
)
def subquery_correlated_max_per_cust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (decorrelated by Catalyst into an
    aggregate + join — no per-row re-execution)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders o
        WHERE o_totalprice = (SELECT max(o2.o_totalprice) FROM orders o2
                              WHERE o2.o_custkey = o.o_custkey)
        """
    )
