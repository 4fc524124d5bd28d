"""Text retrieval, round 3: BM25-scored keyword search over `documents`.

The training-data counterpart of "find near-dups": find the documents
most relevant to a term set (corpus triage, eval-set mining, targeted
decontamination). The reference's engine has no retrieval surface
(it delegates queries to Prometheus — reference CHANGELOG.md:10); this
is the inverted-index pattern re-expressed as relational algebra so
Catalyst keeps every stage a hash aggregate or broadcast join.

Scale shape (100 TB): the corpus-wide work is ONE map-only pass
(`size(split(...))` doc lengths — no explode, no shuffle) plus ONE
aggregation keyed by (doc_id, term) over tokens ALREADY filtered to the
query-term set inside the array (the explode emits only matching
tokens, ~|terms|/|vocab| of the corpus). Document frequencies and the
corpus stats row are tiny and broadcast. Nothing joins full postings
against full postings.

Determinism: per-term BM25 contributions are rounded to integer
micro-units before the per-doc sum (double accumulation order differs
between engines — [[spark-duckdb-parity-gotchas]]); `dlen/avgdl` is
computed as `dlen * n_docs / tot_tokens` so the only float ops are one
division, one `ln`, and one multiply chain written identically on both
sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from numalogic_prometheus_spark.plans import register
from numalogic_prometheus_spark.sources.tables import load_table

_TERMS = ("spark", "join", "vector")
# SQL-side constants are ::DOUBLE — a bare 1.2 literal is DECIMAL in
# DuckDB and decimal arithmetic rounds differently than Spark's doubles.
_K1 = "1.2::DOUBLE"
_B = "0.75::DOUBLE"
_TERMS_SQL = ", ".join(f"'{t}'" for t in _TERMS)

_BM25_ORACLE = f"""
    WITH base AS (
        SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
        FROM documents
    ),
    dl AS (SELECT doc_id, len(toks)::BIGINT AS dlen FROM base),
    stats AS (SELECT count(*)::BIGINT AS n_docs, sum(dlen)::BIGINT AS tot FROM dl),
    tf AS (
        SELECT doc_id, term, count(*)::BIGINT AS tf
        FROM (SELECT doc_id, unnest(toks) AS term FROM base)
        WHERE term IN ({_TERMS_SQL})
        GROUP BY doc_id, term
    ),
    dfreq AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term),
    contrib AS (
        SELECT t.doc_id,
               round(ln(1 + (s.n_docs - f.df + 0.5::DOUBLE) / (f.df + 0.5::DOUBLE))
                     * t.tf * ({_K1} + 1)
                     / (t.tf + {_K1} * (1 - {_B} + {_B} * d.dlen * s.n_docs / s.tot))
                     * 1000000)::BIGINT AS cu
        FROM tf t
        JOIN dfreq f USING (term)
        JOIN dl d USING (doc_id)
        CROSS JOIN stats s
    ),
    score AS (SELECT doc_id, sum(cu)::BIGINT AS su FROM contrib GROUP BY doc_id)
    SELECT doc_id, bm25, rank FROM (
        SELECT doc_id, su / 1000000.0 AS bm25,
               row_number() OVER (ORDER BY su DESC, doc_id) AS rank
        FROM score
    ) WHERE rank <= 10
"""


@register("text_bm25_topk", oracle=_BM25_ORACLE)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 (k1=1.2, b=0.75) top-10 for the fixed term set, Okapi idf
    `ln(1 + (N-df+0.5)/(df+0.5))`. Doc lengths are a map-only
    projection; postings are filtered to query terms inside the token
    array before the explode; df + corpus stats broadcast back."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.filter(F.split("text", " "), lambda x: x != F.lit("")).alias("toks"),
    )
    dl = toks.select("doc_id", F.size("toks").cast("long").alias("dlen"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dlen").alias("tot")
    )
    tf = (
        toks.select(
            "doc_id",
            F.explode(
                F.filter(F.col("toks"), lambda x: x.isin(*_TERMS))
            ).alias("term"),
        )
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    k1, b = float(_K1.split("::")[0]), float(_B.split("::")[0])
    contrib = (
        tf.join(F.broadcast(dfreq), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            F.round(
                F.log(1 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
                * F.col("tf")
                * (k1 + 1)
                / (
                    F.col("tf")
                    + k1
                    * (
                        (1 - b)
                        + b * F.col("dlen") * F.col("n_docs") / F.col("tot")
                    )
                )
                * 1000000
            )
            .cast("long")
            .alias("cu"),
        )
    )
    score = contrib.groupBy("doc_id").agg(F.sum("cu").alias("su"))
    w = W.orderBy(F.col("su").desc(), "doc_id")
    return (
        score.select(
            "doc_id",
            # Unrounded (r9): su is an exact BIGINT, so su/1e6 is one IEEE
            # division — bit-identical cross-engine; round(·,6) was the
            # tie-class liability (SCALE.md round-8 section).
            (F.col("su") / 1000000.0).alias("bm25"),
            F.row_number().over(w).cast("long").alias("rank"),
        )
        .filter(F.col("rank") <= 10)
    )
