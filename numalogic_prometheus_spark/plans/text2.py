"""Text similarity, batch 2 — exact n-gram Jaccard/containment dedup and
BPE-ish token accounting ([north-star]: "n-gram Jaccard" and "token
counting (whitespace + a BPE-ish regex)" as first-class operators).

`text_ngram_jaccard_pairs` is the *exact* set-similarity complement to
the MinHash estimators in plans/text.py: word-bigram sets compared with
array_intersect/array_union on candidate pairs produced by prefix
blocking (same first-two-token block key — the classic cheap blocking
scheme for edit-heavy near-dups, which keep their openings). At 100 TB
the block key bounds the self-join the same way an LSH band does: one
exchange on the block key, pairs only within a block, never N².
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from numalogic_prometheus_spark.operators import dedup as D
from numalogic_prometheus_spark.operators.cdc import _B, _DIV, _M, _MAX, _WIN
from numalogic_prometheus_spark.operators.dedup import tokens_col
from numalogic_prometheus_spark.plans import register
from numalogic_prometheus_spark.sources.tables import load_table, load_table_spread

# The CDC oracle's windowed-byte-sum identity (identity 1 in the oracle
# comment) holds ONLY because the rolling base ≡ 1 (mod _DIV) and _DIV
# divides the hash modulus. The oracle interpolates the chunker's own
# constants (r12 ADVICE — a constant change must not silently diverge),
# and this guard makes a change that breaks the identity itself fail at
# import, not as a sweep-hash mismatch.
# explicit raise, not assert: this must fail at import even under
# python -O (r13 ADVICE — assert is stripped there)
if not (_B % _DIV == 1 and _M % _DIV == 0):
    raise AssertionError(
        "CDC oracle identity broken: need _B ≡ 1 (mod _DIV) and _DIV | _M"
    )

# Word bigrams as strings ("tok_i tok_i+1"), deduplicated — the set the
# Jaccard/containment measures run over.
_BIGRAMS_SQL = (
    "list_distinct(list_transform(range(1, len(string_split(text, ' '))),"
    " i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i + 1]))"
)
_BLOCK_SQL = "string_split(text, ' ')[1] || ' ' || string_split(text, ' ')[2]"


def _bigrams(text: F.Column) -> F.Column:
    toks = tokens_col(text)
    grams = F.transform(
        F.sequence(F.lit(0), F.size(toks) - 2),
        lambda i: F.concat_ws(" ", F.element_at(toks, i + 1), F.element_at(toks, i + 2)),
    )
    # Guard single-token docs: sequence(0, -1) DESCENDS in Spark, so the
    # transform would index element_at(toks, 0) and error out.
    return F.when(F.size(toks) >= 2, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


@register(
    "text_ngram_jaccard_pairs",
    oracle=f"""
    WITH g AS (
        SELECT doc_id, {_BLOCK_SQL} AS block, {_BIGRAMS_SQL} AS grams
        FROM documents
        WHERE len(string_split(text, ' ')) >= 3
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           len(list_intersect(a.grams, b.grams))
               / len(list_distinct(list_concat(a.grams, b.grams)))::DOUBLE
               AS jaccard,
           len(list_intersect(a.grams, b.grams))
               / len(a.grams)::DOUBLE AS containment_a
    FROM g a JOIN g b ON a.block = b.block AND a.doc_id < b.doc_id
    WHERE len(list_intersect(a.grams, b.grams))
              / len(list_distinct(list_concat(a.grams, b.grams)))::DOUBLE
              >= 0.3
    """,
)
def text_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact word-bigram Jaccard + containment on prefix-blocked
    candidate pairs (first two tokens as the block key). Jaccard =
    |A∩B| / |A∪B|; containment_a = |A∩B| / |A| (the asymmetric measure
    that catches a doc embedded inside a longer one). Ratios and the
    threshold compare UNROUNDED doubles: identical integers through one
    IEEE division are bit-identical cross-engine, so membership at the
    0.3 boundary cannot flip — whereas an in-query round(x, 6) can
    split at .5e-6 ties (the round-8 sf0.1 sweep class)."""
    # Spread first (testdata parquet is one row group → a 1-task scan
    # would serialize the per-doc bigram build), and pin the computed
    # gram arrays eagerly so the self-join's two sides read the
    # materialized arrays instead of re-deriving them per side.
    d = load_table_spread(spark, sf_dir, "documents", "doc_id")
    toks = tokens_col(F.col("text"))
    g = (
        d.filter(F.size(toks) >= 3)
        .select(
            "doc_id",
            F.concat_ws(
                " ", F.element_at(toks, 1), F.element_at(toks, 2)
            ).alias("block"),
            _bigrams(F.col("text")).alias("grams"),
        )
        .withColumn("n_grams", F.size("grams"))
        .transform(D.truncate_lineage)
    )
    a = g.select(
        F.col("doc_id").alias("id_a"), F.col("block"),
        F.col("grams").alias("ga"), F.col("n_grams").alias("na"),
    )
    b = g.select(
        F.col("doc_id").alias("id_b"), F.col("block"),
        F.col("grams").alias("gb"), F.col("n_grams").alias("nb"),
    )
    # |A∪B| = |A|+|B|−|A∩B|: one array_intersect per pair, never an
    # array_union materialization.
    inter = F.size(F.array_intersect(F.col("ga"), F.col("gb")))
    return (
        a.join(b, "block")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("n_inter", inter)
        .withColumn(
            "jaccard",
            F.col("n_inter")
            / (F.col("na") + F.col("nb") - F.col("n_inter")).cast("double"),
        )
        .filter(F.col("jaccard") >= 0.3)
        .withColumn(
            "containment_a",
            F.col("n_inter") / F.col("na").cast("double"),
        )
        .select("id_a", "id_b", "jaccard", "containment_a")
    )


# BPE-ish pre-tokenization: word pieces OR single non-space punctuation —
# the regex family GPT-2-style byte-pair encoders split on before
# merging. Distinct from whitespace tokens when punctuation abuts words.
_BPE_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


@register(
    "text_token_accounting",
    oracle=f"""
    SELECT source,
           count(*)::BIGINT AS n_docs,
           sum(len(string_split(text, ' ')))::BIGINT AS ws_tokens,
           sum(len(regexp_extract_all(text, '{_BPE_PATTERN}')))::BIGINT
               AS bpe_tokens,
           sum(n_chars)::BIGINT AS total_chars,
           round(avg(n_chars / len(string_split(text, ' '))), 6)
               AS chars_per_ws_token
    FROM documents
    GROUP BY source
    """,
)
def text_token_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token accounting per source: whitespace tokens vs BPE-ish
    pre-tokenizer pieces (letter runs / digit runs / single punctuation)
    plus chars-per-token — the budget arithmetic a training-data
    pipeline runs before sampling. Map-only + one tiny agg; regexes
    evaluate JVM-side (no Python)."""
    d = load_table(spark, sf_dir, "documents")
    ws = F.size(tokens_col(F.col("text"))).cast("long")
    bpe = F.size(F.regexp_extract_all(F.col("text"), F.lit(_BPE_PATTERN), F.lit(0)))
    return (
        d.select(
            "source",
            ws.alias("ws"),
            bpe.cast("long").alias("bpe"),
            "n_chars",
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("ws").alias("ws_tokens"),
            F.sum("bpe").alias("bpe_tokens"),
            F.sum("n_chars").alias("total_chars"),
            F.round(F.avg(F.col("n_chars") / F.col("ws")), 6).alias(
                "chars_per_ws_token"
            ),
        )
    )


@register(
    "dedup_cdc_chunk_pairs",
    # Round-12 oracle (VERDICT r11 #6 — the last dedup-family member
    # without a DuckDB twin). The chunker's boundary rule collapses to
    # pure SQL via two exact identities, fuzz-verified against
    # operators/cdc.chunk_bytes over 300 random byte-strings
    # (tests/test_properties.py::test_cdc_sql_formulation_matches_chunker):
    #   1. the rolling-hash cut test h % 64 == 63 reduces to a windowed
    #      BYTE SUM: the base 257 ≡ 1 (mod 64) and 64 divides the 2^31
    #      modulus, so h ≡ sum(trailing 16 bytes) (mod 64) — a
    #      15-PRECEDING window sum, no polynomial arithmetic;
    #   2. max-length force cuts need no recursion: content boundaries
    #      are absolute (the hash never resets at a cut), so within each
    #      consecutive content-cut gap (a, b] the force cuts sit at
    #      a+160, a+320, … < b — a stepped range() expansion per gap.
    # Character positions equal byte positions because the fixture text
    # is pure ASCII at every scale; the guard CTE makes that assumption
    # fail LOUDLY (error()) instead of silently diverging, and the
    # Python property tests keep covering the non-ASCII byte path.
    oracle=f"""
    WITH doc_n AS (
        SELECT doc_id, text,
               CASE WHEN octet_length(encode(text)) <> length(text)
                    THEN error('cdc oracle requires ascii text')
                    ELSE length(text) END AS n
        FROM documents
        WHERE text IS NOT NULL AND length(text) > 0
    ),
    bytes AS (
        SELECT doc_id, i, ord(substr(text, i::INT, 1)) AS b
        FROM doc_n, unnest(range(1, n + 1)) AS u(i)
    ),
    wsum AS (
        SELECT doc_id, i,
               sum(b) OVER (PARTITION BY doc_id ORDER BY i
                            ROWS BETWEEN {_WIN - 1} PRECEDING AND CURRENT ROW) AS w
        FROM bytes
    ),
    anchors AS (
        SELECT doc_id, i AS p FROM wsum WHERE i >= {_WIN} AND w % {_DIV} = {_DIV - 1}
        UNION SELECT doc_id, 0 FROM doc_n
        UNION SELECT doc_id, n FROM doc_n
    ),
    gaps AS (
        SELECT doc_id, p AS a,
               lead(p) OVER (PARTITION BY doc_id ORDER BY p) AS b
        FROM anchors
    ),
    ends AS (
        SELECT doc_id, e FROM gaps, unnest(range(a + {_MAX}, b, {_MAX})) AS u(e)
        WHERE b IS NOT NULL
        UNION ALL SELECT doc_id, b FROM gaps WHERE b IS NOT NULL
    ),
    chunk_spans AS (
        SELECT doc_id, e,
               lag(e, 1, 0) OVER (PARTITION BY doc_id ORDER BY e) AS s
        FROM ends
    ),
    chunks AS (
        SELECT DISTINCT c.doc_id,
               substr(md5(substr(d.text, (c.s + 1)::INT, (c.e - c.s)::INT)),
                      1, 16) AS chunk_hash
        FROM chunk_spans c JOIN doc_n d USING (doc_id)
    ),
    n_chunks AS (
        SELECT doc_id, count(*) AS n_chunks FROM chunks GROUP BY doc_id
    ),
    canon AS (
        SELECT chunk_hash, min(doc_id) AS id_a FROM chunks GROUP BY chunk_hash
    ),
    shared AS (
        SELECT c.id_a, ch.doc_id AS id_b, count(*) AS shared_chunks
        FROM chunks ch JOIN canon c USING (chunk_hash)
        WHERE ch.doc_id > c.id_a
        GROUP BY 1, 2
    )
    SELECT s.id_a, s.id_b,
           s.shared_chunks::BIGINT AS shared_chunks,
           n.n_chunks::BIGINT AS chunks_a,
           s.shared_chunks / n.n_chunks::DOUBLE AS containment
    FROM shared s JOIN n_chunks n ON n.doc_id = s.id_a
    WHERE s.shared_chunks / n.n_chunks::DOUBLE >= 0.5
    """,
)
def dedup_cdc_chunk_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined-chunking dedup: each doc splits at rolling-hash
    boundaries (operators/cdc.py) via mapInPandas (map-only 1→N); docs
    sharing chunks pair up through one exchange on chunk_hash with
    canonical min-doc pairing (linear in cluster size, the same shape as
    LSH banding); containment = shared_chunks / doc_a_chunks ≥ 0.5.
    Catches partial overlap — shared passages, boilerplate — that
    whole-document signatures blur out. Oracle-backed since round 12:
    the boundary recurrence is expressed exactly in SQL (see the oracle
    comment above for the two identities that make it non-recursive)."""
    import pandas as pd

    from numalogic_prometheus_spark.operators.cdc import chunk_text

    d = load_table_spread(spark, sf_dir, "documents", "doc_id").select(
        "doc_id", "text"
    )

    def chunker(batches):
        for pdf in batches:
            out = {"doc_id": [], "chunk_hash": []}
            for did, txt in zip(pdf["doc_id"], pdf["text"]):
                for _, _, h in chunk_text(txt or ""):
                    out["doc_id"].append(did)
                    out["chunk_hash"].append(h)
            yield pd.DataFrame(out)

    chunks = d.mapInPandas(chunker, "doc_id long, chunk_hash string").dropDuplicates(
        ["doc_id", "chunk_hash"]
    )
    # Pin the chunk relation (r17, guide §2.3/§5): three downstream
    # branches (n_chunks, canon, shared) each embed the chunker
    # subtree, and exchange reuse did NOT collapse them at runtime —
    # the Python rolling-hash kernel ran three times. The pinned
    # relation is narrow (doc_id + 16-char hash, far smaller than the
    # text it derives from); interleaved A/B at sf0.1: ~2.5 s → ~1.5 s
    # steady.
    from numalogic_prometheus_spark.operators.dedup import truncate_lineage

    chunks = truncate_lineage(chunks)
    n_chunks = chunks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_chunks"))
    # canonical pairing: every doc sharing a chunk pairs with the chunk's
    # minimum doc_id — linear output even for huge duplicate clusters
    canon = chunks.groupBy("chunk_hash").agg(F.min("doc_id").alias("id_a"))
    shared = (
        chunks.join(canon, "chunk_hash")
        .filter(F.col("doc_id") > F.col("id_a"))
        .groupBy("id_a", F.col("doc_id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("shared_chunks"))
    )
    return (
        shared.join(
            n_chunks.select(F.col("doc_id").alias("id_a"),
                            F.col("n_chunks").alias("chunks_a")),
            "id_a",
        )
        .withColumn(
            # UNROUNDED: a ratio of exact integers is the identical
            # IEEE double on both engines; rounding it was exactly the
            # tie class test_rounding_lint blocks (caught by the lint
            # when the r12 oracle landed)
            "containment",
            F.col("shared_chunks") / F.col("chunks_a"),
        )
        .filter(F.col("containment") >= 0.5)
        .select("id_a", "id_b", "shared_chunks", "chunks_a", "containment")
    )


@register(
    "pipeline_text_cleaning",
    oracle="""
    WITH scored AS (
        SELECT doc_id, source, lang, n_chars, text,
               md5(text) AS content_hash
        FROM documents
    ),
    lang_kept AS (SELECT * FROM scored WHERE lang = 'en'),
    len_kept AS (SELECT * FROM lang_kept
                 WHERE n_chars BETWEEN 120 AND 1000),
    survivors AS (
        SELECT * FROM (
            SELECT *, row_number() OVER (PARTITION BY content_hash
                                         ORDER BY doc_id) AS rn
            FROM len_kept
        ) WHERE rn = 1
    )
    SELECT 'p0_ingested' AS stage, count(*)::BIGINT AS n_docs,
           sum(n_chars)::BIGINT AS n_chars FROM scored
    UNION ALL
    SELECT 'p1_lang', count(*)::BIGINT, sum(n_chars)::BIGINT FROM lang_kept
    UNION ALL
    SELECT 'p2_length', count(*)::BIGINT, sum(n_chars)::BIGINT FROM len_kept
    UNION ALL
    SELECT 'p3_dedup', count(*)::BIGINT, sum(n_chars)::BIGINT FROM survivors
    """,
)
def pipeline_text_cleaning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed cleaning funnel a corpus pipeline runs before
    tokenization — language filter → length band → exact-dedup survivors
    — reported as per-stage (docs, chars) attrition. One scan feeds all
    stages (each is a narrower filter of the last; Catalyst collapses
    the projections); only the dedup stage shuffles, on content hash.
    The text analog of pipeline_anomaly_scores' composed plan."""
    d = load_table(spark, sf_dir, "documents").withColumn(
        "content_hash", F.md5("text")
    )
    p1 = d.filter(F.col("lang") == "en")
    p2 = p1.filter(F.col("n_chars").between(120, 1000))
    w = W.partitionBy("content_hash").orderBy("doc_id")
    p3 = (
        p2.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
    )

    def stage(name: str, df: DataFrame) -> DataFrame:
        return df.agg(
            F.lit(name).alias("stage"),
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("n_chars"),
        )

    return (
        stage("p0_ingested", d)
        .unionByName(stage("p1_lang", p1))
        .unionByName(stage("p2_length", p2))
        .unionByName(stage("p3_dedup", p3))
    )
