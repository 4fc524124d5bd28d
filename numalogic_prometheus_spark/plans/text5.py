"""Training-data chunking, round 9: RAG/pretraining-style overlapping
document chunking.

Every context-window pipeline (RAG indexing, pretraining example prep,
long-doc eval harnesses) starts by splitting documents into fixed-size
overlapping chunks with stable, reproducible chunk identities. The
reference pipeline never re-chunks (its unit is the metric window,
numaprom/udf/window.py); this is the [north-star] LLM-curation
extension over `documents`, the chunk-grain sibling of
`dedup_substring_spans`' token windows (plans/text4.py).

Semantics: chunk starts are the arithmetic ladder 0, S, 2S, … < n_chars
(stride S = CHUNK_SIZE − OVERLAP), each chunk the CHUNK_SIZE-char
substring from its start (the final chunk is shorter when the tail
runs out). Chunk identity is (doc_id, chunk_idx) with chunk_idx =
start / S; the chunk body ships as its md5 (hex, both engines
lowercase) so the relation stays narrow while remaining
content-addressed — the downstream exact-dedup / contamination passes
join on the hash, never the text.

Scale (100 TB design): the explode is MAP-SIDE whole-stage codegen —
`posexplode(sequence(0, n−1, S))` fans each document out to its ~n/S
chunk rows with NO shuffle, no UDF, no driver involvement; output
partitioning inherits the scan's. Per-task memory is bounded by one
document's chunk list (≤ len/S starts, integers). The substring +
md5 are JVM expressions. A 100 TB corpus chunks in one embarrassingly
parallel scan-project pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from numalogic_prometheus_spark.plans import register
from numalogic_prometheus_spark.sources.tables import load_table

_CHUNK = 128  # chars per chunk
_STRIDE = 96  # chunk starts every STRIDE chars -> 32-char overlap


@register(
    "text_chunk_overlap",
    oracle=f"""
    SELECT doc_id,
           s // {_STRIDE} AS chunk_idx,
           s AS chunk_start,
           length(substring(text, s + 1, {_CHUNK}))::BIGINT AS chunk_len,
           md5(substring(text, s + 1, {_CHUNK})) AS chunk_md5
    FROM (
        SELECT doc_id, text, unnest(range(0, length(text), {_STRIDE})) AS s
        FROM documents
    )
    """,
)
def text_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping fixed-size chunking of every document: 128-char
    chunks every 96 chars (32-char overlap), content-addressed by md5
    (module docstring). `posexplode(sequence(...))` keeps the fan-out
    map-side in codegen — chunk_idx IS the ladder position, so Spark's
    posexplode ordinal equals the oracle's start/STRIDE without a
    division."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    n = F.length("text")
    # sequence(0, -1, S) THROWS (it does not return an empty array):
    # an empty document must produce zero chunks, not kill the stage
    # (caught by tests/test_properties.py::test_chunk_ladder_property)
    starts = F.when(n > 0, F.sequence(F.lit(0), n - 1, F.lit(_STRIDE)))
    chunked = docs.select(
        "doc_id",
        "text",
        F.posexplode(starts).alias("chunk_idx", "chunk_start"),
    )
    body = F.substring(
        F.col("text"), F.col("chunk_start") + 1, _CHUNK
    )
    return chunked.select(
        "doc_id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.col("chunk_start").cast("long").alias("chunk_start"),
        F.length(body).cast("long").alias("chunk_len"),
        F.md5(body.cast("binary")).alias("chunk_md5"),
    )
