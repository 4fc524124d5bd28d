"""Streaming incremental dedup: foreachBatch against a persistent index.

The streaming realization of ``dedup_incremental_batch`` (plans/text.py —
reference anchor: dedup-of-seen is pipeline stage B3,
/root/reference/CHANGELOG.md:189,530): each micro-batch of newly ingested
documents is checked against a *persistent* canonical band index — never
against the accumulated corpus — then the index is min-merged with the
batch's own bands and written as a new parquet snapshot.

Index layout: ``{index_dir}/snap={batch_id}/`` parquet snapshots of
``(band_key, canon, toks)`` where ``canon`` is the smallest doc_id seen
for the band and ``toks`` its hashed-token set (kept so the exact-Jaccard
verification of later arrivals needs no corpus lookback). ``read_index``
reads only the latest snapshot; old snapshots are retention-managed (we
keep them all here — they double as the replay/debug trail a production
table format would give you).

100 TB shape: per-trigger work is new×index (index is #buckets rows,
broadcast), the snapshot write is an overwrite of a bounded relation, and
the min-merge is re-aggregable — compaction across snapshots is the same
``groupBy(band_key).min(struct(canon, toks))``. The foreachBatch writer
is idempotent on batch_id: a replayed batch rewrites the same
``snap={id}`` directory (overwrite) and re-derives identical verdicts,
so recovery re-delivery cannot corrupt the index.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from numalogic_prometheus_spark.functions.hashing import hash32
from numalogic_prometheus_spark.operators import dedup as D

_JACCARD_THRESHOLD = 0.7


def featurize_docs(docs: DataFrame) -> DataFrame:
    """(doc_id, text) → (doc_id, band_key, toks): the single corpus pass
    shared by index build and batch probe — same 8-hash MinHash band and
    hashed-token set as the batch entry (plans/text.py
    dedup_incremental_batch), so streaming and batch verdicts agree."""
    toks0 = F.array_distinct(D.tokens_col(F.col("text")))
    feat = docs.select(
        "doc_id",
        D.minhash_signature(toks0, k=8).alias("sig"),
        F.array_distinct(F.transform(toks0, hash32)).alias("toks"),
    )
    return feat.select(
        "doc_id",
        F.concat_ws("_", *[F.col("sig")[i] for i in range(8)]).alias(
            "band_key"
        ),
        "toks",
    )


def _latest_snapshot(index_dir: str) -> str | None:
    if not os.path.isdir(index_dir):
        return None
    snaps = sorted(
        (d for d in os.listdir(index_dir) if d.startswith("snap=")),
        key=lambda d: int(d.split("=", 1)[1]),
    )
    return os.path.join(index_dir, snaps[-1]) if snaps else None


def read_index(spark: SparkSession, index_dir: str) -> DataFrame:
    """Latest index snapshot, or an empty frame with the index schema."""
    snap = _latest_snapshot(index_dir)
    if snap is None:
        return spark.createDataFrame(
            [], "band_key string, canon bigint, toks array<int>"
        )
    return spark.read.parquet(snap)


def merge_index(index: DataFrame, batch_feat: DataFrame) -> DataFrame:
    """Min-merge batch bands into the index. ``min(struct(canon, toks))``
    orders on canon first (struct ordering is field-lexicographic), so
    the canonical doc's token set travels with its id — the same
    re-aggregable merge a cross-snapshot compaction runs."""
    batch_bands = batch_feat.select(
        "band_key", F.col("doc_id").alias("canon"), "toks"
    )
    return (
        index.unionByName(batch_bands)
        .groupBy("band_key")
        .agg(F.min(F.struct("canon", "toks")).alias("c"))
        .select("band_key", F.col("c.canon").alias("canon"),
                F.col("c.toks").alias("toks"))
    )


def batch_verdicts(batch_feat: DataFrame, index: DataFrame) -> DataFrame:
    """One verdict row per batch doc: duplicate-of the canonical for its
    band (index doc or a smaller-id batch-mate) when exact Jaccard ≥ 0.7,
    else new. The join is batch × broadcast(merged index) — the merged
    view makes within-batch duplicates resolve to the batch-mate with the
    smallest id, exactly as the batch entry's full-corpus index does."""
    merged = merge_index(index, batch_feat)
    probe = batch_feat.join(
        F.broadcast(merged.withColumnRenamed("toks", "__ctoks")),
        "band_key",
    )
    inter = F.size(F.array_intersect("toks", "__ctoks")).cast("double")
    jac = inter / (
        F.size("toks") + F.size("__ctoks") - inter
    )
    scored = probe.withColumn(
        "jaccard", F.when(F.col("canon") < F.col("doc_id"), jac)
    )
    dup = F.col("jaccard") >= _JACCARD_THRESHOLD
    return scored.select(
        "doc_id",
        F.when(dup, F.lit("duplicate")).otherwise(F.lit("new")).alias(
            "verdict"
        ),
        F.when(dup, F.col("canon")).alias("dup_of"),
        F.when(dup, F.round("jaccard", 6)).alias("jaccard"),
    )


def make_incremental_dedup_sink(index_dir: str, verdict_dir: str):
    """foreachBatch handler: verdicts appended per batch (partitioned by
    batch id for idempotent overwrite-on-replay), index snapshot written
    per batch. Bind with ``.writeStream.foreachBatch(...)``."""

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        feat = batch_df.transform(featurize_docs)
        # The probe and the merge both consume feat; one bounded
        # materialization stops the stream source re-read.
        feat = feat.localCheckpoint(eager=True)
        index = read_index(spark, index_dir)
        verdicts = batch_verdicts(feat, index)
        # Overwrite-by-batch keeps replays idempotent: a re-delivered
        # batch rewrites its own partition and snapshot, nothing else.
        verdicts.write.mode("overwrite").parquet(
            os.path.join(verdict_dir, f"batch={batch_id}")
        )
        merge_index(index, feat).write.mode("overwrite").parquet(
            os.path.join(index_dir, f"snap={batch_id}")
        )

    return _sink
