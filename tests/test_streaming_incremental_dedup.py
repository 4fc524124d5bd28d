"""Streaming incremental dedup: the production ingest shape end-to-end.

Micro-batches of documents arrive on a file stream; each batch is
deduplicated against the persistent canonical band index (never the
accumulated corpus), verdicts land in a per-batch parquet sink, and the
index is min-merged and snapshotted. Pins cross-batch dedup (a later
batch's verbatim copy resolves to the earlier batch's doc via the index
alone), within-batch dedup, snapshot lineage, and replay idempotency.
"""

from __future__ import annotations

import os
import time

from numalogic_prometheus_spark.streaming.incremental_dedup import (
    batch_verdicts,
    featurize_docs,
    make_incremental_dedup_sink,
    merge_index,
    read_index,
)

A = "the quick brown fox jumps over the lazy dog near the quiet river bank"
B = "structured streaming unifies batch and stream processing with one api"
C = "minhash banding buckets similar documents without comparing all pairs"
D = "catalyst pushes filters below the scan so parquet prunes row groups"

BATCHES = [
    [(1, A), (2, B)],
    [(10, A), (11, C), (12, C)],  # 10 dups batch-0's A; 12 dups 11 in-batch
    [(20, C), (21, D)],  # 20 dups batch-1's C — only the index knows C
]


def _write_stream_files(spark, stream_dir: str) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    for i, rows in enumerate(BATCHES):
        # flat single-file parquet: the file stream source lists files,
        # not Spark-style output directories
        path = os.path.join(stream_dir, f"b{i}.parquet")
        ids, texts = zip(*rows)
        pq.write_table(
            pa.table(
                {"doc_id": pa.array(ids, pa.int64()), "text": list(texts)}
            ),
            path,
        )
        # file-source ordering is by modification time: pin it ascending
        mtime = time.time() - 300 + 60 * i
        os.utime(path, (mtime, mtime))


def _run_stream(spark, tmp_path) -> tuple[str, str]:
    stream_dir = str(tmp_path / "incoming")
    index_dir = str(tmp_path / "index")
    verdict_dir = str(tmp_path / "verdicts")
    os.makedirs(stream_dir)
    _write_stream_files(spark, stream_dir)
    schema = "doc_id bigint, text string"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir)
    )
    q = (
        stream.writeStream.outputMode("append")
        .foreachBatch(make_incremental_dedup_sink(index_dir, verdict_dir))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return index_dir, verdict_dir


def _verdict_map(spark, verdict_dir: str) -> dict[int, tuple]:
    rows = spark.read.parquet(verdict_dir).collect()
    assert len(rows) == sum(len(b) for b in BATCHES)
    return {
        r["doc_id"]: (r["verdict"], r["dup_of"], r["jaccard"]) for r in rows
    }


def test_cross_batch_and_in_batch_verdicts(spark, tmp_path):
    index_dir, verdict_dir = _run_stream(spark, tmp_path)
    got = _verdict_map(spark, verdict_dir)
    assert got[1] == ("new", None, None)
    assert got[2] == ("new", None, None)
    # cross-batch: 10's only route to 1 is the snap=0 index
    assert got[10] == ("duplicate", 1, 1.0)
    assert got[11] == ("new", None, None)
    # within-batch: 12 resolves to its batch-mate 11, not to the index
    assert got[12] == ("duplicate", 11, 1.0)
    # two batches later, C is still canonical-11 in the index
    assert got[20] == ("duplicate", 11, 1.0)
    assert got[21] == ("new", None, None)


def test_index_snapshots_are_min_merged(spark, tmp_path):
    index_dir, _ = _run_stream(spark, tmp_path)
    snaps = sorted(d for d in os.listdir(index_dir) if d.startswith("snap="))
    assert snaps == ["snap=0", "snap=1", "snap=2"]
    final = {
        r["band_key"]: r["canon"]
        for r in read_index(spark, index_dir).collect()
    }
    # canonical ids only — duplicates never displace the first arrival
    assert set(final.values()) == {1, 2, 11, 21}
    # earlier snapshot is a prefix: canon for A's band is 1 in snap=0 too
    first = {
        r["band_key"]: r["canon"]
        for r in spark.read.parquet(os.path.join(index_dir, "snap=0")).collect()
    }
    assert set(first.values()) == {1, 2}
    assert all(final[k] == v for k, v in first.items())


def test_replayed_batch_is_idempotent(spark, tmp_path):
    """Re-delivering the last committed batch (the recovery case: sink
    committed, source offset didn't) rewrites the same verdicts and the
    same snapshot — the sink reads the newest snapshot with id strictly
    below its batch_id, so the replay consumes exactly what the first
    delivery consumed, never its own output."""
    index_dir, verdict_dir = _run_stream(spark, tmp_path)
    before = _verdict_map(spark, verdict_dir)
    snap2 = {
        (r["band_key"], r["canon"])
        for r in spark.read.parquet(os.path.join(index_dir, "snap=2")).collect()
    }
    sink = make_incremental_dedup_sink(index_dir, verdict_dir)
    replay = spark.createDataFrame(BATCHES[2], "doc_id bigint, text string")
    sink(replay, 2)
    assert _verdict_map(spark, verdict_dir) == before
    snap2_after = {
        (r["band_key"], r["canon"])
        for r in spark.read.parquet(os.path.join(index_dir, "snap=2")).collect()
    }
    assert snap2_after == snap2


def test_batch_verdicts_agrees_with_empty_index_bootstrap(spark):
    """Bootstrap case: with an empty index the first batch's verdicts are
    pure within-batch dedup — the same relation the batch registry entry
    computes over its slice."""
    feat = featurize_docs(
        spark.createDataFrame(
            [(5, A), (7, A), (8, B)], "doc_id bigint, text string"
        )
    )
    empty = spark.createDataFrame(
        [], "band_key string, canon bigint, toks array<int>"
    )
    got = {
        r["doc_id"]: (r["verdict"], r["dup_of"])
        for r in batch_verdicts(feat, empty).collect()
    }
    assert got == {5: ("new", None), 7: ("duplicate", 5), 8: ("new", None)}
    merged = merge_index(empty, feat)
    assert {r["canon"] for r in merged.collect()} == {5, 8}


def test_out_of_order_smaller_id_still_reported_duplicate(spark, tmp_path):
    """Dedup-of-seen: content indexed under canon 10 arriving again as
    doc 5 (smaller id) must be reported duplicate-of-10 — the pre-merge
    index wins the probe even though the min-merge then crowns 5 as the
    band's canon for future batches."""
    index_dir = str(tmp_path / "idx")
    verdict_dir = str(tmp_path / "out")
    sink = make_incremental_dedup_sink(index_dir, verdict_dir)
    sink(spark.createDataFrame([(10, A)], "doc_id bigint, text string"), 0)
    sink(spark.createDataFrame([(5, A)], "doc_id bigint, text string"), 1)
    rows = {
        r["doc_id"]: (r["verdict"], r["dup_of"], r["jaccard"])
        for r in spark.read.parquet(verdict_dir).collect()
    }
    assert rows[10] == ("new", None, None)
    assert rows[5] == ("duplicate", 10, 1.0)
    # index min-merge crowned the smaller id for future probes
    assert {r["canon"] for r in read_index(spark, index_dir).collect()} == {5}
    # and the replayed batch 1 still re-derives the identical verdict
    sink(spark.createDataFrame([(5, A)], "doc_id bigint, text string"), 1)
    rows2 = {
        r["doc_id"]: (r["verdict"], r["dup_of"], r["jaccard"])
        for r in spark.read.parquet(verdict_dir).collect()
    }
    assert rows2 == rows


def test_crashed_snapshot_without_success_marker_is_skipped(spark, tmp_path):
    """A snap dir missing _SUCCESS (crash mid-write) must not become the
    authoritative index: read_index falls back to the last committed
    snapshot, and the next trigger rebuilds on top of it."""
    index_dir = str(tmp_path / "idx")
    verdict_dir = str(tmp_path / "out")
    sink = make_incremental_dedup_sink(index_dir, verdict_dir)
    sink(spark.createDataFrame([(1, A)], "doc_id bigint, text string"), 0)
    # simulate a crashed snap=1: directory exists, no _SUCCESS
    os.makedirs(os.path.join(index_dir, "snap=1"))
    assert {r["canon"] for r in read_index(spark, index_dir).collect()} == {1}
    # next delivery (the re-run of batch 1) reads snap=0 and commits over
    # the partial dir
    sink(spark.createDataFrame([(7, A)], "doc_id bigint, text string"), 1)
    rows = {
        r["doc_id"]: (r["verdict"], r["dup_of"])
        for r in spark.read.parquet(verdict_dir).collect()
    }
    assert rows[7] == ("duplicate", 1)
    assert os.path.exists(os.path.join(index_dir, "snap=1", "_SUCCESS"))
