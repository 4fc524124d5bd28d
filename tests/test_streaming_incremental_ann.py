"""Streaming incremental ANN: the serving ingest shape end-to-end.

Micro-batches of embeddings arrive on a file stream; each batch is
served top-k neighbors from the persistent IVF index built over PRIOR
batches (results/batch=0 is empty — nothing was indexed yet), then
appended to the index snapshot. The expected neighbors are recomputed
by an independent pure-Python mirror of the probe (same centroid set,
same argmin key, same nprobe), so the test verifies the Spark plan
against a second implementation, not against itself. Also pins replay
idempotency: re-delivering a batch rewrites bit-identical results.
"""

from __future__ import annotations

import math
import os
import time

from pyspark.sql import functions as F

from numalogic_prometheus_spark.streaming.incremental_ann import (
    make_incremental_ann_sink,
    read_index,
)

# vec_id ranges per micro-batch; batch 0 carries the centroid slice
# (vec_id % 31 == 0 → {0, 31, 62}, three cells) so nprobe=2 genuinely
# restricts the candidate set.
_BATCHES = [(0, 93), (93, 113), (113, 123)]
_K, _NPROBE = 3, 2


def _load_vecs(spark, sf_dir) -> dict[int, list[float]]:
    rows = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .filter(F.col("vec_id") < _BATCHES[-1][1])
        .select("vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v"))
        .collect()
    )
    return {r["vec_id"]: r["v"] for r in rows}


def _cos(a: list[float], b: list[float]) -> float:
    dot = 0.0
    for x, y in zip(a, b):
        dot += x * y
    na = 0.0
    for x in a:
        na += x * x
    nb = 0.0
    for y in b:
        nb += y * y
    return dot / (math.sqrt(na) * math.sqrt(nb))


def _key(q, cid, vecs) -> int:
    return round((1 - _cos(q, vecs[cid])) * 1000000) * 1000000000 + cid


def _mirror_topk(vecs, corpus_ids, query_ids):
    """Pure-Python IVF probe: assign corpus to argmin-key cells, probe
    each query's _NPROBE nearest cells, exact top-_K re-rank."""
    cents = [c for c in (0, 31, 62) if c in corpus_ids]
    cell = {
        vid: min(cents, key=lambda c: _key(vecs[vid], c, vecs))
        for vid in corpus_ids
    }
    out = {}
    for q in query_ids:
        probed = sorted(cents, key=lambda c: _key(vecs[q], c, vecs))[:_NPROBE]
        cands = [vid for vid in corpus_ids if cell[vid] in probed]
        ranked = sorted(
            cands,
            key=lambda vid: (-round(_cos(vecs[q], vecs[vid]), 6), vid),
        )
        out[q] = ranked[:_K]
    return out


def _write_stream_files(spark, sf_dir, stream_dir: str) -> None:
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    for i, (lo, hi) in enumerate(_BATCHES):
        path = os.path.join(stream_dir, f"b{i}.parquet")
        pdf = (
            emb.filter((F.col("vec_id") >= lo) & (F.col("vec_id") < hi))
            .select("vec_id", "embedding")
            .toPandas()
        )
        pdf.to_parquet(path, index=False)
        mtime = time.time() - 300 + 60 * i
        os.utime(path, (mtime, mtime))


def _run_stream(spark, sf_dir, tmp_path) -> tuple[str, str]:
    stream_dir = str(tmp_path / "incoming")
    index_dir = str(tmp_path / "index")
    result_dir = str(tmp_path / "results")
    os.makedirs(stream_dir)
    _write_stream_files(spark, sf_dir, stream_dir)
    stream = (
        spark.readStream.schema("vec_id bigint, embedding array<float>")
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir)
    )
    q = (
        stream.writeStream.outputMode("append")
        .foreachBatch(
            make_incremental_ann_sink(index_dir, result_dir, k=_K, nprobe=_NPROBE)
        )
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return index_dir, result_dir


def _result_map(spark, result_dir: str, batch_id: int):
    path = os.path.join(result_dir, f"batch={batch_id}")
    rows = spark.read.parquet(path).collect()
    out: dict[int, list[int]] = {}
    for r in sorted(rows, key=lambda r: (r["query_id"], r["rn"])):
        out.setdefault(r["query_id"], []).append(r["neighbor_id"])
    return out


def test_serving_matches_pure_python_mirror(spark, sf_dir, tmp_path):
    index_dir, result_dir = _run_stream(spark, sf_dir, tmp_path)
    vecs = _load_vecs(spark, sf_dir)

    # batch 0: nothing indexed yet → no neighbors to serve
    assert _result_map(spark, result_dir, 0) == {}

    # batch 1 serves from batch 0's index; batch 2 from batches 0+1 —
    # cross-batch accumulation, verified against the independent mirror
    ids0 = set(range(*_BATCHES[0]))
    ids1 = set(range(*_BATCHES[1]))
    assert _result_map(spark, result_dir, 1) == _mirror_topk(
        vecs, ids0, sorted(ids1)
    )
    assert _result_map(spark, result_dir, 2) == _mirror_topk(
        vecs, ids0 | ids1, sorted(range(*_BATCHES[2]))
    )

    # the final snapshot holds every ingested vector exactly once
    idx = read_index(spark, index_dir)
    assert idx.count() == _BATCHES[-1][1]
    assert idx.select("vec_id").distinct().count() == _BATCHES[-1][1]


def test_replay_is_idempotent(spark, sf_dir, tmp_path):
    index_dir, result_dir = _run_stream(spark, sf_dir, tmp_path)
    before = _result_map(spark, result_dir, 1)
    snap_before = sorted(
        r["vec_id"]
        for r in spark.read.parquet(
            os.path.join(index_dir, "snap=1")
        ).collect()
    )
    # re-deliver batch 1 through the sink directly (what a recovery
    # replay does): same pre-batch index via before=batch_id, so results
    # and the rewritten snapshot must be identical
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    lo, hi = _BATCHES[1]
    batch1 = emb.filter(
        (F.col("vec_id") >= lo) & (F.col("vec_id") < hi)
    ).select("vec_id", "embedding")
    sink = make_incremental_ann_sink(index_dir, result_dir, k=_K, nprobe=_NPROBE)
    sink(batch1, 1)
    assert _result_map(spark, result_dir, 1) == before
    snap_after = sorted(
        r["vec_id"]
        for r in spark.read.parquet(
            os.path.join(index_dir, "snap=1")
        ).collect()
    )
    assert snap_after == snap_before


def test_empty_first_batch_defers_quantizer(spark, sf_dir, tmp_path):
    """ADVICE r9: an empty batch 0 (or one missing the id-slice) must
    NOT commit an empty quantizer under _SUCCESS — that would zero out
    assign_cells forever. The quantizer waits for the first non-empty
    batch; an id-slice miss falls back to the batch's lowest vec_ids."""
    from numalogic_prometheus_spark.streaming.incremental_ann import (
        read_centroids,
    )

    index_dir = str(tmp_path / "index")
    result_dir = str(tmp_path / "results")
    sink = make_incremental_ann_sink(index_dir, result_dir, k=_K, nprobe=_NPROBE)

    empty = spark.createDataFrame([], "vec_id bigint, embedding array<float>")
    sink(empty, 0)
    assert read_centroids(spark, index_dir) is None  # nothing committed
    assert not os.path.exists(os.path.join(result_dir, "batch=0"))

    # batch 1: vec_ids 1..20 — NO vec_id % 31 == 0 row → fallback picks
    # the 8 lowest ids as centroids; the full batch lands in the index
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    b1 = emb.filter((F.col("vec_id") >= 1) & (F.col("vec_id") <= 20)).select(
        "vec_id", "embedding"
    )
    sink(b1, 1)
    cents = read_centroids(spark, index_dir)
    assert cents is not None
    assert sorted(r["cent_id"] for r in cents.collect()) == list(range(1, 9))
    idx = read_index(spark, index_dir)
    assert sorted(r["vec_id"] for r in idx.collect()) == list(range(1, 21))

    # batch 2 is served non-empty results from batch 1's index
    b2 = emb.filter((F.col("vec_id") >= 21) & (F.col("vec_id") <= 30)).select(
        "vec_id", "embedding"
    )
    sink(b2, 2)
    served = _result_map(spark, result_dir, 2)
    assert set(served) == set(range(21, 31))
    assert all(1 <= n <= 20 for ns in served.values() for n in ns)
