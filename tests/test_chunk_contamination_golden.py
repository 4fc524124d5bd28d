"""Golden pin for text_chunk_contamination (plans/text5.py; VERDICT r9
#6): a PLANTED cross-corpus chunk — one training doc embedding an exact
128-char aligned block of an eval doc — must be counted at exactly the
chunk grain, and unrelated docs must stay at zero overlap."""

from __future__ import annotations


def test_planted_cross_corpus_chunk(spark, tmp_path):
    from numalogic_prometheus_spark.plans.text5 import (
        _CHUNK,
        _STRIDE,
        text_chunk_contamination,
    )

    # eval doc 0 (doc_id % 11 == 0): 4 full strides of distinct content
    eval_text = "".join(chr(ord("a") + i % 26) * 8 for i in range(48))
    assert len(eval_text) == 384 == 4 * _STRIDE
    # train doc 1: its SECOND stride block reproduces eval doc 0's first
    # CHUNK chars exactly, ladder-aligned (starts at _STRIDE)
    filler = "z" * _STRIDE
    train_hit = filler + eval_text[:_CHUNK] + "q" * (4 * _STRIDE - _STRIDE - _CHUNK)
    assert len(train_hit) == 4 * _STRIDE
    # train doc 2: no shared 128-char aligned block at all
    train_clean = "m" * (3 * _STRIDE)
    rows = [(0, eval_text), (1, train_hit), (2, train_clean)]
    spark.createDataFrame(rows, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "documents.parquet"))

    got = {
        r["doc_id"]: (r["n_chunks"], r["n_overlap"], r["flagged"])
        for r in text_chunk_contamination(spark, str(tmp_path)).collect()
    }
    # doc 0 is eval-side: absent from the training output
    assert set(got) == {1, 2}
    # doc 1: 4 ladder chunks (starts 0,96,192,288); exactly ONE — the
    # planted block at start 96 — hashes into the eval set
    n1, o1, f1 = got[1]
    assert (n1, o1, f1) == (4, 1, 0)
    # doc 2: same ladder, zero overlap
    assert got[2] == (3, 0, 0)
