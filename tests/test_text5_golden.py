"""Golden pins for plans/text5.py (overlapping chunking) on crafted
documents.

The shipped documents are 48-553 chars, so every doc chunks — but none
lands exactly on the ladder edges that define the semantics: a doc
shorter than one chunk, a doc exactly one stride long (single chunk,
no tail), a doc exactly one chunk long (the 32-char tail IS re-emitted
as a second chunk — ladder semantics are deterministic, not
tail-suppressing), and a multi-chunk doc whose md5s must be the
hashlib md5 of the exact substrings (proving both engines hash the
same bytes and that concatenating chunk[:stride] prefixes + the last
chunk reconstructs the document)."""

from __future__ import annotations

import hashlib

from tests.oracle_harness import compare_crafted

_CHUNK, _STRIDE = 128, 96


def _expected_chunks(text: str):
    out = []
    for i, s in enumerate(range(0, len(text), _STRIDE)):
        body = text[s : s + _CHUNK]
        out.append((i, s, len(body), hashlib.md5(body.encode()).hexdigest()))
    return out


def test_chunk_overlap_ladder_edges(spark, tmp_path):
    from numalogic_prometheus_spark.plans.text5 import text_chunk_overlap

    docs = {
        1: "short doc " * 5,                  # 50 chars, one partial chunk
        2: "x" * 95 + "Y",                    # exactly one stride: 1 chunk
        3: "".join(chr(97 + i % 26) for i in range(_CHUNK)),  # exactly 128
        4: "word boundary test " * 16,        # 304 chars, 4 chunks
    }
    spark.createDataFrame(
        [(k, v) for k, v in docs.items()], "doc_id long, text string"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    rows = text_chunk_overlap(spark, str(tmp_path)).collect()
    got = {}
    for r in rows:
        got.setdefault(r["doc_id"], []).append(
            (r["chunk_idx"], r["chunk_start"], r["chunk_len"], r["chunk_md5"])
        )
    for v in got.values():
        v.sort()

    for doc_id, text in docs.items():
        assert got[doc_id] == _expected_chunks(text), doc_id
    # the edge counts the docstring promises
    assert len(got[1]) == 1 and got[1][0][2] == 50
    assert len(got[2]) == 1 and got[2][0][2] == 96
    assert len(got[3]) == 2 and got[3][1][2] == _CHUNK - _STRIDE
    assert len(got[4]) == 4

    # reconstruction: stride-prefixes of all but the last chunk + the
    # last chunk body cover the doc exactly (verified via the hashes
    # above; here just the span arithmetic)
    spans = got[4]
    assert spans[-1][1] + spans[-1][2] == len(docs[4])
    for (i1, s1, _l1, _h1), (i2, s2, _l2, _h2) in zip(spans, spans[1:]):
        assert i2 == i1 + 1 and s2 - s1 == _STRIDE

    compare_crafted(spark, tmp_path, "text_chunk_overlap")


def test_chunk_plan_is_mapside(spark):
    """The fan-out must be a Generate over the scan — no shuffle, no
    join, no UDF (module docstring's 100 TB posture)."""
    from numalogic_prometheus_spark.plans.text5 import text_chunk_overlap

    plan = (
        text_chunk_overlap(spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Generate" in plan
    assert "Exchange" not in plan and "Join" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
