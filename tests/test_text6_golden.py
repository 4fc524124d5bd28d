"""Goldens for the r12 late registrations (plans/text6.py): crafted
fixtures with hand-derivable answers, independent of the DuckDB twins.
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from numalogic_prometheus_spark import plans
from numalogic_prometheus_spark.plans.text6 import _LM_K, _SEG

QUERIES = plans.all_queries()


def _docs(spark, tmp_path, rows):
    path = str(tmp_path / "documents.parquet")
    spark.createDataFrame(rows, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(path)
    return str(tmp_path)


def test_boilerplate_planted_segment_stripped(spark, tmp_path):
    """Three docs share a planted 12-token banner segment; each also
    carries unique content. The banner (df=3) must strip from all
    three, unique segments (df=1) must survive, the fingerprint must
    hash the ORDER-PRESERVED survivors, and a doc shorter than one
    segment reports zeros with the empty fingerprint."""
    banner = " ".join(f"b{i}" for i in range(_SEG))
    u = lambda d: " ".join(f"u{d}x{i}" for i in range(_SEG))  # noqa: E731
    rows = [
        (1, f"{banner} {u(1)}"),            # banner first
        (2, f"{u(2)} {banner}"),            # banner second
        (3, f"{banner} {u(3)} tail junk"),  # partial block dropped
        (4, "too short"),                   # 2 tokens → 0 segments
    ]
    out = {
        r["doc_id"]: r
        for r in QUERIES["text_boilerplate_segments"](
            spark, _docs(spark, tmp_path, rows)
        ).collect()
    }
    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()  # noqa: E731
    for d in (1, 2, 3):
        assert out[d]["n_segments"] == 2
        assert out[d]["n_boiler_segments"] == 1
        assert out[d]["kept_tokens"] == _SEG
        assert out[d]["cleaned_fp"] == md5(u(d))
    assert out[4]["n_segments"] == 0
    assert out[4]["kept_tokens"] == 0
    assert out[4]["cleaned_fp"] == md5("")


def test_bigram_lm_hand_computed(spark, tmp_path):
    """Two-doc corpus small enough to score by hand: doc 1 repeats the
    bigram (a b); doc 2 contributes (a c). Corpus bigram counts:
    c2(a,b)=2, c2(b,a)=1, c2(a,c)=1; context counts c1(a)=3, c1(b)=1;
    vocabulary {a,b,c} → V=3."""
    rows = [(1, "a b a b"), (2, "a c")]
    got = {
        r["doc_id"]: r
        for r in QUERIES["text_bigram_lm_score"](
            spark, _docs(spark, tmp_path, rows)
        ).collect()
    }
    v = 3.0

    def p(c2, c1):
        return math.log((c2 + _LM_K) / (c1 + _LM_K * v))

    # doc 1 bigrams: (a,b) ×2, (b,a) ×1
    want1 = (2 * p(2, 3) + 1 * p(1, 1)) / 3
    # doc 2 bigrams: (a,c) ×1
    want2 = p(1, 3)
    assert got[1]["n_bigrams"] == 3
    assert abs(got[1]["avg_logprob"] - round(want1, 6)) < 1e-9
    assert got[2]["n_bigrams"] == 1
    assert abs(got[2]["avg_logprob"] - round(want2, 6)) < 1e-9
    # a single-token doc contributes nothing and emits no row
    rows2 = rows + [(3, "solo")]
    got2 = QUERIES["text_bigram_lm_score"](
        spark, _docs(spark, tmp_path, rows2)
    )
    assert got2.filter(F.col("doc_id") == 3).count() == 0
