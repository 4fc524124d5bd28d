"""Bit-exactness of the vectorized shingle/MinHash Arrow kernel
(operators/dedup.py shingle_features_arrow, r18) against the JVM
expression route it replaced (array_distinct(shingle_hash_col(
transform(tokens, hash32))) + minhash_int_signature).

The kernel re-implements the per-token md5, Rabin-Karp window mixing,
first-occurrence distinct and the affine MinHash maps in
hashlib/numpy/pandas; drift in ANY bit changes candidate pairs in
dedup_shingle_minhash_pairs. Parity is asserted on the full sf0.001
corpus and on synthetic edge rows. Docs with < w tokens are OUTSIDE the
JVM route's domain (element_at raises under ANSI; the corpus guarantees
>= 10 tokens per doc), so for those the test pins the kernel's
documented zero-pad semantics against independently computed hashes."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from numalogic_prometheus_spark.functions.hashing import hash32
from numalogic_prometheus_spark.operators import dedup as D
from numalogic_prometheus_spark.sources.tables import load_table_spread


def _jvm_features(df, k=4, w=3):
    hset = D.shingle_hash_col(
        F.transform(D.tokens_col(F.col("text")), hash32), w=w
    )
    hsets = df.select("doc_id", F.array_distinct(hset).alias("hset"))
    return hsets.select(
        "doc_id",
        "hset",
        D.minhash_int_signature(F.col("hset"), k=k).alias("sig"),
    )


def _assert_identical(jvm, py):
    # hset element ORDER matters too: pd.unique must mirror
    # array_distinct's first-occurrence order — compare unsorted.
    diff = jvm.exceptAll(py).count() + py.exceptAll(jvm).count()
    assert diff == 0, f"kernel drift: {diff} differing rows"


def test_arrow_kernel_matches_jvm_on_corpus(spark, sf_dir):
    d = load_table_spread(spark, sf_dir, "documents", "doc_id")
    assert d.count() > 0
    jvm = _jvm_features(d)
    py = D.shingle_features_arrow(d, k=4, w=3).select(
        "doc_id", "hset", "sig"
    )
    _assert_identical(jvm, py)


def test_arrow_kernel_matches_jvm_on_edge_rows(spark):
    rows = [
        (1, None),  # NULL text: all-NULL->0 window on both paths
        (5, "a b c"),  # exactly one full window, no padding
        (6, "a a a a a"),  # repeated tokens -> distinct collapses
        (7, "x y z x y z x y"),  # repeated shingles mid-doc
        (8, "a b c d"),  # two overlapping windows
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    jvm = _jvm_features(d)
    py = D.shingle_features_arrow(d, k=4, w=3).select(
        "doc_id", "hset", "sig"
    )
    _assert_identical(jvm, py)


def _h32(tok: str) -> int:
    return int.from_bytes(hashlib.md5(tok.encode()).digest()[:4], "big")


def test_arrow_kernel_short_doc_zero_pad_semantics(spark):
    """Docs with < w tokens: one window, missing positions read 0 (the
    coalesce-0 semantics shingle_hash_col documents; the JVM expression
    raises on these under ANSI so the kernel is the only evaluator).
    Expected values derived here independently of the kernel."""
    c0, c1, c2 = D.SHINGLE_C
    mod = D.SHINGLE_MOD
    rows = [(2, ""), (3, "one"), (4, "two tokens")]
    expect = {
        2: (_h32("") * c0) % mod,
        3: (_h32("one") * c0) % mod,
        4: (_h32("two") * c0 + _h32("tokens") * c1) % mod,
    }
    d = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.doc_id: r for r in D.shingle_features_arrow(d, k=4, w=3).collect()
    }
    for doc_id, h in expect.items():
        assert out[doc_id].hset == [h], (doc_id, out[doc_id].hset, h)
        sig = [
            ((h * P + Q) % mod) for P, Q in D.MINHASH_INT_SEEDS[:4]
        ]
        assert out[doc_id].sig == sig


def test_arrow_kernel_rejects_unimplemented_width(spark):
    d = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    try:
        D.shingle_features_arrow(d, k=4, w=2)
    except ValueError:
        return
    raise AssertionError("w != 3 must raise, not silently mis-hash")
