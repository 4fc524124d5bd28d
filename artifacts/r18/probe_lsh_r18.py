"""Unigram MinHash feature kernel probe (r18 follow-on to the shingle
kernel, guide §4.2).

dedup_minhash_lsh_pairs builds its per-doc features as two eager pins:
stage 1 `array_distinct(split(text))`, stage 2 k=8 STRING-SEEDED md5
min-hashes (`hash32_seeded` → md5 → hex → substring → conv inside an
interpreted higher-order lambda, 8 branches) plus the hash32 token
set — the same interpreted-md5 cost class the shingle kernel removed
(2.3 s of that entry). The same `feat` pipeline runs inside
sample_split_by_cluster and sample_split_snapshot_fed via
build_components, so the win triples.

  V0 shipped — two JVM pins, then bands/verify
  VK kernel  — ONE mapInArrow pass emits (doc_id, sig, toks): per doc,
               first-occurrence distinct tokens (== array_distinct),
               9 hashlib-md5 calls per distinct token (8 seeds + 1
               unseeded), first-occurrence distinct of the hashed set
               (== array_distinct). One pin instead of two.

Gates: (1) feat rows EXACTLY equal (doc_id, sig list, toks list —
order-sensitive) on the full sf0.1 corpus; (2) entry output exactly
equal. Interleaved min-of-4, noop sink, decomposition timings.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(os.path.abspath(__file__)), '..', '..')))

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from numalogic_prometheus_spark.functions.hashing import hash32
from numalogic_prometheus_spark.operators import dedup as D
from numalogic_prometheus_spark.plans.text import NEARDUP_JACCARD
from numalogic_prometheus_spark.session import get_session
from numalogic_prometheus_spark.sources.tables import load_table_spread

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_session(app_name="probe_lsh_r18")

K = 8


def feat_jvm(cut: bool = True) -> DataFrame:
    d = load_table_spread(spark, sf_dir, "documents", "doc_id")
    tok_arrays = d.select(
        "doc_id", F.array_distinct(D.tokens_col(F.col("text"))).alias("toks0")
    )
    if cut:
        tok_arrays = D.truncate_lineage(tok_arrays)
    feat = tok_arrays.select(
        "doc_id",
        D.minhash_signature(F.col("toks0"), k=K).alias("sig"),
        F.array_distinct(F.transform("toks0", hash32)).alias("toks"),
    )
    return D.truncate_lineage(feat) if cut else feat


def feat_kernel(cut: bool = True) -> DataFrame:
    d = load_table_spread(spark, sf_dir, "documents", "doc_id")

    def _kernel(batch_iter):
        import hashlib

        import numpy as np
        import pandas as pd
        import pyarrow as pa

        md5 = hashlib.md5
        pres = [f"{seed}:".encode("utf-8") for seed in range(K)]
        for batch in batch_iter:
            doc_ids = batch.column("doc_id")
            texts = batch.column("text").to_pylist()
            sigs: list = []
            tokss: list = []
            for t in texts:
                if t is None:
                    # split(NULL) -> NULL array: sig = [NULL]*k, toks NULL
                    sigs.append([None] * K)
                    tokss.append(None)
                    continue
                bts = [tok.encode("utf-8") for tok in dict.fromkeys(t.split(" "))]
                sigs.append(
                    [
                        min(
                            int.from_bytes(md5(pre + tb).digest()[:4], "big")
                            for tb in bts
                        )
                        for pre in pres
                    ]
                )
                hs = np.fromiter(
                    (
                        int.from_bytes(md5(tb).digest()[:4], "big")
                        for tb in bts
                    ),
                    dtype=np.int64,
                    count=len(bts),
                )
                tokss.append(pd.unique(hs).tolist())
            yield pa.RecordBatch.from_arrays(
                [
                    doc_ids,
                    pa.array(sigs, type=pa.list_(pa.int64())),
                    pa.array(tokss, type=pa.list_(pa.int64())),
                ],
                names=["doc_id", "sig", "toks"],
            )

    feat = d.select("doc_id", "text").mapInArrow(
        _kernel, "doc_id long, sig array<long>, toks array<long>"
    )
    return D.truncate_lineage(feat) if cut else feat


def entry_from(feat: DataFrame) -> DataFrame:
    cands = D.lsh_canonical_pairs(feat, "doc_id", "sig", bands=1, rows=K)
    scored = D.jaccard_by_sets(cands, feat, "doc_id", "toks")
    return scored.filter(F.col("jaccard") >= NEARDUP_JACCARD).select(
        "id_a", "id_b", F.round("jaccard", 6).alias("jaccard")
    )


print("== gate 1: feat rows exact (full corpus) ==", flush=True)
ref = {
    r["doc_id"]: (tuple(r["sig"]), tuple(r["toks"]))
    for r in feat_jvm(cut=False).collect()
}
got = {
    r["doc_id"]: (tuple(r["sig"]), tuple(r["toks"]))
    for r in feat_kernel(cut=False).collect()
}
assert set(ref) == set(got), "doc_id sets differ"
bad = [i for i in ref if ref[i] != got[i]]
assert not bad, f"{len(bad)} docs diverge, first: {bad[:3]}"
print(f"feat identical for {len(ref)} docs", flush=True)

print("== gate 2: entry output exact ==", flush=True)
ref_out = sorted(map(tuple, entry_from(feat_jvm()).collect()))
got_out = sorted(map(tuple, entry_from(feat_kernel()).collect()))
assert ref_out == got_out, "entry output diverged"
print(f"entry output identical ({len(ref_out)} pairs)", flush=True)

print("== timing (interleaved, min-of-4, noop sink) ==", flush=True)
variants = {"V0": feat_jvm, "VK": feat_kernel}
results = {v: [] for v in variants}
pin_only = {v: [] for v in variants}
for rep in range(4):
    for v, fn in variants.items():
        spark.catalog.clearCache()
        t0 = time.monotonic()
        fn().write.format("noop").mode("overwrite").save()
        pin_only[v].append(round(time.monotonic() - t0, 3))
        spark.catalog.clearCache()
        t0 = time.monotonic()
        entry_from(fn()).write.format("noop").mode("overwrite").save()
        dt = time.monotonic() - t0
        results[v].append(round(dt, 3))
        print(f"rep{rep} {v}: pins={pin_only[v][-1]:.3f}s entry={dt:.3f}s", flush=True)

print("---")
for v in variants:
    print(
        f"{v}: entry min={min(results[v]):.3f} series={results[v]} | "
        f"pins min={min(pin_only[v]):.3f} series={pin_only[v]}"
    )
