"""Interleaved A/B for dedup_shingle_minhash_pairs' corpus hash pass
(VERDICT r17 #4). Measured breakdown: the two eager pins cost 2.30 s of
the 3.65 s entry, and the hset pin is dominated NOT by md5 itself
(250 k tokens at sf0.1) but by the interpreted higher-order-function
lambda (md5 -> hex -> substring -> conv per element, no codegen inside
transform). Variants (guide §4.2 — hand whole batches to vectorized
native code):

  S0 base — JVM HOF hset pin + JVM sig pin (shipped r17 shape)
  S1 py   — hset computed in ONE mapInArrow pass (hashlib.md5 C loop +
            numpy window mixing per doc); sig derived in JVM as now
  S2 py1  — mapInArrow emits hset AND sig in the same pass; ONE pin,
            both legs project from it

Bit-exactness of the Python kernel vs the JVM expression is asserted
on the full corpus (sorted arrays + sigs) before any timing. Final
entry outputs asserted identical too.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from numalogic_prometheus_spark.operators import dedup as D
from numalogic_prometheus_spark.functions.hashing import hash32
from numalogic_prometheus_spark.sources.tables import load_table_spread
from numalogic_prometheus_spark.session import get_session

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_session(app_name="probe_shingle_r18")

C0, C1, C2 = D.SHINGLE_C
MOD = D.SHINGLE_MOD
SEEDS = D.MINHASH_INT_SEEDS[:4]

HSET_SCHEMA = "doc_id long, hset array<long>"
BOTH_SCHEMA = "doc_id long, hset array<long>, sig array<long>"


def _kernel(batch_iter, emit_sig: bool):
    import hashlib
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    md5 = hashlib.md5
    for batch in batch_iter:
        doc_ids = batch.column("doc_id")
        texts = batch.column("text").to_pylist()
        hsets, sigs = [], []
        for t in texts:
            toks = t.split(" ")
            n = len(toks)
            k = max(n - 2, 1)
            pad = np.zeros(k + 2, dtype=np.int64)
            m = min(n, k + 2)
            pad[:m] = np.fromiter(
                (
                    int.from_bytes(md5(tok.encode("utf-8")).digest()[:4], "big")
                    for tok in toks[:m]
                ),
                dtype=np.int64,
                count=m,
            )
            sh = (pad[:k] * C0 + pad[1 : k + 1] * C1 + pad[2 : k + 2] * C2) % MOD
            hset = pd.unique(sh)  # first-occurrence order == array_distinct
            hsets.append(hset)
            if emit_sig:
                hu = hset.astype(np.uint64)
                sigs.append(
                    [int(((hu * P + Q) % MOD).min()) for P, Q in SEEDS]
                )
        cols = [doc_ids, pa.array([h.tolist() for h in hsets], type=pa.list_(pa.int64()))]
        names = ["doc_id", "hset"]
        if emit_sig:
            cols.append(pa.array(sigs, type=pa.list_(pa.int64())))
            names.append("sig")
        yield pa.RecordBatch.from_arrays(cols, names=names)


def hsets_py(emit_sig: bool = False):
    d = load_table_spread(spark, sf_dir, "documents", "doc_id").select(
        "doc_id", "text"
    )
    schema = BOTH_SCHEMA if emit_sig else HSET_SCHEMA
    return d.mapInArrow(lambda it: _kernel(it, emit_sig), schema)


def hsets_jvm():
    d = load_table_spread(spark, sf_dir, "documents", "doc_id")
    hset = D.shingle_hash_col(F.transform(D.tokens_col(F.col("text")), hash32), w=3)
    return d.select("doc_id", F.array_distinct(hset).alias("hset"))


def entry(variant: str):
    if variant == "S0":
        hsets = hsets_jvm().transform(D.truncate_lineage)
        sigs = hsets.select(
            "doc_id", D.minhash_int_signature(F.col("hset"), k=4).alias("sig")
        ).transform(D.truncate_lineage)
    elif variant == "S1":
        hsets = hsets_py().transform(D.truncate_lineage)
        sigs = hsets.select(
            "doc_id", D.minhash_int_signature(F.col("hset"), k=4).alias("sig")
        ).transform(D.truncate_lineage)
    else:  # S2
        both = hsets_py(emit_sig=True).transform(D.truncate_lineage)
        hsets = both.select("doc_id", "hset")
        sigs = both.select("doc_id", "sig")
    cands = D.lsh_candidate_pairs(sigs, "doc_id", "sig", bands=2, rows=2)
    scored = D.jaccard_by_sets(cands, hsets, "doc_id", "hset")
    return scored.filter(F.col("jaccard") >= 0.2).select(
        "id_a", "id_b", F.round("jaccard", 6).alias("shingle_jaccard")
    )


# ---- bit-exactness gate: full-corpus compare of hset AND sig ----
jvm = hsets_jvm().select("doc_id", F.array_sort("hset").alias("hset"))
py = hsets_py(emit_sig=True)
py_h = py.select("doc_id", F.array_sort("hset").alias("hset"))
diff = jvm.exceptAll(py_h).count() + py_h.exceptAll(jvm).count()
assert diff == 0, f"hset mismatch rows={diff}"
jvm_sig = hsets_jvm().select(
    "doc_id", D.minhash_int_signature(F.col("hset"), k=4).alias("sig")
)
py_sig = py.select("doc_id", "sig")
diff = jvm_sig.exceptAll(py_sig).count() + py_sig.exceptAll(jvm_sig).count()
assert diff == 0, f"sig mismatch rows={diff}"
print("bit-exact: hset + sig identical on the full corpus", flush=True)

rows = {v: sorted(map(tuple, entry(v).collect())) for v in ("S0", "S1", "S2")}
assert rows["S0"] == rows["S1"] == rows["S2"], "entry outputs diverged"
print(f"entry outputs identical ({len(rows['S0'])} rows)", flush=True)

results = {v: [] for v in ("S0", "S1", "S2")}
for rep in range(4):
    for v in results:
        spark.catalog.clearCache()
        t0 = time.monotonic()
        entry(v).write.format("noop").mode("overwrite").save()
        results[v].append(round(time.monotonic() - t0, 3))
        print(f"rep{rep} {v}: {results[v][-1]:.3f}s", flush=True)
print("---")
for v, series in results.items():
    print(f"{v}: min={min(series):.3f} series={series}")
