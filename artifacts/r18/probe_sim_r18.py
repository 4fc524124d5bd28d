"""SimHash signature kernel probe (r18, guide §4.2).

dedup_simhash_pairs computes the 32-bit SimHash inside interpreted JVM
lambdas: per token one md5 (hoisted, r17) then a zip_with over a
32-element accumulator (bitwiseAND + when + add per bit) — ~32
interpreted ops and an array allocation per token, ~3 200 per 100-token
doc. The numpy form needs ONE md5 per distinct token and a single
(n_tok × 32) bit matrix per doc. Unlike the unigram-minhash probe
(which declined — the JVM route there was 8 md5s/token, cheap), here
the JVM per-token work is pure interpreted expression machinery.

The signature feeds dedup_simhash_pairs AND (via its edges)
dedup_cluster_components, so a win pays twice.

  V0 shipped — JVM simhash_signature expressions
  VK kernel  — mapInArrow (doc_id, simhash), rest of the entry verbatim

Gates: (1) signatures exactly equal on the full corpus; (2) entry
output exactly equal. Interleaved min-of-4, noop sink; decomposition
(signature projection alone) timed too.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(os.path.abspath(__file__)), '..', '..')))

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from numalogic_prometheus_spark.operators import dedup as D
from numalogic_prometheus_spark.session import get_session
from numalogic_prometheus_spark.sources.tables import load_table_spread

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_session(app_name="probe_sim_r18")


def sigs_jvm() -> DataFrame:
    d = load_table_spread(spark, sf_dir, "documents", "doc_id")
    return d.select(
        "doc_id",
        D.simhash_signature(D.tokens_col(F.col("text")), bits=32).alias("simhash"),
    )


def sigs_kernel() -> DataFrame:
    d = load_table_spread(spark, sf_dir, "documents", "doc_id")

    def _kernel(batch_iter):
        import hashlib

        import numpy as np
        import pyarrow as pa

        md5 = hashlib.md5
        powers = (np.int64(1) << np.arange(32, dtype=np.int64))
        for batch in batch_iter:
            doc_ids = batch.column("doc_id")
            texts = batch.column("text").to_pylist()
            sigs: list = []
            for t in texts:
                if t is None:
                    sigs.append(None)
                    continue
                dt = dict.fromkeys(t.split(" "))
                h = np.fromiter(
                    (
                        int.from_bytes(md5(tok.encode("utf-8")).digest()[:4], "big")
                        for tok in dt
                    ),
                    dtype=np.int64,
                    count=len(dt),
                )
                # votes_j = sum over tokens of (bit_j ? +1 : -1)
                bits = (h[:, None] >> np.arange(32)) & 1
                votes = 2 * bits.sum(axis=0) - len(dt)
                sigs.append(int(powers[votes > 0].sum()))
            yield pa.RecordBatch.from_arrays(
                [doc_ids, pa.array(sigs, type=pa.int64())],
                names=["doc_id", "simhash"],
            )

    return d.select("doc_id", "text").mapInArrow(
        _kernel, "doc_id long, simhash long"
    )


def entry_from(sigs: DataFrame) -> DataFrame:
    banded = sigs.select(
        "doc_id",
        "simhash",
        F.explode(F.array(*[F.lit(b) for b in range(4)])).alias("band_idx"),
    ).withColumn(
        "band_key",
        (
            F.floor(F.col("simhash") / F.pow(F.lit(2.0), F.col("band_idx") * 8))
            .cast("long")
            % 256
        ),
    )
    canon = banded.groupBy("band_idx", "band_key").agg(
        F.min("doc_id").alias("id_a"),
        F.min_by("simhash", "doc_id").alias("sim_a"),
    )
    hamming = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    return (
        banded.join(canon, ["band_idx", "band_key"])
        .filter(F.col("doc_id") != F.col("id_a"))
        .select(
            "id_a",
            "sim_a",
            F.col("doc_id").alias("id_b"),
            F.col("simhash").alias("sim_b"),
        )
        .filter(hamming <= 6)
        .distinct()
        .select("id_a", "id_b", hamming.cast("int").alias("hamming"))
    )


print("== gate 1: signatures exact (full corpus) ==", flush=True)
ref = dict(sigs_jvm().collect())
got = dict(sigs_kernel().collect())
assert set(ref) == set(got)
bad = [i for i in ref if ref[i] != got[i]]
assert not bad, f"{len(bad)} docs diverge, first: {bad[:3]}"
print(f"signatures identical for {len(ref)} docs", flush=True)

print("== gate 2: entry output exact ==", flush=True)
r = sorted(map(tuple, entry_from(sigs_jvm()).collect()))
g = sorted(map(tuple, entry_from(sigs_kernel()).collect()))
assert r == g, "entry output diverged"
print(f"entry output identical ({len(r)} pairs)", flush=True)

print("== timing (interleaved, min-of-4, noop sink) ==", flush=True)
variants = {"V0": sigs_jvm, "VK": sigs_kernel}
sig_only = {v: [] for v in variants}
entry_t = {v: [] for v in variants}
for rep in range(4):
    for v, fn in variants.items():
        spark.catalog.clearCache()
        t0 = time.monotonic()
        fn().write.format("noop").mode("overwrite").save()
        sig_only[v].append(round(time.monotonic() - t0, 3))
        spark.catalog.clearCache()
        t0 = time.monotonic()
        entry_from(fn()).write.format("noop").mode("overwrite").save()
        dt = time.monotonic() - t0
        entry_t[v].append(round(dt, 3))
        print(f"rep{rep} {v}: sigs={sig_only[v][-1]:.3f}s entry={dt:.3f}s", flush=True)

print("---")
for v in variants:
    print(
        f"{v}: entry min={min(entry_t[v]):.3f} series={entry_t[v]} | "
        f"sigs min={min(sig_only[v]):.3f} series={sig_only[v]}"
    )
