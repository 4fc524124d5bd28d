"""quality_repetition_stats consolidation probe (r18, guide §2.3/§4.2).

The shipped form explodes the corpus twice (unigrams + word bigrams),
pays groupBy(doc_id, term) + groupBy(doc_id) exchanges on each leg
(~1 M exploded rows total at sf0.1) and stitches three relations back
with joins — all to compute aggregates that are PER DOC. Every output
is derivable inside the row.

  V0 shipped — two explode legs, 4 exchanges + 2 joins
  VK kernel  — ONE mapInArrow pass over (doc_id, text, n_chars):
               collections.Counter per doc for unigrams and bigrams,
               the same exact-integer numerators/denominators, the
               same IEEE division sequence. Zero exchanges, zero joins.

Gate: output rows EXACTLY equal (sorted collect, bit-identical
doubles) on the full corpus. Interleaved min-of-4, noop sink.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(os.path.abspath(__file__)), '..', '..')))

from pyspark.sql import DataFrame

from numalogic_prometheus_spark.plans.quality import quality_repetition_stats
from numalogic_prometheus_spark.session import get_session
from numalogic_prometheus_spark.sources.tables import load_table

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_session(app_name="probe_rep_r18")


def v0() -> DataFrame:
    return quality_repetition_stats(spark, sf_dir)


def vk() -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "n_chars"
    )

    def _kernel(batch_iter):
        from collections import Counter

        import pyarrow as pa

        for batch in batch_iter:
            doc_ids = batch.column("doc_id").to_pylist()
            texts = batch.column("text").to_pylist()
            ncs = batch.column("n_chars").to_pylist()
            out: dict = {
                "doc_id": [], "n_tokens": [], "n_distinct": [],
                "top_count": [], "dup_token_frac": [], "top_token_frac": [],
                "top_token_char_frac": [], "top_bigram_char_frac": [],
            }
            for did, t, nc in zip(doc_ids, texts, ncs):
                if t is None:
                    continue  # split(NULL) -> explode drops the doc (V0)
                toks = [x for x in t.split(" ") if x != ""]
                if not toks:
                    continue  # empty token array: explode emits nothing
                uni = Counter(toks)
                n_tokens = len(toks)
                n_distinct = len(uni)
                top_count = max(uni.values())
                top_token_chars = max(c * len(term) for term, c in uni.items())
                if n_tokens >= 2:
                    bi = Counter(zip(toks, toks[1:]))
                    top_bigram_chars = max(
                        c * (len(a) + len(b)) for (a, b), c in bi.items()
                    )
                else:
                    top_bigram_chars = 0  # V0: left join -> coalesce(_, 0)
                chars = float(nc - n_tokens + 1)
                out["doc_id"].append(did)
                out["n_tokens"].append(n_tokens)
                out["n_distinct"].append(n_distinct)
                out["top_count"].append(top_count)
                out["dup_token_frac"].append(1 - n_distinct / float(n_tokens))
                out["top_token_frac"].append(top_count / float(n_tokens))
                out["top_token_char_frac"].append(top_token_chars / chars)
                out["top_bigram_char_frac"].append(top_bigram_chars / chars)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(out["doc_id"], type=pa.int64()),
                    pa.array(out["n_tokens"], type=pa.int64()),
                    pa.array(out["n_distinct"], type=pa.int64()),
                    pa.array(out["top_count"], type=pa.int64()),
                    pa.array(out["dup_token_frac"], type=pa.float64()),
                    pa.array(out["top_token_frac"], type=pa.float64()),
                    pa.array(out["top_token_char_frac"], type=pa.float64()),
                    pa.array(out["top_bigram_char_frac"], type=pa.float64()),
                ],
                names=[
                    "doc_id", "n_tokens", "n_distinct", "top_count",
                    "dup_token_frac", "top_token_frac",
                    "top_token_char_frac", "top_bigram_char_frac",
                ],
            )

    return docs.mapInArrow(
        _kernel,
        "doc_id long, n_tokens long, n_distinct long, top_count long, "
        "dup_token_frac double, top_token_frac double, "
        "top_token_char_frac double, top_bigram_char_frac double",
    )


print("== gate: output exactly equal (full corpus) ==", flush=True)
ref = sorted(map(tuple, v0().collect()))
got = sorted(map(tuple, vk().collect()))
assert len(ref) == len(got), f"row counts differ {len(ref)} vs {len(got)}"
bad = [i for i, (a, b) in enumerate(zip(ref, got)) if a != b]
assert not bad, f"{len(bad)} rows diverge, first: ref={ref[bad[0]]} got={got[bad[0]]}"
print(f"identical ({len(ref)} rows, bit-exact)", flush=True)

print("== timing (interleaved, min-of-4, noop sink) ==", flush=True)
results = {"V0": [], "VK": []}
for rep in range(4):
    for name, fn in [("V0", v0), ("VK", vk)]:
        spark.catalog.clearCache()
        t0 = time.monotonic()
        fn().write.format("noop").mode("overwrite").save()
        dt = time.monotonic() - t0
        results[name].append(round(dt, 3))
        print(f"rep{rep} {name}: {dt:.3f}s", flush=True)

print("---")
for v in results:
    print(f"{v}: min={min(results[v]):.3f} series={results[v]}")
