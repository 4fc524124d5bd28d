"""Regression pins for the round-16 advice items.

1. `_bucket_sql` uses try_element_at: a vector shorter than
   offset+bits buckets with the missing dims contributing 0 (the old
   slice+zip_with semantics) instead of throwing INVALID_ARRAY_INDEX
   under Spark 4's default ANSI mode.
2. The scan-plan cache lives as an attribute on the session object
   (not a WeakKeyDictionary whose values kept the key alive) and its
   mtime key folds in directory-entry mtimes, so an IN-PLACE part-file
   rewrite — which leaves the directory mtime unchanged — still
   invalidates the cached plan.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import Row

from numalogic_prometheus_spark.plans.vectors import _bucket_col
from numalogic_prometheus_spark.sources.tables import (
    _SCAN_CACHE_ATTR,
    _mtime_key,
    load_table,
)


def test_bucket_col_tolerates_short_vectors(spark):
    df = spark.createDataFrame(
        [
            Row(id=1, v=[1.0, -1.0, 1.0, 1.0, -1.0, 1.0, -1.0, 1.0]),
            Row(id=2, v=[1.0, 1.0]),  # shorter than the 8-bit window
            Row(id=3, v=[]),
        ]
    )
    rows = {
        r["id"]: r["b"]
        for r in df.select("id", _bucket_col("v", bits=8).alias("b")).collect()
    }
    # full vector: sign bits at dims 1,3,4,6,8 -> 1+4+8+32+128
    assert rows[1] == 1 + 4 + 8 + 32 + 128
    # short vector: dims 3..8 missing -> contribute 0, no ANSI error
    assert rows[2] == 1 + 2
    assert rows[3] == 0


def test_scan_cache_lives_on_session_and_hits(spark, sf_dir):
    df1 = load_table(spark, sf_dir, "nation")
    df2 = load_table(spark, sf_dir, "nation")
    assert df2 is df1  # plan cache hit on the immutable fixture
    assert isinstance(getattr(spark, _SCAN_CACHE_ATTR), dict)


def test_scan_cache_invalidates_on_in_place_part_rewrite(spark, tmp_path):
    tbl = str(tmp_path / "t.parquet")
    spark.range(5).write.mode("overwrite").parquet(tbl)
    key1 = _mtime_key(tbl)
    # in-place rewrite of an existing part file: the DIRECTORY mtime
    # does not move (no entry added/removed), only the entry's own
    part = next(
        p for p in os.listdir(tbl) if p.endswith(".parquet")
    )
    dir_mtime_before = os.stat(tbl).st_mtime_ns
    time.sleep(0.01)
    with open(os.path.join(tbl, part), "ab") as fh:
        os.utime(fh.fileno())
    os.utime(tbl, ns=(dir_mtime_before, dir_mtime_before))
    key2 = _mtime_key(tbl)
    assert os.stat(tbl).st_mtime_ns == dir_mtime_before
    assert key2 != key1, "entry-mtime change must invalidate the key"


def test_checkpoint_blocks_bounded_across_passes(spark, sf_dir):
    """r17 finding: the SQL status store's retained executions pin
    localCheckpoint RDD blocks via their physical plans — at the
    1000-execution default a long-lived session leaks 2 pinned RDDs
    per checkpoint-bearing run. get_session bounds retention to 50;
    this pins the bounded behavior: repeated runs of the
    checkpoint-bearing shingle entry must not grow cached-RDD count
    monotonically (the leaked variant grew +2 per pass, immortal)."""
    import gc

    from numalogic_prometheus_spark import plans

    assert (
        spark.conf.get("spark.sql.ui.retainedExecutions") == "50"
    ), "session factory must bound execution retention"
    q = plans.all_queries()["dedup_shingle_minhash_pairs"]

    def run():
        spark.catalog.clearCache()
        q(spark, sf_dir).write.mode("overwrite").format("noop").save()

    counts = []
    for _ in range(4):
        run()
        gc.collect()
        counts.append(
            len(spark.sparkContext._jsc.sc().getRDDStorageInfo())
        )
    # leaked variant: counts strictly +2 per pass. Bounded: the last
    # two passes stay within the retention window's small constant.
    assert counts[-1] - counts[0] < 2 * (len(counts) - 1), counts
    assert counts[-1] <= counts[0] + 4, counts
