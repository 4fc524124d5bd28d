"""Golden pin for the sampling plans (plans/sampling.py): the
cluster-keyed split's no-straddle guarantee on a crafted corpus."""

from __future__ import annotations


def test_cluster_split_never_straddles_near_dups(spark, tmp_path):
    """sample_split_by_cluster's leakage guarantee on a crafted corpus:
    identical documents (Jaccard 1 near-dup pair) must land in the SAME
    split, keyed by the cluster's min doc_id; unrelated docs keep their
    own-id bucket — i.e. exactly the assignment the per-doc hash split
    would give them."""
    from numalogic_prometheus_spark.plans.sampling import (
        _bucket_of,
        sample_split_by_cluster,
    )
    from pyspark.sql import functions as F

    dup_text = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (1, dup_text, "en", "srcA", len(dup_text)),
        (2, dup_text, "en", "srcA", len(dup_text)),  # exact near-dup of 1
        (3, "one completely different document body here", "en", "srcB", 43),
        (4, "another unrelated text with its own words", "en", "srcB", 41),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    got = {
        r["doc_id"]: (r["split_key"], r["split"])
        for r in sample_split_by_cluster(spark, str(tmp_path)).collect()
    }
    assert set(got) == {1, 2, 3, 4}
    # the dup pair shares the cluster key (min id) and therefore the split
    assert got[1] == got[2]
    assert got[1][0] == 1
    # singletons key by their own id
    assert got[3][0] == 3 and got[4][0] == 4
    # and the assignment is the documented pure hash of the key
    bucket_spark, _ = _bucket_of("split_key")
    expected = {
        r["split_key"]: r["s"]
        for r in spark.range(1, 5)
        .selectExpr("id AS split_key")
        .select(
            "split_key",
            F.when(F.expr(bucket_spark) < 80, "train")
            .when(F.expr(bucket_spark) < 90, "val")
            .otherwise("test")
            .alias("s"),
        )
        .collect()
    }
    for doc_id, (key, split) in got.items():
        assert split == expected[key], (doc_id, key, split)


    # and the recursive-CTE oracle replays the same components on the
    # crafted corpus (the fixture sweep only sees the shipped testdata)
    from tests.oracle_harness import compare_crafted

    compare_crafted(spark, tmp_path, "sample_split_by_cluster")


def test_components_snapshot_path_equals_inline(spark, sf_dir, tmp_path):
    """VERDICT r7 #7: the materialized-components split variant. The
    snapshot write must commit with a _SUCCESS marker, the
    snapshot-reading split must produce byte-identical assignments to
    the self-contained oracle-checked entry (same fixpoint relation,
    same hash arithmetic), and an uncommitted snapshot dir must be
    refused, not silently read."""
    import os

    import pytest

    from numalogic_prometheus_spark.plans.sampling import (
        read_components_snapshot,
        sample_split_by_cluster,
        sample_split_from_snapshot,
        write_components_snapshot,
    )

    snap = str(tmp_path / "components_snap")
    write_components_snapshot(spark, sf_dir, snap)
    assert os.path.exists(os.path.join(snap, "_SUCCESS"))

    inline = {
        r["doc_id"]: (r["split_key"], r["split"])
        for r in sample_split_by_cluster(spark, sf_dir).collect()
    }
    from_snap = {
        r["doc_id"]: (r["split_key"], r["split"])
        for r in sample_split_from_snapshot(spark, sf_dir, snap).collect()
    }
    assert from_snap == inline and inline

    # a crashed write (no _SUCCESS) must be refused
    os.remove(os.path.join(snap, "_SUCCESS"))
    with pytest.raises(FileNotFoundError):
        read_components_snapshot(spark, snap)
