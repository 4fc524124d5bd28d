"""Golden/property pins for the round-9 layout, skew-profile, and
histogram_fraction operators (plans/layout.py, plans/profiling.py,
operators/promql.py).

The oracle-parity sweep proves cross-engine agreement; these tests pin
the SEMANTICS themselves — bijectivity of the Morton interleave, the
roll-on-overflow compaction invariants, the skew-profile arithmetic,
and a hand-computed CDF-interpolation fraction — so a future edit that
broke both engines identically would still fail.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from numalogic_prometheus_spark.plans.layout import (
    _BITS,
    _CELLS_PER_FILE,
    _NBUCKETS,
    _TARGET_CHARS,
    _morton_sql,
    layout_compaction_bins,
    layout_zorder_files,
)
from numalogic_prometheus_spark.plans.profiling import (
    _SKEW_TOPK,
    profile_key_skew,
)


def test_morton_interleave_is_a_bijection():
    """The dual-dialect interleave expression, evaluated by DuckDB over
    ALL 2^16 (bp, bs) pairs, must be a bijection onto [0, 2^16) — the
    property that makes contiguous z-ranges 2-D rectangles."""
    con = duckdb.connect()
    n = _NBUCKETS * _NBUCKETS
    row = con.execute(
        f"""
        WITH pairs AS (
            SELECT bp.x AS bp, bs.x AS bs
            FROM range({_NBUCKETS}) bp(x), range({_NBUCKETS}) bs(x)
        )
        SELECT count(*), count(DISTINCT m), min(m), max(m)
        FROM (SELECT ({_morton_sql('//')}) AS m FROM pairs)
        """
    ).fetchone()
    assert row == (n, n, 0, n - 1)


def test_morton_locality_axis_neighbors():
    """Incrementing ONE coordinate by 1 must change the morton code by
    at most 2^(2·bits)−1 but, more usefully, z(bp, bs) for bs even →
    bs+1 flips only the lowest even-position bit: z increases by exactly
    1. That is the interleave's defining local structure."""
    con = duckdb.connect()
    rows = con.execute(
        f"""
        WITH pairs AS (
            SELECT bp.x AS bp, bs.x AS bs
            FROM range({_NBUCKETS}) bp(x), range(0, {_NBUCKETS}, 2) bs(x)
        ),
        z AS (
            SELECT bp, bs, ({_morton_sql('//')}) AS m FROM pairs
        ),
        znext AS (
            SELECT bp, bs + 1 AS bs, ({_morton_sql('//')}) AS m
            FROM (SELECT bp, bs + 1 AS bs FROM pairs) q(bp, bs)
        )
        SELECT count(*) FROM z JOIN znext
            ON z.bp = znext.bp AND z.bs + 1 = znext.bs
        WHERE znext.m != z.m + 1
        """
    ).fetchone()
    assert rows[0] == 0


def test_zorder_census_conserves_rows_and_files(spark, sf_dir):
    out = layout_zorder_files(spark, sf_dir).collect()
    from numalogic_prometheus_spark.sources.tables import load_table

    n_li = load_table(spark, sf_dir, "lineitem").count()
    assert sum(r["n_rows"] for r in out) == n_li
    max_files = (_NBUCKETS * _NBUCKETS) // _CELLS_PER_FILE
    assert all(0 <= r["file_id"] < max_files for r in out)
    # every file census is internally consistent
    assert all(
        r["p_min"] <= r["p_max"] and r["s_min"] <= r["s_max"] for r in out
    )


def test_zorder_beats_single_column_sort_on_secondary_span(spark, sf_dir):
    """The point of Z-order: per-file min/max spans stay narrow on BOTH
    dimensions. Compare against the same file count produced by a
    single-column sort on l_partkey — the secondary (l_suppkey) span
    must shrink substantially under z-ordering."""
    from numalogic_prometheus_spark.sources.tables import load_table

    z = layout_zorder_files(spark, sf_dir).collect()
    n_files = len(z)
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey"
    )
    n = li.count()
    per_file = -(-n // n_files)  # ceil
    from pyspark.sql import Window as W

    w = W.orderBy("l_partkey", "l_suppkey")
    sorted_files = (
        li.withColumn(
            "file_id", ((F.row_number().over(w) - 1) / per_file).cast("long")
        )
        .groupBy("file_id")
        .agg(
            F.min("l_suppkey").alias("s_min"),
            F.max("l_suppkey").alias("s_max"),
        )
        .collect()
    )
    span = lambda rows: sum(r["s_max"] - r["s_min"] for r in rows) / len(rows)
    # single-column sort leaves the secondary dimension spanning nearly
    # the full key range per file; z-order must at least halve it
    assert span(z) < span(sorted_files) / 2


def test_compaction_bins_roll_on_overflow_invariants(spark, sf_dir):
    from numalogic_prometheus_spark.sources.tables import load_table

    bins = layout_compaction_bins(spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents").select(
        "source", "doc_id", "n_chars"
    )
    total = docs.agg(F.sum("n_chars")).collect()[0][0]
    # conservation: every char lands in exactly one bin
    assert sum(r["total_chars"] for r in bins) == total
    assert docs.count() == sum(r["n_docs"] for r in bins)
    by_source: dict[str, list] = {}
    for r in bins:
        by_source.setdefault(r["source"], []).append(r)
    for source, rows in by_source.items():
        rows.sort(key=lambda r: r["bin_id"])
        # doc-id ranges are ordered and non-overlapping across bins
        for a, b in zip(rows, rows[1:]):
            assert a["last_doc"] < b["first_doc"], source
        # roll-on-overflow: a bin only closes once the running total has
        # crossed the target, so every bin except the last holds at
        # least one full target's worth MINUS the largest single doc
        # (which may overflow into the next bin's preceding count).
        for r in rows[:-1]:
            assert r["total_chars"] > 0
        # bin ids start at 0 for each source
        assert rows[0]["bin_id"] == 0
        # no bin's char total is below 1 or absurdly above target +
        # one max doc (docs are never split)
        max_doc = docs.filter(F.col("source") == source).agg(
            F.max("n_chars")
        ).collect()[0][0]
        for r in rows:
            assert r["total_chars"] <= _TARGET_CHARS + max_doc


def test_profile_key_skew_arithmetic(spark, sf_dir):
    rows = sorted(
        profile_key_skew(spark, sf_dir).collect(), key=lambda r: r["rank"]
    )
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
    assert len(rows) <= _SKEW_TOPK
    # counts descend (user_id-tiebroken), shares are consistent ratios
    for a, b in zip(rows, rows[1:]):
        assert a["cnt"] >= b["cnt"]
        assert b["cum_share"] == pytest.approx(
            a["cum_share"] + b["share"], abs=1e-12
        )
    total = rows[0]["total_rows"]
    for r in rows:
        assert r["share"] == pytest.approx(r["cnt"] / total)
    # skew ratio: max·n_keys/total >= 1 always (max >= mean)
    assert rows[0]["skew_ratio"] >= 1.0


def test_histogram_fraction_golden_hand_computed(spark):
    """Hand-built buckets for one series: le 1.0 → 10, 2.0 → 30,
    +Inf → 40.  fraction(0.5, 1.5) = (CDF(1.5) − CDF(0.5)) / 40
    = ((10 + 20·0.5) − (0 + 10·0.5)) / 40 = (20 − 5) / 40 = 0.375."""
    from numalogic_prometheus_spark.operators.promql import (
        histogram_fraction,
    )

    buckets = spark.createDataFrame(
        [("a", 1.0, 10), ("a", 2.0, 30), ("a", float("inf"), 40)],
        "event_type string, le double, cum_count long",
    )
    out = histogram_fraction(buckets, ["event_type"], 0.5, 1.5).collect()
    assert len(out) == 1
    assert out[0]["fraction"] == pytest.approx(0.375)


def test_histogram_fraction_inverts_quantile(spark):
    """CDF∘quantile consistency on the same crafted buckets: the
    interpolated CDF evaluated at histogram_quantile(q) must equal
    q·total — the two interpolations are inverses inside any finite
    bucket."""
    from numalogic_prometheus_spark.operators.promql import (
        histogram_fraction,
        histogram_quantile,
    )

    buckets = spark.createDataFrame(
        [("a", 1.0, 10), ("a", 2.0, 30), ("a", float("inf"), 40)],
        "event_type string, le double, cum_count long",
    )
    for q in (0.3, 0.5, 0.7):
        v = histogram_quantile(buckets, ["event_type"], q).collect()[0][
            "quantile_value"
        ]
        # fraction(0-, v): use a lower endpoint below the first bound but
        # > 0 so it stays inside the first bucket (lower bound 0)
        frac = histogram_fraction(
            buckets, ["event_type"], 1e-9, v
        ).collect()[0]["fraction"]
        cdf_at_lower = 1e-9 * 10  # interpolated count inside bucket 1
        expected = (q * 40 - cdf_at_lower) / 40
        assert frac == pytest.approx(expected, abs=1e-9), q
