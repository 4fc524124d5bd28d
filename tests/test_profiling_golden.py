"""Golden pin for profile_column_stats (plans/profiling.py): the
testdata tables carry no NULLs, so parity alone never exercises the
null-counting and null-safe min/max/distinct paths — this crafted
fixture does."""

from __future__ import annotations

from datetime import datetime

from tests.oracle_harness import compare_crafted


def test_profile_counts_nulls_and_distincts(spark, tmp_path):
    from numalogic_prometheus_spark.plans.profiling import (
        profile_column_stats,
    )

    rows = [
        # (orderkey, custkey, status, totalprice, orderdate, priority)
        (1, 10, "F", 5.0, datetime(2024, 1, 2), "1-URGENT"),
        (2, None, "O", None, None, "1-URGENT"),
        (3, 10, None, 7.5, datetime(2024, 1, 1), None),
        # same calendar DATE as row 3 but a different timestamp: the
        # date canonicalization must collapse them to one distinct value
        (4, None, "F", 5.0, datetime(2024, 1, 1, 12, 30), "5-LOW"),
    ]
    df = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, "
        "o_orderpriority string",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))

    got = {
        r["column_name"]: r.asDict()
        for r in profile_column_stats(spark, str(tmp_path)).collect()
    }
    assert set(got) == {
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        "o_orderdate",
        "o_orderpriority",
    }
    assert all(v["n_rows"] == 4 for v in got.values())

    ck = got["o_custkey"]
    assert (ck["n_null"], ck["n_distinct"]) == (2, 1)  # NULLs excluded
    assert (ck["min_num"], ck["max_num"]) == (10.0, 10.0)

    tp = got["o_totalprice"]
    assert (tp["n_null"], tp["n_distinct"]) == (1, 2)
    assert (tp["min_num"], tp["max_num"]) == (5.0, 7.5)

    st = got["o_orderstatus"]
    assert (st["n_null"], st["n_distinct"]) == (1, 2)
    assert (st["min_str"], st["max_str"]) == ("F", "O")
    assert st["min_num"] is None and st["max_num"] is None

    dt = got["o_orderdate"]
    assert (dt["n_null"], dt["n_distinct"]) == (1, 2)  # sub-day collapsed
    assert (dt["min_str"], dt["max_str"]) == ("2024-01-01", "2024-01-02")

    ok = got["o_orderkey"]
    assert (ok["n_null"], ok["n_distinct"]) == (0, 4)

    # the DuckDB twin must agree on the NULL-bearing fixture too — the
    # shipped testdata has no NULLs, so driver parity alone never
    # exercises the oracle's null paths
    compare_crafted(spark, tmp_path, "profile_column_stats")


def test_profile_drift_verdicts_hand_computed(spark, tmp_path):
    """profile_drift_halves flags exactly the engineered drifts: a
    distinct-cardinality collapse (custkey), a null-rate spike
    (orderstatus: 0→3 nulls of 6), and — the tolerance edge — does NOT
    flag a single new null on a zero-null baseline (orderpriority),
    which a plain rate-doubling test would always fire on."""
    from datetime import datetime

    from numalogic_prometheus_spark.plans.profiling import (
        profile_drift_halves,
    )

    rows = []
    for i in range(1, 7):  # early era: 1997
        rows.append(
            (i, i, "F", 100.0 + i, datetime(1997, 1, i), "1-URGENT")
        )
    for i in range(7, 13):  # late era: 1999
        rows.append(
            (
                i,
                1,  # custkey collapses to a single value
                None if i in (7, 8, 9) else "F",  # status nulls spike
                100.0 + i,
                datetime(1999, 1, i - 6),
                None if i == 7 else "1-URGENT",  # one tolerated null
            )
        )
    df = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, "
        "o_orderpriority string",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))

    got = {
        r["column_name"]: r.asDict()
        for r in profile_drift_halves(spark, str(tmp_path)).collect()
    }
    assert all(
        (v["n_early"], v["n_late"]) == (6, 6) for v in got.values()
    )
    flags = {c: v["drift_flag"] for c, v in got.items()}
    assert flags == {
        "o_orderkey": False,
        "o_custkey": True,  # 6 distinct -> 1
        "o_orderstatus": True,  # null rate 0/6 -> 3/6
        "o_totalprice": False,
        "o_orderpriority": False,  # 0 -> 1 null: inside tolerance
    }
    assert got["o_custkey"]["nd_early"] == 6
    assert got["o_custkey"]["nd_late"] == 1
    assert got["o_orderstatus"]["null_late"] == 3
    compare_crafted(spark, tmp_path, "profile_drift_halves")


def test_profile_drift_empty_early_era_reports_null_ratio(spark, tmp_path):
    """A table entirely after the cutoff has nd_early=0 for every
    column: the ratio must come back NULL (try_divide — matching the
    DuckDB oracle's x/0), never raise under ANSI mode, and the
    appeared-from-nothing cardinality still flags as drift."""
    from datetime import datetime

    from numalogic_prometheus_spark.plans.profiling import (
        profile_drift_halves,
    )

    rows = [
        (i, i, "F", 100.0 + i, datetime(2000, 1, i), "1-URGENT")
        for i in range(1, 4)
    ]
    df = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, "
        "o_orderpriority string",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    got = {
        r["column_name"]: r.asDict()
        for r in profile_drift_halves(spark, str(tmp_path)).collect()
    }
    for v in got.values():
        assert (v["n_early"], v["n_late"]) == (0, 3)
        assert v["nd_early"] == 0
        assert v["distinct_ratio"] is None
        assert v["drift_flag"] is True  # 0 -> nonzero cardinality
    # and the NULLIF'd oracle agrees on the zero-denominator fixture
    compare_crafted(spark, tmp_path, "profile_drift_halves")
