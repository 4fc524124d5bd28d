"""Local mimic of the driver's DuckDB differential check.

Runs a registered Spark query and its oracle SQL on the same parquet dir,
then compares row count, sorted column names, and an order-insensitive
canonicalized value multiset. Floats are canonicalized at 1e-6 so the
check is strictly tighter than any reasonable driver hash tolerance while
still absorbing cross-engine fp formatting noise.
"""

from __future__ import annotations

import math
import os
from datetime import date, datetime

import duckdb
import pandas as pd

from numalogic_prometheus_spark.sources.tables import TABLES


def _canon_cell(v):
    if v is None:
        return "null"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if math.isinf(v):
            return "inf" if v > 0 else "-inf"
        # `+ 0.0` collapses -0.0 to 0.0: two engines rounding to signed
        # zeros on opposite sides would otherwise print "-0.000000" vs
        # "0.000000" — a false mismatch inside the 1e-6 tolerance.
        return f"{round(v, 6) + 0.0:.6f}"
    if isinstance(v, (pd.Timestamp, datetime)):
        ts = pd.Timestamp(v)
        if ts.tzinfo is not None:
            ts = ts.tz_convert("UTC").tz_localize(None)
        return ts.isoformat(timespec="milliseconds")
    if isinstance(v, date):
        return v.isoformat()
    if hasattr(v, "tolist"):  # numpy scalar or array
        v = v.tolist()
        if not isinstance(v, list):
            return _canon_cell(v)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_cell(x) for x in v) + "]"
    if isinstance(v, bool):
        return str(v).lower()
    if pd.isna(v):
        return "null"
    return str(v)


def _canon_frame(df: pd.DataFrame) -> list[tuple]:
    # Column-wise iteration: iterrows() upcasts mixed rows to a common
    # dtype (int64 + float64 → float64), destroying type fidelity.
    cols = sorted(df.columns)
    series = [df[c] for c in cols]
    rows = [
        tuple(_canon_cell(s.iloc[i]) for s in series) for i in range(len(df))
    ]
    return sorted(rows)


def run_oracle(sf_dir: str, sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    created = 0
    for t in TABLES:
        # crafted-fixture dirs (golden tests) carry only the tables the
        # query reads; a view over a missing file would fail at CREATE.
        # Spark-written fixtures are DIRECTORIES of part files (vs the
        # driver's single-file testdata) — glob them for DuckDB.
        path = os.path.join(sf_dir, f"{t}.parquet")
        if not os.path.exists(path):
            continue
        if os.path.isdir(path):
            path = os.path.join(path, "*.parquet")
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
        )
        created += 1
    if created == 0:
        # a typo'd fixture dir would otherwise surface only as a
        # confusing DuckDB "table does not exist" (ADVICE r7)
        raise FileNotFoundError(
            f"run_oracle: no *.parquet tables found under {sf_dir!r} "
            f"(expected some of {sorted(TABLES)})"
        )
    return con.sql(sql).df()


def compare(spark_df, oracle_df: pd.DataFrame, name: str = "") -> None:
    sp = spark_df.toPandas()
    assert sorted(sp.columns) == sorted(oracle_df.columns), (
        f"{name}: column mismatch spark={sorted(sp.columns)} "
        f"oracle={sorted(oracle_df.columns)}"
    )
    assert len(sp) == len(oracle_df), (
        f"{name}: row count spark={len(sp)} oracle={len(oracle_df)}"
    )
    a, b = _canon_frame(sp), _canon_frame(oracle_df)
    mismatches = [(x, y) for x, y in zip(a, b) if x != y]
    assert not mismatches, f"{name}: {len(mismatches)} value mismatches; first: {mismatches[:3]}"


def compare_crafted(spark, fixture_dir, name: str) -> None:
    """Differential-check a REGISTERED query against its oracle on a
    crafted golden fixture dir (which may hold only the tables the query
    reads, written by Spark as parquet directories) — closes the blind
    spots the shipped NULL-free testdata can't exercise."""
    from numalogic_prometheus_spark import plans

    compare(
        plans.all_queries()[name](spark, str(fixture_dir)),
        run_oracle(str(fixture_dir), plans.all_oracles()[name]),
        f"{name}@crafted",
    )
