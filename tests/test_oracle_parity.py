"""Differential oracle tests: every registered oracle-checkable query must
hash-match DuckDB at the test scale factor — the local version of the
driver's t2 correctness gate."""

from __future__ import annotations

import pytest

from numalogic_prometheus_spark import plans
from tests.oracle_harness import compare, run_oracle

QUERIES = plans.all_queries()
ORACLES = plans.all_oracles()


def test_no_plan_import_errors():
    assert not plans.IMPORT_ERRORS, f"plan modules failed to import: {plans.IMPORT_ERRORS}"


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(spark, sf_dir, name):
    spark_df = QUERIES[name](spark, sf_dir)
    oracle_df = run_oracle(sf_dir, ORACLES[name])
    compare(spark_df, oracle_df, name)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    assert df.count() >= 0
    assert df.schema is not None
