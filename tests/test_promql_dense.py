"""Frame-equality pins for the dense-regime order-statistic twins
(plans/promql_dense.py): the blocked NumPy kernel must produce the
BIT-IDENTICAL frame to its JVM sibling — not merely oracle-hash-equal —
including anchor-block boundaries (the kernel is exercised with a tiny
block size so every group crosses blocks)."""

from __future__ import annotations

import numpy as np

from numalogic_prometheus_spark.plans import promql_dense
from numalogic_prometheus_spark.plans.promql3 import (
    promql_mad_over_time,
    promql_quantile_over_time_sliding,
)
from numalogic_prometheus_spark.plans.promql_dense import (
    promql_mad_sliding_dense,
    promql_quantile_sliding_dense,
)


def _frames_equal(a, b):
    sa = {tuple(r) for r in a.collect()}
    sb = {tuple(r) for r in b.collect()}
    assert len(sa) == len(sb) and sa == sb


def test_quantile_dense_bit_identical_to_jvm(spark, sf_dir):
    _frames_equal(
        promql_quantile_sliding_dense(spark, sf_dir),
        promql_quantile_over_time_sliding(spark, sf_dir),
    )


def test_mad_dense_bit_identical_to_jvm(spark, sf_dir):
    _frames_equal(
        promql_mad_sliding_dense(spark, sf_dir),
        promql_mad_over_time(spark, sf_dir),
    )


def test_anchor_blocking_is_value_invariant(spark, sf_dir, monkeypatch):
    """A 7-anchor block forces every group through many blocks; results
    must not change (the block loop only bounds memory)."""
    monkeypatch.setattr(promql_dense, "_ANCHOR_BLOCK", 7)
    _frames_equal(
        promql_quantile_sliding_dense(spark, sf_dir),
        promql_quantile_over_time_sliding(spark, sf_dir),
    )


def test_window_matrix_ragged_windows():
    """Unit pin of the kernel's index arithmetic: left-open lookback,
    same-µs peers included, +inf padding never read below n."""
    us = np.array([0, 10, 20, 20, 30], dtype=np.int64)
    c = np.array([5, 1, 9, 3, 7], dtype=np.int64)
    look = promql_dense._LOOK_US
    t = np.array([20, 30], dtype=np.int64)
    M, n = promql_dense._window_matrix(us, c, t)
    # window (20-1h, 20]: all of us<=20 (incl. both same-us rows)
    assert n.tolist() == [4, 5]
    assert M[0, :4].tolist() == [1.0, 3.0, 5.0, 9.0]
    assert M[0, 4] == np.inf
    assert M[1, :5].tolist() == [1.0, 3.0, 5.0, 7.0, 9.0]
    # expiry: anchor beyond the lookback drops old samples
    t2 = np.array([look + 15], dtype=np.int64)
    M2, n2 = promql_dense._window_matrix(us, c, t2)
    # (15, look+15]: samples at us 20,20,30 survive, 0 and 10 expire
    assert n2.tolist() == [3]
    assert M2[0, :3].tolist() == [3.0, 7.0, 9.0]
