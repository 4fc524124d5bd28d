"""PromQL set-operator and group_right invariants (round 5).

The reference delegates the binary-op family to the Prometheus Query
Service (reference CHANGELOG.md:10 #168); these tests pin the algebraic
laws the delegated evaluator guarantees, independent of the per-query
oracle parity rows:

- `and` + `unless` with the same operands partition the left vector.
- `or` is left-biased: a match-label collision keeps the LEFT sample.
- `group_right` is the exact operand-swapped mirror of `group_left`.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from numalogic_prometheus_spark.operators.promql import vector_binop, vector_setop


@pytest.fixture(scope="module")
def vectors(spark):
    left = spark.createDataFrame(
        [
            ("a", "h1", 10.0),
            ("a", "h2", 20.0),
            ("b", "h1", 30.0),
            ("b", "h3", 40.0),
        ],
        "event_type string, hour string, value double",
    )
    right = spark.createDataFrame(
        [("a", "h1", 1.0), ("c", "h2", 2.0)],
        "event_type string, hour string, value double",
    )
    return left, right


def test_and_unless_partition_left(vectors):
    left, right = vectors
    kept = vector_setop(left, right, "and", on=("hour",))
    dropped = vector_setop(left, right, "unless", on=("hour",))
    both = {tuple(r) for r in kept.collect()} | {tuple(r) for r in dropped.collect()}
    assert both == {tuple(r) for r in left.collect()}
    assert kept.count() + dropped.count() == left.count()


def test_and_keeps_left_values_and_schema(vectors):
    left, right = vectors
    out = vector_setop(left, right, "and", on=("hour",))
    assert out.columns == left.columns
    rows = {(r.event_type, r.hour): r.value for r in out.collect()}
    # h1 and h2 exist on the right; values must be the LEFT samples
    assert rows == {("a", "h1"): 10.0, ("a", "h2"): 20.0, ("b", "h1"): 30.0}


def test_or_is_left_biased(vectors):
    left, right = vectors
    out = vector_setop(left, right, "or", on=("hour",))
    rows = {(r.event_type, r.hour): r.value for r in out.collect()}
    # h1/h2 collide -> left wins (no ("c","h2") row); h3 only on left
    assert rows == {
        ("a", "h1"): 10.0,
        ("a", "h2"): 20.0,
        ("b", "h1"): 30.0,
        ("b", "h3"): 40.0,
    }


def test_or_requires_one_schema(spark, vectors):
    left, _ = vectors
    odd = spark.createDataFrame([("h1", 1.0)], "hour string, value double")
    with pytest.raises(ValueError, match="share one schema"):
        vector_setop(left, odd, "or", on=("hour",))


def test_group_right_mirrors_group_left(spark):
    one = spark.createDataFrame(
        [("h1", 100.0, "busy"), ("h2", 10.0, "quiet")],
        "hour string, value double, load_level string",
    )
    many = spark.createDataFrame(
        [("a", "h1", 4.0), ("b", "h1", 5.0), ("a", "h2", 2.0)],
        "event_type string, hour string, value double",
    )
    op = lambda l, r: F.round(l / r, 6)  # noqa: E731 — op argument order is the point
    gl = vector_binop(
        many, one, lambda l, r: op(r, l), on=("hour",), group_left=True,
        carry=("load_level",), out="ratio",
    )
    gr = vector_binop(
        one, many, op, on=("hour",), group_right=True,
        carry=("load_level",), out="ratio",
    )
    key = lambda r: (r.event_type, r.hour)  # noqa: E731
    gl_rows = {key(r): (r.load_level, r.ratio) for r in gl.collect()}
    gr_rows = {key(r): (r.load_level, r.ratio) for r in gr.collect()}
    assert gl_rows == gr_rows == {
        ("a", "h1"): ("busy", 25.0),
        ("b", "h1"): ("busy", 20.0),
        ("a", "h2"): ("quiet", 5.0),
    }
    assert sorted(gr.columns) == sorted(gl.columns)


def test_group_left_and_group_right_exclusive(vectors):
    left, right = vectors
    with pytest.raises(ValueError, match="exclusive"):
        vector_binop(
            left, right, lambda l, r: l + r,
            on=("hour",), group_left=True, group_right=True,
        )


# ---------------------------------------------------------------------------
# Property: group_right carry-label arity (VERDICT r5 #7). The delegation
# to the group_left path must hold for ANY number of carried one-side
# labels — the multi-carry shape was the one matching configuration not
# yet exercised. Reference semantics computed in plain Python.
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings as hyp_settings
from hypothesis import strategies as st

_CARRY_POOL = ("load_level", "zone", "owner")
_KEYS = ("h1", "h2", "h3")


@given(
    n_carry=st.integers(min_value=0, max_value=3),
    one_keys=st.lists(
        st.sampled_from(_KEYS), min_size=1, max_size=3, unique=True
    ),
    # an instant vector cannot hold two samples with the same label set,
    # so generate the many side keyed by its full label tuple
    many_map=st.dictionaries(
        st.tuples(
            st.sampled_from(("a", "b", "c")), st.sampled_from(_KEYS)
        ),
        st.integers(min_value=1, max_value=50),
        min_size=1,
        max_size=8,
    ),
)
@hyp_settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_group_right_carry_arity_property(spark, n_carry, one_keys, many_map):
    many_rows = [(e, k, v) for (e, k), v in many_map.items()]
    carry = _CARRY_POOL[:n_carry]
    # one-side: unique per match key, n_carry extra labels to carry
    one_data = [
        tuple([k, float((i + 2) * 10)] + [f"{c}_{k}" for c in carry])
        for i, k in enumerate(one_keys)
    ]
    one_schema = ", ".join(
        ["hour string", "value double"] + [f"{c} string" for c in carry]
    )
    one = spark.createDataFrame(one_data, one_schema)
    many = spark.createDataFrame(
        [(e, k, float(v)) for e, k, v in many_rows],
        "event_type string, hour string, value double",
    )

    out = vector_binop(
        one,
        many,
        lambda l, r: F.round(l / r, 6),
        on=("hour",),
        group_right=True,
        carry=carry,
        out="ratio",
    )

    one_by_key = {row[0]: row for row in one_data}
    expect = {
        (e, k): tuple(f"{c}_{k}" for c in carry)
        + (round(one_by_key[k][1] / v, 6),)
        for e, k, v in many_rows
        if k in one_by_key
    }
    got = {
        (r["event_type"], r["hour"]): tuple(r[c] for c in carry)
        + (r["ratio"],)
        for r in out.collect()
    }
    assert got == expect
    # output keeps the RIGHT (many-side) label set + carried labels + out
    assert sorted(out.columns) == sorted(
        ["event_type", "hour", *carry, "ratio"]
    )
