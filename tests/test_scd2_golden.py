"""Golden pins for plans/scd.py on crafted fixtures.

The shipped testdata's event_type is near-random per event, so almost
every row is a change point — it never exercises the semantics that
define SCD2: re-assertions of the SAME state must extend the open
interval (NOT version), equal-timestamp changes must tiebreak on
event_id, a single-event user yields one open current version, and
interval edges must chain exactly (valid_to == next valid_from).
Each case is pinned against a hand computation AND the DuckDB twin
on the same crafted table (compare_crafted)."""

from __future__ import annotations

from datetime import datetime, timedelta

from tests.oracle_harness import compare_crafted

_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def _us(dt) -> int:
    return int(dt.timestamp() * 1_000_000)


def test_scd2_reassert_tiebreak_current(spark, tmp_path):
    from numalogic_prometheus_spark.plans.scd import scd2_state_history

    t = datetime(2024, 3, 1)
    m = lambda k: t + timedelta(minutes=k)  # noqa: E731
    rows = [
        # user 1: signup -> signup (re-assert, NO new version) ->
        # click -> click -> error
        (1, m(0), 1, "signup", 1.0, "{}"),
        (2, m(1), 1, "signup", 1.0, "{}"),
        (3, m(2), 1, "click", 1.0, "{}"),
        (4, m(3), 1, "click", 1.0, "{}"),
        (5, m(4), 1, "error", 1.0, "{}"),
        # user 2: two DIFFERENT states at the SAME ts — event_id order
        # decides: view (id 6) then purchase (id 7) -> 2 versions both
        # valid_from the same instant, view's interval is empty
        (6, m(0), 2, "view", 1.0, "{}"),
        (7, m(0), 2, "purchase", 1.0, "{}"),
        # user 3: single event -> one open current version
        (8, m(5), 3, "click", 1.0, "{}"),
    ]
    spark.createDataFrame(rows, _SCHEMA).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    got = {
        (r["user_id"], r["version"]): r
        for r in scd2_state_history(spark, str(tmp_path)).collect()
    }

    # user 1: exactly 3 versions (the re-asserts absorbed)
    u1 = [got[(1, v)] for v in (1, 2, 3)]
    assert [r["state"] for r in u1] == ["signup", "click", "error"]
    assert [r["valid_from_us"] for r in u1] == [_us(m(0)), _us(m(2)), _us(m(4))]
    # intervals chain exactly and only the last is open/current
    assert u1[0]["valid_to_us"] == u1[1]["valid_from_us"]
    assert u1[1]["valid_to_us"] == u1[2]["valid_from_us"]
    assert u1[2]["valid_to_us"] is None
    assert [r["is_current"] for r in u1] == [0, 0, 1]

    # user 2: event_id tiebreak at equal ts; view's interval is empty
    u2 = [got[(2, v)] for v in (1, 2)]
    assert [r["state"] for r in u2] == ["view", "purchase"]
    assert u2[0]["valid_from_us"] == u2[0]["valid_to_us"] == _us(m(0))
    assert u2[1]["is_current"] == 1

    # user 3: one open version
    assert got[(3, 1)]["state"] == "click"
    assert got[(3, 1)]["valid_to_us"] is None
    assert got[(3, 1)]["is_current"] == 1

    assert len(got) == 6
    compare_crafted(spark, tmp_path, "scd2_state_history")
