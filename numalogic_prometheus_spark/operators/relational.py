"""Relational operators Spark lacks as single primitives (SURVEY.md §2C).

Both are built from shuffle-aware compositions, not O(n²) driver loops:

- ``asof_join`` — union + window ``last(ignorenulls)`` trick: ONE shuffle
  on the key (vs a range-join's quadratic blowup). This is the classic
  scalable as-of strategy: tag both sides, union, sort within key, carry
  the last right-side value forward.
- ``band_join`` — value∈(lo,hi] banding against a small bounds relation
  via broadcast theta join (histogram bucket assignment, reference
  discipline A6 / metrics.py:173-177).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: Sequence[str] = (),
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right.ts <= left.ts`` within the same key group.

    Plan shape: union → single hash exchange on `on` → one sort per
    partition → window last(ignorenulls). No range join, no skew blowup:
    cost is O(n log n) per key group and exactly one shuffle, which is
    what survives a 100× scale-up (a naive theta join is O(L×R) per key).

    Ties (right.ts == left.ts) take the right row, matching DuckDB
    ASOF JOIN's `>=` semantics (the oracle used to check this operator).
    """
    value_cols = list(value_cols) or [
        c for c in right.columns if c not in set(on) and c != right_ts
    ]
    lkeys = list(on)

    l_tagged = left.select(
        *lkeys,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in value_cols],
        F.struct(*[c for c in left.columns]).alias("__l"),
    )
    r_tagged = right.select(
        *lkeys,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.col(c).alias(f"__r_{c}") for c in value_cols],
        F.lit(None).cast(l_tagged.schema["__l"].dataType).alias("__l"),
    )
    unioned = l_tagged.unionByName(r_tagged)

    # Right rows sort before left rows at equal ts (__side 0 < 1), so a
    # same-ts right row is visible to the left row — ASOF `>=` semantics.
    w = (
        Window.partitionBy(*lkeys)
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "__side",
        "__l",
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__r_{c}")
            for c in value_cols
        ],
    )
    out = carried.filter(F.col("__side") == 1).select(
        F.col("__l.*"),
        *[F.col(f"__r_{c}").alias(c) for c in value_cols],
    )
    return out


def band_join(
    df: DataFrame,
    bands: DataFrame,
    value: str,
    lo: str = "lo",
    hi: str = "hi",
) -> DataFrame:
    """Assign each row to the band with ``lo < value <= hi``.

    The bands relation is small by construction (histogram bounds, SLA
    tiers), so broadcast it: the theta join then costs one pass over the
    fact side with zero shuffle — the only plan that survives at 100 TB.
    """
    return df.join(
        F.broadcast(bands),
        (F.col(value) > F.col(lo)) & (F.col(value) <= F.col(hi)),
        "inner",
    )
