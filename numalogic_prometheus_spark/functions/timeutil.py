"""Event-time arithmetic helpers.

Single definition point for epoch-microsecond extraction so the next
engine/storage type drift (LongType nanos → TIMESTAMP → TIMESTAMP_NTZ → …)
is a one-line fix instead of a sweep over every window-frame ORDER BY.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def epoch_us(col: Column | str) -> Column:
    """Microseconds since the epoch for an event-time column.

    Accepts TIMESTAMP or TIMESTAMP_NTZ (the cast is a no-op on the former
    and a pure reinterpretation on the latter under the engine's pinned
    UTC session timezone — see session.RUNTIME_INVARIANTS).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(c.cast("timestamp"))


def epoch_us_sql(col_name: str) -> str:
    """SQL-fragment twin of :func:`epoch_us` for ``F.expr`` sites that need
    integer ``div`` (Column has no exact integer-division operator)."""
    return f"unix_micros(cast({col_name} as timestamp))"
