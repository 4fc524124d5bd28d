"""Storage-layout control for scale: bucketed tables (co-located joins
with NO shuffle) and partition-pruned layouts (scans that never open
out-of-scope files).

At 100 TB the two cheapest joins are the ones that never happen: a
bucketed fact table joins a co-bucketed fact table with zero Exchange
(both sides are already hash-distributed on the join key at write time),
and a date/tenant-partitioned layout turns a time-range scan into a
directory listing. Both are write-time decisions — this module is the
write side; tests/test_storage_layout.py pins the read-side plans
(no Exchange under the bucketed join, PartitionFilters + pruned file
count on the partitioned scan).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    n_buckets: int = 8,
    sort_cols: Sequence[str] | None = None,
) -> None:
    """Persist ``df`` as a bucketed (and optionally per-bucket sorted)
    managed table. Joins and aggregations keyed on ``bucket_cols``
    between tables sharing ``n_buckets`` then require no Exchange; with
    ``sort_cols`` matching the join key, SortMergeJoin also skips its
    sorts. Size ``n_buckets`` so one bucket of the LARGEST co-bucketed
    table fits an executor core's working set (at 100 TB: thousands,
    a power of two so downstream re-bucketing can merge pairwise)."""
    writer = df.write.mode("overwrite").bucketBy(int(n_buckets), *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def write_partitioned(
    df: DataFrame, path: str, partition_cols: Sequence[str]
) -> None:
    """Persist ``df`` hive-partitioned by ``partition_cols`` (low-
    cardinality leading keys: date, tenant, metric family). Readers
    filtering on those columns scan only matching directories —
    partition pruning happens at file-listing time, before any IO.
    Keep cardinality per level ≤ O(10⁴): each value is a directory."""
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)


def write_orc(
    df: DataFrame, path: str, partition_cols: Sequence[str] | None = None
) -> None:
    """Persist ``df`` as ORC — the second columnar interchange format a
    complete engine must speak (warehouse estates are frequently
    Hive/ORC). Spark's native vectorized ORC reader gives the same
    scan properties as parquet: column pruning, predicate pushdown into
    stripe/row-group indexes, and partition pruning when
    ``partition_cols`` is set — pinned by tests/test_storage_layout.py."""
    writer = df.write.mode("overwrite").format("orc")
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.save(path)


def read_orc(spark, path: str) -> DataFrame:
    """ORC scan twin of the parquet loader — same declarative contract
    (Catalyst owns pruning/pushdown), normalized through the engine's
    event-time boundary so downstream operators never see the storage
    encoding."""
    from numalogic_prometheus_spark.sources.tables import (
        normalize_event_time,
    )

    return normalize_event_time(spark.read.orc(path))
