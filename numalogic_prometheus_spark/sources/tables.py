"""Batch parquet sources over the driver's synthetic tables (TESTDATA.md).

Scale posture: these are plain ``spark.read.parquet`` scans so Catalyst's
vectorized reader, predicate pushdown, and column pruning all apply. At the
100 TB design point the same loader works over a partitioned table root
(e.g. ``.../events/dt=2024-01-01/*.parquet``) — partition pruning is then
free because every downstream operator filters/aggregates through Catalyst.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from numalogic_prometheus_spark.session import pin_session_invariants

# The ten driver tables (TESTDATA.md / FIXTURES.md).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one synthetic table. Column pruning/pushdown handled by Catalyst."""
    if name not in TABLES:
        raise ValueError(f"unknown table {name!r}; expected one of {TABLES}")
    # The driver's verify harness may hand us a vanilla session; every
    # query path goes through here, so re-pin the runtime invariants
    # (UTC, LAST_WIN map dedup, nanos-as-long parquet reads).
    pin_session_invariants(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    # Truncate nanos → µs with integer division (epoch-nanos exceeds
    # double's 53-bit mantissa, so float division would corrupt it) and
    # restore the timestamp type — matches DuckDB's ns→µs read.
    if name == "events" and isinstance(df.schema["ts"].dataType, T.LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return normalize_event_time(df)


def normalize_event_time(df: DataFrame) -> DataFrame:
    """Guarantee every event-time column is ``TimestampType``.

    Parquet encodes tz-naive timestamps as TIMESTAMP_NTZ under Spark 4's
    ``inferTimestampNTZ`` default; NTZ columns reject ``unix_micros`` and
    ``withWatermark`` wholesale. Under the engine's pinned UTC session tz
    the NTZ→TIMESTAMP cast is a pure reinterpretation (same micros value),
    so this is oracle-safe — DuckDB's reads are tz-naive already. Applied
    to every loaded table AND to synthetic stream frames so the engine
    absorbs encoding drift at its load boundary, not in 10 call sites.
    """
    ntz = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, T.TimestampNTZType)
    ]
    for c in ntz:
        df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def load_table_spread(
    spark: SparkSession, sf_dir: str, name: str, key: str
) -> DataFrame:
    """Scan + hash-repartition on ``key`` to the session's default
    parallelism, for plans that do expensive per-row compute (md5-based
    minhash/simhash, shingle construction) right after the scan.

    A single parquet file with one row group arrives as ONE input split,
    so without this every downstream map stage runs on one core. At the
    100 TB design point the source has thousands of splits and this
    becomes a cheap balancing shuffle of the raw rows (it also co-locates
    by key for later joins). The explicit partition count stops AQE from
    coalescing the exchange back down to one partition on small inputs.
    """
    df = load_table(spark, sf_dir, name)
    return df.repartition(spark.sparkContext.defaultParallelism, F.col(key))


def spread_if_compact(spark: SparkSession, df: DataFrame) -> DataFrame:
    """Round-robin repartition to the session's default parallelism,
    ONLY when the plan's current partitioning is narrower than the
    cluster — the conditional sibling of :func:`load_table_spread` for
    plans whose expensive phase (wide partial aggregates, per-row array
    assembly) runs wherever the scan put the rows. A compact input (one
    unsplittable parquet row group locally; any file count < cores)
    would serialize that phase; at scale the scan arrives with ≥ cores
    splits and this is a no-op — no extra shuffle."""
    if df.rdd.getNumPartitions() < spark.sparkContext.defaultParallelism:
        return df.repartition(spark.sparkContext.defaultParallelism)
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all tables as temp views (mirrors the DuckDB oracle setup)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
