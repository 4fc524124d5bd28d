"""Text-file sources (JSONL / CSV) with explicit schemas and rejected-row
side-channels — the ingest path for raw document dumps before they are
compacted to parquet.

Contract mirrors `sources/tables.py`: schema is ALWAYS explicit (schema
inference is a full extra pass over 100 TB and pins types to whatever
the first files contained), malformed records land in a `_rejected`
relation instead of killing the job, and session invariants are pinned
before any read.

Mechanics: files are read as text lines and parsed with the
`from_json`/`from_csv` *expressions* rather than the format readers —
same Jackson/Univocity parsers, but corrupt-record handling becomes a
plain column computation, sidestepping the raw-scan restriction that
forbids querying only the corrupt-record column
(QUERY_ONLY_CORRUPT_RECORD_COLUMN), and keeping one scan feeding both
the valid and rejected relations.

Scale notes: JSON/CSV scans get column pruning from the explicit schema
but no predicate pushdown or row-group skipping — these formats are the
*landing* representation; `compact_to_parquet` is the first pipeline
stage so every downstream query scans parquet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from numalogic_prometheus_spark.session import pin_session_invariants

_CORRUPT = "_corrupt_record"

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("n_chars", T.LongType(), True),
    ]
)


def _split(lines: DataFrame, parsed: F.Column, schema: T.StructType):
    """(valid, rejected) from a parsed-struct column: a row is rejected
    if parsing returned null, the corrupt column is set, or no declared
    column matched (all-null projection — the wrong-shape signature)."""
    data_cols = [f.name for f in schema.fields]
    all_null = F.lit(True)
    for c in data_cols:
        all_null = all_null & parsed.getField(c).isNull()
    bad = (
        parsed.isNull()
        | parsed.getField(_CORRUPT).isNotNull()
        | all_null
    )
    with_flag = lines.select(
        F.col("value"), parsed.alias("p"), bad.alias("is_bad")
    )
    valid = with_flag.filter(~F.col("is_bad")).select(
        *[F.col("p").getField(c).alias(c) for c in data_cols]
    )
    rejected = with_flag.filter(F.col("is_bad")).select(
        F.col("value").alias("raw_record")
    )
    return valid, rejected


def _with_corrupt(schema: T.StructType) -> T.StructType:
    return T.StructType(
        [*schema.fields, T.StructField(_CORRUPT, T.StringType(), True)]
    )


def read_jsonl(
    spark: SparkSession, path: str, schema: T.StructType
) -> tuple[DataFrame, DataFrame]:
    """Read newline-delimited JSON with an explicit schema. Returns
    (valid, rejected); rejected rows carry the raw line for
    quarantine/replay."""
    pin_session_invariants(spark)
    lines = spark.read.text(path)
    parsed = F.from_json(
        F.col("value"),
        _with_corrupt(schema),
        {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": _CORRUPT},
    )
    return _split(lines, parsed, schema)


def read_csv(
    spark: SparkSession, path: str, schema: T.StructType, header: bool = True
) -> tuple[DataFrame, DataFrame]:
    """Read CSV with an explicit schema; same (valid, rejected) contract
    as `read_jsonl`. Type-mismatched fields reject the whole row (it
    lands in the corrupt column) rather than silently nulling."""
    pin_session_invariants(spark)
    lines = spark.read.text(path)
    if header:
        # Drop the header as the FIRST header-looking line per file, not
        # every line equal to the header string: a legitimate data row
        # that happens to equal "col_a,col_b,..." must survive. The
        # header is line 1 of its file, so among the rows matching the
        # header string it holds the file's minimum monotonic id (split
        # planning orders ids by file offset). The matching set is tiny
        # (≤1 row/file in the normal case) → broadcast anti-join, no
        # per-file window shuffle. A header with different column order
        # or quoting doesn't match and lands in `rejected` — safe.
        header_line = ",".join(f.name for f in schema.fields)
        tagged = lines.select(
            "value",
            F.input_file_name().alias("_file"),
            F.monotonically_increasing_id().alias("_mid"),
        )
        header_rows = (
            tagged.filter(F.col("value") == header_line)
            .groupBy("_file")
            .agg(F.min("_mid").alias("_mid"))
        )
        lines = tagged.join(
            F.broadcast(header_rows), ["_file", "_mid"], "left_anti"
        ).select("value")
    parsed = F.from_csv(
        F.col("value"),
        _ddl(schema),
        {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": _CORRUPT},
    )
    return _split(lines, parsed, schema)


def _ddl(schema: T.StructType) -> str:
    """DDL string for from_csv, with the corrupt-record column appended
    (from_csv takes a schema string, not a StructType)."""
    cols = [f"{f.name} {f.dataType.simpleString()}" for f in schema.fields]
    cols.append(f"{_CORRUPT} string")
    return ", ".join(cols)


def compact_to_parquet(
    df: DataFrame, out_dir: str, partition_cols: list[str] | None = None
) -> None:
    """Landing → columnar compaction: one pass, optionally hive-
    partitioned on low-cardinality keys so downstream scans get
    partition pruning on top of row-group statistics."""
    writer = df.write.mode("overwrite")
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(out_dir)
