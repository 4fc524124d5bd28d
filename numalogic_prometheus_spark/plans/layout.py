"""Storage-layout maintenance operators, round 9: multi-dimensional
Z-order clustering and small-file compaction planning — the two layout
passes a 100 TB lakehouse runs between ingest and query, so multi-
predicate scans skip files and the file census stays executor-friendly.
The reference leaves storage to Prometheus's own TSDB (reference
CHANGELOG.md:189 — its stages ship samples, they never own files); an
engine that owns the parquet layer needs the layout primitives itself
(the Delta/Iceberg OPTIMIZE ... ZORDER BY / bin-packing compaction
shape, re-expressed Spark-first).

Z-order (Morton) clustering: interleaving the bits of two range-bucketed
key columns gives a 1-D sort key whose contiguous ranges are 2-D
rectangles, so per-file min/max stay NARROW on BOTH dimensions — a
single-column sort leaves the secondary dimension spanning every file
(zero skipping). The registry entry assigns rows to files by FIXED-WIDTH
z-ranges (morton div cells-per-file) and emits the per-file census
(row count + both min/max spans) — the footer statistics a reader's
predicate pushdown would consult. Everything is integer arithmetic
((k−min)·2^b div (max−min+1) bucketing, shift-and-mask interleave), so
the DuckDB twin hash-matches exactly.

Scale notes (100 TB design points):

* The morton key is computed MAP-SIDE (pure projection); the only wide
  operation is the per-file-id aggregation — one exchange keyed by
  file_id, partial combine first. The bounds row is a broadcast (a
  6-value aggregate), same shape as the seasonal-baseline stats join.
* Fixed-width z-ranges keep the entry deterministic for the oracle but
  can yield uneven files under key skew; the production writer swaps
  `div` for `repartitionByRange(n, morton)` — Spark samples the z
  distribution and balances rows per output file with ONE extra pass,
  no global sort. Same plan shape otherwise; documented, not
  registry-checked, because RangePartitioner's sampled cut points are
  nondeterministic by design.
* Compaction planning: the streaming-writer rule (roll to a new file
  when the running byte total crosses the target) is a per-partition
  running sum — window over (source ORDER BY doc_id), integer-exact in
  both engines. At 100 TB the window key widens to (source, day) so no
  single partition's census exceeds one task; the plan shape is
  unchanged. A doc that straddles a boundary belongs to the file where
  it STARTS (bin = floor(preceding-bytes / target)), the roll-on-
  overflow semantics every log-structured writer uses — files overflow
  the target by at most one document, they are never split.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from numalogic_prometheus_spark.plans import register
from numalogic_prometheus_spark.sources.tables import load_table

_BITS = 8  # per-dimension bucket bits: 256 buckets/dim, 16-bit morton
_NBUCKETS = 1 << _BITS
_CELLS_PER_FILE = 1024  # 65536 morton cells / 1024 = 64 target files


def _morton_sql(intdiv: str) -> str:
    """Bit-interleave expression over the two {0..255} bucket columns
    `bp` (odd bits) and `bs` (even bits). ONE generator emits both
    dialects — only the integer-division spelling differs (Spark `div`,
    DuckDB `//`) — so the engine and oracle forms cannot drift. Bit i is
    extracted as (x intdiv 2^i) % 2 and placed with an exact
    power-of-two multiply (both dialect-neutral); disjoint bits sum with
    `+` (no shift/`|` precedence traps in either dialect)."""
    terms = []
    for i in range(_BITS):
        bit_p = f"((bp {intdiv} {1 << i}) % 2)"
        bit_s = f"((bs {intdiv} {1 << i}) % 2)"
        terms.append(f"({bit_p} * {1 << (2 * i + 1)})")
        terms.append(f"({bit_s} * {1 << (2 * i)})")
    return " + ".join(terms)


@register(
    "layout_zorder_files",
    oracle=f"""
    WITH b AS (
        SELECT min(l_partkey) AS pmin, max(l_partkey) AS pmax,
               min(l_suppkey) AS smin, max(l_suppkey) AS smax
        FROM lineitem
    ),
    z AS (
        SELECT l_partkey, l_suppkey,
               ((l_partkey - pmin) * {_NBUCKETS}) // (pmax - pmin + 1) AS bp,
               ((l_suppkey - smin) * {_NBUCKETS}) // (smax - smin + 1) AS bs
        FROM lineitem, b
    )
    SELECT ({_morton_sql('//')}) // {_CELLS_PER_FILE} AS file_id,
           count(*)::BIGINT AS n_rows,
           min(l_partkey)::BIGINT AS p_min, max(l_partkey)::BIGINT AS p_max,
           min(l_suppkey)::BIGINT AS s_min, max(l_suppkey)::BIGINT AS s_max
    FROM z
    GROUP BY 1
    """,
)
def layout_zorder_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPTIMIZE ... ZORDER BY (l_partkey, l_suppkey) planning pass:
    range-bucket both keys to 8 bits, interleave to a 16-bit Morton
    code, assign fixed-width z-ranges to target files, and emit the
    per-file census (row count + min/max of BOTH dims — the parquet
    footer stats multi-predicate skipping reads). Module docstring
    carries the scale notes (map-side morton, one file_id exchange,
    broadcast bounds; repartitionByRange for balanced production
    files)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey"
    )
    bounds = li.agg(
        F.min("l_partkey").alias("pmin"),
        F.max("l_partkey").alias("pmax"),
        F.min("l_suppkey").alias("smin"),
        F.max("l_suppkey").alias("smax"),
    )
    z = li.crossJoin(F.broadcast(bounds)).selectExpr(
        "l_partkey",
        "l_suppkey",
        f"((l_partkey - pmin) * {_NBUCKETS}) div (pmax - pmin + 1) AS bp",
        f"((l_suppkey - smin) * {_NBUCKETS}) div (smax - smin + 1) AS bs",
    )
    return (
        z.selectExpr(
            "l_partkey",
            "l_suppkey",
            f"({_morton_sql('div')}) div {_CELLS_PER_FILE} AS file_id",
        )
        .groupBy("file_id")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("l_partkey").alias("p_min"),
            F.max("l_partkey").alias("p_max"),
            F.min("l_suppkey").alias("s_min"),
            F.max("l_suppkey").alias("s_max"),
        )
    )


_TARGET_CHARS = 2048  # compaction target per output file, in chars


@register(
    "layout_compaction_bins",
    oracle=f"""
    WITH sized AS (
        SELECT source, doc_id, n_chars,
               (sum(n_chars) OVER (PARTITION BY source ORDER BY doc_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW))::BIGINT - n_chars
                   AS preceding_chars
        FROM documents
    )
    SELECT source, preceding_chars // {_TARGET_CHARS} AS bin_id,
           count(*)::BIGINT AS n_docs,
           sum(n_chars)::BIGINT AS total_chars,
           min(doc_id)::BIGINT AS first_doc,
           max(doc_id)::BIGINT AS last_doc
    FROM sized
    GROUP BY source, bin_id
    """,
)
def layout_compaction_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction plan over `documents`: within each source
    (stable doc_id order), the streaming-writer roll rule assigns each
    doc to the output file where its first byte lands (bin =
    preceding-bytes div target), then the per-(source, bin) census —
    doc count, byte total, id range — is the plan a compactor executes.
    One running-sum window per source partition + one grouped agg;
    integer-exact in both engines. At 100 TB the window key is
    (source, day) so census state stays one-task-sized (module
    docstring)."""
    docs = load_table(spark, sf_dir, "documents").select(
        "source", "doc_id", "n_chars"
    )
    w = (
        W.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    sized = docs.withColumn(
        "preceding_chars",
        F.sum("n_chars").over(w) - F.col("n_chars"),
    )
    return (
        sized.selectExpr(
            "source",
            "doc_id",
            "n_chars",
            f"preceding_chars div {_TARGET_CHARS} AS bin_id",
        )
        .groupBy("source", "bin_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
    )
