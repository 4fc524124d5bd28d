"""Table profiling — the data-QA pass a training-data pipeline runs
before anything else touches a new 100 TB drop: per-column row/null/
distinct counts and min/max, in ONE scan of the fact table.

The reference's pipeline trusts its Prometheus sources to be
well-formed (reference CHANGELOG.md:189 — its ingest stages validate
shape, not content); an engine that owns the storage layer needs the
profiling primitive itself (the Deequ/Great-Expectations analyzer
shape, re-expressed Spark-first).

Scale notes: the naive one-Aggregate form (count + count(DISTINCT c1..ck)
+ min/max in a single agg) planner-rewrites into Expand with a
SORT-based aggregate full of `first()` wrappers — measured ~2× slower
than this shape and sort-fallback all the way down. Instead the table
is melted ONCE (a `stack` Generate: k rows per input row, each value
canonicalized to a (vnum DOUBLE, vstr STRING) pair), then:

  pass 1  groupBy(column, value)  → cnt        — the classic distributed
          distinct: map-side partial combine, one exchange keyed by
          (column, value), skew = per-column value spread;
  pass 2  groupBy(column)         → every statistic at once: n_rows =
          sum(cnt), n_null = the null-value group's cnt, n_distinct =
          count of non-null groups, min/max over the group keys.

Two pure HashAggregate levels, one scan, no Expand. Exact distinct is
inherently a value-keyed exchange at any scale; to profile a 100 TB drop
cheaper, swap pass 1's value grouping for the repo's KMV/HLL sketch
route (agg_approx_distinct, agg_hll_mergeable_daily) and keep pass 2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from numalogic_prometheus_spark.plans import register
from numalogic_prometheus_spark.sources.tables import (
    load_table,
    spread_if_compact,
)

# (column, kind) — kind picks the canonical value slot: numerics go to a
# DOUBLE (no formatting layer to diverge cross-engine; int64 keys are
# < 2^53 so the cast is injective and distinct counts survive), strings
# stay VARCHAR, timestamps collapse to ISO dates (identical cast
# semantics in Spark and DuckDB, and ISO strings order chronologically).
_PROFILE_COLS = (
    ("o_orderkey", "num"),
    ("o_custkey", "num"),
    ("o_totalprice", "num"),
    ("o_orderstatus", "str"),
    ("o_orderpriority", "str"),
    ("o_orderdate", "date"),
)


def _oracle() -> str:
    per_col = []
    for c, kind in _PROFILE_COLS:
        if kind == "num":
            mn, mx = f"min({c})::DOUBLE", f"max({c})::DOUBLE"
            ms, xs = "NULL::VARCHAR", "NULL::VARCHAR"
        elif kind == "str":
            mn, mx = "NULL::DOUBLE", "NULL::DOUBLE"
            ms, xs = f"min({c})", f"max({c})"
        else:  # date
            mn, mx = "NULL::DOUBLE", "NULL::DOUBLE"
            ms, xs = f"min({c})::DATE::VARCHAR", f"max({c})::DATE::VARCHAR"
        # date columns count distinct CALENDAR DATES (the documented
        # canonicalization), not distinct raw timestamps — the melt's
        # vstr slot is the ISO date, so the oracle must collapse too
        nd = f"{c}::DATE" if kind == "date" else c
        per_col.append(
            f"SELECT '{c}' AS column_name, count(*)::BIGINT AS n_rows,\n"
            f"       (count(*) - count({c}))::BIGINT AS n_null,\n"
            f"       count(DISTINCT {nd})::BIGINT AS n_distinct,\n"
            f"       {mn} AS min_num, {mx} AS max_num,\n"
            f"       {ms} AS min_str, {xs} AS max_str\n"
            f"FROM orders"
        )
    return "\nUNION ALL\n".join(per_col)


def _melt_expr(cols) -> str:
    """The shared wide→long `stack` expression: one (column_name, vnum,
    vstr) row per profiled column per input row, values canonicalized
    into typed slots (see _PROFILE_COLS comment). Both profiling queries
    melt through this one builder so the canonicalization cannot
    diverge between them."""
    slots = []
    for c, kind in cols:
        if kind == "num":
            vnum, vstr = f"double({c})", "CAST(NULL AS STRING)"
        elif kind == "str":
            vnum, vstr = "CAST(NULL AS DOUBLE)", c
        else:  # date
            vnum, vstr = (
                "CAST(NULL AS DOUBLE)",
                f"CAST(CAST({c} AS DATE) AS STRING)",
            )
        slots.append(f"'{c}', {vnum}, {vstr}")
    return (
        f"stack({len(cols)}, " + ", ".join(slots) + ") AS "
        "(column_name, vnum, vstr)"
    )


@register("profile_column_stats", oracle=_oracle())
def profile_column_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-scan column profile of `orders`: per column, row count, null
    count, exact distinct count, and type-appropriate min/max via the
    melt → two-level hash aggregation in the module docstring. The
    DuckDB oracle is per-column UNION ALL scans — semantically identical
    but k scans; the Spark plan is the one-pass version."""
    orders = spread_if_compact(spark, load_table(spark, sf_dir, "orders"))
    melted = orders.selectExpr(_melt_expr(_PROFILE_COLS))
    # NULL detection needs no per-column kind: a numeric column's vstr
    # slot is constant-NULL (and vice versa), so "both slots NULL" marks
    # exactly the source-NULL rows.
    value_groups = melted.groupBy("column_name", "vnum", "vstr").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    is_null = F.col("vnum").isNull() & F.col("vstr").isNull()
    return value_groups.groupBy("column_name").agg(
        F.sum("cnt").alias("n_rows"),
        F.coalesce(
            F.sum(F.when(is_null, F.col("cnt"))), F.lit(0)
        ).alias("n_null"),
        F.count(F.when(~is_null, F.lit(1))).alias("n_distinct"),
        F.min("vnum").alias("min_num"),
        F.max("vnum").alias("max_num"),
        F.min("vstr").alias("min_str"),
        F.max("vstr").alias("max_str"),
    )


# ---------------------------------------------------------------------------
# Temporal drift: the profile of the NEW half of a table against the OLD
# half — the anomaly check a recurring ingest runs on every drop (did a
# column's null rate spike? did an enum collapse? did a numeric range
# walk?). One scan: the same melt carries an era flag, so both eras'
# statistics come out of one value-grouped aggregation tree.
# ---------------------------------------------------------------------------

_DRIFT_CUTOFF = "1998-06-01"  # orders span 1995..2001; cutoff ~mid-table

_DRIFT_COLS = tuple(
    (c, k) for c, k in _PROFILE_COLS if c != "o_orderdate"
)  # the split column itself would trivially "drift"


def _drift_oracle() -> str:
    per_col = []
    for c, _kind in _DRIFT_COLS:
        per_col.append(
            f"""
    SELECT '{c}' AS column_name,
           count(*) FILTER (WHERE o_orderdate <  DATE '{_DRIFT_CUTOFF}')::BIGINT AS n_early,
           count(*) FILTER (WHERE o_orderdate >= DATE '{_DRIFT_CUTOFF}')::BIGINT AS n_late,
           (count(*) FILTER (WHERE o_orderdate <  DATE '{_DRIFT_CUTOFF}')
            - count({c}) FILTER (WHERE o_orderdate <  DATE '{_DRIFT_CUTOFF}'))::BIGINT AS null_early,
           (count(*) FILTER (WHERE o_orderdate >= DATE '{_DRIFT_CUTOFF}')
            - count({c}) FILTER (WHERE o_orderdate >= DATE '{_DRIFT_CUTOFF}'))::BIGINT AS null_late,
           count(DISTINCT {c}) FILTER (WHERE o_orderdate <  DATE '{_DRIFT_CUTOFF}')::BIGINT AS nd_early,
           count(DISTINCT {c}) FILTER (WHERE o_orderdate >= DATE '{_DRIFT_CUTOFF}')::BIGINT AS nd_late
    FROM orders"""
        )
    return (
        "WITH per_col AS (" + "\nUNION ALL".join(per_col) + ")\n"
        "SELECT column_name, n_early, n_late, null_early, null_late,\n"
        "       nd_early, nd_late,\n"
        "       nd_late / NULLIF(nd_early, 0) AS distinct_ratio,\n"
        "       (nd_late * 2 < nd_early OR nd_early * 2 < nd_late\n"
        "        OR null_late * n_early > 2 * null_early * n_late + n_late)\n"
        "           AS drift_flag\n"
        "FROM per_col"
    )


@register("profile_drift_halves", oracle=_drift_oracle())
def profile_drift_halves(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column drift check between the early and late halves of
    `orders` (split at a fixed date): row/null/exact-distinct counts per
    era, the distinct-count ratio, and an integer-exact drift verdict
    (distinct cardinality halved/doubled, or the null RATE more than
    doubled — cross-multiplied as null_late·n_early > 2·null_early·n_late
    + n_late, the +n_late making a zero-null baseline tolerate one new
    null per row rather than flagging on the first). Same one-scan melt
    as profile_column_stats with an era flag in the value-group key; the
    DuckDB twin is per-column FILTER-clause scans. The only float is the
    final ratio — one IEEE division of two BIGINTs (try_divide: a column
    with no early-era non-null values reports NULL, matching DuckDB's
    x/0, instead of raising under ANSI mode), emitted unrounded."""
    orders = spread_if_compact(spark, load_table(spark, sf_dir, "orders"))
    melted = orders.selectExpr(
        f"o_orderdate >= DATE '{_DRIFT_CUTOFF}' AS late",
        _melt_expr(_DRIFT_COLS),
    )
    value_groups = melted.groupBy(
        "column_name", "late", "vnum", "vstr"
    ).agg(F.count(F.lit(1)).alias("cnt"))

    is_null = F.col("vnum").isNull() & F.col("vstr").isNull()
    late = F.col("late")

    def era(flag: bool, col: F.Column) -> F.Column:
        return F.when(late == F.lit(flag), col)

    stats = value_groups.groupBy("column_name").agg(
        F.coalesce(F.sum(era(False, F.col("cnt"))), F.lit(0)).alias(
            "n_early"
        ),
        F.coalesce(F.sum(era(True, F.col("cnt"))), F.lit(0)).alias(
            "n_late"
        ),
        F.coalesce(
            F.sum(era(False, F.when(is_null, F.col("cnt")))), F.lit(0)
        ).alias("null_early"),
        F.coalesce(
            F.sum(era(True, F.when(is_null, F.col("cnt")))), F.lit(0)
        ).alias("null_late"),
        F.count(era(False, F.when(~is_null, F.lit(1)))).alias("nd_early"),
        F.count(era(True, F.when(~is_null, F.lit(1)))).alias("nd_late"),
    )
    return stats.select(
        "column_name",
        "n_early",
        "n_late",
        "null_early",
        "null_late",
        "nd_early",
        "nd_late",
        # unrounded exact-integer ratio: bit-identical cross-engine
        # (the round-8 sf0.1 sweep tie class)
        F.try_divide(F.col("nd_late"), F.col("nd_early")).alias(
            "distinct_ratio"
        ),
        (
            (F.col("nd_late") * 2 < F.col("nd_early"))
            | (F.col("nd_early") * 2 < F.col("nd_late"))
            | (
                F.col("null_late") * F.col("n_early")
                > F.col("null_early") * F.col("n_late") * 2
                + F.col("n_late")
            )
        ).alias("drift_flag"),
    )


# ---------------------------------------------------------------------------
# Key-skew / heavy-hitter profile: the pre-shuffle diagnostic that decides
# whether a join/agg key needs salting or an AQE skew-join split BEFORE the
# job runs. Round 9 (the layout/maintenance family's analysis twin).
# ---------------------------------------------------------------------------

_SKEW_TOPK = 10


@register(
    "profile_key_skew",
    oracle=f"""
    WITH counts AS (
        SELECT user_id, count(*)::BIGINT AS cnt
        FROM events GROUP BY user_id
    ),
    tot AS (
        SELECT sum(cnt)::BIGINT AS total_rows,
               count(*)::BIGINT AS n_keys,
               max(cnt)::BIGINT AS max_cnt
        FROM counts
    ),
    top AS (
        SELECT user_id, cnt,
               row_number() OVER (ORDER BY cnt DESC, user_id) AS rank
        FROM counts
        ORDER BY cnt DESC, user_id LIMIT {_SKEW_TOPK}
    )
    SELECT top.user_id, top.rank, top.cnt,
           top.cnt / tot.total_rows AS share,
           sum(top.cnt) OVER (ORDER BY top.rank) / tot.total_rows
               AS cum_share,
           tot.n_keys, tot.total_rows,
           (tot.max_cnt * tot.n_keys) / tot.total_rows AS skew_ratio
    FROM top, tot
    """,
)
def profile_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitter profile of the `events.user_id` shuffle key: the
    top-{k} keys by row count with their individual and cumulative
    traffic share, plus the relation-level skew ratio max_cnt·n_keys /
    total (1.0 = perfectly uniform; ≫1 = the hottest key's partition
    runs that many times longer than the average — the number that
    decides salting / AQE skew-split before a 100 TB shuffle runs).

    Shape: one per-key partial count (map-side combine, one exchange on
    the key — the same exchange the diagnosed join would make), then
    top-k via orderBy+limit so it compiles to TakeOrderedAndProject
    (per-partition heaps + driver merge of k·partitions rows), NEVER a
    global sort or a rank window over the full key relation. The
    summary row (a 3-value aggregate) broadcasts; the rank/cum-share
    windows run over the k surviving rows only. All ratios are single
    IEEE divisions of exact BIGINTs, emitted unrounded (the round-8
    tie-class rule)."""
    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("cnt"))
    tot = counts.agg(
        F.sum("cnt").alias("total_rows"),
        F.count(F.lit(1)).alias("n_keys"),
        F.max("cnt").alias("max_cnt"),
    )
    top = counts.orderBy(F.col("cnt").desc(), "user_id").limit(_SKEW_TOPK)
    w_rank = W.orderBy(F.col("cnt").desc(), "user_id")
    ranked = top.withColumn(
        "rank", F.row_number().over(w_rank).cast("long")
    )
    w_cum = W.orderBy("rank").rowsBetween(W.unboundedPreceding, W.currentRow)
    return (
        ranked.crossJoin(F.broadcast(tot))
        .withColumn("share", F.try_divide(F.col("cnt"), F.col("total_rows")))
        .withColumn(
            "cum_share",
            F.try_divide(F.sum("cnt").over(w_cum), F.col("total_rows")),
        )
        .withColumn(
            "skew_ratio",
            F.try_divide(
                F.col("max_cnt") * F.col("n_keys"), F.col("total_rows")
            ),
        )
        .select(
            "user_id",
            "rank",
            "cnt",
            "share",
            "cum_share",
            "n_keys",
            "total_rows",
            "skew_ratio",
        )
    )
