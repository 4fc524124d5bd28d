"""Sequential-pattern analytics, round 9: funnel conversion and cohort
retention — the two classic event-analytics operators over an
append-only event log. The reference emits raw interaction events to
Prometheus and leaves journey analysis to the backend (reference
CHANGELOG.md:10); this engine owns them as relational operators.

Semantics:

* Funnel (`funnel_signup_view_purchase`): the ORDERED pattern
  signup ≺ view ≺ purchase per user — a view counts only if some
  signup precedes it in (ts, event_id) order, a purchase only if some
  qualifying view precedes it. Stage timestamps are the EARLIEST
  qualifying occurrence. Output is the global funnel: stage reach
  counts and the exact-integer mean micros from first signup to first
  qualifying purchase among converters.
* Cohort retention (`cohort_retention_weekly`): users are cohorted by
  their first signup DAY (exact integer epoch-day — deliberately not
  date_trunc('week'), whose week-start convention is an engine
  setting); activity in week k = any event in day range
  [cohort_day + 7k, cohort_day + 7(k+1)) for k = 0..8. retention =
  n_active / n_cohort, one integer division.

Exactness: both entries are integer-only until a single final IEEE
division (mean micros, retention ratio) — no rounding surface.

Scale notes (100 TB design): the funnel is THREE running-min window
columns chained on the SAME (user_id)/(ts, event_id) order — like
scd2_state_history, Catalyst plans one exchange + one sort, no
self-joins (the SQL-92 funnel is a 3-way theta self-join; this is the
O(rows) sequential-scan form) — followed by one per-user partial
aggregation and one global combine. Cohort retention is two partial
aggregations off the same scan (first-signup per user; distinct
(user, day) activity), an equi join co-partitioned on user_id, and a
bounded (cohort_day × 9 weeks) output relation; the cohort-size join
rides the tiny cohort dimension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from numalogic_prometheus_spark.functions.timeutil import epoch_us
from numalogic_prometheus_spark.plans import register
from numalogic_prometheus_spark.sources.tables import load_table

_US_PER_DAY = 86_400_000_000


@register(
    "funnel_signup_view_purchase",
    oracle="""
    WITH seq AS (
        SELECT user_id, ts, event_id, event_type,
               min(CASE WHEN event_type = 'signup' THEN epoch_us(ts) END)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS UNBOUNDED PRECEDING) AS s_run
        FROM events
    ),
    seq2 AS (
        SELECT *,
               min(CASE WHEN event_type = 'view' AND s_run IS NOT NULL
                        THEN epoch_us(ts) END)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS UNBOUNDED PRECEDING) AS v_run
        FROM seq
    ),
    per_user AS (
        SELECT user_id,
               min(CASE WHEN event_type = 'signup'
                        THEN epoch_us(ts) END) AS t_signup,
               min(CASE WHEN event_type = 'view' AND s_run IS NOT NULL
                        THEN epoch_us(ts) END) AS t_view,
               min(CASE WHEN event_type = 'purchase' AND v_run IS NOT NULL
                        THEN epoch_us(ts) END) AS t_purchase
        FROM seq2
        GROUP BY user_id
    )
    SELECT count(*)::BIGINT AS n_users,
           count(t_signup)::BIGINT AS n_signup,
           count(t_view)::BIGINT AS n_view_after_signup,
           count(t_purchase)::BIGINT AS n_purchase_after_view,
           sum(CASE WHEN t_purchase IS NOT NULL
                    THEN t_purchase - t_signup END)::BIGINT
               AS sum_convert_us,
           sum(CASE WHEN t_purchase IS NOT NULL
                    THEN t_purchase - t_signup END)::BIGINT
               / count(t_purchase) AS mean_convert_us
    FROM per_user
    """,
)
def funnel_signup_view_purchase(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Ordered funnel signup ≺ view ≺ purchase (module docstring): two
    running-min window columns qualify each stage against the previous
    one in (ts, event_id) order, then one per-user aggregation and one
    global combine. One exchange + one sort for BOTH windows (same
    partitioning/order — the O(rows) form of the SQL-92 3-way
    self-join funnel). Integer micros throughout; the mean is one
    final IEEE division of exact integers."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    run = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    us = epoch_us(F.col("ts"))
    is_ = lambda t: F.col("event_type") == t  # noqa: E731
    seq = ev.withColumn(
        "s_run", F.min(F.when(is_("signup"), us)).over(run)
    )
    seq2 = seq.withColumn(
        "v_run",
        F.min(
            F.when(is_("view") & F.col("s_run").isNotNull(), us)
        ).over(run),
    )
    per_user = seq2.groupBy("user_id").agg(
        F.min(F.when(is_("signup"), us)).alias("t_signup"),
        F.min(
            F.when(is_("view") & F.col("s_run").isNotNull(), us)
        ).alias("t_view"),
        F.min(
            F.when(is_("purchase") & F.col("v_run").isNotNull(), us)
        ).alias("t_purchase"),
    )
    conv = F.when(
        F.col("t_purchase").isNotNull(),
        F.col("t_purchase") - F.col("t_signup"),
    )
    return per_user.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.count("t_signup").cast("long").alias("n_signup"),
        F.count("t_view").cast("long").alias("n_view_after_signup"),
        F.count("t_purchase").cast("long").alias("n_purchase_after_view"),
        F.sum(conv).cast("long").alias("sum_convert_us"),
        (F.sum(conv).cast("long") / F.count("t_purchase"))
        .alias("mean_convert_us"),
    )


@register(
    "cohort_retention_weekly",
    oracle=f"""
    WITH cohort AS (
        SELECT user_id,
               min(epoch_us(ts)) // {_US_PER_DAY} AS cohort_day
        FROM events WHERE event_type = 'signup'
        GROUP BY user_id
    ),
    sizes AS (
        SELECT cohort_day, count(*)::BIGINT AS n_cohort
        FROM cohort GROUP BY cohort_day
    ),
    activity AS (
        SELECT DISTINCT user_id,
               epoch_us(ts) // {_US_PER_DAY} AS act_day
        FROM events
    ),
    hits AS (
        SELECT c.cohort_day,
               (a.act_day - c.cohort_day) // 7 AS week_idx,
               a.user_id
        FROM cohort c JOIN activity a USING (user_id)
        WHERE a.act_day >= c.cohort_day
          AND (a.act_day - c.cohort_day) // 7 <= 8
    ),
    agg AS (
        SELECT cohort_day, week_idx,
               count(DISTINCT user_id)::BIGINT AS n_active
        FROM hits GROUP BY cohort_day, week_idx
    )
    SELECT g.cohort_day, g.week_idx, g.n_active, s.n_cohort,
           g.n_active / s.n_cohort AS retention
    FROM agg g JOIN sizes s USING (cohort_day)
    """,
)
def cohort_retention_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention (module docstring): cohort = first
    signup DAY as an exact integer epoch-day (no date_trunc week-start
    convention), activity week k = any event in
    [cohort_day + 7k, cohort_day + 7(k+1)), k ≤ 8; retention is ONE
    integer division. Plan: two partial aggregations off the events
    scan, a user_id equi join (co-partitioned), and the cohort-size
    join over the tiny cohort dimension."""
    ev = load_table(spark, sf_dir, "events")
    day = F.floor(epoch_us(F.col("ts")) / F.lit(_US_PER_DAY)).cast("long")
    cohort = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.floor(F.min(epoch_us(F.col("ts"))) / _US_PER_DAY)
             .cast("long").alias("cohort_day"))
    )
    sizes = cohort.groupBy("cohort_day").agg(
        F.count(F.lit(1)).cast("long").alias("n_cohort")
    )
    activity = ev.select(
        "user_id", day.alias("act_day")
    ).distinct()
    widx = F.floor(
        (F.col("act_day") - F.col("cohort_day")) / F.lit(7)
    ).cast("long")
    hits = (
        cohort.join(activity, "user_id")
        .filter(F.col("act_day") >= F.col("cohort_day"))
        .withColumn("week_idx", widx)
        .filter(F.col("week_idx") <= 8)
    )
    agg = hits.groupBy("cohort_day", "week_idx").agg(
        F.countDistinct("user_id").cast("long").alias("n_active")
    )
    return agg.join(sizes, "cohort_day").select(
        "cohort_day",
        "week_idx",
        "n_active",
        "n_cohort",
        (F.col("n_active") / F.col("n_cohort")).alias("retention"),
    )
