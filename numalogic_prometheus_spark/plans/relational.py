"""Projection / filter / join / set-op queries (SURVEY.md §2C).

Join-strategy posture for 100 TB: dimension tables (region, nation,
supplier, part at TPC-H ratios) are broadcast — zero shuffle on the fact
side; fact↔fact joins shuffle on the join key once and let AQE pick
SMJ/SHJ and split skewed partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from numalogic_prometheus_spark.operators.relational import asof_join, band_join
from numalogic_prometheus_spark.plans import register
from numalogic_prometheus_spark.sources.tables import load_table


@register(
    "project_computed",
    oracle="""
    SELECT p_partkey,
           lower(p_brand) AS brand_lc,
           p_retailprice * 1.1 AS price_up,
           p_size + 1 AS size_next
    FROM part
    """,
)
def project_computed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection + computed columns (A1): pure narrow transform, no
    exchange; Catalyst prunes the scan to the four source columns."""
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.lower("p_brand").alias("brand_lc"),
        (F.col("p_retailprice") * 1.1).alias("price_up"),
        (F.col("p_size") + 1).alias("size_next"),
    )


@register(
    "filter_predicates",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
    FROM lineitem
    WHERE l_quantity BETWEEN 10 AND 40
      AND l_returnflag IN ('A', 'R')
      AND l_shipdate >= TIMESTAMP '1995-01-01'
    """,
)
def filter_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate filters (eq/range/IN/ts) — the PromQL instant-vector
    selector analog (A9). All four predicates push to the parquet scan."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        F.col("l_quantity").between(10, 40)
        & F.col("l_returnflag").isin("A", "R")
        & (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")


@register(
    "join_broadcast_enrich",
    oracle="""
    SELECT r.r_name AS region_name,
           count(*) AS n_customers,
           round(avg(c.c_acctbal), 4) AS avg_acctbal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
)
def join_broadcast_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast dim join (A7 info-enrichment ≙ PromQL group_left): both
    dims broadcast, so the fact side never shuffles for the join — the
    only exchange is the final group-by."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region_name"))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.avg("c_acctbal"), 4).alias("avg_acctbal"),
        )
    )


@register(
    "join_fact_fact_revenue",
    oracle="""
    SELECT o.o_orderpriority,
           count(*) AS n_lines,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    """,
)
def join_fact_fact_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact↔fact equi-join (B2 series alignment): shuffles once on
    orderkey; AQE picks SMJ/SHJ and handles skew. Revenue rounded at 2dp
    (sum order differs across engines)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
        )
    )


@register(
    "join_left_outer_order_counts",
    oracle="""
    SELECT c.c_custkey, c.c_name, count(o.o_orderkey) AS n_orders
    FROM customer c
    LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey, c.c_name
    """,
)
def join_left_outer_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join (B9: merge scores where some series are absent):
    customers with zero orders survive with count 0."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, o.o_custkey == c.c_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@register(
    "join_full_outer_keys",
    oracle="""
    SELECT coalesce(a.k, b.k) AS k, a.n_orders, b.n_lines
    FROM (SELECT o_orderkey AS k, count(*) AS n_orders FROM orders
          WHERE o_orderkey % 3 = 0 GROUP BY 1) a
    FULL OUTER JOIN (SELECT l_orderkey AS k, count(*) AS n_lines FROM lineitem
          WHERE l_orderkey % 3 = 1 GROUP BY 1) b
      ON a.k = b.k
    """,
)
def join_full_outer_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join on deliberately disjoint-ish key sets: both
    null-extended sides exercised."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    a = (
        o.filter(F.col("o_orderkey") % 3 == 0)
        .groupBy(F.col("o_orderkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    b = (
        li.filter(F.col("l_orderkey") % 3 == 1)
        .groupBy(F.col("l_orderkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("n_lines"))
    )
    return a.join(b, a.k == b.k, "full").select(
        F.coalesce(a.k, b.k).alias("k"), "n_orders", "n_lines"
    )


@register(
    "join_semi_active_customers",
    oracle="""
    SELECT c_mktsegment, count(*) AS n_customers
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
    GROUP BY c_mktsegment
    """,
)
def join_semi_active_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left semi join (B3 seen-set check / registry existence B12):
    EXISTS without materializing the right side's columns."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@register(
    "join_anti_inactive_customers",
    oracle="""
    SELECT c_mktsegment, count(*) AS n_customers
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY c_mktsegment
    """,
)
def join_anti_inactive_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left anti join: customers that never ordered (NOT EXISTS)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@register(
    "join_band_value_tiers",
    oracle="""
    SELECT b.tier, count(*) AS n_events, round(sum(e.value), 4) AS sum_value
    FROM events e
    JOIN (VALUES ('low', -1e308, 50.0), ('mid', 50.0, 150.0),
                 ('high', 150.0, 1e308)) b(tier, lo, hi)
      ON e.value > b.lo AND e.value <= b.hi
    GROUP BY b.tier
    """,
)
def join_band_value_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta/band join (A6 bucket assignment as a join): broadcast the
    3-row bands relation; zero shuffle on the fact side."""
    ev = load_table(spark, sf_dir, "events")
    bands = spark.createDataFrame(
        [("low", -1e308, 50.0), ("mid", 50.0, 150.0), ("high", 150.0, 1e308)],
        "tier string, lo double, hi double",
    )
    return (
        band_join(ev, bands, "value")
        .groupBy("tier")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
    )


@register(
    "join_asof_last_error",
    oracle="""
    SELECT p.event_id, p.user_id, p.value AS purchase_value,
           e.value AS last_error_value
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'error') e
      ON p.user_id = e.user_id AND p.ts >= e.ts
    """,
)
def join_asof_last_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (A4 gauge-at-ts / B12 latest-model-per-key): for each
    purchase, the user's most recent error value at-or-before it.
    Implemented union+window (one shuffle), checked against DuckDB's
    native ASOF JOIN."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", F.col("value").alias("purchase_value")
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        "user_id", "ts", F.col("value").alias("last_error_value")
    )
    joined = asof_join(
        purchases, errors, on=["user_id"], value_cols=["last_error_value"]
    )
    return joined.select("event_id", "user_id", "purchase_value", "last_error_value")


@register(
    "join_cross_small",
    oracle="""
    SELECT r.r_name, t.event_type
    FROM region r
    CROSS JOIN (SELECT DISTINCT event_type FROM events) t
    """,
)
def join_cross_small(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Guarded cross join (A10 family × bucket expansion): both sides tiny
    by construction — the catalog dim side is broadcast EXPLICITLY so the
    boundedness is a plan property (registry-wide cross-join lint), not a
    size estimate."""
    r = load_table(spark, sf_dir, "region")
    t = load_table(spark, sf_dir, "events").select("event_type").distinct()
    return F.broadcast(r.select("r_name")).crossJoin(t)


@register(
    "set_union_intersect_except",
    oracle="""
    WITH hi AS (SELECT o_custkey AS k FROM orders WHERE o_totalprice > 150000),
         f  AS (SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F')
    SELECT 'union' AS op, count(*) AS n FROM (SELECT k FROM hi UNION SELECT k FROM f)
    UNION ALL
    SELECT 'intersect', count(*) FROM (SELECT k FROM hi INTERSECT SELECT k FROM f)
    UNION ALL
    SELECT 'except', count(*) FROM (SELECT k FROM hi EXCEPT SELECT k FROM f)
    """,
)
def set_union_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operations (A10 family merge, B3/B12 reconciliation):
    UNION DISTINCT / INTERSECT / EXCEPT summarized as counts."""
    o = load_table(spark, sf_dir, "orders")
    hi = o.filter(F.col("o_totalprice") > 150000).select(F.col("o_custkey").alias("k"))
    f = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("k"))

    def n(df: DataFrame, op: str) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias("n")).select(
            F.lit(op).alias("op"), "n"
        )

    return (
        n(hi.union(f).distinct(), "union")
        .unionByName(n(hi.intersect(f), "intersect"))
        .unionByName(n(hi.subtract(f), "except"))
    )
