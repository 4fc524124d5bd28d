"""Time-series alignment operators over `events` — the range-query /
resampling semantics a Prometheus-style engine owns (reference:
numaprom delegates step alignment to the Prometheus range API,
CHANGELOG.md:10 "Prometheus Query Service"; here the engine computes it).

Shared mechanics: samples are first deduplicated to one row per
(event_type, ts) via max(value) so every downstream ordering is
ties-free in both engines; grid alignment uses the *interleaved epoch*
trick — samples sort at 2·t_us, grid points at 2·t_us+1 — so a single
integer range frame expresses "latest sample in (g−lookback, g]"
deterministically, with no self-join and no sample/grid tie ambiguity.

100 TB notes: the only exchange is the per-series window partition; at
scale, partition by (series, calendar bucket) and generate each
bucket's grid inside the partition so no window partition exceeds a
task. The grid itself is generated, never materialized as a table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from numalogic_prometheus_spark.plans import register
from numalogic_prometheus_spark.sources.tables import load_table
from numalogic_prometheus_spark.functions.timeutil import epoch_us

_GRID_START = "2024-01-01 00:00:00"
_GRID_END = "2024-01-08 00:00:00"
_STEP_MIN = 5
_LOOKBACK_US = 600_000_000  # 10 minutes

# Deduped sample relation shared by the oracle CTEs.
_SAMPLES_SQL = """
    samples AS (
        SELECT event_type, ts, max(value) AS value
        FROM events GROUP BY event_type, ts
    )
"""
_GRID_SQL = f"""
    grid AS (
        SELECT unnest(generate_series(TIMESTAMP '{_GRID_START}',
                                      TIMESTAMP '{_GRID_END}',
                                      INTERVAL {_STEP_MIN} MINUTE)) AS gts
    ),
    series AS (SELECT DISTINCT event_type FROM events)
"""


def _deduped_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type", "ts").agg(F.max("value").alias("value"))


def _grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type × grid timestamp) — generated, not scanned."""
    ev = load_table(spark, sf_dir, "events").select("event_type").distinct()
    steps = F.explode(
        F.sequence(
            F.lit(_GRID_START).cast("timestamp"),
            F.lit(_GRID_END).cast("timestamp"),
            F.expr(f"interval {_STEP_MIN} minutes"),
        )
    )
    return ev.select("event_type", steps.alias("gts"))


def _interleaved_union(samples: DataFrame, grid: DataFrame) -> DataFrame:
    """Samples at even epochs (2t), grid at odd (2t+1): a range frame
    ending at a grid row then covers exactly the samples with ts ≤ g."""
    s = samples.select(
        "event_type",
        (epoch_us("ts") * 2).alias("e2"),
        epoch_us("ts").alias("s_us"),
        "value",
        F.lit(None).cast("timestamp").alias("gts"),
    )
    g = grid.select(
        "event_type",
        (epoch_us("gts") * 2 + 1).alias("e2"),
        F.lit(None).cast("long").alias("s_us"),
        F.lit(None).cast("double").alias("value"),
        "gts",
    )
    return s.unionByName(g)


@register(
    "ts_step_resample",
    oracle=f"""
    WITH {_SAMPLES_SQL}, {_GRID_SQL},
    joined AS (
        SELECT se.event_type, g.gts, s.value, s.ts,
               row_number() OVER (PARTITION BY se.event_type, g.gts
                                  ORDER BY s.ts DESC) AS rn
        FROM grid g
        CROSS JOIN series se
        LEFT JOIN samples s
          ON s.event_type = se.event_type
         AND s.ts <= g.gts
         AND s.ts > g.gts - INTERVAL 10 MINUTE
    )
    SELECT event_type, gts AS grid_ts, value
    FROM joined WHERE rn = 1
    """,
)
def ts_step_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL-style instant-vector alignment: for every 5-minute grid
    point, the latest sample within a 10-minute lookback (null = stale
    gap). One window over the interleaved union — the lookback is the
    integer range frame (−2L+1, 0], so no grid×samples join exists on
    the Spark side at all."""
    u = _interleaved_union(
        _deduped_samples(spark, sf_dir), _grid(spark, sf_dir)
    )
    w = (
        W.partitionBy("event_type")
        .orderBy("e2")
        .rangeBetween(-(2 * _LOOKBACK_US - 1), 0)
    )
    return (
        u.withColumn("rv", F.last("value", ignorenulls=True).over(w))
        .filter(F.col("gts").isNotNull())
        .select("event_type", F.col("gts").alias("grid_ts"), F.col("rv").alias("value"))
    )


@register(
    "ts_linear_interpolate",
    oracle=f"""
    WITH {_SAMPLES_SQL}, {_GRID_SQL},
    ge AS (SELECT se.event_type, g.gts FROM grid g CROSS JOIN series se),
    prevs AS (
        SELECT ge.event_type, ge.gts, s.value AS pv, epoch_us(s.ts) AS pt
        FROM ge ASOF LEFT JOIN samples s
          ON ge.event_type = s.event_type AND ge.gts >= s.ts
    ),
    nexts AS (
        SELECT ge.event_type, ge.gts, s.value AS nv, epoch_us(s.ts) AS nt
        FROM ge ASOF LEFT JOIN samples s
          ON ge.event_type = s.event_type AND ge.gts < s.ts
    )
    SELECT p.event_type, p.gts AS grid_ts,
           CASE WHEN p.pv IS NOT NULL AND n.nv IS NOT NULL THEN
               p.pv + (n.nv - p.pv)
                    * ((epoch_us(p.gts) - p.pt) / (n.nt - p.pt))
           END AS value
    FROM prevs p
    JOIN nexts n ON n.event_type = p.event_type AND n.gts = p.gts
    """,
)
def ts_linear_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation at grid points: value = pv + (nv−pv)·(g−pt)/
    (nt−pt) from the nearest samples on each side (null when either side
    is missing — outside the observed range). prev is inclusive (ts ≤ g),
    next strictly after (ts > g), so a sample landing exactly on the grid
    returns itself and the denominator can never be zero. Two window
    passes over one interleaved union replace both inequality joins.

    Oracle linearized r9 (VERDICT r8 #2): the old grid×samples LEFT JOIN
    + per-(grid,ts) row_number form was O(grid·samples) — 142 s of the
    626 s sf0.1 sweep on its own; the two DuckDB ASOF joins (one per
    direction, DuckDB ≥0.10 supports all four inequality orientations)
    match the engine's O(rows) shape, so the differential check now
    scales with the data."""
    u = _interleaved_union(
        _deduped_samples(spark, sf_dir), _grid(spark, sf_dir)
    )
    wp = (
        W.partitionBy("event_type").orderBy("e2")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    # "nearest following" as a RUNNING frame over the REVERSED sort:
    # Spark evaluates (0, unboundedFollowing) frames by re-scanning the
    # partition tail per row — O(rows²) per series, ~50s at sf0.1 —
    # while running (unboundedPreceding, 0) frames accumulate in O(rows).
    # last(ignorenulls) over e2 DESC ≡ first(ignorenulls) over (0, ∞) ASC.
    wn = (
        W.partitionBy("event_type").orderBy(F.col("e2").desc())
        .rowsBetween(W.unboundedPreceding, 0)
    )
    g_us = epoch_us("gts")
    # Unrounded (r9): (g−pt)/(nt−pt) is a ratio of exact integer
    # microseconds; pv/nv are raw parquet doubles passed through — the
    # whole expression is IEEE arithmetic over bit-identical inputs in
    # identical written order on both engines, so the former round(·,6)
    # was a tie-class liability (SCALE.md round-8), not an absorber.
    interp = F.when(
        F.col("pv").isNotNull() & F.col("nv").isNotNull(),
        F.col("pv")
        + (F.col("nv") - F.col("pv"))
        * ((g_us - F.col("pt")) / (F.col("nt") - F.col("pt"))),
    )
    return (
        u.withColumn("pv", F.last("value", ignorenulls=True).over(wp))
        .withColumn("pt", F.last("s_us", ignorenulls=True).over(wp))
        .withColumn("nv", F.last("value", ignorenulls=True).over(wn))
        .withColumn("nt", F.last("s_us", ignorenulls=True).over(wn))
        .filter(F.col("gts").isNotNull())
        .select(
            "event_type",
            F.col("gts").alias("grid_ts"),
            interp.alias("value"),
        )
    )


@register(
    "ts_ohlc_hourly",
    oracle="""
    WITH samples AS (
        SELECT event_type, ts, max(value) AS value
        FROM events GROUP BY event_type, ts
    )
    SELECT event_type, date_trunc('hour', ts) AS bucket,
           arg_min(value, ts) AS open,
           max(value) AS high,
           min(value) AS low,
           arg_max(value, ts) AS close,
           count(*)::BIGINT AS n_samples
    FROM samples
    GROUP BY event_type, date_trunc('hour', ts)
    """,
)
def ts_ohlc_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLC bars per series — the downsampling shape dashboards
    read instead of raw samples. min_by/max_by on the ties-free deduped
    relation; one partial-aggregating exchange, values pass through
    un-arithmetized so both engines emit identical doubles."""
    s = _deduped_samples(spark, sf_dir)
    return (
        s.groupBy("event_type", F.date_trunc("hour", "ts").alias("bucket"))
        .agg(
            F.min_by("value", "ts").alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", "ts").alias("close"),
            F.count(F.lit(1)).alias("n_samples"),
        )
    )


@register(
    "ts_sessionize_gap",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts, event_id, value,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    numbered AS (
        SELECT user_id, ts, value,
               sum(new_session) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING)::BIGINT
                   AS session_idx
        FROM flagged
    )
    SELECT user_id, session_idx,
           min(ts) AS session_start, max(ts) AS session_end,
           count(*)::BIGINT AS n_events,
           round(sum(value), 2) AS total_value
    FROM numbered
    GROUP BY user_id, session_idx
    """,
)
def ts_sessionize_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization by 30-minute inactivity gap (the batch twin
    of stream_session_windows): lag-flag new sessions, integer running
    sum numbers them (int cumsum is engine-reproducible where double
    prefix sums are not), then one agg per session. Both windows and the
    aggregate share the user_id partitioning — a single exchange."""
    ev = load_table(spark, sf_dir, "events")
    wo = W.partitionBy("user_id").orderBy("ts", "event_id")
    new_s = F.when(
        F.lag("ts").over(wo).isNull()
        | (
            epoch_us("ts") - epoch_us(F.lag("ts").over(wo))
            > 30 * 60 * 1_000_000
        ),
        F.lit(1),
    ).otherwise(F.lit(0))
    return (
        ev.withColumn("new_session", new_s)
        .withColumn(
            "session_idx",
            F.sum("new_session")
            .over(wo.rowsBetween(W.unboundedPreceding, 0))
            .cast("long"),
        )
        .groupBy("user_id", "session_idx")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


_EWMA_TAU_US = 3_600_000_000  # 1 hour


@register("ts_ewma_irregular")  # sequential recurrence: not SQL-expressible
def ts_ewma_irregular(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Irregular-interval EWMA (τ = 1 h) per series: s_i = α_i·v_i +
    (1−α_i)·s_{i−1}, α_i = 1 − exp(−Δt_i/τ).

    SEGMENTED SCAN, FULLY JVM-SIDE (round-7 re-key; VERDICT r6 #3 —
    round 6's applyInPandas kernels put ~3 s of Arrow+Python seam cost
    on the bench). The recurrence is linear in the state, so it
    decomposes per (series, day) segment exactly as in round 6; the new
    observation is that the in-segment decay products have a CLOSED
    FORM: ln(1−α_j) = −Δt_j/τ exactly, so the prefix product
    C_i = ∏_{1≤j≤i}(1−α_j) = exp(−(t_i − t_0)/τ) — one exp() per row,
    no cumprod, no Python. The whole scan is then window expressions:

        local_i  = exp(−(t_i−t_0)/τ) · Σ_{j≤i} term_j
        term_0   = b_0 (segment base), term_j = α_j·v_j·exp((t_j−t_0)/τ)
        prefix_i = exp(−(t_i−t_0)/τ) · a_in      (0 for the series head)

    where a_in = exp(−(t_0 − prev_seg_last)/τ) is the cross-segment
    decay, applied once and never inverted (a month-long gap underflows
    to the correct fully-decayed 0, it cannot overflow — ADVICE r6).
    The rescale factor exp((t_j−t_0)/τ) is bounded by e^24 ≈ 2.6e10
    because a segment spans one day — safe in doubles, and the scaled
    roundoff cancels on the way back down (absolute error stays
    ~1e−16·|v|). Only the per-series segment chain
    S_d = L_d + P_d·S_{d−1} (#series × #days rows) remains in Python.
    Rows-only entry; determinism pinned by the (ts, event_id) sort.
    Parallelism: #series × #days window partitions, JVM codegen
    throughout the full-relation stages.
    """
    import numpy as np
    import pandas as pd

    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "ts", "event_id", "value", F.to_date("ts").alias("seg")
    )

    # Per-segment metadata: the timestamp of the last sample of the
    # PREVIOUS segment (drives the cross-segment decay a_in) — tiny
    # relation, broadcast back onto the rows.
    meta = (
        ev.groupBy("event_type", "seg")
        .agg(F.max("ts").alias("seg_last_ts"))
        .withColumn(
            "prev_last_ts",
            F.lag("seg_last_ts").over(
                W.partitionBy("event_type").orderBy("seg")
            ),
        )
        .drop("seg_last_ts")
    )
    rows = ev.join(F.broadcast(meta), ["event_type", "seg"])

    w = W.partitionBy("event_type", "seg").orderBy("ts", "event_id")
    wcum = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    t_us = epoch_us("ts")
    tau = float(_EWMA_TAU_US)
    first = F.col("prev_last_ts").isNull()

    scanned = (
        rows.withColumn("rn", F.row_number().over(w))
        .withColumn("t0_us", F.first(t_us).over(wcum))
        .withColumn(
            "a_in",
            F.when(first, F.lit(1.0)).otherwise(
                F.exp(-(F.col("t0_us") - epoch_us("prev_last_ts")) / tau)
            ),
        )
        .withColumn(
            "alpha",
            1.0 - F.exp(-(t_us - F.lag(t_us).over(w)) / tau),
        )
        .withColumn(
            "term",
            F.when(
                F.col("rn") == 1,
                # segment base: v_0 for the series head (s_0 = v_0),
                # else α_in·v_0 with the incoming state carried by prefix
                F.when(first, F.col("value")).otherwise(
                    (1.0 - F.col("a_in")) * F.col("value")
                ),
            ).otherwise(
                F.col("alpha")
                * F.col("value")
                * F.exp((t_us - F.col("t0_us")) / tau)
            ),
        )
        .withColumn("decay", F.exp(-(t_us - F.col("t0_us")) / tau))
        .withColumn("local", F.col("decay") * F.sum("term").over(wcum))
        .withColumn(
            "prefix",
            F.when(first, F.lit(0.0)).otherwise(
                F.col("decay") * F.col("a_in")
            ),
        )
        .select("event_type", "seg", "ts", "event_id", "value", "local", "prefix")
    )
    # Both the segment summary and the final projection read `scanned`;
    # pin it so the window stage runs once. At the 100 TB design point
    # this is an exchange reuse / persisted intermediate of one
    # already-reduced pass.
    scanned = scanned.localCheckpoint(eager=False)

    # Segment summaries (last row of each segment) → per-series chain
    # S_d = L_d + P_d·S_{d−1} on #series × #days rows. The groupBy keys
    # equal the window partition keys, so Catalyst reuses the exchange.
    summary = scanned.groupBy("event_type", "seg").agg(
        F.max_by(
            F.struct("local", "prefix"), F.struct("ts", "event_id")
        ).alias("fin")
    ).select(
        "event_type", "seg", F.col("fin.local").alias("L"),
        F.col("fin.prefix").alias("P"),
    )

    def chain(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("seg").reset_index(drop=True)
        s_in = np.empty(len(pdf))
        s = 0.0
        for i in range(len(pdf)):
            s_in[i] = s
            s = pdf["L"].iloc[i] + pdf["P"].iloc[i] * s
        return pd.DataFrame(
            {
                "event_type": pdf["event_type"],
                "seg": pdf["seg"],
                "s_in": s_in,
            }
        )

    entering = summary.groupBy("event_type").applyInPandas(
        chain, "event_type string, seg date, s_in double"
    )

    return (
        scanned.join(F.broadcast(entering), ["event_type", "seg"])
        .select(
            "event_type",
            "ts",
            "value",
            F.round(
                F.col("local") + F.col("prefix") * F.col("s_in"), 6
            ).alias("ewma"),
        )
    )


@register("ts_holt_winters_level_trend")  # sequential recurrence → rows-only
def ts_holt_winters_level_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt's double exponential smoothing per series (PromQL
    `holt_winters(v[r], sf, tf)` analog): level/trend recurrence
    l_i = α·v_i + (1−α)(l_{i−1}+b_{i−1}), b_i = β(l_i−l_{i−1}) +
    (1−β)b_{i−1} with α=0.3, β=0.1.

    SEGMENTED SCAN (round-6 re-key; VERDICT r5 #5). The state
    s = (level, trend) evolves linearly: s_i = A·s_{i−1} + d·v_i with
    constant A = [[0.7, 0.7], [−0.03, 0.97]], d = (0.3, 0.03) — derived
    by substituting the level update into the trend update. So each
    (series, day) segment computes, in parallel, its local response
    L = Σ A^{n−k} d v_k (loop with zero incoming state) and its
    transfer matrix A^n; the per-series chain S_d = L_d + A^{n_d}·S_{d−1}
    runs on the tiny segment summary. |eig(A)| = √0.7 < 1 so A^n decays —
    no overflow. The segment holding the series head runs the original
    init (l=v₀, b=v₁−v₀; note the state after consuming v₁ is exactly
    (v₁, v₁−v₀), which is how a head split between two segments is
    re-initialized exactly). Parallelism: #series × #days tasks instead
    of #series. Rows-only entry; (ts, event_id) sort pins determinism.

    Round-7 addition (VERDICT r6 #3): segments are tail-truncated in the
    JVM to their last 1024 rows before the Python kernel — exact at
    double precision because |eig(A)|^1024 = 0.7^512 underflows to 0
    (see the inline truncation note) — so the Arrow+Python seam cost is
    bounded by #segments × 1024 rows, not the raw row count.
    """
    import numpy as np
    import pandas as pd

    A = ((0.7, 0.7), (-0.03, 0.97))

    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "ts", "event_id", "value", F.to_date("ts").alias("seg")
    )

    # Per-segment metadata: the series-global start offset of the segment
    # (cumulative count of earlier segments) and the previous segment's
    # first value (needed only when the 2-sample init straddles segments).
    w_series = W.partitionBy("event_type").orderBy("seg")
    meta = (
        ev.groupBy("event_type", "seg")
        .agg(
            F.count(F.lit(1)).alias("seg_n"),
            F.min_by("value", F.struct("ts", "event_id")).alias("first_v"),
        )
        .select(
            "event_type",
            "seg",
            "seg_n",
            (
                F.coalesce(
                    F.sum("seg_n").over(
                        w_series.rowsBetween(W.unboundedPreceding, -1)
                    ),
                    F.lit(0),
                )
            ).alias("start_off"),
            F.lag("first_v").over(w_series).alias("prev_first_v"),
        )
    )
    # TAIL TRUNCATION (round 7, VERDICT r6 #3): |eig(A)| = √0.7, so a
    # sample's influence on the segment-final state decays as 0.7^(k/2)
    # at depth k from the segment end — below 1e-79 (double underflow)
    # past depth 1024. Keep only each segment's last _HW_KEEP rows in
    # the JVM and run the Python kernel on the survivors: the Arrow
    # transfer shrinks from #rows to ≤ #segments × _HW_KEEP while the
    # result is bit-identical at double precision (the dropped terms and
    # the incoming-state influence are exactly 0.0 in IEEE arithmetic;
    # truncated segments take the interior path with transfer matrix
    # A^n_true, itself underflowed to the true zero). Golden fixtures
    # are smaller than _HW_KEEP, so they exercise the untruncated paths
    # unchanged.
    _HW_KEEP = 1024
    w_rev = W.partitionBy("event_type", "seg").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    rows = (
        ev.withColumn("rrn", F.row_number().over(w_rev))
        .filter(F.col("rrn") <= _HW_KEEP)
        .drop("rrn")
        .join(F.broadcast(meta), ["event_type", "seg"])
    )

    _HW_BLOCK = 512

    def _tables():
        # A^j and A^j·d for j = 0.._HW_BLOCK, built once per executor
        # process and cached on the function object.
        if not hasattr(_tables, "cache"):
            ap = np.empty((_HW_BLOCK + 1, 2, 2))
            ap[0] = np.eye(2)
            a = np.array(A)
            for j in range(1, _HW_BLOCK + 1):
                ap[j] = ap[j - 1] @ a
            _tables.cache = (ap, ap @ np.array([0.3, 0.03]))
        return _tables.cache

    def seg_scan(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"]).reset_index(drop=True)
        v = pdf["value"].to_numpy()
        n = len(v)
        n_true = int(pdf["seg_n"].iloc[0])
        start = int(pdf["start_off"].iloc[0])
        def run(lvl: float, trend: float, xs) -> tuple[float, float]:
            # Blocked matrix-form scan: after a block of length L,
            #   s ← A^L·s + Σ_{k=1..L} A^{L−k}·d·x_k
            # where the sum is a dot product against the precomputed
            # A^j·d table (reversed) — vectorized, |eig(A)| < 1 keeps
            # every table entry bounded. ~n/512 Python iterations
            # instead of n.
            ap, pd_tab = _tables()
            s = np.array([lvl, trend])
            xs = np.asarray(xs, dtype="float64")
            for i in range(0, len(xs), _HW_BLOCK):
                blk = xs[i:i + _HW_BLOCK]
                L = len(blk)
                s = ap[L] @ s + pd_tab[:L].T @ blk[::-1]
            return float(s[0]), float(s[1])

        if n < n_true:
            # truncated segment (JVM kept only the last _HW_KEEP rows):
            # anything earlier — including any series-head init —
            # influences the final state by < 0.7^(_HW_KEEP/2) = 0.0 in
            # doubles, so the interior path with zero incoming state is
            # exact; the chain fix-up uses the TRUE transfer matrix
            # A^n_true (underflowed to the true IEEE zero).
            lvl, trend = run(0.0, 0.0, v)
            m = np.linalg.matrix_power(np.array(A), n_true)
            exact = True
        elif start == 0 and n >= 2:
            # series head entirely in-segment: original init + loop;
            # exact state, no dependence on incoming state (M = 0).
            lvl, trend = run(v[0], v[1] - v[0], v[1:])
            m = np.zeros((2, 2))
            exact = True
        elif start == 0:
            # lone head sample: state is "init pending"; the next
            # segment re-derives it from (this value, its own first).
            # Carry v₀ in `lvl` so a single-sample SERIES still yields
            # the original (level=v₀, trend=0) from the chain kernel.
            lvl, trend = float(v[0]), 0.0
            m = np.zeros((2, 2))
            exact = False
        elif start == 1:
            # v₀ lives in the previous segment: state after consuming
            # this segment's first sample v₁ is exactly (v₁, v₁−v₀).
            v0 = float(pdf["prev_first_v"].iloc[0])
            lvl, trend = run(v[0], v[0] - v0, v[1:])
            m = np.zeros((2, 2))
            exact = True
        else:
            # interior segment: local response with zero incoming state
            # plus the transfer matrix A^n for the chain fix-up.
            lvl, trend = run(0.0, 0.0, v)
            m = np.linalg.matrix_power(np.array(A), n)
            exact = True
        return pd.DataFrame(
            {
                "event_type": [pdf["event_type"].iloc[0]],
                "seg": [pdf["seg"].iloc[0]],
                # n_true, not len(v): n_samples must count the full
                # segment even when only the tail crossed the seam
                "n": [np.int64(n_true)],
                "lvl": [float(lvl)],
                "trend": [float(trend)],
                "m00": [float(m[0, 0])],
                "m01": [float(m[0, 1])],
                "m10": [float(m[1, 0])],
                "m11": [float(m[1, 1])],
                "exact": [bool(exact)],
            }
        )

    summary = rows.groupBy("event_type", "seg").applyInPandas(
        seg_scan,
        "event_type string, seg date, n long, lvl double, trend double, "
        "m00 double, m01 double, m10 double, m11 double, exact boolean",
    )

    def chain(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("seg").reset_index(drop=True)
        total = int(pdf["n"].sum())
        if total < 2:
            # single-sample series: the pending-init row carries v₀ in
            # `lvl` → original semantics (level=v₀, trend=0).
            out_lvl = float(pdf["lvl"].iloc[0]) if total else 0.0
            out_trend = 0.0
        else:
            s = np.zeros(2)
            for r in pdf.itertuples(index=False):
                if not r.exact:
                    continue  # pending init — folded into the next row
                m = np.array([[r.m00, r.m01], [r.m10, r.m11]])
                s = np.array([r.lvl, r.trend]) + m @ s
            out_lvl, out_trend = float(s[0]), float(s[1])
        return pd.DataFrame(
            {
                "event_type": [pdf["event_type"].iloc[0]],
                "n_samples": [np.int64(total)],
                "level": [round(out_lvl, 6)],
                "trend": [round(out_trend, 6)],
                "forecast_1": [round(out_lvl + out_trend, 6)],
            }
        )

    return summary.groupBy("event_type").applyInPandas(
        chain,
        "event_type string, n_samples long, level double, "
        "trend double, forecast_1 double",
    )


_SHIFT_W = 12          # samples per side of the split point
_SHIFT_THRESHOLD = 40.0  # |level change| that flags (p99-ish at sf0.001)


@register(
    "ts_level_shift_detect",
    oracle=f"""
    WITH {_SAMPLES_SQL.strip()},
    c AS (
        SELECT event_type, ts, round(value * 100)::BIGINT AS cents
        FROM samples
    ),
    s AS (
        SELECT event_type, ts,
               sum(cents) OVER (PARTITION BY event_type ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS run,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY ts) AS rn,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM c
    ),
    sh AS (
        SELECT event_type, ts,
               ((lead(run, {_SHIFT_W - 1}) OVER w - lag(run, 1, 0) OVER w)
                    / {_SHIFT_W}.0
                - (lag(run, 1, 0) OVER w
                   - lag(run, {_SHIFT_W + 1}, 0) OVER w) / {_SHIFT_W}.0)
                   / 100.0 AS shift_value
        FROM s
        WINDOW w AS (PARTITION BY event_type ORDER BY ts)
        QUALIFY rn > {_SHIFT_W} AND rn <= n - {_SHIFT_W - 1}
    )
    SELECT event_type, ts, shift_value,
           abs(shift_value) > {_SHIFT_THRESHOLD} AS is_shift
    FROM sh
    """,
)
def ts_level_shift_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Level-shift (changepoint) detection per series: at every sample,
    the mean of the NEXT 12 samples (current included) minus the mean
    of the PREVIOUS 12 — a step-edge filter; |shift| > threshold flags
    a level change. Only full two-sided windows are emitted (no edge
    noise).

    Expressed as a PREFIX-SUM REWRITE rather than two sliding frames:
    one running cumulative sum of exact integer cents per series, then
    both window sums are lag/lead differences of it — O(rows) total
    where Spark evaluates each bounded sliding frame O(rows x w) (the
    same cost observation as ts_linear_interpolate's reversed-frame
    note). Each side's mean is exact-BIGINT-difference / w, so
    shift_value is the identical IEEE sequence in both engines,
    emitted unrounded (tie-class rule). Two exchanges total (the
    (series, ts) dedup agg, then the per-series window partition every
    window function shares); the right-edge full-window test is a null
    check on a lead the shift already computes, not a count(*) over
    the partition — two Window passes, not three."""
    w = _SHIFT_W
    samples = _deduped_samples(spark, sf_dir)
    cents = F.round(F.col("value") * 100).cast("long")
    wo = W.partitionBy("event_type").orderBy("ts")
    s = samples.select(
        "event_type",
        "ts",
        F.sum(cents).over(wo.rowsBetween(W.unboundedPreceding, 0)).alias("run"),
        F.row_number().over(wo).alias("rn"),
    )
    lag1 = F.lag("run", 1, 0).over(wo)
    # the right window is full iff lead(run, w-1) exists — this replaces
    # a count(*)-over-unordered-partition (a third Window pass over the
    # data) with a null test on a lead the shift already needs
    lead_r = F.lead("run", w - 1).over(wo)
    shift = (
        (lead_r - lag1) / float(w)
        - (lag1 - F.lag("run", w + 1, 0).over(wo)) / float(w)
    ) / 100.0
    return (
        s.withColumn("__lead_r", lead_r)
        .withColumn("shift_value", shift)
        .filter((F.col("rn") > w) & F.col("__lead_r").isNotNull())
        .drop("__lead_r")
        .select(
            "event_type",
            "ts",
            "shift_value",
            (F.abs("shift_value") > _SHIFT_THRESHOLD).alias("is_shift"),
        )
    )
