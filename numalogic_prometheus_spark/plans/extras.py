"""Remaining §2C surface: pivot/unpivot, grouping sets, interval-overlap
join, model-registry read (B12), map-column label algebra over the
canonical samples relation, explode/UDTF-style token expansion, and the
multimodal seam (rows-only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from numalogic_prometheus_spark.operators import multimodal as MM
from numalogic_prometheus_spark.plans import register
from numalogic_prometheus_spark.sources.samples import samples_relation
from numalogic_prometheus_spark.sources.tables import load_table


@register(
    "agg_pivot_status",
    oracle="""
    SELECT l_returnflag,
           round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS "O",
           round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS "F"
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (wide metric matrices for exposition A10): explicit value
    list so Catalyst skips the distinct-scan job."""
    li = load_table(spark, sf_dir, "lineitem")
    out = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.round(F.sum("l_quantity"), 2))
    )
    return out


@register(
    "agg_unpivot_part_attrs",
    oracle="""
    SELECT p_partkey, 'size' AS attr, p_size::DOUBLE AS val FROM part
    UNION ALL
    SELECT p_partkey, 'price' AS attr, p_retailprice AS val FROM part
    """,
)
def agg_unpivot_part_attrs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot/stack (long-form samples out of wide tables — the inverse
    of exposition pivoting)."""
    p = load_table(spark, sf_dir, "part")
    return p.selectExpr(
        "p_partkey",
        "stack(2, 'size', CAST(p_size AS DOUBLE), 'price', p_retailprice) AS (attr, val)",
    )


@register(
    "agg_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           count(*) AS n, round(sum(l_extendedprice), 2) AS sum_price
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (B9 unified scores at selected levels only —
    cheaper than cube when the lattice is sparse)."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               count(*) AS n, round(sum(l_extendedprice), 2) AS sum_price
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        """
    )


@register(
    "join_interval_overlap",
    oracle="""
    WITH sessions AS (
        SELECT user_id, session_id, min(ts) AS s_start, max(ts) AS s_end
        FROM (
            SELECT user_id, ts,
                   -- >= not >: Spark session ranges are end-exclusive,
                   -- an exactly-10-minute gap starts a new session
                   sum(CASE WHEN prev_ts IS NULL
                                 OR ts - prev_ts >= INTERVAL 10 MINUTE
                            THEN 1 ELSE 0 END)
                       OVER (PARTITION BY user_id ORDER BY ts
                             ROWS UNBOUNDED PRECEDING) AS session_id
            FROM (SELECT user_id, ts,
                         lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
                  FROM events)
        )
        GROUP BY user_id, session_id
    ),
    hours AS (SELECT DISTINCT date_trunc('hour', ts) AS hour FROM events)
    SELECT s.user_id, s.s_start AS session_start, h.hour
    FROM sessions s
    JOIN hours h
      ON s.s_start < h.hour + INTERVAL 1 HOUR AND s.s_end >= h.hour
    """,
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join (B2 window-to-event alignment): user activity
    sessions × hour grid, overlap predicate `[s,e] ∩ [h,h+1h) ≠ ∅`.

    r17 rewrite: because the grid is HOURLY-ALIGNED, the theta
    predicate `s_start < h + 1h AND s_end >= h` is exactly
    `h ∈ [date_trunc(hour, s_start), date_trunc(hour, s_end)]` — so
    each session map-side explodes into precisely its overlapping
    hours (sequence step 1h; 10-min-gap sessions touch 1-2) and the
    join becomes a broadcast HASH equi-join against the grid (which
    still gates on hours that actually saw events, matching the
    oracle). The prior broadcast nested-loop form evaluated
    |sessions| × |grid| predicates — 71M at sf0.1 (7.9 s measured,
    the whole entry's cost) and ~860B at a year-scale grid with 100M
    sessions; this form does |sessions| × overlap-degree work
    (98.6k rows at sf0.1, 1.0 s measured) and scales with OUTPUT
    size, the same banding discipline as join_interval_bucketed."""
    ev = load_table(spark, sf_dir, "events")
    sessions = (
        ev.groupBy("user_id", F.session_window("ts", "10 minutes"))
        .agg(F.min("ts").alias("s_start"), F.max("ts").alias("s_end"))
    )
    hours = ev.select(F.date_trunc("hour", "ts").alias("hour")).distinct()
    exploded = sessions.select(
        "user_id",
        F.col("s_start").alias("session_start"),
        F.explode(
            F.sequence(
                F.date_trunc("hour", "s_start"),
                F.date_trunc("hour", "s_end"),
                F.expr("interval 1 hour"),
            )
        ).alias("hour"),
    )
    return exploded.join(F.broadcast(hours), "hour").select(
        "user_id", "session_start", "hour"
    )


@register(
    "registry_latest_artifact",
    oracle="""
    WITH runs AS (
        SELECT o_orderpriority AS model_key,
               date_trunc('day', o_orderdate)::TIMESTAMP AS trained_at,
               round(avg(o_totalprice), 4) AS artifact_metric,
               count(*) AS n_samples
        FROM orders
        GROUP BY 1, 2
    )
    SELECT model_key, trained_at, artifact_metric, n_samples
    FROM (
        SELECT *, row_number() OVER (PARTITION BY model_key
                                     ORDER BY trained_at DESC) AS rn
        FROM runs
    ) WHERE rn = 1
    """,
)
def registry_latest_artifact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-registry read side (B12, CHANGELOG.md:124: versioned
    artifacts with a latest pointer): training runs as a relation, latest
    artifact per key = row_number()==1 over trained_at desc — the
    relational replacement for Redis GET latest."""
    o = load_table(spark, sf_dir, "orders")
    runs = o.groupBy(
        F.col("o_orderpriority").alias("model_key"),
        F.date_trunc("day", "o_orderdate").alias("trained_at"),
    ).agg(
        F.round(F.avg("o_totalprice"), 4).alias("artifact_metric"),
        F.count(F.lit(1)).alias("n_samples"),
    )
    w = W.partitionBy("model_key").orderBy(F.col("trained_at").desc())
    return (
        runs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


@register(
    "samples_label_algebra",
    oracle="""
    SELECT event_type AS label_event_type,
           count(*) AS n,
           round(sum(value), 4) AS sum_value
    FROM events
    WHERE user_id % 2 = 0
    GROUP BY event_type
    """,
)
def samples_label_algebra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label algebra over the canonical samples relation (SURVEY.md §1.2):
    select series by label via element_at on the MapType column, aggregate
    by a label value — PromQL instant-vector selector semantics over the
    map-typed long tail. (Hot labels stay promoted columns for pushdown;
    this exercises the map path deliberately.)"""
    s = samples_relation(spark, sf_dir)
    return (
        s.filter(F.element_at("labels", "user_id").cast("long") % 2 == 0)
        .groupBy(F.element_at("labels", "event_type").alias("label_event_type"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
    )


@register(
    "explode_token_frequencies",
    oracle="""
    SELECT tok, count(*) AS freq
    FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
    GROUP BY tok
    ORDER BY freq DESC, tok
    LIMIT 20
    """,
)
def explode_token_frequencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explode/UDTF surface (A10 one-family→many-lines shape): token
    explosion + frequency top-20 with deterministic tiebreak."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.col("freq").desc(), "tok")
        .limit(20)
    )


@register(
    "multimodal_decode_features",
    # One oracle covers all three dispatched modalities (round 14 —
    # the fake decoder is retired): each branch recomputes the decoded
    # scalar stream from its codec's closed-form signal — WAV PCM
    # (operators/multimodal.py:_wav_samples), PNG RGB (_png_pixels),
    # GIF palette[index] RGB (_gif_indexes/_gif_palette) — and the
    # unified features are exact BIGINTs on both engines.
    oracle="""
    WITH wav AS (
        SELECT doc_id, 'audio/wav' AS media_type, i,
               (doc_id * 7919 + i * 104729) % 65536 - 32768 AS v
        FROM (SELECT doc_id, 160 + (doc_id % 97) * 16 AS n
              FROM documents WHERE doc_id % 3 = 0),
             unnest(range(0, n)) AS u(i)
    ),
    png AS (
        SELECT doc_id, 'image/png' AS media_type,
               (y * w + x) * 3 + c AS i,
               (doc_id * 4099 + y * 131 + x * 17 + c * 59) % 256 AS v
        FROM (SELECT doc_id, 8 + (doc_id % 13) * 2 AS w,
                     8 + (doc_id % 7) * 2 AS h
              FROM documents WHERE doc_id % 3 = 1),
             unnest(range(0, h)) AS u(y),
             unnest(range(0, w)) AS q(x),
             unnest(range(0, 3)) AS t(c)
    ),
    gif AS (
        SELECT doc_id, 'image/gif' AS media_type,
               (y * w + x) * 3 + c AS i,
               CASE c WHEN 0 THEN (doc_id * 5 + j * 41) % 256
                      WHEN 1 THEN (doc_id * 11 + j * 23) % 256
                      ELSE (doc_id * 17 + j * 59) % 256 END AS v
        FROM (
            SELECT doc_id, w, h, y, x, c,
                   (doc_id * 31 + y * 7 + x * 3) % ncol AS j
            FROM (SELECT doc_id, 8 + (doc_id % 11) * 2 AS w,
                         8 + (doc_id % 6) * 2 AS h,
                         (1 << (2 + (doc_id % 5))::INT) AS ncol
                  FROM documents WHERE doc_id % 3 = 2),
                 unnest(range(0, h)) AS u(y),
                 unnest(range(0, w)) AS q(x),
                 unnest(range(0, 3)) AS t(c)
        )
    ),
    allv AS (
        SELECT * FROM wav
        UNION ALL SELECT * FROM png
        UNION ALL SELECT * FROM gif
    )
    SELECT doc_id,
           any_value(media_type) AS media_type,
           count(*)::BIGINT AS n_values,
           sum(v)::BIGINT AS sum_vals,
           sum(v * v)::BIGINT AS sum_sq,
           max(abs(v))::BIGINT AS peak,
           sum((i + 1) * v)::BIGINT AS pos_checksum
    FROM allv GROUP BY doc_id
    """,
)
def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unified multimodal decode seam ([north-star]), REAL codecs only
    (round 14 — VERDICT r13 #2): per doc, the modality dispatched by
    doc_id % 3 (WAV / PNG / GIF) is synthesized as a genuine container,
    decoded through its strict READ path, and feature-extracted into
    ONE schema over the decoded scalar stream (count, signed sum,
    energy, peak |v|, position-weighted checksum). A decode bug in ANY
    dispatched codec — PCM framing, PNG filter reconstruction, LZW
    width growth, palette indirection — breaks the single oracle hash.
    Scale: map-only Arrow-batched decode, zero exchanges (plan-pinned
    with the per-codec entries)."""
    d = load_table(spark, sf_dir, "documents")
    return MM.unified_decode_features(d)
