"""Slowly-changing-dimension (SCD Type 2) history build, round 9: the
warehouse-side operator every large-scale pipeline needs to turn an
append-only changelog into a versioned dimension with validity
intervals. The reference emits state transitions as raw metric events
and leaves history reconstruction to the backend (reference
CHANGELOG.md:10 — the pipeline publishes to Prometheus; range queries
reconstruct state); this engine owns the reconstruction as a relational
operator, the same posture as the PromQL read-side modules.

Semantics: the changelog is `events` ordered by (ts, event_id) per
user; the tracked attribute is event_type (the user's current state).
A row opens a new version iff its state differs from the previous
row's (consecutive dedup — re-assertions of the same state extend the
open interval, they do not version it). Each version v carries
[valid_from, valid_to) with valid_to = the next version's valid_from
and NULL for the open current version; `is_current` marks exactly one
row per user. Versions number 1..k in change order. All outputs are
exact integers (epoch micros, version counters) — the entry is
float-free, so no cross-engine rounding surface exists at all.

Scale notes (100 TB design): ONE exchange on user_id; the three window
functions (lag for change detection, row_number for versioning, lead
for interval close) share the same (user_id)/(ts, event_id) sort order
so Catalyst evaluates them in a single Window chain over one sort — no
second shuffle, no join, no self-join against the "next" row (the
classic SQL-92 formulation). Per-user partitions are bounded by a
user's event count; the output is the change-point relation, ≪ the
fact table. At 1000 executors this is a textbook hash-partitioned
window scan; skewed power-users are bounded by their own history
length, not by the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from numalogic_prometheus_spark.functions.timeutil import epoch_us
from numalogic_prometheus_spark.plans import register
from numalogic_prometheus_spark.sources.tables import load_table


@register(
    "scd2_state_history",
    oracle="""
    WITH ordered AS (
        SELECT user_id, event_type, ts, event_id,
               lag(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev_state
        FROM events
    ),
    changes AS (
        SELECT user_id, event_type, ts, event_id
        FROM ordered
        WHERE prev_state IS NULL OR prev_state <> event_type
    )
    SELECT user_id,
           event_type AS state,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY ts, event_id)::BIGINT AS version,
           epoch_us(ts) AS valid_from_us,
           lead(epoch_us(ts)) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS valid_to_us,
           CASE WHEN lead(ts) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) IS NULL
                THEN 1 ELSE 0 END::BIGINT AS is_current
    FROM changes
    """,
)
def scd2_state_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type 2 dimension build from the event changelog: per user,
    consecutive-deduped event_type transitions become versioned
    validity intervals [valid_from, valid_to) with a NULL-open current
    row (module docstring for the full contract). Change detection,
    versioning and interval close are three window functions over the
    SAME (user_id)/(ts, event_id) order — one exchange, one sort, no
    self-join. Float-free: epoch micros and integer versions only."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    order = W.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        ev.withColumn("prev_state", F.lag("event_type").over(order))
        .filter(
            F.col("prev_state").isNull()
            | (F.col("prev_state") != F.col("event_type"))
        )
        .drop("prev_state")
    )
    nxt = F.lead(epoch_us(F.col("ts"))).over(order)
    return changes.select(
        "user_id",
        F.col("event_type").alias("state"),
        F.row_number().over(order).cast("long").alias("version"),
        epoch_us(F.col("ts")).alias("valid_from_us"),
        nxt.alias("valid_to_us"),
        F.when(nxt.isNull(), 1).otherwise(0).cast("long").alias("is_current"),
    )
