"""The canonical samples relation (SURVEY.md §1.2).

The reference's fundamental abstraction is a stream of
``(name, labels, value)`` records mutating per-series state (reference
numaprom/monitoring/metrics.py:64-68 etc.). The Spark-native equivalent is
a *relation* with schema::

    samples(name: string, ts: timestamp,
            labels: map<string,string>, value: double)

Every metric discipline (counter/gauge/summary/histogram/info) is an
aggregation query over this relation keyed by (name, labels) — the child
time series of the Prometheus data model becomes a group, not an object.

Scale note: the ``labels`` map column is kept for long-tail label keys;
hot keys should be *promoted* to first-class string columns (here
``event_type`` / ``user_id``) so Catalyst can prune/push down on them —
a map lookup cannot be pushed to the parquet reader, a plain column can.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from numalogic_prometheus_spark.sources.tables import load_table


def samples_relation(spark: SparkSession, sf_dir: str, name: str = "events_total") -> DataFrame:
    """Derive the canonical samples relation from the ``events`` fixture.

    Mirrors FIXTURES.md: labels = {event_type, user_id}; hot label keys are
    ALSO kept as promoted first-class columns for pushdown-friendly access.
    """
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        F.lit(name).alias("name"),
        F.col("ts"),
        F.create_map(
            F.lit("event_type"), F.col("event_type"),
            F.lit("user_id"), F.col("user_id").cast("string"),
        ).alias("labels"),
        F.col("event_type"),
        F.col("user_id"),
        F.col("value"),
    )
