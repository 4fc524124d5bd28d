"""Miscellaneous batch-2 operators: video frame-sampling plumbing and an
explicit salted skew join.

Salting is the manual counterpart of AQE's skew-join split, included as
a first-class operator because AQE only rebalances at shuffle-read time
within one join — pre-salting is what a pipeline applies when a single
hot key (one tenant, one null-ish default) dominates a fact-fact join
across *several* downstream stages. Semantics are oracle-checked against
the plain (unsalted) join: salting must be a pure physical rewrite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from numalogic_prometheus_spark.operators.multimodal import (
    frame_sample,
    synthesize_assets,
)
from numalogic_prometheus_spark.plans import register
from numalogic_prometheus_spark.sources.tables import load_table

_SALT = 8


@register(
    "join_salted_skew",
    oracle="""
    SELECT o.o_orderpriority,
           count(*)::BIGINT AS n_items,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    """,
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted fact-fact equi-join: the probe side scatters each key over
    `_SALT` composite keys (deterministic salt from l_linenumber so the
    result is reproducible); the build side replicates each row across
    all salts via a posexplode — a hot orderkey's rows now land on 8
    partitions instead of 1. The aggregate result must equal the plain
    join bit-for-bit (salting is physical, not logical)."""
    li = load_table(spark, sf_dir, "lineitem").withColumn(
        "salt", (F.col("l_linenumber") % _SALT).cast("int")
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderpriority")
        .withColumn("salt", F.explode(F.sequence(F.lit(0), F.lit(_SALT - 1))))
        .withColumn("salt", F.col("salt").cast("int"))
    )
    return (
        li.join(o, (li.l_orderkey == o.o_orderkey) & (li.salt == o.salt))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
        )
    )


@register("multimodal_frame_sample")  # mapInPandas 1→N expansion → rows-only
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over the synthesized binary-asset relation: every
    4th fixed-size frame of each video payload becomes a row (index,
    offset, size, checksum) — the map-only 1→N demux expansion, joined
    back to nothing, shuffled nowhere."""
    d = load_table(spark, sf_dir, "documents")
    assets = synthesize_assets(d, "doc_id", "text")
    return frame_sample(assets, frame_size=32, every=4)
