"""PromQL read-side operators, round 3: vector-matching binary ops
(`on`/`ignoring`, `group_left`) and the `*_over_time` aggregation family
(VERDICT r2 missing #2/#3). The reference delegates PromQL evaluation to
the Prometheus Query Service (reference CHANGELOG.md:10 #168); this
engine owns those semantics, so the binary-op matcher is expressed as a
label-set-matched join over the canonical samples relation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from numalogic_prometheus_spark.plans import register
from numalogic_prometheus_spark.sources.tables import load_table
