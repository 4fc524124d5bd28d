"""Declarative metric specs → discipline transforms (the reference's "DDL"
path, SURVEY.md §3.1).

Mirrors the reference's config shape — PromMetric {name, description,
static_labels_pair, labels_pair} and PromMetricList {type, metrics}
(reference numaprom/monitoring/config.py:4-15) — and its string-typed
factory dispatch with ValueError on unknown type (reference
numaprom/monitoring/utility.py:28-55, error at :55).

Instead of instantiating mutable collector objects, `build_metric_query`
returns the discipline *transform* for the spec: the Spark-native
equivalent of registration is materializing the discipline query as a
temp view in the session catalog (SURVEY.md §1.2: registry ≙ catalog).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame

from numalogic_prometheus_spark.operators import metrics as M

METRIC_TYPES = ("counter", "gauge", "summary", "histogram", "info")


@dataclass(frozen=True)
class MetricSpec:
    """One metric family declaration (≙ PromMetric, config.py:4-9)."""

    metric_type: str
    name: str
    description: str = ""
    label_keys: tuple[str, ...] = field(default_factory=tuple)
    static_labels: dict[str, str] = field(default_factory=dict)

    def __post_init__(self) -> None:
        if self.metric_type not in METRIC_TYPES:
            # parity with utility.py:55: unknown type is a hard error
            raise ValueError(f"Unknown metric type: {self.metric_type}")


def parse_spec(raw: dict) -> MetricSpec:
    """dict/omegaconf-shaped config → MetricSpec (≙ BaseMetric.__init__'s
    DictConfig→dict normalization, metrics.py:27)."""
    return MetricSpec(
        metric_type=str(raw["type"]),
        name=str(raw["name"]),
        description=str(raw.get("description", "")),
        label_keys=tuple(raw.get("label_keys", ())),
        static_labels=dict(raw.get("static_labels_pair", {}) or {}),
    )


def build_metric_query(
    spec: MetricSpec, samples: DataFrame, value: str = "value", ts: str = "ts"
) -> DataFrame:
    """Dispatch spec → discipline transform (≙ get_metric's type dispatch,
    utility.py:45-54). Label keys become group-by columns."""
    keys = list(spec.label_keys)
    if spec.metric_type == "counter":
        return M.counter(samples, keys, value)
    if spec.metric_type == "gauge":
        return M.gauge_latest(samples, keys, value, ts)
    if spec.metric_type == "summary":
        return M.summary(samples, keys, value)
    if spec.metric_type == "histogram":
        return M.histogram_buckets(samples, keys, value)
    if spec.metric_type == "info":
        return M.info_latest(samples, keys, value, ts)
    raise ValueError(f"Unknown metric type: {spec.metric_type}")  # unreachable


def register_metric(
    spec: MetricSpec, samples: DataFrame, view_prefix: str = "metric_"
) -> DataFrame:
    """Materialize the discipline query in the session catalog — the
    Spark-native analog of prometheus-client's global REGISTRY
    (metrics.py:62 etc.; SURVEY.md §1.2 registry ≙ catalog)."""
    out = build_metric_query(spec, samples)
    out.createOrReplaceTempView(f"{view_prefix}{spec.name}")
    return out
