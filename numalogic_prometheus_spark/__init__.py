"""numalogic_prometheus_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of
``numaproj/numalogic-prometheus`` (the reference, an in-process Prometheus
metrics library + changelog-evidenced Numaflow anomaly-detection pipeline),
re-expressed Spark-first:

- the five metric disciplines (counter / gauge / summary / histogram / info,
  reference ``numaprom/monitoring/metrics.py``) become aggregation queries
  over a canonical samples relation (``sources.samples``);
- the changelog-evidenced pipeline stages (windowing, dedup, scalers,
  thresholding, ensemble/unified scoring) become composable DataFrame
  transforms (``operators``);
- read-side PromQL analogs (rate / increase / histogram_quantile / topk)
  are pure Spark SQL compositions (``operators.promql``);
- LLM-data-pipeline extensions (dedup, similarity search, text analysis,
  multimodal plumbing) live in ``operators.dedup`` / ``operators.similarity``
  / ``operators.text`` / ``operators.multimodal``.

Everything is DataFrame/SQL-first: Catalyst owns optimization, UDFs appear
only at the ML-inference seam (Arrow-batched ``applyInPandas``).
"""

__version__ = "0.1.0"
