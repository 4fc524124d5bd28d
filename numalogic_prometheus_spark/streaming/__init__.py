"""Structured Streaming layer (SURVEY.md §7 step 5).

The reference's deployment is a Numaflow streaming pipeline
(changelog-evidenced, SURVEY.md §0); here the same queries run under
Structured Streaming: file/rate sources, watermarks, tumbling/sliding/
session windows, streaming dedup (B3), stream-static joins (B12 model
lookup), foreachBatch sinks (A10 exposition / B11 train sink), and an
``applyInPandasWithState`` stateful seam (B5 stateful scalers).
"""

from numalogic_prometheus_spark.streaming.runner import (
    run_stream_to_memory,
    stream_events,
)

__all__ = ["run_stream_to_memory", "stream_events"]
