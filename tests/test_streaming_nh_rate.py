"""stream_native_histogram_rate (plans/streaming2.py; VERDICT r10 #4):
the streaming twin must reproduce the batch native-histogram rate
EXACTLY — same rows, same bit-identical doubles — on replayed testdata,
across multiple micro-batches, and across a kill + checkpoint restart.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from numalogic_prometheus_spark.plans import all_queries

QUERIES = all_queries()


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_stream_matches_batch_exactly(spark, sf_dir):
    """Unified-model guarantee at histogram grain: driving the file
    stream to completion yields the batch entry's exact result."""
    stream = QUERIES["stream_native_histogram_rate"](spark, sf_dir)
    batch = QUERIES["promql_native_histogram_rate"](spark, sf_dir)
    s, b = _rows(stream), _rows(batch)
    assert len(s) > 0
    assert s == b


def _split_events(spark, sf_dir, out_dir: str, n_files: int = 3) -> None:
    """Re-lay events as n time-ordered FLAT part files (chunk_0.parquet,
    chunk_1.parquet, …) so maxFilesPerTrigger=1 replays them as n
    micro-batches in scrape order (the per-key in-order contract a
    series-partitioned Kafka source provides). Timestamps go through
    load_table first so the chunks carry canonical µs timestamps, not
    the raw TIMESTAMP(NANOS) encoding."""
    import glob
    import os
    import shutil
    import time

    from numalogic_prometheus_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").orderBy("ts", "event_id")
    chunks = ev.collect()
    schema = ev.schema
    per = (len(chunks) + n_files - 1) // n_files
    dest = f"{out_dir}/events.parquet"
    os.makedirs(dest, exist_ok=True)
    for i in range(n_files):
        part = chunks[i * per : (i + 1) * per]
        if not part:
            continue
        staged = f"{out_dir}/_stage_{i}"
        spark.createDataFrame(part, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(staged)
        (src,) = glob.glob(f"{staged}/part-*.parquet")
        shutil.move(src, f"{dest}/chunk_{i}.parquet")
        shutil.rmtree(staged)
        time.sleep(0.05)  # distinct modTimes keep source order stable


def test_multibatch_chaining_matches_batch(spark, tmp_path):
    """State chains across micro-batches: three time-split files
    replayed one per trigger must still equal the batch result over the
    union — cumulative counters, epoch resets and prev/reset flags all
    survive the batch boundaries."""
    sf_small = "/root/testdata/sf0.001"
    _split_events(spark, sf_small, str(tmp_path))
    stream = QUERIES["stream_native_histogram_rate"](spark, str(tmp_path))
    batch = QUERIES["promql_native_histogram_rate"](spark, str(tmp_path))
    s, b = _rows(stream), _rows(batch)
    assert len(s) > 0
    assert s == b


def test_kill_restart_determinism(spark, tmp_path):
    """Kill + resume from checkpoint: a second query started from the
    SAME checkpoint restores the per-series bucket arrays (not
    recompute-from-scratch), and the union of appended outputs across
    the restart still finalizes to the batch entry's exact result."""
    from numalogic_prometheus_spark.plans.promql7 import (
        _BOUNDS,
        _LO,
        _nh_deltas_from_cum,
        _nh_rate_finalize,
    )
    from numalogic_prometheus_spark.streaming.nh_rate import (
        stateful_nh_bucket_cums,
    )

    sf_small = "/root/testdata/sf0.001"
    data = str(tmp_path / "data")
    ckpt = str(tmp_path / "ckpt")
    _split_events(spark, sf_small, data)
    src = f"{data}/events.parquet"
    schema = spark.read.parquet(src).schema
    emitted: list = []

    def run_once(path_glob: str) -> None:
        def capture(batch_df, epoch_id: int) -> None:
            emitted.extend(batch_df.collect())

        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .option("pathGlobFilter", path_glob)
            .parquet(src)
        )
        from numalogic_prometheus_spark.sources.tables import (
            normalize_event_time,
        )

        stream = normalize_event_time(stream)
        ev = stream.filter(F.col("value") > 0)
        bounds = F.array(*[F.lit(b) for b in _BOUNDS])
        idx = F.lit(_LO) + F.size(
            F.filter(bounds, lambda b: b < F.col("value"))
        )
        obs = ev.select(
            "event_type",
            F.date_trunc("minute", "ts").alias("m"),
            idx.alias("idx"),
        )
        out = stateful_nh_bucket_cums(obs.groupBy("event_type"))
        q = (
            out.writeStream.outputMode("append")
            .foreachBatch(capture)
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    # first run sees only chunk 0; the glob widens on restart so the
    # checkpoint's file log replays nothing and picks up chunks 1-2
    run_once("chunk_0.parquet")
    n_first = len(emitted)
    assert n_first > 0
    run_once("*")
    assert len(emitted) > n_first

    cum = spark.createDataFrame(
        emitted,
        "event_type string, m timestamp, idx long, c long,"
        " prev_c long, reset integer",
    )
    got = _rows(_nh_rate_finalize(_nh_deltas_from_cum(cum)))
    want = _rows(QUERIES["promql_native_histogram_rate"](spark, data))
    assert got == want
