"""Prometheus fetch DataSource tests (B1 source; reference CHANGELOG.md:10
#168 "Prometheus Query Service", :90).

A stdlib threaded HTTP server plays the Prometheus API: it answers
/api/v1/query_range with deterministic per-slice samples, records every
request, and lets the tests assert (a) the canonical samples schema,
(b) time-slice partitioning actually fans out into one request per
partition, and (c) slice boundaries don't double-fetch samples.
"""

from __future__ import annotations

import json
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from numalogic_prometheus_spark.sources.prometheus import (
    register_prometheus_source,
)

START = 1_700_000_000  # fixed epoch anchor
STEP = 60


class _FakeProm(BaseHTTPRequestHandler):
    requests: list[dict] = []

    def log_message(self, *args):  # silence
        pass

    def do_GET(self):
        parsed = urllib.parse.urlparse(self.path)
        qs = {k: v[0] for k, v in urllib.parse.parse_qs(parsed.query).items()}
        type(self).requests.append(qs)
        if parsed.path != "/api/v1/query_range":
            self.send_response(404)
            self.end_headers()
            return
        start, end = float(qs["start"]), float(qs["end"])
        # faithful to the real API: query_range evaluates at
        # start + k*step for k = 0..floor((end-start)/step) — the grid is
        # anchored at the REQUEST start, not a wall-clock boundary
        n = int((end - start) // STEP) + 1
        ticks = [int(start) + k * STEP for k in range(n)]
        result = [
            {
                "metric": {"__name__": "http_requests_total", "job": "api",
                           "instance": inst},
                "values": [[t, str(float(t % 1000))] for t in ticks],
            }
            for inst in ("a:9090", "b:9090")
        ]
        body = json.dumps(
            {"status": "success",
             "data": {"resultType": "matrix", "result": result}}
        ).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)


@pytest.fixture(scope="module")
def fake_prom():
    _FakeProm.requests = []
    server = ThreadingHTTPServer(("127.0.0.1", 0), _FakeProm)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{server.server_address[1]}"
    server.shutdown()


def test_prometheus_source_reads_canonical_samples(spark, fake_prom):
    register_prometheus_source(spark)
    n_parts = 4
    hours = 2
    df = (
        spark.read.format("prometheus")
        .option("url", fake_prom)
        .option("query", "http_requests_total")
        .option("start", str(START))
        .option("end", str(START + hours * 3600))
        .option("step", "60s")
        .option("partitions", str(n_parts))
        .load()
    )
    rows = df.collect()
    # schema is the canonical samples relation
    assert [f.name for f in df.schema.fields] == ["name", "labels", "ts", "value"]
    # Sliced fetch must reproduce EXACTLY the single-query tick set
    # (ADVICE r2): one un-sliced query_range evaluates at START + k*60
    # for k = 0..120 inclusive → 121 ticks per series, no tick fetched
    # twice, none shifted off-grid, the global-end tick included.
    assert len(rows) == 2 * 121
    assert len({(r["labels"]["instance"], r["ts"]) for r in rows}) == len(rows)
    got_ticks = sorted({r["ts"].timestamp() for r in rows})
    assert got_ticks == [float(START + k * STEP) for k in range(121)]
    sample = rows[0]
    assert sample["name"] == "http_requests_total"
    assert sample["labels"]["job"] == "api"
    assert isinstance(sample["value"], float)


def test_prometheus_source_fans_out_per_partition(spark, fake_prom):
    before = len(_FakeProm.requests)
    register_prometheus_source(spark)
    (
        spark.read.format("prometheus")
        .option("url", fake_prom)
        .option("query", "up")
        .option("start", str(START))
        .option("end", str(START + 3600))
        .option("partitions", "6")
        .load()
        .count()
    )
    new = _FakeProm.requests[before:]
    # one HTTP fetch per time-slice partition, each with a distinct start
    assert len(new) == 6
    assert len({q["start"] for q in new}) == 6


def test_prometheus_source_feeds_discipline_operators(spark, fake_prom):
    """The emitted relation plugs straight into the metric disciplines
    (operators/metrics.py) — the B1 → B2/§2A pipeline seam."""
    from pyspark.sql import functions as F

    from numalogic_prometheus_spark.operators import metrics as M

    register_prometheus_source(spark)
    df = (
        spark.read.format("prometheus")
        .option("url", fake_prom)
        .option("query", "http_requests_total")
        .option("start", str(START))
        .option("end", str(START + 3600))
        .option("partitions", "2")
        .load()
    )
    g = M.gauge_latest(
        df.withColumn("instance", F.col("labels")["instance"]),
        ["instance"],
    ).collect()
    assert len(g) == 2  # one series per instance label


class _AuthProm(_FakeProm):
    """Same fake API, but 401s any request without the expected bearer
    token — and fails the FIRST authorized request with a 500 so the
    bounded-retry path is exercised end-to-end."""

    requests: list[dict] = []
    expected = "Bearer sekret-token"
    fail_first = True

    def do_GET(self):
        if self.headers.get("Authorization") != type(self).expected:
            self.send_response(401)
            self.end_headers()
            return
        if type(self).fail_first:
            type(self).fail_first = False
            self.send_response(500)
            self.end_headers()
            return
        super().do_GET()


@pytest.fixture()
def auth_prom():
    _AuthProm.requests = []
    _AuthProm.fail_first = True
    server = ThreadingHTTPServer(("127.0.0.1", 0), _AuthProm)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{server.server_address[1]}"
    server.shutdown()


def test_prometheus_source_bearer_auth_and_retry(spark, auth_prom):
    """The `token` option must reach every executor task's request as an
    Authorization header (the auth-proxy / Cortex / Thanos posture), and
    a transient 5xx must be absorbed by the bounded retry — the read
    still returns the full sample set."""
    register_prometheus_source(spark)
    df = (
        spark.read.format("prometheus")
        .option("url", auth_prom)
        .option("query", "http_requests_total")
        .option("start", str(START))
        .option("end", str(START + 10 * STEP))
        .option("step", "60s")
        .option("partitions", "2")
        .option("token", "sekret-token")
        .load()
    )
    rows = df.collect()
    # 11 ticks × 2 instances, no tick double-fetched across slices
    assert len(rows) == 22
    assert not _AuthProm.fail_first  # the 500 was actually served


def test_prometheus_source_rejects_bad_token(spark, auth_prom):
    register_prometheus_source(spark)
    df = (
        spark.read.format("prometheus")
        .option("url", auth_prom)
        .option("query", "http_requests_total")
        .option("start", str(START))
        .option("end", str(START + STEP))
        .option("token", "wrong")
        .load()
    )
    with pytest.raises(Exception, match="fetch failed|401|HTTP"):
        df.collect()


def test_stream_batches_tile_tick_grid(fake_prom):
    """Streaming tail-read (VERDICT r8 #4): consecutive micro-batches
    must cover contiguous, DISJOINT runs of the tick grid — no tick
    fetched twice, none skipped — and an up-to-date reader must emit an
    empty batch rather than advance. Driver-level check against the
    fake server: two catch-up batches + one idle batch."""
    import time as _time

    from numalogic_prometheus_spark.sources.prometheus import (
        PrometheusStreamReader,
    )

    # anchor the grid 10 ticks behind wall clock so catch-up is bounded
    now = _time.time()
    anchor = (int(now) // STEP) * STEP - 9 * STEP
    reader = PrometheusStreamReader(
        {
            "url": fake_prom,
            "query": "http_requests_total",
            "start": str(anchor),
            "step": "60s",
            "max_ticks_per_batch": "4",
        }
    )
    off0 = reader.initialOffset()
    rows1, off1 = reader.read(off0)
    rows1 = list(rows1)
    rows2, off2 = reader.read(off1)
    rows2 = list(rows2)
    # batch 1 = ticks 0..3, batch 2 = ticks 4..7 (2 instances each)
    t1 = sorted({r[2].timestamp() for r in rows1})
    t2 = sorted({r[2].timestamp() for r in rows2})
    assert t1 == [float(anchor + k * STEP) for k in range(4)]
    assert t2 == [float(anchor + k * STEP) for k in range(4, 8)]
    grid = {"anchor": float(anchor), "step_s": float(STEP)}
    assert off1 == {"k": 3, **grid} and off2 == {"k": 7, **grid}
    assert len(rows1) == 8 and len(rows2) == 8  # 4 ticks × 2 instances
    # replay of batch 2 must reproduce it exactly (checkpoint recovery)
    replay = list(reader.readBetweenOffsets(off1, off2))
    key = lambda r: (r[1]["instance"], r[2])  # noqa: E731
    assert sorted(replay, key=key) == sorted(rows2, key=key)
    # drain to the wall-clock frontier, then the reader must idle
    off = off2
    for _ in range(10):
        rows, noff = reader.read(off)
        list(rows)
        if noff == off:
            break
        assert noff["k"] > off["k"]
        off = noff
    idle_rows, idle_off = reader.read(off)
    assert list(idle_rows) == [] and idle_off == off


def test_stream_restart_keeps_offset_grid(fake_prom):
    """Checkpoint-restart determinism: the tick grid (anchor, step) is
    persisted in every offset, so a RECONSTRUCTED reader — here with the
    default wall-clock `start`, i.e. a different constructor anchor —
    must keep reading the ORIGINAL grid from a stored offset, and
    readBetweenOffsets replay must be exact across the restart."""
    import time as _time

    from numalogic_prometheus_spark.sources.prometheus import (
        PrometheusStreamReader,
    )

    now = _time.time()
    anchor = (int(now) // STEP) * STEP - 9 * STEP
    opts = {
        "url": fake_prom,
        "query": "http_requests_total",
        "step": "60s",
        "max_ticks_per_batch": "4",
    }
    first = PrometheusStreamReader({**opts, "start": str(anchor)})
    off0 = first.initialOffset()
    rows1, off1 = first.read(off0)
    rows1 = list(rows1)
    assert off1["anchor"] == float(anchor)

    # "restart": new reader, NO start option → constructor anchor is a
    # fresh wall-clock time, different from the original grid
    restarted = PrometheusStreamReader(dict(opts))
    assert restarted.anchor != float(anchor)
    rows2, off2 = restarted.read(off1)
    rows2 = list(rows2)
    # batch 2 continues the ORIGINAL grid: ticks 4..7, and the grid
    # fields survive into the next offset
    t2 = sorted({r[2].timestamp() for r in rows2})
    assert t2 == [float(anchor + k * STEP) for k in range(4, 8)]
    assert off2["anchor"] == float(anchor) and off2["step_s"] == float(STEP)
    # replay across the restart is exact
    replay = list(restarted.readBetweenOffsets(off1, off2))
    key = lambda r: (r[1]["instance"], r[2])  # noqa: E731
    assert sorted(replay, key=key) == sorted(rows2, key=key)
    # legacy offsets (pre-grid checkpoints) still work: constructor grid
    legacy = PrometheusStreamReader({**opts, "start": str(anchor)})
    rows_legacy, off_legacy = legacy.read({"k": 3})
    t_legacy = sorted({r[2].timestamp() for r in list(rows_legacy)})
    assert t_legacy == [float(anchor + k * STEP) for k in range(4, 8)]
    assert off_legacy["anchor"] == float(anchor)

    # a restart with a DIFFERENT `step` option must fetch at the
    # PERSISTED grid's resolution: the query_range `step` parameter is
    # derived from the offset (60s), not the new constructor option —
    # otherwise tick slices would contain 15s-resolution samples and
    # replay/tiling exactness would break
    from tests.test_prometheus_source import _FakeProm  # request log

    other_step = PrometheusStreamReader({**opts, "step": "15s"})
    n_before = len(_FakeProm.requests)
    rows3, off3 = other_step.read(off1)
    t3 = sorted({r[2].timestamp() for r in list(rows3)})
    assert t3 == [float(anchor + k * STEP) for k in range(4, 8)]
    # the fetch resolution is the GRID's 60 s, sent as bare float
    # seconds (valid for any step; "{x}s" would be invalid for
    # sub-second or >=1e6-second grids)
    fetches = _FakeProm.requests[n_before:]
    assert fetches and all(float(q["step"]) == 60.0 for q in fetches)
    assert off3["step_s"] == float(STEP)
    replay3 = list(other_step.readBetweenOffsets(off1, off3))
    n_mid = len(_FakeProm.requests)
    assert all(
        float(q["step"]) == 60.0
        for q in _FakeProm.requests[n_before:n_mid]
    )
    assert sorted(replay3, key=key) == sorted(list(rows3), key=key)


def test_stream_end_to_end_memory_sink(spark, fake_prom):
    """readStream → memory sink with availableNow: the full Structured
    Streaming path (offsets through Spark's checkpoint, the canonical
    samples schema) delivers every grid tick exactly once."""
    import time as _time

    register_prometheus_source(spark)
    now = _time.time()
    anchor = (int(now) // STEP) * STEP - 9 * STEP
    q = (
        spark.readStream.format("prometheus")
        .option("url", fake_prom)
        .option("query", "http_requests_total")
        .option("start", str(anchor))
        .option("step", "60s")
        .option("max_ticks_per_batch", "4")
        .load()
        .writeStream.format("memory")
        .queryName("prom_tail")
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    try:
        # poll until ≥3 micro-batches have tiled the 10 anchored ticks
        deadline = _time.time() + 60
        while _time.time() < deadline:
            if spark.sql("SELECT * FROM prom_tail").count() >= 10 * 2:
                break
            _time.sleep(0.5)
        rows = spark.sql("SELECT * FROM prom_tail").collect()
    finally:
        q.stop()
    n_ticks = int((_time.time() - anchor) // STEP) + 1
    # the 10 anchored ticks × 2 instances arrived; no (instance, ts) dup
    assert len(rows) >= 10 * 2
    assert len(rows) <= (n_ticks + 1) * 2
    assert len({(r["labels"]["instance"], r["ts"]) for r in rows}) == len(rows)
    got = sorted({r["ts"].timestamp() for r in rows})
    assert got[:10] == [float(anchor + k * STEP) for k in range(10)]
    # contiguous grid — no gaps between consecutive fetched ticks
    assert all(b - a == STEP for a, b in zip(got, got[1:]))


def test_partition_slices_reproduce_global_tick_grid():
    """Pure-planner property: for arbitrary (duration, step, partition
    count), the union of per-slice query_range tick sets must equal the
    single-query tick set exactly — no duplicate, shifted, or dropped
    ticks. This is the invariant that makes the fan-out semantically
    invisible."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from numalogic_prometheus_spark.sources.prometheus import (
        PrometheusScanReader,
        _step_seconds,
    )

    @given(
        n_steps=st.integers(min_value=0, max_value=500),
        step=st.sampled_from(["15s", "60s", "5m", "1h"]),
        parts=st.integers(min_value=1, max_value=32),
    )
    @settings(max_examples=200, deadline=None)
    def check(n_steps, step, parts):
        s = _step_seconds(step)
        reader = PrometheusScanReader(
            {
                "url": "http://x",
                "query": "q",
                "start": str(START),
                "end": str(START + n_steps * s + s / 2),
                "step": step,
                "partitions": str(parts),
            }
        )
        global_ticks = [START + k * s for k in range(n_steps + 1)]
        got: list[float] = []
        for sl in reader.partitions():
            k = 0
            while sl.start + k * s <= sl.end + 1e-9:
                got.append(sl.start + k * s)
                k += 1
        assert sorted(got) == pytest.approx(global_ticks)

    check()


def test_stream_subsecond_and_huge_steps_send_valid_wire_format(fake_prom):
    """r11 review class: the grid-derived fetch step must be a VALID
    Prometheus step value for ANY grid. Duration-suffix strings are
    integer-per-unit, so '0.5s' (500ms grid) and '1.2096e+06s' (14-day
    grid, %g scientific form) are both 400s on a real server — the
    reader must send bare float seconds instead."""
    import time as _time

    from numalogic_prometheus_spark.sources.prometheus import (
        PrometheusStreamReader,
    )

    for step_opt, step_s in (("500ms", 0.5), ("14d", 1_209_600.0)):
        reader = PrometheusStreamReader(
            {
                "url": fake_prom,
                "query": "up",
                "step": step_opt,
                "start": str(_time.time() - 10 * step_s),
                "max_ticks_per_batch": "2",
            }
        )
        n_before = len(_FakeProm.requests)
        rows, off = reader.read(reader.initialOffset())
        list(rows)
        sent = [q["step"] for q in _FakeProm.requests[n_before:]]
        assert sent, f"no fetch issued for step {step_opt}"
        for s in sent:
            # bare float seconds: parseable, no unit suffix, no
            # scientific notation surprises on the server side
            assert float(s) == step_s, (step_opt, s)
            assert s.replace(".", "").replace("-", "").isdigit(), s
