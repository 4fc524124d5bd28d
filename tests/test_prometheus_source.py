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
