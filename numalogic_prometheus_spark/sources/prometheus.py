"""Prometheus range-query fetch source (B1 as a real source).

The reference gained a "Prometheus Query Service" fetch stage
(reference CHANGELOG.md:10 #168, :90) that pulls a PromQL range query and
feeds the pipeline. Spark-first, that is a Spark 4 Python DataSource: the
driver plans one partition per time slice, each executor task issues its
own ``GET /api/v1/query_range`` for its slice and yields the canonical
samples relation — so a month-long backfill fans out across the cluster
instead of funneling through one HTTP loop.

Scale posture:
- Partitioning is BY TIME RANGE (``partitions`` option): each task fetches
  an equal slice of [start, end). At 100 TB-scale backfills the slice
  count is set to executor parallelism; Prometheus-side sharding (one
  source per tenant/shard URL) composes on top with ``unionByName``.
- The emitted relation is the engine's canonical samples shape
  (name, labels map, ts, value) — every downstream discipline operator
  (operators/metrics.py) consumes it unchanged.
- Errors surface per-task with the offending URL; a retry budget guards
  transient 5xx (exponential backoff, bounded).

Uses only the Python stdlib (urllib) — no extra dependencies.
"""

from __future__ import annotations

import json
import time
import urllib.error
import urllib.parse
import urllib.request
from dataclasses import dataclass
from datetime import datetime, timezone

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

SCHEMA = "name string, labels map<string,string>, ts timestamp, value double"


@dataclass
class _Slice(InputPartition):
    start: float
    end: float


def _fetch_json(
    url: str,
    retries: int = 3,
    backoff: float = 0.5,
    headers: dict[str, str] | None = None,
) -> dict:
    last: Exception | None = None
    for attempt in range(retries):
        try:
            req = urllib.request.Request(url, headers=headers or {})
            with urllib.request.urlopen(req, timeout=30) as resp:
                return json.loads(resp.read().decode("utf-8"))
        except urllib.error.HTTPError as exc:
            # 4xx is NOT transient: a bad token / malformed query will
            # 4xx on every attempt, so retrying burns the backoff budget
            # per slice per task and buries the real cause (ADVICE r8).
            if 400 <= exc.code < 500:
                raise RuntimeError(
                    f"prometheus fetch failed (HTTP {exc.code}, not "
                    f"retried — client error): {url}"
                ) from exc
            last = exc  # 5xx: server-side, worth the bounded retry
            if attempt + 1 < retries:
                time.sleep(backoff * (2**attempt))
        except Exception as exc:  # URLError/timeout: transient, retry
            last = exc
            if attempt + 1 < retries:
                time.sleep(backoff * (2**attempt))
    raise RuntimeError(f"prometheus fetch failed after {retries} tries: {url}") from last


_STEP_UNITS = {"ms": 0.001, "s": 1.0, "m": 60.0, "h": 3600.0, "d": 86400.0}


def _step_seconds(step: str) -> float:
    """Prometheus duration ('30s', '1m', '1h', bare seconds) → seconds."""
    s = str(step).strip()
    for suffix, mult in sorted(_STEP_UNITS.items(), key=lambda kv: -len(kv[0])):
        if s.endswith(suffix):
            return float(s[: -len(suffix)]) * mult
    return float(s)


def _parse_ts(v: str | float) -> float:
    """Accept unix seconds or RFC3339 (both are valid Prometheus API forms)."""
    if isinstance(v, (int, float)):
        return float(v)
    s = str(v)
    try:
        return float(s)
    except ValueError:
        return datetime.fromisoformat(s.replace("Z", "+00:00")).timestamp()


class PrometheusScanReader(DataSourceReader):
    def __init__(self, options: dict[str, str]) -> None:
        self.url = options["url"].rstrip("/")
        self.query = options["query"]
        self.start = _parse_ts(options["start"])
        self.end = _parse_ts(options["end"])
        self.step = options.get("step", "60s")
        self.n_partitions = int(options.get("partitions", "8"))
        # auth: a bearer token (Prometheus behind an auth proxy / Cortex /
        # Thanos gateway — the common production posture) or a raw
        # Authorization header value. Shipped to every executor task with
        # the reader; stdlib-only, no dependency.
        self.headers: dict[str, str] = {}
        token = options.get("token")
        if token:
            self.headers["Authorization"] = f"Bearer {token}"
        auth_header = options.get("authorization")
        if auth_header:
            self.headers["Authorization"] = auth_header
        if self.end <= self.start:
            raise ValueError("prometheus source: end must be after start")

    def partitions(self) -> list[_Slice]:
        """Slices aligned to the step grid so the union of per-slice
        query_range responses reproduces EXACTLY the tick set of one
        un-sliced query. query_range evaluates at start + k*step for
        k = 0..floor((end-start)/step); naive equal-width slices restart
        the grid at each slice start (shifted/duplicate ticks unless the
        width divides the step). Instead the global ticks are split into
        contiguous runs and each slice's start/end are both ticks — both
        endpoints inclusive, no tick shared between adjacent slices."""
        step = _step_seconds(self.step)
        n_ticks = int((self.end - self.start) / step) + 1
        n_parts = max(1, min(self.n_partitions, n_ticks))
        out = []
        for i in range(n_parts):
            first = i * n_ticks // n_parts
            last = (i + 1) * n_ticks // n_parts - 1  # inclusive
            out.append(
                _Slice(self.start + first * step, self.start + last * step)
            )
        return out

    def read(self, partition: _Slice):
        # Slice endpoints are both on the global tick grid and inclusive;
        # query_range(start=end=tick) returns exactly that one evaluation.
        yield from _fetch_slice(
            self.url,
            self.query,
            partition.start,
            partition.end,
            self.step,
            self.headers,
        )


def _fetch_slice(
    url: str,
    query: str,
    start: float,
    end: float,
    step: str,
    headers: dict[str, str],
):
    """One query_range fetch → canonical sample tuples. Shared by the
    batch slices and the streaming micro-batches so grid semantics
    cannot drift between the two read paths."""
    params = urllib.parse.urlencode(
        {
            "query": query,
            "start": f"{start:.3f}",
            "end": f"{end:.3f}",
            "step": step,
        }
    )
    payload = _fetch_json(f"{url}/api/v1/query_range?{params}", headers=headers)
    if payload.get("status") != "success":
        raise RuntimeError(f"prometheus error response: {payload}")
    for series in payload.get("data", {}).get("result", []):
        metric = dict(series.get("metric", {}))
        name = metric.pop("__name__", query)
        for ts_s, val_s in series.get("values", []):
            yield (
                name,
                metric,
                datetime.fromtimestamp(float(ts_s), tz=timezone.utc),
                float(val_s),
            )


class PrometheusStreamReader(SimpleDataSourceStreamReader):
    """Continuous tail-read of a PromQL range query (VERDICT r8 #4):
    ``spark.readStream.format("prometheus")``.

    The offset is the INDEX of the last fetched tick on the grid
    ``start + k*step`` (an integer — no float accumulation across
    batches), so consecutive micro-batches cover contiguous, disjoint
    tick runs: batch N fetches (tick[k_N-1], tick[k_N]] exactly, the
    same exactness property the batch source's slice planner has
    (test_partition_slices_reproduce_global_tick_grid; the streaming
    twin is test_stream_batches_tile_tick_grid). Catch-up after a long
    stop is bounded by ``max_ticks_per_batch`` per micro-batch, and the
    reader never advances past wall-clock − ``lag`` (scrape-settling
    margin), so a live tail emits empty batches instead of re-reading
    or skipping ticks.
    """

    def __init__(self, options: dict[str, str]) -> None:
        self.url = options["url"].rstrip("/")
        self.query = options["query"]
        self.step = options.get("step", "60s")
        self.step_s = _step_seconds(self.step)
        self.anchor = _parse_ts(options.get("start", time.time()))
        self.max_ticks = int(options.get("max_ticks_per_batch", "600"))
        self.lag = float(options.get("lag", "0"))
        self.headers: dict[str, str] = {}
        token = options.get("token")
        if token:
            self.headers["Authorization"] = f"Bearer {token}"
        auth_header = options.get("authorization")
        if auth_header:
            self.headers["Authorization"] = auth_header

    def initialOffset(self) -> dict:
        # k = -1: nothing fetched yet; the first batch starts at tick 0
        # (= the `start` option), matching the batch source's convention
        # that `start` itself is the first evaluation. The resolved grid
        # anchor and step ride IN the offset: on checkpoint restart Spark
        # rebuilds the reader (a default `start` would resolve to a NEW
        # wall-clock anchor), and the persisted pair keeps the stored k
        # mapping to the same ticks — the disjoint-tiling and
        # readBetweenOffsets replay-determinism guarantees survive
        # restarts.
        return {"k": -1, "anchor": self.anchor, "step_s": self.step_s}

    def _grid(self, offset: dict) -> tuple[float, float]:
        # Prefer the offset's persisted grid over the (possibly
        # re-resolved) constructor options; legacy offsets without the
        # fields fall back to the constructor grid.
        return (
            float(offset.get("anchor", self.anchor)),
            float(offset.get("step_s", self.step_s)),
        )

    def read(self, start: dict):
        anchor, step_s = self._grid(start)
        k0 = int(start["k"])
        k_wall = int((time.time() - self.lag - anchor) // step_s)
        k1 = min(k_wall, k0 + self.max_ticks)
        nxt = {"k": max(k1, k0), "anchor": anchor, "step_s": step_s}
        if k1 <= k0:
            return [], nxt  # nothing new on the grid yet
        # materialized (not a generator): Spark pickles the prefetched
        # batch into the block manager for executor replay
        rows = list(
            _fetch_slice(
                self.url,
                self.query,
                anchor + (k0 + 1) * step_s,
                anchor + k1 * step_s,
                # resolution derives from the offset grid, not the
                # constructor: a restart with a different `step` option
                # must keep fetching at the persisted grid's resolution
                # or tick slices would contain misaligned samples.
                # BARE float seconds — the other form Prometheus's
                # parseDuration accepts; a "{x}s" suffix string is only
                # valid for integer x (review r11: "0.5s"/"1.2096e+06s"
                # are 400s)
                str(step_s),
                self.headers,
            )
        )
        return rows, nxt

    def readBetweenOffsets(self, start: dict, end: dict):
        # Replay after a failure: the same (start, end] tick run the
        # original read() covered — grid determinism makes the fetch
        # idempotent against an unchanged TSDB. The grid comes from the
        # offsets themselves, so replay is exact even when the reader was
        # reconstructed with different/default options.
        anchor, step_s = self._grid(start)
        k0, k1 = int(start["k"]), int(end["k"])
        if k1 <= k0:
            return []
        return list(
            _fetch_slice(
                self.url,
                self.query,
                anchor + (k0 + 1) * step_s,
                anchor + k1 * step_s,
                str(step_s),  # grid resolution (bare seconds), as read()
                self.headers,
            )
        )

    def commit(self, end: dict) -> None:
        pass  # offsets live in Spark's checkpoint; nothing server-side


class PrometheusDataSource(DataSource):
    """``spark.read.format("prometheus")`` — range query → samples relation.

    Options: url (server base), query (PromQL), start/end (unix seconds or
    RFC3339), step (default 60s), partitions (time slices, default 8),
    token (bearer token) / authorization (raw Authorization header value).

    ``spark.readStream.format("prometheus")`` tails the same query from
    ``start`` (default: now): extra options max_ticks_per_batch (catch-up
    bound, default 600) and lag (seconds to stay behind wall clock).

    Auth caveat: `token`/`authorization` ride plain DataSource options,
    which Spark may surface in the UI / plan descriptions — inject
    short-lived tokens from a secret manager at session build time rather
    than hard-coding long-lived credentials in job code.
    """

    @classmethod
    def name(cls) -> str:
        return "prometheus"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> PrometheusScanReader:
        return PrometheusScanReader(self.options)

    def simpleStreamReader(self, schema) -> PrometheusStreamReader:
        return PrometheusStreamReader(self.options)


def register_prometheus_source(spark) -> None:
    spark.dataSource.register(PrometheusDataSource)
