"""HTTP serving seam for the exposition sink (A10 end-to-end).

The reference serves its registry over HTTP from the pipeline process
(reference numaprom/monitoring/__init__.py:16-24, start_metrics_server).
Spark-first, the scrape payload is a tiny per-batch aggregate, so the
serving seam is: foreachBatch renders the exposition lines (a few hundred
bytes — the heavy aggregation already happened inside the micro-batch
plan) and swaps them into an atomic snapshot that a stdlib HTTP handler
serves at ``/metrics``.

Scale posture: the HTTP server runs on the DRIVER and serves only the
final rendered text — never data-plane rows. The collect() inside the
batch hook is bounded by the number of label combinations (the aggregate
output), not the corpus; at 100 TB the micro-batch plan still does the
distributed work and this seam only publishes the scrape-sized result.
"""

from __future__ import annotations

import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from pyspark.sql import DataFrame


class ExpositionServer:
    """Atomic snapshot of exposition lines + the /metrics HTTP endpoint."""

    def __init__(self, host: str = "127.0.0.1", port: int = 0) -> None:
        self._payload = b"# no scrape yet\n"
        self._lock = threading.Lock()
        snapshot = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *args):  # quiet
                pass

            def do_GET(self):
                if self.path != "/metrics":
                    self.send_response(404)
                    self.end_headers()
                    return
                body = snapshot.payload()
                self.send_response(200)
                self.send_header(
                    "Content-Type", "text/plain; version=0.0.4; charset=utf-8"
                )
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

        self._server = ThreadingHTTPServer((host, port), Handler)
        self._thread = threading.Thread(
            target=self._server.serve_forever, daemon=True
        )

    # -- lifecycle ---------------------------------------------------------
    def start(self) -> "ExpositionServer":
        self._thread.start()
        return self

    def stop(self) -> None:
        self._server.shutdown()

    @property
    def url(self) -> str:
        host, port = self._server.server_address
        return f"http://{host}:{port}/metrics"

    # -- snapshot ----------------------------------------------------------
    def payload(self) -> bytes:
        with self._lock:
            return self._payload

    def publish(self, lines: list[str]) -> None:
        body = ("\n".join(lines) + "\n").encode("utf-8")
        with self._lock:
            self._payload = body

    # -- streaming hook ----------------------------------------------------
    def foreach_batch(self, render):
        """Build a foreachBatch hook: ``render(batch_df) -> DataFrame`` must
        return a one-column ``line`` relation (e.g. exposition_lines over a
        per-batch aggregate); each batch atomically replaces the scrape."""

        def hook(batch_df: DataFrame, epoch_id: int) -> None:
            lines_df = render(batch_df)
            self.publish(
                sorted(r["line"] for r in lines_df.collect())
            )

        return hook
