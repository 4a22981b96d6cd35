"""Prometheus HTTP exporter — parity with gasket-prometheus/src/lib.rs:51-77:
an HTTP endpoint rendering every tether's metric readings as
``metric{stage="name"} value`` lines.
"""

from __future__ import annotations

import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

from gasket_rs_spark.pipeline.metrics import render_prometheus
from gasket_rs_spark.pipeline.runtime import Daemon


class PrometheusExporter:
    """Serve a Daemon's metrics over HTTP. ``port=0`` picks a free port
    (exposed as ``.port`` after start)."""

    def __init__(self, daemon: Daemon, host: str = "127.0.0.1", port: int = 0):
        self.daemon = daemon
        exporter = self

        class Handler(BaseHTTPRequestHandler):
            def do_GET(self):  # noqa: N802 — http.server API
                body = render_prometheus(exporter.daemon.read_all_metrics()).encode()
                self.send_response(200)
                self.send_header("Content-Type", "text/plain; version=0.0.4")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def log_message(self, *args):  # silence per-request stderr noise
                return

        self._server = HTTPServer((host, port), Handler)
        self.port = self._server.server_address[1]
        self._thread: threading.Thread | None = None

    def start(self) -> "PrometheusExporter":
        self._thread = threading.Thread(target=self._server.serve_forever, daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        self._server.shutdown()
        self._server.server_close()
        if self._thread is not None:
            self._thread.join(timeout=2.0)
