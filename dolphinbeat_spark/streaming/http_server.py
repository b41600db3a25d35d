"""HTTP control surface (reference M1, ``cmd/dolphinbeat/http.go:30-54``).

Stdlib-only server exposing the same routes the reference serves:

- ``GET /status``                 — pipeline counters + registry version
- ``GET /schema``                 — all live (db, table) pairs
- ``GET /schema/{db}``            — tables of one database
- ``GET /schema/{db}/{table}``    — full TableDef (``?version=N`` for a
  historical version — the versioned registry's superpower; the
  reference can only serve "current")
- ``GET /ddl/failed``             — dead-lettered DDL (reference C5)
- ``POST /ddl/retry``             — re-apply every dead letter; the ones
  that now parse leave the queue
- ``POST /ddl/exec``              — apply a statement directly
  (body: ``{"statement": "...", "db": "..."}``)

- ``GET /metrics``                — Prometheus text exposition
  (reference serves promhttp at ``http.go:38``; counter families from
  ``metrics.go:21-51``, with each family counting its OWN op class —
  the reference's iud/ddl counters all read TrxCount, a bug)
- ``GET /debug/pprof/``           — profile index (pprof analog)
- ``GET /debug/pprof/cmdline``    — process argv
- ``GET /debug/pprof/goroutine``  — all Python thread stacks (the
  goroutine-dump analog, via ``sys._current_frames``)
- pprof's CPU ``profile``/``trace``/``symbol`` return 501 with a
  pointer to the Spark UI — executor-side profiling belongs to Spark.

Threaded + daemonized: ``serve()`` returns the bound port (pass
``port=0`` for an ephemeral one in tests) and never blocks the driver.
"""

from __future__ import annotations

import json
import re
import threading
from dataclasses import asdict
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from dolphinbeat_spark.schema.registry import DdlError, SchemaRegistry


class ControlServer:
    def __init__(
        self,
        registry: SchemaRegistry | None = None,
        metrics=None,
        dead_letters: list | None = None,
        host: str = "127.0.0.1",
        port: int = 8080,
    ) -> None:
        self.registry = registry or SchemaRegistry()
        self.metrics = metrics
        self.dead_letters = dead_letters if dead_letters is not None else []
        self._host, self._port = host, port
        self._httpd: ThreadingHTTPServer | None = None
        self._thread: threading.Thread | None = None

    # -- route logic (pure: returns (code, payload); str payloads are
    # served as text/plain, dict/list as JSON) ---------------------------
    def handle(self, method: str, path: str, body: bytes = b"") -> tuple[int, dict | list | str]:
        if method == "GET" and path == "/metrics":
            from dolphinbeat_spark.streaming.metrics import PipelineMetrics

            m = self.metrics if self.metrics is not None else PipelineMetrics()
            # dead-letter queue length feeds failed_ddl_total when the
            # pipeline didn't push explicit counter increments
            return 200, m.prometheus_text(
                fallback_failed_ddl=len(self.dead_letters)
            )
        if method == "GET" and path in ("/debug/pprof", "/debug/pprof/"):
            return 200, (
                "profiles:\ncmdline\ngoroutine\n\n"
                "profile/trace/symbol: 501 (use the Spark UI for "
                "executor-side profiling)\n"
            )
        if method == "GET" and path == "/debug/pprof/cmdline":
            import sys

            return 200, "\x00".join(sys.argv)
        if method == "GET" and path == "/debug/pprof/goroutine":
            import sys
            import traceback

            frames = sys._current_frames()
            parts = []
            for tid, frame in frames.items():
                parts.append(f"thread {tid}:\n" + "".join(traceback.format_stack(frame)))
            return 200, "\n".join(parts)
        if method == "GET" and path.startswith("/debug/pprof/"):
            return 501, {
                "error": "CPU profile/trace/symbol not served driver-side; "
                "use the Spark UI / spark.python.profile for executor profiling"
            }
        if method == "GET" and path == "/status":
            return 200, {
                "queries": self.metrics.status() if self.metrics else {},
                "registry_version": self.registry.version,
                "ddl_failed": len(self.dead_letters),
            }
        if method == "GET" and path == "/schema":
            return 200, {"tables": [list(t) for t in sorted(self.registry.tables())]}
        if method == "GET" and (m := re.fullmatch(r"/schema/([^/]+)", path)):
            db = m.group(1)
            tables = [t for d, t in self.registry.tables() if d == db]
            return 200, {"db": db, "tables": sorted(tables)}
        if method == "GET" and (m := re.fullmatch(r"/schema/([^/]+)/([^/?]+)(\?version=(\d+))?", path)):
            db, table, version = m.group(1), m.group(2), m.group(4)
            td = self.registry.get(db, table, int(version) if version else None)
            if td is None:
                return 404, {"error": f"no schema for {db}.{table}"}
            return 200, {
                "def": asdict(td),
                "spark_schema": td.spark_schema().simpleString(),
                "primary_key": td.primary_key(),
            }
        if method == "GET" and path == "/ddl/failed":
            return 200, {"failed": list(self.dead_letters)}
        if method == "POST" and path == "/ddl/retry":
            retried, still_failed = [], []
            for dl in self.dead_letters:
                try:
                    self.registry.apply_ddl(dl["statement"], default_db=dl.get("db", ""))
                    retried.append(dl["statement"])
                except DdlError as ex:
                    still_failed.append({**dl, "error": str(ex)})
            self.dead_letters[:] = still_failed
            return 200, {"retried": retried, "still_failed": len(still_failed)}
        if method == "POST" and path == "/ddl/exec":
            try:
                req = json.loads(body or b"{}")
                version = self.registry.apply_ddl(
                    req["statement"], default_db=req.get("db", "")
                )
                return 200, {"applied": True, "registry_version": version}
            except (DdlError, KeyError, json.JSONDecodeError) as ex:
                return 400, {"error": str(ex)}
        return 404, {"error": f"no route {method} {path}"}

    # -- stdlib server wiring -------------------------------------------
    def serve(self) -> int:
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def _respond(self, method: str) -> None:
                length = int(self.headers.get("Content-Length") or 0)
                body = self.rfile.read(length) if length else b""
                code, payload = outer.handle(method, self.path, body)
                if isinstance(payload, str):
                    data = payload.encode()
                    # the exposition-format version tag on /metrics only
                    ctype = (
                        "text/plain; version=0.0.4; charset=utf-8"
                        if self.path == "/metrics"
                        else "text/plain; charset=utf-8"
                    )
                else:
                    data = json.dumps(payload).encode()
                    ctype = "application/json"
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)

            def do_GET(self):  # noqa: N802 (stdlib API)
                self._respond("GET")

            def do_POST(self):  # noqa: N802
                self._respond("POST")

            def log_message(self, fmt, *args):  # quiet
                pass

        self._httpd = ThreadingHTTPServer((self._host, self._port), Handler)
        self._thread = threading.Thread(target=self._httpd.serve_forever, daemon=True)
        self._thread.start()
        return self._httpd.server_address[1]

    def stop(self) -> None:
        if self._httpd:
            self._httpd.shutdown()
            self._httpd.server_close()
