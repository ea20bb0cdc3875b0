"""Live metrics endpoint for a running pipeline.

Reference parity: ``/root/reference/internal/telemetry/metrics.go:10-15``
exposes an HTTP ``/metrics`` endpoint while a pipeline runs. Here the driver
(``engine/runner.py``) folds the per-partition metadata it already harvests
from worker actors into a small in-memory snapshot, and this module serves it
from a daemon thread — ``curl http://127.0.0.1:<port>/metrics`` during a run
returns rows in/out, watermark, live conversations and stage timings per
partition, plus the commit frontier.

Off by default. Enable with ``PipelineSpec.metrics_port`` (0 = pick an
ephemeral port, read it back from ``MetricsServer.port``) or the
``QUANTA_METRICS_PORT`` env var. The snapshot is O(partitions) scalars —
never row-proportional — so serving it costs the driver nothing at scale.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any

_TIME_KEYS = ("t_ingest", "t_emit", "t_write", "t_ckpt")


class MetricsServer:
    """Tiny thread-backed HTTP server over a mutable metrics snapshot.

    ``fold_partition`` accepts the per-partition metric dicts the workers
    return with each epoch (cumulative counters are summed, gauges replaced);
    ``update`` sets driver-level gauges (committed epoch, inflight window).
    GET ``/metrics`` returns the whole snapshot as JSON; anything else is 404.
    """

    def __init__(self, port: int = 0, host: str = "127.0.0.1"):
        self._lock = threading.Lock()
        self._driver: dict[str, Any] = {}
        self._parts: dict[int, dict[str, Any]] = {}
        # control plane (reference Control service, api/proto/v1/control.proto:
        # Ping / DeployPipeline / PausePipeline — the reference registers
        # UnimplementedControl; here Ping and Pause/Resume are real, Deploy
        # maps to job submit by design). Bound by the runner via bind_control.
        self._pause_fn = None
        self._resume_fn = None
        self._state_fn = None
        server = self

        class Handler(BaseHTTPRequestHandler):
            def _json(self, payload: dict, code: int = 200) -> None:
                body = json.dumps(payload, sort_keys=True).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self) -> None:  # noqa: N802 (http.server API)
                path = self.path.rstrip("/")
                if path in ("", "/metrics"):
                    self._json(server.snapshot())
                elif path == "/ping":  # PingReply{status} parity
                    self._json({"status": "ok"})
                elif path == "/control":
                    if server._state_fn is None:
                        self.send_error(404)
                    else:
                        self._json(server._state_fn())
                elif path in ("/control/pause", "/control/resume"):
                    # state-changing verbs are POST-only: a GET probe (a
                    # scraper walking endpoints, a browser prefetch) must
                    # never quiesce a running pipeline
                    self.send_error(405)
                else:
                    self.send_error(404)

            def do_POST(self) -> None:  # noqa: N802 (http.server API)
                path = self.path.rstrip("/")
                if path in ("/control/pause", "/control/resume"):
                    fn = (
                        server._pause_fn
                        if path.endswith("pause")
                        else server._resume_fn
                    )
                    if fn is None:
                        self.send_error(404)
                    else:  # PauseReply{ok} parity
                        fn()
                        self._json({"ok": True, **(server._state_fn() or {})})
                else:
                    self.send_error(405)

            def log_message(self, *a: Any) -> None:  # silence per-request stderr
                pass

        self._httpd = ThreadingHTTPServer((host, port), Handler)
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, name="quanta-metrics", daemon=True
        )
        self._thread.start()

    @property
    def port(self) -> int:
        return int(self._httpd.server_address[1])

    @property
    def url(self) -> str:
        host, port = self._httpd.server_address[:2]
        return f"http://{host}:{port}/metrics"

    def bind_control(self, pause_fn, resume_fn, state_fn) -> None:
        """Wire the runner's pause/resume into ``/control/*`` (PausePipeline
        parity). Until bound, the control paths 404 (metrics-only server)."""
        self._pause_fn = pause_fn
        self._resume_fn = resume_fn
        self._state_fn = state_fn

    def update(self, **gauges: Any) -> None:
        with self._lock:
            self._driver.update(gauges)

    def fold_partition(self, pm: dict[str, Any]) -> None:
        """Fold one worker epoch-metric dict. Counters (`rows_in`,
        ``*_emitted``) accumulate; gauges (``wm``, ``live_convs``, epoch,
        timings) replace — mirroring how ``__main__.py metrics`` folds the
        same dicts post-hoc from committed manifests."""
        p = pm.get("partition")
        if p is None:  # replay/skip markers carry no partition
            return
        with self._lock:
            cur = self._parts.setdefault(int(p), {"rows_in": 0})
            for k, v in pm.items():
                if k == "rows_in" or k.endswith("_emitted"):
                    cur[k] = cur.get(k, 0) + int(v)
                elif k in _TIME_KEYS:
                    cur[f"{k}_last"] = v
                elif k != "partition":
                    cur[k] = v

    def snapshot(self) -> dict[str, Any]:
        with self._lock:
            return {
                **self._driver,
                "partitions": {str(p): dict(v) for p, v in sorted(self._parts.items())},
                "rows_in_total": sum(v.get("rows_in", 0) for v in self._parts.values()),
            }

    def close(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()
        self._thread.join(timeout=5)


def fetch_metrics(url: str, timeout: float = 5.0) -> dict[str, Any]:
    """Convenience GET used by tests and the CLI (no external deps)."""
    from urllib.request import urlopen

    with urlopen(url, timeout=timeout) as r:
        return json.loads(r.read().decode())


def post_control(url: str, timeout: float = 5.0) -> dict[str, Any]:
    """POST to a control verb (/control/pause|resume) — the state-changing
    sibling of ``fetch_metrics`` (control verbs reject GET with 405)."""
    from urllib.request import Request, urlopen

    with urlopen(Request(url, data=b"", method="POST"), timeout=timeout) as r:
        return json.loads(r.read().decode())
