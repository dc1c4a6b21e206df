"""HTTP push source: the reference's ``http_server`` tap
(/root/reference/integrations/sources/source_http_server.go:30-96).

Semantics reproduced:
- serves ``endpoint`` on ``port``; each POST body is split into events by
  the ``jsonarray`` event breaker (the only breaker the reference
  implements, source_python.go:71-103);
- every event gets auto-added ``timestamp`` (receive time, RFC3339) and
  ``remoteaddr`` fields (source_http_server.go:76-88);
- one request = one micro-batch (the reference emits one EventList per
  request, :92-95) — landed here as one Parquet chunk in the stream
  directory, which the streaming engine's epoch driver then claims.

stdlib-only (http.server in a daemon thread); ``now_fn`` injectable for
deterministic tests.
"""

from __future__ import annotations

import json
import os
import threading
import time
from datetime import datetime, timezone
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Callable

import pyarrow.parquet as pq

from vaero_ray.cdk.http_connector import jsonarray_event_breaker
from vaero_ray.cdk.pull_driver import events_to_table


def _rfc3339(ts: float) -> str:
    return datetime.fromtimestamp(ts, tz=timezone.utc).strftime("%Y-%m-%dT%H:%M:%SZ")


class PushSourceServer:
    def __init__(
        self,
        stream_dir: str,
        port: int = 8080,
        endpoint: str = "/logevent",
        event_breaker: str = "jsonarray",
        now_fn: Callable[[], float] = time.time,
    ):
        if event_breaker != "jsonarray":
            raise ValueError("only the jsonarray event breaker is implemented (reference parity)")
        if not endpoint.startswith("/"):
            endpoint = "/" + endpoint
        self.stream_dir = stream_dir
        self.endpoint = endpoint
        self.now_fn = now_fn
        os.makedirs(stream_dir, exist_ok=True)
        self._seq = 1 + max(
            (
                int(f.split("-")[1].split(".")[0])
                for f in os.listdir(stream_dir)
                if f.endswith(".parquet")
            ),
            default=-1,
        )
        self._lock = threading.Lock()
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def do_POST(self):
                if self.path != outer.endpoint:
                    self.send_response(404)
                    self.end_headers()
                    return
                n = int(self.headers.get("Content-Length", 0))
                body = self.rfile.read(n).decode("utf-8", "replace")
                try:
                    raw = jsonarray_event_breaker(body)
                except Exception:
                    self.send_response(400)
                    self.end_headers()
                    return
                now = _rfc3339(outer.now_fn())
                events = []
                for r in raw:
                    e = json.loads(r)
                    # auto fields, reference source_http_server.go:76-88
                    e["timestamp"] = now
                    e["remoteaddr"] = self.client_address[0]
                    events.append(e)
                outer._land(events)
                self.send_response(200)
                self.end_headers()

        self._server = ThreadingHTTPServer(("127.0.0.1", port), Handler)
        self.port = self._server.server_address[1]  # resolved if port=0
        self._thread: threading.Thread | None = None

    def _land(self, events: list[dict]) -> str:
        tbl = events_to_table(events)
        with self._lock:
            seq = self._seq
            self._seq += 1
        path = os.path.join(self.stream_dir, f"chunk-{seq:08d}.parquet")
        tmp = path + ".tmp"
        pq.write_table(tbl, tmp)
        os.replace(tmp, path)
        return path

    def start(self) -> "PushSourceServer":
        self._thread = threading.Thread(target=self._server.serve_forever, daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        self._server.shutdown()
        self._server.server_close()
        if self._thread:
            self._thread.join(timeout=5)
