"""Pull-source driver: poll a connector on an interval, land each poll's
events as a Parquet chunk in a stream directory.

This is the bridge from the reference's source model (pull loop: read ->
capsule -> sleep remainder of interval,
/root/reference/execute/execute.go:99-109) to the streaming engine's
input contract (a growing directory of Parquet files that
StreamingWindowedJob claims as epochs). Each poll that returns events
writes ONE chunk file with a monotonically increasing sequence number —
chunk naming is deterministic so the epoch planner's sorted-claim order
equals arrival order.

The driver runs on the job driver (sources are inherently sequential
cursors), while all heavy processing stays in Ray tasks downstream.
"""

from __future__ import annotations

import json
import os
import time
from typing import Callable, Iterable

import pyarrow as pa
import pyarrow.parquet as pq

from vaero_ray.cdk.http_connector import HTTPConnector


class PullSourceDriver:
    def __init__(
        self,
        connector: HTTPConnector,
        stream_dir: str,
        interval_s: float = 10.0,
        sleep: Callable[[float], None] = time.sleep,
        clock: Callable[[], float] = time.monotonic,
        secret_resolver=None,
        secret_args: dict | None = None,
        apply_secrets: Callable[[dict], None] | None = None,
    ):
        self.connector = connector
        self.stream_dir = stream_dir
        self.interval_s = interval_s
        self._sleep = sleep
        self._clock = clock
        # per-poll secret staleness re-check (reference: execute.go:84-96).
        # secret_args is the live arg dict maybe_refresh mutates;
        # apply_secrets maps refreshed values onto the connector (default:
        # rotate connector.token when the provider returns one).
        self.secret_resolver = secret_resolver
        self.secret_args = {} if secret_args is None else secret_args
        self._apply_secrets = apply_secrets or (
            lambda args: setattr(
                self.connector, "token", args.get("token", self.connector.token)
            )
        )
        os.makedirs(stream_dir, exist_ok=True)
        self._seq = self._next_seq()

    def _next_seq(self) -> int:
        chunks = [f for f in os.listdir(self.stream_dir) if f.endswith(".parquet")]
        return 1 + max((int(f.split("-")[1].split(".")[0]) for f in chunks), default=-1)

    def poll_once(self) -> str | None:
        """One poll; returns the chunk path written (None if no events)."""
        if self.secret_resolver is not None:
            self.secret_resolver.maybe_refresh(self.secret_args)
            self._apply_secrets(self.secret_args)
        events = self.connector.poll()
        if not events:
            return None
        tbl = events_to_table(events)
        path = os.path.join(self.stream_dir, f"chunk-{self._seq:08d}.parquet")
        tmp = path + ".tmp"
        pq.write_table(tbl, tmp)
        os.replace(tmp, path)
        self._seq += 1
        return path

    def run(self, max_polls: int | None = None) -> list[str]:
        """Poll loop: read -> land chunk -> sleep remainder of interval
        (reference cadence, execute.go:99-109)."""
        written = []
        n = 0
        while max_polls is None or n < max_polls:
            t0 = self._clock()
            p = self.poll_once()
            if p:
                written.append(p)
            n += 1
            if max_polls is not None and n >= max_polls:
                break
            leftover = self.interval_s - (self._clock() - t0)
            if leftover > 0:
                self._sleep(leftover)
        return written


def events_to_table(events: Iterable[dict]) -> pa.Table:
    """JSON events -> Arrow. Scalar fields become real columns; nested
    objects/arrays are kept as compact JSON strings (the engine's
    transforms address nested paths via the planner's literal-path
    flattening, SURVEY.md §1.2)."""
    rows = []
    for e in events:
        flat = {}
        for k, v in e.items():
            flat[k] = json.dumps(v, separators=(",", ":")) if isinstance(v, (dict, list)) else v
        rows.append(flat)
    return pa.Table.from_pylist(rows)
