"""Secret resolution for pipeline specs (`.secret(...)` DSL modifier).

Reference protocol (/root/reference/execute/sourceNode.go:124-184): exec
``command``; write the secret-name -> arg-name map as JSON on stdin; parse
JSON stdout as {secret_name: value}; copy each value into the node's args
under the mapped arg name. Secrets are cached and re-resolved when
``cache_time_seconds`` expires, checked once per poll
(/root/reference/execute/execute.go:84-96). Example provider script:
/root/reference/scripts/aws_secrets.py.

Here resolution happens on the driver before pipeline launch; streaming
jobs call ``maybe_refresh`` between epochs.
"""

from __future__ import annotations

import json
import subprocess
import time
from typing import Any


class SecretResolver:
    def __init__(self, spec: dict[str, Any] | None, clock=time.monotonic):
        # spec = {"command", "secrets": [{secret_name: arg_name}...],
        #         "cache_time_seconds", "timeout_seconds"}  (dsl.py .secret)
        self.spec = spec
        self._clock = clock
        self._resolved_at: float | None = None

    def resolve_into(self, args: dict[str, Any]) -> dict[str, Any]:
        """Run the provider and merge resolved values into ``args``."""
        if not self.spec or not self.spec.get("command"):
            return args
        # Reference wire format (sourceNode.go:148-175, scripts/aws_secrets.py):
        # stdin = the LIST of {secret_name: arg_name} pairs, verbatim;
        # stdout = {arg_name: value}, merged directly into the node's args.
        proc = subprocess.run(
            self.spec["command"],
            shell=True,
            input=json.dumps(self.spec.get("secrets", [])).encode(),
            capture_output=True,
            timeout=self.spec.get("timeout_seconds", 30),
        )
        if proc.returncode != 0:
            raise RuntimeError(f"secret command failed: {proc.stderr.decode()[:500]}")
        values = json.loads(proc.stdout.decode())
        args.update(values)
        self._resolved_at = self._clock()
        return args

    def maybe_refresh(self, args: dict[str, Any]) -> dict[str, Any]:
        """Re-resolve if the cache expired (reference checks each poll,
        execute.go:84-96 — called per epoch by the streaming jobs and per
        poll by PullSourceDriver, so a rotated credential is picked up
        without restarting a long-running job)."""
        if not self.spec or not self.spec.get("command"):
            return args
        ttl = self.spec.get("cache_time_seconds", 86400 * 30)
        if self._resolved_at is None or self._clock() - self._resolved_at >= ttl:
            return self.resolve_into(args)
        return args
