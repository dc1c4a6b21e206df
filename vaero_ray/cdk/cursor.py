"""Incremental-sync cursor for pull connectors.

The reference pickles an opaque cursor value to a per-source file and
reloads it around every poll (/root/reference/vaero_cdk/api_cursor.py:20-31;
usage /root/reference/vaero_cdk/http_connector.py:220-237). Same contract
here, but JSON + atomic rename instead of pickle (safe to inspect, safe
against torn writes, and consistent with the streaming engine's
checkpoint files)."""

from __future__ import annotations

import json
import os
from typing import Any


class ApiCursor:
    def __init__(self, path: str, default: Any = None):
        self.path = path
        self.default = default

    def read(self) -> Any:
        if not os.path.exists(self.path):
            return self.default
        with open(self.path) as fh:
            return json.load(fh)["cursor"]

    def write(self, value: Any) -> None:
        os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
        tmp = self.path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump({"cursor": value}, fh)
            fh.flush()
            os.fsync(fh.fileno())
        os.replace(tmp, self.path)
