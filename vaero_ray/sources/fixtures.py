"""Reference-shaped log-event fixtures (F2) for transform-parity tests.

Mirrors the reference's ``random`` source events
(/root/reference/integrations/sources/source_random.go:16-28): hostname /
t / f / msg / severity / timestamp — as an Arrow table instead of JSON
strings. The nested variant adds an Okta-like ``actor`` struct column to
exercise nested gjson paths (/root/reference/pipelines/okta_pipe.py uses
``actor.id`` and ``actor.alternateId``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

HOSTS = ["Alderaan", "Bantha", "Cantina", "Dagobah", "Endor", "Falcon", "Greedo", "Hoth"]
MSGS = [
    "May the Force be with you.",
    "Do. Or do not. There is no try.",
    "Never tell me the odds!",
    "It's a trap!",
    "I find your lack of faith disturbing.",
    "The garbage will do.",
    "These aren't the droids you're looking for.",
    "Chewie, we're home.",
]
SEVERITIES = ["info", "debug", "alert", "warning"]


def make_log_events(n: int = 64, seed: int = 7) -> pa.Table:
    rng = np.random.default_rng(seed)
    # timestamps spread over >=2 calendar days to exercise %Y/%m/%d prefixes
    base = np.datetime64("2026-01-01T00:00:00", "s")
    ts = base + rng.integers(0, 3 * 86400, n).astype("timedelta64[s]")
    iso = np.datetime_as_string(ts, unit="s")
    timestamp = np.char.add(iso, "Z")  # RFC3339, like time.Now().Format
    return pa.table(
        {
            "hostname": pa.array(np.array(HOSTS)[rng.integers(0, len(HOSTS), n)]),
            "t": pa.array(np.ones(n, dtype=bool)),
            "f": pa.array(np.zeros(n, dtype=bool)),
            "msg": pa.array(np.array(MSGS)[rng.integers(0, len(MSGS), n)]),
            "severity": pa.array(np.array(SEVERITIES)[rng.integers(0, len(SEVERITIES), n)]),
            "timestamp": pa.array(timestamp.astype(object), pa.string()),
        }
    )


def make_nested_events(n: int = 32, seed: int = 11) -> pa.Table:
    """Okta-shaped events with an ``actor`` struct column."""
    rng = np.random.default_rng(seed)
    tbl = make_log_events(n, seed)
    ids = np.char.add("00u73", np.char.zfill(rng.integers(0, 10**6, n).astype("U7"), 7))
    # a few actors from a different id space (filtered out by okta_pipe's filter)
    other = rng.random(n) < 0.25
    ids = np.where(other, np.char.add("00u99", np.char.zfill(rng.integers(0, 10**6, n).astype("U7"), 7)), ids)
    logins = np.char.add(np.char.add("login", rng.integers(0, 500, n).astype("U4")), "@example.com")
    actor = pa.StructArray.from_arrays(
        [pa.array(ids.astype(object), pa.string()), pa.array(logins.astype(object), pa.string())],
        ["id", "alternateId"],
    )
    return tbl.append_column("actor", actor)
