"""Batch-mode sink: prefix-partitioned Parquet.

Reproduces the reference's sink bucketing semantics
(/root/reference/execute/sinkNode.go:80-101): each event is bucketed by
``prefix = strftime(filename_prefix, event's own timestamp at
timestamp_key)`` (default '%Y/%m/%d', vaero/stream.py:35-43); events whose
timestamp fails to parse are DROPPED with a warning (sinkNode.go:85-89).

In batch mode the (max_bytes, max_time) buffer-flush machinery
(sinkNode.go:105-131) degenerates to file-size targets: we write one
Parquet directory per prefix via Ray's partitioned write, with
deterministic part names (wall-clock/UUID names of the reference,
sinkNode.go:190-225, are inherently non-resumable — see SURVEY.md §2a).
The streaming exactly-once variant lives in vaero_ray/streaming/.
"""

from __future__ import annotations

import logging

import pyarrow as pa
import pyarrow.compute as pc

logger = logging.getLogger(__name__)

PREFIX_COL = "vx_prefix"

_RFC3339_FORMATS = ["%Y-%m-%dT%H:%M:%SZ", "%Y-%m-%dT%H:%M:%S%z", "%Y-%m-%d %H:%M:%S"]


def _parse_ts(col: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Timestamp column -> timestamp[us]; strings parsed as RFC3339/unix
    (the reference tries the configured layout then drops,
    sinkNode.go:84-90). Unparseable -> null."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    t = col.type
    if pa.types.is_timestamp(t):
        return col.cast(pa.timestamp("us"))
    if pa.types.is_integer(t) or pa.types.is_floating(t):  # unix seconds
        us = pc.multiply(pc.cast(col, pa.int64(), safe=False), 1_000_000)
        return us.cast(pa.timestamp("us"))
    # fast path: arrow's ISO-8601 parser (handles fractional seconds and
    # Z/offset zones — e.g. Okta's '...T00:00:01.000Z') when EVERY row is
    # well-formed
    for ty in (pa.timestamp("us", "UTC"), pa.timestamp("us")):
        try:
            return col.cast(ty).cast(pa.timestamp("us"))
        except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
            pass
    # tolerant path: per-row strptime OR-chain (unparseable -> null); also
    # tried with fractional seconds stripped (arrow strptime has no %f)
    stripped = pc.replace_substring_regex(col, r"\.\d+", "")
    out = None
    for c in (col, stripped):
        for fmt in _RFC3339_FORMATS:
            parsed = pc.strptime(c, format=fmt, unit="us", error_is_null=True)
            parsed = parsed.cast(pa.timestamp("us"))  # tz-aware (%z) -> naive UTC
            out = parsed if out is None else pc.if_else(pc.is_null(out), parsed, out)
    return out


def derive_prefix(tbl: pa.Table, timestamp_key: str = "timestamp", filename_prefix: str = "%Y/%m/%d") -> pa.Table:
    """Append the sink prefix column; DROP rows with unparseable/missing
    timestamps (reference behavior, sinkNode.go:85-89)."""
    if timestamp_key not in tbl.column_names:
        logger.warning("sink: timestamp_key %r missing; dropping all %d rows", timestamp_key, tbl.num_rows)
        return tbl.slice(0, 0).append_column(PREFIX_COL, pa.array([], pa.string()))
    ts = _parse_ts(tbl.column(timestamp_key))
    ok = pc.is_valid(ts)
    n_bad = tbl.num_rows - pc.sum(pc.cast(ok, pa.int64())).as_py()
    if n_bad:
        logger.warning("sink: dropping %d rows with unparseable %r", n_bad, timestamp_key)
    # strftime directory prefix; '/' separators become partition dirs
    prefix = pc.strftime(ts, format=filename_prefix)
    return tbl.append_column(PREFIX_COL, prefix).filter(ok)


def write_partitioned(ds, path: str, timestamp_key: str = "timestamp", filename_prefix: str = "%Y/%m/%d", **write_kw) -> str:
    """Partitioned Parquet write bucketed by the reference's prefix rule.

    The '/'-containing strftime prefix is flattened to a single partition
    value (hive-style ``__prefix=2026-01-02``) so the layout is
    deterministic and resumable per-partition."""
    safe_fmt = filename_prefix.replace("/", "-")

    def tag(tbl: pa.Table) -> pa.Table:
        return derive_prefix(tbl, timestamp_key, safe_fmt)

    (ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
       .write_parquet(path, partition_cols=[PREFIX_COL], **write_kw))
    return path
