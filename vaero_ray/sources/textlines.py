"""Raw-text / log-line source: a bucket (or directory) of plain text
files becomes an event stream, one event per line.

Reference parity: the reference's s3 source GETs each object and splits
its content on ``\\n`` into string events
(/root/reference/integrations/sources/source_s3.go:74); its http_server
source applies a ``jsonarray`` event breaker to JSON payloads
(/root/reference/integrations/sources/source_http_server.go:40-95).
Here the same two shapes are Ray-Data-first:

- ``read_text_events``: ``ray.data.read_text`` (parallel per-file read
  tasks, streaming blocks) with each line as a ``message`` column row —
  the raw-string event. Deviation from the reference (documented): Go's
  ``strings.Split`` keeps empty trailing fragments; ``read_text`` drops
  blank lines, which is what every downstream transform actually wants.
- ``jsonlines_to_columns``: per-batch NDJSON breaker — the batch's lines
  are joined and parsed by ``pyarrow.json.read_json`` (one vectorized
  C++ parse per batch, no per-row Python json.loads in the hot path);
  scalar fields become real columns, nested objects/arrays are
  re-serialized to compact JSON strings, matching the engine's event
  convention (``cdk/pull_driver.events_to_table``: transforms address
  nested paths via the planner's literal-path flattening). Lines that
  are not valid JSON make the batch fall back to one ``message``
  column (the reference keeps raw strings for non-JSON events).
"""

from __future__ import annotations

import json

import pyarrow as pa
import ray.data as rd

MESSAGE_COL = "message"


def read_text_events(path, filesystem=None, **kw) -> rd.Dataset:
    """Lines of text file(s) -> Dataset with one ``message`` row per line."""
    ds = rd.read_text(path, filesystem=filesystem, **kw)

    def rename(tbl: pa.Table) -> pa.Table:
        return tbl.rename_columns([MESSAGE_COL if c == "text" else c for c in tbl.column_names])

    return ds.map_batches(rename, batch_format="pyarrow", zero_copy_batch=True)


def _nested_to_json(col: pa.ChunkedArray) -> pa.Array:
    """Struct/list column -> compact JSON strings (engine event convention)."""
    vals = col.to_pylist()
    return pa.array(
        [None if v is None else json.dumps(v, separators=(",", ":")) for v in vals],
        pa.string(),
    )


def jsonlines_to_columns(tbl: pa.Table, text_col: str = MESSAGE_COL) -> pa.Table:
    """NDJSON breaker over a batch of raw lines (see module docstring)."""
    import pyarrow.json as pj

    n = tbl.num_rows
    if not n:
        return pa.table({})
    lines = tbl.column(text_col).to_pylist()
    payload = "\n".join(l for l in lines if l is not None and l.strip())
    try:
        parsed = pj.read_json(pa.BufferReader(payload.encode("utf-8")))
    except pa.ArrowInvalid:
        # non-JSON log lines: keep the raw-string event (reference shape)
        return tbl.select([text_col]).rename_columns([MESSAGE_COL])
    cols = {}
    for name in parsed.column_names:
        col = parsed.column(name)
        if pa.types.is_struct(col.type) or pa.types.is_list(col.type) or pa.types.is_large_list(col.type):
            cols[name] = _nested_to_json(col)
        else:
            cols[name] = col
    return pa.table(cols)


def read_jsonl_events(path, filesystem=None, **kw) -> rd.Dataset:
    """JSON-lines file(s) -> columnar Dataset (NDJSON breaker per batch)."""
    return read_text_events(path, filesystem=filesystem, **kw).map_batches(
        jsonlines_to_columns, batch_format="pyarrow", zero_copy_batch=True
    )
