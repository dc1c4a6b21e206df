"""Read helpers.

``read_parquet`` wraps ``ray.data.read_parquet`` so block schemas carry
NO pandas metadata blob: parquet files written by pandas embed a
``b"pandas"`` dict that makes ``pyarrow.Schema`` UNHASHABLE
(``hash(schema)`` raises ``unhashable type: 'dict'``), which defeats
Ray's block-schema deduplication and floods logs with one warning per
read task. Two layers:

1. the footer schema of the first file is read on the driver (one
   metadata fetch), stripped, pruned to ``columns``, and passed as the
   read's explicit ``schema`` — the read tasks themselves then never see
   the pandas blob (round 2 stripped only AFTER the read, so the warning
   still fired inside ``ReadParquet``);
2. a fused zero-copy ``map_batches`` strip remains as a belt for paths
   where (1) can't resolve a local file (s3://, custom filesystems).
"""

from __future__ import annotations

import glob
import os
import threading

import pyarrow as pa
import ray.data as rd

# Serializes Dataset CONSTRUCTION (plan/schema inference) across
# threads: pyarrow/ray probe `fsspec.implementations.http` lazily, and
# when that import fails (no aiohttp here) a concurrent second import
# sees the half-poisoned module and raises a plain ImportError that
# escapes Ray's handler. Taken INSIDE read_parquet so every
# construction site is covered; execution is not serialized.
DATASET_BUILD_LOCK = threading.Lock()


def _strip_meta(tbl: pa.Table) -> pa.Table:
    return tbl.replace_schema_metadata(None) if tbl.schema.metadata else tbl


def _first_local_file(path) -> str | None:
    if isinstance(path, (list, tuple)):
        return _first_local_file(path[0]) if path else None
    if not isinstance(path, str) or "://" in path:
        return None
    if os.path.isfile(path):
        return path
    if os.path.isdir(path):
        hits = sorted(glob.glob(os.path.join(path, "*.parquet")))
        return hits[0] if hits else None
    return None


def read_parquet(path, **kw) -> rd.Dataset:
    if "schema" not in kw:
        first = _first_local_file(path)
        if first is not None:
            try:
                import pyarrow.parquet as pq

                sch = pq.read_schema(first).remove_metadata()
                cols = kw.get("columns")
                if cols:
                    sch = pa.schema([sch.field(c) for c in cols])
                kw["schema"] = sch
            except Exception:
                pass  # fall back to the post-read strip
    with DATASET_BUILD_LOCK:
        ds = rd.read_parquet(path, **kw)
    return ds.map_batches(
        _strip_meta, batch_format="pyarrow", zero_copy_batch=True
    )
