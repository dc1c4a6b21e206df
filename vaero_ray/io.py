"""Read helpers.

``read_parquet`` wraps ``ray.data.read_parquet`` with a zero-copy
schema-metadata strip: parquet files written by pandas carry a
``b"pandas"`` metadata blob that makes ``pyarrow.Schema`` UNHASHABLE
(``hash(schema)`` raises ``unhashable type: 'dict'``), which defeats
Ray's block-schema deduplication and floods logs with one warning per
bundle. Stripping costs nothing (metadata-only table rebuild) and the
stage fuses with whatever map_batches follows.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data as rd


def _strip_meta(tbl: pa.Table) -> pa.Table:
    return tbl.replace_schema_metadata(None) if tbl.schema.metadata else tbl


def read_parquet(path, **kw) -> rd.Dataset:
    return rd.read_parquet(path, **kw).map_batches(
        _strip_meta, batch_format="pyarrow", zero_copy_batch=True
    )
