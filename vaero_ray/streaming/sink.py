"""Deterministic partitioned Parquet writer for the exactly-once sink.

One file per (hash-partition, epoch), named ``p={bucket}/epoch-{k}.parquet``
— a pure function of the partition contents: rows are canonically sorted
on every column before writing, so re-running a crashed epoch overwrites
the file byte-identically (pyarrow emits no wall-clock metadata). This
replaces the reference's inherently non-resumable wall-clock/UUID
filenames (/root/reference/execute/sinkNode.go:190-225).

Executed as ``groupby(bucket).map_groups`` — each partition's file is
written INSIDE the Ray task that holds its rows (no driver round-trip);
only the tiny lineage table (partition, rows, path, sha256) is collected.
"""

from __future__ import annotations

import hashlib
import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from vaero_ray.stages.keyed import BUCKET_COL, hash_bucket

LINEAGE_SCHEMA = pa.schema(
    [("partition", pa.int64()), ("rows", pa.int64()), ("path", pa.string()), ("sha256", pa.string())]
)


def add_partition_col(tbl: pa.Table, key: str, num_partitions: int) -> pa.Table:
    return tbl.append_column(BUCKET_COL, pa.array(hash_bucket(tbl.column(key).to_pandas(), num_partitions)))


def write_canonical_file(df: "pd.DataFrame", path: str) -> tuple[str, str, int]:
    """Canonical in-task write of one partition file at an explicit path:
    sort on all columns -> tmp write -> atomic rename -> (path, sha256,
    rows). Byte-identical across re-runs (pyarrow emits no wall-clock
    metadata). The path MUST be unique per (partition, epoch) — callers
    that write concurrent partitions must derive the path from the
    partition key, never share an intermediate."""
    df = df.sort_values(list(df.columns), kind="mergesort", ignore_index=True)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + f".tmp{os.getpid()}"
    tbl = pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)
    pq.write_table(tbl, tmp, row_group_size=1 << 20)
    os.replace(tmp, path)
    digest = hashlib.sha256(open(path, "rb").read()).hexdigest()
    return path, digest, len(df)


def write_partition_file(df: "pd.DataFrame", base_dir: str, bucket: int, epoch: int) -> tuple[str, str, int]:
    """Canonical in-task write of one partition's epoch file:
    sort on all columns -> part-{bucket}/epoch-{k}.parquet (atomic rename)
    -> (path, sha256, rows). Byte-identical across re-runs of the same
    epoch; shared by the windowed sink and the stitch job."""
    path = os.path.join(base_dir, f"part-{bucket}", f"epoch-{epoch:08d}.parquet")
    return write_canonical_file(df, path)


def write_deterministic(
    ds: rd.Dataset,
    base_dir: str,
    epoch: int,
    partition_key: str,
    num_partitions: int,
) -> pa.Table:
    """Write ``ds`` as one canonical file per hash-partition of
    ``partition_key``; returns the lineage table (small: one row per
    non-empty partition)."""

    def tag(tbl: pa.Table) -> pa.Table:
        return add_partition_col(tbl, partition_key, num_partitions)

    def write_partition(df: pd.DataFrame) -> pd.DataFrame:
        # dir name has no '=': hive-partition inference would otherwise
        # resurrect the bucket as a phantom column on read
        bucket = int(df[BUCKET_COL].iloc[0])
        df = df.drop(columns=[BUCKET_COL])
        path, digest, rows = write_partition_file(df, base_dir, bucket, epoch)
        return pd.DataFrame(
            {"partition": [bucket], "rows": [rows], "path": [path], "sha256": [digest]}
        )

    tagged = ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
    lineage_ds = tagged.groupby(BUCKET_COL).map_groups(write_partition, batch_format="pandas")
    rows = lineage_ds.take_all()  # tiny: <= num_partitions rows
    if not rows:
        return LINEAGE_SCHEMA.empty_table()
    return pa.Table.from_pylist(rows, schema=LINEAGE_SCHEMA)
