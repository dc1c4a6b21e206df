"""S3 source/sink plumbing (reference source_s3.go / sink_s3.go surface)
without network: URI assembly + injected pyarrow filesystems, and the
batch_max_bytes -> target file size mapping."""

from __future__ import annotations

import glob
import os

import pyarrow as pa
import pyarrow.fs as pafs
import ray.data as rd

from vaero_ray.sinks.parquet_sink import s3_uri_and_fs, write_partitioned


def test_s3_uri_assembly_and_fs_kwargs():
    captured = {}

    def fake_factory(**kw):
        captured.update(kw)
        return "FAKE_FS"

    # bucket + prefix + region/endpoint -> scheme-stripped path + fs kwargs
    path, fs = s3_uri_and_fs(
        {"bucket": "my-bucket", "prefix": "logs/2026", "region": "us-west-2", "endpoint": "http://localhost:9000"},
        fs_factory=fake_factory,
    )
    assert path == "my-bucket/logs/2026"
    assert fs == "FAKE_FS"
    assert captured == {"region": "us-west-2", "endpoint_override": "http://localhost:9000"}

    # explicit s3:// path wins; anonymous plumbs through
    captured.clear()
    path, fs = s3_uri_and_fs({"path": "s3://other/pfx", "anonymous": True}, fs_factory=fake_factory)
    assert path == "other/pfx" and captured == {"anonymous": True}

    # local paths get no filesystem
    path, fs = s3_uri_and_fs({"path": "/tmp/x"})
    assert path == "/tmp/x" and fs is None
    # nothing configured
    path, fs = s3_uri_and_fs({"bucket": "", "prefix": ""})
    assert path is None and fs is None


def test_write_read_through_injected_filesystem(tmp_path, ray_session):
    """The filesystem= kwarg must plumb through Ray write/read — proven
    with a SubTreeFileSystem standing in for S3FileSystem."""
    root = tmp_path / "bucket"
    root.mkdir()
    fs = pafs.SubTreeFileSystem(str(root), pafs.LocalFileSystem())
    tbl = pa.table(
        {
            "timestamp": pa.array(["2026-01-02T03:04:05Z"] * 100),
            "v": pa.array(range(100), pa.int64()),
        }
    )
    write_partitioned(rd.from_arrow(tbl), "out", timestamp_key="timestamp", filesystem=fs)
    files = glob.glob(str(root / "out" / "**" / "*.parquet"), recursive=True)
    assert files, "no files written through the injected filesystem"
    back = rd.read_parquet("out", filesystem=fs).to_pandas()
    assert len(back) == 100 and set(back["v"]) == set(range(100))


def test_batch_max_bytes_targets_file_size(tmp_path, ray_session):
    from ray.data import DataContext

    prev = DataContext.get_current().target_max_block_size
    n = 20000
    tbl = pa.table(
        {
            "timestamp": pa.array(["2026-01-02T03:04:05Z"] * n),
            "payload": pa.array(["x" * 200] * n),
        }
    )
    out = str(tmp_path / "sized")
    write_partitioned(
        rd.from_arrow(tbl).repartition(1),
        out,
        timestamp_key="timestamp",
        batch_max_bytes=256 * 1024,
    )
    files = glob.glob(os.path.join(out, "**", "*.parquet"), recursive=True)
    # ~4 MB of rows with a 256 KB block/file target -> several files
    assert len(files) > 1
    # context restored after the write
    assert DataContext.get_current().target_max_block_size == prev
