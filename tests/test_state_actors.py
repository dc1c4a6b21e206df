"""Actor-pool state store backend: parity with the parquet backend,
resume across driver objects, crash-mid-epoch recovery."""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from vaero_ray.sources.transcripts import make_transcripts
from vaero_ray.stages.windows import AggSpec
from vaero_ray.streaming import StreamingWindowedJob


@pytest.fixture(scope="module")
def stream_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("astream")
    tbl = make_transcripts(n_convs=60, mean_turns=14, seed=11, disorder_frac=0.15)
    tbl = tbl.take(pc.sort_indices(tbl, sort_keys=[("ts", "ascending")]))
    n = tbl.num_rows
    for i in range(4):
        lo, hi = i * n // 4, (i + 1) * n // 4
        pq.write_table(tbl.slice(lo, hi - lo), str(d / f"chunk-{i:04d}.parquet"))
    return str(d)


def _job(stream_d: str, base: str, backend: str) -> StreamingWindowedJob:
    return StreamingWindowedJob(
        input_dir=stream_d,
        out_dir=f"{base}/out",
        ckpt_dir=f"{base}/ckpt",
        keys=["conv_id"],
        aggs=[AggSpec(None, "count", "n_turns"), AggSpec("ts", "max", "last_ts")],
        ts_col="ts",
        size_s=300,
        allowed_lateness_s=30,
        num_partitions=4,
        state_backend=backend,
    )


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    return df.sort_values(list(sorted(df.columns)), ignore_index=True)[sorted(df.columns)]


def test_actor_backend_matches_parquet_backend(stream_dir, tmp_path, ray_session):
    jp = _job(stream_dir, f"{tmp_path}/pq", "parquet")
    mp = jp.run()
    ja = _job(stream_dir, f"{tmp_path}/ac", "actors")
    ma = ja.run()

    assert [m.rows_out for m in mp] == [m.rows_out for m in ma]
    assert [m.watermark_us for m in mp] == [m.watermark_us for m in ma]
    assert [m.rows_late for m in mp] == [m.rows_late for m in ma]
    pd.testing.assert_frame_equal(
        _norm(jp.committed_output().to_pandas()),
        _norm(ja.committed_output().to_pandas()),
        check_dtype=False,
    )


def test_actor_backend_resume(stream_dir, tmp_path, ray_session):
    full = _job(stream_dir, f"{tmp_path}/full", "actors")
    full.run()

    part = _job(stream_dir, f"{tmp_path}/part", "actors")
    part.run(max_epochs=2, finalize=False)
    # fresh driver object (actor pool is re-synced from committed snapshot)
    resumed = _job(stream_dir, f"{tmp_path}/part", "actors")
    resumed.run()

    pd.testing.assert_frame_equal(
        _norm(full.committed_output().to_pandas()),
        _norm(resumed.committed_output().to_pandas()),
        check_dtype=False,
    )


def test_actor_backend_crash_midepoch(stream_dir, tmp_path, ray_session):
    job = _job(stream_dir, f"{tmp_path}/cr", "actors")
    job.run(max_epochs=1, finalize=False)

    crash = _job(stream_dir, f"{tmp_path}/cr", "actors")
    crash.store.commit = lambda m: (_ for _ in ()).throw(RuntimeError("boom"))
    with pytest.raises(RuntimeError):
        crash.run_epoch()  # actors now hold UNCOMMITTED epoch-1 state

    resumed = _job(stream_dir, f"{tmp_path}/cr", "actors")
    resumed.run()
    clean = _job(stream_dir, f"{tmp_path}/clean", "actors")
    clean.run()
    pd.testing.assert_frame_equal(
        _norm(clean.committed_output().to_pandas()),
        _norm(resumed.committed_output().to_pandas()),
        check_dtype=False,
    )
