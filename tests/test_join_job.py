"""Stream-stream windowed join (StreamingJoinJob): exact parity with the
batch interval join, cross-epoch buffering, per-side watermarks, late
drops, and resume == one-shot determinism."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd


def _mk_streams(tmp_path, n_epochs=4, per_epoch=300, seed=7):
    """Left/right streams over shared keys; right rows deliberately match
    left rows from EARLIER epochs (within 600 s) so pairs span epochs."""
    rng = np.random.default_rng(seed)
    ld, rdir = tmp_path / "L", tmp_path / "R"
    ld.mkdir(), rdir.mkdir()
    lrows, rrows = [], []
    t = 0
    for e in range(n_epochs):
        lt = np.sort(t + rng.integers(0, 1000, per_epoch))
        rt = np.sort(t + rng.integers(0, 1000, per_epoch))
        lrows.append(
            pd.DataFrame(
                {
                    "k": rng.integers(0, 40, per_epoch).astype(np.int64),
                    "ts": pd.to_datetime(lt, unit="s").astype("datetime64[us]"),
                    "view_id": (e * per_epoch + np.arange(per_epoch)).astype(np.int64),
                }
            )
        )
        rrows.append(
            pd.DataFrame(
                {
                    "k": rng.integers(0, 40, per_epoch).astype(np.int64),
                    "ts": pd.to_datetime(rt, unit="s").astype("datetime64[us]"),
                    "buy_id": (e * per_epoch + np.arange(per_epoch)).astype(np.int64),
                    "amount": rng.integers(1, 500, per_epoch).astype(np.int64),
                }
            )
        )
        t += 1000
    for i, df in enumerate(lrows):
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False), str(ld / f"c{i:03d}.parquet"))
    for i, df in enumerate(rrows):
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False), str(rdir / f"c{i:03d}.parquet"))
    return str(ld), str(rdir), pd.concat(lrows, ignore_index=True), pd.concat(rrows, ignore_index=True)


def _expected(lall, rall, within_s):
    m = lall.merge(rall, on="k", suffixes=("_l", "_r"))
    d = (m["ts_r"] - m["ts_l"]).dt.total_seconds()
    m = m[(d >= 0) & (d <= within_s)]
    return (
        pd.DataFrame(
            {
                "k": m["k"],
                "ts_l": m["ts_l"],
                "ts_r": m["ts_r"],
                "view_id": m["view_id"],
                "buy_id": m["buy_id"],
                "amount": m["amount"],
            }
        )
        .sort_values(["k", "ts_l", "ts_r", "view_id", "buy_id"], ignore_index=True)
    )


def _canon(df):
    return df.sort_values(["k", "ts_l", "ts_r", "view_id", "buy_id"], ignore_index=True)[
        ["k", "ts_l", "ts_r", "view_id", "buy_id", "amount"]
    ]


def _job(ld, rdir, tmp_path, sub, **kw):
    from vaero_ray.streaming.join_job import StreamingJoinJob

    return StreamingJoinJob(
        left_dir=ld,
        right_dir=rdir,
        out_dir=str(tmp_path / sub / "out"),
        ckpt_dir=str(tmp_path / sub / "ckpt"),
        key="k",
        within_s=600,
        left_cols=["view_id"],
        right_cols=["buy_id", "amount"],
        num_partitions=3,
        **kw,
    )


def test_stream_stream_join_matches_batch(ray_session, tmp_path):
    ld, rdir, lall, rall = _mk_streams(tmp_path)
    job = _job(ld, rdir, tmp_path, "a")
    ms = job.run()
    assert len(ms) >= 4
    got = _canon(job.committed_output().to_pandas())
    exp = _expected(lall, rall, 600)
    pd.testing.assert_frame_equal(got, exp)
    # cross-epoch pairs exist (right row matching an earlier epoch's left)
    assert (exp["buy_id"] // 300 > exp["view_id"] // 300).any()
    # dtypes survived the padded union (int64, not float64)
    assert got["view_id"].dtype == np.int64 and got["amount"].dtype == np.int64
    assert job.store.metrics_summary()["rows_late"] == 0


def test_stream_stream_join_resume_equals_oneshot(ray_session, tmp_path):
    ld, rdir, lall, rall = _mk_streams(tmp_path, seed=11)
    one = _job(ld, rdir, tmp_path, "one")
    one.run()
    two = _job(ld, rdir, tmp_path, "two")
    two.run(max_epochs=2, finalize=False)
    # fresh object, same checkpoint dir — resumes from the manifests
    two_b = _job(ld, rdir, tmp_path, "two")
    two_b.run()
    a = _canon(one.committed_output().to_pandas())
    b = _canon(two_b.committed_output().to_pandas())
    pd.testing.assert_frame_equal(a, b)


def test_stream_stream_join_drops_late(ray_session, tmp_path):
    # right stream redelivers epoch-0 rows in the LAST epoch: by then the
    # global watermark passed them -> late-dropped, no duplicate pairs
    ld, rdir, lall, rall = _mk_streams(tmp_path, seed=3)
    first = pq.read_table(f"{rdir}/c000.parquet")
    pq.write_table(first, f"{rdir}/c999.parquet")
    job = _job(ld, rdir, tmp_path, "late")
    job.run()
    got = _canon(job.committed_output().to_pandas())
    exp = _expected(lall, rall, 600)  # originals only — replays add nothing
    pd.testing.assert_frame_equal(got, exp)
    assert job.store.metrics_summary()["rows_late"] == len(first)


def test_stream_stream_left_outer_matches_batch(ray_session, tmp_path):
    from vaero_ray.streaming.join_job import StreamingJoinJob

    ld, rdir, lall, rall = _mk_streams(tmp_path, seed=19)
    job = StreamingJoinJob(
        left_dir=ld,
        right_dir=rdir,
        out_dir=str(tmp_path / "o" / "out"),
        ckpt_dir=str(tmp_path / "o" / "ckpt"),
        key="k",
        within_s=600,
        left_cols=["view_id"],
        right_cols=["buy_id", "amount"],
        num_partitions=3,
        join_type="left_outer",
        left_id_col="view_id",
    )
    job.run()
    got = (
        job.committed_output()
        .to_pandas()
        .sort_values(["k", "ts_l", "view_id", "ts_r", "buy_id"], ignore_index=True)[
            ["k", "ts_l", "ts_r", "view_id", "buy_id", "amount"]
        ]
    )
    m = lall.merge(rall, on="k", suffixes=("_l", "_r"), how="left")
    d = (m["ts_r"] - m["ts_l"]).dt.total_seconds()
    inner = m[(d >= 0) & (d <= 600)]
    unmatched = lall[~lall["view_id"].isin(inner["view_id"])]
    exp = pd.concat(
        [
            pd.DataFrame(
                {
                    "k": inner["k"], "ts_l": inner["ts_l"], "ts_r": inner["ts_r"],
                    "view_id": inner["view_id"], "buy_id": inner["buy_id"],
                    "amount": inner["amount"],
                }
            ),
            pd.DataFrame(
                {
                    "k": unmatched["k"], "ts_l": unmatched["ts"],
                    "ts_r": pd.NaT, "view_id": unmatched["view_id"],
                    "buy_id": pd.NA, "amount": pd.NA,
                }
            ),
        ],
        ignore_index=True,
    ).sort_values(["k", "ts_l", "view_id", "ts_r", "buy_id"], ignore_index=True)
    assert len(got) == len(exp)
    assert got["view_id"].tolist() == exp["view_id"].tolist()
    # every left row appears; matched rows carry their pairs, unmatched
    # exactly one null-right row
    gm = got[got["buy_id"].notna()]
    ge = got[got["buy_id"].isna()]
    assert sorted(ge["view_id"].tolist()) == sorted(unmatched["view_id"].tolist())
    assert gm["buy_id"].astype("int64").tolist() == exp[exp["buy_id"].notna()]["buy_id"].astype("int64").tolist()
    # a left row matched only by a LATER epoch's right must NOT be in the
    # outer set — cross-epoch matches exist in this fixture
    cross = inner[inner["buy_id"] // 300 > inner["view_id"] // 300]["view_id"]
    assert len(cross) and not ge["view_id"].isin(cross).any()


def _output_hashes(ckpt_dir):
    import hashlib
    import os

    from vaero_ray.streaming.checkpoint import CheckpointStore

    store = CheckpointStore(ckpt_dir)
    return {
        os.path.basename(os.path.dirname(f)) + "/" + os.path.basename(f):
            hashlib.sha256(open(f, "rb").read()).hexdigest()
        for f in store.committed_output_files()
    }


def test_stream_stream_join_resume_bit_identical(ray_session, tmp_path):
    """Interrupted run (fresh driver object mid-stream) produces BYTE
    identical committed output files, not just equal frames."""
    ld, rdir, _, _ = _mk_streams(tmp_path, seed=23)
    a = _job(ld, rdir, tmp_path, "ha")
    a.run()
    b1 = _job(ld, rdir, tmp_path, "hb")
    b1.run(max_epochs=2, finalize=False)
    b2 = _job(ld, rdir, tmp_path, "hb")
    b2.run()
    ha = _output_hashes(str(tmp_path / "ha" / "ckpt"))
    hb = _output_hashes(str(tmp_path / "hb" / "ckpt"))
    assert ha and ha == hb


def test_stream_stream_join_crash_midepoch_idempotent(ray_session, tmp_path):
    """Crash BETWEEN the bucket writes and the manifest commit: the rerun
    must overwrite every orphaned file byte-identically and the committed
    view must equal an uninterrupted run."""
    import glob
    import hashlib

    import pytest

    ld, rdir, _, _ = _mk_streams(tmp_path, seed=29)
    job = _job(ld, rdir, tmp_path, "c")
    job.run(max_epochs=2, finalize=False)

    crash = _job(ld, rdir, tmp_path, "c")
    crash.store.commit = lambda m: (_ for _ in ()).throw(RuntimeError("simulated crash"))
    with pytest.raises(RuntimeError):
        crash.run_epoch()
    orphans = {
        f: hashlib.sha256(open(f, "rb").read()).hexdigest()
        for f in glob.glob(str(tmp_path / "c" / "out" / "**" / "*.parquet"), recursive=True)
    }
    assert orphans

    resumed = _job(ld, rdir, tmp_path, "c")
    resumed.run()
    for f, h in orphans.items():
        assert hashlib.sha256(open(f, "rb").read()).hexdigest() == h

    clean = _job(ld, rdir, tmp_path, "clean")
    clean.run()
    pd.testing.assert_frame_equal(
        _canon(clean.committed_output().to_pandas()),
        _canon(resumed.committed_output().to_pandas()),
    )


def test_stream_stream_join_hot_key_chunked(ray_session, tmp_path, monkeypatch):
    """A single celebrity key (every row shares it) must still produce the
    exact pair set while the merge runs in bounded chunks."""
    n = 4000
    ld, rdir = tmp_path / "HL", tmp_path / "HR"
    ld.mkdir(), rdir.mkdir()
    rng = np.random.default_rng(41)
    lt = np.sort(rng.integers(0, 5000, n))
    rt = np.sort(rng.integers(0, 5000, n))
    ldf = pd.DataFrame(
        {"k": np.zeros(n, np.int64),
         "ts": pd.to_datetime(lt, unit="s").astype("datetime64[us]"),
         "view_id": np.arange(n, dtype=np.int64)}
    )
    rdf = pd.DataFrame(
        {"k": np.zeros(n, np.int64),
         "ts": pd.to_datetime(rt, unit="s").astype("datetime64[us]"),
         "buy_id": np.arange(n, dtype=np.int64),
         "amount": np.ones(n, np.int64)}
    )
    pq.write_table(pa.Table.from_pandas(ldf, preserve_index=False), str(ld / "c0.parquet"))
    pq.write_table(pa.Table.from_pandas(rdf, preserve_index=False), str(rdir / "c0.parquet"))
    from vaero_ray.streaming import join_job as jj

    job = jj.StreamingJoinJob(
        left_dir=str(ld), right_dir=str(rdir),
        out_dir=str(tmp_path / "hot" / "out"), ckpt_dir=str(tmp_path / "hot" / "ckpt"),
        key="k", within_s=600, left_cols=["view_id"], right_cols=["buy_id", "amount"],
        num_partitions=2,
    )
    job.run()
    got = _canon(job.committed_output().to_pandas())
    exp = _expected(ldf, rdf, 600)
    # 4000x4000 = 16M unfiltered candidates > the 4M cap -> chunked path
    pd.testing.assert_frame_equal(got, exp)
