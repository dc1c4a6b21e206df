"""Round-4 regression tests: ADVICE fixes (empty-block asof guard,
null-key CEP, empty-edge-set distributed CC, cap_per_key tie-break) and
the fat-bucket guard in the banded pair emitters."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd


def _ts(s):
    return pd.Timestamp(s)


def test_asof_join_right_side_with_empty_blocks(ray_session):
    """A derived right side (post-filter) carries empty blocks with NO
    columns; split_block must emit typed empty slices, not KeyError."""
    from vaero_ray.stages.joins import asof_join

    l = pd.DataFrame(
        {
            "k": ["a", "a", "b"],
            "ts": [_ts("2026-01-01 00:10"), _ts("2026-01-01 00:20"), _ts("2026-01-01 00:15")],
            "ev": [1, 2, 3],
        }
    )
    r = pd.DataFrame(
        {
            "k": ["a", "a", "b", "zz", "zz"],
            "ts": [
                _ts("2026-01-01 00:10"),
                _ts("2026-01-01 00:12"),
                _ts("2026-01-01 00:05"),
                _ts("2026-01-01 00:01"),
                _ts("2026-01-01 00:02"),
            ],
            "v": [100, 200, 300, -1, -2],
        }
    )
    # filter makes some of the 4 input blocks entirely empty downstream
    right = rd.from_pandas(r).repartition(4).filter(lambda row: row["v"] >= 0)
    got = (
        asof_join(
            rd.from_pandas(l), right, key="k", ts_col="ts",
            right_ts_out="m_ts", right_cols=["v"], num_buckets=3,
        )
        .to_pandas()
        .sort_values("ev", ignore_index=True)
    )
    assert got["v"].tolist() == [100, 200, 300]


def test_asof_join_right_side_all_empty(ray_session):
    from vaero_ray.stages.joins import asof_join

    l = pd.DataFrame({"k": ["a"], "ts": [_ts("2026-01-01")], "ev": [1]})
    r = pd.DataFrame({"k": ["a"], "ts": [_ts("2026-01-01")], "v": [5]})
    right = rd.from_pandas(r).filter(lambda row: row["v"] > 99)
    got = asof_join(
        rd.from_pandas(l), right, key="k", ts_col="ts",
        right_ts_out="m_ts", right_cols=["v"], num_buckets=2,
    ).to_pandas()
    assert len(got) == 1 and pd.isna(got["v"].iloc[0])


def test_rolling_counts_null_keys(ray_session):
    """Null keys must not scramble the offset-searchsorted composite:
    factorize(use_na_sentinel=False) keeps codes consistent with the
    sort order, so non-null keys get correct counts and null-key rows
    count among themselves."""
    from vaero_ray.stages.cep import rolling_counts

    base = pd.Timestamp("2026-01-01")
    df = pd.DataFrame(
        {
            "user": ["u1", "u1", None, "u2", None, "u1"],
            "ts": [base + pd.Timedelta(seconds=s) for s in [0, 30, 10, 5, 40, 120]],
        }
    )
    out = (
        rolling_counts(rd.from_pandas(df), key="user", ts_col="ts", window_s=60, num_buckets=1)
        .to_pandas()
        .sort_values(["ts"], ignore_index=True)
    )
    # expected via pandas per-key windows (nulls grouped together)
    def expect(g):
        ts = g["ts"].astype("int64").to_numpy()
        return [( (ts >= t - 60_000_000_000) & (ts <= t) ).sum() for t in ts]

    want = {}
    for kval, g in df.fillna({"user": "\0null"}).groupby("user"):
        for t, c in zip(g["ts"], expect(g)):
            want[(kval, t)] = c
    for _, row in out.iterrows():
        kval = row["user"] if pd.notna(row["user"]) else "\0null"
        assert row["rolling_count"] == want[(kval, row["ts"])]


def test_connected_components_distributed_empty_edges(ray_session):
    """Empty edge set in forced-distributed mode must break immediately
    (round 3 ran all 50 no-op shuffle rounds on `sum() is None`)."""
    import time

    from vaero_ray.stages.graph import connected_components

    edges = rd.from_pandas(pd.DataFrame({"doc_id": [1], "dup_of": [2]})).filter(
        lambda r: r["doc_id"] > 99
    )
    t0 = time.perf_counter()
    out = connected_components(edges, mode="distributed", max_rounds=50, num_buckets=4).to_pandas()
    wall = time.perf_counter() - t0
    assert len(out) == 0
    assert wall < 60  # 50 no-op rounds of 2 shuffles each would far exceed this


def test_cap_per_key_tie_col_deterministic(ray_session):
    from vaero_ray.stages.corpus import cap_per_key

    # heavy ties in order_col: every row has score 1; tie_col = unique id
    df = pd.DataFrame(
        {
            "src": np.repeat(["a", "b"], 50),
            "score": np.ones(100, dtype=np.int64),
            "rid": np.arange(100, dtype=np.int64)[::-1],  # reversed so order matters
        }
    )
    outs = []
    for n_blocks in (1, 5):
        ds = rd.from_pandas(df).repartition(n_blocks)
        out = (
            cap_per_key(ds, "src", 7, "score", num_buckets=2, tie_col="rid")
            .to_pandas()
            .sort_values(["src", "rid"], ignore_index=True)
        )
        outs.append(out)
    pd.testing.assert_frame_equal(outs[0], outs[1])
    # survivors are the 7 smallest rid per src
    assert outs[0].groupby("src")["rid"].apply(list).to_dict() == {
        "a": list(range(50, 57)),
        "b": list(range(0, 7)),
    }


# ---------------- fat-bucket guard (banded pair emitters) ----------------


def test_cap_bucket_logs_and_samples(caplog):
    import logging

    from vaero_ray.stages.dedup import _cap_bucket

    g = pd.DataFrame({"doc_id": np.arange(100, dtype=np.int64)})
    with caplog.at_level(logging.WARNING, logger="vaero_ray.stages.dedup"):
        out = _cap_bucket(g, 10, "testop", (1, 2))
    assert len(out) == 10 and out["doc_id"].tolist() == list(range(10))
    assert any("capping fat candidate bucket" in r.message for r in caplog.records)
    # under the cap: untouched, no log
    caplog.clear()
    with caplog.at_level(logging.WARNING, logger="vaero_ray.stages.dedup"):
        same = _cap_bucket(g, 100, "testop", (1, 2))
    assert len(same) == 100 and not caplog.records


def _identical_docs(n: int, text: str = "the same boilerplate text repeated everywhere"):
    return rd.from_pandas(
        pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64), "text": [text] * n})
    ).repartition(8)


def test_simhash_fat_bucket_capped(ray_session):
    """A planted 50k-identical-doc band bucket completes under the cap:
    only the max_bucket smallest ids pair (deterministic sample), instead
    of an unbounded 50k x 50k hamming matrix."""
    from vaero_ray.stages.dedup import simhash_dup_pairs

    out = simhash_dup_pairs(_identical_docs(50_000), max_bucket=128).to_pandas()
    assert len(out) == 128 * 127 // 2
    assert out["doc_id"].max() <= 127 and out["dup_of"].max() <= 127
    assert (out["hamming"] == 0).all()


def test_minhash_fat_bucket_capped(ray_session):
    from vaero_ray.stages.dedup import minhash_lsh_dup_edges

    out = minhash_lsh_dup_edges(_identical_docs(50_000), max_bucket=128).to_pandas()
    # per doc the smallest dup_of is kept: docs 1..127 -> dup_of 0
    assert len(out) == 127
    assert (out["dup_of"] == 0).all() and out["doc_id"].max() <= 127
    assert (out["est_jaccard"] == 1.0).all()


def test_ngram_fat_bucket_capped(ray_session):
    from vaero_ray.stages.dedup import ngram_jaccard_dups

    out = ngram_jaccard_dups(_identical_docs(50_000), max_bucket=64).to_pandas()
    assert len(out) == 64 * 63 // 2
    assert out["doc_id"].max() <= 63
    assert (out["n_common"] == out["n_union"]).all()


def test_emitters_unchanged_below_cap(ray_session):
    """Default max_bucket leaves small-bucket outputs bit-identical."""
    from vaero_ray.stages.dedup import simhash_dup_pairs

    rng = np.random.default_rng(11)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    texts = [" ".join(rng.choice(words, 12)) for _ in range(300)]
    ds = rd.from_pandas(
        pd.DataFrame({"doc_id": np.arange(300, dtype=np.int64), "text": texts})
    )
    base = (
        simhash_dup_pairs(ds)
        .to_pandas()
        .sort_values(["doc_id", "dup_of"], ignore_index=True)
    )
    huge_cap = (
        simhash_dup_pairs(ds, max_bucket=10**9)
        .to_pandas()
        .sort_values(["doc_id", "dup_of"], ignore_index=True)
    )
    pd.testing.assert_frame_equal(base, huge_cap)


# ---------------- bloom pre-filter auto threshold ----------------


def test_semi_join_bloom_auto_threshold(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from vaero_ray.stages.joins import semi_join
    from vaero_ray.stages.keyed import input_file_bytes

    lpath, rpath = str(tmp_path / "l.parquet"), str(tmp_path / "r.parquet")
    rng = np.random.default_rng(3)
    pq.write_table(
        pa.table({"k": rng.integers(0, 200, 500), "x": np.arange(500)}), lpath
    )
    pq.write_table(pa.table({"k": rng.integers(0, 120, 300)}), rpath)
    l, r = rd.read_parquet(lpath), rd.read_parquet(rpath)
    assert (input_file_bytes(r) or 0) > 0
    # in-memory datasets are not sizable -> auto resolves to off
    assert input_file_bytes(rd.from_pandas(pd.DataFrame({"k": [1]}))) is None

    def norm(ds):
        return ds.to_pandas().sort_values(["k", "x"], ignore_index=True)

    for anti in (False, True):
        plain = norm(semi_join(l, r, "k", anti=anti, num_buckets=4))
        auto_off = norm(
            semi_join(l, r, "k", anti=anti, num_buckets=4, bloom_prefilter="auto")
        )
        auto_on = norm(
            semi_join(
                l, r, "k", anti=anti, num_buckets=4,
                bloom_prefilter="auto", bloom_min_bytes=1,
            )
        )
        pd.testing.assert_frame_equal(plain, auto_off)
        pd.testing.assert_frame_equal(plain, auto_on)


# ---------------- data-size-aware bucket derivation ----------------


def test_derive_num_buckets(ray_session, tmp_path):
    import os

    import pyarrow.parquet as pq

    from vaero_ray.stages.keyed import DEFAULT_BUCKETS, derive_num_buckets, input_file_bytes

    p = str(tmp_path / "t.parquet")
    pq.write_table(pa.table({"x": np.arange(10_000, dtype=np.int64)}), p)
    ds = rd.read_parquet(p)
    sz = os.path.getsize(p)
    assert input_file_bytes(ds) == sz
    # small file: floor wins (the round-5 cpus/4 floor experiment was
    # measured slower at sf0.1 and reverted — see derive_num_buckets)
    assert derive_num_buckets(ds) == DEFAULT_BUCKETS
    # formula: ceil(3 * bytes / target), capped — above the snap band the
    # bytes rule governs unchanged
    want = max(DEFAULT_BUCKETS, min((3 * sz + 1023) // 1024, 65536))
    assert derive_num_buckets(ds, target_task_bytes=1024, n_cpus=4) == want
    # derived datasets lose the file lineage -> fall back to the floor
    assert input_file_bytes(ds.map_batches(lambda t: t, batch_format="pyarrow")) is None
    # in-memory datasets (no size estimate at all) keep the conservative default
    assert derive_num_buckets(rd.from_pandas(pd.DataFrame({"x": [1]}))) == DEFAULT_BUCKETS


def test_lineage_inmemory_bytes(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from vaero_ray.stages.keyed import lineage_inmemory_bytes

    p = str(tmp_path / "lin.parquet")
    pq.write_table(pa.table({"x": np.arange(50_000, dtype=np.int64)}), p)
    ds = rd.read_parquet(p)
    base = lineage_inmemory_bytes(ds)
    assert base is not None and base >= 50_000 * 8
    # survives map_batches/filter (which sever input_files)
    derived = ds.map_batches(lambda t: t, batch_format="pyarrow").filter(expr="x > 10")
    assert lineage_inmemory_bytes(derived) == base
    # union of two reads sums both
    assert lineage_inmemory_bytes(ds.union(rd.read_parquet(p))) == 2 * base
    # in-memory datasets have no Read op -> None
    assert lineage_inmemory_bytes(rd.from_pandas(pd.DataFrame({"x": [1]}))) is None


def test_hash_join_derived_partitions(ray_session, tmp_path):
    """hash_join with num_buckets=None derives the partition count from
    read-lineage size (~1 GiB/partition, cpus/4 floor) and still joins
    correctly; explicit num_buckets is honored unchanged."""
    import pyarrow.parquet as pq

    from vaero_ray.stages.joins import hash_join

    lp, rp = str(tmp_path / "l.parquet"), str(tmp_path / "r.parquet")
    pq.write_table(
        pa.table({"k": np.arange(1000, dtype=np.int64), "a": np.arange(1000)}), lp
    )
    pq.write_table(
        pa.table({"k": np.arange(0, 2000, 2, dtype=np.int64), "b": np.arange(1000)}), rp
    )
    out = hash_join(rd.read_parquet(lp), rd.read_parquet(rp), keys="k").to_pandas()
    exp = pd.merge(
        pd.DataFrame({"k": np.arange(1000), "a": np.arange(1000)}),
        pd.DataFrame({"k": np.arange(0, 2000, 2), "b": np.arange(1000)}),
        on="k",
    )
    pd.testing.assert_frame_equal(
        out.sort_values("k", ignore_index=True)[["k", "a", "b"]],
        exp.sort_values("k", ignore_index=True)[["k", "a", "b"]],
        check_dtype=False,
    )


# ---------------- per-poll / per-epoch secret refresh ----------------


def _counting_provider(tmp_path):
    """Provider script that bumps a counter file and returns token-<n>."""
    counter = tmp_path / "count.txt"
    counter.write_text("0")
    provider = tmp_path / "provider.py"
    provider.write_text(
        "import sys, json, pathlib\n"
        f"c = pathlib.Path({str(counter)!r})\n"
        "n = int(c.read_text()) + 1\n"
        "c.write_text(str(n))\n"
        "json.load(sys.stdin)\n"
        "print(json.dumps({'token': f'token-{n}'}))\n"
    )
    return provider, counter


def test_pull_driver_refreshes_secret_between_polls(tmp_path):
    """1 s TTL: the provider subprocess re-execs between polls and the
    rotated token reaches the connector (reference execute.go:84-96)."""
    from vaero_ray.cdk.pull_driver import PullSourceDriver
    from vaero_ray.secrets import SecretResolver

    provider, counter = _counting_provider(tmp_path)
    spec = {
        "command": f"python {provider}",
        "secrets": [{"api_token": "token"}],
        "cache_time_seconds": 1,
        "timeout_seconds": 10,
    }
    now = [0.0]
    clock = lambda: now[0]

    class FakeConnector:
        def __init__(self):
            self.token = "stale"
            self.seen_tokens = []

        def poll(self):
            self.seen_tokens.append(self.token)
            return [{"msg": "x", "n": len(self.seen_tokens)}]

    conn = FakeConnector()
    resolver = SecretResolver(spec, clock=clock)
    args = resolver.resolve_into({})  # launch-time resolution
    drv = PullSourceDriver(
        conn,
        str(tmp_path / "stream"),
        interval_s=2.0,
        sleep=lambda s: now.__setitem__(0, now[0] + s),
        clock=clock,
        secret_resolver=resolver,
        secret_args=args,
    )
    drv.run(max_polls=3)  # sleeps 2 s between polls -> ttl expires each time
    assert int(counter.read_text()) == 3  # initial + 2 refreshes
    assert conn.seen_tokens == ["token-1", "token-2", "token-3"]


def test_streaming_job_secret_refresh_called_per_epoch(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from vaero_ray.stages.windows import AggSpec
    from vaero_ray.streaming import StreamingWindowedJob

    ind = tmp_path / "in"
    ind.mkdir()
    ts = pa.array(
        pd.date_range("2026-01-01", periods=8, freq="10min").astype("datetime64[us]")
    )
    t = pa.table({"k": ["a"] * 8, "ts": ts})
    for i in range(2):
        pq.write_table(t.slice(i * 4, 4), str(ind / f"chunk-{i:04d}.parquet"))
    calls = []
    job = StreamingWindowedJob(
        input_dir=str(ind),
        out_dir=str(tmp_path / "out"),
        ckpt_dir=str(tmp_path / "ckpt"),
        keys=["k"],
        aggs=[AggSpec(None, "count", "n")],
        ts_col="ts",
        size_s=3600,
        num_partitions=2,
        secret_refresh=lambda: calls.append(1),
    )
    job.run()
    assert len(calls) >= 3  # one per epoch incl. finalize


# ---------------- real video codec path (auto-skips without pyav) --------


def test_frame_sample_real_codec_with_pyav():
    """Real container bytes through FrameSample via pyav (mirrors the
    PIL image path). Skipped in environments without av installed —
    the VXVID fake path stays covered by test_multimodal/the gate."""
    import io

    import pytest

    av = pytest.importorskip("av")

    from vaero_ray.stages.multimodal import MAGIC, FrameSample

    # encode a tiny 8-frame video in-memory
    buf = io.BytesIO()
    with av.open(buf, "w", format="mp4") as container:
        stream = container.add_stream("mpeg4", rate=4)
        stream.width, stream.height = 32, 24
        stream.pix_fmt = "yuv420p"
        for i in range(8):
            arr = np.full((24, 32, 3), i * 30, dtype=np.uint8)
            frame = av.VideoFrame.from_ndarray(arr, format="rgb24")
            for pkt in stream.encode(frame):
                container.mux(pkt)
        for pkt in stream.encode():
            container.mux(pkt)
    payload = buf.getvalue()

    tbl = pa.table(
        {"doc_id": pa.array([7], pa.int64()), "media": pa.array([payload], pa.large_binary())}
    )
    out = FrameSample(stride=2)(tbl)
    assert out.num_rows == 4  # frames 0, 2, 4, 6
    assert out.column("frame_idx").to_pylist() == [0, 2, 4, 6]
    assert set(out.column("width").to_pylist()) == {32}
    assert all(m.startswith(MAGIC) for m in out.column("media").to_pylist())


def test_frame_sample_no_codec_raises_cleanly():
    from vaero_ray.stages.multimodal import FrameSample

    fs = FrameSample(stride=2)
    if fs._av is not None:
        import pytest

        pytest.skip("pyav installed: covered by the real-codec test")
    tbl = pa.table(
        {"doc_id": pa.array([1], pa.int64()), "media": pa.array([b"\x00\x01fakebytes"], pa.large_binary())}
    )
    try:
        fs(tbl)
        raise AssertionError("expected NotImplementedError")
    except NotImplementedError as e:
        assert "pyav" in str(e)


# ---------------- range join / grouped top-k / k-step CEP ----------------


def _brute_range_join(lv, rv):
    rows = []
    for _, l in lv.iterrows():
        for _, r in rv.iterrows():
            if l["k"] == r["k"] and r["start"] <= l["ts"] <= r["end"]:
                rows.append((l["k"], l["lid"], l["ts"], r["rid"], r["start"], r["end"]))
    return pd.DataFrame(
        rows, columns=["k", "lid", "ts", "rid", "start", "end"]
    ).sort_values(["k", "lid", "rid"], ignore_index=True)


def test_range_join_matches_bruteforce(ray_session):
    from vaero_ray.stages.joins import range_join

    rng = np.random.default_rng(11)
    base = pd.Timestamp("2026-01-01")
    lv = pd.DataFrame(
        {
            "k": rng.integers(0, 12, 300),
            "lid": np.arange(300, dtype=np.int64),
            "ts": base + pd.to_timedelta(rng.integers(0, 100_000, 300), unit="s"),
        }
    )
    starts = base + pd.to_timedelta(rng.integers(0, 100_000, 80), unit="s")
    rv = pd.DataFrame(
        {
            "k": rng.integers(0, 12, 80),
            "rid": np.arange(80, dtype=np.int64),
            "start": starts,
            # variable durations incl zero-length intervals
            "end": starts + pd.to_timedelta(rng.integers(0, 5_000, 80), unit="s"),
        }
    )
    out = range_join(
        rd.from_pandas(lv), rd.from_pandas(rv), key="k",
        left_ts="ts", right_start="start", right_end="end", num_buckets=4,
    ).to_pandas()
    got = out[["k", "lid", "ts", "rid", "start", "end"]].sort_values(
        ["k", "lid", "rid"], ignore_index=True
    )
    exp = _brute_range_join(lv, rv)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_range_join_inclusive_bounds_and_suffix(ray_session):
    from vaero_ray.stages.joins import range_join

    base = pd.Timestamp("2026-01-01")
    lv = pd.DataFrame({"k": [1, 1, 1], "lid": [0, 1, 2],
                       "ts": [base, base + pd.Timedelta(seconds=10), base + pd.Timedelta(seconds=11)]})
    rv = pd.DataFrame({"k": [1], "start": [base], "end": [base + pd.Timedelta(seconds=10)],
                       "lid": [99]})  # collides with left's lid -> suffixed
    out = range_join(
        rd.from_pandas(lv), rd.from_pandas(rv), key="k",
        left_ts="ts", right_start="start", right_end="end", num_buckets=2,
    ).to_pandas()
    # both boundary rows match, the 11s row does not
    assert sorted(out["lid"].tolist()) == [0, 1]
    assert "lid_r" in out.columns and set(out["lid_r"]) == {99}


def test_sequence_matches_bruteforce(ray_session):
    from vaero_ray.stages.cep import sequence_matches

    rng = np.random.default_rng(7)
    n = 600
    base = pd.Timestamp("2026-01-01")
    df = pd.DataFrame(
        {
            "u": rng.integers(0, 15, n),
            "ts": base + pd.to_timedelta(rng.integers(0, 50_000, n), unit="s"),
            "t": rng.choice(["A", "B", "C", "X"], n),
        }
    )
    w = 600
    out = (
        sequence_matches(rd.from_pandas(df), "u", "ts", "t", ["A", "B", "C"], within_s=w, num_buckets=4)
        .to_pandas().sort_values("u", ignore_index=True)
    )

    # brute-force frontier propagation per user
    wd = pd.Timedelta(seconds=w)
    exp_rows = []
    for u, g in df.groupby("u"):
        qual = sorted(g.loc[g["t"] == "A", "ts"])
        for step in ("B", "C"):
            evs = sorted(g.loc[g["t"] == step, "ts"])
            nxt = [t for t in evs if any(t - wd <= q <= t for q in qual)]
            last = [(t, t in nxt) for t in evs]
            qual = nxt
        if last := [m for _, m in last] if len(evs) else []:
            exp_rows.append((u, len(last), sum(last)))
        elif len(evs):
            exp_rows.append((u, len(evs), 0))
    exp = pd.DataFrame(exp_rows, columns=["u", "n_last", "n_matched"]).sort_values(
        "u", ignore_index=True
    )
    got = out[out["n_last"] > 0].reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype({"n_last": "int64", "n_matched": "int64"}), exp.astype({"n_last": "int64", "n_matched": "int64"})
    )


def test_top_k_per_group_exact_and_shard_invariant(ray_session):
    from vaero_ray.stages.ranking import top_k_per_group

    rng = np.random.default_rng(5)
    df = pd.DataFrame(
        {
            "g": rng.choice(list("abcdef"), 500),
            "v": rng.integers(0, 40, 500),  # heavy ties
            "id": np.arange(500, dtype=np.int64),
        }
    )
    exp = (
        df.sort_values(["v", "id"], ascending=[False, True], kind="mergesort")
        .groupby("g", sort=False).head(4)
        .sort_values(["g", "v", "id"], ascending=[True, False, True], ignore_index=True)
    )
    for nblocks in (2, 7):  # shard-invariance: same result at any block split
        ds = rd.from_pandas([d for _, d in df.groupby(np.arange(len(df)) % nblocks)])
        got = (
            top_k_per_group(ds, "g", "v", 4, tie_col="id", num_buckets=4)
            .to_pandas()
            .sort_values(["g", "v", "id"], ascending=[True, False, True], ignore_index=True)
        )
        pd.testing.assert_frame_equal(got[["g", "v", "id"]], exp[["g", "v", "id"]], check_dtype=False)


def test_composite_shift_overflow_guard(ray_session):
    from vaero_ray.stages.cep import _shifted_ts

    # ~2^40 us span x ~2^24 keys -> composite would wrap int64
    n = 1 << 12
    df = pd.DataFrame(
        {
            "k": np.arange(n, dtype=np.int64) * (1 << 12),  # codes 0..n-1
            "ts": pd.Timestamp("2026-01-01")
            + pd.to_timedelta(np.zeros(n, dtype=np.int64), unit="s"),
        }
    ).sort_values(["k", "ts"])
    # force a huge pad so off * n_codes crosses 2^63
    try:
        _shifted_ts(df, "k", "ts", pad_us=2**53)
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "overflows int64" in str(e)


def test_line_dedup_matches_bruteforce(ray_session):
    from vaero_ray.stages.dedup import line_dedup

    rng = np.random.default_rng(3)
    pool = [f"sentence number {i} with some shared text" for i in range(30)]
    docs = []
    for d in range(60):
        n = rng.integers(1, 8)
        docs.append("\n".join(
            [""] * int(rng.integers(0, 2))  # leading blank line sometimes
            + [pool[i] for i in rng.integers(0, 30, n)]
        ))
    df = pd.DataFrame({"doc_id": np.arange(60, dtype=np.int64), "text": docs})

    # brute force
    seen = {}
    exp_rows = []
    for did, text in zip(df["doc_id"], df["text"]):
        lines = text.split("\n")
        kept = []
        for idx, ln in enumerate(lines):
            if len(ln) < 2:
                kept.append(ln)
            elif ln not in seen:
                seen[ln] = (did, idx)
                kept.append(ln)
            elif seen[ln] == (did, idx):
                kept.append(ln)
        if kept:
            exp_rows.append((did, "\n".join(kept), len(lines), len(kept)))
    exp = pd.DataFrame(exp_rows, columns=["doc_id", "text", "n_lines", "n_kept"])

    for nblocks in (1, 5):  # shard-invariance
        ds = rd.from_pandas([d for _, d in df.groupby(np.arange(len(df)) % nblocks)])
        got = (
            line_dedup(ds, num_buckets=4)
            .to_pandas()
            .sort_values("doc_id", ignore_index=True)
        )
        pd.testing.assert_frame_equal(
            got.astype({"n_lines": "int64", "n_kept": "int64"}),
            exp.reset_index(drop=True).astype({"n_lines": "int64", "n_kept": "int64"}),
            check_dtype=False,
        )


def test_pivot_counts_matches_crosstab(ray_session):
    from vaero_ray.stages.pivot import pivot_counts

    rng = np.random.default_rng(9)
    df = pd.DataFrame(
        {
            "u": rng.integers(0, 25, 800),
            "t": rng.choice(["a", "b", "c", "zz"], 800),  # zz not in categories
        }
    )
    exp = (
        pd.crosstab(df.loc[df["t"] != "zz", "u"], df.loc[df["t"] != "zz", "t"])
        .reindex(columns=["a", "b", "c"], fill_value=0)
        .reset_index()
        .rename(columns={"a": "n_a", "b": "n_b", "c": "n_c"})
        .sort_values("u", ignore_index=True)
    )
    for nblocks in (1, 6):
        ds = rd.from_pandas([d for _, d in df.groupby(np.arange(len(df)) % nblocks)])
        got = (
            pivot_counts(ds, "u", "t", ["a", "b", "c"])
            .to_pandas()
            .sort_values("u", ignore_index=True)
        )
        pd.testing.assert_frame_equal(
            got.astype({c: "int64" for c in ("n_a", "n_b", "n_c")}),
            exp.astype({c: "int64" for c in ("n_a", "n_b", "n_c")}),
            check_dtype=False, check_names=False,
        )


def test_tfidf_topk_matches_bruteforce(ray_session):
    from vaero_ray.stages.textstats import tfidf_topk

    rng = np.random.default_rng(2)
    pool = ["alpha", "beta", "gamma", "delta", "rare", "unique"]
    docs = [" ".join(rng.choice(pool, rng.integers(3, 12), p=[.3,.3,.2,.1,.05,.05]))
            for _ in range(40)]
    df = pd.DataFrame({"doc_id": np.arange(40, dtype=np.int64), "text": docs})
    n = len(df)

    # brute force
    from collections import Counter
    tfs = [Counter(t.split()) for t in docs]
    dfreq = Counter()
    for c in tfs:
        dfreq.update(c.keys())
    rows = []
    for did, c in zip(df["doc_id"], tfs):
        scored = sorted(
            ((term, tf, dfreq[term], tf * ((1000 * n) // dfreq[term])) for term, tf in c.items()),
            key=lambda r: (-r[3], r[0]),
        )[:2]
        rows.extend((did, *r) for r in scored)
    exp = pd.DataFrame(rows, columns=["doc_id", "term", "tf", "df", "score"]).sort_values(
        ["doc_id", "term"], ignore_index=True
    )

    ds = rd.from_pandas([d for _, d in df.groupby(np.arange(len(df)) % 4)])
    got = (
        tfidf_topk(ds, k=2, n_docs=n, num_buckets=3)
        .to_pandas()[["doc_id", "term", "tf", "df", "score"]]
        .sort_values(["doc_id", "term"], ignore_index=True)
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


# ---------------------------------------------------------------- rowwindow


def _rw_events(n=600, keys=12, seed=7):
    rng = np.random.default_rng(seed)
    ts = pd.to_datetime(
        np.sort(rng.integers(0, 3_600_000, n)) * 1000, unit="us", utc=False
    ).tz_localize(None)
    # inject exact-tie timestamps to exercise the tie_col ordering
    ts = ts.to_numpy()
    ts[50:60] = ts[50]
    return pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.integers(0, keys, n),
            "ts": ts,
            "value": np.round(rng.uniform(0, 50, n), 2),
        }
    )


def _rw_blocks(df, nblocks=5):
    return rd.from_pandas([d for _, d in df.groupby(np.arange(len(df)) % nblocks)])


def test_compact_latest_matches_pandas(ray_session):
    from vaero_ray.stages.rowwindow import compact_latest

    df = _rw_events()
    exp = (
        df.sort_values(["user_id", "ts", "event_id"])
        .drop_duplicates("user_id", keep="last")
        .sort_values("user_id", ignore_index=True)
    )
    got = (
        compact_latest(_rw_blocks(df), "user_id", "ts", "event_id", num_buckets=4)
        .to_pandas()[exp.columns.tolist()]
        .sort_values("user_id", ignore_index=True)
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_running_sum_matches_pandas(ray_session):
    from vaero_ray.stages.rowwindow import running_sum

    df = _rw_events()
    cents = np.floor(df["value"].to_numpy() * 100 + 0.5).astype(np.int64)
    exp = df.assign(__c=cents).sort_values(["user_id", "ts", "event_id"])
    exp["running_cents"] = exp.groupby("user_id")["__c"].cumsum()
    exp = exp.drop(columns="__c").sort_values("event_id", ignore_index=True)
    got = (
        running_sum(
            _rw_blocks(df), "user_id", "ts", "value",
            tie_col="event_id", out="running_cents", num_buckets=4,
        )
        .to_pandas()[exp.columns.tolist()]
        .sort_values("event_id", ignore_index=True)
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_interarrival_and_sessionize_match_pandas(ray_session):
    from vaero_ray.stages.rowwindow import interarrival, sessionize

    df = _rw_events()
    s = df.sort_values(["user_id", "ts", "event_id"]).copy()
    tsi = s["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
    prev = s.groupby("user_id")["ts"].shift()
    gap = tsi - prev.to_numpy().astype("datetime64[us]").astype(np.int64)
    s["gap_us"] = np.where(prev.isna(), -1, gap).astype(np.int64)
    GAP = 600 * 1_000_000
    s["session_id"] = (
        ((s["gap_us"] < 0) | (s["gap_us"] > GAP)).astype(np.int64)
        .groupby(s["user_id"].to_numpy()).cumsum()
    )
    exp = s.sort_values("event_id", ignore_index=True)

    got_gap = (
        interarrival(_rw_blocks(df), "user_id", "ts", tie_col="event_id", num_buckets=4)
        .to_pandas()
        .sort_values("event_id", ignore_index=True)
    )
    pd.testing.assert_series_equal(got_gap["gap_us"], exp["gap_us"], check_dtype=False)

    got_sess = (
        sessionize(
            _rw_blocks(df), "user_id", "ts", tie_col="event_id", gap_s=600, num_buckets=4
        )
        .to_pandas()
        .sort_values("event_id", ignore_index=True)
    )
    pd.testing.assert_series_equal(
        got_sess["session_id"], exp["session_id"], check_dtype=False, check_names=False
    )


# ---------------------------------------------------------------- relational


def test_rollup_counts_all_levels(ray_session):
    from vaero_ray.stages.relational import ROLLUP_ALL, rollup_counts

    rng = np.random.default_rng(11)
    df = pd.DataFrame(
        {
            "a": rng.choice(["x", "y", "z"], 300),
            "b": rng.choice(["p", "q"], 300),
            "v": rng.integers(0, 100, 300),
        }
    )
    ds = rd.from_pandas([d for _, d in df.groupby(np.arange(len(df)) % 4)])
    got = (
        rollup_counts(ds, ["a", "b"], measure="v")
        .to_pandas()
        .sort_values(["a", "b"], ignore_index=True)
    )
    lvl2 = df.groupby(["a", "b"], as_index=False).agg(
        n_rows=("v", "size"), sum_v=("v", "sum")
    )
    lvl1 = df.groupby("a", as_index=False).agg(n_rows=("v", "size"), sum_v=("v", "sum"))
    lvl1["b"] = ROLLUP_ALL
    lvl0 = pd.DataFrame(
        {"a": [ROLLUP_ALL], "b": [ROLLUP_ALL], "n_rows": [len(df)], "sum_v": [df["v"].sum()]}
    )
    exp = (
        pd.concat([lvl2, lvl1, lvl0], ignore_index=True)[["a", "b", "n_rows", "sum_v"]]
        .sort_values(["a", "b"], ignore_index=True)
    )
    pd.testing.assert_frame_equal(
        got[["a", "b", "n_rows", "sum_v"]].astype({"n_rows": "int64", "sum_v": "int64"}),
        exp.astype({"n_rows": "int64", "sum_v": "int64"}),
    )


def test_grouped_median_matches_pandas(ray_session):
    from vaero_ray.stages.relational import grouped_median

    rng = np.random.default_rng(12)
    df = pd.DataFrame(
        {"k": rng.integers(0, 9, 401), "v": rng.integers(0, 1000, 401)}
    )
    ds = rd.from_pandas([d for _, d in df.groupby(np.arange(len(df)) % 3)])
    got = (
        grouped_median(ds, "k", "v", out="med", num_buckets=3)
        .to_pandas()
        .sort_values("k", ignore_index=True)
    )
    exp_rows = []
    for k, g in df.groupby("k"):
        vs = np.sort(g["v"].to_numpy())
        exp_rows.append((k, vs[(len(vs) - 1) // 2], len(vs)))
    exp = pd.DataFrame(exp_rows, columns=["k", "med", "n_rows"])
    pd.testing.assert_frame_equal(got.astype("int64"), exp.astype("int64"))


def test_explode_lines_positions(ray_session):
    from vaero_ray.stages.relational import explode_lines

    df = pd.DataFrame(
        {
            "doc_id": np.arange(4, dtype=np.int64),
            "text": ["a b c", "", "x  y", "solo"],  # double space -> empty token
        }
    )
    ds = rd.from_pandas([df.iloc[:2], df.iloc[2:]])
    got = (
        explode_lines(ds, "text", "doc_id", sep=" ", out_col="tok", idx_col="i")
        .to_pandas()
        .sort_values(["doc_id", "i"], ignore_index=True)
    )
    exp = pd.DataFrame(
        {
            "doc_id": [0, 0, 0, 1, 2, 2, 2, 3],
            "i": [0, 1, 2, 0, 0, 1, 2, 0],
            "tok": ["a", "b", "c", "", "x", "", "y", "solo"],
        }
    )
    pd.testing.assert_frame_equal(
        got.astype({"doc_id": "int64", "i": "int64"}), exp.astype({"doc_id": "int64", "i": "int64"})
    )


def test_full_outer_hash_join(ray_session):
    from vaero_ray.stages.joins import hash_join

    l = pd.DataFrame({"k": [1, 2, 3], "lv": [10, 20, 30]})
    r = pd.DataFrame({"k": [2, 3, 4], "rv": [200, 300, 400]})
    out = hash_join(
        rd.from_pandas(l), rd.from_pandas(r), keys="k",
        join_type="full outer", num_buckets=2,
    ).to_pandas()
    # key may arrive coalesced or split depending on the join path
    if "k_r" in out.columns:
        out["k"] = out["k"].fillna(out["k_r"])
        out = out.drop(columns="k_r")
    out = out.sort_values("k", ignore_index=True)
    assert out["k"].tolist() == [1, 2, 3, 4]
    assert out["lv"].fillna(-1).tolist() == [10, 20, 30, -1]
    assert out["rv"].fillna(-1).tolist() == [-1, 200, 300, 400]


def test_normalize_text_kernel(ray_session):
    from vaero_ray.stages.textstats import normalize_text

    tbl = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": ["  HeLLo   World ", "a\tb\nc", ""],
        }
    )
    out = normalize_text(tbl, "text")
    assert out.column("norm_text").to_pylist() == ["hello world", "a b c", ""]
    assert out.column("n_chars_norm").to_pylist() == [11, 5, 0]


def test_right_outer_hash_join(ray_session):
    from vaero_ray.stages.joins import hash_join

    l = pd.DataFrame({"k": [1, 2], "lv": [10, 20]})
    r = pd.DataFrame({"k": [2, 3], "rv": [200, 300]})
    out = hash_join(
        rd.from_pandas(l), rd.from_pandas(r), keys="k",
        join_type="right outer", num_buckets=2,
    ).to_pandas()
    if "k_r" in out.columns:
        out["k"] = out["k"].fillna(out["k_r"])
        out = out.drop(columns="k_r")
    out = out.sort_values("k", ignore_index=True)
    assert out["k"].tolist() == [2, 3]
    assert out["lv"].fillna(-1).tolist() == [20, -1]
    assert out["rv"].tolist() == [200, 300]
