"""Round-4 fourth-session additions: inverted index, end-to-end
near-dedup survivors, streaming CDC compaction (alpha=1 ordered fold)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd


def _blocks(df, n=3):
    return [df.iloc[i::n] for i in range(n)]


def test_inverted_index_matches_pandas(ray_session):
    from vaero_ray.stages.textstats import inverted_index

    docs = pd.DataFrame(
        {
            "doc_id": [10, 3, 7, 42, 5],
            "text": [
                "the cat sat",
                "the dog  ran",
                "a cat ran fast",
                "THE Cat",
                "",
            ],
        }
    )
    out = (
        inverted_index(rd.from_pandas(_blocks(docs)), min_df=2, num_buckets=4)
        .to_pandas()
        .sort_values("term", ignore_index=True)
    )
    # expected: ascending-doc-id postings per term with df >= 2
    want = {
        "cat": ("3", [7, 10, 42]),
        "ran": ("2", [3, 7]),
        "the": ("3", [3, 10, 42]),
    }
    assert sorted(out["term"]) == sorted(want)
    for _, r in out.iterrows():
        df_want, ids = want[r["term"]]
        assert int(r["df"]) == int(df_want)
        assert r["postings"] == ",".join(str(i) for i in ids)


def test_inverted_index_max_df_cap(ray_session):
    from vaero_ray.stages.textstats import inverted_index

    docs = pd.DataFrame(
        {
            "doc_id": np.arange(20, dtype=np.int64),
            # 'stop' in every doc; 'rare' in docs 0 and 1
            "text": ["stop rare" if i < 2 else "stop" for i in range(20)],
        }
    )
    out = inverted_index(
        rd.from_pandas(_blocks(docs)), min_df=2, max_df=10, num_buckets=4
    ).to_pandas()
    assert out["term"].tolist() == ["rare"]
    assert out["postings"].tolist() == ["0,1"]


def test_inverted_index_dups_within_doc_count_once(ray_session):
    from vaero_ray.stages.textstats import inverted_index

    docs = pd.DataFrame({"doc_id": [1, 2], "text": ["x x x y", "y x"]})
    out = (
        inverted_index(rd.from_pandas([docs]), min_df=1, num_buckets=2)
        .to_pandas()
        .set_index("term")
    )
    assert int(out.loc["x", "df"]) == 2 and out.loc["x", "postings"] == "1,2"
    assert int(out.loc["y", "df"]) == 2 and out.loc["y", "postings"] == "1,2"


def test_inverted_index_stopword_prefilter_identical(ray_session):
    """The sampled stopword pre-filter is an exchange-volume optimization
    only: output must be bitwise-identical with it on, off, and with a
    sample too small to catch every over-cap term (the exact post-shuffle
    cap then does the dropping)."""
    from vaero_ray.stages.textstats import inverted_index

    rng = np.random.default_rng(7)
    n = 400
    # 'stop' everywhere (caught by any sample); 'semi' in half the docs
    # (over max_df globally but may dodge a tiny sample); rare tail terms
    texts = [
        "stop " + ("semi " if i % 2 == 0 else "") + f"t{rng.integers(0, 40)}"
        for i in range(n)
    ]
    docs = pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64), "text": texts})
    blocks = _blocks(docs, 8)

    def run(**kw):
        return (
            inverted_index(rd.from_pandas(blocks), min_df=2, max_df=30,
                           num_buckets=4, **kw)
            .to_pandas()
            .sort_values("term", ignore_index=True)
        )

    base = run(prefilter_stopwords=False)
    assert "stop" not in set(base["term"]) and "semi" not in set(base["term"])
    pd.testing.assert_frame_equal(run(prefilter_stopwords=True), base)
    # sample of 1*max_df=30 docs: 'semi' df within sample ~15 <= max_df,
    # so it slips the pre-filter and must be dropped post-shuffle
    pd.testing.assert_frame_equal(
        run(prefilter_stopwords=True, prefilter_sample_factor=1), base
    )
    # default "auto": in-memory input has no resolvable read lineage -> off
    pd.testing.assert_frame_equal(run(), base)


def test_near_dedup_survivors_planted_cluster(ray_session):
    """A planted 3-doc near-dup chain keeps only its min doc_id; the
    unrelated doc survives untouched (composition: edges -> CC -> anti
    semi-join, the q_near_dedup_docs shape)."""
    from vaero_ray.stages.dedup import ngram_jaccard_dups
    from vaero_ray.stages.graph import connected_components
    from vaero_ray.stages.joins import semi_join
    import pyarrow.compute as pc

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = pd.DataFrame(
        {
            "doc_id": [4, 9, 2, 30],
            "text": [
                base,
                base + " lambda",   # near-dup of base
                base + " mu",       # near-dup of base (chain via base)
                "totally different words with no shared shingles at all here",
            ],
            "source": ["s1", "s1", "s2", "s3"],
        }
    )
    ds = rd.from_pandas(_blocks(docs))
    edges = ngram_jaccard_dups(
        ds.select_columns(["doc_id", "text"]), shingle_k=3, threshold=0.5, unit="word"
    )
    labels = connected_components(edges, a_col="doc_id", b_col="dup_of")

    def losers(tbl: pa.Table) -> pa.Table:
        if not tbl.num_rows:
            return pa.table({"doc_id": pa.array([], pa.int64())})
        keep = pc.invert(pc.equal(tbl.column("doc_id"), tbl.column("cluster")))
        return tbl.filter(keep).select(["doc_id"])

    lose = labels.map_batches(losers, batch_format="pyarrow", zero_copy_batch=True)
    out = (
        semi_join(ds.select_columns(["doc_id", "source"]), lose, keys="doc_id", anti=True)
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    assert out["doc_id"].tolist() == [2, 30]  # min of {4,9,2} cluster + singleton


def test_streaming_fold_alpha1_is_last_value(ray_session, tmp_path):
    """alpha = 1/1 degrades the ordered EWMA fold to last-value-per-key
    — the CDC-compaction identity q_streaming_user_state rides."""
    import pyarrow.parquet as pq

    from vaero_ray.streaming.fold_job import StreamingFoldJob

    rng = np.random.default_rng(5)
    n = 600
    df = pd.DataFrame(
        {
            "ts": pd.Timestamp("2024-01-01")
            + pd.to_timedelta(np.sort(rng.integers(0, 100_000, n)), unit="s"),
            "event_id": np.arange(n, dtype=np.int64),
            "key": rng.integers(0, 40, n).astype(np.int64),
            "v": rng.integers(-500, 500, n).astype(np.int64),
        }
    )
    ind = tmp_path / "in"
    ind.mkdir()
    for i in range(3):
        pq.write_table(
            pa.Table.from_pandas(df.iloc[i * n // 3 : (i + 1) * n // 3], preserve_index=False),
            ind / f"chunk-{i:03d}.parquet",
        )
    job = StreamingFoldJob(
        input_dir=str(ind),
        out_dir=str(tmp_path / "out"),
        ckpt_dir=str(tmp_path / "ckpt"),
        key_col="key",
        ts_col="ts",
        tie_col="event_id",
        val_col="v",
        alpha_num=1,
        alpha_den=1,
        out_val="last_v",
        allowed_lateness_s=600,
        num_partitions=3,
    )
    job.run()
    got = job.committed_output().to_pandas().sort_values("key", ignore_index=True)
    want = (
        df.sort_values(["key", "ts", "event_id"])
        .groupby("key")
        .agg(n_events=("v", "size"), last_v=("v", "last"))
        .reset_index()
    )
    assert got["key"].tolist() == want["key"].tolist()
    assert got["last_v"].tolist() == want["last_v"].tolist()
    assert got["n_events"].tolist() == want["n_events"].tolist()


def test_global_row_number_matches_pandas(ray_session):
    from vaero_ray.stages.rowwindow import global_row_number

    rng = np.random.default_rng(3)
    n = 500
    df = pd.DataFrame(
        {
            "ts": rng.integers(0, 10_000, n).astype(np.int64),
            "id": rng.permutation(n).astype(np.int64),
            "x": rng.integers(0, 5, n).astype(np.int64),
        }
    )
    out = (
        global_row_number(rd.from_pandas(_blocks(df, 4)), keys=["ts", "id"], out_col="seq")
        .to_pandas()
        .sort_values("seq", ignore_index=True)
    )
    want = df.sort_values(["ts", "id"], ignore_index=True)
    assert out["seq"].tolist() == list(range(1, n + 1))
    assert out["id"].tolist() == want["id"].tolist()
    assert out["x"].tolist() == want["x"].tolist()


def test_global_row_number_int_key_block_order(ray_session):
    """Block minima 9 vs 10 would invert under stringified comparison —
    the regression the native-value block-offset keying guards."""
    from vaero_ray.stages.rowwindow import global_row_number

    df = pd.DataFrame({"k": np.array([9, 10, 11, 2, 100, 20], dtype=np.int64)})
    out = (
        global_row_number(rd.from_pandas(_blocks(df, 3)), keys=["k"], out_col="seq")
        .to_pandas()
        .sort_values("seq", ignore_index=True)
    )
    assert out["k"].tolist() == [2, 9, 10, 11, 20, 100]
    assert out["seq"].tolist() == [1, 2, 3, 4, 5, 6]


def test_query_topk_docs_matches_manual(ray_session):
    from vaero_ray.stages.textstats import query_topk_docs

    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                "hash hash join",      # tf: hash=2, join=1
                "join stream",         # join=1, stream=1
                "nothing relevant",
                "stream stream stream hash",  # stream=3, hash=1
            ],
        }
    )
    out = (
        query_topk_docs(rd.from_pandas(_blocks(docs, 2)), ["hash", "join", "stream"], k=3, n_docs=4)
        .to_pandas()
    )
    w = {"hash": 4000 // 2, "join": 4000 // 2, "stream": 4000 // 2}
    want = {1: 2 * w["hash"] + w["join"], 2: w["join"] + w["stream"],
            4: 3 * w["stream"] + w["hash"]}
    want_rows = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
    assert list(zip(out["doc_id"], out["score"])) == want_rows


def test_pair_pattern_stats_matches_pandas(ray_session):
    from vaero_ray.stages.convstats import pair_pattern_stats

    rng = np.random.default_rng(9)
    n = 400
    df = pd.DataFrame(
        {
            "conv_id": [f"c{v}" for v in rng.integers(0, 30, n)],
            "role": rng.choice(["user", "assistant", "tool"], n),
            "turn_idx": np.arange(n, dtype=np.int64),
        }
    )
    out = (
        pair_pattern_stats(
            rd.from_pandas(_blocks(df)), key="conv_id", col="role",
            from_val="assistant", to_val="tool", order="turn_idx",
            out_col="n_tool_calls", num_buckets=4,
        )
        .to_pandas()
        .sort_values("conv_id", ignore_index=True)
    )
    want = []
    for c, g in df.sort_values(["conv_id", "turn_idx"]).groupby("conv_id"):
        r = g["role"].to_numpy()
        want.append((c, len(g), int(((r[:-1] == "assistant") & (r[1:] == "tool")).sum())))
    want.sort()
    assert list(zip(out["conv_id"], out["n_turns"], out["n_tool_calls"])) == want


def test_exact_quantiles_disc_vs_duckdb(ray_session):
    """Radix selection must reproduce DuckDB quantile_disc exactly:
    negatives, duplicates, nulls, multi-block, extreme magnitudes."""
    import duckdb

    from vaero_ray.stages.selection import exact_quantiles_disc

    rng = np.random.default_rng(11)
    qs = [0.0, 0.25, 0.5, 0.9, 0.99, 1.0]
    con = duckdb.connect()
    for trial, vals in enumerate(
        [
            rng.integers(-1000, 1000, 500).astype(np.int64),
            rng.integers(-(2**62), 2**62, 300).astype(np.int64),
            np.array([7], dtype=np.int64),
            np.repeat(np.int64(-5), 40),
        ]
    ):
        s = pd.Series(vals, dtype="Int64")
        if trial == 0:  # sprinkle nulls: excluded from n
            s[::7] = pd.NA
        df = pd.DataFrame({"v": s})
        got = exact_quantiles_disc(rd.from_pandas(_blocks(df, 4)), "v", qs)
        con.register("t", df)
        want = [
            con.execute(f"SELECT quantile_disc(v, {q}) FROM t").fetchone()[0]
            for q in qs
        ]
        con.unregister("t")
        assert got == want, (trial, got, want)


def test_exact_quantiles_disc_all_null_raises(ray_session):
    import pytest as _pytest

    from vaero_ray.stages.selection import exact_quantiles_disc

    df = pd.DataFrame({"v": pd.Series([pd.NA] * 5, dtype="Int64")})
    with _pytest.raises(ValueError):
        exact_quantiles_disc(rd.from_pandas([df]), "v", [0.5])


def test_exact_group_quantiles_disc_vs_duckdb(ray_session):
    """Grouped radix selection: every (group, q) must equal DuckDB's
    quantile_disc GROUP BY — skewed group sizes, negatives, nulls."""
    import duckdb

    from vaero_ray.stages.selection import exact_group_quantiles_disc

    rng = np.random.default_rng(13)
    n = 2000
    df = pd.DataFrame(
        {
            "g": rng.choice(["a", "b", "c", "zz"], n, p=[0.7, 0.2, 0.09, 0.01]),
            "v": pd.Series(rng.integers(-5000, 5000, n), dtype="Int64"),
        }
    )
    df.loc[::11, "v"] = pd.NA
    qs = [0.25, 0.5, 0.9, 1.0]
    got = exact_group_quantiles_disc(rd.from_pandas(_blocks(df, 5)), "v", "g", qs)
    con = duckdb.connect()
    con.register("t", df)
    for g in ["a", "b", "c", "zz"]:
        want = [
            con.execute(
                f"SELECT quantile_disc(v, {q}) FROM t WHERE g = ?", [g]
            ).fetchone()[0]
            for q in qs
        ]
        assert got[g] == want, (g, got[g], want)


def test_table_diff_classifies(ray_session):
    """left_only / right_only / changed / identical-silent over a planted
    reconciliation scenario; duplicate keys raise."""
    import pytest as _pytest

    from vaero_ray.stages.diff import table_diff

    left = pd.DataFrame(
        {
            "id": [1, 2, 3, 4, 5],
            "text": ["a", "b", "c", "d", "e"],
            "src": ["s", "s", "t", "t", "t"],
        }
    )
    right = pd.DataFrame(
        {
            "id": [1, 2, 4, 5, 9],          # 3 dropped, 9 added
            "text": ["a", "bX", "d", "e", "z"],  # 2 mutated
            "src": ["s", "s", "t", "u", "u"],    # 5 mutated (other col)
        }
    )
    out = (
        table_diff(
            rd.from_pandas(_blocks(left)), rd.from_pandas(_blocks(right, 2)),
            keys="id", compare_cols=["text", "src"], num_buckets=3,
        )
        .to_pandas()
        .sort_values("id", ignore_index=True)
    )
    assert list(zip(out["id"], out["diff"])) == [
        (2, "changed"), (3, "left_only"), (5, "changed"), (9, "right_only"),
    ]

    dup = pd.DataFrame({"id": [7, 7], "text": ["x", "y"], "src": ["s", "s"]})
    with _pytest.raises(Exception):
        table_diff(
            rd.from_pandas([dup]), rd.from_pandas([left]),
            keys="id", compare_cols=["text"], num_buckets=2,
        ).materialize()
