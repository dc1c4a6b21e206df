"""Round-4 fifth batch: term frequency spectrum (Zipf count-of-counts)
and the Q5-style revenue_by_nation multi-join capstone."""

import collections

import numpy as np
import pyarrow as pa
import pandas as pd
import ray.data as rd


def _blocks(df, nblocks=5):
    return rd.from_pandas([d for _, d in df.groupby(np.arange(len(df)) % nblocks)])


def test_term_frequency_spectrum(ray_session):
    from vaero_ray.stages.textstats import term_frequency_spectrum

    docs = [
        "the cat sat on the mat",
        "the dog ate the bone",
        "  CAT and Dog  ",
        "",
        "mat mat mat",
    ]
    df = pd.DataFrame({"doc_id": range(len(docs)), "text": docs})
    counts = collections.Counter(t for d in docs for t in d.lower().split())
    spectrum = collections.Counter(counts.values())
    got = (
        term_frequency_spectrum(_blocks(df, 3))
        .to_pandas()
        .sort_values("occurrences", ignore_index=True)
    )
    exp = (
        pd.DataFrame(sorted(spectrum.items()), columns=["occurrences", "n_terms"])
        .astype(np.int64)
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    # sanity: spectrum mass == vocabulary size
    assert int((got["n_terms"]).sum()) == len(counts)


def test_term_frequency_spectrum_empty(ray_session):
    from vaero_ray.stages.textstats import term_frequency_spectrum

    df = pd.DataFrame({"doc_id": [0, 1], "text": ["", "   "]})
    got = term_frequency_spectrum(_blocks(df, 2)).to_pandas()
    assert len(got) == 0


def test_revenue_by_nation_matches_pandas(ray_session, tmp_path):
    """End-to-end over a tiny synthetic TPC-H slice, checked against a
    pandas recomputation with the same per-line fixed-point rule."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(7)
    region = pd.DataFrame(
        {"r_regionkey": np.arange(3, dtype=np.int32), "r_name": ["ASIA", "EUROPE", "AFRICA"]}
    )
    nation = pd.DataFrame(
        {
            "n_nationkey": np.arange(6, dtype=np.int32),
            "n_name": [f"N{i}" for i in range(6)],
            "n_regionkey": np.array([0, 0, 1, 1, 2, 0], dtype=np.int32),
        }
    )
    ncust = 40
    customer = pd.DataFrame(
        {
            "c_custkey": np.arange(ncust, dtype=np.int64),
            "c_nationkey": rng.integers(0, 6, ncust).astype(np.int32),
        }
    )
    nord = 200
    orders = pd.DataFrame(
        {
            "o_orderkey": np.arange(nord, dtype=np.int64),
            "o_custkey": rng.integers(0, ncust, nord).astype(np.int64),
            "o_orderdate": pd.to_datetime("1995-06-01")
            + pd.to_timedelta(rng.integers(0, 1500, nord), unit="D"),
        }
    )
    nline = 800
    lineitem = pd.DataFrame(
        {
            "l_orderkey": rng.integers(0, nord, nline).astype(np.int64),
            "l_extendedprice": rng.uniform(10, 9000, nline).round(2),
            "l_discount": rng.integers(0, 11, nline) / 100.0,
        }
    )
    sf = tmp_path / "sf"
    sf.mkdir()
    for name, df in [
        ("region", region),
        ("nation", nation),
        ("customer", customer),
        ("orders", orders),
        ("lineitem", lineitem),
    ]:
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False), sf / f"{name}.parquet")

    from vaero_ray.pipelines.queries import q_revenue_by_nation

    got = (
        q_revenue_by_nation(str(sf)).to_pandas().sort_values("n_name", ignore_index=True)
    )

    li = lineitem.copy()
    li["rev"] = np.floor(
        li["l_extendedprice"] * (1 - li["l_discount"]) * 100 + 0.5
    ).astype(np.int64)
    o = orders[
        (orders["o_orderdate"] >= pd.Timestamp("1996-01-01"))
        & (orders["o_orderdate"] < pd.Timestamp("1998-01-01"))
    ]
    m = (
        li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
        .merge(customer, left_on="o_custkey", right_on="c_custkey")
        .merge(nation, left_on="c_nationkey", right_on="n_nationkey")
        .merge(region, left_on="n_regionkey", right_on="r_regionkey")
    )
    m = m[m["r_name"] == "ASIA"]
    exp = (
        m.groupby("n_name", as_index=False)["rev"]
        .sum()
        .rename(columns={"rev": "revenue_cents"})
        .sort_values("n_name", ignore_index=True)
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_range_join_chunked_expansion_hot_key(ray_session):
    """One hot key whose candidate set crosses the CAND_CHUNK slice
    boundary: the chunked expansion must emit the exact same pair set
    (count + per-pair sums) as the closed form. 2,200 left rows x 2,000
    fully-overlapping intervals = 4.4M candidates > one 4M chunk."""
    import ray.data as rd

    from vaero_ray.stages.joins import range_join

    base = pd.Timestamp("2026-01-01")
    nl, nr = 2200, 2000
    lv = pd.DataFrame(
        {
            "k": np.zeros(nl, dtype=np.int64),
            "lid": np.arange(nl, dtype=np.int64),
            "ts": base + pd.to_timedelta(np.arange(nl), unit="s"),
        }
    )
    rv = pd.DataFrame(
        {
            "k": np.zeros(nr, dtype=np.int64),
            "rid": np.arange(nr, dtype=np.int64),
            "start": base,
            "end": base + pd.to_timedelta(nl + 1, unit="s"),
        }
    )
    out = range_join(
        rd.from_pandas(lv), rd.from_pandas(rv), key="k",
        left_ts="ts", right_start="start", right_end="end", num_buckets=2,
    )
    # every (left, right) pair matches: counts and id-sums are closed-form
    assert out.count() == nl * nr
    assert out.sum("lid") == nr * (nl - 1) * nl // 2
    assert out.sum("rid") == nl * (nr - 1) * nr // 2


def test_corr_per_group_matches_pandas(ray_session):
    from vaero_ray.stages.relational import corr_per_group

    rng = np.random.default_rng(3)
    n = 400
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 6, n),
            "x": rng.integers(0, 500, n).astype(np.int64),
        }
    )
    df["y"] = (df["x"] * 2 + rng.integers(0, 100, n)).astype(np.int64)
    # one constant-x group: zero variance -> NULL corr
    df.loc[df["k"] == 5, "x"] = 7
    got = (
        corr_per_group(_blocks(df, 4), "k", "x", "y")
        .to_pandas()
        .sort_values("k", ignore_index=True)
    )
    for _, r in got.iterrows():
        g = df[df["k"] == r["k"]]
        exp = g["x"].corr(g["y"])
        if r["k"] == 5:
            assert pd.isna(r["corr_xy"])
        else:
            assert abs(r["corr_xy"] - exp) < 1e-6
        assert r["n_rows"] == len(g)


def test_set_op_and_keyed_sum_keep_null_groups(ray_session):
    """SQL GROUP BY / EXCEPT keep the NULL group; pandas groupby's
    default dropna=True silently dropped it in the bucketed merges
    (review-caught regression)."""
    from vaero_ray.stages.keyed import bucketed_keyed_sum
    from vaero_ray.stages.relational import distinct_set_op

    a = pd.DataFrame({"k": pd.array([None, "x", "y"], dtype=object)})
    b = pd.DataFrame({"k": pd.array(["x"], dtype=object)})
    got = distinct_set_op(
        _blocks(a, 2), _blocks(b, 1), ["k"], "except"
    ).to_pandas()
    vals = set(got["k"].tolist())
    assert "y" in vals and len(got) == 2  # NULL row survives EXCEPT
    assert got["k"].isna().sum() == 1

    parts = pd.DataFrame(
        {"k": pd.array(["x", None, None], dtype=object), "v": [1, 2, 3]}
    )
    merged = bucketed_keyed_sum(_blocks(parts, 2), ["k"], ["v"]).to_pandas()
    null_row = merged[merged["k"].isna()]
    assert len(null_row) == 1 and int(null_row["v"].iloc[0]) == 5


def test_moving_frame_sum_matches_pandas(ray_session):
    from vaero_ray.stages.rowwindow import moving_frame_sum

    rng = np.random.default_rng(17)
    n = 400
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.integers(0, 9, n),
            # heavy ts ties to exercise the tie_col ordering
            "ts": pd.to_datetime(rng.integers(0, 40, n), unit="s"),
            "value": rng.integers(0, 500, n) / 100.0,
        }
    )
    got = (
        moving_frame_sum(
            rd.from_pandas([d for _, d in df.groupby(np.arange(n) % 4)]),
            "user_id", "ts", "value", tie_col="event_id", frame_rows=3,
            num_buckets=3,
        )
        .to_pandas()
        .sort_values("event_id", ignore_index=True)
    )
    srt = df.sort_values(["user_id", "ts", "event_id"])
    cents = np.floor(srt["value"].to_numpy() * 100 + 0.5).astype(np.int64)
    srt = srt.assign(c=cents)
    exp_sum = srt.groupby("user_id")["c"].rolling(3, min_periods=1).sum()
    exp_n = srt.groupby("user_id")["c"].rolling(3, min_periods=1).count()
    srt["frame_sum"] = exp_sum.droplevel(0)
    srt["frame_n"] = exp_n.droplevel(0)
    exp = srt.sort_values("event_id", ignore_index=True)
    assert got["frame_sum"].tolist() == exp["frame_sum"].astype(np.int64).tolist()
    assert got["frame_n"].tolist() == exp["frame_n"].astype(np.int64).tolist()


def test_lag_lead_matches_pandas(ray_session):
    from vaero_ray.stages.rowwindow import lag_lead

    rng = np.random.default_rng(23)
    n = 300
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.integers(0, 7, n),
            "ts": pd.to_datetime(rng.integers(0, 30, n), unit="s"),
            "value": rng.integers(0, 900, n) / 100.0,
        }
    )
    got = (
        lag_lead(
            rd.from_pandas([d for _, d in df.groupby(np.arange(n) % 3)]),
            "user_id", "ts", "value", tie_col="event_id", num_buckets=2,
        )
        .to_pandas()
        .sort_values("event_id", ignore_index=True)
    )
    srt = df.sort_values(["user_id", "ts", "event_id"])
    c = pd.Series(np.floor(srt["value"].to_numpy() * 100 + 0.5).astype(np.int64),
                  index=srt.index)
    srt["lag_cents"] = c.groupby(srt["user_id"]).shift(1).fillna(-1).astype(np.int64)
    srt["lead_cents"] = c.groupby(srt["user_id"]).shift(-1).fillna(-1).astype(np.int64)
    exp = srt.sort_values("event_id", ignore_index=True)
    assert got["lag_cents"].tolist() == exp["lag_cents"].tolist()
    assert got["lead_cents"].tolist() == exp["lead_cents"].tolist()


def test_chunk_documents_kernel():
    from vaero_ray.stages.textstats import chunk_documents

    tbl = pa.table(
        {
            "doc_id": pa.array([7, 8, 9], pa.int64()),
            "text": ["a b c d e f g", "  Hi   There  ", ""],
        }
    )
    out = chunk_documents(tbl, chunk_tokens=4, stride=3).to_pandas()
    # doc 7: starts 0,3,6 -> sizes 4,4,1; doc 8: one 2-token chunk
    # (case preserved, whitespace normalized); doc 9: no rows
    assert out["doc_id"].tolist() == [7, 7, 7, 8]
    assert out["chunk_idx"].tolist() == [0, 1, 2, 0]
    assert out["n_chunk_tokens"].tolist() == [4, 4, 1, 2]
    assert out["chunk_text"].tolist() == ["a b c d", "d e f g", "g", "Hi There"]


def test_token_diversity_kernel():
    from vaero_ray.stages.textstats import token_diversity

    tbl = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": ["a a a b", "", "x y z"],
        }
    )
    out = token_diversity(tbl).to_pandas()
    assert out["n_tokens"].tolist() == [4, 0, 3]
    # doc 0: counts {a:3, b:1} -> 9 + 1 = 10
    assert out["simpson_num"].tolist() == [10, 0, 3]
