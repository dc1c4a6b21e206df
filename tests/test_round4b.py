"""Round-4 late-batch operators: rank window functions, ordered
string_agg, distinct set ops, grouped moment sums, PII redaction, and
keep-best dedup."""

import pytest
import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd


def _ev(n=500, keys=10, seed=11):
    rng = np.random.default_rng(seed)
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.integers(0, keys, n),
            "ts": pd.to_datetime(np.sort(rng.integers(0, 10_000, n)), unit="s"),
            # coarse grid -> plenty of exact value ties for RANK/DENSE_RANK
            "value": rng.integers(0, 20, n).astype(np.float64),
            "event_type": rng.choice(["view", "click", "purchase"], n),
        }
    )
    return df


def _blocks(df, nblocks=5):
    return rd.from_pandas([d for _, d in df.groupby(np.arange(len(df)) % nblocks)])


def test_rank_rows_matches_pandas(ray_session):
    from vaero_ray.stages.rowwindow import rank_rows

    df = _ev()
    exp = df.copy()
    exp = exp.sort_values(["user_id", "value", "event_id"], ascending=[True, False, True])
    exp["rn"] = exp.groupby("user_id").cumcount() + 1
    exp["rnk"] = (
        exp.groupby("user_id")["value"].rank(method="min", ascending=False).astype(np.int64)
    )
    exp["dense_rnk"] = (
        exp.groupby("user_id")["value"].rank(method="dense", ascending=False).astype(np.int64)
    )
    exp = exp.sort_values("event_id", ignore_index=True)
    got = (
        rank_rows(_blocks(df), "user_id", "value", "event_id", descending=True, num_buckets=4)
        .to_pandas()[exp.columns.tolist()]
        .sort_values("event_id", ignore_index=True)
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_rank_rows_ascending(ray_session):
    from vaero_ray.stages.rowwindow import rank_rows

    df = _ev(n=120, keys=4, seed=3)
    exp = df.sort_values(["user_id", "value", "event_id"])
    exp = exp.assign(rn=exp.groupby("user_id").cumcount() + 1)
    exp["rnk"] = exp.groupby("user_id")["value"].rank(method="min").astype(np.int64)
    exp["dense_rnk"] = exp.groupby("user_id")["value"].rank(method="dense").astype(np.int64)
    exp = exp.sort_values("event_id", ignore_index=True)
    got = (
        rank_rows(_blocks(df, 3), "user_id", "value", "event_id", num_buckets=3)
        .to_pandas()[exp.columns.tolist()]
        .sort_values("event_id", ignore_index=True)
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_string_agg_ordered_matches_pandas(ray_session):
    from vaero_ray.stages.relational import string_agg_ordered

    df = _ev(n=300, keys=8, seed=5)
    srt = df.sort_values(["user_id", "ts", "event_id"])
    exp = (
        srt.groupby("user_id")["event_type"]
        .agg([(">".join), "size"])
        .reset_index()
        .rename(columns={"join": "path", "size": "n_rows"})
    )
    exp.columns = ["user_id", "path", "n_rows"]
    got = (
        string_agg_ordered(
            _blocks(df), "user_id", "event_type", ["ts", "event_id"], sep=">", num_buckets=4
        )
        .to_pandas()
        .sort_values("user_id", ignore_index=True)
    )
    pd.testing.assert_frame_equal(
        got, exp.sort_values("user_id", ignore_index=True), check_dtype=False
    )


def test_distinct_set_op_matches_pandas(ray_session):
    from vaero_ray.stages.relational import distinct_set_op

    a = pd.DataFrame({"k": np.array([1, 2, 2, 3, 4, 4, 5], dtype=np.int64)})
    b = pd.DataFrame({"k": np.array([2, 4, 6, 6], dtype=np.int64)})
    inter = distinct_set_op(_blocks(a, 3), _blocks(b, 2), ["k"], "intersect").to_pandas()
    assert sorted(inter["k"].tolist()) == [2, 4]
    exc = distinct_set_op(_blocks(a, 3), _blocks(b, 2), ["k"], "except").to_pandas()
    assert sorted(exc["k"].tolist()) == [1, 3, 5]


def test_distinct_set_op_empty_result_keeps_schema(ray_session):
    from vaero_ray.stages.relational import distinct_set_op

    a = pd.DataFrame({"k": np.array([1, 2], dtype=np.int64)})
    b = pd.DataFrame({"k": np.array([1, 2, 3], dtype=np.int64)})
    out = distinct_set_op(
        _blocks(a, 2), _blocks(b, 2), ["k"], "except", types={"k": pa.int64()}
    )
    # to_pandas() drops schema for all-empty datasets (Ray quirk); probe
    # the blocks themselves — downstream ops see these
    import ray

    tabs = [
        t if isinstance(t, pa.Table) else pa.Table.from_pandas(t)
        for t in (ray.get(r) for r in out.to_arrow_refs())
    ]
    assert sum(t.num_rows for t in tabs) == 0
    assert all(t.column_names == ["k"] for t in tabs if t.num_columns)
    assert any(t.column_names == ["k"] for t in tabs)


def test_grouped_moments_matches_numpy(ray_session):
    from vaero_ray.stages.relational import grouped_moments

    rng = np.random.default_rng(9)
    df = pd.DataFrame(
        {
            "g": rng.choice(["a", "b", "c"], 400),
            "x": rng.integers(0, 100, 400).astype(np.int64),
            "y": rng.integers(0, 50, 400).astype(np.int64),
        }
    )
    got = (
        grouped_moments(_blocks(df), "g", "x", "y")
        .to_pandas()
        .sort_values("g", ignore_index=True)
    )
    for _, row in got.iterrows():
        sub = df[df["g"] == row["g"]]
        assert row["n_rows"] == len(sub)
        assert row["sum_x"] == sub["x"].sum()
        assert row["sum_y"] == sub["y"].sum()
        assert row["sum_xx"] == (sub["x"] ** 2).sum()
        assert row["sum_yy"] == (sub["y"] ** 2).sum()
        assert row["sum_xy"] == (sub["x"] * sub["y"]).sum()
    # Pearson correlation derives exactly from the integer sums
    row = got.iloc[0]
    n = row["n_rows"]
    cov = n * row["sum_xy"] - row["sum_x"] * row["sum_y"]
    vx = n * row["sum_xx"] - row["sum_x"] ** 2
    vy = n * row["sum_yy"] - row["sum_y"] ** 2
    sub = df[df["g"] == row["g"]]
    expected = np.corrcoef(sub["x"], sub["y"])[0, 1]
    assert abs(cov / np.sqrt(vx * vy) - expected) < 1e-12


def test_pii_redact_kernel():
    from vaero_ray.stages.textstats import pii_redact

    tbl = pa.table(
        {
            "id": pa.array([0, 1, 2], pa.int64()),
            "text": [
                "mail a.b-c_d@foo.co.uk now",
                "host 192.168.0.1 and phone 555-123-4567",
                "no pii here",
            ],
        }
    )
    out = pii_redact(tbl, "text")
    assert out.column("n_email").to_pylist() == [1, 0, 0]
    assert out.column("n_ipv4").to_pylist() == [0, 1, 0]
    assert out.column("n_phone").to_pylist() == [0, 1, 0]
    red = out.column("redacted").to_pylist()
    assert red[0] == "mail [EMAIL] now"
    assert red[1] == "host [IP] and phone [PHONE]"
    assert red[2] == "no pii here"


def test_pii_redact_sequential_counts():
    """An IP-looking string inside an email must not double-count: the
    email rule fires first and consumes it."""
    from vaero_ray.stages.textstats import pii_redact

    tbl = pa.table({"text": ["x 10.1.2.3@host.com y"]})
    out = pii_redact(tbl, "text")
    assert out.column("n_email").to_pylist() == [1]
    assert out.column("n_ipv4").to_pylist() == [0]
    assert out.column("redacted").to_pylist() == ["x [EMAIL] y"]


@pytest.mark.parametrize("broadcast_max", [2_000_000, 0])
def test_dedup_keep_best(ray_session, broadcast_max):
    """broadcast_max=0 forces the left-outer-join fallback path; both
    label-assignment paths must emit identical survivors."""
    from vaero_ray.stages.dedup import dedup_keep_best

    docs = pd.DataFrame(
        {
            "doc_id": np.arange(6, dtype=np.int64),
            "n_chars": np.array([10, 50, 30, 7, 7, 99], dtype=np.int64),
        }
    )
    # cluster {0,1,2} (1 is best by n_chars), cluster {3,4} (tie on
    # quality -> min doc_id 3 wins), 5 is a singleton
    edges = pd.DataFrame(
        {
            "doc_id": np.array([1, 2, 4], dtype=np.int64),
            "dup_of": np.array([0, 1, 3], dtype=np.int64),
        }
    )
    out = (
        dedup_keep_best(
            _blocks(docs, 2), _blocks(edges, 2), quality_col="n_chars",
            broadcast_max_labels=broadcast_max,
        )
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    assert out["doc_id"].tolist() == [1, 3, 5]
    assert out["cluster"].tolist() == [0, 3, 5]


def test_ntile_matches_pandas_qcut_rule(ray_session):
    from vaero_ray.stages.rowwindow import rank_rows

    df = _ev(n=230, keys=7, seed=21)
    got = (
        rank_rows(_blocks(df, 3), "user_id", "value", "event_id",
                  descending=True, ntile=4, num_buckets=3)
        .to_pandas()
        .sort_values("event_id", ignore_index=True)
    )
    # SQL NTILE fill rule recomputed per group in plain python
    exp = {}
    srt = df.sort_values(["user_id", "value", "event_id"], ascending=[True, False, True])
    for _, g in srt.groupby("user_id"):
        sz = len(g)
        q, r = divmod(sz, 4)
        tile, left_in_tile, t = 1, q + (1 if r >= 1 else 0), 1
        for pos, eid in enumerate(g["event_id"]):
            cap = q + (1 if t <= r else 0)
            if left_in_tile == 0:
                t += 1
                cap = q + (1 if t <= r else 0)
                left_in_tile = cap
            exp[eid] = t
            left_in_tile -= 1
        assert t <= 4
    assert {e: t for e, t in zip(got["event_id"], got["tile"])} == exp


def test_ntile_small_groups(ray_session):
    from vaero_ray.stages.rowwindow import rank_rows

    # groups smaller than n: each row gets its own tile number == rn
    df = pd.DataFrame(
        {
            "event_id": np.arange(5, dtype=np.int64),
            "user_id": np.array([0, 0, 1, 1, 1], dtype=np.int64),
            "value": np.array([3.0, 1.0, 9.0, 9.0, 2.0]),
        }
    )
    got = (
        rank_rows(_blocks(df, 2), "user_id", "value", "event_id", ntile=10, num_buckets=2)
        .to_pandas()
        .sort_values("event_id", ignore_index=True)
    )
    assert got["tile"].tolist() == got["rn"].tolist()


def test_cube_counts_all_subsets(ray_session):
    from vaero_ray.stages.relational import ROLLUP_ALL, cube_counts

    rng = np.random.default_rng(13)
    df = pd.DataFrame(
        {
            "a": rng.choice(["x", "y"], 200),
            "b": rng.choice(["p", "q", "r"], 200),
            "v": rng.integers(0, 10, 200).astype(np.float64),
        }
    )
    got = cube_counts(_blocks(df), ["a", "b"], measure="v").to_pandas()
    # grand total
    gt = got[(got["a"] == ROLLUP_ALL) & (got["b"] == ROLLUP_ALL)]
    assert gt["n_rows"].iloc[0] == 200
    assert gt["sum_v"].iloc[0] == int(df["v"].sum())
    # each single-dim margin matches a plain groupby
    for dim, other in (("a", "b"), ("b", "a")):
        m = got[(got[other] == ROLLUP_ALL) & (got[dim] != ROLLUP_ALL)]
        exp = df.groupby(dim)["v"].agg(["size", "sum"])
        assert dict(zip(m[dim], m["n_rows"])) == exp["size"].to_dict()
    # full-detail cells match the 2-dim groupby
    full = got[(got["a"] != ROLLUP_ALL) & (got["b"] != ROLLUP_ALL)]
    exp2 = df.groupby(["a", "b"]).size()
    assert {(r["a"], r["b"]): r["n_rows"] for _, r in full.iterrows()} == exp2.to_dict()
    # 2^2 grouping sets worth of rows, nothing more
    assert len(got) == 1 + len(exp2) + df["a"].nunique() + df["b"].nunique()


def test_asof_forward_and_tolerance(ray_session):
    from vaero_ray.stages.joins import asof_join

    left = pd.DataFrame(
        {
            "k": np.array([1, 1, 2], dtype=np.int64),
            "ts": pd.to_datetime([100, 200, 100], unit="s"),
            "lid": np.arange(3, dtype=np.int64),
        }
    )
    right = pd.DataFrame(
        {
            "k": np.array([1, 1, 2], dtype=np.int64),
            "ts": pd.to_datetime([150, 500, 90], unit="s"),
        }
    )
    out = (
        asof_join(
            _blocks(left, 2), _blocks(right, 2), key="k", ts_col="ts",
            right_ts_out="m", direction="forward",
            tolerance=pd.Timedelta(seconds=100), num_buckets=2,
        )
        .to_pandas()
        .sort_values("lid", ignore_index=True)
    )
    # lid0: next right at 150 (within 100s). lid1: next right at 500 —
    # outside tolerance -> null. lid2: right at 90 is BEFORE -> null.
    assert out["m"].iloc[0] == pd.Timestamp(150, unit="s")
    assert pd.isna(out["m"].iloc[1])
    assert pd.isna(out["m"].iloc[2])
