"""Session-7 numstats tier: corr_matrix / regression / entropy / gini /
rank-sum vs brute-force numpy oracles on randomized inputs."""

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd


def _rng():
    return np.random.default_rng(42)


def test_corr_matrix_matches_numpy(ray_session):
    from vaero_ray.stages.numstats import corr_matrix

    rng = _rng()
    n = 5000
    a = rng.integers(0, 100, n)
    b = a * 3 + rng.integers(0, 50, n)  # correlated
    c = rng.integers(-20, 20, n)
    df = pd.DataFrame({"a": a, "b": b, "c": c})
    out = corr_matrix(rd.from_pandas(df).repartition(7), ["a", "b", "c"]).to_pandas()
    assert len(out) == 3
    ref = np.corrcoef(np.stack([a, b, c]))
    got = {(r.col_x, r.col_y): r.corr_xy for r in out.itertuples()}
    for (i, x), (j, y) in [((0, "a"), (1, "b")), ((0, "a"), (2, "c")), ((1, "b"), (2, "c"))]:
        assert abs(got[(x, y)] - ref[i, j]) < 1e-6
    # exact integer moments survive resharding
    out2 = corr_matrix(rd.from_pandas(df).repartition(23), ["a", "b", "c"]).to_pandas()
    pd.testing.assert_frame_equal(
        out.sort_values(["col_x", "col_y"]).reset_index(drop=True),
        out2.sort_values(["col_x", "col_y"]).reset_index(drop=True),
    )


def test_corr_matrix_zero_variance_is_null(ray_session):
    from vaero_ray.stages.numstats import corr_matrix

    df = pd.DataFrame({"a": [1, 1, 1, 1], "b": [1, 2, 3, 4]})
    out = corr_matrix(rd.from_pandas(df), ["a", "b"]).to_pandas()
    assert out["corr_xy"].isna().all()


def test_regression_per_group_matches_polyfit(ray_session):
    from vaero_ray.stages.numstats import regression_per_group

    rng = _rng()
    rows = []
    for g, slope in [("g1", 2), ("g2", -3)]:
        x = rng.integers(0, 1000, 800)
        y = slope * x + 17 + rng.integers(-40, 40, 800)
        rows.append(pd.DataFrame({"g": g, "x": x, "y": y}))
    df = pd.concat(rows, ignore_index=True)
    out = (
        regression_per_group(rd.from_pandas(df).repartition(9), "g", "x", "y")
        .to_pandas()
        .set_index("g")
    )
    for g in ["g1", "g2"]:
        sub = df[df.g == g]
        sl, ic = np.polyfit(sub.x, sub.y, 1)
        assert abs(out.loc[g, "slope"] - sl) < 1e-4
        assert abs(out.loc[g, "intercept"] - ic) < 1e-3
        r = np.corrcoef(sub.x, sub.y)[0, 1]
        assert abs(out.loc[g, "r2"] - r * r) < 1e-6


def test_regression_zero_x_variance_nulls(ray_session):
    from vaero_ray.stages.numstats import regression_per_group

    df = pd.DataFrame({"g": ["a"] * 4, "x": [5, 5, 5, 5], "y": [1, 2, 3, 4]})
    out = regression_per_group(rd.from_pandas(df), "g", "x", "y").to_pandas()
    assert out["slope"].isna().all() and out["intercept"].isna().all()


def test_entropy_per_group_matches_bruteforce(ray_session):
    from vaero_ray.stages.numstats import entropy_per_group

    rng = _rng()
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 30, 6000).astype(str),
            "cat": rng.choice(list("abcde"), 6000, p=[0.5, 0.2, 0.15, 0.1, 0.05]),
        }
    )
    out = (
        entropy_per_group(rd.from_pandas(df).repartition(11), "k", "cat")
        .to_pandas()
        .set_index("k")
    )
    for k, sub in df.groupby("k"):
        p = sub["cat"].value_counts(normalize=True).to_numpy()
        h = float(-(p * np.log(p)).sum())
        assert abs(out.loc[k, "entropy"] - h) < 2e-6
        assert out.loc[k, "n_rows"] == len(sub)
        assert out.loc[k, "n_cats"] == sub["cat"].nunique()


def test_entropy_single_category_is_zero(ray_session):
    from vaero_ray.stages.numstats import entropy_per_group

    df = pd.DataFrame({"k": ["a"] * 5, "cat": ["x"] * 5})
    out = entropy_per_group(rd.from_pandas(df), "k", "cat").to_pandas()
    assert out["entropy"].iloc[0] == 0.0


def _gini_brute(x: np.ndarray) -> float:
    x = np.sort(x)
    n = len(x)
    i = np.arange(1, n + 1)
    return float(((2 * i - n - 1) * x).sum() / (n * x.sum()))


def test_gini_per_group_matches_bruteforce(ray_session):
    from vaero_ray.stages.numstats import gini_per_group

    rng = _rng()
    df = pd.DataFrame(
        {
            "g": rng.choice(["lo", "hi", "mix"], 9000),
            # heavy ties: small integer domain
            "v": rng.integers(1, 40, 9000),
        }
    )
    # make 'hi' genuinely unequal
    df.loc[df.g == "hi", "v"] = (rng.pareto(1.5, (df.g == "hi").sum()) * 10 + 1).astype(int)
    out = (
        gini_per_group(rd.from_pandas(df).repartition(13), "g", "v")
        .to_pandas()
        .set_index("g")
    )
    for g, sub in df.groupby("g"):
        v = sub["v"].to_numpy(np.int64)
        assert abs(out.loc[g, "gini"] - _gini_brute(v)) < 1e-6
        assert out.loc[g, "n_rows"] == len(v)
        assert out.loc[g, "sum_val"] == v.sum()
    # all-equal values => gini exactly 0 via the integer numerator
    df0 = pd.DataFrame({"g": ["z"] * 6, "v": [7] * 6})
    out0 = gini_per_group(rd.from_pandas(df0), "g", "v").to_pandas()
    assert out0["gini_num"].iloc[0] == 0 and out0["gini"].iloc[0] == 0.0


def test_rank_sum_matches_bruteforce(ray_session):
    from vaero_ray.stages.numstats import rank_sum_test

    rng = _rng()
    v1 = rng.integers(0, 50, 700)
    v2 = rng.integers(10, 60, 900)
    df = pd.DataFrame(
        {
            "v": np.r_[v1, v2, rng.integers(0, 50, 100)],
            "side": ["g1"] * 700 + ["g2"] * 900 + ["other"] * 100,
        }
    )
    out = rank_sum_test(
        rd.from_pandas(df.sample(frac=1, random_state=7)).repartition(8),
        "v", "side", "g1", "g2",
    ).to_pandas()
    # brute force: average ranks over the pooled sample
    pooled = np.r_[v1, v2]
    order = pd.Series(pooled).rank(method="average").to_numpy()  # 1-based avg ranks
    r1 = order[:700].sum()
    assert out["n1"].iloc[0] == 700 and out["n2"].iloc[0] == 900
    assert out["two_r1"].iloc[0] == int(round(2 * r1))
    u1 = r1 - 700 * 701 / 2
    assert out["two_u1"].iloc[0] == int(round(2 * u1))


def test_follow_role_counts_bruteforce(ray_session):
    from vaero_ray.stages.convstats import follow_role_counts

    df = pd.DataFrame(
        {
            "conv": ["c1"] * 4 + ["c2"] * 3,
            "idx": [0, 1, 2, 3, 0, 1, 2],
            "role": ["user", "tool", "assistant", "tool", "tool", "tool", "user"],
            "tool": ["", "search", "", "web", "calc", "calc", ""],
        }
    )
    out = (
        follow_role_counts(
            rd.from_pandas(df).repartition(3),
            key="conv", col="role", from_val="tool", by_col="tool", order="idx",
        )
        .to_pandas()
        .set_index(["tool", "next"])["n"]
        .to_dict()
    )
    # c1: tool@1 -> assistant; tool@3 -> <end>; c2: tool@0 -> tool; tool@1 -> user
    assert out == {("search", "assistant"): 1, ("web", "<end>"): 1,
                   ("calc", "tool"): 1, ("calc", "user"): 1}


def test_winsorized_stats_per_group_bruteforce(ray_session):
    from vaero_ray.stages.selection import winsorized_stats_per_group

    rng = _rng()
    df = pd.DataFrame(
        {
            "g": rng.choice(["a", "b"], 4000),
            "v": rng.integers(0, 1000, 4000),
        }
    )
    out = (
        winsorized_stats_per_group(rd.from_pandas(df).repartition(7), "v", "g")
        .to_pandas()
        .set_index("g")
    )
    for g, sub in df.groupby("g"):
        v = np.sort(sub["v"].to_numpy(np.int64))
        n = len(v)
        lo = v[max(math.ceil(0.05 * n) - 1, 0)]
        hi = v[max(math.ceil(0.95 * n) - 1, 0)]
        w = np.clip(sub["v"].to_numpy(np.int64), lo, hi)
        assert out.loc[g, "lo"] == lo and out.loc[g, "hi"] == hi
        assert out.loc[g, "n_rows"] == n
        assert out.loc[g, "sum_w"] == w.sum()
        assert abs(out.loc[g, "mean_w"] - w.mean()) < 1e-12


def test_rfm_ntile_formula_matches_sql_ntile(ray_session):
    """The closed-form ntile split in q_user_rfm_scores must reproduce
    SQL NTILE(5) for n not divisible by 5 (first n%5 tiles one bigger)."""
    import duckdb

    from vaero_ray.pipelines.queries import QUERIES, ORACLES

    # tiny deterministic events table exercising n=23 users via sf0.001
    got = QUERIES["user_rfm_scores"]("/root/testdata/sf0.001").to_pandas()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/events.parquet')"
    )
    want = con.execute(ORACLES["user_rfm_scores"]).fetchdf()
    got = got.sort_values("user_id").reset_index(drop=True)
    want = want.sort_values("user_id").reset_index(drop=True)
    for c in ["r_score", "f_score", "m_score", "rfm"]:
        assert (got[c].to_numpy() == want[c].to_numpy()).all()


def test_embedding_dim_stats_bruteforce(ray_session):
    from vaero_ray.stages.ann import embedding_dim_stats

    rng = _rng()
    m = rng.normal(0, 0.3, (500, 8)).astype(np.float32)
    tbl = pa.table({"embedding": pa.array(list(m), pa.list_(pa.float32()))})
    out = (
        embedding_dim_stats(rd.from_arrow(tbl).repartition(5), "embedding")
        .to_pandas()
        .sort_values("dim")
        .reset_index(drop=True)
    )
    micro = np.floor(m.astype(np.float64) * 1e6 + 0.5).astype(np.int64)
    assert (out["sum_micro"].to_numpy() == micro.sum(0)).all()
    assert (out["sumsq_micro"].to_numpy() == (micro * micro).sum(0)).all()
    ref_mean = micro.mean(0) / 1e6
    ref_var = micro.var(0) / 1e12
    assert np.abs(out["mean_val"].to_numpy() - ref_mean).max() < 1e-9
    assert np.abs(out["var_val"].to_numpy() - ref_var).max() < 1e-9


def test_simpson_per_group_bruteforce(ray_session):
    from vaero_ray.stages.numstats import simpson_per_group

    rng = _rng()
    df = pd.DataFrame(
        {
            "k": rng.choice(["a", "b", "c"], 5000),
            "cat": rng.choice(list("xyzuv"), 5000, p=[0.4, 0.3, 0.15, 0.1, 0.05]),
        }
    )
    out = (
        simpson_per_group(rd.from_pandas(df).repartition(9), "k", "cat")
        .to_pandas()
        .set_index("k")
    )
    for k, sub in df.groupby("k"):
        c = sub["cat"].value_counts().to_numpy(np.int64)
        n = c.sum()
        num = int((c * (c - 1)).sum())
        assert out.loc[k, "simpson_num"] == num
        assert abs(out.loc[k, "simpson"] - num / (n * (n - 1))) < 1e-12
    # n=1 group -> NULL
    one = pd.DataFrame({"k": ["solo"], "cat": ["x"]})
    o1 = simpson_per_group(rd.from_pandas(one), "k", "cat").to_pandas()
    assert o1["simpson"].isna().all()


def test_entropy_from_counts_matches_entropy_per_group(ray_session):
    from vaero_ray.stages.numstats import entropy_from_counts, entropy_per_group

    rng = _rng()
    df = pd.DataFrame(
        {"k": rng.choice(["p", "q"], 3000), "cat": rng.choice(list("abc"), 3000)}
    )
    full = entropy_per_group(rd.from_pandas(df).repartition(5), "k", "cat").to_pandas()
    counts = (
        df.groupby(["k", "cat"], as_index=False).size().rename(columns={"size": "c"})
    )
    counts["c"] = counts["c"].astype("int64")
    half = entropy_from_counts(rd.from_pandas(counts), "k").to_pandas()
    pd.testing.assert_frame_equal(
        full.sort_values("k").reset_index(drop=True),
        half.sort_values("k").reset_index(drop=True),
    )
