"""Round-4 sixth-session additions: interval union (merge_intervals),
weighted bottom-k sampling (weighted_sample_k), trimmed mean via radix
selection (trimmed_stats)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd


def _blocks(df, n=3):
    return [df.iloc[i::n] for i in range(n)]


def _ref_merge(df):
    """Reference interval union per key, plain python sweep."""
    out = []
    for k, g in df.groupby("k", dropna=False):
        g = g.sort_values(["s", "e"])
        cs = ce = None
        n = 0
        for s, e in zip(g["s"], g["e"]):
            if cs is None:
                cs, ce, n = s, e, 1
            elif s <= ce:  # overlap or touch
                ce, n = max(ce, e), n + 1
            else:
                out.append((k, cs, ce, n))
                cs, ce, n = s, e, 1
        if cs is not None:
            out.append((k, cs, ce, n))
    return sorted(out)


def test_merge_intervals_matches_reference_sweep(ray_session):
    from vaero_ray.stages.cep import merge_intervals

    rng = np.random.default_rng(11)
    n = 4000
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 60, n),
            "s": rng.integers(0, 10**6, n).astype(np.int64),
        }
    )
    df["e"] = df["s"] + rng.integers(0, 4000, n)
    out = (
        merge_intervals(rd.from_pandas(_blocks(df, 5)), "k", "s", "e", num_buckets=7)
        .to_pandas()
        .sort_values(["k", "s"], ignore_index=True)
    )
    assert _ref_merge(df) == list(zip(out["k"], out["s"], out["e"], out["n_merged"]))
    # shard/bucket invariance: different layout, same bitwise result
    out2 = (
        merge_intervals(rd.from_pandas(_blocks(df, 2)), "k", "s", "e", num_buckets=3)
        .to_pandas()
        .sort_values(["k", "s"], ignore_index=True)
    )
    pd.testing.assert_frame_equal(out, out2)


def test_merge_intervals_touching_and_timestamps(ray_session):
    from vaero_ray.stages.cep import merge_intervals

    base = pd.Timestamp("2026-01-01")
    df = pd.DataFrame(
        {
            "k": ["a", "a", "a", "b"],
            "s": [base, base + pd.Timedelta(seconds=10), base + pd.Timedelta(seconds=30), base],
            "e": [
                base + pd.Timedelta(seconds=10),  # touches the next -> merges
                base + pd.Timedelta(seconds=20),
                base + pd.Timedelta(seconds=40),  # gap before this one
                base + pd.Timedelta(seconds=5),
            ],
        }
    )
    out = (
        merge_intervals(rd.from_pandas([df]), "k", "s", "e", num_buckets=2)
        .to_pandas()
        .sort_values(["k", "s"], ignore_index=True)
    )
    assert len(out) == 3
    assert out["s"].dtype.kind == "M" and out["e"].dtype.kind == "M"
    a = out[out["k"] == "a"].reset_index(drop=True)
    assert a.loc[0, "e"] == base + pd.Timedelta(seconds=20)
    assert a.loc[0, "n_merged"] == 2 and a.loc[1, "n_merged"] == 1


def test_merge_intervals_rejects_bad_extents(ray_session):
    from vaero_ray.stages.cep import merge_intervals

    rev = pd.DataFrame({"k": [1], "s": [10], "e": [5]})
    with pytest.raises(Exception):
        merge_intervals(rd.from_pandas([rev]), "k", "s", "e", num_buckets=1).materialize()
    nul = pd.DataFrame({"k": [1, 1], "s": [1.0, np.nan], "e": [2.0, 3.0]})
    with pytest.raises(Exception):
        merge_intervals(rd.from_pandas([nul]), "k", "s", "e", num_buckets=1).materialize()


def test_weighted_sample_k_deterministic_and_weighted(ray_session):
    from vaero_ray.stages.corpus import weighted_sample_k

    n = 6000
    df = pd.DataFrame({"id": np.arange(n, dtype=np.int64)})
    df["w"] = (df["id"] % 10 == 0).astype(np.int64) * 9 + 1  # 10% rows weight 10
    a = (
        weighted_sample_k(rd.from_pandas(_blocks(df, 4)), "id", "w", 600, max_weight=10)
        .to_pandas()
        .sort_values("id", ignore_index=True)
    )
    b = (
        weighted_sample_k(rd.from_pandas(_blocks(df, 9)), "id", "w", 600, max_weight=10)
        .to_pandas()
        .sort_values("id", ignore_index=True)
    )
    pd.testing.assert_frame_equal(a, b)  # membership independent of layout
    assert len(a) == 600
    # heavy rows (10x tickets) must be strongly over-represented: they are
    # 10% of rows but hold ~52% of tickets; expect well over 2x base rate
    heavy = (a["w"] == 10).mean()
    assert heavy > 0.3, heavy

    with pytest.raises(Exception):
        weighted_sample_k(
            rd.from_pandas([pd.DataFrame({"id": [1], "w": [99]})]), "id", "w", 1, max_weight=10
        ).materialize()
    with pytest.raises(Exception):
        weighted_sample_k(
            rd.from_pandas([pd.DataFrame({"id": [1], "w": [0]})]), "id", "w", 1, max_weight=10
        ).materialize()


def test_weighted_sample_k_weight_one_equals_sample_k(ray_session):
    from vaero_ray.stages.corpus import sample_k, weighted_sample_k

    # with all weights 1 and max_weight 1, tickets are hll_hash(id*1+0) ==
    # hll_hash(id): the uniform sampler must fall out as the special case
    df = pd.DataFrame({"id": np.arange(500, dtype=np.int64), "w": 1})
    ws = (
        weighted_sample_k(rd.from_pandas(_blocks(df)), "id", "w", 50, max_weight=1)
        .to_pandas()["id"]
        .sort_values()
        .to_numpy()
    )
    us = (
        sample_k(rd.from_pandas(_blocks(df[["id"]])), "id", 50)
        .to_pandas()["id"]
        .sort_values()
        .to_numpy()
    )
    assert np.array_equal(ws, us)


def test_trimmed_stats_matches_numpy(ray_session):
    from vaero_ray.stages.selection import trimmed_stats

    rng = np.random.default_rng(5)
    v = rng.integers(-500, 50_000, 3000).astype(np.int64)
    df = pd.DataFrame({"x": v})
    out = trimmed_stats(rd.from_pandas(_blocks(df, 6)), "x", 0.1, 0.9).to_pandas()
    sv = np.sort(v)
    lo = sv[max(int(np.ceil(0.1 * len(v))) - 1, 0)]
    hi = sv[max(int(np.ceil(0.9 * len(v))) - 1, 0)]
    kept = v[(v >= lo) & (v <= hi)]
    assert out.loc[0, "lo"] == lo and out.loc[0, "hi"] == hi
    assert out.loc[0, "n_kept"] == len(kept)
    assert out.loc[0, "sum_val"] == kept.sum()
    assert out.loc[0, "mean_val"] == float(kept.sum()) / float(len(kept))


def test_global_percent_rank_matches_pandas(ray_session):
    from vaero_ray.stages.ranking import global_percent_rank

    rng = np.random.default_rng(3)
    v = rng.integers(-50, 200, 900).astype(np.int64)  # heavy ties
    df = pd.DataFrame({"id": np.arange(900), "x": v})
    out = (
        global_percent_rank(rd.from_pandas(_blocks(df, 5)), "x")
        .to_pandas()
        .sort_values("id", ignore_index=True)
    )
    want = (df["x"].rank(method="min") - 1) / (len(df) - 1)
    assert np.array_equal(out["pct_rank"].to_numpy(), want.to_numpy())
    # different layout -> identical values
    out2 = (
        global_percent_rank(rd.from_pandas(_blocks(df, 2)), "x")
        .to_pandas()
        .sort_values("id", ignore_index=True)
    )
    pd.testing.assert_frame_equal(out, out2)


def test_global_percent_rank_nulls_and_guard(ray_session):
    from vaero_ray.stages.ranking import global_percent_rank

    df = pd.DataFrame({"id": [0, 1, 2, 3], "x": [5.0, np.nan, 5.0, 7.0]})
    out = (
        global_percent_rank(rd.from_pandas([df]), "x")
        .to_pandas()
        .sort_values("id", ignore_index=True)
    )
    # nulls excluded from n (=3) and rank as null
    assert out["pct_rank"].isna().tolist() == [False, True, False, False]
    assert out.loc[0, "pct_rank"] == 0.0 and out.loc[3, "pct_rank"] == 1.0

    big = pd.DataFrame({"x": np.arange(100, dtype=np.int64)})
    with pytest.raises(ValueError):
        global_percent_rank(rd.from_pandas([big]), "x", max_distinct=10)


def test_profile_table_matches_pandas(ray_session):
    from vaero_ray.stages.profile import profile_table

    df = pd.DataFrame(
        {
            "i": [9, 10, 2, None, 2],        # min/max must merge NATIVE (not "10"<"9")
            "s": ["b", None, "a", "a", "c"],
        }
    )
    df["i"] = df["i"].astype("Int64")
    out = (
        profile_table(rd.from_pandas(_blocks(df, 3)), ["i", "s"], num_buckets=3)
        .to_pandas()
        .set_index("col")
    )
    assert out.loc["i", "n_rows"] == 5 and out.loc["i", "n_nulls"] == 1
    assert out.loc["i", "n_distinct"] == 3
    assert out.loc["i", "min_val"] == "2" and out.loc["i", "max_val"] == "10"
    assert out.loc["s", "n_nulls"] == 1 and out.loc["s", "n_distinct"] == 3
    assert out.loc["s", "min_val"] == "a" and out.loc["s", "max_val"] == "c"


def test_contingency_chi2_matches_manual(ray_session):
    from vaero_ray.stages.relational import contingency_chi2

    rng = np.random.default_rng(9)
    df = pd.DataFrame(
        {
            "a": rng.choice(["x", "y", "z"], 2000),
            "b": rng.choice(["p", "q"], 2000, p=[0.3, 0.7]),
        }
    )
    out = (
        contingency_chi2(rd.from_pandas(_blocks(df, 4)), "a", "b", num_buckets=3)
        .to_pandas()
        .sort_values(["a", "b"], ignore_index=True)
    )
    ct = df.groupby(["a", "b"], as_index=False).size().sort_values(["a", "b"], ignore_index=True)
    assert np.array_equal(out["n"].to_numpy(), ct["size"].to_numpy())
    ra = ct.groupby("a")["size"].transform("sum").to_numpy().astype(float)
    cb = ct.groupby("b")["size"].transform("sum").to_numpy().astype(float)
    e = ra * cb / float(len(df))
    assert np.array_equal(out["expected"].to_numpy(), e)
    assert np.array_equal(out["chi2_term"].to_numpy(), (ct["size"] - e) ** 2 / e)
    # chi2 over independent uniform columns should be small-ish (sanity)
    assert out["chi2_term"].sum() < 30

    with pytest.raises(ValueError):
        contingency_chi2(rd.from_pandas([df]), "a", "b", max_cells=2)


def test_iqr_outlier_filter_matches_manual(ray_session):
    from vaero_ray.stages.selection import iqr_outlier_filter

    rng = np.random.default_rng(17)
    df = pd.DataFrame(
        {
            "id": np.arange(1200),
            "g": rng.choice(["a", "b", "c"], 1200),
            "x": rng.integers(100, 200, 1200).astype(np.int64),
        }
    )
    # plant extreme outliers in group a
    df.loc[df.index[:5], ["g", "x"]] = [["a", 10_000]] * 5
    out = (
        iqr_outlier_filter(rd.from_pandas(_blocks(df, 4)), "x", "g", k=1.5)
        .to_pandas()
        .sort_values("id", ignore_index=True)
    )

    def fences(s):
        v = np.sort(s.to_numpy())
        q1 = v[max(int(np.ceil(0.25 * len(v))) - 1, 0)]
        q3 = v[max(int(np.ceil(0.75 * len(v))) - 1, 0)]
        return q1 - 1.5 * (q3 - q1), q3 + 1.5 * (q3 - q1)

    keep = []
    for g, grp in df.groupby("g"):
        lo, hi = fences(grp["x"])
        keep.append(grp[(grp["x"] >= lo) & (grp["x"] <= hi)])
    want = pd.concat(keep).sort_values("id", ignore_index=True)
    pd.testing.assert_frame_equal(out, want)
    assert (out["x"] < 10_000).all() and len(out) < len(df)


def test_batch_levenshtein_matches_duckdb(ray_session):
    import string

    import duckdb

    from vaero_ray.stages.editdist import _batch_levenshtein

    rng = np.random.default_rng(23)
    alpha = list(string.ascii_lowercase + " ")
    A, B = [], []
    for _ in range(400):
        a = "".join(rng.choice(alpha, rng.integers(0, 50)))
        if rng.random() < 0.5:
            b = list(a)
            for _ in range(rng.integers(0, 5)):
                if not b:
                    b = ["x"]
                p = rng.integers(0, len(b))
                op = rng.integers(0, 3)
                if op == 0:
                    b[p] = "z"
                elif op == 1:
                    b.insert(p, "y")
                else:
                    b.pop(p)
            b = "".join(b)
        else:
            b = "".join(rng.choice(alpha, rng.integers(0, 50)))
        A.append(a)
        B.append(b)
    mine = _batch_levenshtein(A, B)
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"a": A, "b": B}))
    duck = con.execute("SELECT levenshtein(a, b) FROM t").df().iloc[:, 0].to_numpy()
    assert np.array_equal(mine, duck)


def test_edit_distance_pairs_blocking_and_cap(ray_session):
    from vaero_ray.stages.editdist import edit_distance_pairs

    df = pd.DataFrame(
        {
            "id": [1, 2, 3, 4, 5, 6],
            "text": ["hello", "hellq", "byeee", "hello", "zzzzz", "hellx"],
            "blk": ["a", "a", "a", "b", "b", "a"],
        }
    )
    out = (
        edit_distance_pairs(
            rd.from_pandas(_blocks(df, 2)), "id", "text", ["blk"], max_distance=2,
            num_buckets=2,
        )
        .to_pandas()
        .sort_values(["id_a", "id_b"], ignore_index=True)
    )
    # in-block pairs within distance 2: (1,2)=1, (1,6)=1, (2,6)=1; cross-block
    # (1,4) identical but different blk -> NOT a candidate
    assert list(zip(out["id_a"], out["id_b"], out["dist"])) == [
        (1, 2, 1), (1, 6, 1), (2, 6, 1),
    ]

    # fat-bucket cap: 30 identical docs capped to 5 -> C(5,2)=10 pairs survive
    fat = pd.DataFrame({"id": range(30), "text": "same", "blk": "x"})
    capped = edit_distance_pairs(
        rd.from_pandas([fat]), "id", "text", ["blk"], max_distance=0, max_bucket=5,
        num_buckets=1,
    ).to_pandas()
    assert len(capped) == 10
    assert capped["id_a"].max() <= 4  # deterministic smallest-id survivors


def test_rolling_sums_matches_brute(ray_session):
    from vaero_ray.stages.cep import rolling_sums

    rng = np.random.default_rng(31)
    n = 2000
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 40, n),
            "ts": pd.Timestamp("2026-01-01")
            + pd.to_timedelta(rng.integers(0, 50_000, n), unit="s"),
            "v": rng.integers(-100, 100, n).astype(np.int64),
        }
    )
    out = (
        rolling_sums(rd.from_pandas(_blocks(df, 4)), "k", "ts", "v", window_s=600,
                     num_buckets=5)
        .to_pandas()
        .sort_values(["k", "ts", "v"], ignore_index=True)
    )
    # brute force incl. equal-ts peers (RANGE semantics)
    want = []
    for _, r in df.iterrows():
        m = (df["k"] == r["k"]) & (df["ts"] >= r["ts"] - pd.Timedelta(seconds=600)) & (
            df["ts"] <= r["ts"]
        )
        want.append((r["k"], r["ts"], r["v"], df.loc[m, "v"].sum()))
    wdf = pd.DataFrame(want, columns=["k", "ts", "v", "rolling_sum"]).sort_values(
        ["k", "ts", "v"], ignore_index=True
    )
    wdf["rolling_sum"] = wdf["rolling_sum"].astype(np.int64)
    pd.testing.assert_frame_equal(out, wdf)


def test_transition_counts_matches_pandas(ray_session):
    from vaero_ray.stages.cep import transition_counts

    rng = np.random.default_rng(41)
    n = 3000
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 50, n),
            "ts": pd.Timestamp("2026-01-01")
            + pd.to_timedelta(rng.integers(0, 10**6, n), unit="s"),
            "st": rng.choice(["a", "b", "c", "d"], n),
            "tie": np.arange(n),
        }
    )
    out = (
        transition_counts(
            rd.from_pandas(_blocks(df, 4)), "k", "ts", "st", "tie", num_buckets=5
        )
        .to_pandas()
        .sort_values(["prev", "cur"], ignore_index=True)
    )
    s = df.sort_values(["k", "ts", "tie"])
    prev = s.groupby("k")["st"].shift(1)
    mask = prev.notna()
    want = (
        pd.DataFrame({"prev": prev[mask], "cur": s["st"][mask]})
        .groupby(["prev", "cur"], as_index=False)
        .size()
        .rename(columns={"size": "n"})
        .sort_values(["prev", "cur"], ignore_index=True)
    )
    assert np.array_equal(out["n"].to_numpy(), want["n"].to_numpy())
    assert list(out["prev"]) == list(want["prev"]) and list(out["cur"]) == list(want["cur"])
    og = want.groupby("prev")["n"].transform("sum").to_numpy()
    assert np.array_equal(
        out["p"].to_numpy(), want["n"].to_numpy().astype(float) / og.astype(float)
    )
    # probabilities per prev row sum to 1
    sums = out.groupby("prev")["p"].sum()
    assert np.allclose(sums, 1.0)


def test_weighted_quantiles_matches_brute(ray_session):
    import math

    from vaero_ray.stages.selection import exact_quantiles_disc

    rng = np.random.default_rng(53)
    v = rng.integers(-10_000, 10_000, 2500).astype(np.int64)
    w = rng.integers(0, 7, 2500).astype(np.int64)  # zero weights excluded
    w[0] = 1
    df = pd.DataFrame({"v": v, "w": w})
    qs = [0.0, 0.1, 0.5, 0.9, 1.0]
    got = exact_quantiles_disc(
        rd.from_pandas(_blocks(df, 5)), "v", qs, weight_col="w"
    )
    order = np.argsort(v, kind="stable")
    cv, cw = v[order], np.cumsum(w[order])
    W = int(w.sum())
    want = [int(cv[np.searchsorted(cw, max(math.ceil(q * W), 1))]) for q in qs]
    assert got == want
    # all-ones weights must equal the unweighted path exactly
    df1 = pd.DataFrame({"v": v, "w": np.ones(len(v), np.int64)})
    a = exact_quantiles_disc(rd.from_pandas(_blocks(df1, 4)), "v", qs, weight_col="w")
    b = exact_quantiles_disc(rd.from_pandas(_blocks(df1, 4)), "v", qs)
    assert a == b
    with pytest.raises(Exception):
        exact_quantiles_disc(
            rd.from_pandas([pd.DataFrame({"v": [1], "w": [-2]})]), "v", [0.5],
            weight_col="w",
        )


def test_state_history_matches_pandas(ray_session):
    from vaero_ray.stages.rowwindow import state_history

    rng = np.random.default_rng(61)
    n = 2500
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 40, n),
            "ts": pd.Timestamp("2026-01-01")
            + pd.to_timedelta(rng.integers(0, 10**6, n), unit="s"),
            "st": rng.choice(["a", "b", None], n, p=[0.45, 0.45, 0.1]),
            "tie": np.arange(n),
        }
    )
    out = (
        state_history(rd.from_pandas(_blocks(df, 4)), "k", "ts", "st", "tie",
                      num_buckets=5)
        .to_pandas()
        .sort_values(["k", "valid_from"], ignore_index=True)
    )
    s = df.sort_values(["k", "ts", "tie"])
    grp = s.groupby("k")["st"]
    # null-safe change detection (null run == one run)
    prev = grp.shift(1)
    chg = (s["st"].isna() != prev.isna()) | (
        s["st"].notna() & prev.notna() & (s["st"] != prev)
    ) | grp.cumcount().eq(0)
    c = s[chg]
    want = pd.DataFrame(
        {
            "k": c["k"].to_numpy(),
            "state": c["st"].to_numpy(),
            "valid_from": c["ts"].to_numpy(),
            "valid_to": c.groupby("k")["ts"].shift(-1).to_numpy(),
        }
    ).sort_values(["k", "valid_from"], ignore_index=True)
    pd.testing.assert_frame_equal(out, want)
    # runs tile each key's timeline: next valid_from == previous valid_to
    for _, g in out.groupby("k"):
        assert (g["valid_to"].iloc[:-1].to_numpy() == g["valid_from"].iloc[1:].to_numpy()).all()
        assert pd.isna(g["valid_to"].iloc[-1])


def test_grouped_weighted_quantiles_match_brute(ray_session):
    import math

    from vaero_ray.stages.selection import exact_group_quantiles_disc

    rng = np.random.default_rng(67)
    n = 3000
    df = pd.DataFrame(
        {
            "g": rng.choice(["x", "y", "z"], n, p=[0.6, 0.3, 0.1]),
            "v": rng.integers(-5000, 5000, n).astype(np.int64),
            "w": rng.integers(0, 6, n).astype(np.int64),
        }
    )
    qs = [0.25, 0.5, 0.95]
    got = exact_group_quantiles_disc(
        rd.from_pandas(_blocks(df, 5)), "v", "g", qs, weight_col="w"
    )
    for g, grp in df.groupby("g"):
        W = int(grp["w"].sum())
        order = np.argsort(grp["v"].to_numpy(), kind="stable")
        cv = grp["v"].to_numpy()[order]
        cw = np.cumsum(grp["w"].to_numpy()[order])
        want = [int(cv[np.searchsorted(cw, max(math.ceil(q * W), 1))]) for q in qs]
        assert got[g] == want, g
    # all-ones == unweighted
    df1 = df.assign(w=1)
    a = exact_group_quantiles_disc(rd.from_pandas(_blocks(df1, 4)), "v", "g", qs, weight_col="w")
    b = exact_group_quantiles_disc(rd.from_pandas(_blocks(df1, 4)), "v", "g", qs)
    assert a == b


def test_path_counts_matches_pandas(ray_session):
    from vaero_ray.stages.cep import path_counts

    rng = np.random.default_rng(71)
    n = 2000
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 30, n),
            "ts": pd.Timestamp("2026-01-01")
            + pd.to_timedelta(rng.integers(0, 10**6, n), unit="s"),
            "st": rng.choice(["a", "b", "c"], n),
            "tie": np.arange(n),
        }
    )
    out = (
        path_counts(rd.from_pandas(_blocks(df, 4)), "k", "ts", "st", "tie", depth=3,
                    num_buckets=5)
        .to_pandas()
        .sort_values(["step_1", "step_2", "step_3"], ignore_index=True)
    )
    s = df.sort_values(["k", "ts", "tie"])
    g = s.groupby("k")["st"]
    t = pd.DataFrame({"step_1": g.shift(2), "step_2": g.shift(1), "step_3": s["st"]})
    t = t.dropna()
    want = (
        t.groupby(["step_1", "step_2", "step_3"], as_index=False)
        .size()
        .rename(columns={"size": "n"})
        .sort_values(["step_1", "step_2", "step_3"], ignore_index=True)
    )
    assert np.array_equal(out["n"].to_numpy(), want["n"].to_numpy())
    assert out["n"].sum() == len(t)
    assert abs(out["p"].sum() - 1.0) < 1e-12
