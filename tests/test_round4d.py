"""Round-4 fourth batch: grouped exact percentile, grouped mode,
fixed-width histogram."""

import numpy as np
import pandas as pd
import ray.data as rd


def _blocks(df, nblocks=5):
    return rd.from_pandas([d for _, d in df.groupby(np.arange(len(df)) % nblocks)])


def test_grouped_percentile_matches_pick(ray_session):
    from vaero_ray.stages.relational import grouped_percentile

    rng = np.random.default_rng(11)
    df = pd.DataFrame(
        {"k": rng.integers(0, 9, 500), "v": rng.integers(0, 10_000, 500).astype(np.int64)}
    )
    rows = []
    for k, g in df.groupby("k"):
        vs = np.sort(g["v"].to_numpy())
        rows.append((k, vs[(len(vs) - 1) * 9 // 10], len(vs)))
    exp = pd.DataFrame(rows, columns=["k", "pct", "n_rows"]).sort_values("k", ignore_index=True)
    got = (
        grouped_percentile(_blocks(df), "k", "v", 9, 10, num_buckets=4)
        .to_pandas()
        .sort_values("k", ignore_index=True)
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_grouped_percentile_extremes(ray_session):
    """q=0 is the min, q=1 the max (index arithmetic edges)."""
    from vaero_ray.stages.relational import grouped_percentile

    df = pd.DataFrame({"k": [1, 1, 1, 2, 2], "v": [5, 3, 9, 10, 2]})
    lo = grouped_percentile(_blocks(df, 2), "k", "v", 0, 1).to_pandas().sort_values("k")
    hi = grouped_percentile(_blocks(df, 2), "k", "v", 1, 1).to_pandas().sort_values("k")
    assert lo["pct"].tolist() == [3, 2]
    assert hi["pct"].tolist() == [9, 10]


def test_mode_per_group_ties_to_smallest(ray_session):
    from vaero_ray.stages.relational import mode_per_group

    df = pd.DataFrame(
        {
            "k": [1] * 4 + [2] * 3,
            "v": ["b", "a", "b", "a",  # tie 2-2 -> "a"
                  "z", "z", "y"],      # clear winner "z"
        }
    )
    got = mode_per_group(_blocks(df, 3), "k", "v", num_buckets=2).to_pandas().sort_values(
        "k", ignore_index=True
    )
    assert got["mode"].tolist() == ["a", "z"]
    assert got["mode_count"].tolist() == [2, 2]


def test_mode_per_group_matches_naive(ray_session):
    from vaero_ray.stages.relational import mode_per_group

    rng = np.random.default_rng(23)
    df = pd.DataFrame(
        {"k": rng.integers(0, 12, 600), "v": rng.choice(list("abcdef"), 600)}
    )
    rows = []
    for k, g in df.groupby("k"):
        c = g["v"].value_counts()
        top = c.max()
        winners = sorted(c[c == top].index)
        rows.append((k, winners[0], int(top)))
    exp = pd.DataFrame(rows, columns=["k", "mode", "mode_count"]).sort_values(
        "k", ignore_index=True
    )
    got = mode_per_group(_blocks(df), "k", "v", num_buckets=4).to_pandas().sort_values(
        "k", ignore_index=True
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_fixed_histogram_clamps(ray_session):
    from vaero_ray.stages.sketch import fixed_histogram

    df = pd.DataFrame({"v": [-5, 0, 9, 10, 19, 20, 25, 999]})  # lo=0 w=10 nbins=3
    got = (
        fixed_histogram(_blocks(df, 3), "v", lo=0, width=10, nbins=3)
        .to_pandas()
        .sort_values("bin", ignore_index=True)
    )
    # bins: [-5,0,9]->0, [10,19]->1, [20,25,999]->2 (overflow clamped)
    assert got["bin"].tolist() == [0, 1, 2]
    assert got["bin_lo"].tolist() == [0, 10, 20]
    assert got["cnt"].tolist() == [3, 2, 3]
    assert got["cnt"].sum() == len(df)


def test_percent_rank_cume_dist_match_pandas(ray_session):
    from vaero_ray.stages.rowwindow import rank_rows

    rng = np.random.default_rng(31)
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 7, 300),
            "v": rng.integers(0, 20, 300).astype(np.int64),  # heavy ties
            "id": np.arange(300, dtype=np.int64),
        }
    )
    # singleton partition edge: percent_rank must be exactly 0.0
    df = pd.concat(
        [df, pd.DataFrame({"k": [99], "v": [5], "id": [9999]})], ignore_index=True
    )
    exp = df.copy()
    g = exp.groupby("k")["v"]
    exp["pct_rank"] = g.rank(method="min").sub(1) / g.transform("size").sub(1).clip(lower=1)
    exp.loc[exp.groupby("k")["v"].transform("size") == 1, "pct_rank"] = 0.0
    exp["cume_dist"] = g.rank(method="max") / g.transform("size")
    exp = exp.sort_values("id", ignore_index=True)
    got = (
        rank_rows(
            _blocks(df), "k", "v", "id",
            percent_col="pct_rank", cume_col="cume_dist", num_buckets=4,
        )
        .to_pandas()
        .sort_values("id", ignore_index=True)
    )
    pd.testing.assert_series_equal(got["pct_rank"], exp["pct_rank"], check_exact=True)
    pd.testing.assert_series_equal(got["cume_dist"], exp["cume_dist"], check_exact=True)
    assert got.loc[got["id"] == 9999, "pct_rank"].item() == 0.0
    assert got.loc[got["id"] == 9999, "cume_dist"].item() == 1.0


def test_sample_k_deterministic_and_exact(ray_session):
    from vaero_ray.stages.corpus import sample_k

    df = pd.DataFrame({"doc_id": np.arange(1000, dtype=np.int64), "x": np.arange(1000)})
    a = sample_k(_blocks(df, 7), "doc_id", 50).to_pandas().sort_values("doc_id", ignore_index=True)
    b = sample_k(_blocks(df, 3), "doc_id", 50).to_pandas().sort_values("doc_id", ignore_index=True)
    pd.testing.assert_frame_equal(a, b)  # re-shard stable
    assert len(a) == 50 and a["doc_id"].is_unique
    # matches the naive definition: k smallest (hash, id)
    from vaero_ray.stages.sketch import hll_hash

    h = hll_hash(df["doc_id"].to_numpy().astype(np.uint64))
    exp_ids = df["doc_id"].to_numpy()[np.lexsort((df["doc_id"], h))[:50]]
    assert set(a["doc_id"]) == set(exp_ids)
    # k >= n returns everything
    c = sample_k(_blocks(df.head(30), 2), "doc_id", 50).to_pandas()
    assert len(c) == 30
