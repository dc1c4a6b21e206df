"""Session-13 batch 1: Wasserstein-1 / Hellinger two-sample distance
and paired-halves Cohen's kappa — brute-force python/scipy-free oracles
on randomized synthetic inputs."""

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd


def _rng(seed=31):
    return np.random.default_rng(seed)


def _merged_counts(v1, v2):
    """Build the (v, c1, c2) compressed-counts Dataset the stage
    contracts expect, split across several blocks."""
    rows = []
    for v in v1:
        rows.append({"v": int(v), "c1": 1, "c2": 0})
    for v in v2:
        rows.append({"v": int(v), "c1": 0, "c2": 1})
    df = pd.DataFrame(rows).groupby("v", as_index=False).sum()
    return rd.from_pandas(df).repartition(4)


def _w1_brute(v1, v2):
    """O(n^2)-free brute force: integrate |F1 - F2| over the union grid."""
    v1, v2 = np.sort(v1), np.sort(v2)
    grid = np.unique(np.concatenate([v1, v2]))
    f1 = np.searchsorted(v1, grid, side="right") / len(v1)
    f2 = np.searchsorted(v2, grid, side="right") / len(v2)
    return float(np.sum(np.abs(f1 - f2)[:-1] * np.diff(grid)))


def test_emd_matches_bruteforce(ray_session):
    from vaero_ray.stages.numstats import emd_two_sample

    rng = _rng()
    for trial in range(5):
        v1 = rng.integers(0, 400, size=int(rng.integers(5, 300)))
        v2 = rng.integers(50, 500, size=int(rng.integers(5, 300)))
        out = emd_two_sample(_merged_counts(v1, v2), "v").to_pylist()[0]
        assert out["n1"] == len(v1) and out["n2"] == len(v2)
        expect = _w1_brute(v1, v2)
        assert math.isclose(out["w1"], expect, rel_tol=1e-9, abs_tol=1e-12), (
            trial, out["w1"], expect
        )
        # integer numerator consistent with the float
        assert out["w1"] == out["w1_num"] / (len(v1) * len(v2))


def test_emd_hellinger_bounds_and_identity(ray_session):
    from vaero_ray.stages.numstats import emd_two_sample

    rng = _rng(7)
    v = rng.integers(0, 100, size=200)
    out = emd_two_sample(_merged_counts(v, v), "v").to_pylist()[0]
    # identical samples: zero distance, affinity 1
    assert out["w1_num"] == 0 and out["w1"] == 0.0
    assert out["bc"] == 1.0 and out["hellinger"] == 0.0
    # disjoint supports: bc 0, hellinger 1
    out2 = emd_two_sample(
        _merged_counts(np.arange(10), np.arange(100, 110)), "v"
    ).to_pylist()[0]
    assert out2["bc"] == 0.0 and out2["hellinger"] == 1.0
    assert out2["w1"] == 100.0  # shift-by-100 point masses


def _kappa_brute(df):
    """Per-user python loop oracle for paired_halves_kappa."""
    m1m2 = []
    for _, g in df.sort_values(["user_id", "ts", "event_id"]).groupby("user_id"):
        n = len(g)
        if n < 2:
            continue
        cut = (n + 1) // 2
        halves = (g.iloc[:cut], g.iloc[cut:])
        modal = []
        for h in halves:
            cnt = h.groupby("event_type").size()
            top = cnt[cnt == cnt.max()].index.min()  # ties -> lexic. smallest
            modal.append(top)
        m1m2.append(tuple(modal))
    n = len(m1m2)
    agree = sum(1 for a, b in m1m2 if a == b)
    rows = pd.Series([a for a, _ in m1m2]).value_counts()
    cols = pd.Series([b for _, b in m1m2]).value_counts()
    pe_num = sum(int(rows.get(k, 0)) * int(cols.get(k, 0))
                 for k in set(rows.index) | set(cols.index))
    return n, agree, pe_num


def test_paired_halves_kappa_matches_bruteforce(ray_session):
    from vaero_ray.stages.numstats import paired_halves_kappa

    rng = _rng(11)
    rows = []
    eid = 0
    for u in range(120):
        k = int(rng.integers(1, 9))
        ts = np.sort(rng.choice(10_000, size=k, replace=False))
        for t in ts:
            rows.append(
                {"user_id": u, "ts": int(t), "event_id": eid,
                 "event_type": str(rng.choice(["a", "b", "c"]))}
            )
            eid += 1
    df = pd.DataFrame(rows)
    out = paired_halves_kappa(
        rd.from_pandas(df).repartition(6), "user_id", "ts", "event_id",
        "event_type", num_buckets=8,
    ).to_pylist()[0]
    n, agree, pe_num = _kappa_brute(df)
    assert out["n_keys"] == n and out["agree"] == agree and out["pe_num"] == pe_num
    assert out["kappa_num"] == agree * n - pe_num
    assert out["kappa_den"] == n * n - pe_num
    assert out["kappa"] == (agree * n - pe_num) / (n * n - pe_num)


def test_paired_halves_kappa_edge_cases(ray_session):
    from vaero_ray.stages.numstats import paired_halves_kappa

    # all single-event users -> empty design, null kappa
    df = pd.DataFrame(
        {"user_id": range(5), "ts": range(5), "event_id": range(5),
         "event_type": ["a"] * 5}
    )
    out = paired_halves_kappa(
        rd.from_pandas(df), "user_id", "ts", "event_id", "event_type", num_buckets=4
    ).to_pylist()[0]
    assert out["n_keys"] == 0 and out["kappa"] is None
    # perfect agreement, single category: kappa degenerate (den==0 -> null)
    df2 = pd.DataFrame(
        {"user_id": [1, 1, 2, 2], "ts": [0, 1, 0, 1], "event_id": [0, 1, 2, 3],
         "event_type": ["a", "a", "a", "a"]}
    )
    out2 = paired_halves_kappa(
        rd.from_pandas(df2), "user_id", "ts", "event_id", "event_type", num_buckets=4
    ).to_pylist()[0]
    assert out2["n_keys"] == 2 and out2["agree"] == 2
    assert out2["kappa_den"] == 0 and out2["kappa"] is None
