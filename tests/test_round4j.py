"""Round-4 seventh-session additions: market-basket pair co-occurrence
(basket.pair_cooccurrence) and the covered-time composition."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd


def _ref_pairs(df, min_support=1):
    """Reference support counts: per-group distinct items, all unordered
    pairs, plain python."""
    from itertools import combinations

    counts = {}
    for _, g in df.groupby("g"):
        for a, b in combinations(sorted(set(g["item"])), 2):
            counts[(a, b)] = counts.get((a, b), 0) + 1
    return sorted((a, b, c) for (a, b), c in counts.items() if c >= min_support)


def test_pair_cooccurrence_matches_bruteforce(ray_session):
    from vaero_ray.stages.basket import pair_cooccurrence

    rng = np.random.default_rng(7)
    df = pd.DataFrame(
        {
            "g": rng.integers(0, 300, 5000),
            "item": rng.integers(0, 40, 5000),
        }
    )
    # duplicate (group, item) rows must count once
    df = pd.concat([df, df.head(500)], ignore_index=True)
    ds = rd.from_pandas(df).repartition(5)
    got = (
        pair_cooccurrence(ds, "g", "item", min_support=2, num_buckets=8)
        .to_pandas()
        .sort_values(["item_a", "item_b"])
    )
    want = _ref_pairs(df, min_support=2)
    assert [tuple(r) for r in got.to_numpy()] == want
    assert (got["item_a"] < got["item_b"]).all()
    assert str(got["support"].dtype) == "int64"


def test_pair_cooccurrence_fat_basket_cap(ray_session):
    """A degenerate basket above max_basket is truncated to its smallest
    items — bounded emission, pairs among the retained items only."""
    from vaero_ray.stages.basket import pair_cooccurrence

    df = pd.DataFrame({"g": ["fat"] * 50 + ["ok", "ok"], "item": list(range(50)) + [1, 2]})
    ds = rd.from_pandas(df)
    got = pair_cooccurrence(ds, "g", "item", num_buckets=2, max_basket=10).to_pandas()
    # fat basket contributes C(10,2)=45 pairs over items 0..9; ok adds (1,2)
    assert len(got) == 45
    assert got["item_a"].max() <= 9 and got["item_b"].max() <= 9
    assert int(got.loc[(got.item_a == 1) & (got.item_b == 2), "support"].iloc[0]) == 2


def _ref_twa(df):
    out = []
    for k, g in df.groupby("k"):
        g = g.sort_values(["ts", "tie"])
        ts = g["ts"].to_numpy().astype("datetime64[us]").astype("int64")
        v = g["v"].to_numpy()
        if len(g) < 2:
            continue
        hold = (ts[1:] - ts[:-1]) // 1_000_000
        out.append((k, int((v[:-1] * hold).sum()), int(hold.sum()), len(g) - 1))
    return sorted(out)


def test_time_weighted_sums_matches_bruteforce(ray_session):
    from vaero_ray.stages.cep import time_weighted_sums

    rng = np.random.default_rng(13)
    n = 4000
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 120, n),
            "ts": pd.to_datetime(rng.integers(0, 10**7, n), unit="s"),
            "v": rng.integers(-50, 500, n),
            "tie": np.arange(n),
        }
    )
    # planted single-event key: must emit NO row
    df.loc[len(df)] = [999, pd.Timestamp("2001-01-01"), 7, len(df)]
    ds = rd.from_pandas(df).repartition(4)
    got = time_weighted_sums(ds, "k", "ts", "v", "tie", num_buckets=8).to_pandas()
    want = _ref_twa(df)
    got_rows = sorted(
        (int(r.k), int(r.vw_sum), int(r.held_sec), int(r.n_holds))
        for r in got.itertuples()
    )
    assert got_rows == want
    assert 999 not in set(got["k"])


def test_triangle_counts_matches_bruteforce(ray_session):
    from vaero_ray.stages.graph import triangle_counts

    rng = np.random.default_rng(5)
    a = rng.integers(0, 60, 400)
    b = rng.integers(0, 60, 400)
    # duplicates, reversed duplicates and self-loops must all be ignored
    df = pd.DataFrame({"u": np.r_[a, b[:50], np.arange(5)],
                       "v": np.r_[b, a[:50], np.arange(5)]})
    ds = rd.from_pandas(df).repartition(4)
    got = triangle_counts(ds, "u", "v", num_buckets=8).to_pandas()

    es, adj = set(), {}
    for x, y in zip(df["u"], df["v"]):
        if x != y:
            es.add((min(x, y), max(x, y)))
    for x, y in es:
        adj.setdefault(x, set()).add(y)
        adj.setdefault(y, set()).add(x)
    tri = {tuple(sorted((x, y, z))) for x, y in es for z in adj[x] & adj[y]}
    ref = {}
    for t in tri:
        for nd in t:
            ref[nd] = ref.get(nd, 0) + 1
    got_rows = sorted((int(r.node), int(r.n_triangles)) for r in got.itertuples())
    assert got_rows == sorted(ref.items())


def test_triangle_counts_out_degree_cap(ray_session):
    """A star graph closed into a fan: cap the hub's wedge emission."""
    from vaero_ray.stages.graph import triangle_counts

    # hub 0 connects to 1..20; ring edges (i, i+1) close triangles
    spokes = [(0, i) for i in range(1, 21)]
    ring = [(i, i + 1) for i in range(1, 20)]
    df = pd.DataFrame(spokes + ring, columns=["u", "v"])
    ds = rd.from_pandas(df)
    full = triangle_counts(ds, "u", "v", num_buckets=4).to_pandas()
    # every ring edge closes one triangle with the hub: 19 triangles
    assert int(full.loc[full.node == 0, "n_triangles"].iloc[0]) == 19
    capped = triangle_counts(ds, "u", "v", num_buckets=4, max_out_degree=5).to_pandas()
    # truncation only loses triangles, never invents them
    got_full = dict(zip(full.node, full.n_triangles))
    for r in capped.itertuples():
        assert r.n_triangles <= got_full[r.node]
