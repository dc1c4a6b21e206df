"""Round-4 third-session relational additions: generic GROUPING SETS,
integer-exact interpolated percentile, z-score outliers, pairwise group
overlap."""

import numpy as np
import pandas as pd
import ray.data as rd


def _blocks(df, n=3):
    return [df.iloc[i::n] for i in range(n)]


def test_grouping_sets_matches_manual(ray_session):
    from vaero_ray.stages.relational import ROLLUP_ALL, grouping_sets_counts

    rng = np.random.default_rng(7)
    df = pd.DataFrame(
        {
            "a": [f"a{v}" for v in rng.integers(0, 3, 400)],
            "b": [f"b{v}" for v in rng.integers(0, 4, 400)],
            "x": rng.integers(0, 100, 400).astype(np.float64),
        }
    )
    out = (
        grouping_sets_counts(rd.from_pandas(_blocks(df)), ["a", "b"], [["b"], []], measure="x")
        .to_pandas()
        .sort_values(["a", "b"], ignore_index=True)
    )
    # set ("b",): one row per b with a = <all>
    per_b = df.groupby("b")["x"].agg(["count", "sum"]).reset_index()
    got_b = out[(out["a"] == ROLLUP_ALL) & (out["b"] != ROLLUP_ALL)].sort_values("b")
    assert got_b["n_rows"].tolist() == per_b["count"].tolist()
    assert got_b["sum_x"].tolist() == [int(round(v)) for v in per_b["sum"]]
    # set (): single grand-total row
    tot = out[(out["a"] == ROLLUP_ALL) & (out["b"] == ROLLUP_ALL)]
    assert len(tot) == 1 and int(tot["n_rows"].iloc[0]) == 400
    # no (a, b)-level rows were emitted (not in the set list)
    assert not ((out["a"] != ROLLUP_ALL) & (out["b"] != ROLLUP_ALL)).any()


def test_grouped_percentile_cont_matches_numpy(ray_session):
    from vaero_ray.stages.relational import grouped_percentile_cont

    rng = np.random.default_rng(11)
    df = pd.DataFrame(
        {
            "g": [f"g{v}" for v in rng.integers(0, 5, 300)],
            "v": rng.integers(0, 10_000, 300).astype(np.int64),
        }
    )
    out = (
        grouped_percentile_cont(rd.from_pandas(_blocks(df)), "g", "v", 9, 10, num_buckets=3)
        .to_pandas()
        .sort_values("g", ignore_index=True)
    )
    for _, row in out.iterrows():
        vals = np.sort(df.loc[df["g"] == row["g"], "v"].to_numpy())
        want = np.percentile(vals, 90, method="linear") * 10
        assert abs(row["pct_x_qden"] - want) < 1e-6, (row["g"], row["pct_x_qden"], want)


def test_grouped_percentile_cont_exact_element_when_rem_zero(ray_session):
    from vaero_ray.stages.relational import grouped_percentile_cont

    df = pd.DataFrame({"g": ["x"] * 11, "v": np.arange(11, dtype=np.int64) * 7})
    out = grouped_percentile_cont(
        rd.from_pandas([df]), "g", "v", 1, 2, num_buckets=1
    ).to_pandas()
    # n=11 -> pos=5.0 exactly -> v[5]*2
    assert int(out["pct_x_qden"].iloc[0]) == 35 * 2


def test_zscore_outliers_formula(ray_session):
    from vaero_ray.stages.relational import zscore_outliers

    rng = np.random.default_rng(13)
    base = rng.normal(50, 5, 200)
    base[7] = 500.0  # planted outlier
    df = pd.DataFrame(
        {
            "id": np.arange(200, dtype=np.int64),
            "g": ["k"] * 200,
            "v": base,
        }
    )
    out = zscore_outliers(
        rd.from_pandas(_blocks(df)), key="g", value_col="v", id_col="id", num_buckets=2
    ).to_pandas()
    c = np.floor(base * 100 + 0.5).astype(np.int64)
    n, s1, s2 = len(c), c.sum(), (c * c).sum()
    want = set(np.flatnonzero((n * c - s1) ** 2 > 4 * (n * s2 - s1 * s1)))
    assert set(out["id"].tolist()) == want and 7 in want


def test_group_overlap_small(ray_session):
    from vaero_ray.stages.relational import group_overlap

    df = pd.DataFrame(
        {
            "t": ["a", "a", "b", "b", "c", "a", "b"],
            "u": [1, 2, 2, 3, 9, 1, 2],
        }
    )
    out = (
        group_overlap(rd.from_pandas(_blocks(df, 2)), "t", "u", num_buckets=2)
        .to_pandas()
        .set_index(["type_a", "type_b"])
    )
    # a={1,2}, b={2,3}, c={9}
    assert out.loc[("a", "b"), "n_common"] == 1 and out.loc[("a", "b"), "n_union"] == 3
    assert out.loc[("a", "c"), "n_common"] == 0 and out.loc[("a", "c"), "n_union"] == 3
    assert out.loc[("b", "c"), "n_common"] == 0 and out.loc[("b", "c"), "n_union"] == 3


def test_skew_split_join_parity_planted_zipf(ray_session):
    """Planted zipf skew: the hot/cold split union must equal the plain
    hash join bit-exactly, hot keys must actually take the broadcast
    path, and LEFT join keeps unmatched-left rows."""
    from vaero_ray.stages.joins import hash_join, skew_split_join

    rng = np.random.default_rng(17)
    # key 0 is degenerate-hot (60% of rows); a tail of cold keys
    keys = np.where(rng.random(4000) < 0.6, 0, rng.integers(1, 200, 4000))
    left = pd.DataFrame({"k": keys.astype(np.int64), "lid": np.arange(4000, dtype=np.int64)})
    right = pd.DataFrame(
        {"k": np.arange(0, 150, dtype=np.int64), "rv": np.arange(0, 150, dtype=np.int64) * 10}
    )
    lb = [left.iloc[i::5] for i in range(5)]
    rb = [right.iloc[i::2] for i in range(2)]

    got = (
        skew_split_join(rd.from_pandas(lb), rd.from_pandas(rb), "k", hot_count=500, num_buckets=4)
        .to_pandas()
        .sort_values(["lid"], ignore_index=True)[["k", "lid", "rv"]]
    )
    want = (
        hash_join(rd.from_pandas(lb), rd.from_pandas(rb), ["k"], "inner", num_buckets=4)
        .to_pandas()
        .sort_values(["lid"], ignore_index=True)[["k", "lid", "rv"]]
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=True)

    # left join: rows with k in 150..199 have no match -> null rv survives
    gl = (
        skew_split_join(rd.from_pandas(lb), rd.from_pandas(rb), "k", join_type="left", hot_count=500, num_buckets=4)
        .to_pandas()
    )
    assert len(gl) == 4000
    assert gl.loc[gl["k"] >= 150, "rv"].isna().all()

    # no hot keys at an absurd threshold -> falls back to plain hash join
    cold = skew_split_join(
        rd.from_pandas(lb), rd.from_pandas(rb), "k", hot_count=10_000, num_buckets=4
    ).to_pandas()
    assert len(cold) == len(want)


def test_pagerank_matches_reference_impl(ray_session):
    """Fixed-point PageRank must equal a single-threaded reference run of
    the same integer recurrence on a random directed graph (including a
    dangling-target node), for 1 and 3 iterations."""
    from vaero_ray.stages.graph import pagerank

    rng = np.random.default_rng(23)
    src = rng.integers(0, 40, 300).astype(np.int64)
    dst = rng.integers(0, 40, 300).astype(np.int64)
    edges = pd.DataFrame({"src": src, "dst": dst})
    blocks = [edges.iloc[i::3] for i in range(3)]

    def reference(iters):
        deg = edges.groupby("src").size().to_dict()
        nodes = sorted(deg)  # nodes with out-edges define the state table
        n = len(nodes)
        scale = 10**12
        r = {v: scale // n for v in nodes}
        base = (scale * 15) // (100 * n)
        for _ in range(iters):
            s = {v: 0 for v in nodes}
            for u, v in zip(edges["src"], edges["dst"]):
                if v in s:
                    s[v] += (r[u] * 85) // (100 * deg[u])
            r = {v: base + s[v] for v in nodes}
        return r

    for iters in (1, 3):
        got = (
            pagerank(rd.from_pandas(blocks), iters=iters, num_buckets=4)
            .to_pandas()
            .sort_values("node", ignore_index=True)
        )
        want = reference(iters)
        assert got["node"].tolist() == sorted(want)
        assert got["rank_scaled"].tolist() == [want[v] for v in sorted(want)]


def test_bigram_association_naive_parity(ray_session):
    """Counts and association flags must equal a naive single-threaded
    reference on a tiny corpus (min_count=1 so everything survives)."""
    from collections import Counter

    from vaero_ray.stages.textstats import bigram_association

    docs = [
        "the cat sat on the mat",
        "the cat ran",
        "a dog sat on a log",
        "the dog and the cat",
    ]
    df = pd.DataFrame({"doc_id": np.arange(4, dtype=np.int64), "text": docs})
    out = (
        bigram_association(rd.from_pandas([df.iloc[:2], df.iloc[2:]]), min_count=1, num_buckets=2)
        .to_pandas()
        .sort_values(["tok_a", "tok_b"], ignore_index=True)
    )
    toks = [d.split() for d in docs]
    tc = Counter(t for ts in toks for t in ts)
    bc = Counter((ts[i], ts[i + 1]) for ts in toks for i in range(len(ts) - 1))
    n_tok, n_big = sum(tc.values()), sum(bc.values())
    assert len(out) == len(bc)
    for _, r in out.iterrows():
        pair = (r["tok_a"], r["tok_b"])
        assert bc[pair] == r["n_ab"] and tc[pair[0]] == r["n_a"] and tc[pair[1]] == r["n_b"]
        want = 1 if bc[pair] * n_tok * n_tok > tc[pair[0]] * tc[pair[1]] * n_big else 0
        assert r["assoc"] == want, pair


def test_sft_examples_hand_built(ray_session):
    """Context assembly: oldest-first join of up to n previous turns in
    the SAME conversation, assistant turns only, first turn excluded."""
    from vaero_ray.stages.stitch import sft_examples

    df = pd.DataFrame(
        {
            "conv_id": ["a"] * 5 + ["b"],
            "turn_idx": np.array([0, 1, 2, 3, 4, 0], dtype=np.int32),
            "role": ["user", "assistant", "user", "user", "assistant", "assistant"],
            "text": ["hi", "yo", "q2", "more", "a2", "solo"],
        }
    )
    out = (
        sft_examples(rd.from_pandas([df.iloc[:3], df.iloc[3:]]), n_context=3, num_buckets=2)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"], ignore_index=True)
    )
    assert out["conv_id"].tolist() == ["a", "a"]  # b's turn 0 excluded
    assert out["turn_idx"].tolist() == [1, 4]
    assert out.loc[0, "context"] == "user: hi"
    assert out.loc[0, "target"] == "yo"
    # window of 3: turns 1..3, oldest first
    assert out.loc[1, "context"] == "assistant: yo\nuser: q2\nuser: more"
    assert out.loc[1, "target"] == "a2"


def test_longest_run_hand_built(ray_session):
    from vaero_ray.stages.cep import longest_run_per_key

    df = pd.DataFrame(
        {
            "u": [1, 1, 1, 1, 1, 2, 2, 2],
            "v": ["a", "a", "b", "b", "b", "x", "y", "x"],
            "ts": np.arange(8, dtype=np.int64),
        }
    )
    out = (
        longest_run_per_key(
            rd.from_pandas([df.iloc[:4], df.iloc[4:]]), "u", "v", "ts", num_buckets=2
        )
        .to_pandas()
        .sort_values("u", ignore_index=True)
    )
    assert out["u"].tolist() == [1, 2]
    assert out["value"].tolist() == ["b", "x"]  # u2 ties at 1 -> value asc
    assert out["run_len"].tolist() == [3, 1]


def test_apply_changelog_hand_built(ray_session):
    """Upsert overrides base, tombstone deletes, untouched keys survive,
    and a base row newer than a change wins (order decides, not source)."""
    from vaero_ray.stages.rowwindow import apply_changelog

    base = pd.DataFrame(
        {
            "k": np.array([1, 2, 3, 4], dtype=np.int64),
            "v": np.array([10, 20, 30, 40], dtype=np.int64),
            "seq": np.array([0, 0, 0, 9], dtype=np.int64),
            "tie": np.array([0, 0, 0, 0], dtype=np.int64),
        }
    )
    changes = pd.DataFrame(
        {
            "k": np.array([1, 2, 4], dtype=np.int64),
            "v": np.array([11, 0, 41], dtype=np.int64),
            "seq": np.array([5, 5, 5], dtype=np.int64),
            "tie": np.array([1, 1, 1], dtype=np.int64),
            "op": ["U", "D", "U"],
        }
    )
    out = (
        apply_changelog(
            rd.from_pandas([base]), rd.from_pandas([changes]),
            key="k", order_col="seq", tie_col="tie", num_buckets=2,
        )
        .to_pandas()
        .sort_values("k", ignore_index=True)
    )
    # k1 upserted, k2 tombstoned, k3 untouched, k4 base (seq 9) beats change
    assert out["k"].tolist() == [1, 3, 4]
    assert out["v"].tolist() == [11, 30, 40]
