"""Conversation-level fingerprint dedup and turn-taking stats
(vaero_ray/stages/convstats.py): planted duplicate conversations,
order sensitivity of the mergeable fingerprint, alternation counts."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from vaero_ray.stages.convstats import (
    CONV_FP_BASE,
    M31,
    alternation_stats,
    conv_fingerprint,
    dedup_by_fingerprint,
    turn_hash,
)


def _ts(*secs):
    return pd.to_datetime(list(secs), unit="s").astype("datetime64[us]")


def _conv_df(conv, texts, t0=0):
    n = len(texts)
    return pd.DataFrame(
        {
            "conv_id": [conv] * n,
            "ts": _ts(*[t0 + i for i in range(n)]),
            "event_id": np.arange(n, dtype=np.int64),
            "text": texts,
        }
    )


def _hashed(df):
    tbl = pa.Table.from_pandas(df, preserve_index=False)
    return turn_hash(tbl, "text").drop_columns("text")


def test_conv_fingerprint_dedup_planted(ray_session):
    # a and b are exact duplicates (same turn texts, same order); c swaps
    # two turns (same multiset -> must NOT collide); d differs in length.
    a = _conv_df("a", ["hello", "world", "bye"])
    b = _conv_df("b", ["hello", "world", "bye"], t0=100)
    c = _conv_df("c", ["world", "hello", "bye"], t0=200)
    d = _conv_df("d", ["hello", "world"], t0=300)
    full = pd.concat([a, b, c, d], ignore_index=True)
    blocks = [full.iloc[i::3] for i in range(3)]  # convs span blocks
    ds = rd.from_arrow([_hashed(x) for x in blocks])
    fps = conv_fingerprint(ds, order=["ts", "event_id"], num_buckets=2).to_pandas()
    assert len(fps) == 4
    by = fps.set_index("conv_id")
    assert by.loc["a", "conv_fp"] == by.loc["b", "conv_fp"]
    assert by.loc["a", "conv_fp"] != by.loc["c", "conv_fp"]  # order-sensitive
    assert by.loc["a", "n_turns"] == 3 and by.loc["d", "n_turns"] == 2

    kept = (
        dedup_by_fingerprint(fps_ds := rd.from_pandas(fps), num_buckets=2)
        .to_pandas()
        .sort_values("conv_id", ignore_index=True)
    )
    assert kept["conv_id"].tolist() == ["a", "c", "d"]  # b dropped (min rule)


def test_conv_fingerprint_matches_reference_formula(ray_session):
    texts = ["Some  Text", "", "x"]
    df = _conv_df("z", texts)
    fps = conv_fingerprint(
        rd.from_arrow([_hashed(df)]), order=["ts", "event_id"], num_buckets=1
    ).to_pandas()

    def poly(s):
        # fingerprint collapses \s+ runs (no trim) then lowercases
        import re

        s = re.sub(r"\s+", " ", s.lower())
        h = 0
        for ch in s.encode():
            h = (h * 31 + ch) % M31
        return h

    expect = sum((poly(t) + 1) * pow(CONV_FP_BASE, i, M31) % M31 for i, t in enumerate(texts)) % M31
    assert int(fps["conv_fp"].iloc[0]) == expect


def test_alternation_stats(ray_session):
    rows = pd.DataFrame(
        {
            "conv_id": ["a"] * 4 + ["b"] * 3 + ["c"],
            "ts": _ts(0, 1, 2, 3, 10, 11, 12, 20),
            "event_id": np.arange(8, dtype=np.int64),
            # a: user,user,assistant,assistant -> 2 violations
            # b: user,assistant,user -> 0; c: single turn -> 0
            "role": [
                "user",
                "user",
                "assistant",
                "assistant",
                "user",
                "assistant",
                "user",
                "tool",
            ],
        }
    )
    blocks = [rows.iloc[i::2] for i in range(2)]
    out = (
        alternation_stats(
            rd.from_pandas(blocks), order=["ts", "event_id"], num_buckets=2
        )
        .to_pandas()
        .sort_values("conv_id", ignore_index=True)
    )
    assert out["conv_id"].tolist() == ["a", "b", "c"]
    assert out["n_turns"].tolist() == [4, 3, 1]
    assert out["n_violations"].tolist() == [2, 0, 0]


def test_heavy_hitters_adversarial_split(ray_session):
    """A value can sit just UNDER the local threshold in most blocks and
    still be a global heavy hitter — the averaging argument says it must
    clear the threshold in at least one block; verify no false negatives
    and that counts are exact."""
    from vaero_ray.stages.sketch import heavy_hitters

    # 10 blocks of 100 rows. Value 7 appears 11x in one block and 9x in
    # the other nine (92 total, n=1000, k=10 -> threshold 100: NOT heavy).
    # Value 3 appears 15x in every block (150: heavy). Filler values are
    # spread so none qualifies.
    blocks = []
    rng = np.random.default_rng(5)
    for b in range(10):
        n7 = 11 if b == 0 else 9
        rows = [7] * n7 + [3] * 15
        rows += list(1000 + rng.permutation(100 - len(rows)) + b * 1000)
        blocks.append(pd.DataFrame({"user_id": np.array(rows, dtype=np.int64)}))
    out = heavy_hitters(rd.from_pandas(blocks), "user_id", k=10).to_pandas()
    assert out["user_id"].tolist() == [3]
    assert out["n_events"].tolist() == [150]

    # k=6 -> threshold 1000/6 = 166.7: nothing qualifies -> empty output
    out2 = heavy_hitters(rd.from_pandas(blocks), "user_id", k=6).to_pandas()
    assert len(out2) == 0
