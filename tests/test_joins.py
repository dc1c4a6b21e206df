"""Join operators: broadcast, partitioned hash, backward as-of.
Pandas-merge oracles on small synthetic frames; TPC-H/events DuckDB
oracles run via the driver gate (queries.py)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from vaero_ray.stages.joins import asof_join, broadcast_join, hash_join


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    return df[sorted(df.columns)].sort_values(sorted(df.columns), ignore_index=True)


def test_broadcast_join(ray_session):
    left = pa.table({"k": [1, 2, 3, 2, 9], "x": ["a", "b", "c", "d", "e"]})
    small = pa.table({"k": [1, 2, 3], "name": ["one", "two", "three"]})
    got = _norm(broadcast_join(rd.from_arrow(left), small, keys="k").to_pandas())
    want = _norm(left.to_pandas().merge(small.to_pandas(), on="k", how="inner"))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_hash_join_inner_with_dup_keys(ray_session):
    rng = np.random.default_rng(4)
    l = pd.DataFrame({"k": rng.integers(0, 50, 500), "x": np.arange(500)})
    r = pd.DataFrame({"k": rng.integers(0, 50, 200), "y": np.arange(200) * 10})
    got = _norm(
        hash_join(
            rd.from_pandas(l), rd.from_pandas(r), keys="k", num_buckets=8
        ).to_pandas()
    )
    want = _norm(l.merge(r, on="k", how="inner"))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_asof_join_backward_inclusive(ray_session):
    ts = lambda s: pd.Timestamp(s)
    l = pd.DataFrame(
        {
            "k": ["a", "a", "b", "c"],
            "ts": [ts("2026-01-01 00:10"), ts("2026-01-01 00:20"), ts("2026-01-01 00:15"), ts("2026-01-01 00:05")],
            "ev": [1, 2, 3, 4],
        }
    )
    r = pd.DataFrame(
        {
            "k": ["a", "a", "b"],
            "ts": [ts("2026-01-01 00:10"), ts("2026-01-01 00:12"), ts("2026-01-01 00:30")],
            "v": [100, 200, 300],
        }
    )
    got = asof_join(
        rd.from_pandas(l), rd.from_pandas(r), key="k", ts_col="ts",
        right_ts_out="m_ts", right_cols=["v"], num_buckets=4,
    ).to_pandas().sort_values("ev", ignore_index=True)
    # ev=1: exact match inclusive -> 100; ev=2: latest <= 00:20 -> 200;
    # ev=3: b's only right row is later -> null; ev=4: no c rows -> null
    assert got["v"].tolist()[:2] == [100, 200]
    assert got["v"].isna().tolist() == [False, False, True, True]
