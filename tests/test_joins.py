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


def test_auto_join_broadcast_and_partitioned_agree(ray_session):
    """auto_join must emit identical rows whether the build side lands
    under the broadcast threshold (gathered + ray.put) or over it
    (partitioned hash_join fallback, forced with threshold=0)."""
    from vaero_ray.stages.joins import auto_join

    rng = np.random.default_rng(7)
    l = pd.DataFrame({"k": rng.integers(0, 30, 400), "x": np.arange(400)})
    r = pd.DataFrame({"k": np.arange(0, 25, dtype=np.int64), "y": np.arange(25) * 7})
    want_inner = _norm(l.merge(r, on="k", how="inner"))
    want_left = _norm(l.merge(r, on="k", how="left"))
    for thresh in (64 << 20, 0):
        got = _norm(
            auto_join(
                rd.from_pandas(l), rd.from_pandas(r), keys="k",
                broadcast_max_bytes=thresh, num_buckets=4,
            ).to_pandas()
        )
        pd.testing.assert_frame_equal(got, want_inner, check_dtype=False)
        got_l = _norm(
            auto_join(
                rd.from_pandas(l), rd.from_pandas(r), keys="k",
                join_type="left outer", broadcast_max_bytes=thresh, num_buckets=4,
            ).to_pandas()
        )
        pd.testing.assert_frame_equal(got_l, want_left, check_dtype=False)


def test_auto_join_empty_build_side(ray_session):
    """An all-filtered build side must produce 0 inner rows / all-null
    left rows instead of crashing on a schemaless gather."""
    from vaero_ray.stages.joins import auto_join

    l = pd.DataFrame({"k": np.arange(5, dtype=np.int64), "x": np.arange(5)})
    r = rd.from_pandas(
        pd.DataFrame({"k": np.arange(3, dtype=np.int64), "y": np.arange(3)})
    ).filter(expr="k > 100")
    assert auto_join(rd.from_pandas(l), r, keys="k").count() == 0
    out = auto_join(
        rd.from_pandas(l), r, keys="k", join_type="left outer"
    ).to_pandas()
    assert len(out) == 5 and out["y"].isna().all()
