"""Corpus-scale rehearsal of the session-10 operators over the cached
16M-turn transcript corpus (tools/session5_rehearsal.py regenerates it).

- jw: planted trailing-TRANSPOSITION replicas (every 64th turn, odd-id
  lane), blocking key = first 40 chars of text (the transposition is at
  the tail, so true pairs share a block); jaro_winkler_pairs scores
  every in-block candidate with the pair-vectorized DuckDB-bit-exact
  kernel, sim >= 0.99 emitted. Same harness as the session-6 editdist
  rehearsal, so the two verify kernels are directly comparable.
- kendall: global Kendall tau-b of (n_chars, n_tokens) over every turn
  — the distinct-pair-count exchange is bounded by the (len, tokens)
  domain, never the 16M rows; Fenwick finalize on the driver.
- theilsen: Theil-Sen robust slope of the hourly turn-count series per
  role (bounded (role, hour) exchange, vectorized pairwise median).
- lag: hourly user->assistant lead/lag cross-products (lags -3..3),
  integer-exact end to end.

Run: python tools/session10_rehearsal.py [--op jw|kendall|theilsen|lag|all]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

CORPUS = "/tmp/vaero_ray_bench/transcripts_16m"


def rehearse_jw():
    ds = rd.read_parquet(CORPUS, columns=["conv_id", "turn_idx", "text"])

    def derive(tbl: pa.Table) -> pa.Table:
        ti = tbl.column("turn_idx").to_numpy().astype(np.int64)
        conv = tbl.column("conv_id").to_pandas()
        ch = pd.util.hash_array(conv.to_numpy(object), categorize=False).astype(
            np.uint64
        )
        rid = ((ch >> np.uint64(16)) << np.uint64(10)).astype(np.int64) + (
            ti % 512
        ) * 2
        texts = tbl.column("text").to_pylist()
        base = pa.table(
            {
                "rid": pa.array(rid, pa.int64()),
                "text": tbl.column("text"),
                "blk": pa.array([t[:40] for t in texts], pa.string()),
            }
        )
        sel = np.flatnonzero((ti % 64 == 0) & np.array([len(t) >= 44 for t in texts]))
        # trailing transposition: swap the last two chars — JW stays
        # ~1 (prefix boost + one transposed pair), the blocking prefix
        # is untouched
        mtexts = [texts[i][:-2] + texts[i][-1] + texts[i][-2] for i in sel]
        rep = pa.table(
            {
                "rid": pa.array(rid[sel] + 1, pa.int64()),  # odd lane
                "text": pa.array(mtexts, pa.string()),
                "blk": pa.array([t[:40] for t in mtexts], pa.string()),
            }
        )
        # corpus text is large_string; the replica table was built as
        # string — unify before concat
        return pa.concat_tables([base, rep.cast(base.schema)])

    both = ds.map_batches(derive, batch_format="pyarrow", zero_copy_batch=True)
    from vaero_ray.stages.editdist import jaro_winkler_pairs

    t0 = time.time()
    out = jaro_winkler_pairs(both, "rid", "text", ["blk"], min_sim=0.99)
    n_pairs = out.count()
    wall = time.time() - t0
    return {
        "op": "jaro_winkler_pairs",
        "rows_in": both.count(),
        "pairs_out": n_pairs,
        "wall_s": round(wall, 1),
    }


def rehearse_kendall():
    from vaero_ray.stages.keyed import bucketed_keyed_sum
    from vaero_ray.stages.numstats import kendall_tau_from_pairs
    from vaero_ray.stages.textstats import token_counts

    ds = rd.read_parquet(CORPUS, columns=["text"])

    def pair_counts(t: pa.Table) -> pa.Table:
        wt = token_counts(t, "text")
        g = (
            pa.table(
                {
                    "x": pc.cast(pc.utf8_length(t.column("text")), pa.int64()),
                    "y": wt.column("n_tokens"),
                }
            )
            .group_by(["x", "y"])
            .aggregate([([], "count_all")])
        )
        return g.rename_columns(["x", "y", "c"])

    t0 = time.time()
    pairs = ds.map_batches(pair_counts, batch_format="pyarrow", zero_copy_batch=True)
    merged = pa.Table.from_pylist(
        bucketed_keyed_sum(pairs, ["x", "y"], ["c"], num_buckets=8).take_all()
    )
    r = kendall_tau_from_pairs(
        merged.column("x").to_pylist(),
        merged.column("y").to_pylist(),
        merged.column("c").to_pylist(),
    )
    wall = time.time() - t0
    return {
        "op": "kendall_tau_b",
        "rows_in": r["n"],
        "distinct_pairs": merged.num_rows,
        "tau_e6": r["tau_e6"],
        "wall_s": round(wall, 1),
    }


def _hourly_role_counts():
    from vaero_ray.stages.keyed import bucketed_keyed_sum

    ds = rd.read_parquet(CORPUS, columns=["ts", "role"])

    def hour_partial(df: pd.DataFrame) -> pd.DataFrame:
        hr = (
            df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
            // 3_600_000_000
        )
        out = pd.DataFrame({"role": df["role"], "hr": hr})
        out["n"] = np.int64(1)
        return out.groupby(["role", "hr"], sort=False, as_index=False).sum()

    return (
        pa.Table.from_pylist(
            bucketed_keyed_sum(
                ds.map_batches(hour_partial, batch_format="pandas"),
                ["role", "hr"],
                ["n"],
                num_buckets=8,
            ).take_all()
        )
        .to_pandas()
        .sort_values(["role", "hr"])
    )


def rehearse_theilsen():
    from vaero_ray.stages.numstats import theil_sen_slope_e6

    t0 = time.time()
    df = _hourly_role_counts()
    slopes = {
        role: theil_sen_slope_e6(
            g["hr"].to_numpy(np.int64), g["n"].to_numpy(np.int64)
        )
        for role, g in df.groupby("role", sort=True)
    }
    wall = time.time() - t0
    return {
        "op": "theil_sen_hourly",
        "series_rows": len(df),
        "slopes_e6": slopes,
        "wall_s": round(wall, 1),
    }


def rehearse_lag():
    t0 = time.time()
    df = _hourly_role_counts()
    wide = df.pivot_table(index="hr", columns="role", values="n", aggfunc="sum")
    hr = wide.index.to_numpy(np.int64)
    v = wide.get("user", pd.Series(0, index=wide.index)).fillna(0).to_numpy(np.int64)
    p = (
        wide.get("assistant", pd.Series(0, index=wide.index))
        .fillna(0)
        .to_numpy(np.int64)
    )
    out = {}
    for lag in range(-3, 4):
        idx = np.searchsorted(hr, hr + lag)
        ok = (idx < len(hr)) & (hr[np.minimum(idx, len(hr) - 1)] == hr + lag)
        out[lag] = int(np.sum(v[ok] * p[idx[ok]]))
    wall = time.time() - t0
    return {
        "op": "hourly_lead_lag",
        "hours": len(hr),
        "sum_user_x_assistant": out,
        "wall_s": round(wall, 1),
    }


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--op", default="all")
    args = ap.parse_args()
    if not ray.is_initialized():
        ray.init(
            address="local", num_cpus=32, include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    res = []
    if args.op in ("jw", "all"):
        res.append(rehearse_jw())
    if args.op in ("kendall", "all"):
        res.append(rehearse_kendall())
    if args.op in ("theilsen", "all"):
        res.append(rehearse_theilsen())
    if args.op in ("lag", "all"):
        res.append(rehearse_lag())
    for r in res:
        print(json.dumps(r))
    ray.shutdown()
