"""Corpus-scale rehearsal of the session-7 numstats tier over the cached
16M-turn transcript corpus (tools/session5_rehearsal.py regenerates it).

- corr_matrix: 4 derived numeric columns (length, turn_idx, hour,
  word count) -> all 6 Pearson pairs in ONE pass (per-block Gram
  matmul, zero shuffle). The headline "statistics without exchanges"
  claim at 16M rows.
- gini_per_group: per-role Gini of text length — distinct-value
  compression (length domain ~hundreds) means the exchange carries
  (role, len, count) cells, not 16M rows.
- entropy_per_group: per-CONVERSATION role-mix entropy — ~800k groups
  stress the bounded (key, cat) exchange.
- interarrival CV: per-conv gap moments (one bucketed shuffle of the
  16M rows, then integer moment merge).

Run: python tools/session7_rehearsal.py [--op corr|gini|entropy|cv|all]
"""
import argparse
import json
import time

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

CORPUS = "/tmp/vaero_ray_bench/transcripts_16m"


def _with_numeric(columns):
    ds = rd.read_parquet(CORPUS, columns=columns)
    return ds


def rehearse_corr():
    ds = _with_numeric(["turn_idx", "text", "ts"])

    def derive(tbl: pa.Table) -> pa.Table:
        n_chars = pc.cast(pc.utf8_length(tbl.column("text")), pa.int64())
        words = pc.cast(
            pc.list_value_length(pc.split_pattern_regex(tbl.column("text"), r"\s+")),
            pa.int64(),
        )
        us = tbl.column("ts").cast(pa.timestamp("us")).cast(pa.int64())
        return pa.table(
            {
                "n_chars": n_chars,
                "turn_idx": pc.cast(tbl.column("turn_idx"), pa.int64()),
                "hr": pc.divide(us, 3600000000),
                "n_words": words,
            }
        )

    from vaero_ray.stages.numstats import corr_matrix

    num = ds.map_batches(derive, batch_format="pyarrow", zero_copy_batch=True)
    t0 = time.time()
    out = corr_matrix(num, ["n_chars", "turn_idx", "hr", "n_words"])
    wall = time.time() - t0
    return {
        "op": "corr_matrix(4 cols, 6 pairs)",
        "rows_in": ds.count(),
        "pairs": out.num_rows,
        "wall_s": round(wall, 1),
    }


def rehearse_gini():
    ds = _with_numeric(["role", "text"])

    def derive(tbl: pa.Table) -> pa.Table:
        return pa.table(
            {
                "role": tbl.column("role"),
                "n_chars": pc.cast(pc.utf8_length(tbl.column("text")), pa.int64()),
            }
        )

    from vaero_ray.stages.numstats import gini_per_group

    num = ds.map_batches(derive, batch_format="pyarrow", zero_copy_batch=True)
    t0 = time.time()
    out = gini_per_group(num, "role", "n_chars").to_pandas()
    wall = time.time() - t0
    return {
        "op": "gini_per_group(role, len)",
        "groups": len(out),
        "gini": {r.role: round(r.gini, 4) for r in out.itertuples()},
        "wall_s": round(wall, 1),
    }


def rehearse_entropy():
    ds = _with_numeric(["conv_id", "role"])
    from vaero_ray.stages.numstats import entropy_per_group

    t0 = time.time()
    out = entropy_per_group(ds, "conv_id", "role")
    n = out.count()
    wall = time.time() - t0
    return {"op": "entropy_per_group(conv, role)", "groups": n, "wall_s": round(wall, 1)}


def rehearse_cv():
    ds = _with_numeric(["conv_id", "turn_idx", "ts"])
    from vaero_ray.stages.keyed import bucketed_keyed_sum
    from vaero_ray.stages.rowwindow import interarrival

    t0 = time.time()
    g = interarrival(ds, "conv_id", "ts", "turn_idx", out="gap_us")

    import pandas as pd

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["gap_us"] >= 0]
        gs = (df["gap_us"].to_numpy(np.int64) // 1_000_000).astype(np.int64)
        out = pd.DataFrame(
            {
                "conv_id": df["conv_id"].to_numpy(),
                "n_gaps": np.ones(len(gs), np.int64),
                "sum_s": gs,
                "sumsq_s": gs * gs,
            }
        )
        return out.groupby("conv_id", sort=False, as_index=False).sum()

    merged = bucketed_keyed_sum(
        g.map_batches(partial, batch_format="pandas"),
        ["conv_id"],
        ["n_gaps", "sum_s", "sumsq_s"],
    )
    n = merged.count()
    wall = time.time() - t0
    return {"op": "interarrival CV moments(conv)", "groups": n, "wall_s": round(wall, 1)}


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--op", default="all")
    args = ap.parse_args()
    if not ray.is_initialized():
        ray.init(
            address="local", num_cpus=32, include_dashboard=False, logging_level="ERROR"
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    res = []
    if args.op in ("corr", "all"):
        res.append(rehearse_corr())
    if args.op in ("gini", "all"):
        res.append(rehearse_gini())
    if args.op in ("entropy", "all"):
        res.append(rehearse_entropy())
    if args.op in ("cv", "all"):
        res.append(rehearse_cv())
    for r in res:
        print(json.dumps(r))
    import time as _t

    _t.sleep(1.5)
    ray.shutdown()
