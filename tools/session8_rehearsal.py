"""Corpus-scale rehearsal of the session-8 operators over the cached
16M-turn transcript corpus (tools/session5_rehearsal.py regenerates it).

- regex CEP: non-overlapping ``at+u`` (assistant -> tool(s) -> user
  resumes; the corpus's tool bursts trail assistant turns) per conv — ONE compiled-regex scan per
  bucket over a separator-walled byte buffer built from 16M turns; the
  Python loop is over matches, never rows.
- last-touch attribution: per assistant turn, the same conversation's
  latest prior non-assistant role (index maximum.accumulate forward
  fill), (attr, n) partials out of each bucket.
- hourly anomaly scores: per-role hourly turn counts (bounded keyed
  exchange) -> trailing-24h population z-scores from exact int window
  sums over the merged series.
- Pareto frontier: per-conv (total chars, NEGATED turns) skyline —
  the verbosity-efficiency frontier (longest text in fewest turns);
  negation makes the axes anti-correlated, the skyline's hard case.
  ~800k aggregated rows prune to per-block local frontiers before one
  tiny repartition.

Run: python tools/session8_rehearsal.py [--op regex|attr|anomaly|pareto|all]
"""
import argparse
import json
import time

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

CORPUS = "/tmp/vaero_ray_bench/transcripts_16m"


def rehearse_regex():
    ds = rd.read_parquet(CORPUS, columns=["conv_id", "turn_idx", "role"])
    from vaero_ray.stages.cep import regex_pattern_counts

    t0 = time.time()
    out = regex_pattern_counts(
        ds,
        "conv_id",
        ["turn_idx"],
        "role",
        {"user": "u", "assistant": "a", "tool": "t"},
        r"at+u",
    )

    def tot(tbl: pa.Table) -> pa.Table:
        n = tbl.column("n_matches").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "convs": pa.array([tbl.num_rows], pa.int64()),
                "matches": pa.array([int(n.sum())], pa.int64()),
            }
        )

    agg = out.map_batches(tot, batch_format="pyarrow", zero_copy_batch=True).sum(
        ["convs", "matches"]
    )
    wall = time.time() - t0
    return {
        "op": "regex CEP at+u per conv",
        "convs": int(agg["sum(convs)"]),
        "matches": int(agg["sum(matches)"]),
        "wall_s": round(wall, 1),
    }


def rehearse_attr():
    ds = rd.read_parquet(CORPUS, columns=["conv_id", "turn_idx", "role"])
    from vaero_ray.stages.cep import last_touch_counts

    t0 = time.time()
    rows = last_touch_counts(
        ds, "conv_id", ["turn_idx"], "role", target="assistant"
    ).take_all()
    wall = time.time() - t0
    return {
        "op": "last-touch attribution (assistant turns)",
        "attr": {r["attr_type"]: r["n"] for r in rows},
        "wall_s": round(wall, 1),
    }


def _hourly_role_counts():
    ds = rd.read_parquet(CORPUS, columns=["role", "ts"])
    from vaero_ray.stages.keyed import bucketed_keyed_sum

    def partial(t: pa.Table) -> pa.Table:
        us = pc.cast(t.column("ts").combine_chunks().cast(pa.timestamp("us")), pa.int64())
        df = pd.DataFrame(
            {
                "role": t.column("role").to_pandas(),
                "hr": pc.divide(us, 3600000000).to_numpy(zero_copy_only=False),
            }
        )
        g = df.groupby(["role", "hr"], sort=False).size().rename("c").reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    counts = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return bucketed_keyed_sum(counts, ["role", "hr"], ["c"])


def rehearse_anomaly():
    from vaero_ray.stages.numstats import rolling_zscores_per_group

    t0 = time.time()
    out = rolling_zscores_per_group(_hourly_role_counts(), "role", "hr", "c", w=24)
    n = out.count()
    wall = time.time() - t0
    return {
        "op": "hourly anomaly z (3 roles x hours) from 16M turns",
        "series_rows": n,
        "wall_s": round(wall, 1),
    }


def rehearse_pareto():
    ds = rd.read_parquet(CORPUS, columns=["conv_id", "text"])
    from vaero_ray.stages.keyed import bucketed_keyed_sum
    from vaero_ray.stages.selection import pareto_frontier

    t0 = time.time()

    def partial(t: pa.Table) -> pa.Table:
        n_chars = pc.cast(pc.utf8_length(t.column("text")), pa.int64())
        df = pd.DataFrame(
            {
                "conv_id": t.column("conv_id").to_pandas(),
                "neg_turns": np.full(t.num_rows, -1, np.int64),
                "n_chars": n_chars.to_numpy(zero_copy_only=False),
            }
        )
        return pa.Table.from_pandas(
            df.groupby("conv_id", sort=False, as_index=False).sum(),
            preserve_index=False,
        )

    per_conv = bucketed_keyed_sum(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        ["conv_id"], ["neg_turns", "n_chars"],
    )
    front = pareto_frontier(per_conv, "n_chars", "neg_turns").take_all()
    wall = time.time() - t0
    return {
        "op": "Pareto frontier (chars vs -turns) over ~800k per-conv aggregates",
        "frontier_size": len(front),
        "wall_s": round(wall, 1),
    }


OPS = {
    "regex": rehearse_regex,
    "attr": rehearse_attr,
    "anomaly": rehearse_anomaly,
    "pareto": rehearse_pareto,
}

if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--op", default="all")
    args = ap.parse_args()
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    names = list(OPS) if args.op == "all" else [args.op]
    for nm in names:
        print(json.dumps(OPS[nm]()))
    import time as _t

    _t.sleep(1.5)
    ray.shutdown()
