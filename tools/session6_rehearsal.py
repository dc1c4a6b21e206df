"""Corpus-scale rehearsal of the session-6 operators over the cached
16M-turn transcript corpus (tools/session5_rehearsal.py regenerates it).

- merge_intervals: each turn opens a (turn_idx%240+30)-second extent;
  per-conv interval union -> merged activity spans. Exercises the
  one-bucketed-shuffle + cummax sweep at 16M rows / ~800k keys.
- global_percent_rank: PERCENT_RANK of every turn's text length via the
  broadcast cumulative lookup (domain-bounded distinct values).

Run: python tools/session6_rehearsal.py [--op intervals|pctrank|both]
"""
import argparse, json, time

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

CORPUS = "/tmp/vaero_ray_bench/transcripts_16m"


def rehearse_intervals():
    ds = rd.read_parquet(CORPUS, columns=["conv_id", "turn_idx", "ts"])

    def derive(tbl: pa.Table) -> pa.Table:
        ts = tbl.column("ts").cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
        ti = tbl.column("turn_idx").to_numpy().astype(np.int64)
        end = ts + ((ti % 240) + 30) * 1_000_000
        return pa.table({
            "conv_id": tbl.column("conv_id"),
            "s": pa.array(ts, pa.int64()),
            "e": pa.array(end, pa.int64()),
        })

    from vaero_ray.stages.cep import merge_intervals
    iv = ds.map_batches(derive, batch_format="pyarrow", zero_copy_batch=True)
    t0 = time.time()
    out = merge_intervals(iv, "conv_id", "s", "e")
    n_out = out.count()
    wall = time.time() - t0
    return {"op": "merge_intervals", "rows_in": ds.count(), "rows_out": n_out,
            "wall_s": round(wall, 1)}


def rehearse_pctrank():
    ds = rd.read_parquet(CORPUS, columns=["conv_id", "turn_idx", "text"])

    def lens(tbl: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return pa.table({
            "conv_id": tbl.column("conv_id"),
            "turn_idx": tbl.column("turn_idx"),
            "n_chars": pc.cast(pc.utf8_length(tbl.column("text")), pa.int64()),
        })

    from vaero_ray.stages.ranking import global_percent_rank
    withlen = ds.map_batches(lens, batch_format="pyarrow", zero_copy_batch=True)
    t0 = time.time()
    out = global_percent_rank(withlen, "n_chars")
    n_out = out.count()
    wall = time.time() - t0
    return {"op": "global_percent_rank", "rows_out": n_out, "wall_s": round(wall, 1)}


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--op", default="both")
    args = ap.parse_args()
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    res = []
    if args.op in ("intervals", "both"):
        res.append(rehearse_intervals())
    if args.op in ("pctrank", "both"):
        res.append(rehearse_pctrank())
    for r in res:
        print(json.dumps(r))
    ray.shutdown()
