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


def rehearse_editdist():
    """Planted-mutation fuzzy-dedup verify at corpus scale: every 64th
    turn gets a 3-edit replica; blocking key = first 24 chars of text
    (mutations append at the end, so true pairs share a block);
    edit_distance_pairs verifies every in-block candidate with the
    batched DP. Exercises the vectorized cross-group pair enumeration
    (millions of tiny blocking groups, no per-group Python)."""
    ds = rd.read_parquet(CORPUS, columns=["conv_id", "turn_idx", "text"])

    def derive(tbl: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        ti = tbl.column("turn_idx").to_numpy().astype(np.int64)
        # stable 64-bit row id from (conv_id hash, turn_idx)
        conv = tbl.column("conv_id").to_pandas()
        import pandas as pd
        ch = pd.util.hash_array(conv.to_numpy(object), categorize=False).astype(np.uint64)
        rid = ((ch >> np.uint64(16)) << np.uint64(10)).astype(np.int64) + (ti % 512) * 2
        texts = tbl.column("text").to_pylist()
        base = pa.table({
            "rid": pa.array(rid, pa.int64()),
            "text": tbl.column("text"),
            "blk": pa.array([t[:40] for t in texts], pa.string()),
        })
        sel = np.flatnonzero(ti % 64 == 0)
        mtexts = [texts[i] + " xq" for i in sel]
        rep = pa.table({
            "rid": pa.array(rid[sel] + 1, pa.int64()),  # odd lane: never aliases a real turn
            "text": pa.array(mtexts, tbl.schema.field("text").type),
            "blk": pa.array([t[:40] for t in mtexts], pa.string()),
        })
        return pa.concat_tables([base, rep])

    both = ds.map_batches(derive, batch_format="pyarrow", zero_copy_batch=True)
    from vaero_ray.stages.editdist import edit_distance_pairs
    t0 = time.time()
    out = edit_distance_pairs(both, "rid", "text", ["blk"], max_distance=3)
    n_pairs = out.count()
    wall = time.time() - t0
    return {"op": "edit_distance_pairs", "rows_in": both.count(), "pairs_out": n_pairs, "wall_s": round(wall, 1)}


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
    if args.op == "editdist":
        res.append(rehearse_editdist())
    for r in res:
        print(json.dumps(r))
    ray.shutdown()
