"""Corpus-scale rehearsal of the round-4 third-session operators over the
cached 32M-turn transcript corpus (~6400x the sf0.1 gate input):

1. conversation-fingerprint dedup — the transcript-payload dedup path:
   stateless turn hashing (int64s on the wire, text never shuffles),
   one conv-bucketed exchange, keep-min survivor per (fp, n_turns).
   Evidences the exchange shape at corpus scale: only (conv, ts, id,
   hash) quads move, and the second exchange is one row per conv.
2. alternation_stats — same bucket kernel family, aggregate-rows-only
   output.
3. heavy_hitters over conv_id (k = --hh-k) — the prune+verify pattern:
   per-block candidates are bounded by k-1 regardless of block size,
   so the candidate take_all is metadata-sized even at 32M rows.
4. group_overlap role x conv_id — three bounded stages; the mask
   histogram is <= 2^3 rows per bucket here.

Prints one JSON line (walls, rows in/out, turns/sec per op); full
ds.stats() of the fingerprint run to /tmp/convstats_rehearsal_stats.txt.

Usage: python tools/convstats_rehearsal.py [--input DIR] [--cpus N]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", default="/tmp/vaero_ray_bench/transcripts_32m")
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--hh-k", type=int, default=100_000)
    ap.add_argument("--files", type=int, default=0, help="limit input chunks (0 = all)")
    args = ap.parse_args()

    import ray
    import ray.data as rd

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.cpus, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    files = sorted(glob.glob(f"{args.input}/*.parquet"))
    if args.files:
        files = files[: args.files]
    turns_in = sum(pq.ParquetFile(f).metadata.num_rows for f in files)

    import pyarrow as pa

    from vaero_ray.stages.convstats import (
        alternation_stats,
        conv_fingerprint,
        dedup_by_fingerprint,
        turn_hash,
    )
    from vaero_ray.stages.relational import group_overlap
    from vaero_ray.stages.sketch import heavy_hitters

    def load(cols):
        return rd.read_parquet(files, columns=cols)

    out = {"input": args.input, "num_cpus": args.cpus, "turns_in": turns_in}

    # ---- 1. conversation fingerprint dedup ---------------------------
    t0 = time.perf_counter()
    ds = load(["conv_id", "turn_idx", "text"])

    def hash_stage(tbl: pa.Table) -> pa.Table:
        tmp = turn_hash(pa.table({"__t": tbl.column("text")}), "__t")
        return pa.table(
            {
                "conv_id": tbl.column("conv_id"),
                "turn_idx": tbl.column("turn_idx"),
                "th": tmp.column("th"),
            }
        )

    hashed = ds.map_batches(hash_stage, batch_format="pyarrow", zero_copy_batch=True)
    fps = conv_fingerprint(hashed, key="conv_id", order="turn_idx")
    kept = dedup_by_fingerprint(fps)
    n_kept = kept.count()
    wall_fp = time.perf_counter() - t0
    with open("/tmp/convstats_rehearsal_stats.txt", "w") as f:
        f.write(kept.stats())
    out["conv_fingerprint_dedup"] = {
        "wall_s": round(wall_fp, 1),
        "turns_per_sec": round(turns_in / wall_fp),
        "convs_kept": int(n_kept),
    }

    # ---- 2. alternation stats ----------------------------------------
    t0 = time.perf_counter()
    alt = alternation_stats(
        load(["conv_id", "role", "turn_idx"]), key="conv_id", order="turn_idx"
    )
    n_convs = alt.count()
    wall_alt = time.perf_counter() - t0
    out["alternation_stats"] = {
        "wall_s": round(wall_alt, 1),
        "turns_per_sec": round(turns_in / wall_alt),
        "convs": int(n_convs),
    }

    # ---- 3. heavy hitters over conv_id --------------------------------
    t0 = time.perf_counter()
    hh = heavy_hitters(load(["conv_id"]), "conv_id", k=args.hh_k)
    n_hh = hh.count()
    wall_hh = time.perf_counter() - t0
    out["heavy_hitters"] = {
        "k": args.hh_k,
        "wall_s": round(wall_hh, 1),
        "turns_per_sec": round(turns_in / wall_hh),
        "hitters": int(n_hh),
    }

    # ---- 4. audience overlap (role x conv) ----------------------------
    t0 = time.perf_counter()
    ov = group_overlap(load(["role", "conv_id"]), "role", "conv_id")
    n_pairs = ov.count()
    wall_ov = time.perf_counter() - t0
    out["group_overlap"] = {
        "wall_s": round(wall_ov, 1),
        "turns_per_sec": round(turns_in / wall_ov),
        "pairs": int(n_pairs),
    }

    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
