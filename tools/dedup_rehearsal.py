"""Corpus-scale rehearsal of the NEAR-DUP tier (round-4 follow-up to
tools/corpus_rehearsal.py, which rehearses the exact-dedup capstone).

Two measurements, deliberately at different scales:

1. CENSUS at the FULL corpus (default 32M turns, ~6400x the sf0.1 gate
   input): signatures + banding + per-(band, hash) bucket counts — the
   linear-cost stages, proving the cap statistics (buckets over cap,
   docs dropped, uncapped-vs-capped candidate volume) at corpus scale.
2. TIMED ``simhash_dup_pairs`` run over ``--pairs-files`` chunks
   (default 4 = ~1M turns): the template corpus's TRUE near-dup pair
   count grows ~n^1.6 (measured 249k->44M, 498k->130M pairs), so the
   full input's ~1e10-pair OUTPUT is an output-volume problem no
   pair-emitting operator should shoulder — at that density the right
   tools are exact_dedup / dedup_keep_best / dup_clusters. The timed
   run demonstrates the operator's memory shape (per-task pair output
   = pairs/num_shards via the round-4 sizing knobs) at the largest
   input whose true output is sane.

Publishes what the sf-scale gates can't show:

- The corpus is a deliberately ADVERSARIAL banding workload: every turn
  samples sentences from one 4096-sentence pool, so 16-bit band values
  collapse into degenerate buckets (measured: the top band bucket holds
  >40% of a 1M-doc sample's rows in one 14-bit band). Uncapped, the
  candidate-pair count at 32M docs is ~1.5e14 — the exact OOM scenario
  round 3's verdict flagged. The ``max_bucket`` guard (4096, smallest-id
  sample, logged drop) bounds per-bucket verification work at cap^2
  REGARDLESS of corpus size, which is the property this rehearsal
  evidences.
- Capped-bucket census: how many (band, hash) buckets exceeded the cap
  and how many candidate rows were dropped ("No silent caps").
- Wall, exchange volume per stage from ``ds.stats()``, and verified
  pairs emitted.

Usage: python tools/dedup_rehearsal.py [--input DIR] [--cpus N] [--cap N]
Prints one JSON line; full ds.stats() to /tmp/dedup_rehearsal_stats.txt.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from tools.corpus_rehearsal import add_doc_id, stage_table


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", default="/tmp/vaero_ray_bench/transcripts_32m")
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    ap.add_argument("--cap", type=int, default=None, help="override max_bucket")
    ap.add_argument("--pairs-files", type=int, default=4,
                    help="input files for the TIMED pair run (census always "
                    "uses the full input; on this template-heavy corpus the "
                    "TRUE pair count grows ~n^1.6, so the full 32M input's "
                    "~1e10-pair output is an output-volume problem, not an "
                    "operator-memory one — see BASELINE.md round-4 notes)")
    ap.add_argument("--num-shards", type=int, default=512)
    ap.add_argument("--pair-buckets", type=int, default=128)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.cpus, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from vaero_ray.io import read_parquet as _read_pq
    from vaero_ray.stages.dedup import DEFAULT_MAX_BUCKET, simhash_dup_pairs, simhash_signatures

    cap = args.cap or DEFAULT_MAX_BUCKET
    files = sorted(
        os.path.join(args.input, f) for f in os.listdir(args.input) if f.endswith(".parquet")
    )
    turns_in = sum(pq.ParquetFile(f).metadata.num_rows for f in files)

    # warm the worker pool outside the timed window
    _read_pq(files[:8], columns=["turn_idx"]).count()

    def load(fs):
        ds = _read_pq(fs, columns=["conv_id", "turn_idx", "text"])
        return ds.map_batches(add_doc_id, batch_format="pyarrow", zero_copy_batch=True)

    # ---- capped-bucket census (signatures + banding only; no verifier) —
    # (band, hash) counts ride a native groupby so only distinct band
    # values leave any block; this is the "how degenerate is the corpus"
    # disclosure, not part of the timed operator run
    band_masks = [(0, 0xFFFF), (16, 0xFFFF), (32, 0xFFFF), (48, 0x3FFF)]

    def band_rows(tbl: pa.Table) -> pa.Table:
        sig = tbl.column("simhash").to_numpy(zero_copy_only=False).astype(np.uint64)
        bands, hashes = [], []
        for b, (shift, mask) in enumerate(band_masks):
            bands.append(np.full(len(sig), b, dtype=np.int32))
            hashes.append((sig >> np.uint64(shift)) & np.uint64(mask))
        return pa.table({
            "band_id": pa.array(np.concatenate(bands)),
            "band_hash": pa.array(np.concatenate(hashes), pa.uint64()),
        })

    t0 = time.perf_counter()
    sigs = load(files).map_batches(
        lambda t: simhash_signatures(t, "text", "doc_id"),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    census = (
        sigs.map_batches(band_rows, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["band_id", "band_hash"])
        .count()
    )

    def census_stats(tbl: pa.Table) -> pa.Table:
        c = tbl.column("count()").to_numpy(zero_copy_only=False).astype(np.int64)
        over = c > cap
        cand = c.astype(np.float64) * (c - 1) / 2
        capped = np.minimum(c, cap).astype(np.float64)
        return pa.table({
            "buckets": pa.array([len(c)], pa.int64()),
            "buckets_over_cap": pa.array([int(over.sum())], pa.int64()),
            "rows_dropped": pa.array([int((c - np.minimum(c, cap)).sum())], pa.int64()),
            "max_bucket_rows": pa.array([int(c.max()) if len(c) else 0], pa.int64()),
            "cand_pairs_uncapped": pa.array([float(cand.sum())], pa.float64()),
            "cand_pairs_capped": pa.array([float((capped * (capped - 1) / 2).sum())], pa.float64()),
        })

    cen_df = census.map_batches(census_stats, batch_format="pyarrow").to_pandas()
    cen = cen_df.sum()
    cen["max_bucket_rows"] = cen_df["max_bucket_rows"].max()  # max, not sum
    census_wall = time.perf_counter() - t0

    # ---- the timed operator run: full simhash_dup_pairs ---------------
    # over --pairs-files chunks: per-task pair output = pairs/num_shards,
    # sized via the emitters' round-4 num_shards/pair_buckets knobs
    pair_files = files[: args.pairs_files]
    pairs_turns_in = sum(pq.ParquetFile(f).metadata.num_rows for f in pair_files)
    t1 = time.perf_counter()
    pairs = simhash_dup_pairs(
        load(pair_files), max_hamming=8, max_bucket=cap,
        num_shards=args.num_shards, pair_buckets=args.pair_buckets,
    )
    n_pairs = pairs.count()
    wall = time.perf_counter() - t1
    stats = pairs.stats()
    with open("/tmp/dedup_rehearsal_stats.txt", "w") as f:
        f.write(stats)

    print(json.dumps({
        "metric": "simhash banding census at full corpus + timed dup-pair run (fat-bucket cap engaged)",
        "input": args.input,
        "num_cpus": args.cpus,
        "census_turns_in": turns_in,
        "pairs_turns_in": pairs_turns_in,
        "num_shards": args.num_shards,
        "pair_buckets": args.pair_buckets,
        "max_bucket_cap": cap,
        "census": {
            "band_buckets": int(cen["buckets"]),
            "buckets_over_cap": int(cen["buckets_over_cap"]),
            "candidate_rows_dropped": int(cen["rows_dropped"]),
            "max_bucket_rows": int(cen["max_bucket_rows"]),
            "cand_pairs_uncapped": float(cen["cand_pairs_uncapped"]),
            "cand_pairs_capped": float(cen["cand_pairs_capped"]),
            "census_wall_s": round(census_wall, 1),
        },
        "verified_pairs": int(n_pairs),
        "wall_s": round(wall, 1),
        "turns_per_sec": round(pairs_turns_in / wall, 1),
        "stages": stage_table(stats),
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
