"""Corpus-scale rehearsal of the round-4 fourth-session operators over
the cached multi-million-turn transcript corpus:

1. preference_pairs — DPO pair assembly end-to-end: user->assistant
   adjacency in one conv-bucketed kernel (prompt key = text hash mod
   100k so prompt groups have realistic multiplicity), then the
   two-extremes bounded exchange. Evidences that the pair stage moves
   <= 2 rows per (prompt, block) no matter how hot a prompt is.
2. ordered_ewma — per-conversation decayed length signal over every
   turn: the rank-step fold at corpus scale (loop length = max turns
   per conv, not rows).
3. resample_to_mixture — exact 2:2:1 role mixture over the corpus
   (counts pass + bounded prune/selection exchange).
4. quantile_band_filter — drop the 5% length outliers (register
   aggregate + stateless filter; two scans, no shuffle).
5. source_similarity — grouped minhash over pseudo-sources
   (hash(conv) % 8): the whole-corpus shingle scan; registers are
   8 x 32 rows however large the corpus is. Run on --sim-files chunks
   (the scan is the cost, the exchange is constant).

Prints one JSON line; per-op ds.stats() to /tmp/session4_rehearsal_stats.txt.

Usage: python tools/session4_rehearsal.py [--input DIR] [--cpus N]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", default="/tmp/vaero_ray_bench/transcripts_32m")
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--sim-files", type=int, default=32, help="chunks for source_similarity")
    args = ap.parse_args()

    import ray
    import ray.data as rd

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.cpus, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from vaero_ray.io import read_parquet as _read_pq
    from vaero_ray.stages.convstats import turn_hash
    from vaero_ray.stages.keyed import bucketed_map_groups
    from vaero_ray.stages.preference import preference_pairs
    from vaero_ray.stages.cep import ordered_ewma
    from vaero_ray.stages.corpus import resample_to_mixture
    from vaero_ray.stages.sketch import quantile_band_filter
    from vaero_ray.stages.sourcesim import source_similarity

    files = sorted(glob.glob(os.path.join(args.input, "*.parquet")))
    n_rows = sum(pq.ParquetFile(f).metadata.num_rows for f in files)
    results: dict = {"input": args.input, "rows": n_rows, "cpus": args.cpus}
    stats_out = open("/tmp/session4_rehearsal_stats.txt", "w")

    # warm the worker pool (bench.py lesson: first query pays proc spawn)
    _read_pq(files[:2], columns=["conv_id"]).count()

    def timed(name, fn):
        t0 = time.perf_counter()
        out = fn()
        wall = round(time.perf_counter() - t0, 2)
        results[name] = {"wall_s": wall, "turns_per_sec": int(n_rows / wall)}
        return out

    import pandas as pd

    # ---- 1. preference_pairs ------------------------------------------
    def run_prefs():
        ds = _read_pq(files, columns=["conv_id", "turn_idx", "role", "text", "ts"])

        def pre(tbl: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            t = turn_hash(tbl, "text", "th")
            return pa.table(
                {
                    "conv_id": tbl.column("conv_id"),
                    "turn_idx": tbl.column("turn_idx").cast(pa.int64()),
                    "role": tbl.column("role"),
                    "pk": pa.array(
                        t.column("th").to_numpy() % 100_000, pa.int64()
                    ),
                    "tlen": pc.cast(pc.utf8_length(tbl.column("text")), pa.int64()),
                    "tsus": tbl.column("ts").cast(pa.timestamp("us")).cast(pa.int64()),
                }
            )

        def candidates(df: pd.DataFrame) -> pd.DataFrame:
            df = df.sort_values(["conv_id", "turn_idx"], kind="mergesort")
            conv = df["conv_id"].to_numpy()
            role = df["role"].to_numpy()
            m = (conv[1:] == conv[:-1]) & (role[:-1] == "user") & (role[1:] == "assistant")
            return pd.DataFrame(
                {
                    "prompt_key": df["pk"].to_numpy()[:-1][m],
                    "resp_id": df["tsus"].to_numpy()[1:][m],
                    "score": df["tlen"].to_numpy()[1:][m],
                }
            )

        pre_ds = ds.map_batches(pre, batch_format="pyarrow", zero_copy_batch=True)
        cand = bucketed_map_groups(pre_ds, "conv_id", candidates)
        out = preference_pairs(cand, "prompt_key", "score", "resp_id")
        n = out.count()
        stats_out.write("== preference_pairs ==\n" + out.stats() + "\n\n")
        results["preference_pairs_rows"] = n
        return n

    timed("preference_pairs", run_prefs)

    # ---- 2. ordered_ewma ----------------------------------------------
    def run_ewma():
        ds = _read_pq(files, columns=["conv_id", "turn_idx", "text", "ts"])

        def pre(tbl: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            return pa.table(
                {
                    "conv_id": tbl.column("conv_id"),
                    "ts": tbl.column("ts"),
                    "turn_idx": tbl.column("turn_idx").cast(pa.int64()),
                    "tlen": pc.cast(pc.utf8_length(tbl.column("text")), pa.int64()),
                }
            )

        ds = ds.map_batches(pre, batch_format="pyarrow", zero_copy_batch=True)
        out = ordered_ewma(ds, "conv_id", "ts", "tlen", "turn_idx", 30, 100)
        n = out.count()
        stats_out.write("== ordered_ewma ==\n" + out.stats() + "\n\n")
        results["ewma_convs"] = n
        return n

    timed("ordered_ewma", run_ewma)

    # ---- 3. resample_to_mixture ----------------------------------------
    def run_mixture():
        ds = _read_pq(files, columns=["conv_id", "role", "ts"])

        def pre(tbl: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "rid": tbl.column("ts").cast(pa.timestamp("us")).cast(pa.int64()),
                    "role": tbl.column("role"),
                }
            )

        ds = ds.map_batches(pre, batch_format="pyarrow", zero_copy_batch=True)
        out = resample_to_mixture(ds, "rid", "role", {"user": 2, "assistant": 2, "tool": 1})
        n = out.count()
        stats_out.write("== resample_to_mixture ==\n" + out.stats() + "\n\n")
        results["mixture_rows"] = n
        return n

    timed("resample_to_mixture", run_mixture)

    # ---- 4. quantile_band_filter ---------------------------------------
    def run_band():
        ds = _read_pq(files, columns=["conv_id", "text"])

        def pre(tbl: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            return pa.table(
                {
                    "conv_id": tbl.column("conv_id"),
                    "n_chars": pc.cast(pc.utf8_length(tbl.column("text")), pa.int64()),
                }
            )

        ds = ds.map_batches(pre, batch_format="pyarrow", zero_copy_batch=True)
        out = quantile_band_filter(ds, "n_chars", 25, 975)
        n = out.count()
        stats_out.write("== quantile_band_filter ==\n" + out.stats() + "\n\n")
        results["band_rows"] = n
        return n

    timed("quantile_band_filter", run_band)

    # ---- 5. source_similarity (subset of chunks) ------------------------
    sim_files = files[: args.sim_files] if args.sim_files else files
    sim_rows = sum(pq.ParquetFile(f).metadata.num_rows for f in sim_files)

    def run_sim():
        ds = _read_pq(sim_files, columns=["conv_id", "text"])

        def pre(tbl: pa.Table) -> pa.Table:
            conv = tbl.column("conv_id").to_pandas()
            from vaero_ray.stages.keyed import hash_bucket

            b = hash_bucket(conv, 8).astype(np.int64)
            return pa.table({"src": pa.array(b, pa.int64()), "text": tbl.column("text")})

        ds = ds.map_batches(pre, batch_format="pyarrow", zero_copy_batch=True)
        out = source_similarity(ds, "src", "text")
        results["sim_pairs"] = out.num_rows
        results["sim_rows_scanned"] = sim_rows
        return out

    t0 = time.perf_counter()
    run_sim()
    wall = round(time.perf_counter() - t0, 2)
    results["source_similarity"] = {"wall_s": wall, "turns_per_sec": int(sim_rows / wall)}

    stats_out.close()
    print(json.dumps(results))
    ray.shutdown()


if __name__ == "__main__":
    main()
