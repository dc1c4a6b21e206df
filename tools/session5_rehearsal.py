"""Corpus-scale rehearsal of the round-4 fifth-session operators over
the cached multi-million-turn transcript corpus (generated on demand):

1. global_seq — global ordered enumeration (ROW_NUMBER over the whole
   corpus by (ts, conv_id, turn_idx)): the one unavoidable all-to-all
   range-partition sort plus the block-offset prefix-sum passes. The
   driver sees ONE metadata row per block; no data row leaves its
   post-sort block.
2. query_topk — lexical tf-idf retrieval for a 3-term query over every
   turn-document: tokens pruned to the query set inside the scan, df is
   a 3-row driver aggregate, per-doc scores shuffle-free, one final
   sort-limit over the scored docs.
3. inverted_index — the stopword-cap (max_df) story at corpus scale:
   the ~69-word lorem vocabulary appears in ~every turn and is DROPPED
   by max_df (posting lists for stopword-class terms are inherently
   corpus-sized — the cap is the standard index-construction recall
   policy), while the rare digit/email identifier tokens are indexed
   with bounded posting lists. Reports indexed-term count and the
   largest posting list emitted.

Prints one JSON line; per-op ds.stats() to /tmp/session5_rehearsal_stats.txt.

Usage: python tools/session5_rehearsal.py [--input DIR] [--cpus N] [--turns N]
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
    ap.add_argument("--input", default="/tmp/vaero_ray_bench/transcripts_16m")
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--turns", type=int, default=16_000_000,
                    help="corpus size to generate when --input is missing")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.cpus, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from vaero_ray.io import read_parquet as _read_pq
    from vaero_ray.sources.transcripts import write_transcripts_chunks
    from vaero_ray.stages.rowwindow import global_row_number
    from vaero_ray.stages.textstats import inverted_index, query_topk_docs

    if not os.path.isdir(args.input):
        write_transcripts_chunks(
            args.input, n_files=128, n_convs=args.turns // 20, mean_turns=20, seed=42
        )
    files = sorted(glob.glob(os.path.join(args.input, "*.parquet")))
    n_rows = sum(pq.ParquetFile(f).metadata.num_rows for f in files)
    results: dict = {"input": args.input, "rows": n_rows, "cpus": args.cpus}
    stats_out = open("/tmp/session5_rehearsal_stats.txt", "w")

    # warm the worker pool (bench.py lesson: first query pays proc spawn)
    _read_pq(files[:2], columns=["conv_id"]).count()

    def timed(name, fn):
        t0 = time.perf_counter()
        out = fn()
        wall = round(time.perf_counter() - t0, 2)
        results[name] = {"wall_s": wall, "turns_per_sec": int(n_rows / wall)}
        return out

    # ---- 1. global ordered enumeration --------------------------------
    def run_seq():
        ds = _read_pq(files, columns=["ts", "conv_id", "turn_idx"])
        # (conv_id, turn_idx) makes the 3-key tuple unique
        out = global_row_number(ds, keys=["ts", "conv_id", "turn_idx"], out_col="seq")
        n = out.count()
        stats_out.write("== global_seq ==\n" + out.stats() + "\n")
        results["global_seq_rows"] = n
        return n

    timed("global_seq", run_seq)

    def as_doc(tbl):
        # deterministic vectorized doc id from (conv hash, turn_idx) —
        # turn_hash is the cache-blocked Mersenne fold (NOT Python hash(),
        # which is per-process-randomized)
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        from vaero_ray.stages.convstats import turn_hash

        ch = turn_hash(tbl, "conv_id", "ch").column("ch").to_numpy(zero_copy_only=False)
        t = pc.cast(tbl.column("turn_idx"), pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": pa.array((ch & ((1 << 46) - 1)) * 4096 + t, pa.int64()),
                "text": tbl.column("text"),
            }
        )

    # ---- 2. lexical retrieval ------------------------------------------
    def run_topk():
        ds = _read_pq(files, columns=["conv_id", "turn_idx", "text"])
        docs = ds.map_batches(as_doc, batch_format="pyarrow", zero_copy_batch=True)
        out = query_topk_docs(
            docs, terms=["lorem", "dolore", "consequat"], k=10, n_docs=n_rows
        )
        rows = out.take_all()
        stats_out.write("== query_topk ==\n(top-10 rows)\n")
        results["query_topk_rows"] = len(rows)
        return rows

    timed("query_topk", run_topk)

    # ---- 3. inverted index with the stopword cap ------------------------
    def run_index():
        import pyarrow as pa

        ds = _read_pq(files, columns=["conv_id", "turn_idx", "text"])
        docs = ds.map_batches(as_doc, batch_format="pyarrow", zero_copy_batch=True)
        idx = inverted_index(docs, min_df=2, max_df=100_000, num_buckets=128)

        def summarize(tbl: pa.Table) -> pa.Table:
            if not tbl.num_rows:
                return pa.table({"n_terms": pa.array([], pa.int64()),
                                 "max_df": pa.array([], pa.int64())})
            df = tbl.column("df").to_numpy(zero_copy_only=False)
            return pa.table({"n_terms": pa.array([len(df)], pa.int64()),
                             "max_df": pa.array([int(df.max())], pa.int64())})

        parts = idx.map_batches(summarize, batch_format="pyarrow").take_all()
        n_terms = sum(r["n_terms"] for r in parts)
        max_df = max((r["max_df"] for r in parts), default=0)
        stats_out.write("== inverted_index ==\n" + idx.stats() + "\n")
        results["index_terms"] = n_terms
        results["index_max_df"] = max_df
        return n_terms

    timed("inverted_index", run_index)

    stats_out.close()
    print(json.dumps(results))
    ray.shutdown()


if __name__ == "__main__":
    main()
