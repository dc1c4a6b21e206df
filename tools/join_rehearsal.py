#!/usr/bin/env python
"""Corpus-scale rehearsal of the stream-stream windowed join: generate
two multi-million-row event streams (deterministic, Arrow-vectorized),
drive StreamingJoinJob over them at full parallelism, and report
per-epoch walls, buffer (state) sizes, late counts and total emitted
pairs — the evidence that the dual-buffer shapes hold beyond gate scale.

Usage: python tools/join_rehearsal.py [rows_per_side] [n_chunks] [n_keys]
Defaults: 8,000,000 rows per side, 8 chunks per side, 200,000 keys.

The fixture models the gate's views->purchases shape: ts increases
~uniformly across the stream, keys are uniform, and the right stream
lags the left by up to the join window so a large fraction of pairs
span epochs (the buffered path, not the same-epoch fast path).
"""

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

N = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
CHUNKS = int(sys.argv[2]) if len(sys.argv) > 2 else 8
KEYS = int(sys.argv[3]) if len(sys.argv) > 3 else 200_000
WITHIN_S = 600
SPAN_S = 40_000  # event-time span of the whole stream
BASE = "/tmp/vaero_ray_join_rehearsal"


def gen_side(side: str, seed: int) -> str:
    d = f"{BASE}/{side}"
    done = f"{d}/.done-{N}-{CHUNKS}-{KEYS}"
    if os.path.exists(done):
        return d
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d)
    rng = np.random.default_rng(seed)
    per = N // CHUNKS
    lo = 0
    for i in range(CHUNKS):
        # ts sorted within and across chunks (arrival order == event time)
        span_lo = SPAN_S * i // CHUNKS
        span_hi = SPAN_S * (i + 1) // CHUNKS
        ts = np.sort(rng.integers(span_lo * 1_000_000, span_hi * 1_000_000, per))
        t = pa.table(
            {
                "k": pa.array(rng.integers(0, KEYS, per), pa.int64()),
                "ts": pa.array(ts.astype("datetime64[us]")),
                f"{side}_id": pa.array(np.arange(lo, lo + per), pa.int64()),
            }
        )
        pq.write_table(t, f"{d}/chunk-{i:04d}.parquet")
        lo += per
    open(done, "w").close()
    return d


def main():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from vaero_ray.streaming.join_job import StreamingJoinJob

    ld = gen_side("view", 42)
    rd_ = gen_side("buy", 43)
    out_d, ckpt_d = f"{BASE}/out", f"{BASE}/ckpt"
    shutil.rmtree(out_d, ignore_errors=True)
    shutil.rmtree(ckpt_d, ignore_errors=True)
    job = StreamingJoinJob(
        left_dir=ld,
        right_dir=rd_,
        out_dir=out_d,
        ckpt_dir=ckpt_d,
        key="k",
        within_s=WITHIN_S,
        left_cols=["view_id"],
        right_cols=["buy_id"],
        num_partitions=32,
    )
    t0 = time.perf_counter()
    manifests = job.run()
    wall = time.perf_counter() - t0
    pairs = sum(m.rows_out for m in manifests)
    rows_in = sum(m.rows_in for m in manifests)
    per_epoch = [
        {
            "epoch": m.epoch,
            "rows_in": m.rows_in,
            "rows_out": m.rows_out,
            "state_rows": m.state_rows,
            "rows_late": m.rows_late,
        }
        for m in manifests
    ]
    print(
        json.dumps(
            {
                "rows_per_side": N,
                "chunks_per_side": CHUNKS,
                "keys": KEYS,
                "within_s": WITHIN_S,
                "epochs": len(manifests),
                "wall_s": round(wall, 1),
                "rows_in_total": rows_in,
                "pairs_emitted": pairs,
                "rows_per_sec": round(rows_in / wall),
                "max_state_rows": max(m.state_rows for m in manifests),
                "per_epoch": per_epoch,
            }
        )
    )
    ray.shutdown()


if __name__ == "__main__":
    main()
