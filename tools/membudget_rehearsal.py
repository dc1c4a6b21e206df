"""Memory-budget rehearsal (VERDICT r4 #9): the one resource axis the
corpus rehearsals hadn't pinned — behavior under a deliberately
CONSTRAINED object store.

Runs, in ONE Ray session with ``object_store_memory`` capped (default
16 GiB, vs the ~37 GiB default on this 128 GiB box):

- the training-data capstone (dedup -> quality -> lang -> pack, the
  corpus_rehearsal.py shape) over the 16M-turn transcript corpus —
  ~9 GB of text in flight, so block spilling must engage under a 16 GiB
  store while the pipeline streams;
- the two genuinely quadratic-in-bucket graph ops from the bench's
  expensive band, at sf0.1: ``part_triangle_counts`` (degree-oriented
  triangle census) and ``order_basket_containment`` (pair co-occurrence
  containment).

Evidence captured per op: wall, rows out, then the session's cumulative
spill/restore byte counters (parsed from ``memory_summary`` — the same
numbers the autoscaler reports) and the configured store cap. PASS
criterion is completion without OOM at full output parity; spilled
bytes > 0 on the capstone is EXPECTED (that's the point — Ray Data's
streaming executor + plasma spilling absorb a store smaller than the
working set, which is exactly the 100-TB posture where the object store
is always smaller than the data).

Usage: python tools/membudget_rehearsal.py [--input DIR] [--cpus N]
       [--store-gb 16] [--sf-dir /root/testdata/sf0.1]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq


def spill_stats() -> dict:
    """Cumulative plasma spill/restore counters for this session, parsed
    from the raylet's periodic log lines ("Spilled N MiB, M objects",
    cumulative — the last occurrence is the running total). The gRPC
    ``memory_summary`` API needs the ``grpc`` package, absent here."""
    import glob
    import subprocess

    out = {"spilled_mib": 0, "spilled_objects": 0, "restored_mib": 0, "restored_objects": 0}
    sessions = sorted(glob.glob("/tmp/ray/*/session_latest/logs")) + sorted(
        glob.glob("/tmp/ray/session_latest/logs")
    )
    if not sessions:
        return out
    txt = subprocess.run(
        ["grep", "-rhoE",
         r"(Spilled|Restored) [0-9]+ MiB, [0-9]+ objects", sessions[-1]],
        capture_output=True, text=True,
    ).stdout
    for kind in ("Spilled", "Restored"):
        hits = re.findall(rf"{kind} (\d+) MiB, (\d+) objects", txt)
        if hits:
            mib, objs = max(((int(a), int(b)) for a, b in hits))
            out[f"{kind.lower()}_mib"], out[f"{kind.lower()}_objects"] = mib, objs
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", default="/tmp/vaero_ray_bench/transcripts_16m")
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    ap.add_argument("--store-gb", type=float, default=16.0)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    import ray

    ray.init(
        address="local",
        num_cpus=args.cpus,
        include_dashboard=False,
        logging_level="ERROR",
        object_store_memory=int(args.store_gb * (1 << 30)),
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from vaero_ray.io import read_parquet as _read_pq
    from vaero_ray.stages.dedup import exact_dedup
    from vaero_ray.stages.pack import pack_sequences
    from vaero_ray.stages.textstats import lang_id_batch, quality_stats
    from tools.corpus_rehearsal import add_doc_id

    results = []

    # ---- capstone under the constrained store --------------------------
    files = sorted(
        os.path.join(args.input, f) for f in os.listdir(args.input) if f.endswith(".parquet")
    )
    turns_in = sum(pq.ParquetFile(f).metadata.num_rows for f in files)
    _read_pq(files[:8], columns=["turn_idx"]).count()  # warm worker pool

    def curate(d):
        d = d.map_batches(quality_stats, batch_format="pyarrow", zero_copy_batch=True)
        d = d.filter(expr="n_chars >= 100")
        d = d.map_batches(lang_id_batch, batch_format="pyarrow", zero_copy_batch=True)
        d = d.filter(expr="pred_lang == 'en'")
        return d.select_columns(["doc_id", "text"])

    t0 = time.perf_counter()
    ds = _read_pq(files, columns=["conv_id", "turn_idx", "text"])
    ds = ds.map_batches(add_doc_id, batch_format="pyarrow", zero_copy_batch=True)
    ds = exact_dedup(ds, text_col="text", id_col="doc_id",
                     payload_mode="project", payload_transform=curate)
    packed = pack_sequences(ds, target_len=512)
    agg = packed.map_batches(
        lambda t: pa.table({"rows": pa.array([t.num_rows], pa.int64())}),
        batch_format="pyarrow", zero_copy_batch=True,
    ).take_all()
    results.append(
        {
            "op": "training_data_capstone",
            "turns_in": turns_in,
            "rows_out": int(sum(r["rows"] for r in agg)),
            "wall_s": round(time.perf_counter() - t0, 1),
            "cum_spill": spill_stats(),
        }
    )

    # ---- quadratic graph ops at sf0.1 ----------------------------------
    from vaero_ray.pipelines.queries import QUERIES

    for gate in ("part_triangle_counts", "order_basket_containment"):
        t0 = time.perf_counter()
        out = QUERIES[gate](args.sf_dir)
        n = out.count() if hasattr(out, "count") and not isinstance(out, pa.Table) else (
            out.num_rows if isinstance(out, pa.Table) else len(out)
        )
        results.append(
            {
                "op": gate,
                "rows_out": int(n),
                "wall_s": round(time.perf_counter() - t0, 1),
                "cum_spill": spill_stats(),
            }
        )

    print(
        json.dumps(
            {
                "metric": "constrained object-store rehearsal (no OOM = pass)",
                "object_store_gb": args.store_gb,
                "num_cpus": args.cpus,
                "ops": results,
            }
        )
    )
    ray.shutdown()


if __name__ == "__main__":
    main()
