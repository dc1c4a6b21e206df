"""Corpus-scale rehearsal of the training-data capstone (VERDICT r3 #8).

Runs the full dedup -> quality -> language -> sequence-pack composition
(the `training_data_pipeline` gate shape, with project-mode exact dedup
forced — the 100-TB payload shape) over the cached 32M-turn transcript
corpus (~2.5 GB parquet / ~9 GB of text), i.e. ~1000x the sf0.1 gate
input, and publishes the evidence the sf-scale gates can't: wall time,
rows in/out per stage, and per-operator exchanged bytes from
``ds.stats()``.

Differences from the gate (documented, deliberate):
- input is the transcript corpus, one "document" per turn;
  ``doc_id = int(conv_id[5:]) * 2**16 + turn_idx`` (unique, total order
  == corpus order) replaces the documents table's doc_id.
- ``payload_mode="project"`` is forced (the corpus is a derived dataset
  — hash ids are added in-flight — so metadata auto-sizing can't see the
  input files).

Usage: python tools/corpus_rehearsal.py [--input DIR] [--cpus N]
Prints one JSON line; full ds.stats() text goes to /tmp/corpus_rehearsal_stats.txt.
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


def add_doc_id(t: pa.Table) -> pa.Table:
    """Derive a unique, corpus-ordered int64 doc_id from (conv_id, turn_idx)."""
    conv = pc.cast(pc.utf8_slice_codeunits(t.column("conv_id"), 5, 99), pa.int64())
    doc_id = pc.add(pc.multiply(conv, 1 << 16), pc.cast(t.column("turn_idx"), pa.int64()))
    return pa.table({"doc_id": doc_id, "text": t.column("text")})


def stage_table(stats: str) -> list[dict]:
    """Distill per-operator rows/bytes out of a Ray Data stats dump."""
    out = []
    for m in re.finditer(
        r"Operator (\d+) (\S+?):.*?\n(.*?)(?=\nOperator \d+ |\Z)", stats, re.S
    ):
        body = m.group(3)
        rows = re.search(r"Output num rows per block:[^\n]*?([\d,]+) total", body)
        size = re.search(r"Output size bytes per block:[^\n]*?([\d,]+) total", body)
        out.append(
            {
                "operator": m.group(2)[:90],
                "rows_out": int(rows.group(1).replace(",", "")) if rows else None,
                "bytes_out": int(size.group(1).replace(",", "")) if size else None,
            }
        )
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", default="/tmp/vaero_ray_bench/transcripts_32m")
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    ap.add_argument("--join-parts", type=int, default=None,
                    help="override the dedup semi-join partition count (default: derived)")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=args.cpus,
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from vaero_ray.io import read_parquet as _read_pq
    from vaero_ray.stages.dedup import exact_dedup
    from vaero_ray.stages.pack import pack_sequences
    from vaero_ray.stages.textstats import lang_id_batch, quality_stats

    files = sorted(
        os.path.join(args.input, f) for f in os.listdir(args.input) if f.endswith(".parquet")
    )
    turns_in = sum(pq.ParquetFile(f).metadata.num_rows for f in files)
    in_bytes = sum(os.path.getsize(f) for f in files)

    # warm the worker pool outside the timed window (proc spawn ~3-7 s)
    _read_pq(files[:8], columns=["turn_idx"]).count()

    def curate(d):
        """Text-pure quality + language stages — commute with dedup, so
        exact_dedup runs them on the payload side BEFORE the semi-join:
        full read parallelism (256 blocks, not join-partition count) and
        filtered rows never enter the exchange."""
        d = d.map_batches(quality_stats, batch_format="pyarrow", zero_copy_batch=True)
        d = d.filter(expr="n_chars >= 100")
        d = d.map_batches(lang_id_batch, batch_format="pyarrow", zero_copy_batch=True)
        d = d.filter(expr="pred_lang == 'en'")
        return d.select_columns(["doc_id", "text"])

    t0 = time.perf_counter()
    ds = _read_pq(files, columns=["conv_id", "turn_idx", "text"])
    ds = ds.map_batches(add_doc_id, batch_format="pyarrow", zero_copy_batch=True)
    ds = exact_dedup(
        ds, text_col="text", id_col="doc_id", payload_mode="project",
        payload_transform=curate, join_num_partitions=args.join_parts,
    )
    packed = pack_sequences(ds, target_len=512)

    # consume with a tiny aggregate — never materialize the table driver-side
    agg = packed.map_batches(
        lambda t: pa.table(
            {
                "rows": pa.array([t.num_rows], pa.int64()),
                "tokens": pa.array(
                    [pc.sum(t.column("n_tokens")).as_py() or 0], pa.int64()
                ),
                "last_seq": pa.array(
                    [pc.max(t.column("last_seq")).as_py() or 0], pa.int64()
                ),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).take_all()
    wall = time.perf_counter() - t0

    rows_out = sum(r["rows"] for r in agg)
    tokens = sum(r["tokens"] for r in agg)
    n_seqs = max(r["last_seq"] for r in agg) + 1
    stats = packed.stats()
    with open("/tmp/corpus_rehearsal_stats.txt", "w") as f:
        f.write(stats)

    print(
        json.dumps(
            {
                "metric": "capstone training_data_pipeline over 32M-turn corpus",
                "input": args.input,
                "num_cpus": args.cpus,
                "turns_in": turns_in,
                "input_parquet_bytes": in_bytes,
                "rows_out": rows_out,
                "tokens_packed": tokens,
                "sequences": int(n_seqs),
                "wall_s": round(wall, 1),
                "turns_per_sec": round(turns_in / wall, 1),
                "stages": stage_table(stats),
            }
        )
    )
    ray.shutdown()


if __name__ == "__main__":
    main()
