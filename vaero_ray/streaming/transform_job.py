"""Streaming tap -> transform -> route -> sink: the reference's whole
execution model (/root/reference/execute/execute.go:35-47) as epochs with
the exactly-once commit protocol.

A Vaero task graph (same JSON IR the DSL emits) is compiled once; each
epoch claims the next input files and runs EVERY branch's fused transform
chain, bucketing output rows by the reference's sink-prefix rule
(strftime of the event's own timestamp, execute/sinkNode.go:80-101) and
writing one deterministic file per (branch, prefix, epoch). Where the
reference loses buffered events on crash (at-most-once, SURVEY.md §4.1),
a crash here reruns the epoch byte-identically and the manifest is the
commit point.

Batch-vs-time sink flushing (batch_max_bytes / batch_max_time,
sinkNode.go:105-131) degenerates naturally: an epoch IS the flush unit —
max_files_per_epoch bounds bytes, the poll cadence bounds time.
"""

from __future__ import annotations

import glob
import os
import time
from dataclasses import dataclass, field

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from vaero_ray.io import read_parquet as _read_pq

from vaero_ray.planner import Plan, Planner
from vaero_ray.sinks.parquet_sink import PREFIX_COL, derive_prefix
from vaero_ray.streaming.checkpoint import CheckpointStore, EpochManifest
from vaero_ray.streaming.sink import write_canonical_file


@dataclass
class StreamingTransformJob:
    input_dir: str
    out_dir: str
    ckpt_dir: str
    graph: list  # Vaero task-graph IR (the DSL's Vaero.start() output)
    max_files_per_epoch: int = 1
    extra_read_kw: dict = field(default_factory=dict)

    def __post_init__(self):
        self.store = CheckpointStore(self.ckpt_dir)
        self.plan: Plan = Planner(self.graph).plan
        self._secret_resolver = None
        if self.plan.source is not None and self.plan.source.secret:
            from vaero_ray.secrets import SecretResolver

            self._secret_resolver = SecretResolver(self.plan.source.secret)
            self._secret_resolver.resolve_into(self.plan.source.args)

    def pending_files(self) -> list[str]:
        consumed = self.store.consumed_files()
        files = sorted(glob.glob(os.path.join(self.input_dir, "*.parquet")))
        return [f for f in files if f not in consumed]

    def run_epoch(self) -> EpochManifest | None:
        t0 = time.perf_counter()
        if self._secret_resolver is not None:
            # per-epoch staleness re-check (reference: execute.go:84-96)
            self._secret_resolver.maybe_refresh(self.plan.source.args)
        last = self.store.last()
        epoch = 0 if last is None else last.epoch + 1
        files = self.pending_files()[: self.max_files_per_epoch]
        if not files:
            return None
        rows_in = sum(pq.ParquetFile(f).metadata.num_rows for f in files)
        # read_parquet itself takes io.DATASET_BUILD_LOCK (taking it here
        # too would deadlock — threading.Lock is not reentrant).
        # materialize ONCE: every branch below consumes src, and an
        # un-materialized plan would re-read + re-decode the epoch's
        # files once per branch; one epoch is bounded by
        # max_files_per_epoch and spills if large.
        src = _read_pq(files, **self.extra_read_kw).materialize()

        partitions: dict = {}
        rows_out = 0
        for i, branch in enumerate(self.plan.branches):
            sink = branch.sink
            bkey = f"b{i}_{sink.op if sink else 'none'}"
            fused = None if branch.has_rel else branch.compile()
            ts_key = sink.args.get("timestamp_key", "timestamp") if sink else "timestamp"
            fmt = (sink.args.get("filename_prefix", "%Y/%m/%d") if sink else "%Y/%m/%d").replace(
                "/", "-"
            )
            bdir = os.path.join(self.out_dir, bkey)

            def stage(tbl: pa.Table, fused=fused, ts_key=ts_key, fmt=fmt) -> pa.Table:
                return derive_prefix(fused(tbl), ts_key, fmt)

            def write_prefix(df: pd.DataFrame, bdir=bdir) -> pd.DataFrame:
                prefix = df[PREFIX_COL].iloc[0]
                df = df.drop(columns=[PREFIX_COL])
                pdir_safe = str(prefix).replace("/", "-")
                # one file per (branch, prefix, epoch), written DIRECTLY at
                # its prefix-derived path: concurrent prefix groups run in
                # separate Ray workers, so no shared intermediate is allowed
                final = os.path.join(bdir, pdir_safe, f"epoch-{epoch:08d}.parquet")
                _, sha, rows = write_canonical_file(df, final)
                return pd.DataFrame(
                    {"partition": [pdir_safe], "rows": [rows], "path": [final], "sha256": [sha]}
                )

            if fused is None:
                # relational branch (window/join/dedup steps): the epoch's
                # materialized src IS the bounded batch; apply the step plan
                # then derive the sink prefix in its own zero-copy pass.
                # Window semantics here are PER-EPOCH (each poll's batch
                # windows independently — the reference's per-capsule batch
                # model); cross-epoch event-time windows with watermarks
                # and open-window state carry are StreamingWindowedJob
                # (streaming/job.py), not this path.
                from vaero_ray.runner import apply_steps

                def prefix_only(tbl: pa.Table, ts_key=ts_key, fmt=fmt) -> pa.Table:
                    return derive_prefix(tbl, ts_key, fmt)

                staged = apply_steps(src, branch).map_batches(
                    prefix_only, batch_format="pyarrow", zero_copy_batch=True
                )
            else:
                staged = src.map_batches(stage, batch_format="pyarrow", zero_copy_batch=True)
            lineage = (
                staged
                .groupby(PREFIX_COL)
                .map_groups(write_prefix, batch_format="pandas")
                .take_all()
            )
            for r in lineage:
                partitions[f"{bkey}/{r['partition']}"] = {
                    "rows": r["rows"],
                    "files": [r["path"]],
                    "sha256": [r["sha256"]],
                }
                rows_out += r["rows"]

        manifest = EpochManifest(
            epoch=epoch,
            input_files=files,
            watermark_us=0,
            rows_in=rows_in,
            rows_late=0,
            rows_out=rows_out,
            partitions=partitions,
            state_rows=0,
            state_path=None,
            extra={"op": "transform"},
        )
        self.store.commit(manifest)
        self.store.append_metrics(
            {
                "epoch": epoch,
                "op": "transform",
                "rows_in": rows_in,
                "rows_out": rows_out,
                "n_partitions_out": len(partitions),
                "wall_s": round(time.perf_counter() - t0, 3),
            }
        )
        return manifest

    def run(self, max_epochs: int | None = None) -> list[EpochManifest]:
        out: list[EpochManifest] = []
        while max_epochs is None or len(out) < max_epochs:
            m = self.run_epoch()
            if m is None:
                break
            out.append(m)
        return out

    def committed_output(self, branch_key: str | None = None) -> rd.Dataset:
        files = []
        for e in self.store.committed_epochs():
            for key, part in self.store.load(e).partitions.items():
                if branch_key is None or key.startswith(branch_key + "/"):
                    files.extend(part["files"])
        if not files:
            raise ValueError("no committed output yet")
        return _read_pq(files)
