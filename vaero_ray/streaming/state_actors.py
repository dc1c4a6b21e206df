"""Actor-pool state store: open-window partials held in memory across
epochs (north_star: "tumbling/sliding/session windows ... held in
actor-pool state stores with event-time watermarks").

One named actor per hash-partition of the key space. Per epoch:

1. the live-partials Dataset is routed to the actors from INSIDE Ray
   tasks (``route_partials``): each map task splits its partial block by
   ``hash(key) % P``, drops rows for already-closed windows (late), and
   pushes sub-tables to the owning actors — raw actor calls are justified
   here because a cross-epoch shared mutable index is the one thing the
   Dataset API can't express (SURVEY.md §7 stance);
2. the driver advances the watermark from the per-task maxima returned by
   the routing stage;
3. each actor closes windows past the watermark — finalizing, canonically
   sorting and WRITING its partition's output file itself (no data moves
   to the driver; only lineage rows do) — and snapshots its remaining
   state to the checkpoint dir (recovery source for driver restarts).

Determinism: actor state is a set of merged partials; merge is
associative/commutative, and every file write canonically sorts rows —
so outputs are byte-identical regardless of push arrival order (the
actor-vs-parquet backend parity test asserts exactly this).

Actors take ``num_cpus=0`` so the pool never starves the map/shuffle
stages; state ops are metadata-sized (one row per open key x window).
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray

from vaero_ray.stages.keyed import hash_bucket
from vaero_ray.stages.windows import AggSpec, finalize_table, merge_partial_tables


@ray.remote(num_cpus=0)
class PartitionStateActor:
    def __init__(self, partition: int, group_cols: list[str], aggs_spec: list[tuple]):
        self.partition = partition
        self.group_cols = group_cols
        self.aggs = [AggSpec(*a) for a in aggs_spec]
        self.state: pa.Table | None = None
        # idempotency ledger: push tags already merged THIS epoch. A Ray
        # retry of a routing task (worker crash / object loss) re-runs the
        # same deterministic blocks under the same task id, so its pushes
        # carry the same tags and are dropped instead of double-merged.
        self._seen_epoch: int = -1
        self._seen_tags: set = set()

    def push(self, tbl: pa.Table, tag: str = "", epoch: int = -1) -> int:
        if epoch != self._seen_epoch:
            self._seen_epoch = epoch
            self._seen_tags = set()
        if tag:
            if tag in self._seen_tags:
                return self.state.num_rows if self.state is not None else 0
            self._seen_tags.add(tag)
        tables = [t for t in (self.state, tbl) if t is not None and t.num_rows]
        self.state = merge_partial_tables(tables, self.group_cols, self.aggs) if tables else None
        return self.state.num_rows if self.state is not None else 0

    def close_and_write(
        self,
        wm_us: int,
        size_us: int,
        window_col: str,
        out_dir: str,
        epoch: int,
        user_aggs_spec: list[tuple],
        user_group_cols: list[str],
    ) -> dict:
        """Close windows with end <= wm: finalize + write this partition's
        deterministic output file. Returns lineage (empty dict if none)."""
        if self.state is None or not self.state.num_rows:
            return {}
        wend = pc.add(pc.cast(self.state.column(window_col), pa.int64()), size_us)
        closed_mask = pc.less_equal(wend, wm_us)
        closed = self.state.filter(closed_mask)
        self.state = self.state.filter(pc.invert(closed_mask))
        if not closed.num_rows:
            return {}
        final = finalize_table(closed, user_group_cols, [AggSpec(*a) for a in user_aggs_spec])
        idx = pc.sort_indices(final, sort_keys=[(c, "ascending") for c in final.column_names])
        final = final.take(idx)
        pdir = os.path.join(out_dir, f"part-{self.partition}")
        os.makedirs(pdir, exist_ok=True)
        path = os.path.join(pdir, f"epoch-{epoch:08d}.parquet")
        tmp = path + f".tmp{os.getpid()}"
        pq.write_table(final, tmp, row_group_size=1 << 20)
        os.replace(tmp, path)
        digest = hashlib.sha256(open(path, "rb").read()).hexdigest()
        return {"partition": self.partition, "rows": final.num_rows, "files": [path], "sha256": [digest]}

    def snapshot(self, state_dir: str, epoch: int) -> dict:
        """Persist remaining open state (recovery source). Deterministic
        path/content like the sink files; returns lineage so the manifest
        records EXACTLY which files hold this epoch's state."""
        if self.state is None or not self.state.num_rows:
            return {}
        st = self.state
        idx = pc.sort_indices(st, sort_keys=[(c, "ascending") for c in st.column_names])
        st = st.take(idx)
        pdir = os.path.join(state_dir, f"part-{self.partition}")
        os.makedirs(pdir, exist_ok=True)
        path = os.path.join(pdir, f"epoch-{epoch:08d}.parquet")
        tmp = path + f".tmp{os.getpid()}"
        pq.write_table(st, tmp)
        os.replace(tmp, path)
        digest = hashlib.sha256(open(path, "rb").read()).hexdigest()
        return {"partition": self.partition, "rows": st.num_rows, "files": [path], "sha256": [digest]}

    def restore(self, files: list[str] | None) -> int:
        """Reset state from the committed snapshot's EXACT file list (the
        manifest's state lineage — never a directory glob, which could pick
        up stale files from an aborted attempt) or to empty."""
        self.state = None
        if files:
            self.state = pa.concat_tables([pq.read_table(f) for f in sorted(files)])
        return self.state.num_rows if self.state is not None else 0

    def num_rows(self) -> int:
        return self.state.num_rows if self.state is not None else 0


class ActorStateStore:
    """Driver-side handle on the partitioned actor pool."""

    def __init__(self, job_id: str, num_partitions: int, group_cols: list[str], aggs: list[AggSpec]):
        self.num_partitions = num_partitions
        self.group_cols = group_cols
        self.aggs = aggs
        spec = [(a.col, a.fn, a.alias) for a in aggs]
        self.actors = [
            PartitionStateActor.options(
                name=f"vxstate-{job_id}-{p}", get_if_exists=True
            ).remote(p, group_cols, spec)
            for p in range(num_partitions)
        ]

    def restore_all(self, state_partitions: dict | None) -> int:
        """Reset every actor to the committed snapshot's manifest lineage
        (``{partition: {"files": [...]}}``) — exactly those files, nothing
        globbed."""
        by_part: dict[int, list[str]] = {}
        for p, part in (state_partitions or {}).items():
            for f in part["files"]:
                try:
                    b = int(p)
                except ValueError:  # legacy manifest: derive from part-N dir
                    b = int(os.path.basename(os.path.dirname(f)).split("-")[-1])
                by_part.setdefault(b, []).append(f)
        return sum(
            ray.get(
                [a.restore.remote(by_part.get(i)) for i, a in enumerate(self.actors)]
            )
        )

    def route_partials(
        self, partials_ds, key: str, prev_wm_us: int, size_us: int, window_col: str, wm_col: str, epoch: int = -1
    ):
        """Push each partial block's rows to their owning actors from
        inside the map tasks; returns (rows_late, max_ts_us or None).
        Late rows (window already closed at prev watermark) never reach
        an actor. Each push is tagged (task_id, call-seq) so a retried
        routing task's re-pushes are idempotently dropped by the actor."""
        actors = self.actors
        P = self.num_partitions
        seq_state = {"n": 0}  # per-task-process call counter (deterministic across retries)

        def route(tbl: pa.Table) -> pa.Table:
            wend = pc.add(pc.cast(tbl.column(window_col), pa.int64()), size_us)
            late_mask = pc.less_equal(wend, prev_wm_us)
            # sum the forced per-partial event count, NOT the partial-row
            # count: one late partial row can stand for many late events,
            # and the parquet backend reports event counts
            # (job.py late_ds.sum("__pcount")) — the two backends must
            # agree on rows_late for the same input
            n_late = (
                pc.sum(
                    pc.if_else(
                        late_mask,
                        pc.cast(tbl.column("__pcount"), pa.int64()),
                        pa.scalar(0, pa.int64()),
                    )
                ).as_py()
                or 0
            )
            live = tbl.filter(pc.invert(late_mask))
            ts_max = None
            if live.num_rows:
                try:
                    task_id = ray.get_runtime_context().get_task_id() or "driver"
                except Exception:
                    task_id = "driver"
                seq_state["n"] += 1
                tag = f"{task_id}:{seq_state['n']}"
                buckets = np.asarray(hash_bucket(live.column(key).to_pandas(), P))
                refs = []
                for b in np.unique(buckets):
                    sub = live.take(pa.array(np.nonzero(buckets == b)[0]))
                    refs.append(actors[int(b)].push.remote(sub, tag, epoch))
                ray.get(refs)  # barrier: state visible before epoch commit
                mx = pc.max(live.column(wm_col)).as_py()
                ts_max = None if mx is None else int(pa.scalar(mx).cast(pa.int64()).as_py())
            return pa.table(
                {
                    "rows_late": pa.array([n_late], pa.int64()),
                    "ts_max": pa.array([ts_max], pa.int64()),
                }
            )

        stats = partials_ds.map_batches(route, batch_format="pyarrow").take_all()
        rows_late = sum(r["rows_late"] for r in stats)
        maxes = [r["ts_max"] for r in stats if r["ts_max"] is not None]
        return rows_late, (max(maxes) if maxes else None)

    def close_and_write(self, wm_us, size_us, window_col, out_dir, epoch, user_aggs, user_group_cols):
        spec = [(a.col, a.fn, a.alias) for a in user_aggs]
        res = ray.get(
            [
                a.close_and_write.remote(
                    wm_us, size_us, window_col, out_dir, epoch, spec, user_group_cols
                )
                for a in self.actors
            ]
        )
        return [r for r in res if r]

    def snapshot_all(self, state_dir: str, epoch: int) -> tuple[int, list[dict]]:
        """Snapshot every actor; returns (total rows, lineage list) so the
        manifest records the exact snapshot file set."""
        res = [r for r in ray.get([a.snapshot.remote(state_dir, epoch) for a in self.actors]) if r]
        return sum(r["rows"] for r in res), res

    def shutdown(self) -> None:
        for a in self.actors:
            ray.kill(a)
