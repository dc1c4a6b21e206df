"""Small-file compaction for the exactly-once sink's committed output.

A long-running streaming job accumulates one file per (partition, epoch)
— thousands of small parts after days of micro-batches. Compaction
merges each partition's committed epoch files into ONE canonical file
WITHOUT touching the exactly-once machinery:

- epoch manifests are never modified (they remain the source of truth
  for resume/replay); compaction writes its own ``compaction.json``
  sidecar manifest (fsync + atomic rename — same commit discipline);
- the compacted file is written with the sink's canonical writer
  (all-column sort, no wall-clock metadata), so re-running compaction
  over the same epochs is byte-identical;
- the reader (:func:`compacted_output_files`) serves the compacted file
  for every partition covered ``through_epoch`` and the ORIGINAL epoch
  files for anything later — readers see exactly the committed rows at
  every instant, whether or not compaction has run, half-run, or
  crashed (a missing/partial sidecar simply falls back to the epoch
  files);
- replaced originals are deleted only by an explicit :func:`gc_replaced`
  call AFTER the sidecar is committed (crash between commit and GC
  leaves stale-but-ignored files, the same safety posture as the epoch
  writer's tmp files).

Each partition compacts inside ONE Ray task (per-partition file IO —
the Dataset API has nothing to add over a task here); the driver only
moves the tiny lineage.
"""

from __future__ import annotations

import json
import os

import pandas as pd
import pyarrow.parquet as pq

from vaero_ray.streaming.checkpoint import CheckpointStore
from vaero_ray.streaming.sink import write_canonical_file

SIDECAR = "compaction.json"


def _sidecar_path(out_dir: str) -> str:
    return os.path.join(out_dir, SIDECAR)


def _load_sidecar(out_dir: str) -> dict | None:
    p = _sidecar_path(out_dir)
    if not os.path.exists(p):
        return None
    try:
        with open(p) as fh:
            return json.load(fh)
    except (OSError, json.JSONDecodeError):
        return None  # partial/corrupt sidecar: fall back to epoch files


def _partition_files(store: CheckpointStore, through_epoch: int) -> dict[str, list[str]]:
    """partition id -> committed epoch files with epoch <= through_epoch."""
    out: dict[str, list[str]] = {}
    for e in store.committed_epochs():
        if e > through_epoch:
            continue
        for part, meta in store.load(e).partitions.items():
            out.setdefault(str(part), []).extend(meta["files"])
    return out


def compact_committed_output(store: CheckpointStore, out_dir: str,
                             min_files: int = 2) -> dict:
    """Merge each partition's committed epoch files (including any prior
    compacted file) into one canonical file, then commit the sidecar.
    Partitions with fewer than ``min_files`` inputs are carried through
    unchanged. Returns the committed sidecar dict."""
    import ray

    epochs = store.committed_epochs()
    if not epochs:
        return {"through_epoch": -1, "partitions": {}}
    through = max(epochs)
    parts = _partition_files(store, through)
    prior = _load_sidecar(out_dir)
    if prior:
        for b, meta in prior["partitions"].items():
            # the prior compacted file REPLACES its inputs as the read
            # view of epochs <= its through_epoch
            replaced = set(meta["replaces"])
            parts[b] = [f for f in parts.get(b, []) if f not in replaced]
            parts[b].insert(0, meta["file"])

    @ray.remote
    def _compact_one(bucket: str, files: list[str], out_dir: str) -> tuple[str, dict]:
        df = pd.concat(
            [pq.read_table(f).to_pandas() for f in files], ignore_index=True
        )
        path = os.path.join(out_dir, f"part-{bucket}", "compacted.parquet")
        # unique tmp path via write_canonical_file's atomic rename
        p, digest, rows = write_canonical_file(df, path)
        return bucket, {"file": p, "sha256": digest, "rows": rows,
                        "replaces": sorted(files)}

    todo = {b: fs for b, fs in parts.items() if len(fs) >= min_files}
    futs = [
        _compact_one.remote(b, fs, out_dir) for b, fs in todo.items()
    ]
    merged: dict[str, dict] = {}
    for b, meta in (ray.get(f) for f in futs):
        merged[b] = meta
    if prior:
        # partitions compacted before but skipped now keep their entry
        for b, meta in prior["partitions"].items():
            merged.setdefault(b, meta)
    sidecar = {"through_epoch": through, "partitions": merged}
    tmp = _sidecar_path(out_dir) + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(sidecar, fh, indent=1, sort_keys=True)
        fh.flush()
        os.fsync(fh.fileno())
    os.replace(tmp, _sidecar_path(out_dir))
    return sidecar


def compacted_output_files(store: CheckpointStore, out_dir: str) -> list[str]:
    """The exactly-once read view WITH compaction: per partition, the
    compacted file stands in for its replaced epoch files; everything
    not covered (later epochs, never-compacted partitions, absent or
    unreadable sidecar) is served from the original committed files."""
    side = _load_sidecar(out_dir)
    files = store.committed_output_files()
    if not side:
        return files
    replaced = set()
    add = []
    for meta in side["partitions"].values():
        replaced.update(meta["replaces"])
        add.append(meta["file"])
    return add + [f for f in files if f not in replaced]


def gc_replaced(out_dir: str) -> int:
    """Delete files replaced by a COMMITTED sidecar. Safe to call any
    number of times; returns how many files were removed."""
    side = _load_sidecar(out_dir)
    if not side:
        return 0
    n = 0
    keep = {meta["file"] for meta in side["partitions"].values()}
    for meta in side["partitions"].values():
        for f in meta["replaces"]:
            if f in keep:
                continue  # a prior compacted file may be an input later
            if os.path.exists(f):
                os.remove(f)
                n += 1
    return n
