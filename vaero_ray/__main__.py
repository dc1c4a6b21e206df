"""``python -m vaero_ray`` — the reference CLI surface
(/root/reference/cmd/add.go, cmd/util.go:180-359: ``vaero
add/start/stop/delete/list/detail``) over :class:`vaero_ray.registry.JobRegistry`.

Verbs (registry dir = ``--registry`` or ``$VAERO_RAY_HOME`` or
``~/.vaero_ray``):

- ``add -f SPEC.py``  : exec the Python DSL spec (it builds the global
  ``Vaero`` graph exactly as the reference's ``vaero add -f`` evaluates
  the spec through the vaero package), store the task graph as a staged
  job, print the job id.
- ``start``           : launch every staged job (reference adminRoutine)
  and poll their epoch loops in THIS process for ``--duration`` seconds
  (0 = until all jobs stop or Ctrl-C). Stop/delete work from any other
  process sharing the registry dir — the alive flag lives on disk.
- ``stop ID`` / ``delete ID`` : flag/remove a job.
- ``list`` / ``detail ID``    : table dump / full JSON entry.

The reference daemonizes via SQLite + a long-lived serve process; here
``start`` is foreground (a deployment wraps it in its own supervisor),
which keeps the sandbox honest — no orphan processes.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def _registry(args):
    from vaero_ray.registry import JobRegistry

    root = args.registry or os.environ.get("VAERO_RAY_HOME") or os.path.expanduser("~/.vaero_ray")
    return JobRegistry(root)


def _eval_spec(path: str) -> list:
    """Evaluate a Python DSL spec file -> task graph array IR (the
    reference pipes the spec through the vaero package and captures the
    printed JSON; we exec it in-process and read the global graph)."""
    from vaero_ray.dsl import Vaero

    Vaero.reset()
    with open(path) as fh:
        code = fh.read()
    glb = {"__name__": "__vaero_spec__", "__file__": os.path.abspath(path)}
    exec(compile(code, path, "exec"), glb)
    graph = Vaero.start()
    if not graph:
        raise SystemExit(f"{path}: spec built no pipeline (did it call .source()...?)")
    return graph


def cmd_add(args) -> int:
    reg = _registry(args)
    job_id = reg.add(_eval_spec(args.file), spec=os.path.abspath(args.file))
    print(job_id)
    return 0


def cmd_start(args) -> int:
    reg = _registry(args)
    started = reg.start(max_epochs_per_poll=args.max_epochs_per_poll)
    print(f"started: {started}")
    if not started:
        return 0
    deadline = time.monotonic() + args.duration if args.duration > 0 else None
    try:
        while True:
            alive = [e["id"] for e in reg.list() if e["status"] == "running"]
            if not alive:
                break
            if deadline is not None and time.monotonic() >= deadline:
                break
            time.sleep(0.2)
    except KeyboardInterrupt:
        pass
    if args.stop_on_exit:
        for job_id in started:
            reg.stop(job_id)
        for job_id in started:
            reg.wait(job_id, timeout_s=30)
    return 0


def cmd_stop(args) -> int:
    ok = _registry(args).stop(args.id)
    print("stopped" if ok else f"job {args.id} not found")
    return 0 if ok else 1


def cmd_delete(args) -> int:
    ok = _registry(args).delete(args.id)
    print("deleted" if ok else f"job {args.id} not found")
    return 0 if ok else 1


def cmd_list(args) -> int:
    rows = _registry(args).list()
    print(f"{'ID':>4}  {'STATUS':<9} {'INTERVAL':>8}  SPEC")
    for e in rows:
        print(f"{e['id']:>4}  {e['status']:<9} {e['interval']:>8}  {e.get('spec', '')}")
    return 0


def cmd_detail(args) -> int:
    entry = _registry(args).detail(args.id)
    if entry is None:
        print(f"job {args.id} not found")
        return 1
    print(json.dumps(entry, indent=1, sort_keys=True))
    return 0


def cmd_compact(args) -> int:
    """Compact a streaming job's committed output (sidecar manifest,
    epoch manifests untouched); optionally GC the replaced files."""
    import ray

    from vaero_ray.streaming import CheckpointStore
    from vaero_ray.streaming.compact import compact_committed_output, gc_replaced

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    store = CheckpointStore(args.ckpt_dir)
    side = compact_committed_output(store, args.out_dir, min_files=args.min_files)
    n_parts = len(side["partitions"])
    removed = gc_replaced(args.out_dir) if args.gc else 0
    print(json.dumps({"through_epoch": side["through_epoch"],
                      "partitions_compacted": n_parts, "files_gc": removed}))
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="python -m vaero_ray", description=__doc__.split("\n")[0])
    p.add_argument("--registry", default=None, help="registry dir (default $VAERO_RAY_HOME or ~/.vaero_ray)")
    sub = p.add_subparsers(dest="verb", required=True)

    sp = sub.add_parser("add", help="stage a pipeline spec")
    sp.add_argument("-f", "--file", required=True, help="Python DSL spec file")
    sp.set_defaults(fn=cmd_add)

    sp = sub.add_parser("start", help="launch every staged job and poll")
    sp.add_argument("--duration", type=float, default=0.0, help="seconds to poll (0 = until jobs stop)")
    sp.add_argument("--max-epochs-per-poll", type=int, default=None)
    sp.add_argument("--stop-on-exit", action="store_true", help="flag jobs stopped when the poll window ends")
    sp.set_defaults(fn=cmd_start)

    for verb, fn in (("stop", cmd_stop), ("delete", cmd_delete), ("detail", cmd_detail)):
        sp = sub.add_parser(verb)
        sp.add_argument("id", type=int)
        sp.set_defaults(fn=fn)

    sp = sub.add_parser("list")
    sp.set_defaults(fn=cmd_list)

    sp = sub.add_parser("compact", help="compact a streaming job's committed output")
    sp.add_argument("out_dir")
    sp.add_argument("ckpt_dir")
    sp.add_argument("--min-files", type=int, default=2)
    sp.add_argument("--gc", action="store_true", help="delete replaced files after commit")
    sp.set_defaults(fn=cmd_compact)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
