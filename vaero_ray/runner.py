"""Batch runner: logical Plan -> Ray Data execution.

Execution model (vs the reference's three goroutines per job,
/root/reference/execute/execute.go:35-47): the source becomes a Ray
Dataset; every branch becomes ONE fused zero-copy ``map_batches`` stage
(the whole transform chain in a single Python call per Arrow block)
terminated by its sink. Fan-out runs each branch as its own lazy pipeline
over the same source Dataset — blocks are shared by reference in the
object store instead of the reference's per-branch EventList copy
(/root/reference/execute/transformNode.go:38-57).

Scale note: stateless recompute of a shared transform prefix is
deliberately preferred over mid-pipeline materialization — at 100 TB the
extra CPU beats pinning the whole intermediate in the object store. The
streaming runner (vaero_ray/streaming) processes each epoch's batch once
through all branches, single-pass, exactly like the reference's per-capsule
interpreter.
"""

from __future__ import annotations

import os
from typing import Any

import pyarrow as pa
import ray.data as rd

from vaero_ray.io import read_parquet as _read_pq

from vaero_ray.planner import Plan, Planner, SinkSpec
from vaero_ray.sinks.parquet_sink import write_partitioned
from vaero_ray.sources.fixtures import make_log_events
from vaero_ray.sources.transcripts import make_transcripts

# sinks that the reference implements as stdout-equivalent stubs
# (sink_datadog.go:23-30, sink_elastic.go:23-30, sink_splunk.go:23-30)
_COLLECT_SINKS = {"stdout", "datadog", "elastic", "splunk"}


def resolve_source(spec, source_data=None) -> rd.Dataset:
    """Source -> Dataset. ``source_data`` (Dataset/Table/path) overrides.

    Built-in source ops:
      parquet      args[path] (file/dir/list) -> read_parquet, with
                   args[columns] pruning when given
      text         raw log lines -> one `message` event per line
                   (reference s3 newline split, source_s3.go:74)
      jsonl        JSON-lines -> columns via the NDJSON breaker
      csv          header CSV -> typed columns (Arrow CSV reader)
      random       reference demo feed (source_random.go:16-33) -> fixture
      transcripts  synthetic transcript stream (FIXTURES.md F1)
    The `s3` op honors args[format] in {parquet (default), text, jsonl}.
    Pull-cadence args (interval etc.) only matter to the streaming shell.
    """
    if source_data is not None:
        if isinstance(source_data, rd.Dataset):
            return source_data
        if isinstance(source_data, pa.Table):
            return rd.from_arrow(source_data)
        return _read_pq(source_data)
    if spec is None:
        raise ValueError("plan has no source and no source_data given")
    if spec.op in ("parquet", "s3", "text", "jsonl", "csv"):
        from vaero_ray.sinks.parquet_sink import s3_uri_and_fs

        path, fs = s3_uri_and_fs(spec.args)
        if not path:
            raise ValueError(f"source {spec.op!r}: no path/bucket configured")
        kw = {"filesystem": fs} if fs is not None else {}
        fmt = spec.op if spec.op in ("text", "jsonl", "csv") else spec.args.get("format", "parquet")
        if fmt == "text":
            from vaero_ray.sources.textlines import read_text_events

            return read_text_events(path, **kw)
        if fmt == "jsonl":
            from vaero_ray.sources.textlines import read_jsonl_events

            return read_jsonl_events(path, **kw)
        if fmt == "csv":
            ds = rd.read_csv(path, **kw)
            cols = spec.args.get("columns")
            return ds.select_columns(cols) if cols else ds
        cols = spec.args.get("columns")
        return _read_pq(path, columns=cols, **kw)
    if spec.op == "random":
        return rd.from_arrow(make_log_events(n=spec.args.get("n", 64), seed=spec.args.get("seed", 7)))
    if spec.op == "transcripts":
        return rd.from_arrow(
            make_transcripts(
                n_convs=spec.args.get("n_convs", 50),
                mean_turns=spec.args.get("mean_turns", 20),
                seed=spec.args.get("seed", 42),
            )
        )
    raise ValueError(f"unsupported batch source: {spec.op!r}")


def apply_steps(src: rd.Dataset, branch, out_dir: str | None = None) -> rd.Dataset:
    """Execute a branch's ordered steps over ``src``: each ``("tn", ...)``
    segment is one fused zero-copy ``map_batches``; each :class:`RelStep`
    calls the corresponding stage function (windows/joins/dedup), which
    owns its own shuffle/broadcast strategy."""
    from vaero_ray.planner import RelStep
    from vaero_ray.transforms import compile_chain

    ds = src
    for step in branch.steps:
        if isinstance(step, RelStep):
            ds = _apply_rel(ds, step)
        else:
            fn = compile_chain(step[1])
            ds = ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
    return ds


def _apply_rel(ds: rd.Dataset, step) -> rd.Dataset:
    if step.op == "window":
        from vaero_ray.stages.windows import AggSpec, windowed_aggregate

        a = step.args
        aggs = [AggSpec(c, f, alias) for c, f, alias in a["aggs"]]
        return windowed_aggregate(
            ds,
            list(a["keys"]),
            aggs,
            ts_col=a.get("ts_col", "ts"),
            size_s=a.get("size_s", 60),
            window_col=a.get("window_col", "window_start"),
        )
    if step.op == "join":
        from vaero_ray.stages.joins import auto_join

        rplan = step.right
        if rplan is None:
            raise ValueError("join step has no right-side plan")
        rds = apply_steps(resolve_source(rplan.source), rplan.branches[0])
        a = step.args
        return auto_join(
            ds, rds, list(a["on"]), join_type=a.get("how", "inner"), suffix=a.get("suffix", "_r")
        )
    if step.op == "filter":
        return ds.filter(expr=step.args["expr"])
    if step.op == "limit":
        return ds.limit(int(step.args["n"]))
    if step.op == "dedup":
        from vaero_ray.stages.dedup import exact_dedup

        a = step.args
        return exact_dedup(
            ds,
            text_col=a.get("path", "text"),
            id_col=a.get("id_path", "doc_id"),
            payload_mode=a.get("mode", "auto"),
        )
    raise ValueError(f"unsupported rel op: {step.op!r}")


def run_batch(
    plan_or_graph: Plan | list,
    source_data: Any = None,
    out_dir: str | None = None,
    collect: bool = True,
) -> dict[str, Any]:
    """Execute every branch; returns {branch_key: result}.

    Collect-style sinks (stdout + the reference's stub sinks) return a
    pyarrow.Table; parquet/s3 sinks write prefix-partitioned Parquet under
    ``out_dir/branch_key`` and return the path. Sinkless branches return
    the lazy Dataset.
    """
    plan = plan_or_graph if isinstance(plan_or_graph, Plan) else Planner(plan_or_graph).plan
    src = resolve_source(plan.source, source_data)

    results: dict[str, Any] = {}
    for i, branch in enumerate(plan.branches):
        ds = apply_steps(src, branch)
        sink = branch.sink
        key = f"b{i}:{sink.op}" if sink else f"b{i}:none"
        if sink is None:
            results[key] = ds
        elif sink.op in _COLLECT_SINKS:
            tbl = _collect(ds)
            if sink.op == "stdout" and not collect:
                print(tbl.to_pandas().to_string())
            results[key] = tbl
        elif sink.op in ("parquet", "s3", "file"):
            from vaero_ray.sinks.parquet_sink import s3_uri_and_fs

            s3_path, fs = s3_uri_and_fs(sink.args)
            if fs is not None:
                path = s3_path
            else:
                base = out_dir or "/tmp/vaero_ray_out"
                path = os.path.join(base, key.replace(":", "_"))
            write_partitioned(
                ds,
                path,
                timestamp_key=sink.args.get("timestamp_key", "timestamp"),
                filename_prefix=sink.args.get("filename_prefix", "%Y/%m/%d"),
                batch_max_bytes=sink.args.get("batch_max_bytes"),
                filesystem=fs,
            )
            results[key] = path
        else:
            raise ValueError(f"unsupported sink: {sink.op!r}")
    return results


def _collect(ds: rd.Dataset) -> pa.Table:
    tables = [ref for ref in ds.to_arrow_refs()]
    import ray

    tables = ray.get(tables)
    if not tables:
        return pa.table({})
    return pa.concat_tables(tables, promote_options="permissive")
