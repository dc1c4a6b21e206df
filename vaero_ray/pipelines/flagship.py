"""The flagship windowed transform+route+sink job (BASELINE.json metric).

One pipeline composing all three tiers over the input_hint transcript
schema (conv_id, turn_idx, role, text, tool, ts):

  branch A (reads only role,text,ts — prune at the read):
    fused Vaero chain: mask PII emails -> parse_regexp email user-id ->
    filter user/assistant turns [reference semantics transform/mask.go,
    transform/parse_regexp.go, transform/filter_regexp.go]
    -> char/token features -> tumbling 1h per-role aggregate -> Parquet
  branch B (reads only conv_id,role,ts — the text column never decodes):
    filter tool turns -> fused per-conversation session stats -> Parquet

Used by bench.py --scaling: the same job runs in fresh processes at
num_cpus=8 and num_cpus=32 over the same synthetic transcript chunks,
the sandbox proxy for the north_rule's N vs 4N cluster-size criterion.

Scale notes: per-branch reads decode only needed columns; transforms are
stateless zero-copy Arrow map_batches (linear scaling); both shuffles
move pre-collapsed partials / projected key-ts rows, never text; branches
run sequentially (two concurrent streaming executors thrash each other's
CPU slots — measured 3x slower at 8 cpus). Nothing materializes on the
driver.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from vaero_ray.io import read_parquet as _read_pq

from vaero_ray.stages.windows import AggSpec, session_aggregate, windowed_aggregate
from vaero_ray.transforms import compile_chain

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
USER_RE = r"user(?P<email_user>\d+)@"


def _features(tbl: pa.Table) -> pa.Table:
    txt = tbl.column("text")
    tbl = tbl.append_column("n_chars", pc.cast(pc.utf8_length(txt), pa.int64()))
    return tbl.append_column(
        "n_tokens", pc.cast(pc.count_substring_regex(txt, r"[A-Za-z]+|\d+|[^\w\s]"), pa.int64())
    )


def flagship_over_transcripts(input_path: str, out_dir: str) -> dict:
    """Run the flagship job; writes role_window_agg/ and tool_sessions/."""
    # branch A: PII-mask + parse + route user/assistant, 1h tumbling
    # per-role turn/char/token stats
    chain_a = compile_chain(
        [
            ("parse_regexp", {"path": "text", "regex": USER_RE}),
            ("mask", {"path": "text", "regex": EMAIL_RE, "replace_expr": "<email>"}),
            ("filter_regexp", {"path": "role", "regex": "^(user|assistant)$"}),
        ]
    )
    a = _read_pq(input_path, columns=["role", "text", "ts"])
    a = a.map_batches(chain_a, batch_format="pyarrow", zero_copy_batch=True)
    a = a.map_batches(_features, batch_format="pyarrow", zero_copy_batch=True)
    agg = windowed_aggregate(
        a,
        keys=["role"],
        aggs=[
            AggSpec(None, "count", "n_turns"),
            AggSpec("n_chars", "sum", "sum_chars"),
            AggSpec("n_tokens", "sum", "sum_tokens"),
            AggSpec("n_chars", "max", "max_chars"),
        ],
        ts_col="ts",
        size_s=3600,
    )
    agg.write_parquet(f"{out_dir}/role_window_agg")

    # branch B: tool turns -> per-conversation tool-call session stats
    # (30 min gap); session assignment + aggregate fused into one shuffle
    chain_b = compile_chain([("filter_regexp", {"path": "role", "regex": "^tool$"})])
    b = _read_pq(input_path, columns=["conv_id", "role", "ts"])
    b = b.map_batches(chain_b, batch_format="pyarrow", zero_copy_batch=True)
    tool_stats = session_aggregate(
        b,
        key="conv_id",
        ts_col="ts",
        gap_s=1800,
        aggs=[AggSpec(None, "count", "n_tool_calls"), AggSpec("ts", "max", "last_ts")],
    )
    tool_stats.write_parquet(f"{out_dir}/tool_sessions")

    return {"out_dir": out_dir}
