"""The flagship windowed transform+route+sink job (BASELINE.json metric).

One pipeline composing all three tiers over the input_hint transcript
schema (conv_id, turn_idx, role, text, tool, ts):

  read_parquet (column-complete: every column feeds a stage)
    -> fused Vaero transform chain (mask PII emails, route on role)
       [reference semantics: transform/mask.go, transform/filter_regexp.go]
    -> branch A (user/assistant): n_chars -> tumbling 1h (role) aggregate
       -> Parquet sink
    -> branch B (tool): per-conversation tool-call session stats -> Parquet

Used by bench.py --scaling: the same job runs in fresh processes at
num_cpus=8 and num_cpus=32 over the same synthetic transcript Parquet,
giving the sandbox proxy for the north_rule's N vs 4N cluster-size
scaling criterion.

Scale notes: the mask/filter/assign stages are stateless zero-copy Arrow
map_batches (linear scaling); the two shuffles are pre-collapsed by the
two-phase aggregate (partials per block, so the exchange moves
O(keys x windows) rows, not O(turns)); the sinks write partitioned
Parquet. Nothing materializes on the driver.
"""

from __future__ import annotations

from functools import partial

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from vaero_ray.stages.windows import AggSpec, sessionize, windowed_aggregate
from vaero_ray.transforms import compile_chain

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"


def _n_chars(tbl: pa.Table) -> pa.Table:
    return tbl.append_column("n_chars", pc.cast(pc.utf8_length(tbl.column("text")), pa.int64()))


def flagship_over_transcripts(input_path: str, out_dir: str) -> dict:
    """Run the flagship job; returns {'agg_rows': ..., 'tool_rows': ...}."""
    src = rd.read_parquet(input_path)

    # branch A: mask emails in every turn, keep user/assistant turns,
    # 1h tumbling per-role char/turn counts
    chain_a = compile_chain(
        [
            ("mask", {"path": "text", "regex": EMAIL_RE, "replace_expr": "<email>"}),
            ("filter_regexp", {"path": "role", "regex": "^(user|assistant)$"}),
        ]
    )
    a = src.map_batches(chain_a, batch_format="pyarrow", zero_copy_batch=True)
    a = a.map_batches(_n_chars, batch_format="pyarrow", zero_copy_batch=True)
    agg = windowed_aggregate(
        a,
        keys=["role"],
        aggs=[
            AggSpec(None, "count", "n_turns"),
            AggSpec("n_chars", "sum", "sum_chars"),
            AggSpec("n_chars", "max", "max_chars"),
        ],
        ts_col="ts",
        size_s=3600,
    )
    agg.write_parquet(f"{out_dir}/role_window_agg")

    # branch B: tool turns -> per-conversation session stats (30 min gap)
    chain_b = compile_chain([("filter_regexp", {"path": "role", "regex": "^tool$"})])
    b = src.map_batches(chain_b, batch_format="pyarrow", zero_copy_batch=True)
    b = sessionize(b, key="conv_id", ts_col="ts", gap_s=1800)
    tool_stats = windowed_aggregate(
        b,
        keys=["conv_id", "session_id"],
        aggs=[AggSpec(None, "count", "n_tool_calls"), AggSpec("ts", "max", "last_ts")],
        size_s=None,
    )
    tool_stats.write_parquet(f"{out_dir}/tool_sessions")

    return {"out_dir": out_dir}
