"""Stateful turn-sequence join: stitch user/assistant/tool turns per
conversation (mandated extension, SURVEY.md §2b; the reference has no
joins at all — SURVEY.md §2a).

Semantics (deterministic under stable (conv_id, turn_idx) order, the
BASELINE.json invariant):

- ``assign_exchanges``: every turn gets ``exchange_idx`` = number of user
  turns seen so far in the conversation (turn-ordered, 1-based; equals the
  SQL window ``SUM(role='user') OVER (PARTITION BY conv_id ORDER BY
  turn_idx)``). An exchange is one user turn plus everything until the
  next user turn (assistant reply + tool calls).
- ``stitch_conversations``: one row per conversation — turn counts per
  role, the turn-ordered concatenated transcript, first/last event time.
- ``stitch_exchanges``: one row per (conversation, exchange) — user /
  assistant texts joined, tool-call count, start/end event time.

All are ONE bucketed shuffle (stages/keyed.py): hash(conv_id) buckets,
one vectorized pandas call per bucket (groupby(conv_id).cumsum / .agg
across every conversation in the bucket at once) instead of one Python
call per conversation. Partitioning assumption: a bucket's conversations
fit one task's heap (num_buckets sized to input bytes).
"""

from __future__ import annotations

import pandas as pd
import ray.data as rd

from vaero_ray.stages.keyed import bucketed_map_groups


def assign_exchanges(
    ds: rd.Dataset,
    key: str = "conv_id",
    order: str = "turn_idx",
    role: str = "role",
    num_buckets: int | None = None,
) -> rd.Dataset:
    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key, order], kind="mergesort")
        df["exchange_idx"] = (
            df[role].eq("user").astype("int64").groupby(df[key].to_numpy(), sort=False).cumsum()
        )
        return df

    return bucketed_map_groups(ds, key, per_bucket, num_buckets)


def stitch_conversations(
    ds: rd.Dataset,
    key: str = "conv_id",
    order: str = "turn_idx",
    sep: str = "\n",
    num_buckets: int | None = None,
) -> rd.Dataset:
    """One row per conversation:
    conv_id, n_turns, n_user, n_assistant, n_tool, transcript (turn-ordered
    ``role: text`` lines), first_ts, last_ts (event-time min/max)."""

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key, order], kind="mergesort")
        keys = df[key]
        line = df["role"].str.cat(df["text"], sep=": ")
        g = df.groupby(key, sort=False)
        out = pd.DataFrame(
            {
                "n_turns": g.size().astype("int64"),
                "n_user": df["role"].eq("user").groupby(keys, sort=False).sum().astype("int64"),
                "n_assistant": df["role"].eq("assistant").groupby(keys, sort=False).sum().astype("int64"),
                "n_tool": df["role"].eq("tool").groupby(keys, sort=False).sum().astype("int64"),
                "transcript": line.groupby(keys, sort=False).agg(sep.join),
                "first_ts": g["ts"].min().astype("datetime64[us]"),
                "last_ts": g["ts"].max().astype("datetime64[us]"),
            }
        )
        out.index.name = key
        return out.reset_index()

    return bucketed_map_groups(ds, key, per_bucket, num_buckets)


def stitch_exchanges(
    ds: rd.Dataset, key: str = "conv_id", num_buckets: int | None = None
) -> rd.Dataset:
    """One row per (conversation, exchange): exchange_idx, texts of the
    user / assistant side, number of tool calls. Exchange assignment and
    stitching share the conv_id bucketing, so both run in ONE shuffle —
    used by the flagship pipeline."""

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key, "turn_idx"], kind="mergesort")
        df["exchange_idx"] = (
            df["role"].eq("user").astype("int64").groupby(df[key].to_numpy(), sort=False).cumsum()
        )
        gcols = [key, "exchange_idx"]
        g = df.groupby(gcols, sort=False)
        base = pd.DataFrame(
            {
                "n_tool_calls": df["role"].eq("tool").groupby([df[key], df["exchange_idx"]], sort=False)
                .sum().astype("int64"),
                "start_ts": g["ts"].min().astype("datetime64[us]"),
                "end_ts": g["ts"].max().astype("datetime64[us]"),
            }
        )
        for role_name, col in (("user", "user_text"), ("assistant", "assistant_text")):
            sub = df[df["role"] == role_name]
            joined = sub.groupby([sub[key], sub["exchange_idx"]], sort=False)["text"].agg("\n".join)
            base[col] = joined.reindex(base.index, fill_value="")
        base = base.reset_index()
        return base[[key, "exchange_idx", "user_text", "assistant_text", "n_tool_calls", "start_ts", "end_ts"]]

    return bucketed_map_groups(ds, key, per_bucket, num_buckets)


def response_latency(
    ds: rd.Dataset,
    key: str = "conv_id",
    order: "str | list" = "turn_idx",
    role: str = "role",
    ts: str = "ts",
    from_role: str = "user",
    to_role: str = "assistant",
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Per-conversation response latency: for every ``to_role`` turn whose
    IMMEDIATELY PRECEDING turn (by ``order``) is a ``from_role`` turn,
    latency = ts - prev ts; aggregated per conversation. The core
    agent-transcript SLA metric (how long the assistant took to answer).

    Output: ``key, n_responses, total_latency_us, max_latency_us`` —
    exact int64 microseconds (event-time differences are integers, so
    sums are order/shard-invariant); conversations with no qualifying
    adjacent pair emit no row (matches the SQL GROUP BY over the
    filtered LAG view).

    ONE bucketed shuffle on ``key``: the lag derivation AND the per-key
    aggregate both run inside the bucket kernel (a conversation never
    spans buckets), so unlike LAG-then-GROUP-BY in two stages nothing
    but the final aggregate rows leaves any task. Per-bucket work is
    a numpy shift over the (key, order)-sorted frame — no per-key loop.
    """
    import numpy as np

    order_cols = [order] if isinstance(order, str) else list(order)

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key] + order_cols, kind="mergesort")
        k = df[key].to_numpy()
        r = df[role].to_numpy()
        t = df[ts].to_numpy(dtype="datetime64[us]").astype(np.int64)
        n = len(df)
        same = np.empty(n, dtype=bool)
        if n:
            same[0] = False
            same[1:] = k[1:] == k[:-1]
        m = same & (r == to_role)
        m[1:] &= r[:-1] == from_role
        m[0] = False
        lat = np.empty(n, dtype=np.int64)
        lat[1:] = t[1:] - t[:-1]
        sub = pd.DataFrame({key: k[m], "__lat": lat[m]})
        g = sub.groupby(key, sort=False)["__lat"]
        out = pd.DataFrame(
            {
                "n_responses": g.count().astype("int64"),
                "total_latency_us": g.sum().astype("int64"),
                "max_latency_us": g.max().astype("int64"),
            }
        )
        out.index.name = key
        out = out.reset_index()
        if out.empty and df[key].dtype == object:
            # typed empty: object->Arrow infers null and breaks the
            # cross-bucket schema union; string keeps pa.string()
            out[key] = out[key].astype("string")
        return out

    return bucketed_map_groups(ds, key, per_bucket, num_buckets)


def sft_examples(
    ds: rd.Dataset,
    n_context: int = 3,
    key: str = "conv_id",
    order: str = "turn_idx",
    role: str = "role",
    text: str = "text",
    target_role: str = "assistant",
    sep: str = "\n",
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Training-example assembly over transcripts — the SFT builder: for
    every ``target_role`` turn (except a conversation's first turn), emit
    the previous ``n_context`` turns rendered as ``role: text`` joined by
    ``sep`` as the CONTEXT, and the turn's own text as the TARGET. The
    core transcripts->training-data materialization (context windows per
    assistant turn), exactly the SQL
    ``string_agg(part, sep) OVER (... ROWS BETWEEN n PRECEDING AND 1
    PRECEDING)`` frame.

    Scale shape: the per-row ``role: text`` part renders STATELESS before
    the shuffle; ONE conv-bucketed exchange; inside the bucket the
    context is k shifted-array joins (k = n_context, a constant), all
    Arrow kernels — no per-row Python, no per-conversation loop. Output
    rows = target-role turns only."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from vaero_ray.stages.keyed import bucketed_map_groups

    def render(tbl: pa.Table) -> pa.Table:
        part = pc.binary_join_element_wise(
            tbl.column(role), tbl.column(text), ": "
        )
        return tbl.append_column("__part", part)

    ds = ds.map_batches(render, batch_format="pyarrow", zero_copy_batch=True)

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key, order], kind="mergesort").reset_index(drop=True)
        n = len(df)
        k_arr = df[key].to_numpy()
        vals = df["__part"].to_numpy()
        # context = join of up to n_context previous parts in the SAME conv
        segs: "list[pa.Array]" = []
        for back in range(n_context, 0, -1):
            shifted = np.empty(n, dtype=object)
            ok = np.zeros(n, dtype=bool)
            if n > back:
                same = k_arr[back:] == k_arr[:-back]
                ok[back:] = same
            shifted[:] = ""
            shifted[ok] = vals[np.flatnonzero(ok) - back]
            segs.append(pa.array(shifted, pa.string()))
        # join non-empty segments with sep: build via pairwise joins that
        # skip empty slots (join "" edges would inject separators)
        ctx = segs[0]
        for s in segs[1:]:
            both = pc.binary_join_element_wise(ctx, s, sep)
            ctx = pc.if_else(
                pc.equal(ctx, ""), s, pc.if_else(pc.equal(s, ""), ctx, both)
            )
        m = (df[role].to_numpy() == target_role) & (
            np.concatenate(([False], k_arr[1:] == k_arr[:-1]))
        )
        idx = np.flatnonzero(m)
        out = pa.table(
            {
                key: pa.array(k_arr[idx], pa.string()),
                order: pa.array(df[order].to_numpy()[idx]),
                "context": pc.take(ctx, pa.array(idx, pa.int64())),
                "target": pa.array(df[text].to_numpy()[idx], pa.string()),
            }
        )
        res = out.to_pandas()
        if res.empty:
            res = res.astype({key: "string", "context": "string", "target": "string"})
        return res

    return bucketed_map_groups(ds, key, per_bucket, num_buckets)
