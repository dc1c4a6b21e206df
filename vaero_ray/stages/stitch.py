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
