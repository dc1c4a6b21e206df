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

Both are ONE shuffle: ``groupby(conv_id)`` with vectorized pandas group
logic. Partitioning assumption: a single conversation fits in one group
task (bounded per-conversation length; hot-key aggregates should use the
two-phase path in windows.py instead).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray.data as rd


def assign_exchanges(ds: rd.Dataset, key: str = "conv_id", order: str = "turn_idx", role: str = "role") -> rd.Dataset:
    def per_conv(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(order, kind="mergesort")
        g["exchange_idx"] = (g[role] == "user").astype("int64").cumsum()
        return g

    return ds.groupby(key).map_groups(per_conv, batch_format="pandas")


def stitch_conversations(
    ds: rd.Dataset,
    key: str = "conv_id",
    order: str = "turn_idx",
    sep: str = "\n",
) -> rd.Dataset:
    """One row per conversation:
    conv_id, n_turns, n_user, n_assistant, n_tool, transcript (turn-ordered
    ``role: text`` lines), first_ts, last_ts (event-time min/max)."""

    def per_conv(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(order, kind="mergesort")
        roles = g["role"]
        return pd.DataFrame(
            {
                key: [g[key].iloc[0]],
                "n_turns": pd.array([len(g)], dtype="int64"),
                "n_user": pd.array([int((roles == "user").sum())], dtype="int64"),
                "n_assistant": pd.array([int((roles == "assistant").sum())], dtype="int64"),
                "n_tool": pd.array([int((roles == "tool").sum())], dtype="int64"),
                "transcript": [sep.join(roles.str.cat(g["text"], sep=": "))],
                "first_ts": pd.Series([g["ts"].min()], dtype="datetime64[us]"),
                "last_ts": pd.Series([g["ts"].max()], dtype="datetime64[us]"),
            }
        )

    return ds.groupby(key).map_groups(per_conv, batch_format="pandas")


def stitch_exchanges(ds: rd.Dataset, key: str = "conv_id") -> rd.Dataset:
    """One row per (conversation, exchange): exchange_idx, texts of the
    user / assistant side, number of tool calls. Exchange assignment and
    stitching share the conv_id grouping, so both run in ONE map_groups
    (one shuffle total) — used by the flagship pipeline."""

    def per_conv(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for ex_idx, ex in g.groupby("exchange_idx", sort=True):
            out.append(
                {
                    key: ex[key].iloc[0],
                    "exchange_idx": ex_idx,
                    "user_text": "\n".join(ex.loc[ex["role"] == "user", "text"]),
                    "assistant_text": "\n".join(ex.loc[ex["role"] == "assistant", "text"]),
                    "n_tool_calls": int((ex["role"] == "tool").sum()),
                    "start_ts": ex["ts"].min(),
                    "end_ts": ex["ts"].max(),
                }
            )
        df = pd.DataFrame(out)
        df["exchange_idx"] = df["exchange_idx"].astype("int64")
        df["n_tool_calls"] = df["n_tool_calls"].astype("int64")
        df["start_ts"] = df["start_ts"].astype("datetime64[us]")
        df["end_ts"] = df["end_ts"].astype("datetime64[us]")
        return df

    def fused(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("turn_idx", kind="mergesort")
        g["exchange_idx"] = (g["role"] == "user").astype("int64").cumsum()
        return per_conv(g)

    return ds.groupby(key).map_groups(fused, batch_format="pandas")
