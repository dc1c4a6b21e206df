"""Conversation-level statistics over transcript tables.

Two transcript-payload operators (BASELINE.json: the payload IS
multi-turn conversation transcripts) that both follow the engine's
one-shuffle contract — derive inside the conv bucket, ship only
aggregate rows out:

- conv_fingerprint : ORDER-SENSITIVE mergeable conversation
  fingerprint. Each turn contributes ``(text_hash+1) * B^turn_idx``
  mod M31 (Mersenne 2^31-1); the conversation fingerprint is the SUM
  of turn terms mod M31. Because the position is encoded in the term,
  the sum is order-invariant to COMPUTE (a plain keyed sum — partials
  merge associatively across shards/epochs, so the same fingerprint
  rides the streaming path) yet order-SENSITIVE to the conversation
  content: swapping two different turns changes the value. All values
  stay < 2^31, so every product fits int64 exactly and DuckDB BIGINT
  reproduces it bit-for-bit (the SQL twin lives in
  pipelines/queries.py::SQL_CONV_FP_DEDUP).

- alternation_stats : turn-taking CEP — per conversation, how many
  adjacent turn pairs have the SAME role (a well-formed agent
  transcript alternates user/assistant; violations flag broken
  stitching or duplicated turns). Vectorized shift compare over the
  (key, order)-sorted bucket, one shuffle, aggregate rows only out.

Scale notes: text hashing runs STATELESS before the shuffle, so the
exchange moves (conv_id, ts, event_id, int64 hash) — not text. A
conversation's turn count is bounded by 2^32 per bucket before the
int64 term sum could wrap (documented guard below).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from vaero_ray.stages.keyed import bucketed_map_groups

# Mersenne prime 2^31-1: (th+1) * pow < 2^62 fits int64 exactly, and the
# SQL twin's BIGINT arithmetic is exact at the same width.
M31 = (1 << 31) - 1
CONV_FP_BASE = 131


def turn_hash(tbl: pa.Table, text_col: str = "text", out: str = "th") -> pa.Table:
    """Stateless per-turn text hash: textstats.fingerprint (poly base-31
    mod the 40-bit prime) folded to M31. Runs BEFORE the conv shuffle so
    only int64 hashes ride the exchange."""
    from vaero_ray.stages.textstats import fingerprint

    tmp = fingerprint(pa.table({"__t": tbl.column(text_col)}), "__t", out="__fp")
    fp = tmp.column("__fp").to_numpy(zero_copy_only=False).astype(np.int64)
    return tbl.append_column(out, pa.array(fp % M31, pa.int64()))


def conv_fingerprint(
    ds: rd.Dataset,
    key: str = "conv_id",
    order: "list[str] | str" = "turn_idx",
    th_col: str = "th",
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Per-conversation fingerprint rows ``(key, n_turns, conv_fp)``.

    Input must already carry ``th_col`` (see turn_hash). Turn order is
    derived IN the bucket by sorting on ``order`` (cumcount == turn_idx
    by construction), so no separate turn-numbering shuffle is paid.
    """
    order_cols = [order] if isinstance(order, str) else list(order)

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key] + order_cols, kind="mergesort")
        k = df[key].to_numpy()
        th = df[th_col].to_numpy(dtype=np.int64)
        n = len(df)
        # turn_idx via cumcount over the sorted frame (vectorized)
        new = np.empty(n, dtype=bool)
        if n:
            new[0] = True
            new[1:] = k[1:] != k[:-1]
        starts = np.flatnonzero(new)
        idx = np.arange(n, dtype=np.int64)
        idx -= np.repeat(starts, np.diff(np.append(starts, n)))
        maxi = int(idx.max()) + 1 if n else 0
        pows = np.empty(maxi, dtype=np.int64)
        acc = 1
        for i in range(maxi):
            pows[i] = acc
            acc = (acc * CONV_FP_BASE) % M31
        term = (th + 1) * pows[idx] % M31  # both factors < 2^31: exact
        sub = pd.DataFrame({key: k, "__term": term})
        g = sub.groupby(key, sort=False)["__term"]
        out = pd.DataFrame(
            {
                "n_turns": g.count().astype("int64"),
                # sum < n_turns * 2^31: wraps int64 only past 2^32 turns
                # per conversation — far beyond any real transcript
                "conv_fp": (g.sum() % M31).astype("int64"),
            }
        )
        out.index.name = key
        out = out.reset_index()
        if out.empty and df[key].dtype == object:
            out[key] = out[key].astype("string")
        return out

    return bucketed_map_groups(ds, key, per_bucket, num_buckets)


def dedup_by_fingerprint(
    fps: rd.Dataset,
    key: str = "conv_id",
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Survivor per (conv_fp, n_turns) group: the MIN ``key`` — the
    deterministic keep-first rule every exact-dedup stage in this engine
    uses. Input is already one row per conversation (small), so this is
    a cheap second exchange on the fingerprint."""

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["conv_fp", "n_turns"], sort=False, as_index=False, dropna=False)
        return g[[key]].min()[[key, "n_turns", "conv_fp"]]

    return bucketed_map_groups(fps, "conv_fp", per_bucket, num_buckets)


def alternation_stats(
    ds: rd.Dataset,
    key: str = "conv_id",
    role: str = "role",
    order: "list[str] | str" = "turn_idx",
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Per-conversation turn-taking stats: ``(key, n_turns,
    n_violations)`` where a violation is an adjacent pair (by ``order``)
    with the same role. Conversations with zero violations DO emit a
    row (COUNT semantics, not a filtered view)."""
    order_cols = [order] if isinstance(order, str) else list(order)

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key] + order_cols, kind="mergesort")
        k = df[key].to_numpy()
        r = df[role].to_numpy()
        n = len(df)
        same_conv = np.empty(n, dtype=bool)
        if n:
            same_conv[0] = False
            same_conv[1:] = k[1:] == k[:-1]
        viol = np.zeros(n, dtype=np.int64)
        if n:
            viol[1:] = (r[1:] == r[:-1]).astype(np.int64)
        viol[~same_conv] = 0
        sub = pd.DataFrame({key: k, "__v": viol})
        g = sub.groupby(key, sort=False)["__v"]
        out = pd.DataFrame(
            {"n_turns": g.count().astype("int64"), "n_violations": g.sum().astype("int64")}
        )
        out.index.name = key
        out = out.reset_index()
        if out.empty and df[key].dtype == object:
            out[key] = out[key].astype("string")
        return out

    return bucketed_map_groups(ds, key, per_bucket, num_buckets)
