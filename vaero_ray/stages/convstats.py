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
    """Stateless per-turn text hash: polynomial base-31 char fold mod M31
    of the whitespace-normalized lowercased text (SQL twin:
    ``list_reduce([unicode(c)...], (a,c) -> (a*31+c) % 2147483647)``).
    Runs BEFORE the conv shuffle so only int64 hashes ride the exchange.

    CACHE-BLOCKED closed form (32M-turn rehearsal lesson — this box
    first-touches large pages at ~150 MB/s, so whole-batch 400 MB int64
    temporaries cost more than the arithmetic): docs are processed in
    ~4 MB flat-char slices, and because chars < 2^8 and powers < 2^31,
    per-char products stay < 2^39 with per-doc sums < 2^55 — NO
    per-element modulo at all, one Mersenne fold per doc at the end.
    ~20x faster than the per-element ``% P40`` kernel at corpus scale."""
    import pyarrow.compute as pc

    from vaero_ray.stages.dedup import _flat_texts, _mod_mersenne31

    norm = pc.utf8_lower(
        pc.replace_substring_regex(tbl.column(text_col), r"\s+", " ")
    )
    data, off = _flat_texts(pa.table({"__t": norm}), "__t")
    lens = off[1:] - off[:-1]
    n = len(lens)
    h = np.zeros(n, dtype=np.int64)
    if len(data):
        maxlen = int(lens.max())
        if maxlen > 60000:
            raise ValueError("turn_hash: document longer than 60k chars (2^55 headroom)")
        pows = np.empty(maxlen, dtype=np.int64)
        acc = 1
        for k in range(maxlen):
            pows[k] = acc
            acc = (acc * 31) % M31
        CHUNK = 4 << 20  # ~4 MB of chars per slice
        i0 = 0
        while i0 < n:
            # advance until the slice holds ~CHUNK chars (>=1 doc)
            i1 = int(np.searchsorted(off, off[i0] + CHUNK, side="left"))
            i1 = min(max(i1, i0 + 1), n)
            s0, s1 = int(off[i0]), int(off[i1])
            seg_lens = lens[i0:i1]
            # exponent of char g within doc i: (doc_end - 1) - g
            exps = np.repeat(off[i0 + 1:i1 + 1] - 1, seg_lens) - np.arange(
                s0, s1, dtype=np.int64
            )
            terms = data[s0:s1].astype(np.int64)
            terms *= pows[exps]
            nz = seg_lens > 0
            sums = np.add.reduceat(terms, (off[i0:i1] - s0)[nz])
            # per-doc sum < 2^55: two folds reduce below M31 exactly
            h[i0:i1][nz] = _mod_mersenne31(_mod_mersenne31(sums))
            i0 = i1
    return tbl.append_column(out, pa.array(h, pa.int64()))


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


def pair_pattern_stats(
    ds: rd.Dataset,
    key: str = "conv_id",
    col: str = "role",
    from_val: str = "assistant",
    to_val: str = "tool",
    order: "list[str] | str" = "turn_idx",
    out_col: str = "n_hits",
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Per-key adjacent-pair pattern counts: ``(key, n_turns, out_col)``
    where a hit is an adjacent pair (by ``order``) whose ``col`` goes
    ``from_val -> to_val`` — the agentic tool-call adjacency
    (assistant turn immediately followed by a tool turn) and any other
    two-step micro-pattern. Same one-shuffle shape as
    ``alternation_stats``: the lag compare and the per-key aggregate run
    in the bucket kernel, only aggregate rows leave any task. Keys with
    zero hits DO emit a row (COUNT semantics)."""
    order_cols = [order] if isinstance(order, str) else list(order)

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key] + order_cols, kind="mergesort")
        k = df[key].to_numpy()
        r = df[col].to_numpy()
        n = len(df)
        hit = np.zeros(n, dtype=np.int64)
        if n:
            same = k[1:] == k[:-1]
            hit[1:] = ((r[:-1] == from_val) & (r[1:] == to_val) & same).astype(np.int64)
        sub = pd.DataFrame({key: k, "__h": hit})
        g = sub.groupby(key, sort=False)["__h"]
        out = pd.DataFrame(
            {"n_turns": g.count().astype("int64"), out_col: g.sum().astype("int64")}
        )
        out.index.name = key
        out = out.reset_index()
        if out.empty and df[key].dtype == object:
            out[key] = out[key].astype("string")
        return out

    return bucketed_map_groups(ds, key, per_bucket, num_buckets)


def follow_role_counts(
    ds: rd.Dataset,
    key: str = "conv_id",
    col: str = "role",
    from_val: str = "tool",
    by_col: str = "tool",
    order: "list[str] | str" = "turn_idx",
    end_label: str = "<end>",
    num_buckets: int | None = None,
) -> rd.Dataset:
    """What happens AFTER a marker turn: for every row whose ``col`` ==
    ``from_val``, count the distribution of the NEXT row's ``col``
    within the same key (conversation), grouped by ``by_col`` (e.g. the
    tool name) — the tool-outcome profile of an agentic transcript
    stream (did the tool call hand back to the assistant, stall into
    another tool hop, or end the conversation?). Marker turns that close
    their conversation count under ``end_label``.

    One bucketed shuffle on ``key``; the shift-compare and the
    (by, next) count collapse run vectorized in the bucket kernel, so
    only tiny (by_col, next, n) cells leave any task; a second bounded
    exchange merges the per-bucket cells."""
    from vaero_ray.stages.keyed import bucketed_keyed_sum

    order_cols = [order] if isinstance(order, str) else list(order)

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key] + order_cols, kind="mergesort")
        k = df[key].to_numpy()
        r = df[col].to_numpy()
        n = len(df)
        nxt = np.full(n, end_label, dtype=object)
        if n > 1:
            same = k[1:] == k[:-1]
            nxt[:-1] = np.where(same, r[1:], end_label)
        sel = r == from_val
        sub = pd.DataFrame({by_col: df[by_col].to_numpy()[sel], "next": nxt[sel]})
        g = sub.groupby([by_col, "next"], sort=False).size().rename("n").reset_index()
        return g

    cells = bucketed_map_groups(ds, key, per_bucket, num_buckets)
    return bucketed_keyed_sum(cells, [by_col, "next"], ["n"])
