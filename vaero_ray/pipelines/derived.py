"""Deterministic transcript-shaped table derived from the ``events`` table.

The driver's correctness gate compares Ray pipelines against DuckDB SQL
over the pre-registered testdata views (region..embeddings) — the
transcript fixture (BASELINE.json input_hint) is NOT among them. So the
oracle-checked transcript pipelines run over a transcript table DERIVED
from ``events`` with logic expressible identically in Ray and ANSI SQL:

  conv_id  = 'conv-' || user_id || '-' || strftime(ts, '%Y%m%d')
  turn_idx = row_number per conv ordered by (ts, event_id), 0-based, int32
  role     = view/signup -> user, click/purchase -> assistant, error -> tool
  text     = 'event {id} {type} {props} user{uid}@example.com'
  tool     = 'search' for errors else ''
  ts       = ts

The SQL form is ``TRANSCRIPTS_CTE``; the Ray form is
``derive_transcripts`` (stateless map_batches + ONE groupby(conv_id)
shuffle for turn numbering). Both must stay in lockstep — tested in
tests/test_entry.py.

(The richer synthetic generator in vaero_ray/sources/transcripts.py stays
the primary fixture for unit/property/bench tests.)
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from vaero_ray.io import read_parquet as _read_pq

TRANSCRIPTS_CTE = """transcripts AS (
  SELECT 'conv-' || CAST(user_id AS VARCHAR) || '-' || strftime(ts, '%Y%m%d') AS conv_id,
         CAST(ROW_NUMBER() OVER (PARTITION BY user_id, strftime(ts, '%Y%m%d')
                                 ORDER BY ts, event_id) - 1 AS INTEGER) AS turn_idx,
         CASE WHEN event_type IN ('view', 'signup') THEN 'user'
              WHEN event_type IN ('click', 'purchase') THEN 'assistant'
              ELSE 'tool' END AS role,
         'event ' || CAST(event_id AS VARCHAR) || ' ' || event_type || ' ' || props
             || ' user' || CAST(user_id AS VARCHAR) || '@example.com' AS text,
         CASE WHEN event_type = 'error' THEN 'search' ELSE '' END AS tool,
         ts
  FROM events)"""

_ROLE_KEYS = pa.array(["view", "signup", "click", "purchase", "error"])
_ROLE_VALS = pa.array(["user", "user", "assistant", "assistant", "tool"])


def _prep(tbl: pa.Table) -> pa.Table:
    """Stateless column derivation (everything except turn_idx)."""
    ts = tbl.column("ts")
    uid = pc.cast(tbl.column("user_id"), pa.string())
    day = pc.strftime(ts.combine_chunks().cast(pa.timestamp("us")), format="%Y%m%d")
    conv_id = pc.binary_join_element_wise("conv-", uid, "-", day, "")
    et = tbl.column("event_type")
    role = pc.take(_ROLE_VALS, pc.index_in(et, _ROLE_KEYS))
    text = pc.binary_join_element_wise(
        "event ",
        pc.cast(tbl.column("event_id"), pa.string()),
        " ",
        et,
        " ",
        tbl.column("props"),
        " user",
        uid,
        "@example.com",
        "",
    )
    tool = pc.if_else(pc.equal(et, "error"), "search", "")
    return pa.table(
        {
            "conv_id": conv_id,
            "role": role,
            "text": text,
            "tool": tool,
            "ts": ts,
            "event_id": tbl.column("event_id"),
        }
    )


def _number_turns_bucket(df: pd.DataFrame) -> pd.DataFrame:
    """Vectorized turn numbering across every conversation in a bucket."""
    df = df.sort_values(["conv_id", "ts", "event_id"], kind="mergesort")
    df["turn_idx"] = df.groupby("conv_id", sort=False).cumcount().astype("int32")
    return df


def derive_transcripts_stateless(sf_dir: str) -> rd.Dataset:
    """events.parquet -> transcript columns WITHOUT turn_idx: pure
    map_batches, zero shuffles. Use for any pipeline that doesn't consume
    turn numbering (the flagship windowed route only needs role/text/ts —
    paying the conv_id shuffle there was round 1's biggest wasted cost)."""
    ds = _read_pq(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type", "props"],
    )
    ds = ds.map_batches(_prep, batch_format="pyarrow", zero_copy_batch=True)
    return ds.select_columns(["conv_id", "role", "text", "tool", "ts"])


def derive_transcripts(sf_dir: str) -> rd.Dataset:
    """events.parquet -> transcript table (conv_id, turn_idx, role, text,
    tool, ts). One bucketed shuffle (turn numbering per conversation);
    see stages/keyed.py for why buckets, not per-group map_groups."""
    from vaero_ray.stages.keyed import bucketed_map_groups

    ds = _read_pq(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type", "props"],
    )
    ds = ds.map_batches(_prep, batch_format="pyarrow", zero_copy_batch=True)
    ds = bucketed_map_groups(ds, "conv_id", _number_turns_bucket)
    return ds.select_columns(["conv_id", "turn_idx", "role", "text", "tool", "ts"])
