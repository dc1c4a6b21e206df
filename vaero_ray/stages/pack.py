"""Sequence packing for LLM training data: concatenate documents in
``doc_id`` order and chunk the token stream into fixed-length training
sequences (GPT-style concat-then-chunk; docs may straddle boundaries).

Output: one row per document with its place in the packed stream —
``(doc_id, n_tokens, tok_start, first_seq, last_seq)`` — from which a
trainer (or the SQL oracle) derives every sequence's composition.

Distributed shape: the global token offset is an ORDERED PREFIX SUM —
the one primitive here that Ray Data lacks natively. It is computed as:

1. per-doc token counts (vectorized arrow kernels, no shuffle);
2. ``sort(doc_id)`` — Ray's range-partitioning sort (the one shuffle;
   the payload is two int64 columns, ~16 bytes/doc — tiny even at
   billions of docs);
3. per-block (min doc_id, token total) metadata rows to the driver —
   ONE ROW PER BLOCK, never data;
4. exclusive block offsets broadcast back in a task closure; each block
   adds its offset to its in-block cumulative sum.

Documents with zero tokens are dropped (they occupy no stream space),
matching the SQL oracle's ``WHERE n > 0``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from vaero_ray.stages.textstats import token_counts


def pack_sequences(
    ds: rd.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    target_len: int = 512,
) -> rd.Dataset:
    counted = ds.map_batches(
        lambda t: token_counts(t, text_col).select([id_col, "n_tokens"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    # the shuffle moves (id, count) only; materialize so the two passes
    # below (block metadata, then offset application) reuse the sorted
    # blocks instead of re-sorting
    s = counted.sort(id_col).materialize()

    def block_meta(tbl: pa.Table) -> pa.Table:
        if not tbl.num_rows:
            return pa.table({"min_id": pa.array([], pa.int64()), "total": pa.array([], pa.int64())})
        ids = tbl.column(id_col)
        import pyarrow.compute as pc

        return pa.table(
            {
                "min_id": pa.array([pc.min(ids).as_py()], pa.int64()),
                "total": pa.array([int(pc.sum(tbl.column("n_tokens")).as_py() or 0)], pa.int64()),
            }
        )

    metas = sorted(
        s.map_batches(block_meta, batch_format="pyarrow").take_all(),
        key=lambda r: r["min_id"],
    )  # one tiny row per block
    offsets: dict[int, int] = {}
    acc = 0
    for r in metas:
        offsets[r["min_id"]] = acc
        acc += r["total"]

    def apply_offsets(tbl: pa.Table) -> pa.Table:
        if not tbl.num_rows:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "n_tokens": pa.array([], pa.int64()),
                    "tok_start": pa.array([], pa.int64()),
                    "first_seq": pa.array([], pa.int64()),
                    "last_seq": pa.array([], pa.int64()),
                }
            )
        import pyarrow.compute as pc

        n = np.asarray(tbl.column("n_tokens").to_numpy(zero_copy_only=False), dtype=np.int64)
        base = offsets[int(pc.min(tbl.column(id_col)).as_py())]
        start = base + np.cumsum(n) - n
        keep = n > 0
        start, nk = start[keep], n[keep]
        ids = tbl.column(id_col).to_numpy(zero_copy_only=False)[keep]
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "n_tokens": pa.array(nk, pa.int64()),
                "tok_start": pa.array(start, pa.int64()),
                "first_seq": pa.array(start // target_len, pa.int64()),
                "last_seq": pa.array((start + nk - 1) // target_len, pa.int64()),
            }
        )

    return s.map_batches(apply_offsets, batch_format="pyarrow", zero_copy_batch=True)
