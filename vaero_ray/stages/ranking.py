"""Grouped top-k: the bounded-exchange replacement for a global
``sort`` + window-function rank at corpus scale.

Two-phase shape (same contract as the engine's sketch/aggregate tiers):

1. per-BLOCK partial top-k (stateless ``map_batches``, vectorized pandas
   sort + ``groupby(...).head(k)``) — at most ``k`` rows per (group,
   block) survive, so the shuffle moves ``<= k * groups * blocks`` rows
   no matter how large the input;
2. ONE bucketed shuffle on ``hash(group)`` (``keyed.bucketed_map_groups``)
   and the identical kernel per bucket for the exact global top-k.

Ties break deterministically on ``tie_col`` ascending (required for
shard-invariant output — see corpus.cap_per_key's documented
uniqueness caveat; here the tie column makes re-runs stable without a
uniqueness assumption on ``order_col``).

No reference counterpart (the reference has no ranking operators);
equivalent SQL: ``ROW_NUMBER() OVER (PARTITION BY group ORDER BY
order_col DESC, tie_col) <= k``.
"""

from __future__ import annotations

import pandas as pd
import ray.data as rd

from vaero_ray.stages.keyed import bucketed_map_groups


def top_k_per_group(
    ds: rd.Dataset,
    group_col: str,
    order_col: str,
    k: int,
    tie_col: str,
    descending: bool = True,
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Exact top-``k`` rows per ``group_col`` by ``order_col``
    (``descending`` by default), ties broken by ``tie_col`` ascending.
    Keeps all input columns."""

    def head_k(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            [order_col, tie_col], ascending=[not descending, True], kind="mergesort"
        )
        return df.groupby(group_col, sort=False, dropna=False).head(k)

    # per-block partial prune: the same kernel bounds the exchange to
    # k rows per group per block before the bucketed merge
    partials = ds.map_batches(head_k, batch_format="pandas")
    return bucketed_map_groups(partials, group_col, head_k, num_buckets=num_buckets)


def global_percent_rank(
    ds: rd.Dataset,
    col: str,
    out: str = "pct_rank",
    max_distinct: int = 4_000_000,
) -> rd.Dataset:
    """``PERCENT_RANK() OVER (ORDER BY col)`` for EVERY row WITHOUT a
    global sort — rank normalization / calibration of a numeric metric
    column (quality scores, lengths) so downstream filters speak in
    percentiles, not raw units. ``pct = strictly_smaller / (n - 1)``
    (0.0 when n == 1), nulls rank as null and don't count toward n.

    Scale shape: each block reduces to its DISTINCT (value, count)
    pairs, one groupby-sum merges them, and the resulting value table —
    bounded by the column's domain cardinality (``max_distinct`` guard,
    the same low-cardinality contract as exact_group_quantiles_disc) —
    is broadcast via ``ray.put`` as a sorted cumulative lookup; ONE more
    scan maps every row by searchsorted. No data row ever leaves its
    block, vs the all-to-all a window-function sort would pay."""
    import numpy as np
    import pyarrow as pa
    import ray

    def partial(tbl: "pa.Table") -> "pa.Table":
        v = tbl.column(col).to_numpy(zero_copy_only=False)
        v = v[~pd.isna(v)].astype(np.int64)
        u, c = np.unique(v, return_counts=True)
        return pa.table({"v": pa.array(u, pa.int64()), "c": pa.array(c, pa.int64())})

    mat = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("v")
        .sum("c")
        .materialize()
    )
    n_vals = mat.count()
    if n_vals > max_distinct:
        raise ValueError(
            f"global_percent_rank: {n_vals} distinct values exceed "
            f"max_distinct={max_distinct}; the broadcast lookup would not be "
            "small — bucketize (length_equidepth_bins) or sort instead"
        )
    rows = mat.take_all()  # bounded by max_distinct: the broadcast lookup only
    vals = np.array([r["v"] for r in rows], dtype=np.int64)
    cnts = np.array([r["sum(c)"] for r in rows], dtype=np.int64)
    order = np.argsort(vals)
    vals, cnts = vals[order], cnts[order]
    smaller = np.cumsum(cnts) - cnts
    n = int(cnts.sum())
    lookup_ref = ray.put((vals, smaller))
    denom = float(n - 1) if n > 1 else 1.0

    def assign(tbl: "pa.Table") -> "pa.Table":
        lv, ls = ray.get(lookup_ref)
        v = tbl.column(col).to_numpy(zero_copy_only=False)
        nulls = pd.isna(v)
        idx = np.searchsorted(lv, np.where(nulls, lv[0] if len(lv) else 0, v))
        pct = ls[idx] / denom if len(lv) else np.zeros(len(v))
        return tbl.append_column(
            out, pa.array(np.where(nulls, np.nan, pct), pa.float64(), mask=nulls)
        )

    return ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)
