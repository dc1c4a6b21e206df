"""Relational operators beyond the join/window tiers: grouping-sets
rollup aggregates, exact per-group medians, and list explode (unnest).

All three follow the engine's scale conventions: rollup emits every
grouping level as PARTIAL rows inside one stateless ``map_batches`` pass
so a single small ``groupby`` shuffle finalizes all levels at once (the
classic combiner shape — no per-level re-scan of the input); the median
rides the one-shuffle bucketed-groups pattern with a segment-offset
element pick (no per-key Python); explode is a zero-copy Arrow list
flatten + segmented arange, the same kernel ``dedup.line_dedup`` uses
internally, exposed as a user-facing operator (Ray ``flat_map`` without
the per-row Python call).

No reference counterpart (the reference has no aggregates); extends the
relational tier mandated by the task.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd


ROLLUP_ALL = "<all>"  # sentinel for a rolled-up dimension (non-null dims only)


def rollup_counts(
    ds: rd.Dataset,
    dims: "list[str]",
    measure: "str | None" = None,
    scale: int = 1,
) -> rd.Dataset:
    """SQL ``GROUP BY ROLLUP(dims...)`` in one exchange: per-batch partials
    for EVERY rollup prefix level (``(d1, d2)``, ``(d1, <all>)``,
    ``(<all>, <all>)``) ride a single ``groupby(dims).sum`` shuffle.
    Rolled-up dimensions carry the ``ROLLUP_ALL`` sentinel (dims must be
    non-null string columns — a real NULL would be ambiguous with the
    sentinel, the same reason SQL has ``GROUPING()``).

    Output: ``dims + [n_rows] (+ sum_<measure> if given)``; the measure is
    fixed-pointed to int64 via ``round(v * scale)`` (exact, merge-order
    independent). Exchange volume is bounded by distinct-key count x
    (len(dims)+1) levels, independent of row count."""
    mcol = f"sum_{measure}" if measure else None

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        vals = (
            np.floor(df[measure].to_numpy(dtype=np.float64) * scale + 0.5).astype(np.int64)
            if measure
            else None
        )
        outs = []
        work = df[dims].copy()
        work["n_rows"] = np.int64(1)
        if measure:
            work[mcol] = vals
        aggcols = ["n_rows"] + ([mcol] if measure else [])
        for level in range(len(dims), -1, -1):
            cur = work.copy()
            for d in dims[level:]:
                cur[d] = ROLLUP_ALL
            g = cur.groupby(dims, sort=False, as_index=False)[aggcols].sum()
            outs.append(g)
        return pd.concat(outs, ignore_index=True)

    partials = ds.map_batches(partial, batch_format="pandas")
    from ray.data.aggregate import Sum

    aggs = [Sum("n_rows", alias_name="n_rows")]
    if measure:
        aggs.append(Sum(mcol, alias_name=mcol))
    return partials.groupby(dims).aggregate(*aggs)


def grouped_median(
    ds: rd.Dataset,
    key: str,
    value_col: str,
    out: str = "median",
    num_buckets: "int | None" = None,
) -> rd.Dataset:
    """Exact LOWER median of ``value_col`` per key (the element at 0-based
    index ``(n-1)//2`` in value order — SQL ``row_number = (n+1)//2``
    over ``ORDER BY value``), plus the group count. Discrete/lower median
    keeps the output an exact element of the input (int stays int, no
    float interpolation), so results hash identically across engines.

    One bucketed shuffle; per bucket one sort + a segment-offset gather
    (no per-key loop). Exact distributed quantiles fundamentally need the
    group's values co-located — for a fixed memory budget at 100 TB use
    the mergeable log-histogram sketch (``sketch.log_histogram``)
    instead; this operator is the exact path when groups fit a task."""
    from vaero_ray.stages.keyed import bucketed_map_groups

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key, value_col], kind="mergesort").reset_index(drop=True)
        codes = pd.factorize(df[key], use_na_sentinel=False)[0].astype(np.int64)
        starts = np.flatnonzero(
            np.concatenate(([True], codes[1:] != codes[:-1])) if len(codes) else []
        )
        lens = np.diff(np.append(starts, len(codes)))
        pick = starts + (lens - 1) // 2
        return pd.DataFrame(
            {
                key: df[key].to_numpy()[starts],
                out: df[value_col].to_numpy()[pick],
                "n_rows": lens.astype(np.int64),
            }
        )

    return bucketed_map_groups(ds, key, per_bucket, num_buckets=num_buckets)


def explode_lines(
    ds: rd.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
    out_col: str = "line",
    idx_col: str = "line_no",
) -> rd.Dataset:
    """Explode a string column into one row per ``sep``-separated element
    with its 0-based position — SQL ``UNNEST(split(text, sep)) WITH
    ORDINALITY``, Ray ``flat_map`` semantics WITHOUT the per-row Python
    call: a stateless zero-copy Arrow pass (``split_pattern`` +
    ``list_flatten`` + segmented arange) that streams block by block, no
    shuffle."""
    import pyarrow.compute as pc

    from vaero_ray.stages.dedup import _seg_arange

    def explode(tbl: pa.Table) -> pa.Table:
        if not tbl.num_rows:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    idx_col: pa.array([], pa.int64()),
                    out_col: pa.array([], pa.string()),
                }
            )
        parts = pc.split_pattern(tbl.column(text_col), sep)
        counts = pc.list_value_length(parts).to_numpy().astype(np.int64)
        return pa.table(
            {
                id_col: pa.array(
                    np.repeat(tbl.column(id_col).to_numpy(), counts), pa.int64()
                ),
                idx_col: pa.array(_seg_arange(counts), pa.int64()),
                out_col: pc.list_flatten(parts),
            }
        )

    return ds.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)
