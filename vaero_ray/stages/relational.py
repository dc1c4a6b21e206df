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
    from vaero_ray.stages.keyed import bucketed_keyed_sum

    # one hash-bucket exchange, not Ray's per-column sort Aggregate
    # (seconds per Sum over hundreds of tiny partial blocks)
    return bucketed_keyed_sum(partials, dims, ["n_rows"] + ([mcol] if measure else []))


def cube_counts(
    ds: rd.Dataset,
    dims: "list[str]",
    measure: "str | None" = None,
    scale: int = 1,
) -> rd.Dataset:
    """SQL ``GROUP BY CUBE(dims...)`` in one exchange: like
    ``rollup_counts`` but emitting partials for EVERY subset of the
    dimensions (2^d grouping sets, d small by construction), all riding a
    single ``groupby(dims).sum`` shuffle. Rolled-up dimensions carry the
    ``ROLLUP_ALL`` sentinel (non-null string dims only, same contract as
    rollup). Exchange volume is bounded by distinct-key count x 2^d,
    independent of row count."""
    if len(dims) > 6:
        raise ValueError("cube over >6 dims emits 2^d partials per batch; pick fewer")
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
        for mask in range(1 << len(dims)):
            cur = work.copy()
            for i, dcol in enumerate(dims):
                if not (mask >> i) & 1:
                    cur[dcol] = ROLLUP_ALL
            outs.append(cur.groupby(dims, sort=False, as_index=False)[aggcols].sum())
        return pd.concat(outs, ignore_index=True)

    partials = ds.map_batches(partial, batch_format="pandas")
    from vaero_ray.stages.keyed import bucketed_keyed_sum

    # one hash-bucket exchange, not Ray's per-column sort Aggregate
    # (seconds per Sum over hundreds of tiny partial blocks)
    return bucketed_keyed_sum(partials, dims, ["n_rows"] + ([mcol] if measure else []))


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
    instead; this operator is the exact path when groups fit a task.

    The q=1/2 special case of :func:`grouped_percentile`
    (``(n-1)//2 == (n-1)*1//2``) — one kernel, no drift between the two."""
    return grouped_percentile(ds, key, value_col, 1, 2, out=out, num_buckets=num_buckets)


def string_agg_ordered(
    ds: rd.Dataset,
    key: str,
    value_col: str,
    order_cols: "list[str]",
    sep: str = ">",
    out: str = "path",
    num_buckets: "int | None" = None,
) -> rd.Dataset:
    """SQL ``string_agg(value, sep ORDER BY order_cols)`` per key, plus
    the element count — e.g. a user's ordered event-type path for journey
    analysis. ``order_cols`` must totally order each group (include a
    unique tiebreak) so the concatenation is shard-invariant.

    One bucketed shuffle; per bucket one sort, then the per-key join is a
    single vectorized Arrow ``binary_join`` over a ListArray built from
    segment offsets — no per-key loop, no Python string concat.

    Partitioning assumption (as everywhere in keyed.py): one bucket's
    rows — and therefore one key's concatenated string — fit in a task's
    heap; keys with unbounded histories should be capped upstream
    (``corpus.cap_per_key``)."""
    import pyarrow.compute as pc

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key] + order_cols, kind="mergesort").reset_index(drop=True)
        n = len(df)
        if not n:
            return pd.DataFrame(
                {key: df[key], out: pd.Series([], dtype=str),
                 "n_rows": pd.Series([], dtype=np.int64)}
            )
        codes = pd.factorize(df[key], use_na_sentinel=False)[0].astype(np.int64)
        starts = np.flatnonzero(np.concatenate(([True], codes[1:] != codes[:-1])))
        offsets = np.append(starts, n).astype(np.int32)
        la = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()), pa.array(df[value_col], pa.string())
        )
        return pd.DataFrame(
            {
                key: df[key].to_numpy()[starts],
                out: pc.binary_join(la, sep).to_pandas(),
                "n_rows": np.diff(offsets).astype(np.int64),
            }
        )

    from vaero_ray.stages.keyed import bucketed_map_groups

    return bucketed_map_groups(ds, key, per_bucket, num_buckets=num_buckets)


def distinct_set_op(
    a: rd.Dataset,
    b: rd.Dataset,
    cols: "list[str]",
    op: str,
    types: "dict[str, pa.DataType] | None" = None,
) -> rd.Dataset:
    """SQL set operators over the distinct projections of two datasets:
    ``op`` is ``"intersect"`` (rows in both) or ``"except"`` (rows in
    ``a`` and not in ``b``), both DISTINCT semantics.

    Scale shape: each side's blocks are distinct-reduced FIRST (per-block
    combiner), then membership flags ride ONE ``groupby(cols).max``
    exchange — the shuffle moves at most the distinct keys of each block,
    never raw rows, and no side is broadcast.

    ``types`` (col -> pa.DataType) seeds the output schema when the
    result is EMPTY: Ray's empty blocks carry no columns (the engine-wide
    empty-block trap), so an all-filtered result would otherwise surface
    as a zero-column dataset."""
    if op not in ("intersect", "except"):
        raise ValueError(f"op must be 'intersect' or 'except', got {op!r}")

    def prep(ia: int, ib: int):
        def f(df: pd.DataFrame) -> pd.DataFrame:
            g = df[cols].drop_duplicates().reset_index(drop=True)
            g["in_a"] = np.int64(ia)
            g["in_b"] = np.int64(ib)
            return g

        return f

    u = a.map_batches(prep(1, 0), batch_format="pandas").union(
        b.map_batches(prep(0, 1), batch_format="pandas")
    )
    # merge the membership flags with the engine's bucketed keyed shuffle,
    # NOT Ray's native groupby().aggregate(Max, Max): the sort-based
    # Aggregate costs seconds PER column over hundreds of tiny partial
    # blocks (the event_type_pivot lesson — 12.4 -> 1.0 s there; measured
    # 9.5 -> ~1.5 s here at sf0.1). Bucketing on cols[0] is a valid
    # partition of the full key (equal keys share every column).
    from vaero_ray.stages.keyed import bucketed_keyed_sum

    flags = bucketed_keyed_sum(u, cols, ["in_a", "in_b"], agg="max")
    import pyarrow.compute as pc

    want_b = 1 if op == "intersect" else 0

    empty = (
        pa.table({c: pa.array([], t) for c, t in types.items()}) if types else None
    )

    def keep(tbl: pa.Table) -> pa.Table:
        if not tbl.num_rows or not tbl.num_columns:
            return empty if empty is not None else tbl
        mask = pc.and_(
            pc.equal(tbl.column("in_a"), 1), pc.equal(tbl.column("in_b"), want_b)
        )
        return tbl.filter(mask).drop_columns(["in_a", "in_b"])

    return flags.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)


def grouped_moments(
    ds: rd.Dataset,
    key: str,
    x_col: str,
    y_col: str,
) -> rd.Dataset:
    """Per-key second-moment sums of two INTEGER columns — ``n_rows,
    sum_x, sum_y, sum_xx, sum_yy, sum_xy`` — the exact mergeable state
    from which mean/variance/covariance/Pearson correlation all derive in
    closed form. Emitting the integer sums (not the float statistic)
    keeps the result order- and shard-independent and hash-exact, the
    engine's exact-aggregate convention.

    Two-phase: per-batch vectorized partials, then one small
    ``groupby(key).sum`` exchange bounded by distinct keys x blocks.
    Caller guarantees ``n * max|x*y|`` fits int64 (int64 overflow is
    silent in numpy)."""
    mcols = ["n_rows", "sum_x", "sum_y", "sum_xx", "sum_yy", "sum_xy"]

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        x = df[x_col].to_numpy(dtype=np.int64)
        y = df[y_col].to_numpy(dtype=np.int64)
        g = pd.DataFrame(
            {
                key: df[key],
                "n_rows": np.int64(1),
                "sum_x": x,
                "sum_y": y,
                "sum_xx": x * x,
                "sum_yy": y * y,
                "sum_xy": x * y,
            }
        )
        return g.groupby(key, sort=False, as_index=False)[mcols].sum()

    partials = ds.map_batches(partial, batch_format="pandas")
    from vaero_ray.stages.keyed import bucketed_keyed_sum

    # 6 Sum columns through Ray's sort Aggregate would pay the per-column
    # tiny-block cost six times; one bucketed exchange sums them all
    return bucketed_keyed_sum(partials, [key], mcols)


def corr_per_group(
    ds: rd.Dataset,
    key: str,
    x_col: str,
    y_col: str,
) -> rd.Dataset:
    """Exact Pearson correlation of two INTEGER columns per key, derived
    in closed form from :func:`grouped_moments`' mergeable integer sums:
    ``corr = (n*sxy - sx*sy) / sqrt((n*sxx - sx^2) * (n*syy - sy^2))``.
    All arithmetic runs in float64 AFTER the exact integer merge (the
    identical expression an oracle writes over the same integers, so the
    6-dp rounded result is engine-independent; the np.round precedent is
    the cosine-dup gates). Zero-variance groups emit NULL, SQL semantics.
    Same int64-headroom contract as grouped_moments."""
    import pyarrow as _pa

    moments = grouped_moments(ds, key, x_col, y_col)

    def finalize(tbl: _pa.Table) -> _pa.Table:
        n = tbl.column("n_rows").to_numpy(zero_copy_only=False).astype(np.float64)
        sx = tbl.column("sum_x").to_numpy(zero_copy_only=False).astype(np.float64)
        sy = tbl.column("sum_y").to_numpy(zero_copy_only=False).astype(np.float64)
        sxx = tbl.column("sum_xx").to_numpy(zero_copy_only=False).astype(np.float64)
        syy = tbl.column("sum_yy").to_numpy(zero_copy_only=False).astype(np.float64)
        sxy = tbl.column("sum_xy").to_numpy(zero_copy_only=False).astype(np.float64)
        num = n * sxy - sx * sy
        den2 = (n * sxx - sx * sx) * (n * syy - sy * sy)
        ok = den2 > 0
        corr = np.full(len(n), np.nan)
        corr[ok] = np.round(num[ok] / np.sqrt(den2[ok]), 6)
        return _pa.table(
            {
                key: tbl.column(key),
                "n_rows": tbl.column("n_rows"),
                "corr_xy": _pa.array(
                    [None if not o else float(c) for o, c in zip(ok, corr)],
                    _pa.float64(),
                ),
            }
        )

    return moments.map_batches(finalize, batch_format="pyarrow", zero_copy_batch=True)


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


def unpivot(
    ds: rd.Dataset,
    id_cols: "list[str]",
    value_cols: "list[str]",
    var_col: str = "metric",
    value_col: str = "value",
    value_type: "pa.DataType | None" = None,
) -> rd.Dataset:
    """UNPIVOT / melt: turn ``value_cols`` into ``(var_col, value_col)``
    long-format rows — the inverse of the pivot operator. Stateless
    zero-copy Arrow pass (one ``take`` per id column with a tiled index,
    one concat per value column), streams block by block, no shuffle;
    output is value-column-major within each block (all rows for
    ``value_cols[0]`` first), a block-local layout the relational
    consumer (groupby/sort) never observes.

    All value columns are cast to ``value_type`` (default: int64 — the
    gate-friendly exact type; pass ``pa.float64()`` for mixed floats)."""
    import pyarrow.compute as pc

    vt = value_type or pa.int64()
    m = len(value_cols)
    if not m:
        raise ValueError("unpivot: value_cols must be non-empty")

    def melt(tbl: pa.Table) -> pa.Table:
        n = tbl.num_rows
        if not n:
            cols = {c: pa.array([], tbl.schema.field(c).type if tbl.schema.get_field_index(c) >= 0 else pa.int64()) for c in id_cols}
            cols[var_col] = pa.array([], pa.string())
            cols[value_col] = pa.array([], vt)
            return pa.table(cols)
        idx = pa.array(np.tile(np.arange(n, dtype=np.int64), m))
        out = {c: tbl.column(c).take(idx) for c in id_cols}
        out[var_col] = pa.array(np.repeat(np.asarray(value_cols, dtype=object), n))
        out[value_col] = pa.concat_arrays(
            [tbl.column(c).cast(vt).combine_chunks() for c in value_cols]
        )
        return pa.table(out)

    return ds.map_batches(melt, batch_format="pyarrow", zero_copy_batch=True)


def grouped_percentile(
    ds: rd.Dataset,
    key: str,
    value_col: str,
    q_num: int,
    q_den: int,
    out: str = "pct",
    num_buckets: "int | None" = None,
) -> rd.Dataset:
    """Exact LOWER percentile of ``value_col`` per key — the element at
    0-based index ``(n-1) * q_num // q_den`` in value order (SQL
    ``row_number = (n-1)*q_num//q_den + 1``). The quantile is a RATIONAL
    ``q_num/q_den`` so the pick index is pure integer arithmetic and the
    result is an exact element of the input — hash-identical across
    engines (``grouped_median`` is the q=1/2 special case).

    Same scale shape as grouped_median: one bucketed shuffle, per bucket
    one sort + segment-offset gather, no per-key loop. Exact distributed
    quantiles need group co-location; the fixed-memory 100-TB path is
    the mergeable log-histogram sketch (``sketch.lhq_registers``)."""
    from vaero_ray.stages.keyed import bucketed_map_groups

    if not (0 <= q_num <= q_den) or q_den <= 0:
        raise ValueError("grouped_percentile: need 0 <= q_num/q_den <= 1")

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key, value_col], kind="mergesort").reset_index(drop=True)
        codes = pd.factorize(df[key], use_na_sentinel=False)[0].astype(np.int64)
        starts = np.flatnonzero(
            np.concatenate(([True], codes[1:] != codes[:-1])) if len(codes) else []
        )
        lens = np.diff(np.append(starts, len(codes)))
        pick = starts + (lens - 1) * q_num // q_den
        return pd.DataFrame(
            {
                key: df[key].to_numpy()[starts],
                out: df[value_col].to_numpy()[pick],
                "n_rows": lens.astype(np.int64),
            }
        )

    return bucketed_map_groups(ds, key, per_bucket, num_buckets=num_buckets)


def mode_per_group(
    ds: rd.Dataset,
    key: str,
    value_col: str,
    num_buckets: "int | None" = None,
) -> rd.Dataset:
    """Exact MODE of ``value_col`` per key — the most frequent value,
    ties broken to the SMALLEST value (deterministic, SQL ``ORDER BY
    cnt DESC, value``). Output ``(key, mode, mode_count)``.

    Two-phase: per-batch partial counts collapse occurrences to
    (key, value, cnt) rows BEFORE the exchange (bounded by distinct
    pairs per block, not rows — the pre-aggregation rule); one bucketed
    shuffle on the key merges partials and picks the winner with a
    vectorized sort + segment-head gather."""
    from vaero_ray.stages.keyed import bucketed_map_groups

    def partial(tbl: pa.Table) -> pa.Table:
        if not tbl.num_rows:
            return pa.table(
                {key: tbl.column(key), value_col: tbl.column(value_col),
                 "__cnt": pa.array([], pa.int64())}
            )
        return pa.TableGroupBy(tbl.select([key, value_col]), [key, value_col]).aggregate(
            [([], "count_all")]
        ).rename_columns([key, value_col, "__cnt"])

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        g = (
            df.groupby([key, value_col], sort=False)["__cnt"].sum().reset_index()
        )
        # winner per key: cnt DESC, value ASC -> sort then segment head
        g = g.sort_values(
            [key, "__cnt", value_col], ascending=[True, False, True], kind="mergesort"
        ).reset_index(drop=True)
        codes = pd.factorize(g[key], use_na_sentinel=False)[0].astype(np.int64)
        starts = np.flatnonzero(
            np.concatenate(([True], codes[1:] != codes[:-1])) if len(codes) else []
        )
        return pd.DataFrame(
            {
                key: g[key].to_numpy()[starts],
                "mode": g[value_col].to_numpy()[starts],
                "mode_count": g["__cnt"].to_numpy()[starts].astype(np.int64),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return bucketed_map_groups(partials, key, per_bucket, num_buckets=num_buckets)


def mad_per_group(
    ds: rd.Dataset,
    key: str,
    value_col: str,
    num_buckets: "int | None" = None,
) -> rd.Dataset:
    """Median absolute deviation per group — the robust spread statistic
    (outlier-immune alternative to stddev for corpus length/quality
    profiling): lower median of ``|x - lower-median(x)|`` per key.
    Integer input stays integer end-to-end (both medians are element
    picks, the deviation is integer abs), so results hash identically
    across engines. Output: ``key, median, mad, n_rows``.

    Two passes over the input by construction (the deviation needs the
    group's median first): pass 1 = grouped_median (one bucketed
    shuffle); the per-group medians — ONE tiny row per key — are
    broadcast via ``ray.put`` and each batch derives its deviations
    statelessly (Arrow ``index_in``/``take``, no join shuffle); pass 2 =
    grouped_median of the deviations (the second bucketed shuffle).
    Small-side assumption: the medians table (#groups rows) fits the
    object store — the same contract as every broadcast join."""
    import pyarrow.compute as pc

    import ray as _ray

    med = grouped_median(ds, key, value_col, out="median", num_buckets=num_buckets)
    med_tbl = pa.concat_tables(
        [t for t in _ray.get(med.to_arrow_refs()) if t.num_rows]
    ).combine_chunks()
    med_ref = _ray.put(med_tbl)

    def deviations(tbl: pa.Table) -> pa.Table:
        m = _ray.get(med_ref)
        idx = pc.index_in(tbl.column(key), m.column(key))
        grp_med = pc.take(m.column("median"), idx)
        ad = pc.abs(pc.subtract(tbl.column(value_col), grp_med))
        return pa.table({key: tbl.column(key), "__ad": ad})

    dev = ds.map_batches(deviations, batch_format="pyarrow", zero_copy_batch=True)
    out = grouped_percentile(dev, key, "__ad", 1, 2, out="mad", num_buckets=num_buckets)

    def attach_median(tbl: pa.Table) -> pa.Table:
        m = _ray.get(med_ref)
        idx = pc.index_in(tbl.column(key), m.column(key))
        return tbl.append_column("median", pc.take(m.column("median"), idx)).select(
            [key, "median", "mad", "n_rows"]
        )

    return out.map_batches(attach_median, batch_format="pyarrow", zero_copy_batch=True)


def cohort_counts(
    ds: rd.Dataset,
    user_col: str,
    ts_col: str,
    num_buckets: "int | None" = None,
) -> rd.Dataset:
    """Cohort retention matrix: distinct active users per
    ``(cohort_day, day)``, where a user's cohort is their FIRST activity
    day — the classic product-analytics retention triangle, which is a
    self-join (events ⋈ per-user min) plus a COUNT DISTINCT, both of
    which normally shuffle the full event stream twice.

    Here both collapse into ONE bucketed shuffle on the user: a user's
    events co-locate, so the cohort derivation (per-user min day), the
    (user, day) dedup AND the per-(cohort, day) counts are vectorized
    pandas inside the bucket — and because user buckets PARTITION the
    user set, per-bucket distinct counts are exact partials that simply
    SUM across buckets. A second tiny exchange (≤ cohorts × days rows
    per bucket) merges them. Output: ``cohort_day, day, n_users``
    (timestamps day-truncated, count int64)."""
    from vaero_ray.stages.keyed import bucketed_keyed_sum, bucketed_map_groups

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        sub = pd.DataFrame(
            {
                user_col: df[user_col].to_numpy(),
                # numpy unit cast floors to the day, matching date_trunc
                "day": df[ts_col].to_numpy(dtype="datetime64[D]"),
            }
        )
        sub["cohort_day"] = sub.groupby(user_col, sort=False)["day"].transform("min")
        dd = sub.drop_duplicates([user_col, "day"])
        out = (
            dd.groupby(["cohort_day", "day"], sort=False)
            .size()
            .rename("n_users")
            .reset_index()
        )
        out["n_users"] = out["n_users"].astype(np.int64)
        out["cohort_day"] = out["cohort_day"].astype("datetime64[us]")
        out["day"] = out["day"].astype("datetime64[us]")
        return out

    partials = bucketed_map_groups(ds, user_col, per_bucket, num_buckets)
    return bucketed_keyed_sum(partials, ["cohort_day", "day"], ["n_users"], num_buckets=8)


def grouped_percentiles(
    ds: rd.Dataset,
    key: str,
    value_col: str,
    qs: "list[tuple[int, int]]",
    num_buckets: "int | None" = None,
) -> rd.Dataset:
    """SEVERAL exact lower percentiles per key in ONE bucketed shuffle —
    the corpus profile view (p10/median/p90 of document length per
    source) without one scan per quantile: the per-bucket sort and
    segment offsets are computed once, then each rational ``(q_num,
    q_den)`` is just another element pick over the same offsets.
    Output: one row per (key, q) — ``key, q_permille, value, n_rows``
    (q labeled as integer permille, values exact elements of the input,
    so results hash identically across engines)."""
    from vaero_ray.stages.keyed import bucketed_map_groups

    for q_num, q_den in qs:
        if not (0 <= q_num <= q_den) or q_den <= 0:
            raise ValueError("grouped_percentiles: need 0 <= q_num/q_den <= 1")

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key, value_col], kind="mergesort").reset_index(drop=True)
        codes = pd.factorize(df[key], use_na_sentinel=False)[0].astype(np.int64)
        starts = np.flatnonzero(
            np.concatenate(([True], codes[1:] != codes[:-1])) if len(codes) else []
        )
        lens = np.diff(np.append(starts, len(codes)))
        keys = df[key].to_numpy()[starts]
        vals = df[value_col].to_numpy()
        outs = []
        for q_num, q_den in qs:
            pick = starts + (lens - 1) * q_num // q_den
            outs.append(
                pd.DataFrame(
                    {
                        key: keys,
                        "q_permille": np.full(len(starts), q_num * 1000 // q_den, np.int64),
                        "value": vals[pick],
                        "n_rows": lens.astype(np.int64),
                    }
                )
            )
        return pd.concat(outs, ignore_index=True)

    return bucketed_map_groups(ds, key, per_bucket, num_buckets=num_buckets)


def group_overlap(
    ds: rd.Dataset,
    group_col: str,
    member_col: str,
    num_buckets: int | None = None,
    max_groups: int = 62,
) -> rd.Dataset:
    """Pairwise audience overlap: for every pair of ``group_col`` values
    (a < b), the EXACT number of distinct ``member_col`` values present
    in both (``n_common``) and in either (``n_union``) — the Jaccard
    numerator/denominator for segment-similarity dashboards, kept as
    integers so results hash identically to SQL.

    Scale shape (three bounded stages, no pairwise member join):
    1. tiny driver-side distinct of ``group_col`` (grail: groups are a
       dashboard dimension, capped at ``max_groups`` so masks fit int64);
    2. ONE member-bucketed exchange of (member, group-code) pairs
       (per-block np.unique combiner first — raw rows never shuffle);
       per bucket, each member folds to ONE bitmask row via
       np.bitwise_or.reduceat over the member-sorted codes, and the
       bucket emits a <=2^G mask HISTOGRAM, not member rows;
    3. the driver sums the tiny histograms and reads every pairwise
       intersection/union off the mask counts.

    Buckets partition members, so per-member masks are exact; histogram
    counts are sum-mergeable across buckets.
    """
    import ray

    from vaero_ray.stages.keyed import bucketed_map_groups

    groups_rows = ds.map_batches(
        lambda t: pa.table({group_col: t.column(group_col).unique()}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).take_all()
    groups = sorted({r[group_col] for r in groups_rows})
    if len(groups) > max_groups:
        raise ValueError(
            f"group_overlap: {len(groups)} groups exceed the int64 bitmask "
            f"budget ({max_groups}); aggregate the long tail first"
        )
    code = {g: i for i, g in enumerate(groups)}
    code_ref = ray.put(code)

    def to_pairs(tbl: pa.Table) -> pa.Table:
        cmap = ray.get(code_ref)
        g = tbl.column(group_col).to_pandas().map(cmap).to_numpy(dtype=np.int64)
        m = tbl.column(member_col).to_numpy(zero_copy_only=False)
        uniq = pd.DataFrame({"m": m, "g": g}).drop_duplicates()
        return pa.table({"m": pa.array(uniq["m"].to_numpy()),
                         "g": pa.array(uniq["g"].to_numpy(), pa.int64())})

    pairs = ds.map_batches(to_pairs, batch_format="pyarrow", zero_copy_batch=True)

    def bucket_hist(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("m", kind="mergesort")
        m = df["m"].to_numpy()
        bits = (np.int64(1) << df["g"].to_numpy(dtype=np.int64))
        new = np.empty(len(df), dtype=bool)
        new[0] = True
        new[1:] = m[1:] != m[:-1]
        starts = np.flatnonzero(new)
        masks = np.bitwise_or.reduceat(bits, starts)
        vals, cnt = np.unique(masks, return_counts=True)
        return pd.DataFrame({"mask": vals, "cnt": cnt.astype(np.int64)})

    hist_rows = bucketed_map_groups(pairs, "m", bucket_hist, num_buckets).take_all()
    agg: dict = {}
    for r in hist_rows:
        agg[r["mask"]] = agg.get(r["mask"], 0) + r["cnt"]
    masks = np.array(list(agg.keys()), dtype=np.int64)
    counts = np.array(list(agg.values()), dtype=np.int64)

    out = {"type_a": [], "type_b": [], "n_common": [], "n_union": []}
    for i, a in enumerate(groups):
        for b in groups[i + 1:]:
            ba, bb = np.int64(1) << code[a], np.int64(1) << code[b]
            in_a = (masks & ba) != 0
            in_b = (masks & bb) != 0
            nc = int(counts[in_a & in_b].sum())
            nu = int(counts[in_a | in_b].sum())
            out["type_a"].append(a)
            out["type_b"].append(b)
            out["n_common"].append(nc)
            out["n_union"].append(nu)
    return rd.from_arrow(pa.table({
        "type_a": pa.array(out["type_a"], pa.string()),
        "type_b": pa.array(out["type_b"], pa.string()),
        "n_common": pa.array(out["n_common"], pa.int64()),
        "n_union": pa.array(out["n_union"], pa.int64()),
    }))


def grouping_sets_counts(
    ds: rd.Dataset,
    dims: "list[str]",
    sets: "list[list[str]]",
    measure: "str | None" = None,
    scale: int = 1,
) -> rd.Dataset:
    """SQL ``GROUP BY GROUPING SETS (...)`` in one exchange — the generic
    form of rollup (prefix sets) and cube (all subsets): per-batch
    partials for exactly the listed grouping sets ride a single
    ``groupby(dims)`` hash-bucket shuffle. Dimensions absent from a set
    carry the ``ROLLUP_ALL`` sentinel (non-null string dims only, same
    contract as rollup/cube). Exchange volume is bounded by
    distinct-key count x len(sets), independent of row count."""
    mcol = f"sum_{measure}" if measure else None
    for s in sets:
        unknown = set(s) - set(dims)
        if unknown:
            raise ValueError(f"grouping set {s} uses unknown dims {sorted(unknown)}")

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
        for s in sets:
            cur = work.copy()
            for d in dims:
                if d not in s:
                    cur[d] = ROLLUP_ALL
            outs.append(cur.groupby(dims, sort=False, as_index=False)[aggcols].sum())
        return pd.concat(outs, ignore_index=True)

    partials = ds.map_batches(partial, batch_format="pandas")
    from vaero_ray.stages.keyed import bucketed_keyed_sum

    return bucketed_keyed_sum(partials, dims, ["n_rows"] + ([mcol] if measure else []))


def grouped_percentile_cont(
    ds: rd.Dataset,
    key: str,
    value_col: str,
    q_num: int,
    q_den: int,
    out: str = "pct_x_qden",
    num_buckets: "int | None" = None,
) -> rd.Dataset:
    """INTERPOLATED percentile (SQL ``percentile_cont``) per key, kept
    integer-EXACT by scaling: with 0-based pick position
    ``pos = (n-1) * q_num / q_den``, ``lo = pos // 1``, ``rem =
    (n-1)*q_num mod q_den``, the result times ``q_den`` is

        v[lo] * q_den + rem * (v[lo+1] - v[lo])

    — an integer whenever ``value_col`` is integer, so the gate hashes
    identically across engines with no float interpolation drift (the
    caller divides by q_den for display). ``rem == 0`` degenerates to the
    exact element, matching ``grouped_percentile * q_den``.

    Same scale shape as grouped_percentile: one bucketed shuffle, per
    bucket one sort + segment-offset gather, no per-key loop."""
    from vaero_ray.stages.keyed import bucketed_map_groups

    if not (0 <= q_num <= q_den) or q_den <= 0:
        raise ValueError("grouped_percentile_cont: need 0 <= q_num/q_den <= 1")

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key, value_col], kind="mergesort").reset_index(drop=True)
        codes = pd.factorize(df[key], use_na_sentinel=False)[0].astype(np.int64)
        starts = np.flatnonzero(
            np.concatenate(([True], codes[1:] != codes[:-1])) if len(codes) else []
        )
        lens = np.diff(np.append(starts, len(codes)))
        idx_num = (lens - 1) * q_num
        lo = starts + idx_num // q_den
        rem = idx_num % q_den
        v = df[value_col].to_numpy(dtype=np.int64)
        hi = np.minimum(lo + 1, starts + lens - 1)  # rem>0 implies lo+1 in range
        val = v[lo] * q_den + rem * (v[hi] - v[lo])
        return pd.DataFrame(
            {
                key: df[key].to_numpy()[starts],
                out: val.astype(np.int64),
                "n_rows": lens.astype(np.int64),
            }
        )

    return bucketed_map_groups(ds, key, per_bucket, num_buckets=num_buckets)


def zscore_outliers(
    ds: rd.Dataset,
    key: str,
    value_col: str,
    id_col: str,
    z_threshold: int = 2,
    scale: int = 100,
    num_buckets: "int | None" = None,
) -> rd.Dataset:
    """Per-group z-score anomaly detection with INTEGER-EXACT comparisons:
    fixed-point ``c = round(v * scale)``, per-group moment sums
    ``(n, s1, s2)``, and the flag

        (n*c - s1)^2  >  z^2 * (n*s2 - s1^2)

    which is ``|x - mean| > z * stddev_pop`` cleared of divisions — all
    int64, so the outlier set hashes identically to SQL with no float
    boundary flips. Emits ONLY the outlier rows ``(id_col, key, c)``.

    One bucketed shuffle co-locates each group; moments and flags are
    vectorized per bucket (groupby-transform, no per-key loop). int64
    bounds: needs ``(n * c_max)^2 < 2^63`` per group — raised explicitly
    when violated (at corpus scale use the sketch/moments path and a
    float threshold instead)."""
    from vaero_ray.stages.keyed import bucketed_map_groups

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        c = np.floor(df[value_col].to_numpy(dtype=np.float64) * scale + 0.5).astype(
            np.int64
        )
        work = pd.DataFrame({key: df[key].to_numpy(), "c": c, id_col: df[id_col].to_numpy()})
        g = work.groupby(key, sort=False)["c"]
        n = g.transform("size").to_numpy(dtype=np.int64)
        s1 = g.transform("sum").to_numpy(dtype=np.int64)
        work["c2"] = work["c"] * work["c"]
        s2 = work.groupby(key, sort=False)["c2"].transform("sum").to_numpy(dtype=np.int64)
        cmax = int(np.abs(work["c"].to_numpy()).max()) if len(work) else 0
        # every term is bounded by (n*cmax)^2 and the rhs carries z^2:
        # require z^2 * (n*cmax)^2 < 2^63 or the int64 flags are garbage
        if n.size and z_threshold**2 * (float(n.max()) * float(cmax)) ** 2 >= 2.0**63:
            raise ValueError(
                "zscore_outliers: z^2 * (group_size * value_magnitude)^2 "
                "overflows int64; use the float moments path at this scale"
            )
        lhs = (n * work["c"].to_numpy() - s1).astype(np.int64)
        keep = lhs * lhs > z_threshold * z_threshold * (n * s2 - s1 * s1)
        out = work.loc[keep, [id_col, key, "c"]].rename(columns={"c": "value_scaled"})
        return out.reset_index(drop=True)

    return bucketed_map_groups(ds, key, per_bucket, num_buckets=num_buckets)


def contingency_chi2(
    ds: rd.Dataset,
    col_a: str,
    col_b: str,
    max_cells: int = 1_000_000,
    num_buckets: int | None = None,
) -> pa.Table:
    """Chi-square contingency profile of two categorical columns: per
    (a, b) cell the observed count, the independence-expected count
    ``row_total * col_total / grand_total`` and the cell's chi-square
    contribution ``(n - e)^2 / e`` — the drift/association screen a
    corpus QA pass runs (is language independent of source? did the new
    crawl shift the mix?). Sum ``chi2_term`` for the statistic; the
    per-cell terms localize WHERE the dependence is.

    Scale shape: each block pre-collapses to its distinct (a, b, n)
    partial counts, ONE bucketed keyed-sum exchange merges them, and the
    bounded cell table (``max_cells`` guard — contingency analysis is
    only meaningful at low cell cardinality) is finished in the driver
    with exact integer marginals; doubles appear only in the final
    per-cell division, one deterministic expression per cell."""
    from vaero_ray.stages.keyed import bucketed_keyed_sum

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = (
            df.groupby([col_a, col_b], sort=False, as_index=False, dropna=False)
            .size()
            .rename(columns={"size": "n"})
        )
        g["n"] = g["n"].astype(np.int64)
        return g

    parts = ds.map_batches(partial, batch_format="pandas")
    cells_ds = bucketed_keyed_sum(
        parts, [col_a, col_b], ["n"], num_buckets=num_buckets
    ).materialize()
    n_cells = cells_ds.count()
    if n_cells > max_cells:
        raise ValueError(
            f"contingency_chi2: {n_cells} cells exceed max_cells={max_cells}"
        )
    cells = cells_ds.to_pandas()  # bounded by max_cells: the cell table only
    n = cells["n"].to_numpy().astype(np.int64)
    ra = cells.groupby(col_a, dropna=False)["n"].transform("sum").to_numpy().astype(np.int64)
    cb = cells.groupby(col_b, dropna=False)["n"].transform("sum").to_numpy().astype(np.int64)
    tot = int(n.sum())
    # doubles from the start: int64 ra*cb would overflow at ~2^31 rows per
    # marginal, and the float-first product is what the SQL oracle
    # (CAST(rt AS DOUBLE) * ct / tot) computes — same expression tree
    e = ra.astype(np.float64) * cb.astype(np.float64) / np.float64(tot)
    d = n.astype(np.float64) - e
    chi = d * d / e
    return pa.table(
        {
            col_a: pa.array(cells[col_a]),
            col_b: pa.array(cells[col_b]),
            "n": pa.array(n, pa.int64()),
            "expected": pa.array(e, pa.float64()),
            "chi2_term": pa.array(chi, pa.float64()),
        }
    )
