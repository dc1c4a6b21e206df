"""Per-row window functions over keyed event streams: changelog
compaction (latest row per key), running cumulative sums, inter-arrival
lag, and per-row sessionization.

These are the SQL-window-function tier (``... OVER (PARTITION BY key
ORDER BY ts)``) of the engine — the per-ROW complement of the per-window
aggregates in ``stages/windows.py`` and the per-event rolling counts in
``stages/cep.py``. All four ride the ONE-shuffle bucketed-groups pattern
(``stages/keyed.py``): hash(key)%P buckets, then a single vectorized
pandas/numpy pass per bucket. Inside a bucket the frame is sorted by
(key, ts, tiebreak) once and every per-key segment quantity (cumsum
baseline, previous-row gap, session-break flag) is resolved with
factorize + segment-offset arithmetic — no per-key loop, no Python rows.

Determinism: every operator takes an explicit ``tie_col`` (a unique row
id) so ordering — and therefore compaction survivors, running totals and
session numbering under equal timestamps — is total and shard-invariant
(the same contract ADVICE round-3 demanded of ``corpus.cap_per_key``).

Partitioning assumption (as everywhere in keyed.py): one bucket's rows
fit in one task's heap; ``num_buckets`` derives from read metadata or is
passed explicitly at corpus scale.

No reference counterpart (the reference has no window functions); extends
the streaming tier mandated by the task.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from vaero_ray.stages.keyed import bucketed_map_groups


def _sorted_codes(df: pd.DataFrame, key: str) -> np.ndarray:
    """Key codes (appearance order == sort order) for a key-sorted frame;
    null keys get a real code consistent with sort order (same trap as
    cep._shifted_ts: the -1 sentinel would break segment detection)."""
    return pd.factorize(df[key], use_na_sentinel=False)[0].astype(np.int64)


def _segment_starts(codes: np.ndarray) -> np.ndarray:
    """Boolean mask: row i starts a new key segment."""
    starts = np.empty(len(codes), dtype=bool)
    if len(codes):
        starts[0] = True
        np.not_equal(codes[1:], codes[:-1], out=starts[1:])
    return starts


def compact_latest(
    ds: rd.Dataset,
    key: str,
    order_col: str,
    tie_col: str,
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Changelog / upsert compaction: keep, per key, the single row with
    the greatest ``(order_col, tie_col)`` — last-value-wins materialization
    of a keyed update stream (Kafka log compaction, SCD type 1).

    One bucketed shuffle; per bucket one sort + ``drop_duplicates(keep=
    'last')`` (vectorized hash pass). At 100 TB this is the standard
    compaction shape: the exchange moves each key's rows to one task and
    emits exactly one survivor per key."""

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key, order_col, tie_col], kind="mergesort")
        return df.drop_duplicates(subset=[key], keep="last").reset_index(drop=True)

    return bucketed_map_groups(ds, key, per_bucket, num_buckets=num_buckets)


def running_sum(
    ds: rd.Dataset,
    key: str,
    ts_col: str,
    value_col: str,
    tie_col: str,
    out: str = "running_sum",
    scale: int = 100,
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Per ROW: cumulative sum of ``value_col`` over the key's rows up to
    and including this one, ordered by ``(ts_col, tie_col)`` — SQL
    ``SUM(v) OVER (PARTITION BY key ORDER BY ts, tie ROWS UNBOUNDED
    PRECEDING)``. Values are fixed-pointed to integers first
    (``floor(v * scale + 0.5)``, the engine's exact-aggregate convention)
    so totals are order- and shard-independent int64, never drifting
    float64 partial sums.

    Kernel: one global ``np.cumsum`` over the bucket minus each segment's
    baseline (the cumsum just before the segment start), scattered back
    with ``np.repeat`` — no per-key loop."""

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key, ts_col, tie_col], kind="mergesort").reset_index(
            drop=True
        )
        v = np.floor(df[value_col].to_numpy(dtype=np.float64) * scale + 0.5).astype(
            np.int64
        )
        codes = _sorted_codes(df, key)
        starts = _segment_starts(codes)
        cs = np.cumsum(v)
        start_idx = np.flatnonzero(starts)
        # baseline: cumsum immediately BEFORE each segment (0 for the first)
        base = np.where(start_idx > 0, cs[start_idx - 1], 0)
        seg_len = np.diff(np.append(start_idx, len(v)))
        df[out] = cs - np.repeat(base, seg_len)
        return df

    return bucketed_map_groups(ds, key, per_bucket, num_buckets=num_buckets)


def rank_rows(
    ds: rd.Dataset,
    key: str,
    order_col: str,
    tie_col: str,
    descending: bool = False,
    rn_col: str = "rn",
    rank_col: str = "rnk",
    dense_col: str = "dense_rnk",
    ntile: int | None = None,
    ntile_col: str = "tile",
    percent_col: str | None = None,
    cume_col: str | None = None,
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Per ROW: ``ROW_NUMBER`` / ``RANK`` / ``DENSE_RANK`` (and, with
    ``ntile=n``, ``NTILE(n)``) over ``PARTITION BY key ORDER BY
    order_col [DESC]``. ROW_NUMBER/NTILE break ``order_col`` ties by
    ``tie_col`` (total order, shard-invariant); RANK/DENSE_RANK follow
    SQL semantics — ties on ``order_col`` alone share a rank. Null
    ``order_col`` values are not supported (numpy's NaN != NaN would
    split a SQL peer group; assert upstream).

    Kernel: one sort, then every rank variant falls out of two boolean
    edge masks (key change, value change) via ``np.maximum.accumulate``
    over start indices and one global cumsum — no per-key loop. NTILE
    uses the SQL fill rule: sz = q*n + r -> the first r tiles get q+1
    rows, vectorized from the broadcast segment sizes. ``percent_col`` /
    ``cume_col`` add PERCENT_RANK ``(rank-1)/(n-1)`` (0.0 for 1-row
    partitions) and CUME_DIST ``peers_through_current / n`` — exact
    small-integer divisions, bit-identical to any engine's doubles."""

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            [key, order_col, tie_col],
            ascending=[True, not descending, True],
            kind="mergesort",
        ).reset_index(drop=True)
        n = len(df)
        if not n:
            cols = [rn_col, rank_col, dense_col] + ([ntile_col] if ntile else [])
            for c in cols:
                df[c] = np.array([], dtype=np.int64)
            for c in (percent_col, cume_col):
                if c:
                    df[c] = np.array([], dtype=np.float64)
            return df
        codes = _sorted_codes(df, key)
        seg_start = _segment_starts(codes)
        idx = np.arange(n, dtype=np.int64)
        seg_start_idx = np.maximum.accumulate(np.where(seg_start, idx, 0))
        vals = df[order_col].to_numpy()
        newval = seg_start.copy()
        newval[1:] |= vals[1:] != vals[:-1]
        val_start_idx = np.maximum.accumulate(np.where(newval, idx, 0))
        d = np.cumsum(newval.astype(np.int64))
        rn0 = idx - seg_start_idx  # 0-based row number within segment
        df[rn_col] = rn0 + 1
        df[rank_col] = val_start_idx - seg_start_idx + 1
        df[dense_col] = d - d[seg_start_idx] + 1
        if ntile:
            starts_i = np.flatnonzero(seg_start)
            sizes = np.diff(np.append(starts_i, n))
            sz = np.repeat(sizes, sizes)  # segment size per row
            q, r = sz // ntile, sz % ntile
            big = r * (q + 1)  # rows covered by the q+1-sized tiles
            df[ntile_col] = np.where(
                rn0 < big,
                rn0 // np.maximum(q + 1, 1) + 1,
                r + np.where(q > 0, (rn0 - big) // np.maximum(q, 1), 0) + 1,
            ).astype(np.int64)
        if percent_col or cume_col:
            starts_i = np.flatnonzero(seg_start)
            seg_sz = np.repeat(np.diff(np.append(starts_i, n)),
                               np.diff(np.append(starts_i, n)))
            if percent_col:
                rnk = df[rank_col].to_numpy()
                df[percent_col] = np.where(
                    seg_sz > 1, (rnk - 1) / np.maximum(seg_sz - 1, 1), 0.0
                )
            if cume_col:
                vstarts = np.flatnonzero(newval)  # vstarts[0] == 0 always
                vsizes = np.diff(np.append(vstarts, n))
                end_excl = np.repeat(np.cumsum(vsizes), vsizes)  # peer-group end (exclusive)
                df[cume_col] = (end_excl - seg_start_idx) / seg_sz
        return df

    return bucketed_map_groups(ds, key, per_bucket, num_buckets=num_buckets)


def interarrival(
    ds: rd.Dataset,
    key: str,
    ts_col: str,
    tie_col: str,
    out: str = "gap_us",
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Per ROW: microseconds since the key's PREVIOUS row in
    ``(ts_col, tie_col)`` order; ``-1`` for the key's first row (kept as
    a plain int64 sentinel rather than a null so downstream schemas stay
    non-nullable) — SQL ``COALESCE(epoch_us(ts) - LAG(epoch_us(ts)) OVER
    (PARTITION BY key ORDER BY ts, tie), -1)``. Burst detection and
    dwell-time features over a log stream."""

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key, ts_col, tie_col], kind="mergesort").reset_index(
            drop=True
        )
        ts = df[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        codes = _sorted_codes(df, key)
        gap = np.empty(len(ts), dtype=np.int64)
        if len(ts):
            gap[0] = -1
            np.subtract(ts[1:], ts[:-1], out=gap[1:])
            gap[_segment_starts(codes)] = -1
        df[out] = gap
        return df

    return bucketed_map_groups(ds, key, per_bucket, num_buckets=num_buckets)


def sessionize(
    ds: rd.Dataset,
    key: str,
    ts_col: str,
    tie_col: str,
    gap_s: int,
    out: str = "session_id",
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Per ROW: 1-based session number within the key — a new session
    starts at the key's first row or when the gap to the previous row
    EXCEEDS ``gap_s`` seconds (strict >, matching the batch session
    windows in ``stages/windows.py``). The per-row labeling form of a
    session window: SQL ``SUM(CASE WHEN gap IS NULL OR gap > G THEN 1
    ELSE 0 END) OVER (PARTITION BY key ORDER BY ts, tie)``.

    Kernel: session-break flags from one shifted compare, then the same
    cumsum-minus-segment-baseline scatter as ``running_sum``."""
    gap_us = int(gap_s) * 1_000_000

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key, ts_col, tie_col], kind="mergesort").reset_index(
            drop=True
        )
        ts = df[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        codes = _sorted_codes(df, key)
        starts = _segment_starts(codes)
        brk = np.empty(len(ts), dtype=np.int64)
        if len(ts):
            brk[0] = 1
            brk[1:] = (ts[1:] - ts[:-1] > gap_us).astype(np.int64)
            brk[starts] = 1
        cs = np.cumsum(brk)
        start_idx = np.flatnonzero(starts)
        base = np.where(start_idx > 0, cs[start_idx - 1], 0)
        seg_len = np.diff(np.append(start_idx, len(ts)))
        df[out] = cs - np.repeat(base, seg_len)
        return df

    return bucketed_map_groups(ds, key, per_bucket, num_buckets=num_buckets)


def moving_frame_sum(
    ds: rd.Dataset,
    key: str,
    ts_col: str,
    value_col: str,
    tie_col: str,
    frame_rows: int,
    out: str = "frame_sum",
    count_out: str = "frame_n",
    scale: int = 100,
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Per ROW: sum of ``value_col`` over the key's last ``frame_rows``
    rows up to and including this one in ``(ts_col, tie_col)`` order —
    SQL ``SUM(v) OVER (PARTITION BY key ORDER BY ts, tie ROWS BETWEEN
    frame_rows-1 PRECEDING AND CURRENT ROW)`` — plus the actual frame
    row count (< ``frame_rows`` near each key's start), from which any
    moving average derives exactly. Values fixed-point to int64 first
    (``floor(v*scale+0.5)``) per the engine's exact-aggregate convention.

    Kernel: one bucket cumsum; each row's frame-start index is
    ``max(segment_start, i - frame_rows + 1)`` resolved with a repeat
    over segment lengths — no per-key loop, no per-row frame scan."""
    if frame_rows < 1:
        raise ValueError("frame_rows must be >= 1")

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key, ts_col, tie_col], kind="mergesort").reset_index(
            drop=True
        )
        n = len(df)
        v = np.floor(df[value_col].to_numpy(dtype=np.float64) * scale + 0.5).astype(
            np.int64
        )
        codes = _sorted_codes(df, key)
        starts = _segment_starts(codes)
        cs = np.cumsum(v)
        start_idx = np.flatnonzero(starts)
        seg_len = np.diff(np.append(start_idx, n))
        seg_start = np.repeat(start_idx, seg_len)  # per-row segment start
        idx = np.arange(n, dtype=np.int64)
        lo = np.maximum(seg_start, idx - frame_rows + 1)
        base = np.where(lo > 0, cs[np.maximum(lo - 1, 0)], 0)
        base[lo == 0] = 0
        df[out] = cs - base
        df[count_out] = idx - lo + 1
        return df

    return bucketed_map_groups(ds, key, per_bucket, num_buckets=num_buckets)


def lag_lead(
    ds: rd.Dataset,
    key: str,
    ts_col: str,
    value_col: str,
    tie_col: str,
    lag_out: str = "lag_cents",
    lead_out: str = "lead_cents",
    scale: int = 100,
    sentinel: int = -1,
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Per ROW: the key's previous and next value in ``(ts_col,
    tie_col)`` order — SQL ``LAG(v)`` / ``LEAD(v)`` ``OVER (PARTITION BY
    key ORDER BY ts, tie)`` — fixed-point int64 (``floor(v*scale+0.5)``)
    with ``sentinel`` where SQL yields NULL (first/last row of the key;
    plain int64 keeps schemas non-nullable, same convention as
    ``interarrival``; requires values that can't collide with the
    sentinel, i.e. non-negative for the default -1).

    Kernel: two shifted copies of the bucket-sorted value array with
    segment boundaries masked to the sentinel."""

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key, ts_col, tie_col], kind="mergesort").reset_index(
            drop=True
        )
        n = len(df)
        v = np.floor(df[value_col].to_numpy(dtype=np.float64) * scale + 0.5).astype(
            np.int64
        )
        codes = _sorted_codes(df, key)
        starts = _segment_starts(codes)
        lag = np.full(n, sentinel, dtype=np.int64)
        lead = np.full(n, sentinel, dtype=np.int64)
        if n:
            lag[1:] = v[:-1]
            lag[starts] = sentinel
            lead[:-1] = v[1:]
            ends = np.empty(n, dtype=bool)
            ends[:-1] = starts[1:]
            ends[-1] = True
            lead[ends] = sentinel
        df[lag_out] = lag
        df[lead_out] = lead
        return df

    return bucketed_map_groups(ds, key, per_bucket, num_buckets=num_buckets)


def apply_changelog(
    base: rd.Dataset,
    changes: rd.Dataset,
    key: str,
    order_col: str,
    tie_col: str,
    op_col: str = "op",
    delete_op: str = "D",
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Apply a keyed changelog (upserts + deletes) to a base snapshot —
    the table-maintenance primitive behind incremental snapshot rebuild
    (Kafka-compacted topic replay, CDC apply, SCD type 1 with
    tombstones). ``changes`` rows carry ``op_col``: ``delete_op`` rows
    are tombstones, anything else is an upsert. Per key the row with the
    greatest ``(order_col, tie_col)`` across base+changes wins; if the
    winner is a tombstone the key disappears. Base rows must sort BELOW
    every change (give them the epoch floor in ``order_col``).

    One bucketed exchange (base and changes union into the same
    compaction shuffle — no separate join pass); per bucket one sort +
    keep-last + tombstone filter. Output schema = base columns.
    """
    import pyarrow as pa

    base_cols = list(base.schema().names)

    def tag_base(tbl: pa.Table) -> pa.Table:
        n = tbl.num_rows
        return tbl.append_column(op_col, pa.array(["U"] * n, pa.string()))

    b = base.map_batches(tag_base, batch_format="pyarrow", zero_copy_batch=True)
    c = changes.map_batches(
        lambda t: t.select(base_cols + [op_col]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key, order_col, tie_col], kind="mergesort")
        last = df.drop_duplicates(subset=[key], keep="last")
        live = last[last[op_col] != delete_op]
        return live[base_cols].reset_index(drop=True)

    from vaero_ray.stages.keyed import bucketed_map_groups

    return bucketed_map_groups(
        b.map_batches(
            lambda t: t.select(base_cols + [op_col]),
            batch_format="pyarrow", zero_copy_batch=True,
        ).union(c),
        key,
        per_bucket,
        num_buckets=num_buckets,
    )


def global_row_number(
    ds: rd.Dataset,
    keys: "list[str]",
    out_col: str = "seq",
    start: int = 1,
) -> rd.Dataset:
    """Global ordered enumeration — ``ROW_NUMBER() OVER (ORDER BY
    keys)`` with NO partition clause (the total-order complement of
    ``rank_rows``): the distributed export-numbering / line-numbering
    primitive.

    Requires the key tuple to be UNIQUE per row (pass a unique id as the
    last key) — uniqueness makes the global order total, so the result
    is shard- and layout-invariant.

    Scale shape: one range-partitioning sort (``ds.sort(keys)`` — the
    unavoidable all-to-all for a total order), then a two-pass
    block-offset prefix sum exactly like ``pack.pack_sequences``: pass 1
    ships ONE (first-key-tuple, row-count) metadata row per block to the
    driver (lineage-size, not data); pass 2 adds each block's exclusive
    offset to a local ``arange``. No row leaves its post-sort block."""
    import pyarrow as pa

    from vaero_ray.stages.joins import _pa_type

    s = ds.sort(keys).materialize()
    sch = s.schema()
    key_types = {k: _pa_type(t) for k, t in zip(sch.names, sch.types) if k in keys}

    def block_meta(tbl: pa.Table) -> pa.Table:
        if not tbl.num_rows:  # empty post-sort blocks may carry NO columns
            return pa.table(
                {**{k: pa.array([], key_types[k]) for k in keys}, "n": pa.array([], pa.int64())}
            )
        # blocks are internally sorted: row 0 is the block minimum; key
        # values stay NATIVE (a stringified int would sort "10" < "9")
        return pa.table(
            {
                **{k: tbl.column(k).slice(0, 1) for k in keys},
                "n": pa.array([tbl.num_rows], pa.int64()),
            }
        )

    metas = s.map_batches(block_meta, batch_format="pyarrow").take_all()
    metas.sort(key=lambda r: tuple(r[k] for k in keys))
    offsets: dict[tuple, int] = {}
    acc = start
    for r in metas:
        t = tuple(r[k] for k in keys)
        if t in offsets:  # two blocks share a minimum => key tuple not unique
            raise ValueError(
                "global_row_number: key tuple is not unique across rows "
                f"(duplicate block minimum {t}); add a unique id as the last key"
            )
        offsets[t] = acc
        acc += r["n"]

    empty_full = pa.table(
        {n: pa.array([], _pa_type(t)) for n, t in zip(sch.names, sch.types)}
    ).append_column(out_col, pa.array([], pa.int64()))

    def enumerate_block(tbl: pa.Table) -> pa.Table:
        if not tbl.num_rows:
            return empty_full
        base = offsets[tuple(tbl.column(k)[0].as_py() for k in keys)]
        return tbl.append_column(
            out_col, pa.array(base + np.arange(tbl.num_rows, dtype=np.int64))
        )

    return s.map_batches(enumerate_block, batch_format="pyarrow", zero_copy_batch=True)


def state_history(
    ds: rd.Dataset,
    key: str,
    ts_col: str,
    state_col: str,
    tie_col: str,
    num_buckets: int | None = None,
) -> rd.Dataset:
    """SCD2 history build from a changelog: collapse consecutive equal
    states per key, emit one validity row per state RUN —
    ``(key, state, valid_from, valid_to)`` with ``valid_to`` = the next
    run's start (null for the current run). The
    slowly-changing-dimension type-2 table a warehouse derives from an
    event/CDC stream; ``compact_latest`` (above) keeps only the last
    row, this keeps the full timeline.

    Same one-shuffle bucketed-sort shape as every rowwindow op; change
    detection compares factorized state codes (null state == null state,
    so a null run is one run, SQL ``IS DISTINCT FROM`` semantics); ties
    broken by ``tie_col`` for shard-invariant output."""

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key, ts_col, tie_col], kind="mergesort").reset_index(drop=True)
        n = len(df)
        kc = pd.factorize(df[key], use_na_sentinel=False)[0]
        sc = pd.factorize(df[state_col], use_na_sentinel=False)[0]
        change = np.ones(n, dtype=bool)
        change[1:] = (kc[1:] != kc[:-1]) | (sc[1:] != sc[:-1])
        c = df.loc[change, [key, state_col, ts_col]].reset_index(drop=True)
        ckc = kc[change]
        vt = c[ts_col].shift(-1)
        vt[np.r_[ckc[1:] != ckc[:-1], True]] = None  # last run per key: open
        return pd.DataFrame(
            {
                key: c[key],
                "state": c[state_col],
                "valid_from": c[ts_col],
                "valid_to": vt,
            }
        )

    return bucketed_map_groups(ds, key, per_bucket, num_buckets=num_buckets)
