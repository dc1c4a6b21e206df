"""Complex-event-processing operators over keyed event streams: per-event
rolling event-time window aggregates and funnel (A-then-B-within-T)
sequence detection.

Both ride the engine's ONE-shuffle bucketed-groups pattern
(``stages/keyed.py``): hash(key)%P buckets, then a single VECTORIZED
pandas pass per bucket. Inside a bucket, per-key segments of the
(key, ts)-sorted frame are processed with the offset-searchsorted trick —
shift each key's int64 timestamps by ``key_code * OFF`` where OFF exceeds
the bucket's time range + window, so one global ``np.searchsorted`` per
bucket resolves every per-key window boundary without crossing keys (no
per-key Python loop).

Partitioning assumption (as everywhere in keyed.py): one bucket's rows
fit in one task's heap.

No reference counterpart (the reference has no windowed/CEP operators);
extends the streaming tier mandated by the task.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from vaero_ray.stages.keyed import bucketed_map_groups


def _shifted_ts(df: pd.DataFrame, key: str, ts_col: str, pad_us: int) -> np.ndarray:
    """Strictly-ordered composite of (key segment, int64 ts) for a
    (key, ts)-sorted frame: codes*OFF + (ts - min), OFF > range + pad."""
    ts = df[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
    # use_na_sentinel=False: null keys must get a REAL code (appearance
    # order == sort order, so codes stay nondecreasing). The default -1
    # sentinel would put negative composites at the END of the sorted
    # frame (sort_values places NaN last), silently breaking the global
    # searchsorted for the whole bucket.
    codes = pd.factorize(df[key], use_na_sentinel=False)[0].astype(np.int64)
    base = ts - ts.min() if len(ts) else ts
    off = (int(base.max()) if len(base) else 0) + pad_us + 2
    n_codes = int(codes.max()) + 1 if len(codes) else 0
    if n_codes * off >= 2**63:
        # composite would wrap int64 and silently unsort the array
        raise ValueError(
            f"composite shift overflows int64 ({n_codes} keys x {off} us span "
            "in one bucket); raise num_buckets or narrow the time range"
        )
    return codes * off + base


def rolling_counts(
    ds: rd.Dataset,
    key: str,
    ts_col: str,
    window_s: int,
    out: str = "rolling_count",
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Per EVENT: how many of the same key's events fall in the
    event-time window ``[ts - window_s, ts]`` (inclusive; equal-ts peers
    count, matching SQL RANGE ... AND CURRENT ROW semantics). The
    per-event form of a sliding aggregate — rate limiting / burst
    detection over a log stream."""
    w_us = int(window_s) * 1_000_000

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key, ts_col], kind="mergesort").reset_index(drop=True)
        s = _shifted_ts(df, key, ts_col, w_us)
        lo = np.searchsorted(s, s - w_us, side="left")
        hi = np.searchsorted(s, s, side="right")
        df[out] = (hi - lo).astype(np.int64)
        return df

    return bucketed_map_groups(ds, key, per_bucket, num_buckets=num_buckets)


def funnel_conversions(
    ds: rd.Dataset,
    key: str,
    ts_col: str,
    type_col: str,
    first: str,
    then: str,
    within_s: int,
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Per KEY: total ``then``-type events and how many of them CONVERT —
    i.e. have at least one ``first``-type event of the same key in
    ``[ts - within_s, ts]``. The A-then-B-within-T CEP pattern
    (view->purchase funnels, error-after-deploy alerts).

    Output: one row per key with any ``then`` events:
    ``(key, n_then, n_conv)``, integers."""
    w_us = int(within_s) * 1_000_000

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key, ts_col], kind="mergesort").reset_index(drop=True)
        s = _shifted_ts(df, key, ts_col, w_us)
        et = df[type_col].to_numpy()
        f_mask = et == first
        t_mask = et == then
        sf = s[f_mask]
        st = s[t_mask]
        # per then-event: any first-event in the inclusive window?
        n_in = np.searchsorted(sf, st, side="right") - np.searchsorted(
            sf, st - w_us, side="left"
        )
        conv = (n_in > 0).astype(np.int64)
        keys_then = df.loc[t_mask, key].reset_index(drop=True)
        out = pd.DataFrame({key: keys_then, "__conv": conv})
        g = out.groupby(key, sort=False, dropna=False)["__conv"].agg(["count", "sum"]).reset_index()
        g.columns = [key, "n_then", "n_conv"]
        return g.astype({"n_then": "int64", "n_conv": "int64"})

    return bucketed_map_groups(ds, key, per_bucket, num_buckets=num_buckets)


def sequence_matches(
    ds: rd.Dataset,
    key: str,
    ts_col: str,
    type_col: str,
    steps: "list[str]",
    within_s: int,
    num_buckets: int | None = None,
) -> rd.Dataset:
    """k-step CEP sequence detection, the generalization of
    ``funnel_conversions``: per KEY, count the final-step events that
    COMPLETE the chain ``steps[0] -> steps[1] -> ... -> steps[-1]``
    where every consecutive pair is within ``within_s`` seconds
    (inclusive window ``[ts_i - within_s, ts_i]`` — equal-ts peers
    chain, same RANGE-peers semantics as the 2-step funnel).

    A step-``i`` event QUALIFIES iff some qualifying step-``i-1`` event
    of the same key lies in its window (step 0 always qualifies) — the
    left-to-right frontier propagation a streaming NFA would do, here as
    ``len(steps)-1`` vectorized searchsorted passes over the bucket's
    composite-shifted timestamps (the loop is over STEPS, a small
    constant, never over rows or keys).

    Output: one row per key with any final-step events:
    ``(key, n_last, n_matched)``, integers."""
    if len(steps) < 2:
        raise ValueError("sequence_matches needs at least 2 steps")
    w_us = int(within_s) * 1_000_000

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key, ts_col], kind="mergesort").reset_index(drop=True)
        s = _shifted_ts(df, key, ts_col, w_us)
        et = df[type_col].to_numpy()
        qual = s[et == steps[0]]  # step-0 events all qualify
        matched = None
        for step in steps[1:]:
            st = s[et == step]
            n_in = np.searchsorted(qual, st, side="right") - np.searchsorted(
                qual, st - w_us, side="left"
            )
            matched = n_in > 0
            qual = st[matched]
        last_mask = et == steps[-1]
        keys_last = df.loc[last_mask, key].reset_index(drop=True)
        out = pd.DataFrame({key: keys_last, "__m": matched.astype(np.int64)})
        g = out.groupby(key, sort=False, dropna=False)["__m"].agg(["count", "sum"]).reset_index()
        g.columns = [key, "n_last", "n_matched"]
        return g.astype({"n_last": "int64", "n_matched": "int64"})

    return bucketed_map_groups(ds, key, per_bucket, num_buckets=num_buckets)


def absence_counts(
    ds: rd.Dataset,
    key: str,
    ts_col: str,
    type_col: str,
    first: str,
    then: str,
    within_s: int,
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Negation CEP — the absence pattern (A with NO B within T): per
    KEY, total ``first``-type events and how many are ABANDONED, i.e.
    have no ``then``-type event of the same key STRICTLY after them
    within ``within_s`` seconds (window ``(ts, ts + T]`` — the forward
    complement of ``funnel_conversions``' backward inclusive window).
    Cart-abandonment / missing-heartbeat / unacked-alert detection.

    Same one-shuffle offset-searchsorted shape as the other CEP ops:
    the composite shift pads by ``within_s`` so ``s + w_us`` never
    crosses into the next key's range.

    Output: one row per key with any ``first`` events:
    ``(key, n_first, n_abandoned)``, integers."""
    w_us = int(within_s) * 1_000_000

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key, ts_col], kind="mergesort").reset_index(drop=True)
        s = _shifted_ts(df, key, ts_col, w_us)
        et = df[type_col].to_numpy()
        f_mask = et == first
        sa = s[f_mask]
        sb = s[et == then]
        # strictly-after: (sa, sa + w] -> right-side bounds at both ends
        n_in = np.searchsorted(sb, sa + w_us, side="right") - np.searchsorted(
            sb, sa, side="right"
        )
        aband = (n_in == 0).astype(np.int64)
        keys_first = df.loc[f_mask, key].reset_index(drop=True)
        out = pd.DataFrame({key: keys_first, "__a": aband})
        g = out.groupby(key, sort=False, dropna=False)["__a"].agg(["count", "sum"]).reset_index()
        g.columns = [key, "n_first", "n_abandoned"]
        return g.astype({"n_first": "int64", "n_abandoned": "int64"})

    return bucketed_map_groups(ds, key, per_bucket, num_buckets=num_buckets)


def longest_run_per_key(
    ds: rd.Dataset,
    key: str,
    value_col: str,
    order: "list[str] | str",
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Gaps-and-islands: the longest CONSECUTIVE run of equal
    ``value_col`` per ``key`` in ``order`` — e.g. "longest streak of the
    same event type per user", the run-length CEP primitive (retry
    storms, tool-call loops, crawler bursts). Output one row per key:
    ``(key, value, run_len)``, ties broken by (run_len desc, value asc)
    so the pick is deterministic and shard-invariant.

    One bucketed shuffle; per bucket the runs derive from TWO boundary
    masks (key change | value change) + one np.diff over run starts, and
    the per-key argmax is a lexsort + first-of-segment gather — no
    per-key loop, the SQL ``rn - rn2`` islands trick vectorized."""
    import numpy as np

    from vaero_ray.stages.keyed import bucketed_map_groups

    order_cols = [order] if isinstance(order, str) else list(order)

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key] + order_cols, kind="mergesort")
        k = df[key].to_numpy()
        v = df[value_col].to_numpy()
        n = len(df)
        new_run = np.ones(n, dtype=bool)
        if n:
            new_run[1:] = (k[1:] != k[:-1]) | (v[1:] != v[:-1])
        starts = np.flatnonzero(new_run)
        run_len = np.diff(np.append(starts, n))
        runs = pd.DataFrame(
            {key: k[starts], "value": v[starts], "run_len": run_len.astype(np.int64)}
        )
        # deterministic per-key pick: run_len desc, value asc
        runs = runs.sort_values(
            [key, "run_len", "value"], ascending=[True, False, True], kind="mergesort"
        )
        first = runs.groupby(key, sort=False, as_index=False).head(1)
        return first.reset_index(drop=True)

    return bucketed_map_groups(ds, key, per_bucket, num_buckets)


def ordered_ewma(
    ds: rd.Dataset,
    key: str,
    ts_col: str,
    val_col: str,
    tie_col: str,
    alpha_num: int = 30,
    alpha_den: int = 100,
    out: str = "ewma",
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Per-key integer-exact exponentially-weighted moving average over
    the (ts, tie)-ordered event sequence:

        e_0 = v_0
        e_t = (alpha_num * v_t + (alpha_den - alpha_num) * e_{t-1}) // alpha_den

    One row per key: (key, n_events, out). ``val_col`` must be int64
    (fixed-point upstream, the engine-wide rule) and NON-NEGATIVE when a
    SQL twin must match bit-for-bit (both sides then never divide a
    negative). SQL twin: ``list_reduce(list(v ORDER BY ts, tie),
    (a, x) -> (an*x + (ad-an)*a) // ad)`` — list_reduce seeds from the
    first element, exactly e_0 = v_0.

    The fold is NON-associative (floor division), so it cannot be a
    mergeable aggregate: each key's chain is inherently sequential.
    Vectorized ACROSS keys instead — one rank-step loop per bucket
    (iteration r updates position r of EVERY key simultaneously), so the
    Python-loop count is max events-per-key in the bucket, not rows.
    Partitioning assumption: keys with multi-million event chains make
    the rank loop long; there is no parallel form of this recurrence.
    """
    if not (0 < alpha_num <= alpha_den):
        raise ValueError("ordered_ewma: need 0 < alpha_num <= alpha_den")
    beta = alpha_den - alpha_num

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key, ts_col, tie_col], kind="mergesort").reset_index(drop=True)
        v = df[val_col].to_numpy().astype(np.int64)
        codes = pd.factorize(df[key], use_na_sentinel=False)[0]
        starts = np.flatnonzero(np.r_[True, codes[1:] != codes[:-1]])
        lens = np.diff(np.r_[starts, len(codes)])
        state = v[starts].copy()
        for r in range(1, int(lens.max()) if len(lens) else 0):
            active = lens > r
            idx = starts[active] + r
            state[active] = (alpha_num * v[idx] + beta * state[active]) // alpha_den
        return pd.DataFrame(
            {
                key: df[key].to_numpy()[starts],
                "n_events": lens.astype(np.int64),
                out: state,
            }
        )

    return bucketed_map_groups(ds, key, per_bucket, num_buckets=num_buckets)


def merge_intervals(
    ds: rd.Dataset,
    key: str,
    start_col: str,
    end_col: str,
    count_out: str = "n_merged",
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Per KEY: the union of overlapping-or-TOUCHING ``[start, end]``
    extents — each maximal connected run of intervals collapses to one
    row ``(key, start, end, n_merged)`` with the component's min start /
    max end and its member count. The coverage operator (merged user
    sessions with explicit durations, on-call/uptime accounting, span
    dedup before length bookkeeping); complements ``sessionize``
    (rowwindow.py), which infers extent from inter-event GAPS, by
    merging on EXPLICIT extents.

    Semantics (the SQL islands pattern): sorted by (key, start, end), a
    new component starts when ``start > running_max(end)`` of the key's
    earlier rows; ties and touching intervals (``start == prev end``)
    merge. Union-of-intervals is tie-order invariant, so re-runs and
    re-shards agree bitwise. Endpoints must be non-null with
    ``end >= start`` (raise — a reversed extent is a data bug, not a
    merge request); int64 and timestamp columns both work (timestamps
    merge at microsecond resolution and come back as timestamps).

    Scale shape: ONE key-bucketed shuffle, then per bucket one mergesort
    + one ``np.maximum.accumulate`` sweep over composite-shifted
    endpoints (the ``_shifted_ts`` trick applied to interval VALUES) —
    no per-key or per-component Python. Partitioning assumption (as
    everywhere in keyed.py): one bucket's rows fit in one task's heap.
    """

    def _i64(series: "pd.Series") -> "tuple[np.ndarray, bool]":
        arr = series.to_numpy()
        if np.issubdtype(arr.dtype, np.datetime64):
            return arr.astype("datetime64[us]").astype(np.int64), True
        return arr.astype(np.int64), False

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        if df[start_col].isna().any() or df[end_col].isna().any():
            raise ValueError("merge_intervals: null interval endpoints")
        df = df.sort_values([key, start_col, end_col], kind="mergesort").reset_index(drop=True)
        s, s_ts = _i64(df[start_col])
        e, e_ts = _i64(df[end_col])
        if (e < s).any():
            raise ValueError("merge_intervals: end < start")
        codes = pd.factorize(df[key], use_na_sentinel=False)[0].astype(np.int64)
        base = int(s.min())
        off = int(e.max()) - base + 2  # > extent span: codes never collide
        n_codes = int(codes.max()) + 1
        if n_codes * off >= 2**63:
            raise ValueError(
                f"merge_intervals: composite shift overflows int64 ({n_codes} keys "
                f"x {off} span in one bucket); raise num_buckets or narrow extents"
            )
        sc = codes * off + (s - base)
        ec = codes * off + (e - base)
        run_max = np.maximum.accumulate(ec)
        new = np.ones(len(s), dtype=bool)
        new[1:] = sc[1:] > run_max[:-1]
        starts = np.flatnonzero(new)
        out_s = s[starts]
        out_e = np.maximum.reduceat(e, starts) if len(starts) else e[:0]
        counts = np.diff(np.append(starts, len(s))).astype(np.int64)
        return pd.DataFrame(
            {
                key: df[key].to_numpy()[starts],
                start_col: out_s.astype("datetime64[us]") if s_ts else out_s,
                end_col: out_e.astype("datetime64[us]") if e_ts else out_e,
                count_out: counts,
            }
        )

    return bucketed_map_groups(ds, key, per_bucket, num_buckets=num_buckets)


def rolling_sums(
    ds: rd.Dataset,
    key: str,
    ts_col: str,
    val_col: str,
    window_s: int,
    out: str = "rolling_sum",
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Per EVENT: the sum of the same key's integer ``val_col`` over the
    event-time window ``[ts - window_s, ts]`` (inclusive; equal-ts peers
    count — SQL RANGE ... CURRENT ROW). The moving-AGGREGATE form of
    ``rolling_counts`` (volume bursts, spend-in-last-hour): one prefix
    sum per bucket and the same offset-searchsorted window bounds, no
    per-key Python. ``val_col`` must be integer (fixed-point any doubles
    upstream) so summation order can't perturb results."""
    w_us = int(window_s) * 1_000_000

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key, ts_col], kind="mergesort").reset_index(drop=True)
        s = _shifted_ts(df, key, ts_col, w_us)
        v = df[val_col].to_numpy().astype(np.int64)
        csum = np.concatenate(([0], np.cumsum(v)))
        lo = np.searchsorted(s, s - w_us, side="left")
        hi = np.searchsorted(s, s, side="right")
        df[out] = (csum[hi] - csum[lo]).astype(np.int64)
        return df

    return bucketed_map_groups(ds, key, per_bucket, num_buckets=num_buckets)


def transition_counts(
    ds: rd.Dataset,
    key: str,
    ts_col: str,
    state_col: str,
    tie_col: str,
    max_cells: int = 1_000_000,
    num_buckets: int | None = None,
) -> "pa.Table":
    """First-order Markov transition matrix of a keyed event stream:
    for every consecutive same-key step in ``(ts, tie)`` order, count
    ``prev_state -> state`` and derive each row's transition probability
    ``n / outgoing(prev_state)`` — the behavioral-model / journey-graph
    summary (what follows a view? which tool call follows which?).

    Scale shape: ONE key-bucketed shuffle; per bucket a vectorized
    shift-and-mask produces (prev, cur) pairs which collapse to the
    bucket's distinct cell counts immediately; a second TINY keyed-sum
    exchange merges the per-bucket cells (bounded by |states|^2,
    ``max_cells`` guard — same bounded-cells contract as
    contingency_chi2); probabilities are one deterministic double
    division per cell in the driver."""
    import pyarrow as pa

    from vaero_ray.stages.keyed import bucketed_keyed_sum

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key, ts_col, tie_col], kind="mergesort").reset_index(
            drop=True
        )
        if not len(df):
            return pd.DataFrame(
                {"prev": pd.Series(dtype=object), "cur": pd.Series(dtype=object),
                 "n": pd.Series(dtype="int64")}
            )
        codes = pd.factorize(df[key], use_na_sentinel=False)[0]
        st = df[state_col].to_numpy()
        same = np.zeros(len(df), dtype=bool)
        same[1:] = codes[1:] == codes[:-1]
        out = pd.DataFrame({"prev": np.roll(st, 1)[same], "cur": st[same]})
        g = out.groupby(["prev", "cur"], sort=False, as_index=False, dropna=False).size()
        return g.rename(columns={"size": "n"}).astype({"n": "int64"})

    from vaero_ray.stages.keyed import bucketed_map_groups

    parts = bucketed_map_groups(ds, key, per_bucket, num_buckets=num_buckets)
    cells_ds = bucketed_keyed_sum(parts, ["prev", "cur"], ["n"], num_buckets=8).materialize()
    if cells_ds.count() > max_cells:
        raise ValueError("transition_counts: cell count exceeds max_cells")
    cells = cells_ds.to_pandas()  # bounded by max_cells: the cell table only
    n = cells["n"].to_numpy().astype(np.int64)
    outgoing = cells.groupby("prev", dropna=False)["n"].transform("sum").to_numpy()
    p = n.astype(np.float64) / outgoing.astype(np.float64)
    return pa.table(
        {
            "prev": pa.array(cells["prev"]),
            "cur": pa.array(cells["cur"]),
            "n": pa.array(n, pa.int64()),
            "p": pa.array(p, pa.float64()),
        }
    )


def path_counts(
    ds: rd.Dataset,
    key: str,
    ts_col: str,
    state_col: str,
    tie_col: str,
    depth: int = 3,
    max_cells: int = 1_000_000,
    num_buckets: int | None = None,
) -> "pa.Table":
    """Top user journeys: count every consecutive ``depth``-step same-key
    state sequence in ``(ts, tie)`` order — the k-gram generalization of
    ``transition_counts`` (which is depth=2). Output one row per distinct
    path ``(step_1..step_k, n, p)`` where ``p`` is the path's share of
    all k-step windows (one deterministic double division per cell).

    Scale shape: same as transition_counts — ONE key-bucketed shuffle,
    ``depth-1`` vectorized shifts with key-boundary masks, immediate
    collapse to the bucket's distinct path cells, tiny bounded cell
    merge (``max_cells`` guard)."""
    import pyarrow as pa

    from vaero_ray.stages.keyed import bucketed_keyed_sum, bucketed_map_groups

    if depth < 2:
        raise ValueError("path_counts: depth must be >= 2")
    step_cols = [f"step_{i + 1}" for i in range(depth)]

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key, ts_col, tie_col], kind="mergesort").reset_index(
            drop=True
        )
        n = len(df)
        if n < depth:
            return pd.DataFrame({c: pd.Series(dtype=object) for c in step_cols}
                                | {"n": pd.Series(dtype="int64")})
        codes = pd.factorize(df[key], use_na_sentinel=False)[0]
        st = df[state_col].to_numpy()
        ok = np.ones(n, dtype=bool)
        ok[: depth - 1] = False
        for i in range(1, depth):  # loop over DEPTH (tiny), never rows
            ok[i:] &= codes[i:] == codes[:-i]
        out = pd.DataFrame(
            {c: np.roll(st, depth - 1 - i)[ok] for i, c in enumerate(step_cols)}
        )
        g = out.groupby(step_cols, sort=False, as_index=False, dropna=False).size()
        return g.rename(columns={"size": "n"}).astype({"n": "int64"})

    parts = bucketed_map_groups(ds, key, per_bucket, num_buckets=num_buckets)
    cells_ds = bucketed_keyed_sum(parts, step_cols, ["n"], num_buckets=8).materialize()
    if cells_ds.count() > max_cells:
        raise ValueError("path_counts: cell count exceeds max_cells")
    cells = cells_ds.to_pandas()  # bounded by max_cells: the cell table only
    n_arr = cells["n"].to_numpy().astype(np.int64)
    tot = int(n_arr.sum())
    out = {c: pa.array(cells[c]) for c in step_cols}
    out["n"] = pa.array(n_arr, pa.int64())
    out["p"] = pa.array(n_arr.astype(np.float64) / np.float64(tot), pa.float64())
    return pa.table(out)


def time_weighted_sums(
    ds: rd.Dataset,
    key: str,
    ts_col: str,
    val_col: str,
    tie_col: str,
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Per KEY, over the (ts, tie)-ordered event sequence: each event's
    integer ``val_col`` is HELD until the key's next event, and the
    holds reduce to exact integer sums — the building blocks of a
    time-weighted average without emitting a ratio:

        vw_sum   = sum(value_i * hold_sec_i)   (int64)
        held_sec = sum(hold_sec_i)             (int64)
        n_holds  = events with a successor     (= n_events - 1)

    The final event has no successor and contributes nothing (standard
    last-observation-excluded TWA); single-event keys therefore emit no
    row. hold durations are floored to whole seconds so both sides of
    the SQL twin (LEAD + integer division) are exact. ``val_col`` must
    be int64 (fixed-point upstream, the engine-wide rule).

    One bucketed shuffle; inside a bucket the successor timestamp is a
    plain shift over the (key, ts, tie)-sorted frame with a key-boundary
    mask — no per-key Python. Partitioning assumption: one bucket's rows
    fit one task's heap (keyed.py contract)."""

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key, ts_col, tie_col], kind="mergesort").reset_index(drop=True)
        ts = df[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        v = df[val_col].to_numpy().astype(np.int64)
        codes = pd.factorize(df[key], use_na_sentinel=False)[0]
        same_next = np.r_[codes[1:] == codes[:-1], False]
        hold = np.zeros(len(df), np.int64)
        if len(df) > 1:
            hold[:-1] = (ts[1:] - ts[:-1]) // 1_000_000
        hold[~same_next] = 0
        g = pd.DataFrame(
            {
                key: df[key],
                "vw": np.where(same_next, v * hold, 0),
                "held": hold,
                "n": same_next.astype(np.int64),
            }
        ).groupby(key, sort=False, as_index=False, dropna=False).sum()
        g = g[g["n"] > 0]
        return pd.DataFrame(
            {
                key: g[key],
                "vw_sum": g["vw"].astype("int64"),
                "held_sec": g["held"].astype("int64"),
                "n_holds": g["n"].astype("int64"),
            }
        )

    return bucketed_map_groups(ds, key, per_bucket, num_buckets=num_buckets)


def regex_pattern_counts(
    ds: rd.Dataset,
    key: str,
    order_cols: "list[str]",
    type_col: str,
    mapping: "dict[str, str]",
    pattern: str,
    out: str = "n_matches",
    num_buckets: int | None = None,
) -> rd.Dataset:
    """MATCH_RECOGNIZE-style CEP: per KEY, count non-overlapping matches
    of a regular expression over the key's event-type sequence in
    ``order_cols`` order — the general pattern quantifier form
    (``at+a``: assistant -> tool(s) -> assistant) that fixed-step
    funnels (``sequence_matches``) can't express.

    Vectorized as ONE compiled-regex scan per bucket: event types map to
    single chars (``mapping``; unmapped types become ``'-'`` walls that
    no alphabet pattern crosses), every key's chars land in one shared
    byte buffer with ``'|'`` separators between keys (pure numpy
    scatter: position = row_index + group_index), one ``re.finditer``
    over the buffer, and match starts are attributed back to keys with a
    single searchsorted against the group start offsets. The only Python
    loop is over MATCHES (<< rows). Greedy leftmost non-overlapping
    semantics — identical in Python re and DuckDB/RE2
    ``regexp_extract_all`` for alternation-free patterns, so gates are
    hash-exact.

    ``order_cols`` must make the per-key order total (unique tiebreak),
    or counts are nondeterministic under resharding. Output: one row per
    key, ``(key, out)`` int64, zero-match keys INCLUDED (mirrors the SQL
    ``string_agg -> regexp_extract_all`` twin, which emits every key).

    One bucketed shuffle; partitioning assumption: one bucket's rows fit
    one task's heap (keyed.py contract). Scale note: the buffer is
    ~1 byte/row, so the regex pass is trivially memory-bounded next to
    the frame itself."""
    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        return regex_counts_df(df, key, order_cols, type_col, mapping, pattern, out)

    return bucketed_map_groups(ds, key, per_bucket, num_buckets=num_buckets)


def regex_counts_df(
    df: pd.DataFrame,
    key: str,
    order_cols: "list[str]",
    type_col: str,
    mapping: "dict[str, str]",
    pattern: str,
    out: str = "n_matches",
) -> pd.DataFrame:
    """The per-bucket regex-CEP kernel of ``regex_pattern_counts``,
    exposed standalone so the STREAMING stitch-buffer job can reuse it
    as a closed-conversation emitter (buffer-until-watermark supplies
    whole per-key sequences; this counts the pattern in each). re.compile
    is module-cached, so per-call compilation costs nothing."""
    import re as _re

    pat = _re.compile(pattern.encode("ascii"))
    cmap = {k: v.encode("ascii") for k, v in mapping.items()}
    if any(len(v) != 1 for v in cmap.values()):
        raise ValueError("mapping values must be single ASCII chars")
    df = df.sort_values([key, *order_cols], kind="mergesort").reset_index(drop=True)
    n = len(df)
    if not n:
        return pd.DataFrame({key: df[key], out: np.array([], np.int64)})
    codes = pd.factorize(df[key], use_na_sentinel=False)[0].astype(np.int64)
    gs = np.r_[True, codes[1:] != codes[:-1]]
    gid = np.cumsum(gs) - 1
    n_groups = int(gid[-1]) + 1
    chars = (
        df[type_col]
        .map({k: v[0] for k, v in cmap.items()})
        .fillna(float(ord("-")))
        .to_numpy()
        .astype(np.uint8)
    )
    buf = np.full(n + n_groups, ord("|"), np.uint8)
    pos = np.arange(n, dtype=np.int64) + gid
    buf[pos] = chars
    starts = pos[gs]  # first char position of each key group
    mstarts = np.fromiter(
        (m.start() for m in pat.finditer(buf.tobytes())), dtype=np.int64
    )
    counts = np.zeros(n_groups, np.int64)
    if len(mstarts):
        g = np.searchsorted(starts, mstarts, side="right") - 1
        counts = np.bincount(g, minlength=n_groups).astype(np.int64)
    return pd.DataFrame({key: df[key].to_numpy()[gs], out: counts})


def last_touch_counts(
    ds: rd.Dataset,
    key: str,
    order_cols: "list[str]",
    type_col: str,
    target: str,
    none_label: str = "none",
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Last-touch attribution: for every ``target``-type event, the
    type of the SAME KEY's latest prior non-target event (unbounded
    lookback, strict order), counted per attributed type — which
    activity purchases/conversions follow. Targets with no prior event
    attribute to ``none_label`` (SQL COALESCE semantics).

    Vectorized forward-fill per bucket: index-valued maximum.accumulate
    over non-target positions; a carried index from a previous key is
    necessarily below the current key's segment start, so one compare
    voids cross-key attribution — no per-key Python. The exchange after
    the fold carries (attr_type, n) partials per bucket, never events."""
    from vaero_ray.stages.keyed import bucketed_keyed_sum

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key, *order_cols], kind="mergesort").reset_index(drop=True)
        n = len(df)
        if not n:
            return pd.DataFrame({"attr_type": pd.array([], dtype=object),
                                 "n": np.array([], np.int64)})
        codes = pd.factorize(df[key], use_na_sentinel=False)[0].astype(np.int64)
        starts_of = np.flatnonzero(np.r_[True, codes[1:] != codes[:-1]])
        gid = np.cumsum(np.r_[True, codes[1:] != codes[:-1]]) - 1
        et = df[type_col].to_numpy()
        is_tgt = et == target
        idx = np.where(~is_tgt, np.arange(n, dtype=np.int64), -1)
        ffill = np.maximum.accumulate(idx)
        tpos = np.flatnonzero(is_tgt)
        src = ffill[tpos]
        valid = src >= starts_of[gid[tpos]]
        attr = np.where(valid, et[np.maximum(src, 0)], none_label)
        out = pd.DataFrame({"attr_type": attr}).groupby(
            "attr_type", sort=False
        ).size().rename("n").reset_index()
        out["n"] = out["n"].astype("int64")
        return out

    from vaero_ray.stages.keyed import bucketed_map_groups as _bmg

    partials = _bmg(ds, key, per_bucket, num_buckets=num_buckets)
    return bucketed_keyed_sum(partials, ["attr_type"], ["n"], num_buckets=4)


def funnel_dropoff(
    ds: rd.Dataset,
    key: str,
    ts_col: str,
    type_col: str,
    steps: "list[str]",
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Step-by-step funnel drop-off: how many keys reach step i of the
    ORDERED chain steps[0] -> steps[1] -> ... (unbounded window, each
    step at or after the previous step's FIRST qualifying time — the
    classic first-touch funnel table, where ``sequence_matches`` counts
    completions of the windowed variant). Per key: t1 = first step-0
    event; t_{i+1} = first step-(i+1) event with ts >= t_i.

    Vectorized frontier propagation per bucket: each step is ONE
    composite-shifted searchsorted of the step's (key, ts) lane against
    the previous frontier (loop over STEPS, never keys). The exchange
    carries len(steps) integers per bucket. Output: one row per step,
    ``(step_idx, step, n_reached)``."""
    if len(steps) < 2:
        raise ValueError("funnel_dropoff needs at least 2 steps")

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key, ts_col], kind="mergesort").reset_index(drop=True)
        ts = df[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        codes = pd.factorize(df[key], use_na_sentinel=False)[0].astype(np.int64)
        et = df[type_col].to_numpy()
        base = ts - ts.min() if len(ts) else ts
        off = (int(base.max()) if len(base) else 0) + 2
        n_codes = int(codes.max()) + 1 if len(codes) else 0
        if n_codes * off >= 2**63:
            raise ValueError("composite shift overflows int64; raise num_buckets")
        s = codes * off + base

        # frontier: per surviving key, the composite of its first
        # qualifying time at the current step
        m0 = et == steps[0]
        s0, c0 = s[m0], codes[m0]
        first = np.r_[True, c0[1:] != c0[:-1]] if len(c0) else np.zeros(0, bool)
        frontier_s = s0[first]
        frontier_c = c0[first]
        counts = [len(frontier_c)]
        for step in steps[1:]:
            mi = et == step
            si, ci = s[mi], codes[mi]
            # first event of this step lane at/after the frontier time
            idx = np.searchsorted(si, frontier_s, side="left")
            ok = idx < len(si)
            hit = np.zeros(len(frontier_c), bool)
            hit[ok] = ci[idx[ok]] == frontier_c[ok]
            frontier_s = si[idx[ok & hit]] if len(si) else si[:0]
            frontier_c = frontier_c[ok & hit]
            counts.append(len(frontier_c))
        return pd.DataFrame(
            {
                "step_idx": np.arange(1, len(steps) + 1, dtype=np.int64),
                "step": steps,
                "n_reached": np.array(counts, np.int64),
            }
        )

    from vaero_ray.stages.keyed import bucketed_keyed_sum

    partials = bucketed_map_groups(ds, key, per_bucket, num_buckets=num_buckets)
    return bucketed_keyed_sum(partials, ["step_idx", "step"], ["n_reached"], num_buckets=4)
