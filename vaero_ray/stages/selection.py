"""Exact distributed order statistics by bit-prefix radix selection.

The log-histogram sketch (``stages/sketch.lhq_*``) answers quantiles
APPROXIMATELY in one pass; this module answers them EXACTLY without the
classic alternative — a full range-partition sort — by binary-searching
the VALUE DOMAIN instead of moving rows. Pass 0 reduces each block to a
single ``(min, max, n)`` metadata row (the same one-row-per-block
driver pattern as ``rowwindow.global_row_number``); the driver anchors
the search at the global min, so only ``ceil(bits(max - min) /
digit_bits)`` histogram passes follow — 1-2 for the narrow domains real
columns have (lengths, counts, cents), at most 4 for full-range int64.
Each histogram pass reduces a block's candidate rows to a
<=2^digit_bits-bin digit histogram emitted as ``(key, cnt)`` register
rows (groupby-SUM mergeable — the identical exchange shape as the
sketches); the driver walks the merged histogram to pick each
quantile's digit, and the next pass tracks only rows whose high bits
match a chosen prefix. No data row ever leaves its block; the only
exchanges are register rows. At 100 TB this is 2-5 column-pruned scans
plus KB-scale shuffles, where a sort-based quantile is an all-to-all of
every row. All requested quantiles ride the SAME passes (divergent
prefixes are tracked side by side), so p50/p90/p99 cost no more than
the median alone. Repeated/derived inputs: materialize the projected
int column first (int64 rows are tiny) so the passes re-scan 8 bytes
per row, not the expression lineage.

Rank semantics match DuckDB ``quantile_disc``: the 0-based sorted index
is ``max(ceil(q*n) - 1, 0)`` (verified against DuckDB over 300 random
arrays incl. negatives). Nulls are excluded from ``n``.

The reference engine has no quantile operator (``/root/reference`` is a
log-routing pipeline); this is part of the mandated training-data tier,
complementing the approximate ``lhq_*`` sketch with the exact answer.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

_SIGN = np.uint64(1 << 63)  # order-preserving int64 -> uint64 flip


def exact_quantiles_disc(
    ds: rd.Dataset,
    col: str,
    qs: "list[float]",
    digit_bits: int = 16,
    weight_col: "str | None" = None,
) -> "list[int]":
    """Exact ``quantile_disc`` values of int64 column ``col`` for each
    q in ``qs``, via adaptive radix-selection passes (see module
    docstring). Returns plain ints in ``qs`` order. Raises on an
    all-null/empty column (DuckDB would return NULL).

    With ``weight_col`` (non-negative int64; null weights raise,
    zero-weight rows are unselectable), answers the WEIGHTED discrete
    quantile — the smallest value whose cumulative weight reaches
    ``max(ceil(q * total_weight), 1)`` (the unweighted rule with counts
    replaced by weights; identical when all weights are 1). Same passes,
    same register-row exchanges — histograms sum weights instead of
    counting rows, so a weighted median costs exactly what the plain
    median does."""
    from ray.data.aggregate import Sum

    if not 1 <= digit_bits <= 32:
        raise ValueError("digit_bits must be in [1, 32]")
    if not qs:
        return []
    if any(q < 0.0 or q > 1.0 for q in qs):
        raise ValueError("quantiles must be in [0, 1]")
    mask = np.uint64((1 << digit_bits) - 1)

    def col_u64(tbl: pa.Table) -> "tuple[np.ndarray, np.ndarray | None]":
        c = tbl.column(col)
        if weight_col is None:
            x = pc.drop_null(c)
            if not len(x):
                return np.empty(0, dtype=np.uint64), None
            return (
                x.to_numpy(zero_copy_only=False).astype(np.int64).view(np.uint64)
                ^ _SIGN,
                None,
            )
        wc = tbl.column(weight_col)
        if wc.null_count:
            raise ValueError("exact_quantiles_disc: null weights")
        t = pa.table({"c": c, "w": wc}).filter(pc.is_valid(c))
        if not t.num_rows:
            return np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.int64)
        wt = t.column("w").to_numpy(zero_copy_only=False).astype(np.int64)
        if (wt < 0).any():
            raise ValueError("exact_quantiles_disc: negative weights")
        u = t.column("c").to_numpy(zero_copy_only=False).astype(np.int64).view(
            np.uint64
        ) ^ _SIGN
        return u, wt

    # pass 0: one (min, max, n) metadata row per block -> global bounds
    def minmax(tbl: pa.Table) -> pa.Table:
        u, wt = col_u64(tbl)
        if not len(u):
            return pa.table({"lo": pa.array([], pa.uint64()),
                             "hi": pa.array([], pa.uint64()),
                             "n": pa.array([], pa.int64())})
        total = len(u) if wt is None else int(wt.sum())
        return pa.table({"lo": pa.array([u.min()], pa.uint64()),
                         "hi": pa.array([u.max()], pa.uint64()),
                         "n": pa.array([total], pa.int64())})

    rows = ds.map_batches(minmax, batch_format="pyarrow", zero_copy_batch=True).take_all()
    if not rows:
        raise ValueError(f"exact_quantiles_disc: no non-null values in {col!r}")
    base = np.uint64(min(r["lo"] for r in rows))
    rng = int(max(r["hi"] for r in rows)) - int(base)
    n = int(sum(r["n"] for r in rows))
    if weight_col is not None and n <= 0:
        raise ValueError("exact_quantiles_disc: total weight is zero")
    ranks = [max(math.ceil(q * n) - 1, 0) for q in qs]
    if rng == 0:  # constant column: every quantile is the single value
        return [int(np.int64(base ^ _SIGN))] * len(qs)
    rounds = math.ceil(rng.bit_length() / digit_bits)
    width = rounds * digit_bits  # digits of w = u - base within this many bits

    def histogram(prefixes: np.ndarray, shift: int) -> "dict[int, np.ndarray]":
        """One pass: merged per-(tracked prefix, next digit) counts.
        ``prefixes`` is the sorted uint64 array of tracked high-digit
        values of w (w >> (shift + digit_bits)); tiny, shipped in the
        task closure. Returns {prefix_idx: int64[2^digit_bits] counts}."""
        P = prefixes  # closure capture
        sh = np.uint64(shift)
        top = shift + digit_bits >= width

        def partial(tbl: pa.Table) -> pa.Table:
            u, wt = col_u64(tbl)
            empty = pa.table(
                {"key": pa.array([], pa.int64()), "cnt": pa.array([], pa.int64())}
            )
            if not len(u):
                return empty
            w = u - base  # candidates all have u >= base by construction
            if top:  # first histogram round: one root prefix holds all rows
                idx = np.zeros(len(w), dtype=np.int64)
            else:
                pref = w >> np.uint64(shift + digit_bits)
                idx = np.searchsorted(P, pref)
                ok = (idx < len(P)) & (P[np.minimum(idx, len(P) - 1)] == pref)
                if not ok.any():
                    return empty
                idx = idx[ok]
                w = w[ok]
                if wt is not None:
                    wt = wt[ok]
            dig = (w >> sh) & mask
            key = (idx << digit_bits) | dig.astype(np.int64)
            if wt is None:
                ub, uc = np.unique(key, return_counts=True)
            else:  # exact integer weight sums per key (bincount would float)
                order = np.argsort(key, kind="stable")
                ks, ws = key[order], wt[order]
                b = np.flatnonzero(np.r_[True, ks[1:] != ks[:-1]])
                ub, uc = ks[b], np.add.reduceat(ws, b)
            return pa.table(
                {"key": pa.array(ub, pa.int64()), "cnt": pa.array(uc, pa.int64())}
            )

        merged = (
            ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("key")
            .aggregate(Sum("cnt", alias_name="cnt"))
            .take_all()
        )
        out: dict[int, np.ndarray] = {}
        for r in merged:  # <= len(prefixes) * 2^digit_bits register rows
            i, d = divmod(int(r["key"]), 1 << digit_bits)
            out.setdefault(i, np.zeros(1 << digit_bits, dtype=np.int64))[d] = r["cnt"]
        return out

    # (tracked prefix of w, local 0-based rank) per requested quantile
    state = [(np.uint64(0), k) for k in ranks]
    prefixes = np.array([0], dtype=np.uint64)
    for rnd in range(rounds):
        shift = width - digit_bits * (rnd + 1)
        hists = histogram(prefixes, shift)
        nxt = []
        for pref, k in state:
            i = int(np.searchsorted(prefixes, pref))
            cum = np.cumsum(hists[i])
            j = int(np.searchsorted(cum, k + 1))
            before = int(cum[j - 1]) if j else 0
            nxt.append(((pref << np.uint64(digit_bits)) | np.uint64(j), k - before))
        state = nxt
        prefixes = np.unique(np.array([p for p, _ in state], dtype=np.uint64))

    return [int(np.int64((p + base) ^ _SIGN)) for p, _ in state]


def exact_group_quantiles_disc(
    ds: rd.Dataset,
    col: str,
    group: str,
    qs: "list[float]",
    digit_bits: int = 16,
    max_groups: int = 4096,
    weight_col: "str | None" = None,
) -> "dict[object, list[int]]":
    """Per-GROUP exact ``quantile_disc`` for LOW-cardinality group
    columns: {group_value: [value per q]}. Every group and every
    quantile rides the SAME radix-selection passes — tracked
    (group, prefix) pairs share each scan's histogram — so per-source
    p50/p90/p99 over a corpus costs the same 2-5 column-pruned scans as
    one global median, with NO row exchange at all (``grouped_median``
    moves every row through its bucketed shuffle; the win here is
    few-groups x huge-rows). Groups are anchored at the GLOBAL min
    (per-group subranges just concentrate their histograms), capped at
    ``max_groups`` (beyond that the register exchange stops being small
    — use the shuffle-based operators). Groups with zero non-null
    values are omitted (SQL would emit a NULL-quantile row).

    ``weight_col`` (non-negative int64, nulls raise) switches to the
    WEIGHTED rank rule — the grouped form of
    ``exact_quantiles_disc(weight_col=...)``: histograms sum weights,
    ranks target max(ceil(q * group_weight), 1), zero-total-weight
    groups are omitted. Same passes either way."""
    from ray.data.aggregate import Sum

    if not 1 <= digit_bits <= 32:
        raise ValueError("digit_bits must be in [1, 32]")
    if not qs:
        return {}
    if any(q < 0.0 or q > 1.0 for q in qs):
        raise ValueError("quantiles must be in [0, 1]")
    mask = np.uint64((1 << digit_bits) - 1)

    def valid(tbl: pa.Table) -> pa.Table:
        m = pc.and_(pc.is_valid(tbl.column(col)), pc.is_valid(tbl.column(group)))
        return tbl.filter(m) if pc.any(pc.invert(m)).as_py() else tbl

    def col_u64(tbl: pa.Table) -> np.ndarray:
        x = tbl.column(col)
        if not tbl.num_rows:
            return np.empty(0, dtype=np.uint64)
        return x.to_numpy(zero_copy_only=False).astype(np.int64).view(np.uint64) ^ _SIGN

    def col_wt(tbl: pa.Table) -> "np.ndarray | None":
        if weight_col is None:
            return None
        wc = tbl.column(weight_col)
        if wc.null_count:
            raise ValueError("exact_group_quantiles_disc: null weights")
        wt = wc.to_numpy(zero_copy_only=False).astype(np.int64)
        if (wt < 0).any():
            raise ValueError("exact_group_quantiles_disc: negative weights")
        return wt

    # pass 0: per-(block, group) (min, max, n) rows -> per-group bounds
    def minmax(tbl: pa.Table) -> pa.Table:
        tbl = valid(tbl)
        if not tbl.num_rows:
            return pa.table({"g": pa.array([], pa.string()), "lo": pa.array([], pa.uint64()),
                             "hi": pa.array([], pa.uint64()), "n": pa.array([], pa.int64())})
        u = col_u64(tbl)
        codes, uniq = tbl.column(group).to_pandas().factorize(use_na_sentinel=False)
        order = np.argsort(codes, kind="stable")
        bounds = np.searchsorted(codes[order], np.arange(len(uniq)))
        su = u[order]
        lo = np.minimum.reduceat(su, bounds)
        hi = np.maximum.reduceat(su, bounds)
        wt = col_wt(tbl)
        if wt is None:
            n = np.diff(np.append(bounds, len(su)))
        else:
            n = np.add.reduceat(wt[order], bounds)
        return pa.table({"g": pa.array([str(v) for v in uniq], pa.string()),
                         "lo": pa.array(lo, pa.uint64()),
                         "hi": pa.array(hi, pa.uint64()),
                         "n": pa.array(n, pa.int64())})

    rows = ds.map_batches(minmax, batch_format="pyarrow", zero_copy_batch=True).take_all()
    if not rows:
        return {}
    agg: "dict[str, list]" = {}
    for r in rows:
        e = agg.setdefault(r["g"], [r["lo"], r["hi"], 0])
        e[0] = min(e[0], r["lo"])
        e[1] = max(e[1], r["hi"])
        e[2] += r["n"]
    if weight_col is not None:  # zero-total-weight groups have no quantile
        agg = {g: e for g, e in agg.items() if e[2] > 0}
        if not agg:
            return {}
    if len(agg) > max_groups:
        raise ValueError(
            f"exact_group_quantiles_disc: {len(agg)} groups > max_groups={max_groups}"
            " — use the shuffle-based grouped operators for high-cardinality keys"
        )
    groups = sorted(agg)  # stringified group values, sorted = index space
    garr = pa.array(groups, pa.string())
    base = np.uint64(min(e[0] for e in agg.values()))
    rng = int(max(e[1] for e in agg.values())) - int(base)
    # (group_idx, q) -> (tracked prefix of w, local 0-based rank)
    state = [
        (gi, max(math.ceil(q * agg[g][2]) - 1, 0), np.uint64(0))
        for gi, g in enumerate(groups)
        for q in qs
    ]
    if rng == 0:
        vals = {g: [int(np.int64(np.uint64(agg[g][0]) ^ _SIGN))] * len(qs) for g in groups}
        return vals
    rounds = math.ceil(rng.bit_length() / digit_bits)
    width = rounds * digit_bits

    def histogram(pairs: np.ndarray, shift: int) -> "dict[int, np.ndarray]":
        """pairs: sorted uint64 composites (group_idx << prefix_bits) |
        prefix, where prefix_bits = width - shift - digit_bits."""
        P = pairs
        sh = np.uint64(shift)
        pref_bits = width - shift - digit_bits  # bits of the tracked prefix

        def partial(tbl: pa.Table) -> pa.Table:
            tbl = valid(tbl)
            empty = pa.table(
                {"key": pa.array([], pa.int64()), "cnt": pa.array([], pa.int64())}
            )
            if not tbl.num_rows:
                return empty
            u = col_u64(tbl)
            w = u - base
            g = pc.index_in(pc.cast(tbl.column(group), pa.string()), value_set=garr)
            g = g.to_numpy(zero_copy_only=False).astype(np.uint64)
            if pref_bits:
                comp = (g << np.uint64(pref_bits)) | (w >> np.uint64(shift + digit_bits))
            else:
                comp = g
            idx = np.searchsorted(P, comp)
            ok = (idx < len(P)) & (P[np.minimum(idx, len(P) - 1)] == comp)
            if not ok.any():
                return empty
            dig = (w[ok] >> sh) & mask
            key = (idx[ok].astype(np.int64) << digit_bits) | dig.astype(np.int64)
            wt = col_wt(tbl)
            if wt is None:
                ub, uc = np.unique(key, return_counts=True)
            else:  # exact integer weight sums per key
                ws = wt[ok]
                order2 = np.argsort(key, kind="stable")
                ks, ws = key[order2], ws[order2]
                b2 = np.flatnonzero(np.r_[True, ks[1:] != ks[:-1]])
                ub, uc = ks[b2], np.add.reduceat(ws, b2)
            return pa.table(
                {"key": pa.array(ub, pa.int64()), "cnt": pa.array(uc, pa.int64())}
            )

        merged = (
            ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("key")
            .aggregate(Sum("cnt", alias_name="cnt"))
            .take_all()
        )
        out: dict[int, np.ndarray] = {}
        for r in merged:
            i, d = divmod(int(r["key"]), 1 << digit_bits)
            out.setdefault(i, np.zeros(1 << digit_bits, dtype=np.int64))[d] = r["cnt"]
        return out

    pairs = np.unique(np.array([gi for gi, _, _ in state], dtype=np.uint64))
    for rnd in range(rounds):
        shift = width - digit_bits * (rnd + 1)
        hists = histogram(pairs, shift)
        pref_bits = width - shift - digit_bits
        nxt = []
        for gi, k, pref in state:
            comp = (np.uint64(gi) << np.uint64(pref_bits)) | pref if pref_bits else np.uint64(gi)
            i = int(np.searchsorted(pairs, comp))
            cum = np.cumsum(hists[i])
            j = int(np.searchsorted(cum, k + 1))
            before = int(cum[j - 1]) if j else 0
            nxt.append((gi, k - before, (pref << np.uint64(digit_bits)) | np.uint64(j)))
        state = nxt
        nb = width - shift  # prefix bits after this round
        pairs = np.unique(np.array(
            [(np.uint64(gi) << np.uint64(nb)) | p for gi, _, p in state], dtype=np.uint64
        ))

    out: "dict[object, list[int]]" = {g: [] for g in groups}
    for (gi, _, p), _q in zip(state, [q for _ in groups for q in qs]):
        out[groups[gi]].append(int(np.int64((p + base) ^ _SIGN)))
    return out


def trimmed_stats(
    ds: rd.Dataset,
    col: str,
    q_lo: float = 0.05,
    q_hi: float = 0.95,
) -> "pa.Table":
    """Robust central-tendency profile of int64 ``col``: the exact
    ``[quantile_disc(q_lo), quantile_disc(q_hi)]`` band from radix
    selection, then ONE more scan reduces each block to an integer
    (count, sum) partial over the in-band rows — the trimmed mean
    outlier-robust aggregate (corpus length/score QA without a sort and
    without hand-tuned cutoffs). Returns a 1-row table
    ``(lo, hi, n_kept, sum_val, mean_val)``; sums are exact int64 so
    shard order can't perturb the mean (``float(sum)/float(n)`` is one
    deterministic double division)."""
    lo, hi = exact_quantiles_disc(ds, col, [q_lo, q_hi])

    def partial(tbl: pa.Table) -> pa.Table:
        v = tbl.column(col).to_numpy(zero_copy_only=False)
        v = v[~pd.isna(v)].astype(np.int64)
        v = v[(v >= lo) & (v <= hi)]
        return pa.table(
            {"n": pa.array([len(v)], pa.int64()), "s": pa.array([int(v.sum())], pa.int64())}
        )

    agg = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True).sum(
        ["n", "s"]
    )
    n, s = int(agg["sum(n)"]), int(agg["sum(s)"])
    return pa.table(
        {
            "lo": pa.array([lo], pa.int64()),
            "hi": pa.array([hi], pa.int64()),
            "n_kept": pa.array([n], pa.int64()),
            "sum_val": pa.array([s], pa.int64()),
            "mean_val": pa.array([float(s) / float(n) if n else None], pa.float64()),
        }
    )


def iqr_outlier_filter(
    ds: rd.Dataset,
    col: str,
    group: str,
    k: float = 1.5,
    digit_bits: int = 16,
    max_groups: int = 4096,
) -> rd.Dataset:
    """Per-GROUP Tukey-fence outlier filter: keep rows whose ``col``
    lies in ``[q1 - k*IQR, q3 + k*IQR]`` of THEIR group — the
    data-derived robust counterpart of a hand-tuned per-source length
    cutoff (quantile_band_filter's bounds are global and
    bin-resolution; these are per-group and exact). Rows whose group
    has no non-null values, and null ``col`` rows, drop (SQL inner-join
    + WHERE semantics).

    Scale shape: the per-group q1/q3 come from grouped radix selection
    (``exact_group_quantiles_disc`` — all groups and both quantiles
    ride the same 2-5 column-pruned scans, ZERO row exchange), the
    fence table is broadcast via ``ray.put``, and ONE filter scan
    finishes; same ``max_groups`` low-cardinality contract. Fences are
    computed as ``q1 - k*(q3-q1)`` in float64 — the identical
    expression an SQL oracle writes, so boundary rows agree bitwise."""
    import ray

    gq = exact_group_quantiles_disc(
        ds, col, group, [0.25, 0.75], digit_bits=digit_bits, max_groups=max_groups
    )
    keys = sorted(gq.keys())
    los = np.array([gq[g][0] - k * (gq[g][1] - gq[g][0]) for g in keys], np.float64)
    his = np.array([gq[g][1] + k * (gq[g][1] - gq[g][0]) for g in keys], np.float64)
    fences_ref = ray.put((keys, los, his))

    def keep(tbl: pa.Table) -> pa.Table:
        f_keys, f_lo, f_hi = ray.get(fences_ref)
        g = tbl.column(group).to_pandas().to_numpy()
        codes = pd.Categorical(g, categories=f_keys).codes  # -1: unseen group
        v = tbl.column(col).to_numpy(zero_copy_only=False)
        cc = np.clip(codes, 0, max(len(f_keys) - 1, 0))
        ok = (codes >= 0) & (v >= f_lo[cc]) & (v <= f_hi[cc])  # NaN compares False
        return tbl.filter(pa.array(ok))

    return ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)


def winsorized_stats_per_group(
    ds: rd.Dataset,
    col: str,
    group: str,
    q_lo: float = 0.05,
    q_hi: float = 0.95,
    digit_bits: int = 16,
    max_groups: int = 4096,
) -> rd.Dataset:
    """Per-group WINSORIZED mean of int64 ``col``: values below the
    group's exact ``quantile_disc(q_lo)`` are clamped UP to it and
    values above ``quantile_disc(q_hi)`` clamped DOWN (versus
    ``trimmed_stats``, which drops the tails — winsorizing keeps n
    constant, the robust-mean variant preferred when tail mass itself
    is informative).

    Scale shape mirrors ``iqr_outlier_filter``: per-group quantiles from
    the shared grouped radix-selection scans (zero row exchange), the
    clamp bounds broadcast once via ``ray.put``, then per-batch integer
    (n, clamped-sum) partials merge through one bucketed exchange
    bounded by distinct groups x blocks. Clamped sums stay exact int64;
    the mean is one float64 division. Null ``col`` rows and groups
    beyond the selection's tracked set drop (inner-join semantics)."""
    import ray

    from vaero_ray.stages.keyed import bucketed_keyed_sum

    gq = exact_group_quantiles_disc(
        ds, col, group, [q_lo, q_hi], digit_bits=digit_bits, max_groups=max_groups
    )
    keys = sorted(gq.keys())
    lo = np.array([gq[g][0] for g in keys], np.int64)
    hi = np.array([gq[g][1] for g in keys], np.int64)
    bounds_ref = ray.put((keys, lo, hi))

    def partial(tbl: "pa.Table") -> pd.DataFrame:
        df = tbl.select([group, col]).to_pandas()  # column-pruned conversion
        b_keys, b_lo, b_hi = ray.get(bounds_ref)
        codes = pd.Categorical(df[group], categories=b_keys).codes
        v = df[col].to_numpy()
        ok = (codes >= 0) & ~pd.isna(v)
        codes = codes[ok].astype(np.int64)
        w = np.clip(
            v[ok].astype(np.int64),
            np.asarray(b_lo)[codes],
            np.asarray(b_hi)[codes],
        )
        out = pd.DataFrame({group: np.asarray(b_keys, dtype=object)[codes], "w": w})
        g = out.groupby(group, sort=False, as_index=False).agg(
            n_rows=("w", "size"), sum_w=("w", "sum")
        )
        return g

    parts = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    merged = bucketed_keyed_sum(parts, [group], ["n_rows", "sum_w"])

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        b_keys, b_lo, b_hi = ray.get(bounds_ref)
        codes = pd.Categorical(df[group], categories=b_keys).codes.astype(np.int64)
        df["lo"] = np.asarray(b_lo)[codes]
        df["hi"] = np.asarray(b_hi)[codes]
        df["mean_w"] = df["sum_w"].to_numpy(np.float64) / df["n_rows"].to_numpy(np.float64)
        return df[[group, "lo", "hi", "n_rows", "sum_w", "mean_w"]]

    return merged.map_batches(finalize, batch_format="pandas")


def _block_pareto(tbl: pa.Table, x_col: str, y_col: str) -> pa.Table:
    """Non-dominated rows of one block under componentwise-maximize
    order: keep row r iff no row s has s.x >= r.x AND s.y >= r.y with at
    least one strict (exact duplicates of a frontier point are all
    kept — nothing strictly improves on them). Vectorized: sort by
    (x desc, y desc); a row is dominated iff the max y among strictly
    greater x reaches its y, or a same-x row has strictly greater y."""
    if not tbl.num_rows:
        return tbl
    x = np.asarray(tbl.column(x_col).to_numpy(zero_copy_only=False), dtype=np.int64)
    y = np.asarray(tbl.column(y_col).to_numpy(zero_copy_only=False), dtype=np.int64)
    order = np.lexsort((-y, -x))
    xs, ys = x[order], y[order]
    grp_start = np.r_[True, xs[1:] != xs[:-1]]
    gidx = np.cumsum(grp_start) - 1  # x-group index per row
    top_y = ys[grp_start]  # each x-group's max y (y desc within group)
    prev_max = np.r_[np.int64(np.iinfo(np.int64).min), np.maximum.accumulate(top_y)[:-1]]
    dominated = (prev_max[gidx] >= ys) | (ys < top_y[gidx])
    return tbl.take(pa.array(order[~dominated]))


def pareto_frontier(ds: rd.Dataset, x_col: str, y_col: str) -> rd.Dataset:
    """Distributed Pareto frontier (skyline) maximizing two int64
    metrics: the rows no other row weakly dominates with a strict
    improvement. The operator's combiner property makes it
    embarrassingly distributable — ``pareto(pareto(A) ∪ pareto(B)) ==
    pareto(A ∪ B)`` — so each block is pruned to its LOCAL frontier
    first and only frontier candidates ride the one repartition into
    the final single-task resolve. Partitioning assumption: the union
    of per-block frontiers fits one task (frontiers are tiny for any
    correlated metrics; worst case is a fully anti-correlated dataset,
    where no skyline algorithm compresses). Ties kept SQL-style:
    duplicate points on the frontier all survive (NOT EXISTS
    dominance), so output matches the relational oracle exactly."""
    local = ds.map_batches(
        lambda t: _block_pareto(t, x_col, y_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return local.repartition(1).map_batches(
        lambda t: _block_pareto(t, x_col, y_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=None,
    )
