"""Distributed numerical statistics over integer-scaled columns.

Every operator here follows the engine's exact-aggregate convention
(see relational.grouped_moments): the DISTRIBUTED part moves only
mergeable integer sums (order- and shard-independent, hash-exact), and
any float statistic is derived at the very end by ONE closed-form
float64 expression — the identical expression a SQL oracle writes over
the same integers, so 6-dp rounded results are engine-independent.

Scale shapes
------------
- ``corr_matrix``: one row of ``k + k*(k+1)/2 + 1`` int64 partials per
  BLOCK (a numpy ``X.T @ X`` per batch), merged by one tiny ``Dataset.sum``
  — zero row exchange, any number of columns in one pass.
- ``regression_per_group`` / ``entropy_per_group``: per-batch partial
  collapse, then ONE hash-bucket exchange bounded by distinct keys
  (x categories for entropy) x blocks.
- ``gini_per_group`` / ``rank_sum_test``: DISTINCT-VALUE COMPRESSION —
  the rank-weighted sums both need a global sorted order, but every
  tie-block contributes a closed form of (value, count, cumulative
  start), so the exchange carries one row per distinct (key, value)
  instead of per input row. The per-key fold is then a vectorized sort
  + cumsum over the compressed rows (contract: distinct values per key
  bounded — lengths, cents, scores — NOT free-form doubles).

Int64 headroom is the caller's contract, as in grouped_moments: scale
inputs so ``n * max|x*y|`` fits (documented per gate).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from vaero_ray.stages.keyed import bucketed_keyed_sum, bucketed_map_groups

__all__ = [
    "corr_matrix",
    "regression_per_group",
    "entropy_per_group",
    "entropy_from_counts",
    "simpson_per_group",
    "gini_per_group",
    "rank_sum_test",
    "kruskal_rank_ingredients",
    "jsd_two_sample",
    "siegel_slope_e6",
    "hodges_lehmann_shift",
    "mood_median_test",
    "kendall_tau_from_pairs",
    "ordinal_association_from_pairs",
    "cliffs_delta",
    "anova_oneway",
    "welch_t_test",
    "shape_per_group",
    "brown_forsythe",
    "jonckheere_trend",
    "emd_two_sample",
    "paired_halves_kappa",
]


def corr_matrix(ds: rd.Dataset, cols: "list[str]") -> pa.Table:
    """Pairwise Pearson correlation matrix over k INTEGER columns in ONE
    pass: each block reduces to a single partial row holding ``n``, the
    k column sums and the upper triangle of the exact int64 Gram matrix
    ``X.T @ X`` (one numpy matmul per batch — all k*(k+1)/2 cross
    moments at once, no per-pair scans); ``Dataset.sum`` merges the
    partials driver-side (k*(k+3)/2+1 scalars, no shuffle). Returns one
    row per unordered pair ``(col_x, col_y)`` with the exact integer
    moments plus the 6-dp closed-form ``corr_xy`` (NULL when either
    variance is zero, SQL semantics).

    Caller scales inputs so ``n * max|x_i * x_j|`` fits int64."""
    k = len(cols)
    iu = np.triu_indices(k)
    gcols = [f"g_{i}_{j}" for i, j in zip(*iu)]
    scols = [f"s_{i}" for i in range(k)]

    def partial(tbl: pa.Table) -> pa.Table:
        x = np.empty((tbl.num_rows, k), np.int64)
        for i, c in enumerate(cols):
            x[:, i] = tbl.column(c).to_numpy(zero_copy_only=False).astype(np.int64)
        gram = x.T @ x
        out = {"n": pa.array([tbl.num_rows], pa.int64())}
        sums = x.sum(axis=0)
        for i in range(k):
            out[scols[i]] = pa.array([int(sums[i])], pa.int64())
        for name, i, j in zip(gcols, *iu):
            out[name] = pa.array([int(gram[i, j])], pa.int64())
        return pa.table(out)

    agg = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True).sum(
        ["n", *scols, *gcols]
    )
    n = int(agg["sum(n)"])
    s = {i: int(agg[f"sum(s_{i})"]) for i in range(k)}
    g = {(i, j): int(agg[f"sum(g_{i}_{j})"]) for i, j in zip(*iu)}

    rows = {c: [] for c in (
        "col_x", "col_y", "n_rows", "sum_x", "sum_y", "sum_xx", "sum_yy", "sum_xy", "corr_xy"
    )}
    for i in range(k):
        for j in range(i + 1, k):
            num = float(n) * g[(i, j)] - float(s[i]) * s[j]
            den2 = (float(n) * g[(i, i)] - float(s[i]) * s[i]) * (
                float(n) * g[(j, j)] - float(s[j]) * s[j]
            )
            rows["col_x"].append(cols[i])
            rows["col_y"].append(cols[j])
            rows["n_rows"].append(n)
            rows["sum_x"].append(s[i])
            rows["sum_y"].append(s[j])
            rows["sum_xx"].append(g[(i, i)])
            rows["sum_yy"].append(g[(j, j)])
            rows["sum_xy"].append(g[(i, j)])
            rows["corr_xy"].append(round(num / math.sqrt(den2), 6) if den2 > 0 else None)
    return pa.table(
        {
            "col_x": pa.array(rows["col_x"], pa.string()),
            "col_y": pa.array(rows["col_y"], pa.string()),
            "n_rows": pa.array(rows["n_rows"], pa.int64()),
            "sum_x": pa.array(rows["sum_x"], pa.int64()),
            "sum_y": pa.array(rows["sum_y"], pa.int64()),
            "sum_xx": pa.array(rows["sum_xx"], pa.int64()),
            "sum_yy": pa.array(rows["sum_yy"], pa.int64()),
            "sum_xy": pa.array(rows["sum_xy"], pa.int64()),
            "corr_xy": pa.array(rows["corr_xy"], pa.float64()),
        }
    )



def _cell_counts_arrow(ds: rd.Dataset, keys: "list[str]",
                       drop_null_keys: bool, out_name: str = "c") -> rd.Dataset:
    """Per-block exact cell counts, Arrow-native: zero-copy block input,
    column-pruned, one hash-groupby kernel (`pa.Table.group_by`) — the
    full scan never converts to pandas; only the tiny (keys, count)
    cells leave the block. ``drop_null_keys`` mirrors pandas' groupby
    ``dropna`` (Arrow groups nulls; pandas drops them by default)."""

    def partial(tbl: pa.Table) -> pa.Table:
        t = tbl.select(keys)
        if drop_null_keys:
            t = t.drop_null()
        out = t.group_by(keys, use_threads=False).aggregate([([], "count_all")])
        return out.rename_columns(keys + [out_name])

    return ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)


def regression_per_group(ds: rd.Dataset, key: str, x_col: str, y_col: str) -> rd.Dataset:
    """Per-key simple OLS of INTEGER ``y`` on INTEGER ``x`` — slope,
    intercept and r² derived in closed form from grouped_moments' exact
    mergeable integer sums:

        slope     = (n*sxy - sx*sy) / (n*sxx - sx^2)
        intercept = (sy - slope_raw * sx) / n          (raw slope, THEN round)
        r2        = (n*sxy - sx*sy)^2 / ((n*sxx - sx^2)*(n*syy - sy^2))

    Deliberately NOT DuckDB's ``regr_slope`` (whose streaming covariance
    accumulates differently): the oracle writes these exact expressions
    over the same integer sums, so 6-dp results match bitwise.
    Zero-x-variance groups emit NULLs. Same int64-headroom contract."""
    from vaero_ray.stages.relational import grouped_moments

    moments = grouped_moments(ds, key, x_col, y_col)

    def finalize(tbl: pa.Table) -> pa.Table:
        n = tbl.column("n_rows").to_numpy(zero_copy_only=False).astype(np.float64)
        sx = tbl.column("sum_x").to_numpy(zero_copy_only=False).astype(np.float64)
        sy = tbl.column("sum_y").to_numpy(zero_copy_only=False).astype(np.float64)
        sxx = tbl.column("sum_xx").to_numpy(zero_copy_only=False).astype(np.float64)
        syy = tbl.column("sum_yy").to_numpy(zero_copy_only=False).astype(np.float64)
        sxy = tbl.column("sum_xy").to_numpy(zero_copy_only=False).astype(np.float64)
        num = n * sxy - sx * sy
        dx = n * sxx - sx * sx
        dy = n * syy - sy * sy
        ok = dx > 0
        with np.errstate(divide="ignore", invalid="ignore"):
            slope = num / dx
            intercept = (sy - slope * sx) / n
            r2 = np.where((dx > 0) & (dy > 0), (num * num) / (dx * dy), np.nan)
        mk = lambda v, cond: pa.array(  # noqa: E731
            [round(float(x), 6) if c else None for x, c in zip(v, cond)], pa.float64()
        )
        return pa.table(
            {
                key: tbl.column(key),
                "n_rows": tbl.column("n_rows"),
                "slope": mk(slope, ok),
                "intercept": mk(intercept, ok),
                "r2": mk(r2, ok & (dy > 0)),
            }
        )

    return moments.map_batches(finalize, batch_format="pyarrow", zero_copy_batch=True)


def entropy_per_group(ds: rd.Dataset, key: str, cat_col: str) -> rd.Dataset:
    """Shannon entropy (nats) of the ``cat_col`` distribution per ``key``:
    H = ln(n) - sum(c * ln c) / n over the exact category counts.

    Two-phase: per-batch (key, cat) count partials, one bucketed exchange
    merging them (bounded by distinct (key, cat) x blocks), then a
    second bucketed fold per key — counts stay exact integers end to
    end; only the final H is float (6-dp, the identical ln expression
    the oracle writes). Single-category keys emit 0.0."""

    counts = _cell_counts_arrow(ds, [key, cat_col], drop_null_keys=False)
    merged = bucketed_keyed_sum(counts, [key, cat_col], ["c"])
    return entropy_from_counts(merged, key)


def entropy_from_counts(merged: rd.Dataset, key: str, c_col: str = "c") -> rd.Dataset:
    """Entropy finalize over ALREADY-MERGED exact (key, category, count)
    rows — the back half of :func:`entropy_per_group`, exposed so
    committed STREAMING window counts (mergeable aggregates through the
    exactly-once job) feed the identical fold: counts are windowed
    aggregates; entropy is a downstream finalize."""

    def per_key(df: pd.DataFrame) -> pd.DataFrame:
        c = df[c_col].to_numpy(np.float64)
        clogc = pd.Series(c * np.log(c), index=df.index)
        out = pd.DataFrame(
            {
                key: df[key],
                "n_rows": df[c_col],
                "__h": clogc,
            }
        )
        agg = out.groupby(key, sort=False, dropna=False, as_index=False).agg(
            n_rows=("n_rows", "sum"), n_cats=("n_rows", "size"), __h=("__h", "sum")
        )
        nn = agg["n_rows"].to_numpy(np.float64)
        agg["entropy"] = np.round(np.log(nn) - agg["__h"].to_numpy(np.float64) / nn, 6)
        return agg.drop(columns="__h")

    return bucketed_map_groups(merged, key, per_key)


def _compressed_counts(ds: rd.Dataset, key: str, val_col: str) -> rd.Dataset:
    """Distinct-value compression: exact counts per (key, value) — the
    shared front half of gini_per_group / rank_sum_test."""

    counts = _cell_counts_arrow(ds, [key, val_col], drop_null_keys=True)
    return bucketed_keyed_sum(counts, [key, val_col], ["c"])


DEFAULT_MAX_DISTINCT = 4_000_000


def _finalize_compressed(merged: rd.Dataset, what: str,
                         max_distinct: int = DEFAULT_MAX_DISTINCT) -> pd.DataFrame:
    """Guarded driver-side materialization of a distinct-value-compressed
    exchange. The compression contract — one row per distinct (key,
    value) cell, bounded value domain — is COUNTED before collecting,
    not assumed: a high-cardinality continuous column (raw micros,
    float scores) would otherwise silently pull tens of millions of
    rows onto the driver. Same guard pattern as
    ranking.global_percent_rank; the count rides the already-merged
    exchange, so it costs one metadata pass on the materialized blocks.
    """
    mat = merged.materialize()
    n = mat.count()
    if n > max_distinct:
        raise ValueError(
            f"{what}: {n} compressed (key, value) rows exceed "
            f"max_distinct={max_distinct}; the distinct-value-compression "
            "contract (bounded value domain) does not hold for this column "
            "— bin it first (length_equidepth_bins / fixed-width bucketing) "
            "or raise max_distinct explicitly"
        )
    return mat.to_pandas()



def _two_group_cells(ds: rd.Dataset, val_col: str, group_col: str,
                     g1: str, g2: str) -> rd.Dataset:
    """Per-block (value, c1, c2) cells for the two-sample family,
    Arrow-native: column-pruned zero-copy input, `is_in` filter + one
    hash-groupby kernel per block; only the tiny distinct-value cell
    table is pivoted in pandas."""
    import pyarrow.compute as pc

    def partial(tbl: pa.Table) -> pa.Table:
        t = tbl.select([val_col, group_col])
        t = t.filter(pc.is_in(t.column(group_col), value_set=pa.array([g1, g2])))
        cells = t.group_by([val_col, group_col], use_threads=False).aggregate(
            [([], "count_all")]
        ).to_pandas()
        out = pd.DataFrame(
            {
                val_col: cells[val_col],
                "c1": np.where(cells[group_col] == g1, cells["count_all"], 0).astype(np.int64),
                "c2": np.where(cells[group_col] == g2, cells["count_all"], 0).astype(np.int64),
            }
        )
        out = out.groupby(val_col, sort=False, as_index=False)[["c1", "c2"]].sum()
        return pa.Table.from_pandas(out, preserve_index=False)

    return ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)


def gini_per_group(ds: rd.Dataset, key: str, val_col: str) -> rd.Dataset:
    """Exact Gini coefficient of non-negative INTEGER ``val_col`` per
    ``key`` without a row sort: with 1-based ascending positions i,
    ``gini = sum((2i - n - 1) * x_i) / (n * sum(x))`` — tie-invariant
    (equal values commute), so it collapses under distinct-value
    compression: a tie-block of value v, count c, starting after
    ``start`` rows contributes ``v * c * (2*start + c - n)``. The
    exchange carries one exact (key, value, count) row per distinct
    value; the per-key fold is one vectorized sort + cumsum over the
    compressed rows. Emits the exact int64 numerator plus the one
    float64 division (6-dp) — hash-stable across shard orders."""
    merged = _compressed_counts(ds, key, val_col)

    def per_key(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key, val_col], kind="stable")
        if not len(df):
            return pd.DataFrame(
                {key: [], "n_rows": [], "sum_val": [], "gini_num": [], "gini": []}
            )
        v = df[val_col].to_numpy(np.int64)
        c = df["c"].to_numpy(np.int64)
        codes, _ = pd.factorize(df[key], use_na_sentinel=False)  # nondecreasing
        # rows before each tie-block WITHIN its key: global exclusive
        # cumsum minus the key segment's opening value
        excl = np.cumsum(c) - c
        seg_first = np.r_[True, codes[1:] != codes[:-1]]
        first_idx = np.maximum.accumulate(np.where(seg_first, np.arange(len(c)), 0))
        start = excl - excl[first_idx]
        g = pd.DataFrame({key: df[key].to_numpy(), "c": c})
        n_per = g.groupby(key, sort=False)["c"].transform("sum").to_numpy(np.int64)
        g["sv"] = v * c
        g["term"] = v * c * (2 * start + c - n_per)
        agg = g.groupby(key, sort=False, as_index=False).agg(
            n_rows=("c", "sum"), sum_val=("sv", "sum"), gini_num=("term", "sum")
        )
        den = agg["n_rows"].to_numpy(np.float64) * agg["sum_val"].to_numpy(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            agg["gini"] = np.where(
                den > 0, np.round(agg["gini_num"].to_numpy(np.float64) / den, 6), np.nan
            )
        agg["gini"] = agg["gini"].astype(object).where(den > 0, None)
        return agg

    return bucketed_map_groups(merged, key, per_key)


def rank_sum_test(
    ds: rd.Dataset, val_col: str, group_col: str, g1: str, g2: str,
    max_distinct: int = DEFAULT_MAX_DISTINCT,
) -> pa.Table:
    """Mann-Whitney rank-sum between two groups, exact with ties:
    average-rank doubling keeps everything integer — a tie-block of
    total count c whose min 1-based rank is ``start+1`` has
    ``2 * avg_rank = 2*start + c + 1``, so ``two_r1 = sum over group-1
    rows of (2*start + c + 1)`` and ``two_u1 = two_r1 - n1*(n1+1)``.
    Distinct-value compression again: the exchange carries one exact
    (value, c1, c2) row per distinct value; the global fold is a single
    small sort + cumsum (contract: bounded value domain). Returns a
    1-row table (n1, n2, two_r1, two_u1) — all exact int64."""

    parts = _two_group_cells(ds, val_col, group_col, g1, g2)
    merged = bucketed_keyed_sum(parts, [val_col], ["c1", "c2"])
    # compressed table: one row per distinct value — small by contract
    comp = _finalize_compressed(merged, "rank_sum_test", max_distinct).sort_values(val_col, kind="stable")
    c1 = comp["c1"].to_numpy(np.int64)
    c2 = comp["c2"].to_numpy(np.int64)
    c = c1 + c2
    start = np.cumsum(c) - c
    two_r1 = int(np.sum(c1 * (2 * start + c + 1)))
    n1, n2 = int(c1.sum()), int(c2.sum())
    return pa.table(
        {
            "n1": pa.array([n1], pa.int64()),
            "n2": pa.array([n2], pa.int64()),
            "two_r1": pa.array([two_r1], pa.int64()),
            "two_u1": pa.array([two_r1 - n1 * (n1 + 1)], pa.int64()),
        }
    )


def simpson_per_group(ds: rd.Dataset, key: str, cat_col: str) -> rd.Dataset:
    """Simpson concentration index of the ``cat_col`` distribution per
    ``key`` — the probability two rows drawn WITHOUT replacement share a
    category: ``D = sum(c*(c-1)) / (n*(n-1))`` — entropy's fully-INTEGER
    sibling (the numerator never touches float, so the exchange and the
    emitted ``simpson_num`` are exact; ``simpson`` itself is one
    deterministic division). Same two bounded exchanges as
    :func:`entropy_per_group`; keys with n < 2 emit NULL."""

    counts = _cell_counts_arrow(ds, [key, cat_col], drop_null_keys=False)
    merged = bucketed_keyed_sum(counts, [key, cat_col], ["c"])

    def per_key(df: pd.DataFrame) -> pd.DataFrame:
        c = df["c"].to_numpy(np.int64)
        out = pd.DataFrame({key: df[key], "n_rows": c, "__num": c * (c - 1)})
        agg = out.groupby(key, sort=False, dropna=False, as_index=False).agg(
            n_rows=("n_rows", "sum"), n_cats=("n_rows", "size"), simpson_num=("__num", "sum")
        )
        n = agg["n_rows"].to_numpy(np.float64)
        num = agg["simpson_num"].to_numpy(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            d = num / (n * (n - 1.0))
        agg["simpson"] = [
            float(x) if nn >= 2 else None for x, nn in zip(d, agg["n_rows"])
        ]
        return agg

    return bucketed_map_groups(merged, key, per_key)


def lag_autocorr_per_group(
    merged: rd.Dataset, key: str, ord_col: str, val_col: str
) -> rd.Dataset:
    """Lag-1 autocorrelation of an already-merged EXACT integer series
    per key (e.g. hourly event counts): Pearson corr of consecutive
    observed points in ``ord_col`` rank order — the seasonality /
    burstiness probe of a metric stream. Pairs form over OBSERVED
    points (SQL LAG semantics; gaps in ``ord_col`` don't densify).

    Input is the engine's standard merged-counts shape (one row per
    (key, ord) — bounded by series length x keys, never raw rows), so
    the per-key fold is a tiny vectorized pass: sort, same-key shift
    mask, exact int64 pair moments, one closed-form 6-dp float —
    identical expression to the SQL twin. Int64 contract: n_pairs *
    max(x*y) per key must fit (counts: always)."""

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key, ord_col], kind="mergesort").reset_index(drop=True)
        v = df[val_col].to_numpy().astype(np.int64)
        codes = pd.factorize(df[key], use_na_sentinel=False)[0]
        same = np.r_[False, codes[1:] == codes[:-1]]
        xp = np.roll(v, 1)[same]  # lagged value
        x = v[same]
        sub = pd.DataFrame(
            {
                key: df[key].to_numpy()[same],
                "n_pairs": np.ones(len(x), np.int64),
                "sum_x": xp, "sum_y": x,
                "sum_xx": xp * xp, "sum_yy": x * x, "sum_xy": xp * x,
            }
        )
        g = sub.groupby(key, sort=False, as_index=False, dropna=False).sum()

        nf = g["n_pairs"].to_numpy().astype(np.float64)
        sx = g["sum_x"].to_numpy().astype(np.float64)
        sy = g["sum_y"].to_numpy().astype(np.float64)
        vx = nf * g["sum_xx"].to_numpy() - sx * g["sum_x"].to_numpy()
        vy = nf * g["sum_yy"].to_numpy() - sy * g["sum_y"].to_numpy()
        num = nf * g["sum_xy"].to_numpy() - sx * g["sum_y"].to_numpy()
        den2 = vx * vy
        with np.errstate(invalid="ignore", divide="ignore"):
            r = np.round(num / np.sqrt(den2), 6)
        g["autocorr"] = np.where(den2 > 0, r, np.nan)
        g.loc[den2 <= 0, "autocorr"] = None
        for c in ("n_pairs", "sum_x", "sum_y", "sum_xx", "sum_yy", "sum_xy"):
            g[c] = g[c].astype("int64")
        return g

    return bucketed_map_groups(merged, key, per_bucket, num_buckets=4)


def cusum_peak_per_group(
    merged: rd.Dataset, key: str, ord_col: str, val_col: str
) -> rd.Dataset:
    """CUSUM change-point peak per key over an already-merged EXACT
    integer series: the ``ord`` where the scaled cumulative deviation
    ``|n * prefix_k - k * total|`` (the mean-free CUSUM times n — kept
    in int64 so there is NO float anywhere) is largest, ties broken by
    smallest ``ord``. The classic level-shift detector: the peak ord is
    the most likely change point, the peak value its evidence.

    All-numpy per bucket (segmented cumsum via offset subtraction,
    reduceat totals, lexsort argmax) — no per-key Python. Output one
    row per key: ``(key, n_points, total, peak_dev, peak_<ord>)``.
    Int64 contract: n_points * total per key < 2^62 (guarded)."""

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key, ord_col], kind="mergesort").reset_index(drop=True)
        n = len(df)
        if not n:
            return pd.DataFrame(
                {key: df[key], "n_points": [], "total": [], "peak_dev": [], "peak_ord": []}
            )
        v = df[val_col].to_numpy().astype(np.int64)
        o = df[ord_col].to_numpy().astype(np.int64)
        codes = pd.factorize(df[key], use_na_sentinel=False)[0]
        gs = np.r_[True, codes[1:] != codes[:-1]]
        starts = np.flatnonzero(gs)
        gid = np.cumsum(gs) - 1
        csum = np.cumsum(v)
        base = np.r_[0, csum[starts[1:] - 1]] if len(starts) > 1 else np.array([0])
        pref = csum - base[gid]  # per-key prefix sums
        tot = np.add.reduceat(v, starts)
        cnt = np.diff(np.r_[starts, n]).astype(np.int64)
        if int((cnt * np.abs(tot)).max(initial=0)) >= 2**62:
            raise ValueError("cusum composite overflows int64; rescale val_col")
        k = np.arange(n, dtype=np.int64) - starts[gid] + 1
        dev = np.abs(cnt[gid] * pref - k * tot[gid])
        # per-group argmax, ties -> smallest ord (= first position, rows sorted by ord)
        order = np.lexsort((np.arange(n), -dev, gid))
        first = order[np.r_[True, gid[order][1:] != gid[order][:-1]]]
        return pd.DataFrame(
            {
                key: df[key].to_numpy()[first],
                "n_points": cnt,
                "total": tot.astype(np.int64),
                "peak_dev": dev[first],
                "peak_ord": o[first],
            }
        )

    return bucketed_map_groups(merged, key, per_bucket, num_buckets=4)


def rolling_zscores_per_group(
    merged: rd.Dataset, key: str, ord_col: str, val_col: str, w: int = 24
) -> rd.Dataset:
    """Trailing-window anomaly score per point of an already-merged
    EXACT integer series: the population z-score of each value against
    the PREVIOUS ``w`` observed points (SQL ROWS BETWEEN w PRECEDING AND
    1 PRECEDING — rank space, gaps don't densify). The whole score
    derives from integer window sums — ``z = (m*x - s1) /
    sqrt(m*s2 - s1^2)`` equals (x - mean)/sd_pop exactly — so both
    engines compute ONE closed-form float from identical int64 moments
    (never a streaming STDDEV, whose accumulation order differs).

    Per-bucket fold: segmented prefix sums + two fancy-index gathers —
    no per-key Python, bounded by the merged series size (hours x keys),
    never raw rows. First point of each key has m=0 and NULL z."""

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key, ord_col], kind="mergesort").reset_index(drop=True)
        n = len(df)
        if not n:
            return pd.DataFrame(
                {key: df[key], ord_col: [], val_col: [],
                 "m": [], "s1": [], "s2": [], "z": []}
            )
        v = df[val_col].to_numpy().astype(np.int64)
        codes = pd.factorize(df[key], use_na_sentinel=False)[0]
        gs = np.r_[True, codes[1:] != codes[:-1]]
        starts = np.flatnonzero(gs)
        gid = np.cumsum(gs) - 1
        kpos = np.arange(n, dtype=np.int64) - starts[gid]  # rank within key
        pref1 = np.cumsum(v)
        pref2 = np.cumsum(v * v)
        base1 = np.r_[0, pref1[starts[1:] - 1]] if len(starts) > 1 else np.array([0])
        base2 = np.r_[0, pref2[starts[1:] - 1]] if len(starts) > 1 else np.array([0])
        p1 = pref1 - base1[gid]  # within-key inclusive prefix
        p2 = pref2 - base2[gid]
        i = np.arange(n, dtype=np.int64)
        m = np.minimum(kpos, w)
        hi1 = np.where(kpos > 0, p1[np.maximum(i - 1, 0)], 0)
        hi2 = np.where(kpos > 0, p2[np.maximum(i - 1, 0)], 0)
        lo1 = np.where(kpos > w, p1[np.maximum(i - w - 1, 0)], 0)
        lo2 = np.where(kpos > w, p2[np.maximum(i - w - 1, 0)], 0)
        s1 = hi1 - lo1
        s2 = hi2 - lo2
        mf, s1f = m.astype(np.float64), s1.astype(np.float64)
        den2 = mf * s2 - s1f * s1
        with np.errstate(invalid="ignore", divide="ignore"):
            z = np.round((mf * v - s1) / np.sqrt(den2), 6)
        out = pd.DataFrame(
            {
                key: df[key],
                ord_col: df[ord_col].to_numpy().astype(np.int64),
                val_col: v,
                "m": m, "s1": s1, "s2": s2,
                "z": z,
            }
        )
        out.loc[(m == 0) | (den2 <= 0), "z"] = None
        return out

    return bucketed_map_groups(merged, key, per_bucket, num_buckets=4)


def kendall_trend_per_group(
    merged: rd.Dataset, key: str, ord_col: str, val_col: str
) -> rd.Dataset:
    """Mann-Kendall trend test per key over an already-merged EXACT
    integer series: S = sum over ordered pairs i<j of sign(x_j - x_i)
    — the nonparametric monotone-trend statistic (robust to outliers
    and level shifts where OLS slope is not), plus tau_a = S / C(n,2)
    as a 6-dp closed form mirrored in SQL.

    Quadratic in the SERIES length by definition — bounded, because the
    input is the merged (key, ord, val) aggregate (hours x keys), never
    raw rows; the pairwise pass is CHUNKED broadcasting (<=1e7-element
    sign blocks, temps ~tens of MB) with a same-key mask, so no per-key
    Python and no O(n^2) allocation. Int64-exact S."""

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key, ord_col], kind="mergesort").reset_index(drop=True)
        n = len(df)
        if not n:
            return pd.DataFrame(
                {key: df[key], "n_points": [], "s_stat": [], "tau_a": []}
            )
        x = df[val_col].to_numpy().astype(np.int64)
        codes = pd.factorize(df[key], use_na_sentinel=False)[0].astype(np.int64)
        n_keys = int(codes[-1]) + 1
        s_per_key = np.zeros(n_keys, np.int64)
        idx = np.arange(n, dtype=np.int64)
        chunk = max(1, 10_000_000 // n)
        for lo in range(0, n, chunk):
            hi = min(lo + chunk, n)
            sgn = np.sign(x[None, :] - x[lo:hi, None]).astype(np.int64)
            mask = (codes[None, :] == codes[lo:hi, None]) & (idx[None, :] > idx[lo:hi, None])
            np.add.at(s_per_key, codes[lo:hi], (sgn * mask).sum(axis=1))
        cnt = np.bincount(codes, minlength=n_keys).astype(np.int64)
        gs = np.r_[True, codes[1:] != codes[:-1]]
        keys_out = df[key].to_numpy()[gs]
        nf = cnt.astype(np.float64)
        with np.errstate(invalid="ignore", divide="ignore"):
            tau = np.round(s_per_key / (nf * (cnt - 1) / 2), 6)
        out = pd.DataFrame(
            {key: keys_out, "n_points": cnt, "s_stat": s_per_key, "tau_a": tau}
        )
        out.loc[cnt < 2, "tau_a"] = None
        return out

    return bucketed_map_groups(merged, key, per_bucket, num_buckets=4)


def ks_two_sample(
    merged: rd.Dataset, val_col: str, c1: str = "c1", c2: str = "c2"
) -> pa.Table:
    """Two-sample Kolmogorov-Smirnov statistic from DISTINCT-VALUE
    compressed counts (one (value, count_A, count_B) row per distinct
    value — the same compression contract as gini/rank-sum): the max
    CDF gap is computed EXACTLY in integers as
    ``D_scaled = max |n2 * cum1(v) - n1 * cum2(v)|`` (cross-multiplied,
    no division until the final 6-dp ``D = D_scaled / (n1*n2)``) — the
    distribution-shift test that, unlike PSI, needs no binning choice.
    The merged table is bounded by the distinct-value domain; the final
    fold is one task (sort + two cumsums + max). Int64 contract:
    n1 * n2 and n2 * n1-counts products must fit (n1*n2 < 2^62)."""

    def fold(tbl: pa.Table) -> pa.Table:
        if not tbl.num_rows:
            return pa.table(
                {"n1": pa.array([0], pa.int64()), "n2": pa.array([0], pa.int64()),
                 "d_scaled": pa.array([0], pa.int64()),
                 "d_stat": pa.array([None], pa.float64())}
            )
        v = tbl.column(val_col).to_numpy(zero_copy_only=False).astype(np.int64)
        a = tbl.column(c1).to_numpy(zero_copy_only=False).astype(np.int64)
        b = tbl.column(c2).to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(v, kind="stable")
        cum1 = np.cumsum(a[order])
        cum2 = np.cumsum(b[order])
        n1, n2 = int(cum1[-1]), int(cum2[-1])
        if n1 * n2 >= 2**62:
            raise ValueError("KS cross products overflow int64; rescale counts")
        d_scaled = int(np.abs(n2 * cum1 - n1 * cum2).max()) if n1 and n2 else 0
        d = round(d_scaled / (n1 * n2), 6) if n1 and n2 else None
        return pa.table(
            {"n1": pa.array([n1], pa.int64()), "n2": pa.array([n2], pa.int64()),
             "d_scaled": pa.array([d_scaled], pa.int64()),
             "d_stat": pa.array([d], pa.float64())}
        )

    out = merged.repartition(1).map_batches(
        fold, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    return pa.Table.from_pylist(out.take_all())


def _pair_sweep_ingredients(xs, ys, cs) -> dict:
    """Shared concordance machinery for the ordinal-association
    finalizers: from DISTINCT (x, y) pair counts, the concordant /
    discordant pair totals (Fenwick tree over y-ranks in one
    x-ascending sweep, O(P log P) over P distinct pairs, exact
    arbitrary-precision ints) plus the tie ingredients n0 (all pairs),
    n1 (pairs tied on x), n2 (pairs tied on y), n3 (tied on both)."""
    rows = sorted(zip(list(xs), list(ys), list(cs)))
    ys_d = sorted({y for _, y, _ in rows})
    yrank = {y: i + 1 for i, y in enumerate(ys_d)}
    m = len(ys_d)
    tree = [0] * (m + 1)  # Fenwick over y-ranks, counts of rows already seen

    def bit_add(i, v):
        while i <= m:
            tree[i] += v
            i += i & (-i)

    def bit_prefix(i):
        s = 0
        while i > 0:
            s += tree[i]
            i -= i & (-i)
        return s

    conc = disc = 0
    seen = 0
    i = 0
    P = len(rows)
    while i < P:
        j = i
        while j < P and rows[j][0] == rows[i][0]:
            j += 1
        for _, y, c in rows[i:j]:  # loop over DISTINCT pairs, not rows
            r = yrank[y]
            conc += c * bit_prefix(r - 1)
            disc += c * (seen - bit_prefix(r))
        for _, y, c in rows[i:j]:
            bit_add(yrank[y], c)
            seen += c
        i = j

    n = sum(c for _, _, c in rows)
    n0 = n * (n - 1) // 2
    cx: dict = {}
    cy: dict = {}
    for x, y, c in rows:
        cx[x] = cx.get(x, 0) + c
        cy[y] = cy.get(y, 0) + c
    n1 = sum(v * (v - 1) // 2 for v in cx.values())
    n2 = sum(v * (v - 1) // 2 for v in cy.values())
    n3 = sum(c * (c - 1) // 2 for _, _, c in rows)
    return {
        "n": n,
        "conc": conc,
        "disc": disc,
        "n0": n0,
        "n1": n1,
        "n2": n2,
        "n3": n3,
    }


def kendall_tau_from_pairs(xs, ys, cs) -> dict:
    """Kendall tau-b finalize from DISTINCT (x, y) pair counts — the
    driver-side half of the tau-b gate, reusable at any corpus size
    because its input is bounded by distinct pairs, never rows.
    Concordant/discordant counts via the shared Fenwick sweep
    (:func:`_pair_sweep_ingredients`); tau as floor(tau * 1e6 + 0.5)
    from the float64 expression (C - D) / sqrt((n0 - n1) * (n0 - n2))."""
    g = _pair_sweep_ingredients(xs, ys, cs)
    tau = float(g["conc"] - g["disc"]) / math.sqrt(
        float(g["n0"] - g["n1"]) * float(g["n0"] - g["n2"])
    )
    return {
        "n": g["n"],
        "conc": g["conc"],
        "disc": g["disc"],
        "tau_e6": math.floor(tau * 1e6 + 0.5),
    }


def ordinal_association_from_pairs(xs, ys, cs) -> dict:
    """Goodman-Kruskal gamma, Somers' D (both directions) and Kendall
    tau-a from DISTINCT (x, y) pair counts — the tie-aware ordinal
    effect-size family riding the SAME bounded exchange (and the same
    Fenwick sweep) as the tau-b finalizer. With C concordant and D
    discordant pairs, n0 = n(n-1)/2 total pairs, n1/n2 pairs tied on
    x/y:

    - gamma    = (C - D) / (C + D)       (ignores all ties)
    - D_yx     = (C - D) / (n0 - n1)     (y dependent: pairs untied on x)
    - D_xy     = (C - D) / (n0 - n2)     (x dependent: pairs untied on y)
    - tau_a    = (C - D) / n0            (no tie correction at all)

    All integer ingredients exact (arbitrary precision); the four
    statistics emitted as floor(v * 1e6 + 0.5) from the identical
    float64 expressions a SQL oracle writes over the same integers."""
    g = _pair_sweep_ingredients(xs, ys, cs)
    num = float(g["conc"] - g["disc"])
    return {
        "n": g["n"],
        "conc": g["conc"],
        "disc": g["disc"],
        "tied_x": g["n1"],
        "tied_y": g["n2"],
        "tied_xy": g["n3"],
        "gamma_e6": math.floor(num / float(g["conc"] + g["disc"]) * 1e6 + 0.5),
        "d_yx_e6": math.floor(num / float(g["n0"] - g["n1"]) * 1e6 + 0.5),
        "d_xy_e6": math.floor(num / float(g["n0"] - g["n2"]) * 1e6 + 0.5),
        "tau_a_e6": math.floor(num / float(g["n0"]) * 1e6 + 0.5),
    }


def cliffs_delta(ds: rd.Dataset, val_col: str, group_col: str, g1: str, g2: str,
                 max_distinct: int = DEFAULT_MAX_DISTINCT) -> pa.Table:
    """Cliff's delta ordinal effect size between two groups: the
    probability a g1 value exceeds a g2 value minus the reverse,
    delta = (#{v1 > v2} - #{v1 < v2}) / (n1 * n2) — the EFFECT-SIZE
    companion to the rank-sum test (:func:`rank_sum_test`), robust and
    scale-free where Hodges-Lehmann is a location estimate. The
    rank-biserial correlation of the Mann-Whitney U equals the same
    quantity, so one gate covers both names.

    Same distinct-value compression as :func:`hodges_lehmann_shift`:
    one (value, c1, c2) row per distinct value crosses; the pair
    counts n_gt / n_lt / n_eq come from a cumsum over the sorted
    compressed side (never an n1 x n2 expansion) and are exact int64.
    delta_e6 is the one float, floor(delta * 1e6 + 0.5), identical
    expression in the oracle. Contract: n1 * n2 < 2^63."""

    parts = _two_group_cells(ds, val_col, group_col, g1, g2)
    merged = bucketed_keyed_sum(parts, [val_col], ["c1", "c2"])
    comp = _finalize_compressed(merged, "cliffs_delta", max_distinct).sort_values(val_col, kind="stable")
    c1 = comp["c1"].to_numpy(np.int64)
    c2 = comp["c2"].to_numpy(np.int64)
    n1 = int(c1.sum())
    n2 = int(c2.sum())
    # c2 pairs strictly below / above each distinct value (value-sorted)
    below = np.concatenate(([0], np.cumsum(c2)[:-1]))
    above = n2 - below - c2
    n_gt = int(np.sum(c1 * below))
    n_lt = int(np.sum(c1 * above))
    n_eq = int(np.sum(c1 * c2))
    delta = float(n_gt - n_lt) / (float(n1) * n2)
    return pa.table(
        {
            "n1": pa.array([n1], pa.int64()),
            "n2": pa.array([n2], pa.int64()),
            "n_gt": pa.array([n_gt], pa.int64()),
            "n_lt": pa.array([n_lt], pa.int64()),
            "n_eq": pa.array([n_eq], pa.int64()),
            "delta_e6": pa.array([int(math.floor(delta * 1e6 + 0.5))], pa.int64()),
        }
    )


def theil_sen_slope_e6(h: np.ndarray, n: np.ndarray) -> int:
    """Theil-Sen slope finalize over one (sorted-x, y) series: median
    of all pairwise slopes, with DuckDB's exact quantile_cont
    interpolation (lo + (hi - lo) * frac, float64) so even-count
    midpoints hash-match a SQL oracle bit-for-bit. Vectorized O(H^2);
    meant for the bounded merged series of a keyed pre-aggregate
    (hours, days), not raw rows. Returns floor(slope * 1e6 + 0.5)."""
    import math

    i, j = np.triu_indices(len(h), k=1)
    slopes = (n[j] - n[i]).astype(np.float64) / (h[j] - h[i]).astype(np.float64)
    slopes.sort()
    rn = (len(slopes) - 1) * 0.5
    lo = int(math.floor(rn))
    hi = int(math.ceil(rn))
    med = slopes[lo] + (slopes[hi] - slopes[lo]) * (rn - lo)
    return int(math.floor(med * 1e6 + 0.5))


def kruskal_rank_ingredients(
    ds: rd.Dataset, val_col: str, group_col: str,
    max_distinct: int = DEFAULT_MAX_DISTINCT,
) -> pa.Table:
    """Kruskal-Wallis rank ingredients across ALL groups — the k-group
    generalization of :func:`rank_sum_test`, same distinct-value
    compression: the exchange carries one exact (value, group, c) cell
    per distinct pair (contract: bounded value domain x small group
    set), the global fold is one sorted cumsum over tie blocks. Per
    group: ``n_j`` and the DOUBLED rank sum ``two_r`` (a tie block of
    total count c starting at 0-based rank ``start`` contributes
    ``2*start + c + 1`` per member — all exact int64). Broadcast
    columns: total ``n``, the tie term ``tie_sum = sum(c^3 - c)``, and
    the H statistic (plain and tie-corrected) as the ONE closed-form
    float64 expression a SQL oracle writes over the same integers
    (6-dp rounded)."""

    parts = _cell_counts_arrow(ds, [val_col, group_col], drop_null_keys=True)
    merged = bucketed_keyed_sum(parts, [val_col, group_col], ["c"])
    comp = _finalize_compressed(merged, "kruskal_rank_ingredients", max_distinct).sort_values([val_col, group_col], kind="stable")
    # tie blocks over distinct values (across ALL groups)
    per_val = comp.groupby(val_col, sort=True)["c"].sum()
    vstart = per_val.cumsum() - per_val  # 0-based start rank per value
    two_avg = 2 * vstart + per_val + 1  # doubled average rank per value
    comp = comp.assign(two_avg=comp[val_col].map(two_avg).to_numpy(np.int64))
    g = comp.groupby(group_col, sort=True)
    n_j = g["c"].sum().to_numpy(np.int64)
    two_r = g.apply(
        lambda x: int(np.sum(x["c"].to_numpy(np.int64) * x["two_avg"].to_numpy(np.int64))),
        include_groups=False,
    ).to_numpy(np.int64)
    groups = list(g.groups.keys())
    n = int(n_j.sum())
    cv = per_val.to_numpy(np.int64)
    tie_sum = int(np.sum(cv * cv * cv - cv))
    s = float(np.sum(two_r.astype(np.float64) ** 2 / (4.0 * n_j)))
    h = 12.0 / (n * (n + 1.0)) * s - 3.0 * (n + 1.0)
    h_tie = h / (1.0 - float(tie_sum) / (float(n) * n * n - n))
    k = len(groups)
    return pa.table(
        {
            group_col: pa.array([str(x) for x in groups], pa.string()),
            "n_j": pa.array(n_j, pa.int64()),
            "two_r": pa.array(two_r, pa.int64()),
            "n": pa.array([n] * k, pa.int64()),
            "tie_sum": pa.array([tie_sum] * k, pa.int64()),
            "h": pa.array([round(h, 6)] * k, pa.float64()),
            "h_tie": pa.array([round(h_tie, 6)] * k, pa.float64()),
        }
    )


def jsd_two_sample(
    ds: rd.Dataset, val_col: str, group_col: str, g1: str, g2: str,
    max_distinct: int = DEFAULT_MAX_DISTINCT,
) -> pa.Table:
    """Jensen-Shannon divergence (nats) between two groups' value
    distributions — the bounded symmetric companion to KS
    (:func:`ks_two_sample`) and PSI: distinct-value compression moves
    one exact (value, c1, c2) row per distinct value, the fold is one
    vectorized pass. Per-row term written EXACTLY as the SQL oracle
    does — ``0.5*p*ln(p/m) + 0.5*q*ln(q/m)`` with absent sides
    contributing 0 — then one sum, 6-dp rounded. Also emits the exact
    integers: n1, n2, support size and overlap count."""

    parts = _two_group_cells(ds, val_col, group_col, g1, g2)
    merged = bucketed_keyed_sum(parts, [val_col], ["c1", "c2"])
    comp = _finalize_compressed(merged, "jsd_two_sample", max_distinct).sort_values(val_col, kind="stable")
    c1 = comp["c1"].to_numpy(np.int64)
    c2 = comp["c2"].to_numpy(np.int64)
    n1, n2 = int(c1.sum()), int(c2.sum())
    p = c1 / float(n1)
    q = c2 / float(n2)
    m = (p + q) / 2.0
    with np.errstate(divide="ignore", invalid="ignore"):
        t1 = np.where(c1 > 0, 0.5 * p * np.log(np.where(c1 > 0, p / m, 1.0)), 0.0)
        t2 = np.where(c2 > 0, 0.5 * q * np.log(np.where(c2 > 0, q / m, 1.0)), 0.0)
    jsd = float(np.sum(t1 + t2))
    return pa.table(
        {
            "n1": pa.array([n1], pa.int64()),
            "n2": pa.array([n2], pa.int64()),
            "support": pa.array([len(comp)], pa.int64()),
            "overlap": pa.array([int(np.sum((c1 > 0) & (c2 > 0)))], pa.int64()),
            "jsd": pa.array([round(jsd, 6)], pa.float64()),
        }
    )


def siegel_slope_e6(h: np.ndarray, n: np.ndarray) -> int:
    """Siegel REPEATED-median slope over one series: for each point i
    the median of slopes to every other point, then the median of
    those per-point medians — breakdown point 50% (vs Theil-Sen's
    29%). Vectorized O(H^2) full slope matrix with a masked per-row
    sort (meant for the bounded merged series of a keyed
    pre-aggregate); both median levels use DuckDB's exact
    quantile_cont interpolation so the result hash-matches a nested
    quantile_cont SQL oracle bit-for-bit. Returns
    floor(slope * 1e6 + 0.5)."""
    import math

    H = len(h)
    hh = h.astype(np.float64)
    nn = n.astype(np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        S = (nn[None, :] - nn[:, None]) / (hh[None, :] - hh[:, None])
    # drop the diagonal: reshape trick keeps each row's H-1 off-diag slopes
    off = S[~np.eye(H, dtype=bool)].reshape(H, H - 1)
    off.sort(axis=1)
    rn = (H - 2) * 0.5
    lo = int(math.floor(rn))
    hi = int(math.ceil(rn))
    med_i = off[:, lo] + (off[:, hi] - off[:, lo]) * (rn - lo)
    med_i.sort()
    rn2 = (H - 1) * 0.5
    lo2 = int(math.floor(rn2))
    hi2 = int(math.ceil(rn2))
    med = med_i[lo2] + (med_i[hi2] - med_i[lo2]) * (rn2 - lo2)
    return int(math.floor(med * 1e6 + 0.5))


def hodges_lehmann_shift(
    ds: rd.Dataset, val_col: str, group_col: str, g1: str, g2: str,
    max_distinct: int = DEFAULT_MAX_DISTINCT,
) -> pa.Table:
    """Hodges-Lehmann location-shift estimator between two groups: the
    median of ALL pairwise differences v1 - v2 — the ESTIMATOR
    companion to the rank-sum TEST (:func:`rank_sum_test`), exactly as
    Siegel/Theil-Sen estimate the slope the Mann-Kendall test detects.
    Distinct-value compression makes the all-pairs multiset tractable:
    the exchange carries one (value, c1, c2) row per distinct value;
    the driver crosses the two compressed sides (D1 x D2 integer
    diffs, weight c1*c2 — bounded by the value DOMAIN squared, never
    rows), dedups diffs, and takes the weighted median by cumsum rank.
    Median interpolation only ever averages two INTEGER diffs, so
    hl_e6 is exact. Contract: n1 * n2 < 2^63."""

    parts = _two_group_cells(ds, val_col, group_col, g1, g2)
    merged = bucketed_keyed_sum(parts, [val_col], ["c1", "c2"])
    comp = _finalize_compressed(merged, "hodges_lehmann_shift", max_distinct)
    v = comp[val_col].to_numpy(np.int64)
    c1 = comp["c1"].to_numpy(np.int64)
    c2 = comp["c2"].to_numpy(np.int64)
    v1, w1 = v[c1 > 0], c1[c1 > 0]
    v2, w2 = v[c2 > 0], c2[c2 > 0]
    diffs = (v1[:, None] - v2[None, :]).ravel()
    w = (w1[:, None] * w2[None, :]).ravel()
    dv, inv = np.unique(diffs, return_inverse=True)
    dw = np.zeros(len(dv), dtype=np.int64)
    np.add.at(dw, inv, w)
    cum = np.cumsum(dw)
    tot = int(cum[-1])
    lo_r = (tot - 1) // 2
    hi_r = tot // 2 if tot % 2 == 0 else lo_r
    lo_val = int(dv[np.searchsorted(cum, lo_r + 1)])
    hi_val = int(dv[np.searchsorted(cum, hi_r + 1)])
    hl = lo_val + (hi_val - lo_val) * (0.5 if tot % 2 == 0 else 0.0)
    return pa.table(
        {
            "n1": pa.array([int(w1.sum())], pa.int64()),
            "n2": pa.array([int(w2.sum())], pa.int64()),
            "n_pairs": pa.array([tot], pa.int64()),
            "n_diffs": pa.array([len(dv)], pa.int64()),
            "hl_e6": pa.array([int(math.floor(hl * 1e6 + 0.5))], pa.int64()),
        }
    )


def mood_median_test(ds: rd.Dataset, val_col: str, group_col: str,
                     max_distinct: int = DEFAULT_MAX_DISTINCT) -> pa.Table:
    """Mood's median test across ALL groups: pooled grand median (the
    quantile_disc 0-based rank rule ``max(ceil(q*n)-1, 0)``), then the
    per-group 2xk contingency of above-median counts — every emitted
    count EXACT int64 (the chi-square statistic is the one final 6-dp
    float, written identically in the oracle). Same distinct-value
    compressed exchange as :func:`kruskal_rank_ingredients`; the
    pooled-median fold is a cumsum over the compressed rows."""

    parts = _cell_counts_arrow(ds, [val_col, group_col], drop_null_keys=True)
    merged = bucketed_keyed_sum(parts, [val_col, group_col], ["c"])
    comp = _finalize_compressed(merged, "mood_median_test", max_distinct).sort_values([val_col, group_col], kind="stable")
    per_val = comp.groupby(val_col, sort=True)["c"].sum()
    cum = per_val.cumsum().to_numpy(np.int64)
    n = int(cum[-1])
    rank = max(math.ceil(0.5 * n) - 1, 0)  # quantile_disc(0.5) 0-based
    med = int(per_val.index.to_numpy(np.int64)[np.searchsorted(cum, rank + 1)])
    above = comp[comp[val_col] > med]
    g_n = comp.groupby(group_col, sort=True)["c"].sum()
    g_a = above.groupby(group_col, sort=True)["c"].sum().reindex(g_n.index, fill_value=0)
    n_j = g_n.to_numpy(np.int64)
    a_j = g_a.to_numpy(np.int64)
    a = int(a_j.sum())
    b = n - a
    ea = n_j.astype(np.float64) * a / n
    eb = n_j.astype(np.float64) * b / n
    chi2 = float(np.sum((a_j - ea) ** 2 / ea + ((n_j - a_j) - eb) ** 2 / eb))
    k = len(g_n)
    return pa.table(
        {
            group_col: pa.array([str(x) for x in g_n.index], pa.string()),
            "n_j": pa.array(n_j, pa.int64()),
            "n_above": pa.array(a_j, pa.int64()),
            "med": pa.array([med] * k, pa.int64()),
            "n": pa.array([n] * k, pa.int64()),
            "n_above_total": pa.array([a] * k, pa.int64()),
            "chi2": pa.array([round(chi2, 6)] * k, pa.float64()),
        }
    )


def _group_moments12(ds: rd.Dataset, val_col: str, group_col: str) -> pd.DataFrame:
    """Per-group (n_j, s1=sum v, s2=sum v^2) exact int64 — the shared
    exchange of the parametric location-test family (one-way ANOVA,
    Welch). Contract: n * max(v^2) < 2^63."""

    def partial(tbl: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t0 = tbl.select([group_col, val_col]).drop_null()
        v = t0.column(val_col).cast(pa.int64())
        t = pa.table({group_col: t0.column(group_col), "s1": v,
                      "s2": pc.multiply(v, v)})
        out = t.group_by([group_col], use_threads=False).aggregate(
            [("s1", "count"), ("s1", "sum"), ("s2", "sum")]
        )
        return out.rename_columns([group_col, "n_j", "s1", "s2"])

    parts = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    merged = bucketed_keyed_sum(parts, [group_col], ["n_j", "s1", "s2"])
    return merged.to_pandas().sort_values(group_col, kind="stable").reset_index(drop=True)


def anova_oneway(ds: rd.Dataset, val_col: str, group_col: str) -> pa.Table:
    """One-way (fixed-effects) ANOVA F test across ALL groups — the
    PARAMETRIC sibling of Kruskal-Wallis on means instead of ranks.
    The exchange is one bounded per-group (n_j, sum, sum-of-squares)
    keyed sum, all exact int64; only the O(1)-magnitude RATIOS F and
    eta-squared are emitted as 6-dp floats (the raw between/within
    sums of squares are ~1e8+ where cross-engine double summation
    order would break a 6-dp hash — ratios keep the error relative,
    ~1e-15). Expressions written identically in the oracle."""
    comp = _group_moments12(ds, val_col, group_col)
    n_j = comp["n_j"].to_numpy(np.int64)
    s1 = comp["s1"].to_numpy(np.int64)
    s2 = comp["s2"].to_numpy(np.int64)
    n = int(n_j.sum())
    s = int(s1.sum())
    k = len(n_j)
    s1f = s1.astype(np.float64)
    ssb = float(np.sum(s1f * s1 / n_j)) - float(s) * s / n
    ssw = float(np.sum(s2.astype(np.float64) - s1f * s1 / n_j))
    f = (ssb / (k - 1)) / (ssw / (n - k))
    eta2 = ssb / (ssb + ssw)
    return pa.table(
        {
            group_col: pa.array([str(x) for x in comp[group_col]], pa.string()),
            "n_j": pa.array(n_j, pa.int64()),
            "s1": pa.array(s1, pa.int64()),
            "s2": pa.array(s2, pa.int64()),
            "k": pa.array([k] * k, pa.int64()),
            "n": pa.array([n] * k, pa.int64()),
            "f_stat": pa.array([round(f, 6)] * k, pa.float64()),
            "eta2": pa.array([round(eta2, 6)] * k, pa.float64()),
        }
    )


def welch_t_test(
    ds: rd.Dataset, val_col: str, group_col: str, g1: str, g2: str
) -> pa.Table:
    """Welch's unequal-variance t test between two groups — the
    parametric two-sample companion to the rank-sum test, with the
    Welch-Satterthwaite df. Ingredients (n, sum, sum-of-squares per
    side) exact int64 from the shared moments exchange; mean_diff, t
    and df are the 6-dp floats, each one closed-form expression
    mirrored in the oracle."""
    comp = _group_moments12(ds, val_col, group_col)
    comp = comp.set_index(group_col)
    n1, s11, s21 = (int(comp.loc[g1, c]) for c in ("n_j", "s1", "s2"))
    n2, s12, s22 = (int(comp.loc[g2, c]) for c in ("n_j", "s1", "s2"))
    m1 = float(s11) / n1
    m2 = float(s12) / n2
    v1 = (float(s21) - float(s11) * s11 / n1) / (n1 - 1)
    v2 = (float(s22) - float(s12) * s12 / n2) / (n2 - 1)
    se2 = v1 / n1 + v2 / n2
    t = (m1 - m2) / math.sqrt(se2)
    df = se2 * se2 / ((v1 / n1) * (v1 / n1) / (n1 - 1) + (v2 / n2) * (v2 / n2) / (n2 - 1))
    return pa.table(
        {
            "n1": pa.array([n1], pa.int64()),
            "n2": pa.array([n2], pa.int64()),
            "sum1": pa.array([s11], pa.int64()),
            "sum2": pa.array([s12], pa.int64()),
            "ss1": pa.array([s21], pa.int64()),
            "ss2": pa.array([s22], pa.int64()),
            "mean_diff": pa.array([round(m1 - m2, 6)], pa.float64()),
            "t": pa.array([round(t, 6)], pa.float64()),
            "df": pa.array([round(df, 6)], pa.float64()),
        }
    )


def shape_per_group(ds: rd.Dataset, val_col: str, group_col: str,
                    max_distinct: int = DEFAULT_MAX_DISTINCT) -> pa.Table:
    """Per-group skewness (Fisher g1) and excess kurtosis (g2) from
    DISTINCT-VALUE COMPRESSED power sums: the exchange carries one
    (group, value, count) row per distinct value; s1..s4 = sum c*v^p
    are computed over the compressed rows (exact int64 — contract:
    n * max(v^4) < 2^63, fine for length-like domains) and the two
    shape statistics are the 6-dp floats from the textbook central-
    moment identities, written identically in the oracle."""
    merged = _finalize_compressed(_compressed_counts(ds, group_col, val_col), "shape_per_group", max_distinct)
    merged = merged.sort_values([group_col, val_col], kind="stable")
    out = {k: [] for k in (group_col, "n", "s1", "s2", "s3", "s4", "skew", "ex_kurt")}
    for g, grp in merged.groupby(group_col, sort=True):
        v = grp[val_col].to_numpy(np.int64)
        c = grp["c"].to_numpy(np.int64)
        n = int(c.sum())
        s1 = int(np.sum(c * v))
        s2 = int(np.sum(c * v * v))
        s3 = int(np.sum(c * v * v * v))
        s4 = int(np.sum(c * v * v * v * v))
        mean = float(s1) / n
        m2 = float(s2) / n - mean * mean
        m3 = float(s3) / n - 3.0 * mean * float(s2) / n + 2.0 * mean * mean * mean
        m4 = (
            float(s4) / n
            - 4.0 * mean * float(s3) / n
            + 6.0 * mean * mean * float(s2) / n
            - 3.0 * mean * mean * mean * mean
        )
        out[group_col].append(str(g))
        out["n"].append(n)
        out["s1"].append(s1)
        out["s2"].append(s2)
        out["s3"].append(s3)
        out["s4"].append(s4)
        out["skew"].append(round(m3 / (m2 * math.sqrt(m2)), 6))
        out["ex_kurt"].append(round(m4 / (m2 * m2) - 3.0, 6))
    return pa.table(
        {
            group_col: pa.array(out[group_col], pa.string()),
            "n": pa.array(out["n"], pa.int64()),
            "s1": pa.array(out["s1"], pa.int64()),
            "s2": pa.array(out["s2"], pa.int64()),
            "s3": pa.array(out["s3"], pa.int64()),
            "s4": pa.array(out["s4"], pa.int64()),
            "skew": pa.array(out["skew"], pa.float64()),
            "ex_kurt": pa.array(out["ex_kurt"], pa.float64()),
        }
    )


def brown_forsythe(ds: rd.Dataset, val_col: str, group_col: str,
                   max_distinct: int = DEFAULT_MAX_DISTINCT) -> pa.Table:
    """Brown-Forsythe test of equal SPREAD across groups: one-way
    ANOVA on z_ij = |v_ij - median_j| — the robust (median-centered)
    Levene variant, and the one whose ingredients stay INTEGER (the
    per-group median is an observed value by the quantile_disc rank
    rule, so every z is an exact int64). Same compressed exchange as
    :func:`shape_per_group`; per-group medians and the z power sums
    fold over the compressed rows; F is the one 6-dp ratio float
    (identical expression in the oracle)."""
    merged = _finalize_compressed(_compressed_counts(ds, group_col, val_col), "brown_forsythe", max_distinct)
    merged = merged.sort_values([group_col, val_col], kind="stable")
    rows = {k: [] for k in (group_col, "n_j", "med", "sz", "szz")}
    for g, grp in merged.groupby(group_col, sort=True):
        v = grp[val_col].to_numpy(np.int64)
        c = grp["c"].to_numpy(np.int64)
        cum = np.cumsum(c)
        n = int(cum[-1])
        rank = max(math.ceil(0.5 * n) - 1, 0)  # quantile_disc(0.5) 0-based
        med = int(v[np.searchsorted(cum, rank + 1)])
        z = np.abs(v - med)
        rows[group_col].append(str(g))
        rows["n_j"].append(n)
        rows["med"].append(med)
        rows["sz"].append(int(np.sum(c * z)))
        rows["szz"].append(int(np.sum(c * z * z)))
    n_j = np.array(rows["n_j"], np.int64)
    sz = np.array(rows["sz"], np.int64)
    szz = np.array(rows["szz"], np.int64)
    n = int(n_j.sum())
    s = int(sz.sum())
    k = len(n_j)
    szf = sz.astype(np.float64)
    ssb = float(np.sum(szf * sz / n_j)) - float(s) * s / n
    ssw = float(np.sum(szz.astype(np.float64) - szf * sz / n_j))
    f = (ssb / (k - 1)) / (ssw / (n - k))
    return pa.table(
        {
            group_col: pa.array(rows[group_col], pa.string()),
            "n_j": pa.array(n_j, pa.int64()),
            "med": pa.array(rows["med"], pa.int64()),
            "sz": pa.array(sz, pa.int64()),
            "szz": pa.array(szz, pa.int64()),
            "f_bf": pa.array([round(f, 6)] * k, pa.float64()),
        }
    )


def jonckheere_trend(ds: rd.Dataset, val_col: str, group_col: str,
                     max_distinct: int = DEFAULT_MAX_DISTINCT) -> pa.Table:
    """Jonckheere-Terpstra ordered-alternative test: does ``val_col``
    trend monotonically across groups taken in ASCENDING ``group_col``
    order (the ordered sibling of Kruskal-Wallis — KW asks "any
    difference", JT asks "an increasing one", with far more power when
    the order is real). JT = sum over ordered group pairs i<j of the
    Mann-Whitney count #{x_i < y_j} + 0.5 #{x_i = y_j}; emitted DOUBLED
    (``two_jt``) so it stays exact int64.

    Same distinct-value compression as :func:`kruskal_rank_ingredients`
    (one (value, group, c) cell per distinct pair on the wire); the
    driver fold is two exclusive cumsums over the dense value x group
    count matrix — groups-before-g, then values-below-v — never a pair
    loop. The null mean (``mean4 = n^2 - sum n_j^2``, JT mean = /4) and
    the tie-corrected variance ingredients (Hollander & Wolfe 6.19:
    ``var = A/72 + B1*B2/(36 n(n-1)(n-2)) + C1*C2/(8 n(n-1))``) are all
    exact int64 sums; z is the ONE float expression the oracle mirrors
    (6-dp). Formula guarded by a permutation Monte-Carlo test."""
    comp = _finalize_compressed(_compressed_counts(ds, group_col, val_col), "jonckheere_terpstra", max_distinct)
    comp = comp.sort_values([group_col, val_col], kind="stable")
    groups = sorted(comp[group_col].unique())
    vals = np.sort(comp[val_col].unique())
    gi = {g: i for i, g in enumerate(groups)}
    vi = {v: i for i, v in enumerate(vals)}
    m = np.zeros((len(vals), len(groups)), np.int64)
    m[
        comp[val_col].map(vi).to_numpy(np.int64),
        comp[group_col].map(gi).to_numpy(np.int64),
    ] = comp["c"].to_numpy(np.int64)
    # prior[v, g] = count in groups < g at value v (exclusive cumsum on axis 1)
    prior = np.cumsum(m, axis=1) - m
    # less[v, g] = count in groups < g with value < v (exclusive cumsum on axis 0)
    less = np.cumsum(prior, axis=0) - prior
    two_jt = int(np.sum(m * (2 * less + prior)))
    n_j = m.sum(axis=0)
    t_v = m.sum(axis=1)
    n = int(n_j.sum())
    mean4 = n * n - int(np.sum(n_j * n_j))
    a_term = (
        n * (n - 1) * (2 * n + 5)
        - int(np.sum(n_j * (n_j - 1) * (2 * n_j + 5)))
        - int(np.sum(t_v * (t_v - 1) * (2 * t_v + 5)))
    )
    b1 = int(np.sum(n_j * (n_j - 1) * (n_j - 2)))
    b2 = int(np.sum(t_v * (t_v - 1) * (t_v - 2)))
    c1 = int(np.sum(n_j * (n_j - 1)))
    c2 = int(np.sum(t_v * (t_v - 1)))
    var = (
        a_term / 72.0
        + b1 * b2 / (36.0 * n * (n - 1) * (n - 2))
        + c1 * c2 / (8.0 * n * (n - 1))
    )
    z = (two_jt / 2.0 - mean4 / 4.0) / math.sqrt(var)
    k = len(groups)
    return pa.table(
        {
            group_col: pa.array([str(g) for g in groups], pa.string()),
            "n_j": pa.array(n_j, pa.int64()),
            "n": pa.array([n] * k, pa.int64()),
            "two_jt": pa.array([two_jt] * k, pa.int64()),
            "mean4": pa.array([mean4] * k, pa.int64()),
            "a_term": pa.array([a_term] * k, pa.int64()),
            "b1": pa.array([b1] * k, pa.int64()),
            "b2": pa.array([b2] * k, pa.int64()),
            "c1": pa.array([c1] * k, pa.int64()),
            "c2": pa.array([c2] * k, pa.int64()),
            "z_jt": pa.array([round(z, 6)] * k, pa.float64()),
        }
    )


def emd_two_sample(
    merged: rd.Dataset, val_col: str, c1: str = "c1", c2: str = "c2"
) -> pa.Table:
    """1-D Wasserstein (earth mover's) distance + Hellinger affinity
    between two integer-valued samples, from the SAME distinct-value
    compressed ``(value, count_A, count_B)`` contract as
    :func:`ks_two_sample` — KS reports the worst CDF gap, W1 integrates
    ALL of it: ``W1 = sum_i |F1(v_i) - F2(v_i)| * (v_{i+1} - v_i)``.
    Cross-multiplied to stay exact: ``w1_num = sum |n2*cum1 - n1*cum2|
    * gap`` accumulates in PYTHON ints (no intermediate can overflow)
    and must itself fit int64 (guarded). The Bhattacharyya coefficient
    ``bc = sum sqrt(c1_i*c2_i) / sqrt(n1*n2)`` and
    ``hellinger = sqrt(1 - bc)`` are the two 6-dp floats, summed in
    ascending-value order (bounded support — same float-cell-sum
    precedent as jsd_two_sample). ``w1`` is emitted as the RAW float64
    division w1_num/(n1*n2): bit-identical cross-engine, no rounding
    choice to disagree on."""

    def fold(tbl: pa.Table) -> pa.Table:
        if not tbl.num_rows:
            return pa.table(
                {"n1": pa.array([0], pa.int64()), "n2": pa.array([0], pa.int64()),
                 "w1_num": pa.array([0], pa.int64()),
                 "w1": pa.array([None], pa.float64()),
                 "bc": pa.array([None], pa.float64()),
                 "hellinger": pa.array([None], pa.float64())}
            )
        v = tbl.column(val_col).to_numpy(zero_copy_only=False).astype(np.int64)
        a = tbl.column(c1).to_numpy(zero_copy_only=False).astype(np.int64)
        b = tbl.column(c2).to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(v, kind="stable")
        v, a, b = v[order], a[order], b[order]
        cum1 = np.cumsum(a)
        cum2 = np.cumsum(b)
        n1, n2 = int(cum1[-1]), int(cum2[-1])
        if not (n1 and n2):
            return pa.table(
                {"n1": pa.array([n1], pa.int64()), "n2": pa.array([n2], pa.int64()),
                 "w1_num": pa.array([0], pa.int64()),
                 "w1": pa.array([None], pa.float64()),
                 "bc": pa.array([None], pa.float64()),
                 "hellinger": pa.array([None], pa.float64())}
            )
        gaps = np.diff(v)
        # python-int accumulation: |n2*cum1 - n1*cum2| * gap can pass
        # 2^63 transiently at corpus scale even when the total fits
        w1_num = sum(
            int(abs(n2 * int(cum1[i]) - n1 * int(cum2[i]))) * int(gaps[i])
            for i in range(len(gaps))
        ) if len(gaps) else 0
        if w1_num >= 2**62:
            raise ValueError("W1 numerator overflows int64; rescale counts")
        w1 = w1_num / (n1 * n2)
        bc = float(np.sum(np.sqrt(a.astype(np.float64) * b.astype(np.float64)))) / math.sqrt(
            float(n1) * float(n2)
        )
        hell = math.sqrt(max(0.0, 1.0 - bc))
        return pa.table(
            {"n1": pa.array([n1], pa.int64()), "n2": pa.array([n2], pa.int64()),
             "w1_num": pa.array([w1_num], pa.int64()),
             "w1": pa.array([w1], pa.float64()),
             "bc": pa.array([round(bc, 6)], pa.float64()),
             "hellinger": pa.array([round(hell, 6)], pa.float64())}
        )

    out = merged.repartition(1).map_batches(
        fold, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    return pa.Table.from_pylist(out.take_all())


def paired_halves_kappa(
    ds: rd.Dataset,
    key: str,
    ts_col: str,
    id_col: str,
    cat_col: str,
    num_buckets: "int | None" = None,
) -> pa.Table:
    """Cohen's kappa of each key's MODAL category between the first and
    second half of its own event sequence — chance-corrected
    self-agreement: kappa 1 means users keep their dominant behavior,
    0 means the second half is as predictable from the first as from
    the marginal mix. Pairs with :func:`user halves McNemar <...>`
    (presence agreement) by measuring BEHAVIOR agreement.

    Semantics (mirrored exactly in SQL): order a key's rows by
    (ts, id); keys with >= 2 rows split at ceil(n/2); each half's modal
    category breaks ties by (count DESC, category ASC). Kappa is a pure
    integer rational off the modal contingency: with N keys, ``agree``
    diagonal count and ``pe_num = sum_k row_k * col_k``,
    ``kappa = (agree*N - pe_num) / (N*N - pe_num)`` — emitted as exact
    int64 numerator/denominator plus the raw float64 division
    (bit-identical cross-engine).

    Scale: ONE bucketed shuffle on ``key`` (all of a key's rows
    co-locate); per bucket everything is vectorized pandas groupby;
    only (m1, m2, partial-count) contingency cells leave a bucket —
    bounded by category-domain^2 per bucket."""

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"m1": pd.Series([], dtype=object), "m2": pd.Series([], dtype=object),
             "c": pd.Series([], dtype="int64")}
        )
        if not len(df):
            return empty
        df = df.sort_values([key, ts_col, id_col], kind="mergesort")
        n_per = df.groupby(key, sort=False)[cat_col].transform("size").to_numpy(np.int64)
        rn = df.groupby(key, sort=False).cumcount().to_numpy(np.int64)
        df = df.assign(__half=np.where(rn < (n_per + 1) // 2, 1, 2))
        df = df[n_per >= 2]
        if not len(df):
            return empty
        cnt = (
            df.groupby([key, "__half", cat_col], sort=False)
            .size()
            .rename("c")
            .reset_index()
        )
        cnt = cnt.sort_values(
            [key, "__half", "c", cat_col],
            ascending=[True, True, False, True],
            kind="mergesort",
        ).drop_duplicates([key, "__half"])
        m1 = cnt[cnt["__half"] == 1].set_index(key)[cat_col]
        m2 = cnt[cnt["__half"] == 2].set_index(key)[cat_col]
        pairs = pd.DataFrame({"m1": m1, "m2": m2}).dropna()
        out = pairs.groupby(["m1", "m2"], sort=False).size().rename("c").reset_index()
        out["c"] = out["c"].astype("int64")
        return out

    cells = bucketed_map_groups(ds, key, per_bucket, num_buckets=num_buckets)
    merged = bucketed_keyed_sum(cells, ["m1", "m2"], ["c"], num_buckets=4).to_pandas()
    # an all-empty-bucket run can surface a schemaless empty frame
    n = int(merged["c"].sum()) if "c" in merged.columns else 0
    if not n:
        return pa.table(
            {"n_keys": pa.array([0], pa.int64()), "agree": pa.array([0], pa.int64()),
             "pe_num": pa.array([0], pa.int64()),
             "kappa_num": pa.array([0], pa.int64()),
             "kappa_den": pa.array([0], pa.int64()),
             "kappa": pa.array([None], pa.float64())}
        )
    agree = int(merged.loc[merged["m1"] == merged["m2"], "c"].sum())
    rows = merged.groupby("m1")["c"].sum()
    cols = merged.groupby("m2")["c"].sum()
    pe_num = int(sum(int(rows.get(k, 0)) * int(cols.get(k, 0))
                     for k in set(rows.index) | set(cols.index)))
    kappa_num = agree * n - pe_num
    kappa_den = n * n - pe_num
    kappa = kappa_num / kappa_den if kappa_den else None
    return pa.table(
        {"n_keys": pa.array([n], pa.int64()), "agree": pa.array([agree], pa.int64()),
         "pe_num": pa.array([pe_num], pa.int64()),
         "kappa_num": pa.array([kappa_num], pa.int64()),
         "kappa_den": pa.array([kappa_den], pa.int64()),
         "kappa": pa.array([kappa], pa.float64())}
    )


def daily_cycle_per_group(
    ds: rd.Dataset, key: str, ts_col: str, num_buckets: int = 4
) -> pa.Table:
    """First-harmonic (period-24h) Fourier amplitude of each key's
    hour-of-day activity profile — THE daily-seasonality screen: with
    hour-of-day counts c_h, ``a1 = sum c_h cos(2*pi*h/24)``, ``b1 = sum
    c_h sin(...)``, ``amp = sqrt(a1^2+b1^2)`` and ``rel_amp = 2*amp/n``
    (0 flat, ->1 fully concentrated at one phase). The distributed part
    is EXACT integer (key, hod, count) cells — at most |keys| x 24 rows
    ever move; the trig projection is one fixed driver-side fold whose
    expression order mirrors the SQL oracle exactly (floats enter only
    in the final 24-term dot products, 6-dp rounded)."""

    def partial(tbl: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        hod = pc.cast(pc.hour(tbl.column(ts_col)), pa.int64())
        t = (
            pa.table({key: tbl.column(key), "hod": hod})
            .group_by([key, "hod"])
            .aggregate([([], "count_all")])
        )
        return t.rename_columns([key, "hod", "n"])

    cells = bucketed_keyed_sum(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        [key, "hod"], ["n"], num_buckets=num_buckets,
    ).to_pandas()
    if not len(cells):
        return pa.table(
            {key: pa.array([], pa.string()), "total": pa.array([], pa.int64()),
             "a1": pa.array([], pa.float64()), "b1": pa.array([], pa.float64()),
             "amp": pa.array([], pa.float64()), "rel_amp": pa.array([], pa.float64())}
        )
    cells = cells.sort_values([key, "hod"], kind="mergesort")
    out_k, out_t, out_a, out_b, out_amp, out_rel = [], [], [], [], [], []
    for k, g in cells.groupby(key, sort=True):
        h = g["hod"].to_numpy(np.float64)
        n = g["n"].to_numpy(np.float64)
        # ((2*pi)*h)/24 — the oracle's 2*PI()*hod/24.0 association
        ang = (2.0 * math.pi * h) / 24.0
        a1 = float(np.sum(n * np.cos(ang)))
        b1 = float(np.sum(n * np.sin(ang)))
        amp = math.sqrt(a1 * a1 + b1 * b1)
        total = int(g["n"].sum())
        out_k.append(k)
        out_t.append(total)
        out_a.append(round(a1, 6))
        out_b.append(round(b1, 6))
        out_amp.append(round(amp, 6))
        out_rel.append(round(2.0 * amp / total, 6))
    return pa.table(
        {key: pa.array(out_k), "total": pa.array(out_t, pa.int64()),
         "a1": pa.array(out_a, pa.float64()), "b1": pa.array(out_b, pa.float64()),
         "amp": pa.array(out_amp, pa.float64()),
         "rel_amp": pa.array(out_rel, pa.float64())}
    )


def markov_entropy(cells: pa.Table) -> pa.Table:
    """Conditional entropy H(next | prev), next-marginal entropy
    H(next) and their difference (the mutual information of consecutive
    steps) from a first-order transition-count table (prev, cur, n) —
    the predictability summary of a Markov chain: mi ~ 0 means the next
    step ignores the current one. Counts are exact int64 (produced by
    cep.transition_counts' bounded-cells exchange); the entropies are
    one fixed-order fold over <= |states|^2 cells whose per-cell
    expression mirrors the SQL oracle exactly, 6-dp rounded."""
    df = cells.to_pandas()
    if not len(df):
        return pa.table(
            {"n_trans": pa.array([0], pa.int64()), "n_cells": pa.array([0], pa.int64()),
             "h_cond": pa.array([None], pa.float64()),
             "h_next": pa.array([None], pa.float64()),
             "mi": pa.array([None], pa.float64())}
        )
    n = df["n"].to_numpy(np.int64)
    nn = int(n.sum())
    rn = df.groupby("prev")["n"].transform("sum").to_numpy(np.int64)
    sc = float(np.sum((n / nn) * np.log(n / rn)))
    m = df.groupby("cur")["n"].sum().to_numpy(np.int64)
    sn = float(np.sum((m / nn) * np.log(m / nn)))
    return pa.table(
        {"n_trans": pa.array([nn], pa.int64()),
         "n_cells": pa.array([len(df)], pa.int64()),
         "h_cond": pa.array([round(-sc, 6)], pa.float64()),
         "h_next": pa.array([round(-sn, 6)], pa.float64()),
         "mi": pa.array([round(-sn + sc, 6)], pa.float64())}
    )


def hill_alpha(cells: rd.Dataset, val_col: str, xmin: int, c_col: str = "c") -> pa.Table:
    """Hill / continuous-MLE power-law tail exponent over a
    distinct-value compressed (value, count) table:
    ``alpha = 1 + n_tail / sum(c * ln(v / xmin))`` for values >= xmin —
    the heavy-tail screen for activity distributions (Zipf slope's
    per-entity sibling: is user activity / conversation length
    power-law, and how fat?). The exchange is the compressed cells
    (bounded value domain); n_tail exact int64; lnsum is the one
    fixed-order float fold (ascending value), 6-dp, with alpha derived
    from the UNROUNDED sum exactly as the oracle writes it."""

    def fold(tbl: pa.Table) -> pa.Table:
        if not tbl.num_rows:
            return pa.table(
                {"n_tail": pa.array([0], pa.int64()),
                 "lnsum": pa.array([None], pa.float64()),
                 "alpha": pa.array([None], pa.float64())}
            )
        v = tbl.column(val_col).to_numpy(zero_copy_only=False).astype(np.int64)
        c = tbl.column(c_col).to_numpy(zero_copy_only=False).astype(np.int64)
        keep = v >= xmin
        v, c = v[keep], c[keep]
        order = np.argsort(v, kind="stable")
        v, c = v[order], c[order]
        n_tail = int(c.sum())
        lnsum = float(np.sum(c * np.log(v / float(xmin))))
        alpha = round(1.0 + n_tail / lnsum, 6) if lnsum > 0 else None
        return pa.table(
            {"n_tail": pa.array([n_tail], pa.int64()),
             "lnsum": pa.array([round(lnsum, 6)], pa.float64()),
             "alpha": pa.array([alpha], pa.float64())}
        )

    out = cells.repartition(1).map_batches(
        fold, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    return pa.Table.from_pylist(out.take_all())
