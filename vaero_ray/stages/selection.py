"""Exact distributed order statistics by bit-prefix radix selection.

The log-histogram sketch (``stages/sketch.lhq_*``) answers quantiles
APPROXIMATELY in one pass; this module answers them EXACTLY without the
classic alternative — a full range-partition sort — by binary-searching
the VALUE DOMAIN instead of moving rows. An int64 column is resolved in
``64 / digit_bits`` (default 4) filtered scans: each scan reduces the
block's candidate rows to a <=2^digit_bits-bin digit histogram emitted
as ``(key, cnt)`` register rows (groupby-SUM mergeable — the identical
exchange shape as the sketches), the driver walks the merged histogram
to pick each quantile's digit, and the next scan tracks only rows whose
high bits match a chosen prefix. No data row ever leaves its block; the
only exchange is register rows. At 100 TB this is 4 column-pruned scans
plus a KB-scale shuffle, where a sort-based quantile is an all-to-all
of every row. All requested quantiles ride the SAME passes (divergent
prefixes are tracked side by side), so p50/p90/p99 cost no more than
the median alone.

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
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

_SIGN = np.uint64(1 << 63)  # order-preserving int64 -> uint64 flip


def exact_quantiles_disc(
    ds: rd.Dataset,
    col: str,
    qs: "list[float]",
    digit_bits: int = 16,
) -> "list[int]":
    """Exact ``quantile_disc`` values of int64 column ``col`` for each
    q in ``qs``, via 64/digit_bits radix-selection passes (see module
    docstring). Returns plain ints in ``qs`` order. Raises on an
    all-null/empty column (DuckDB would return NULL)."""
    from ray.data.aggregate import Sum

    if 64 % digit_bits:
        raise ValueError("digit_bits must divide 64")
    if not qs:
        return []
    if any(q < 0.0 or q > 1.0 for q in qs):
        raise ValueError("quantiles must be in [0, 1]")
    rounds = 64 // digit_bits
    mask = np.uint64((1 << digit_bits) - 1)

    def histogram(prefixes: np.ndarray, shift: int) -> "dict[int, np.ndarray]":
        """One pass: merged per-(tracked prefix, next digit) counts.
        ``prefixes`` is the sorted uint64 array of tracked high-bit
        values (u >> (shift + digit_bits)); tiny, shipped in the task
        closure. Returns {prefix_idx: int64[2^digit_bits] counts}."""
        P = prefixes  # closure capture
        sh = np.uint64(shift)
        top = shift + digit_bits >= 64

        def partial(tbl: pa.Table) -> pa.Table:
            x = pc.drop_null(tbl.column(col))
            empty = pa.table(
                {"key": pa.array([], pa.int64()), "cnt": pa.array([], pa.int64())}
            )
            if not len(x):
                return empty
            u = x.to_numpy(zero_copy_only=False).astype(np.int64).view(np.uint64)
            u = u ^ _SIGN
            if top:  # first round: every row is under the single root prefix
                idx = np.zeros(len(u), dtype=np.int64)
                keep = u
            else:
                pref = u >> np.uint64(shift + digit_bits)
                idx = np.searchsorted(P, pref)
                ok = (idx < len(P)) & (P[np.minimum(idx, len(P) - 1)] == pref)
                if not ok.any():
                    return empty
                idx = idx[ok]
                keep = u[ok]
            dig = (keep >> sh) & mask
            key = (idx << digit_bits) | dig.astype(np.int64)
            ub, uc = np.unique(key, return_counts=True)
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

    # round 0 histogram doubles as the count pass: n = total non-null rows
    prefixes = np.array([0], dtype=np.uint64)
    hists = histogram(prefixes, 64 - digit_bits)
    n = int(sum(h.sum() for h in hists.values()))
    if n == 0:
        raise ValueError(f"exact_quantiles_disc: no non-null values in {col!r}")
    # (tracked prefix value, local 0-based rank) per requested quantile
    state = [(np.uint64(0), max(math.ceil(q * n) - 1, 0)) for q in qs]

    for rnd in range(rounds):
        shift = 64 - digit_bits * (rnd + 1)
        if rnd:  # round 0's histogram was the count pass above
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

    return [int(np.int64(p ^ _SIGN)) for p, _ in state]
