"""Mergeable sketches for corpus-scale statistics.

HyperLogLog distinct-count: the canonical "novel sketch" shape for a
100-TB pipeline — per-block REGISTERS (2^p small ints) computed in one
vectorized pass, merged by elementwise max (commutative/associative, so
the shuffle moves at most 2^p ints per block regardless of input size),
estimate derived on the driver from the final 2^p-int array.

Everything is DETERMINISTIC and SQL-reproducible so the driver's DuckDB
gate can hash-match the registers exactly:

- hash: ``h = (A*x + B) mod M61`` (Mersenne-61; exact 128-bit-free
  multiply via the rotation property ``v * 2^k mod M61 == rot61(v, k)``,
  see ``_mul_mod_m61``) — DuckDB recomputes it with HUGEINT arithmetic.
- bucket = top ``p`` bits of the 61-bit hash; rho = 1 + count of
  trailing zeros of the remaining bits (sentinel bit keeps it bounded),
  via the branch-free ``bit_count((w & -w) - 1)`` both sides.

No reference counterpart (the reference has no aggregates at all);
this extends the training-data tier mandated by the task.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

M61 = np.uint64((1 << 61) - 1)
HLL_A = np.uint64(6364136223846793005 % ((1 << 61) - 1))
HLL_B = np.uint64(1442695040888963407 % ((1 << 61) - 1))
HLL_A2 = np.uint64(3935559000370003845 % ((1 << 61) - 1))
HLL_B2 = np.uint64(2691343689449507681 % ((1 << 61) - 1))
HLL_XS = 29  # xorshift distance between the two linear rounds


def _mod_m61(z: np.ndarray) -> np.ndarray:
    z = (z & M61) + (z >> np.uint64(61))
    return np.where(z >= M61, z - M61, z)


def _rot61(v: np.ndarray, k: int) -> np.ndarray:
    """(v * 2^k) mod M61 for v < M61: a k-bit rotation within 61 bits
    (2^61 == 1 mod M61) — no 128-bit product needed."""
    k = k % 61
    return ((v << np.uint64(k)) | (v >> np.uint64(61 - k))) & M61


def _mul_mod_m61(a: np.uint64, x: np.ndarray) -> np.ndarray:
    """(a * x) mod M61, exact for a < 2^61, x < 2^61: split x into
    32-bit halves; the high half's 2^32 factor becomes a rotation."""
    x = _mod_m61(x.astype(np.uint64))
    xh = x >> np.uint64(32)
    xl = x & np.uint64(0xFFFFFFFF)
    ah = a >> np.uint64(32)
    al = a & np.uint64(0xFFFFFFFF)
    # a*x = al*xl + 2^32*(al*xh + ah*xl) + 2^64*(ah*xh); each partial
    # product is < 2^61 after its own reduction
    t0 = _mod_m61(al * xl)
    t1 = _rot61(_mod_m61(al * xh + ah * xl), 32)
    t2 = _rot61(_mod_m61(ah * xh), 3)  # 2^64 mod M61 == 2^3
    return _mod_m61(t0 + t1 + t2)


def hll_hash(x: np.ndarray) -> np.ndarray:
    """Deterministic 61-bit hash of an int64/uint64 array, exactly
    reproducible in DuckDB with HUGEINT arithmetic: two linear rounds
    ``(A*v + B) mod (2^61-1)`` separated by ``v ^= v >> 29``. A single
    linear round has perfect rho MARGINALS but correlated (bucket, rho)
    pairs — HLL overestimated by ~50% on dense-int inputs; the xorshift
    breaks the linearity (measured <2% error at p=12, incl. sequential
    ids — see tests/test_round3.py::test_hll_estimate_accuracy)."""
    h = _mod_m61(_mul_mod_m61(HLL_A, x) + HLL_B)
    h = h ^ (h >> np.uint64(HLL_XS))
    return _mod_m61(_mul_mod_m61(HLL_A2, h) + HLL_B2)


def hll_bucket_rho(x: np.ndarray, p: int) -> tuple[np.ndarray, np.ndarray]:
    h = hll_hash(x)
    bucket = (h >> np.uint64(61 - p)).astype(np.int64)
    rest_bits = 61 - p
    w = (h & ((np.uint64(1) << np.uint64(rest_bits)) - np.uint64(1))) | (
        np.uint64(1) << np.uint64(rest_bits)
    )
    # trailing zeros, branch-free: popcount((w & -w) - 1)
    low = w & (np.uint64(0) - w)
    from vaero_ray.stages.dedup import _popcount64

    rho = _popcount64(low - np.uint64(1)) + 1
    return bucket, rho.astype(np.int64)


def hll_registers(ds: rd.Dataset, col: str, p: int = 8) -> rd.Dataset:
    """Dataset of the NONZERO HLL registers of ``col``: one row per
    occupied bucket, ``(bucket, max_rho)``. Two-phase: per-block partial
    registers (vectorized, at most 2^p rows leave each block), tiny
    groupby-max merge. The column must be integer-typed."""

    def partial(tbl: pa.Table) -> pa.Table:
        x = np.asarray(tbl.column(col).to_numpy(zero_copy_only=False)).astype(np.int64)
        if not len(x):
            return pa.table(
                {"bucket": pa.array([], pa.int64()), "max_rho": pa.array([], pa.int64())}
            )
        bucket, rho = hll_bucket_rho(x.astype(np.uint64), p)
        regs = np.zeros(1 << p, dtype=np.int64)
        np.maximum.at(regs, bucket, rho)
        nz = np.flatnonzero(regs)
        return pa.table(
            {"bucket": pa.array(nz, pa.int64()), "max_rho": pa.array(regs[nz], pa.int64())}
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    # native groupby: map-side partial max per block, then a tiny keyed
    # merge — the shuffle moves at most (#blocks x 2^p) small int rows
    merged = partials.groupby("bucket").max("max_rho")

    def rename(tbl: pa.Table) -> pa.Table:
        return tbl.rename_columns(["bucket", "max_rho"])

    return merged.map_batches(rename, batch_format="pyarrow", zero_copy_batch=True)


def hll_estimate(registers: "pd.DataFrame | pa.Table", p: int = 8) -> float:
    """Bias-corrected HLL estimate from a (bucket, max_rho) register
    frame (absent buckets are zero). Standard Flajolet et al. constants
    with the small-range linear-counting correction."""
    if isinstance(registers, pa.Table):
        registers = registers.to_pandas()
    m = 1 << p
    regs = np.zeros(m, dtype=np.int64)
    if len(registers):
        regs[registers["bucket"].to_numpy()] = registers["max_rho"].to_numpy()
    alpha = {4: 0.673, 5: 0.697, 6: 0.709}.get(p, 0.7213 / (1 + 1.079 / m))
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int((regs == 0).sum())
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)  # linear counting
    return float(est)


def approx_distinct(ds: rd.Dataset, col: str, p: int = 12) -> float:
    """Approximate COUNT(DISTINCT col) — one streaming pass, 2^p ints of
    state per block through the merge."""
    return hll_estimate(hll_registers(ds, col, p).to_pandas(), p)


# ------------------------------------------------- deterministic split


def hash_split(
    ds: rd.Dataset,
    id_col: str,
    train_permille: int = 900,
    out: str = "split",
) -> rd.Dataset:
    """Deterministic train/val assignment: ``train`` iff
    ``hll_hash(id) % 1000 < train_permille``. Stateless, stable across
    runs/workers/resumes (the property a training pipeline needs —
    re-sharding the input must not reshuffle the split), SQL-exact."""

    def per_batch(tbl: pa.Table) -> pa.Table:
        x = np.asarray(tbl.column(id_col).to_numpy(zero_copy_only=False)).astype(np.uint64)
        h = hll_hash(x) % np.uint64(1000)
        lab = np.where(h < train_permille, "train", "val")
        return tbl.append_column(out, pa.array(lab.astype(object), pa.string()))

    return ds.map_batches(per_batch, batch_format="pyarrow", zero_copy_batch=True)


# ----------------------------------------------------- count-min sketch

# per-row 2-universal constants: (A_r * x + B_r) mod M61 — a single
# linear round IS the textbook CMS hash family (pairwise independence is
# exactly what the CMS error bound needs), and it keeps the SQL oracle a
# one-liner per row
CMS_A = tuple(
    np.uint64(v % ((1 << 61) - 1))
    for v in (
        6364136223846793005,
        3935559000370003845,
        2862933555777941757,
        3202034522624059733,
    )
)
CMS_B = tuple(
    np.uint64(v % ((1 << 61) - 1))
    for v in (
        1442695040888963407,
        2691343689449507681,
        7046029254386353087,
        5459299619059547329,
    )
)


def cms_slots(x: np.ndarray, row: int, width: int) -> np.ndarray:
    """Row-``row`` CMS slot of each value: ((A_r*x + B_r) mod M61) mod w."""
    h = _mod_m61(_mul_mod_m61(CMS_A[row], x) + CMS_B[row])
    return (h % np.uint64(width)).astype(np.int64)


def cms_registers(ds: rd.Dataset, col: str, width: int = 1024, depth: int = 4) -> rd.Dataset:
    """Count-Min registers of ``col``: one output row per NONZERO counter,
    ``(row, slot, cnt)``. Mergeable by SUM (commutative/associative), so
    per-block partials bound the shuffle to depth x width small ints per
    block regardless of input size. Estimates from the merged registers:
    ``cms_estimate``. The column must be integer-typed."""
    from ray.data.aggregate import Sum

    def partial(tbl: pa.Table) -> pa.Table:
        x = np.asarray(tbl.column(col).to_numpy(zero_copy_only=False)).astype(np.int64)
        if not len(x):
            return pa.table(
                {
                    "row": pa.array([], pa.int64()),
                    "slot": pa.array([], pa.int64()),
                    "cnt": pa.array([], pa.int64()),
                }
            )
        xu = x.astype(np.uint64)
        counters = np.empty((depth, width), dtype=np.int64)
        for r in range(depth):
            # bincount = vectorized histogram (np.add.at is a scalar
            # scatter loop and ~10x slower at this width)
            counters[r] = np.bincount(cms_slots(xu, r, width), minlength=width)
        rows, slots = np.nonzero(counters)
        return pa.table(
            {
                "row": pa.array(rows.astype(np.int64), pa.int64()),
                "slot": pa.array(slots.astype(np.int64), pa.int64()),
                "cnt": pa.array(counters[rows, slots], pa.int64()),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    merged = partials.groupby(["row", "slot"]).aggregate(Sum("cnt", alias_name="cnt"))
    return merged


def cms_estimate(
    registers: "pd.DataFrame | pa.Table", keys: np.ndarray, width: int = 1024, depth: int = 4
) -> np.ndarray:
    """Point frequency estimates (upper bounds; min over rows) for
    ``keys`` from merged (row, slot, cnt) registers."""
    if isinstance(registers, pa.Table):
        registers = registers.to_pandas()
    counters = np.zeros((depth, width), dtype=np.int64)
    if len(registers):
        counters[registers["row"].to_numpy(), registers["slot"].to_numpy()] = registers[
            "cnt"
        ].to_numpy()
    keys = np.asarray(keys).astype(np.uint64)
    est = np.full(len(keys), np.iinfo(np.int64).max, dtype=np.int64)
    for r in range(depth):
        np.minimum(est, counters[r, cms_slots(keys, r, width)], out=est)
    return est


# ------------------------------------------- log-histogram quantiles

_LHQ_SUB = 3  # sub-bits after the MSB: <= 2^-4 relative bin width


def lhq_bins(v: np.ndarray) -> np.ndarray:
    """Log-histogram bin of each NON-NEGATIVE int: values < 8 get their
    own bin; otherwise bin = (bit_length << 3) | (3 bits after the MSB),
    a <=6.25%-relative-width bucket. Pure integer both sides — the SQL
    twin is ``length(bin(v))`` plus shifts (no float log2 whose edge
    rounding could disagree)."""
    v = np.asarray(v).astype(np.int64)
    if len(v) and int(v.min()) < 0:
        raise ValueError("lhq_bins: negative values unsupported")
    pow2 = np.left_shift(np.int64(1), np.arange(63, dtype=np.int64))
    bl = np.searchsorted(pow2, v, side="right").astype(np.int64)  # bit_length
    small = v < 8
    sub = (v >> np.maximum(bl - 4, 0)) & 7
    return np.where(small, v, (bl << _LHQ_SUB) | sub)


def lhq_bounds(bins: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Inclusive-lo / exclusive-hi value range of each bin id."""
    bins = np.asarray(bins).astype(np.int64)
    bl = bins >> _LHQ_SUB
    sub = bins & 7
    lo = np.where(bins < 8, bins, (8 + sub) << np.maximum(bl - 4, 0))
    width = np.where(bins < 8, 1, np.left_shift(np.int64(1), np.maximum(bl - 4, 0)))
    return lo, lo + width


def lhq_registers(ds: rd.Dataset, col: str) -> rd.Dataset:
    """Mergeable-by-SUM log-histogram of a non-negative int column: one
    row per occupied bin, ``(bin, cnt)``. Per-block partials bound the
    shuffle to occupied-bins rows per block (<= ~500 for int64 range)."""
    from ray.data.aggregate import Sum

    def partial(tbl: pa.Table) -> pa.Table:
        x = np.asarray(tbl.column(col).to_numpy(zero_copy_only=False))
        if not len(x):
            return pa.table(
                {"bin": pa.array([], pa.int64()), "cnt": pa.array([], pa.int64())}
            )
        ub, uc = np.unique(lhq_bins(x), return_counts=True)
        return pa.table({"bin": pa.array(ub, pa.int64()), "cnt": pa.array(uc, pa.int64())})

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return partials.groupby("bin").aggregate(Sum("cnt", alias_name="cnt"))


def lhq_quantiles(registers: "pd.DataFrame | pa.Table", qs) -> np.ndarray:
    """Quantile estimates from merged (bin, cnt) registers: rank walk
    over the sorted bins, linear interpolation inside the hit bin
    (<=6.25% relative error by bin construction)."""
    if isinstance(registers, pa.Table):
        registers = registers.to_pandas()
    df = registers.sort_values("bin")
    bins = df["bin"].to_numpy()
    cnt = df["cnt"].to_numpy().astype(np.float64)
    n = cnt.sum()
    if n == 0:
        return np.full(len(list(qs)), np.nan)
    lo, hi = lhq_bounds(bins)
    cum = np.cumsum(cnt)
    out = np.empty(len(list(qs)), dtype=np.float64)
    for i, q in enumerate(qs):
        rank = q * (n - 1)
        j = int(np.searchsorted(cum, rank + 1e-9, side="left"))
        j = min(j, len(bins) - 1)
        prev = cum[j - 1] if j else 0.0
        frac = (rank - prev) / cnt[j] if cnt[j] else 0.0
        out[i] = lo[j] + frac * (hi[j] - lo[j])
    return out


def hll_registers_by(ds: rd.Dataset, col: str, group: str, p: int = 8) -> rd.Dataset:
    """Per-GROUP HLL registers: ``(group, bucket, max_rho)`` — the
    sketch composed with a keyed aggregate (approximate distinct-per-key
    at corpus scale; the exact salted-distinct operator is the small-
    cardinality alternative). Shuffle moves at most groups x 2^p small
    rows per block."""
    import pyarrow.compute as pc

    def partial(tbl: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                group: pa.array([], tbl.schema.field(group).type),
                "bucket": pa.array([], pa.int64()),
                "max_rho": pa.array([], pa.int64()),
            }
        )
        if not tbl.num_rows:
            return empty
        x = np.asarray(tbl.column(col).to_numpy(zero_copy_only=False)).astype(np.int64)
        bucket, rho = hll_bucket_rho(x.astype(np.uint64), p)
        enc = pc.dictionary_encode(tbl.column(group).combine_chunks())
        gcodes = np.asarray(enc.indices).astype(np.int64)
        gvals = enc.dictionary
        key = gcodes << np.int64(p) | bucket
        uk, inv = np.unique(key, return_inverse=True)
        maxr = np.zeros(len(uk), dtype=np.int64)
        np.maximum.at(maxr, inv, rho)
        return pa.table(
            {
                group: gvals.take(pa.array(uk >> np.int64(p), pa.int64())),
                "bucket": pa.array(uk & ((1 << p) - 1), pa.int64()),
                "max_rho": pa.array(maxr, pa.int64()),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    merged = partials.groupby([group, "bucket"]).max("max_rho")

    def rename(tbl: pa.Table) -> pa.Table:
        return tbl.rename_columns([group, "bucket", "max_rho"])

    return merged.map_batches(rename, batch_format="pyarrow", zero_copy_batch=True)


# --------------------------------------------------------- bloom filter

_BLOOM_K = 3  # hash functions; FPR ~ (1 - e^{-kn/m})^k
_WORD_BITS = 62  # usable bits per int64 word (sign + top bit avoided so
#                  the SQL twin's 1::BIGINT << b never overflows)


def bloom_positions(x: np.ndarray, m_bits: int, r: int) -> np.ndarray:
    """Bit position of value ``x`` under hash ``r`` (reuses the CMS
    2-universal family — independent constants per r)."""
    h = _mod_m61(_mul_mod_m61(CMS_A[r], x) + CMS_B[r])
    return (h % np.uint64(m_bits)).astype(np.int64)


def bloom_registers(
    ds: rd.Dataset, col: str, m_bits: int = 1 << 16, merge: str = "bucketed"
) -> rd.Dataset:
    """Bloom-filter registers of ``col``: one row per NONZERO 62-bit
    word, ``(word, bits)``. Mergeable by bitwise OR (idempotent +
    commutative), so per-block partials bound the shuffle to m/62 small
    ints per block — the pre-filter a 100-TB decontamination pass ships
    to every worker instead of the raw key set.

    ``merge="bucketed"`` (default) is the fully distributed shuffle
    merge. ``merge="task"`` ORs all partial blocks in ONE Ray task over
    block refs (no shuffle, no driver copy) — right for the prefilter
    path where the partial count is modest (each partial is <= m/62
    rows; fine to a few thousand blocks, like graph.connected_components'
    single-task mode)."""
    from vaero_ray.stages.keyed import bucketed_map_groups

    n_words = (m_bits + _WORD_BITS - 1) // _WORD_BITS

    def partial(tbl: pa.Table) -> pa.Table:
        empty = pa.table({"word": pa.array([], pa.int64()), "bits": pa.array([], pa.int64())})
        if not tbl.num_rows:
            return empty
        x = np.asarray(tbl.column(col).to_numpy(zero_copy_only=False)).astype(np.uint64)
        words = np.zeros(n_words, dtype=np.int64)
        for r in range(_BLOOM_K):
            pos = bloom_positions(x, m_bits, r)
            np.bitwise_or.at(words, pos // _WORD_BITS, np.int64(1) << (pos % _WORD_BITS))
        nz = np.flatnonzero(words)
        return pa.table({"word": pa.array(nz, pa.int64()), "bits": pa.array(words[nz], pa.int64())})

    def _merge_bits(df: pd.DataFrame) -> pd.DataFrame:
        out = (
            df.groupby("word", sort=False)["bits"]
            .agg(lambda s: np.bitwise_or.reduce(s.to_numpy()))
            .reset_index()
        )
        return out.astype({"word": "int64", "bits": "int64"})

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    if merge == "task":
        import ray

        @ray.remote
        def or_all(*tbls: pa.Table) -> pa.Table:
            words = np.zeros(n_words, dtype=np.int64)
            for t in tbls:
                if t.num_rows:  # empty blocks carry NO columns
                    np.bitwise_or.at(
                        words, t.column("word").to_numpy(), t.column("bits").to_numpy()
                    )
            nz = np.flatnonzero(words)
            return pa.table(
                {"word": pa.array(nz, pa.int64()), "bits": pa.array(words[nz], pa.int64())}
            )

        return rd.from_arrow_refs([or_all.remote(*partials.to_arrow_refs())])
    return bucketed_map_groups(partials, "word", _merge_bits, num_buckets=4)


def kmv_minima(ds: rd.Dataset, col: str, k: int = 256) -> rd.Dataset:
    """K-minimum-values distinct sketch: the ``k`` smallest DISTINCT
    61-bit hash values of ``col`` across the whole dataset, as
    ``(rk, hv)`` rows (rk 0..k-1 ascending). Mergeable by
    union→unique→bottom-k (commutative/associative/idempotent), so each
    block contributes at most ``k`` int64 values regardless of its size
    — the third mergeable-distinct shape beside HLL (register max) and
    Bloom (word OR), and the one that also supports set operations
    (union/intersection estimates from merged minima).

    Merge is ONE Ray task over the partial block refs (≤ k ints each,
    same recipe as ``bloom_registers(merge="task")``) — no shuffle, no
    driver copy. Distinct-count estimate: see ``kmv_estimate``. Both
    the minima and the estimate are integer-exact and SQL-reproducible
    (same strengthened M61 hash as HLL)."""
    import ray

    def partial(tbl: pa.Table) -> pa.Table:
        if not tbl.num_rows:
            return pa.table({"hv": pa.array([], pa.int64())})
        x = np.asarray(tbl.column(col).to_numpy(zero_copy_only=False)).astype(np.uint64)
        h = np.unique(hll_hash(x))  # unique returns sorted ascending
        return pa.table({"hv": pa.array(h[:k].astype(np.int64), pa.int64())})

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)

    @ray.remote
    def bottom_k(*tbls: pa.Table) -> pa.Table:
        parts = [t.column("hv").to_numpy() for t in tbls if t.num_rows]
        if not parts:
            return pa.table(
                {"rk": pa.array([], pa.int64()), "hv": pa.array([], pa.int64())}
            )
        h = np.unique(np.concatenate(parts))[:k]
        return pa.table(
            {"rk": pa.array(np.arange(len(h), dtype=np.int64), pa.int64()),
             "hv": pa.array(h, pa.int64())}
        )

    return rd.from_arrow_refs([bottom_k.remote(*partials.to_arrow_refs())])


def kmv_estimate(minima: "pd.DataFrame | pa.Table", k: int = 256) -> float:
    """Distinct-count estimate from KMV minima: if the k-th smallest of
    n uniform hashes in [0, M61) is h_k, then n ≈ (k-1) * M61 / h_k
    (the unbiased KMV estimator). Falls back to the exact count when
    fewer than ``k`` distinct values exist (the minima ARE the set)."""
    if isinstance(minima, pa.Table):
        hv = minima.column("hv").to_numpy()
    else:
        hv = minima["hv"].to_numpy()
    if len(hv) < k:
        return float(len(hv))
    return (k - 1) * float(M61) / float(hv[k - 1])


def bloom_may_contain(
    registers: "pd.DataFrame | pa.Table", keys: np.ndarray, m_bits: int = 1 << 16
) -> np.ndarray:
    """Membership test against merged (word, bits) registers: True = may
    be present (false positives possible), False = DEFINITELY absent."""
    if isinstance(registers, pa.Table):
        registers = registers.to_pandas()
    n_words = (m_bits + _WORD_BITS - 1) // _WORD_BITS
    words = np.zeros(n_words, dtype=np.int64)
    if len(registers):
        words[registers["word"].to_numpy()] = registers["bits"].to_numpy()
    keys = np.asarray(keys).astype(np.uint64)
    ok = np.ones(len(keys), dtype=bool)
    for r in range(_BLOOM_K):
        pos = bloom_positions(keys, m_bits, r)
        ok &= (words[pos // _WORD_BITS] >> (pos % _WORD_BITS)) & 1 == 1
    return ok


def fixed_histogram(
    ds: rd.Dataset,
    col: str,
    lo: int,
    width: int,
    nbins: int,
) -> rd.Dataset:
    """EXACT fixed-width histogram of an integer column: bin
    ``clamp((v - lo) // width, 0, nbins - 1)`` (underflow in bin 0,
    overflow in the last bin — SQL LEAST/GREATEST), one output row per
    OCCUPIED bin ``(bin, bin_lo, cnt)``. Pure integer arithmetic, so
    results hash identically across engines.

    Sum-mergeable like the log-histogram sketch: per-block bincount
    partials (<= nbins rows leave any block), one tiny groupby merge —
    the fixed-memory shape at any corpus size. Unlike ``lhq_registers``
    the bin edges are user-chosen, the usual front-end for length /
    score distribution dashboards."""
    from ray.data.aggregate import Sum

    if width <= 0 or nbins <= 0:
        raise ValueError("fixed_histogram: width and nbins must be positive")

    def partial(tbl: pa.Table) -> pa.Table:
        empty = pa.table({"bin": pa.array([], pa.int64()), "cnt": pa.array([], pa.int64())})
        if not tbl.num_rows:
            return empty
        x = tbl.column(col).to_numpy(zero_copy_only=False).astype(np.int64)
        # floor division matches SQL (v - lo) // width only for v >= lo;
        # clamping to bin 0 first makes the negative branch irrelevant
        b = np.clip((x - lo) // width, 0, nbins - 1)
        c = np.bincount(b, minlength=nbins).astype(np.int64)
        occ = np.flatnonzero(c)
        return pa.table({"bin": pa.array(occ), "cnt": pa.array(c[occ])})

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    merged = partials.groupby("bin").aggregate(Sum("cnt", alias_name="cnt"))

    def finalize(tbl: pa.Table) -> pa.Table:
        b = tbl.column("bin").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "bin": pa.array(b),
            "bin_lo": pa.array(lo + b * width),
            "cnt": tbl.column("cnt").cast(pa.int64()),
        })

    return merged.map_batches(finalize, batch_format="pyarrow", zero_copy_batch=True)


def heavy_hitters(ds: rd.Dataset, col: str, k: int) -> rd.Dataset:
    """EXACT phi-heavy hitters: every ``col`` value whose global count
    strictly exceeds n/k, with its exact count — the sketch-prune +
    exact-verify pattern (Misra-Gries / space-saving family) that keeps
    the exchange bounded at any corpus size.

    Pass 1 (prune): each block emits values whose LOCAL count exceeds
    block_n/k. By the averaging argument, sum(c_b) > sum(n_b)/k implies
    c_b > n_b/k in at least one block, so the union of local candidates
    contains EVERY global heavy hitter (no false negatives) and each
    block emits at most k-1 rows — the same guarantee a merged
    Misra-Gries summary gives, in one vectorized np.unique pass with no
    counter-decrement loop.

    Pass 2 (verify): the candidate set (<= k-1 per block, deduped) is
    broadcast via ray.put; each block counts ONLY candidates, a tiny
    keyed sum merges, and the n/k threshold filters on exact totals —
    false positives from the prune die here. n comes from dataset
    metadata (ds.count()), not a scan.

    Output: ``(col, n_events)`` for qualifying values. Everything is
    integer counts, so results hash identically to the SQL
    ``GROUP BY .. HAVING COUNT(*) * k > n`` oracle.
    """
    import ray
    from ray.data.aggregate import Sum

    if k <= 1:
        raise ValueError("heavy_hitters: k must be > 1")

    def local_candidates(tbl: pa.Table) -> pa.Table:
        x = tbl.column(col).to_numpy(zero_copy_only=False)
        vals, cnt = np.unique(x, return_counts=True)
        keep = cnt * k > len(x)  # strict local threshold
        return pa.table({col: pa.array(vals[keep])})

    cand_rows = ds.map_batches(
        local_candidates, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()  # bounded: <= (k-1) * num_blocks candidate VALUES, not data
    cand = np.unique(np.array([r[col] for r in cand_rows]))
    n_total = ds.count()
    cand_ref = ray.put(cand)

    def count_candidates(tbl: pa.Table) -> pa.Table:
        c = ray.get(cand_ref)
        x = tbl.column(col).to_numpy(zero_copy_only=False)
        if not len(c):
            return pa.table({col: pa.array([], tbl.schema.field(col).type),
                             "__n": pa.array([], pa.int64())})
        pos = np.searchsorted(c, x)
        pos[pos == len(c)] = 0
        hit = c[pos] == x
        counts = np.bincount(pos[hit], minlength=len(c)).astype(np.int64)
        occ = np.flatnonzero(counts)
        return pa.table({col: pa.array(c[occ]), "__n": pa.array(counts[occ])})

    partials = ds.map_batches(
        count_candidates, batch_format="pyarrow", zero_copy_batch=True
    )
    merged = partials.groupby(col).aggregate(Sum("__n", alias_name="n_events"))

    def finalize(tbl: pa.Table) -> pa.Table:
        nn = tbl.column("n_events").cast(pa.int64())
        keep = pa.compute.greater(
            pa.compute.multiply(nn, pa.scalar(k, pa.int64())),
            pa.scalar(int(n_total), pa.int64()),
        )
        return pa.table({col: tbl.column(col), "n_events": nn}).filter(keep)

    return merged.map_batches(finalize, batch_format="pyarrow", zero_copy_batch=True)


def quantile_band_bounds(
    ds: rd.Dataset, col: str, lo_permille: int, hi_permille: int
) -> tuple[int, int]:
    """Value band [lo, hi) covering the [lo_permille, hi_permille]
    quantile range of a non-negative int column, resolved from the
    log-histogram sketch: lo = the inclusive lower bound of the first
    bin whose cumulative count reaches ceil(lo_permille*N/1000), hi =
    the exclusive upper bound of the first bin reaching
    ceil(hi_permille*N/1000). Bin-resolution (<=6.25% relative) rather
    than exact rank — the standard sketch/filter trade. All integer, so
    Ray and SQL agree bit-for-bit. Only occupied-bin registers reach
    the driver (<= ~500 rows)."""
    regs = sorted(
        (int(r["bin"]), int(r["cnt"])) for r in lhq_registers(ds, col).take_all()
    )
    if not regs:
        raise ValueError("quantile_band_bounds: empty input")
    n = sum(c for _, c in regs)
    k_lo = (lo_permille * n + 999) // 1000
    k_hi = (hi_permille * n + 999) // 1000
    cum = 0
    b_lo = b_hi = None
    for b, c in regs:
        cum += c
        if b_lo is None and cum >= k_lo:
            b_lo = b
        if b_hi is None and cum >= k_hi:
            b_hi = b
            break
    lo = int(lhq_bounds(np.array([b_lo]))[0][0])
    hi = int(lhq_bounds(np.array([b_hi]))[1][0])
    return lo, hi


def quantile_band_filter(
    ds: rd.Dataset, col: str, lo_permille: int, hi_permille: int
) -> rd.Dataset:
    """Keep rows whose ``col`` lies in the sketch-derived quantile band
    (e.g. drop the shortest 5% and longest 5% of documents — the
    outlier-length filter of corpus curation). Two passes: the register
    aggregate (tiny driver merge), then a stateless vectorized filter —
    no shuffle in either."""
    lo, hi = quantile_band_bounds(ds, col, lo_permille, hi_permille)

    def keep(tbl: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        v = tbl.column(col)
        return tbl.filter(pc.and_(pc.greater_equal(v, lo), pc.less(v, hi)))

    return ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)


def kmv_minima_by_key(ds: rd.Dataset, key: str, col: str, k: int = 64) -> rd.Dataset:
    """GROUPED K-minimum-values sketch: per ``key``, the ``k`` smallest
    distinct 61-bit hashes of ``col`` — the per-group distinct sketch
    beside ``hll_registers_by_key`` (register max) with KMV's set-ops
    bonus. Per-block partials keep at most k hashes PER (block, key);
    the merge is the same union→unique→bottom-k fold keyed on ``key``
    through one bounded exchange. Output (key, rk, hv) rows, rk 0..<k
    ascending per key — integer-exact and SQL-reproducible."""
    from vaero_ray.stages.keyed import bucketed_map_groups

    def bottomk_df(df: pd.DataFrame) -> pd.DataFrame:
        kv = df[[key, "hv"]].drop_duplicates().sort_values(
            [key, "hv"], kind="mergesort"
        )
        codes = pd.factorize(kv[key], use_na_sentinel=False)[0]
        gs = np.r_[True, codes[1:] != codes[:-1]] if len(kv) else np.zeros(0, bool)
        starts = np.flatnonzero(gs)
        rk = np.arange(len(kv), dtype=np.int64) - np.repeat(
            starts, np.diff(np.r_[starts, len(kv)])
        ) if len(kv) else np.zeros(0, np.int64)
        out = kv.iloc[rk < k].copy()
        out["rk"] = rk[rk < k]
        return out[[key, "rk", "hv"]]

    def partial(tbl: pa.Table) -> pa.Table:
        if not tbl.num_rows:
            return pa.table(
                {key: tbl.column(key), "rk": pa.array([], pa.int64()),
                 "hv": pa.array([], pa.int64())}
            )
        x = np.asarray(tbl.column(col).to_numpy(zero_copy_only=False)).astype(np.uint64)
        df = pd.DataFrame(
            {key: tbl.column(key).to_pandas(),
             "hv": hll_hash(x).astype(np.int64)}
        )
        return pa.Table.from_pandas(bottomk_df(df), preserve_index=False)

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return bucketed_map_groups(partials, key, bottomk_df, num_buckets=4)


def kmv_overlap_stats(
    minima_a: np.ndarray, minima_b: np.ndarray, k: int
) -> dict:
    """Set-operation estimates from two KMV sketches (the k smallest
    distinct hashes of sets A and B) — the payoff KMV has over HLL:
    bottom-k(A ∪ B) is computable from the two sketches alone
    (any union-bottom-k hash belonging to A is necessarily in A's own
    bottom-k), so union size, Jaccard and intersection all derive from
    ≤2k integers. Sides with fewer than k distinct values are legal
    (bottom-k = the whole side, same as the SQL LIMIT-k).

    Returns exact ints (h_k of each sketch and of the union, the shared
    count among the union bottom-k) plus the closed-form float
    estimates, expression-ordered identically to the SQL twin:
    ``est = ((k-1) * M61) / h_k``, ``jaccard = n_shared / k``,
    ``est_intersection = (n_shared / k) * (((k-1) * M61) / h_union_k)``."""
    a = np.unique(minima_a.astype(np.int64))[:k]
    b = np.unique(minima_b.astype(np.int64))[:k]
    if not len(a) or not len(b):
        raise ValueError("kmv_overlap_stats needs at least one value per side")
    # fewer than k distinct values on a side is legal: the bottom-k IS
    # the whole set, h_k = its max, and the closed forms below (which
    # keep the k / k-1 constants) match the SQL twin's LIMIT-k verbatim
    # — the estimator is then an overcount, but both engines agree
    u = np.unique(np.concatenate([a, b]))[:k]
    shared = np.intersect1d(u, a, assume_unique=True)
    n_shared = int(np.isin(shared, b, assume_unique=True).sum())
    hk_a, hk_b, hk_u = int(a[-1]), int(b[-1]), int(u[-1])
    md = float(M61)
    est_a = ((k - 1) * md) / hk_a
    est_b = ((k - 1) * md) / hk_b
    est_u = ((k - 1) * md) / hk_u
    jac = n_shared / k
    est_i = (n_shared / k) * (((k - 1) * md) / hk_u)
    return {
        "hk_a": hk_a, "hk_b": hk_b, "hk_union": hk_u, "n_shared": n_shared,
        "est_a": round(est_a, 4), "est_b": round(est_b, 4),
        "est_union": round(est_u, 4), "jaccard": round(jac, 6),
        "est_intersection": round(est_i, 4),
    }


def cms_inner_product(
    regs_a: "pd.DataFrame | pa.Table",
    regs_b: "pd.DataFrame | pa.Table | None" = None,
    width: int = 1024,
    depth: int = 4,
) -> int:
    """Inner-product estimate from Count-Min registers: for frequency
    vectors f, g of two streams, ``min_r sum_slot a_r[slot]*b_r[slot]``
    upper-bounds ``sum_x f(x)*g(x)`` (Cormode-Muthukrishnan) — with
    ``regs_b=None`` the SELF product, i.e. the equi-self-join size
    estimate sum f(x)^2, the cardinality-estimation primitive a query
    planner uses to size a join. Integer-exact: registers are exact
    int64 counts, so both engines compute the identical estimate."""
    def load(regs) -> np.ndarray:
        if isinstance(regs, pa.Table):
            regs = regs.to_pandas()
        c = np.zeros((depth, width), dtype=np.int64)
        if len(regs):
            c[regs["row"].to_numpy(), regs["slot"].to_numpy()] = regs["cnt"].to_numpy()
        return c

    a = load(regs_a)
    b = a if regs_b is None else load(regs_b)
    return int(min(int(np.dot(a[r], b[r])) for r in range(depth)))
