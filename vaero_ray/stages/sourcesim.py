"""Corpus-level similarity between groups of documents via GROUPED
minhash: one signature per group (source/domain/shard), sig[j] = min
over every shingle of every doc in the group of perm_j(shingle_hash).
Estimated Jaccard between two groups' shingle SETS = fraction of
agreeing signature positions — the standard corpus-overlap /
source-contamination scan, at a cost of one scan + a register-sized
exchange instead of a cross-corpus pairwise join.

min composes over any partition of the rows, so per-batch partial
registers (group, perm, min) merge exactly with a native groupby.min —
the registers-as-rows pattern (see stages/sketch.py). Only
groups x num_perm register rows ever leave a block.

SQL-exact by construction: shingles are lowercased whitespace-token
k-grams joined by ' ' (identical to the n-gram oracle construction in
queries.SQL_MINHASH_WORD), hashed with the base-31-mod-M31 polynomial
char fold (convstats.turn_hash), permuted with (a_j*h + b_j) mod M31 —
products < 2^62, so plain BIGINT arithmetic on both sides.

No reference counterpart; extends the dedup/corpus-analytics tier
mandated by the task.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from vaero_ray.stages.convstats import M31, turn_hash

NUM_PERM = 32
_rng = np.random.default_rng(0x5EED5)
SS_A = _rng.integers(1, M31, NUM_PERM).astype(np.int64)
SS_B = _rng.integers(0, M31, NUM_PERM).astype(np.int64)


def _shingle_strings(tbl: pa.Table, text_col: str, k: int) -> tuple[pa.Array, np.ndarray]:
    """(flat shingle strings, per-doc shingle counts): lowercased
    whitespace-token k-grams joined by ' '."""
    import pyarrow.compute as pc

    from vaero_ray.stages.dedup import _flat_tokens, _seg_arange

    toks, off = _flat_tokens(tbl, text_col)
    counts = off[1:] - off[:-1]
    s = np.maximum(counts - k + 1, 0)
    if not s.sum():
        return pa.array([], pa.string()), s
    pos = np.repeat(off[:-1], s) + _seg_arange(s)
    parts = [pc.take(toks, pa.array(pos + j)) for j in range(k)]
    # separator must match the token type (large_string corpora would
    # otherwise hit "no kernel matching input types (..., string)")
    sep = pa.scalar(" ", type=parts[0].type)
    return pc.binary_join_element_wise(*parts, sep), s


def grouped_minhash_registers(
    ds: rd.Dataset, group_col: str, text_col: str, shingle_k: int = 3
) -> rd.Dataset:
    """(group, perm, sig) register rows: the grouped minhash signature,
    merged exactly across blocks by min."""

    def partial(tbl: pa.Table) -> pa.Table:
        shingles, s = _shingle_strings(tbl, text_col, shingle_k)
        if not len(shingles):
            return pa.table(
                {
                    group_col: pa.array([], tbl.schema.field(group_col).type),
                    "perm": pa.array([], pa.int64()),
                    "sig": pa.array([], pa.int64()),
                }
            )
        h = turn_hash(pa.table({"__t": shingles}), "__t", "h").column("h").to_numpy()
        grp = tbl.column(group_col).to_pandas().to_numpy()
        gcodes, guniq = pd.factorize(np.repeat(grp, s))
        order = np.argsort(gcodes, kind="stable")
        hs = h[order]
        starts = np.flatnonzero(np.r_[True, gcodes[order][1:] != gcodes[order][:-1]])
        n_g = len(starts)
        from vaero_ray.stages.dedup import _mod_mersenne31

        sigs = np.empty((n_g, NUM_PERM), dtype=np.int64)
        for j in range(NUM_PERM):
            # shift-add Mersenne fold, not numpy % (a scalar-division
            # loop): a*h + b < M31^2 + M31 < 2^62, so one fold is exact
            sigs[:, j] = np.minimum.reduceat(
                _mod_mersenne31(SS_A[j] * hs + SS_B[j]), starts
            )
        return pa.table(
            {
                group_col: pa.array(np.repeat(guniq[gcodes[order][starts]], NUM_PERM)),
                "perm": pa.array(np.tile(np.arange(NUM_PERM, dtype=np.int64), n_g)),
                "sig": pa.array(sigs.reshape(-1), pa.int64()),
            }
        )

    from ray.data.aggregate import Min

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return partials.groupby([group_col, "perm"]).aggregate(Min("sig", alias_name="sig"))


def source_similarity(
    ds: rd.Dataset, group_col: str, text_col: str, shingle_k: int = 3
) -> pa.Table:
    """Pairwise estimated-Jaccard table over all group pairs (a < b):
    (group_a, group_b, n_agree, est_permille). The register merge is
    distributed; the pairwise agreement runs on the driver over the
    groups x num_perm register rows (metadata scale — the same contract
    as the sketch tier's driver merges)."""
    regs = grouped_minhash_registers(ds, group_col, text_col, shingle_k).take_all()
    by_group: dict = {}
    for r in regs:
        by_group.setdefault(r[group_col], np.zeros(NUM_PERM, np.int64))[r["perm"]] = r["sig"]
    names = sorted(by_group)
    ga, gb, agree = [], [], []
    for i, a in enumerate(names):
        for b in names[i + 1 :]:
            ga.append(a)
            gb.append(b)
            agree.append(int((by_group[a] == by_group[b]).sum()))
    n_agree = np.array(agree, np.int64)
    return pa.table(
        {
            "group_a": pa.array(ga),
            "group_b": pa.array(gb),
            "n_agree": pa.array(n_agree, pa.int64()),
            "est_permille": pa.array(n_agree * 1000 // NUM_PERM, pa.int64()),
        }
    )
