"""Corpus-curation selection ops (C4/Gopher-style pipeline stages).

``cap_per_key``: keep at most ``cap`` rows per key (e.g. max N documents
per source domain — the standard anti-template / anti-spam cap in web
corpus construction). Deterministic: survivors are the ``cap`` smallest
``(order_col, tie_col)`` rows per key, so re-runs and re-shards agree
(pass ``tie_col`` when ``order_col`` is not unique per key).

Scale shape: a per-block PARTIAL prune first (the global smallest-cap set
of a key is a subset of the union of per-block smallest-cap sets), so at
most ``cap`` rows per (block, key) enter the single bucketed shuffle —
the exchange is bounded by blocks x keys_per_block x cap regardless of
how hot a key is.

No reference counterpart (the reference has no keyed selection); extends
the training-data tier mandated by the task.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from vaero_ray.stages.keyed import bucketed_map_groups


def _group_positions(t: pa.Table, key: str) -> "np.ndarray":
    """0-based within-group position per row of a table ALREADY sorted
    with ``key`` as the primary sort column: dictionary-encode the key
    (equal keys -> equal codes, contiguous post-sort; nulls -> one -1
    run, also contiguous since nulls sort together) and run one numpy
    segment cumcount. No pandas conversion of the block."""
    codes = pc.dictionary_encode(t.column(key).combine_chunks()).indices.to_numpy(
        zero_copy_only=False
    )
    codes = np.where(pd.isna(codes), -1, codes).astype(np.int64)
    n = len(codes)
    idx = np.arange(n)
    seg_first = np.r_[True, codes[1:] != codes[:-1]]
    return idx - np.maximum.accumulate(np.where(seg_first, idx, 0))


def cap_per_key(
    ds: rd.Dataset,
    key: str,
    cap: int,
    order_col: str,
    num_buckets: int | None = None,
    tie_col: str | None = None,
) -> rd.Dataset:
    """Keep the ``cap`` lowest-``order_col`` rows of each ``key`` group.

    Determinism: survivors are a pure function of the data ONLY when the
    sort key is unique per group — pass ``tie_col`` (a unique row id) to
    break ``order_col`` ties deterministically. Without it, ties at the
    cap boundary are broken by block arrival order, so re-runs /
    re-sharding may pick different survivors among tied rows.

    Partitioning assumption: the PRUNED rows of one bucket (<= cap per
    key) fit in one task's heap — num_buckets >= keys / (task_mem /
    (cap * row_bytes)).
    """
    sort_cols = [order_col] if tie_col is None else [order_col, tie_col]

    def prune(tbl: pa.Table) -> pa.Table:
        # Arrow-native per-block combiner: smallest cap per key. Sorting
        # key-first does not change the survivor set (per-key order under
        # sort_cols is preserved), and the order-sensitive `final` below
        # re-sorts inside its bucket anyway.
        if not tbl.num_rows:
            return tbl
        order = [(key, "ascending")] + [(c, "ascending") for c in sort_cols]
        t = tbl.take(pc.sort_indices(tbl, sort_keys=order))
        return t.filter(pa.array(_group_positions(t, key) < cap))

    def final(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.sort_values(sort_cols, kind="stable")
            .groupby(key, sort=False, dropna=False)
            .head(cap)
            .reset_index(drop=True)
        )

    partial = ds.map_batches(prune, batch_format="pyarrow", zero_copy_batch=True)
    return bucketed_map_groups(partial, key, final, num_buckets=num_buckets)


def stratified_sample(
    ds: rd.Dataset,
    id_col: str,
    strata_col: str,
    permille: dict[str, int],
    default_permille: int = 1000,
) -> rd.Dataset:
    """Deterministic per-stratum downsampling — the data-mixing knob of
    a training corpus (e.g. keep 100% of books, 30% of web crawl). A row
    survives iff ``hash(id) % 1000 < permille[stratum]``: a pure
    function of the row, so the sample is stable across runs, workers
    and re-sharding, and nested rates are nested samples (a 300-permille
    sample is a subset of the 600-permille one). Stateless map — no
    shuffle."""
    import numpy as np
    import pyarrow as pa_

    from vaero_ray.stages.sketch import hll_hash

    def per_batch(tbl: pa_.Table) -> pa_.Table:
        x = np.asarray(tbl.column(id_col).to_numpy(zero_copy_only=False)).astype(np.uint64)
        h = (hll_hash(x) % np.uint64(1000)).astype(np.int64)
        strata = tbl.column(strata_col).to_pandas().to_numpy()
        limits = np.full(len(h), default_permille, dtype=np.int64)
        for s, r in permille.items():
            limits[strata == s] = r
        return tbl.filter(pa_.array(h < limits))

    return ds.map_batches(per_batch, batch_format="pyarrow", zero_copy_batch=True)


def sample_k(
    ds: rd.Dataset,
    id_col: str,
    k: int,
) -> rd.Dataset:
    """Deterministic uniform k-sample WITHOUT replacement: the ``k`` rows
    with the smallest ``(hll_hash(id), id)`` — a seedless reservoir
    equivalent whose membership is a pure function of the id set, so
    re-runs, re-shards and resumes pick the SAME sample (the property
    hash_split gives the train/val split, extended to exact-size
    selection; Bernoulli sampling — ``stratified_sample`` — cannot hit
    an exact k).

    Scale shape: per-block partial top-k prune first (the global k
    smallest hashes are a subset of the union of per-block k smallest),
    so at most ``k`` rows per block enter the exchange; a sort over
    those <= blocks x k pruned rows + ``limit(k)`` finishes. For k large
    enough that blocks x k matters, chain two prune rounds or use
    ``hash_split`` with a permille instead."""
    import numpy as np

    from vaero_ray.stages.sketch import hll_hash

    if k <= 0:
        raise ValueError("sample_k: k must be positive")

    def prune(tbl: pa.Table) -> pa.Table:
        if not tbl.num_rows:
            return tbl.append_column("__h", pa.array([], pa.uint64()))
        ids = tbl.column(id_col).to_numpy(zero_copy_only=False).astype(np.uint64)
        h = hll_hash(ids)
        out = tbl.append_column("__h", pa.array(h, pa.uint64()))
        if tbl.num_rows <= k:
            return out
        # prune by the SAME total order as the final sort — (h, id) — so
        # a hash tie at the boundary keeps the right row
        keep = np.lexsort((tbl.column(id_col).to_numpy(zero_copy_only=False), h))[:k]
        return out.take(pa.array(np.sort(keep)))

    pruned = ds.map_batches(prune, batch_format="pyarrow", zero_copy_batch=True)
    picked = pruned.sort(["__h", id_col]).limit(k)
    return picked.drop_columns(["__h"])


def sample_k_per_group(
    ds: rd.Dataset,
    group_col: str,
    id_col: str,
    k: int,
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Deterministic exact-k sample WITHOUT replacement per group: the
    ``k`` rows with the smallest ``(hll_hash(id), id)`` WITHIN each
    group — ``sample_k`` grouped, i.e. a seedless per-group reservoir.
    The data-mixing primitive (equal-size per-source subcorpora for
    curriculum / ablation mixes); membership is a pure function of each
    group's id set, so re-runs, re-shards and resumes pick the SAME rows
    and adding a new group never perturbs another group's sample.

    Scale shape: the hash is added statelessly, then exact grouped
    top-k (ranking.top_k_per_group ascending): a per-block partial
    prune bounds the exchange to k rows per (group, block) before the
    one bucketed merge."""
    import numpy as np

    from vaero_ray.stages.ranking import top_k_per_group
    from vaero_ray.stages.sketch import hll_hash

    if k <= 0:
        raise ValueError("sample_k_per_group: k must be positive")

    def add_h(tbl: pa.Table) -> pa.Table:
        ids = tbl.column(id_col).to_numpy(zero_copy_only=False).astype(np.uint64)
        return tbl.append_column("__h", pa.array(hll_hash(ids), pa.uint64()))

    withh = ds.map_batches(add_h, batch_format="pyarrow", zero_copy_batch=True)
    out = top_k_per_group(
        withh, group_col, "__h", k, tie_col=id_col, descending=False, num_buckets=num_buckets
    )
    return out.drop_columns(["__h"])


def resample_to_mixture(
    ds: rd.Dataset,
    id_col: str,
    strata_col: str,
    weights: dict[str, int],
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Deterministic exact-proportion data mixing: the LARGEST sub-corpus
    whose per-stratum row counts follow the integer ``weights`` exactly —
    quota_s = floor(c_m * w_s / w_m), where m is the limiting stratum
    (lexicographically-first argmin of c_s / w_s; strata with weight 0 or
    absent from ``weights`` are dropped). The mixture knob of corpus
    construction when targets are PROPORTIONS ("40% web / 40% books /
    20% code"), complementing ``stratified_sample`` whose knobs are
    per-stratum RATES.

    Survivors per stratum are the quota_s rows with the smallest
    ``(hll_hash(id), id)`` — a pure function of the id set (re-run /
    re-shard invariant), and the same hash family as ``hash_split`` /
    ``stratified_sample`` so nested selections stay nested.

    Two input passes: a per-stratum count aggregate (G rows to the
    driver — metadata scale; prune the read to [id, strata] upstream),
    then one bounded selection: a per-block partial prune keeps at most
    quota_s rows per (stratum, block), so the single bucketed exchange
    moves <= quota_s rows per stratum per block however hot a stratum is.

    Partitioning assumption: one stratum's quota_s selected rows fit in
    one task's heap (same contract as ``cap_per_key``). When quota_s is
    a large fraction of a huge stratum, select by RATE instead
    (``stratified_sample`` with permille ~ quota_s/c_s: O(1) memory,
    approximate size) or pre-prune with a hash threshold before this.
    """
    import numpy as np
    from fractions import Fraction

    from vaero_ray.stages.sketch import hll_hash

    def block_counts(tbl):
        out = tbl.select([strata_col]).group_by(
            [strata_col], use_threads=False
        ).aggregate([([], "count_all")])
        return out.rename_columns([strata_col, "__n"])

    counts: dict = {}
    # per-block partials -> driver sum: the counts pass is a pure scan
    # (blocks x strata tiny rows out), not a sort-based shuffle
    for r in ds.map_batches(
        block_counts, batch_format="pyarrow", zero_copy_batch=True
    ).take_all():
        counts[r[strata_col]] = counts.get(r[strata_col], 0) + int(r["__n"])
    live = sorted(s for s, w in weights.items() if w > 0 and counts.get(s, 0) > 0)
    if not live:
        raise ValueError("resample_to_mixture: no stratum has both weight and rows")
    m = min(live, key=lambda s: (Fraction(counts[s], weights[s]), s))
    quota = {s: (counts[m] * weights[s]) // weights[m] for s in live}

    def prune(tbl):
        # Arrow-native: quota-filter, hash, stratum-first sort (same
        # per-stratum (__h, id) survivor order as the global sort), one
        # segment cumcount against the per-stratum quota
        t = tbl.filter(
            pc.is_in(tbl.column(strata_col), value_set=pa.array(list(quota)))
        )
        if not t.num_rows:
            return t.append_column("__h", pa.array([], pa.int64()))
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.uint64)
        t = t.append_column("__h", pa.array(hll_hash(ids).astype(np.int64), pa.int64()))
        order = [(strata_col, "ascending"), ("__h", "ascending"), (id_col, "ascending")]
        t = t.take(pc.sort_indices(t, sort_keys=order))
        pos = _group_positions(t, strata_col)
        d = pc.dictionary_encode(t.column(strata_col).combine_chunks())
        codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        qs = np.asarray([quota[s] for s in d.dictionary.to_pylist()], dtype=np.int64)
        return t.filter(pa.array(pos < qs[codes]))

    def final(df):
        df = df.sort_values(["__h", id_col], kind="mergesort")
        cc = df.groupby(strata_col, sort=False).cumcount().to_numpy()
        return (
            df[cc < df[strata_col].map(quota).to_numpy()]
            .drop(columns="__h")
            .reset_index(drop=True)
        )

    partial = ds.map_batches(prune, batch_format="pyarrow", zero_copy_batch=True)
    return bucketed_map_groups(partial, strata_col, final, num_buckets=num_buckets)


def weighted_sample_k(
    ds: rd.Dataset,
    id_col: str,
    weight_col: str,
    k: int,
    max_weight: int = 64,
) -> rd.Dataset:
    """Deterministic WEIGHTED k-sample without replacement: a row with
    integer weight ``w`` holds ``w`` tickets — hashes of ``id*max_weight
    + j`` for ``j < w`` — and its selection key is the SMALLEST ticket
    (replicated bottom-k / coordinated weighted sampling, Cohen &
    Kaplan-style): heavier rows draw the minimum of more uniforms, so
    they win proportionally more often, and membership is a pure
    function of the (id, weight) set — re-runs, re-shards and resumes
    pick the SAME sample (the seedless property of ``sample_k``,
    extended to importance weights: the upsample knob of corpus mixing
    when weights are PER-ROW, not per-stratum).

    The exact-k selection is the k smallest ``(min_ticket, id)``.
    Weights must lie in ``[1, max_weight]`` (raise otherwise —
    ``max_weight`` bounds both the ticket-replication temp, ``sum(w)``
    hashes per block, and the id stride) and ids must be non-negative
    with ``id*max_weight + max_weight <= 2^63`` so the ticket domain
    never wraps.

    Scale shape: identical to ``sample_k`` — tickets never leave their
    block (per-block prune to the k smallest keys), then one sort over
    <= blocks*k pruned rows + ``limit(k)``."""
    import numpy as np

    from vaero_ray.stages.sketch import hll_hash

    if k <= 0:
        raise ValueError("weighted_sample_k: k must be positive")
    if max_weight < 1:
        raise ValueError("weighted_sample_k: max_weight must be >= 1")

    def prune(tbl: pa.Table) -> pa.Table:
        if not tbl.num_rows:
            return tbl.append_column("__h", pa.array([], pa.uint64()))
        ids = tbl.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        w = tbl.column(weight_col).to_numpy(zero_copy_only=False).astype(np.int64)
        if (w < 1).any() or (w > max_weight).any():
            raise ValueError(
                f"weighted_sample_k: weights must be in [1, {max_weight}]"
            )
        if (ids < 0).any() or int(ids.max()) * max_weight + max_weight - 1 >= 2**63:
            raise ValueError("weighted_sample_k: id*max_weight would wrap int64")
        base = ids.astype(np.uint64) * np.uint64(max_weight)
        starts = np.zeros(len(w), dtype=np.int64)
        np.cumsum(w[:-1], out=starts[1:])
        offs = np.arange(int(w.sum()), dtype=np.uint64) - np.repeat(
            starts.astype(np.uint64), w
        )
        tickets = hll_hash(np.repeat(base, w) + offs)
        key = np.minimum.reduceat(tickets, starts)
        out = tbl.append_column("__h", pa.array(key, pa.uint64()))
        if tbl.num_rows <= k:
            return out
        # prune by the SAME total order as the final sort — (key, id)
        keep = np.lexsort((ids, key))[:k]
        return out.take(pa.array(np.sort(keep)))

    pruned = ds.map_batches(prune, batch_format="pyarrow", zero_copy_batch=True)
    picked = pruned.sort(["__h", id_col]).limit(k)
    return picked.drop_columns(["__h"])
