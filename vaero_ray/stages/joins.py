"""Join operators (not in the reference — SURVEY.md §2a lists zero joins;
these are the standard Ray-Data-first join patterns the engine needs as a
general data-processing system).

- ``broadcast_join``: small side ``ray.put`` ONCE, each batch does an
  Arrow-native ``Table.join`` against it — no shuffle. For dimension
  tables, vocabularies, blocklists.
- ``hash_join``: both sides large — explicit partitioned hash join:
  tag both sides with ``hash(key) % B``, union with a side marker, one
  ``groupby(bucket)`` shuffle, Arrow-native ``pa.Table.join`` per bucket
  (all keys of a bucket joined in one vectorized call, original dtypes
  preserved). Skewed hot keys spread only if the key itself is salted —
  document per call site.
- ``asof_join``: per-key backward as-of (each left row matched with the
  latest right row with ``ts <= left.ts``): same bucketed shuffle,
  ``pd.merge_asof`` per bucket (sorted by ts, by=key).
- ``auto_join``: AQE-style adaptive switch — materializes the build side
  (a hash join consumes it fully anyway) and broadcasts it when its
  ACTUAL size is small, else partitioned ``hash_join``.
"""

from __future__ import annotations

from typing import Iterable

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from vaero_ray.stages.keyed import BUCKET_COL, DEFAULT_BUCKETS, hash_bucket, input_file_bytes

# ~1 GiB of in-memory input per native-join partition: measured optimum on
# the 32M-turn corpus rehearsal (15 GiB in-mem, 32 CPUs) — 8 parts starved
# downstream stages, 59 parts paid 6x shuffle CPU in per-object churn, 16
# (= 15 GiB / 1 GiB) was fastest end to end. Also bounds the per-partition
# aggregator actor's heap, which is what matters on a 256-node run.
JOIN_TARGET_INMEM_BYTES = 1 << 30


def broadcast_join(
    ds: rd.Dataset,
    small: pa.Table,
    keys: str | list[str],
    join_type: str = "inner",
) -> rd.Dataset:
    """Join every batch against a broadcast small side (one object-store
    copy, zero shuffle). ``small`` must be driver-resident and small."""
    import ray

    keys = [keys] if isinstance(keys, str) else list(keys)
    small_ref = ray.put(small)

    def per_batch(tbl: pa.Table) -> pa.Table:
        import ray as _ray

        s = _ray.get(small_ref)
        return tbl.join(s, keys=keys, join_type=join_type)

    return ds.map_batches(per_batch, batch_format="pyarrow", zero_copy_batch=True)


# Build sides at or under this ACTUAL materialized size broadcast instead
# of shuffling (the AQE-style switch in auto_join). 64 MiB: one object-store
# copy per node is noise next to a shuffle, and every worker holds it once.
AUTO_BROADCAST_MAX_BYTES = 64 << 20


def auto_join(
    left: rd.Dataset,
    right: rd.Dataset,
    keys: str | list[str],
    join_type: str = "inner",
    num_buckets: int | None = None,
    suffix: str = "_r",
    broadcast_max_bytes: int = AUTO_BROADCAST_MAX_BYTES,
) -> rd.Dataset:
    """Adaptive join — pick broadcast vs partitioned from the build side's
    ACTUAL size, not a guess. A hash join consumes its build (right) side
    fully anyway, so materializing it first costs nothing extra; with the
    size then known (``size_bytes()`` is metadata on a materialized
    dataset), a small build side gathers to ONE driver Arrow table and
    joins broadcast (``ray.put`` once, zero shuffle, and none of the
    native join's per-partition aggregator-actor spawns — a ~2 s fixed
    premium per join at toy scale, measured on revenue_by_nation). Filter-
    then-join plans hit this constantly: the build side is only small
    AFTER runtime filters/aggregates, which parquet metadata can't see.

    Broadcast path requires inner/left (right-unmatched rows can't be
    emitted from a per-batch kernel) and no overlapping non-key columns
    (the broadcast kernel applies no suffix); anything else — and any
    build side over the threshold — takes the partitioned ``hash_join``.
    """
    import ray

    keys_l = [keys] if isinstance(keys, str) else list(keys)
    jt = join_type.replace("_", " ").split()[0]  # inner/left/right/full
    overlap = (set(left.schema().names) & set(right.schema().names)) - set(keys_l)
    right_mat = right.materialize()
    if (
        jt in ("inner", "left")
        and not overlap
        and (right_mat.size_bytes() or 0) <= broadcast_max_bytes
    ):
        blocks = [t for t in ray.get(right_mat.to_arrow_refs()) if t.num_rows]
        if blocks:
            small = pa.concat_tables(blocks)
        else:
            sch = right_mat.schema()
            small = pa.table(
                {n: pa.array([], _pa_type(t)) for n, t in zip(sch.names, sch.types)}
            )
        return broadcast_join(
            left, small, keys_l, join_type="inner" if jt == "inner" else "left outer"
        )
    return hash_join(
        left, right_mat, keys_l, join_type=join_type,
        num_buckets=num_buckets, suffix=suffix,
    )


def _pa_type(t) -> pa.DataType:
    """Arrow type for a Dataset.schema() entry (Arrow DataType for
    Arrow-backed datasets, numpy dtype for pandas-built ones)."""
    if isinstance(t, pa.DataType):
        return t
    dt = np.dtype(t)
    if dt == object:  # pandas-built datasets: object columns are strings
        return pa.string()
    return pa.from_numpy_dtype(dt)


def _tag(side: int, keys: list[str], num_buckets: int):
    def fn(tbl: pa.Table) -> pa.Table:
        b = hash_bucket(tbl.column(keys[0]).to_pandas(), num_buckets)
        if tbl.schema.metadata:
            tbl = tbl.replace_schema_metadata(None)
        return tbl.append_column(BUCKET_COL, pa.array(b)).append_column(
            "__side", pa.repeat(pa.scalar(side, pa.int8()), tbl.num_rows)
        )

    return fn


def hash_join(
    left: rd.Dataset,
    right: rd.Dataset,
    keys: str | list[str],
    join_type: str = "inner",
    num_buckets: int | None = None,
    suffix: str = "_r",
) -> rd.Dataset:
    """Partitioned hash join.

    Primary path: Ray Data's native ``Dataset.join`` — each side shuffles
    ONLY its own columns (round 1 padded both sides to the union schema
    with typed nulls, ~doubling exchanged bytes) and Arrow dtypes survive
    (no pandas float-ification of int columns). Fallback (native path
    unavailable/raises): the original bucketed union+merge.

    Partition count: explicit ``num_buckets`` wins; otherwise derived
    from the two sides' READ-lineage size estimates
    (``lineage_inmemory_bytes`` — parquet-footer metadata, resolvable
    even through map_batches) at ~1 GiB in-memory per partition
    (``JOIN_TARGET_INMEM_BYTES``), floored at cpus/4, and SNAPPED to the
    cluster CPU count when the bytes-derived count lands in the
    [cpus/3, 2*cpus] band. All three regimes are measured, not guessed
    (32M-turn corpus, ~15 GiB in-mem, 32 CPUs): 8 partitions -> 930 MB
    output blocks starve every downstream map stage (8-way on a 32-CPU
    box); 59 partitions -> the shuffle slices 512 input blocks x 59 ways
    and per-object churn cost 6x the shuffle CPU; in between, derived 15
    took 260 s vs 30 at 194 s and 45 at 223 s — join OUTPUT blocks =
    partitions, so this count is also the parallelism every post-join
    stage inherits, and one full wave of cores wins. Put expensive
    per-row stages BEFORE the join (see exact_dedup payload_transform);
    the ~1 GiB/partition rule still governs above 2*cpus (bounds the
    finalize actor's heap at 256-node scale)."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    try:
        how_native = {
            "inner": "inner",
            "left outer": "left_outer",
            "left": "left_outer",
            "full outer": "full_outer",
            "full": "full_outer",
            "right outer": "right_outer",
            "right": "right_outer",
        }[join_type]
        import ray as _ray

        n_cpus = int(_ray.cluster_resources().get("CPU", 8)) if _ray.is_initialized() else 8
        if num_buckets is not None:
            n_parts = num_buckets
        else:
            from vaero_ray.stages.keyed import (
                MAX_DERIVED_BUCKETS,
                lineage_inmemory_bytes,
                snap_to_cpu_band,
            )

            est = (lineage_inmemory_bytes(left) or 0) + (lineage_inmemory_bytes(right) or 0)
            # mid band snaps to one full wave of cores (join OUTPUT blocks
            # = partitions = every post-join stage's parallelism); below
            # it actor spawn dominates (cpus/4 floor); above it the
            # ~1 GiB/partition bytes rule governs (aggregator heap).
            # Rule + measurements: keyed.snap_to_cpu_band.
            need = snap_to_cpu_band(
                int((est + JOIN_TARGET_INMEM_BYTES - 1) // JOIN_TARGET_INMEM_BYTES), n_cpus
            )
            n_parts = max(2, n_cpus // 4, min(need, MAX_DERIVED_BUCKETS))
        return left.join(
            right,
            join_type=how_native,
            num_partitions=n_parts,
            on=tuple(keys),
            right_suffix=suffix,
        )
    except (TypeError, KeyError, AttributeError):
        pass
    return _bucketed_hash_join(
        left, right, keys, join_type, num_buckets or DEFAULT_BUCKETS, suffix
    )


def _bucketed_hash_join(
    left: rd.Dataset,
    right: rd.Dataset,
    keys: list[str],
    join_type: str = "inner",
    num_buckets: int = DEFAULT_BUCKETS,
    suffix: str = "_r",
) -> rd.Dataset:
    """Explicit bucketed hash join (fallback): ONE shuffle co-locates both
    sides' rows of a key bucket; each bucket joins vectorized. Column
    collisions on the right get ``suffix``. Partitioning assumption: one
    bucket's rows from BOTH sides fit one task."""
    lsch, rsch = left.schema(), right.schema()
    lcols, rcols = lsch.names, rsch.names
    types = dict(zip(rsch.names, rsch.types))
    types.update(dict(zip(lsch.names, lsch.types)))  # left wins on collision

    # union needs identical schemas: carry both column sets, TYPED nulls
    # on the absent side
    all_cols = list(dict.fromkeys(lcols + [c for c in rcols if c not in lcols]))

    def pad():
        def fn(tbl: pa.Table) -> pa.Table:
            n = tbl.num_rows
            return pa.table(
                {
                    c: (tbl.column(c) if c in tbl.column_names else pa.nulls(n, types[c]))
                    for c in all_cols
                }
                | {BUCKET_COL: tbl.column(BUCKET_COL), "__side": tbl.column("__side")}
            )

        return fn

    l = left.map_batches(_tag(0, keys, num_buckets), batch_format="pyarrow", zero_copy_batch=True)
    l = l.map_batches(pad(), batch_format="pyarrow")
    r = right.map_batches(_tag(1, keys, num_buckets), batch_format="pyarrow", zero_copy_batch=True)
    r = r.map_batches(pad(), batch_format="pyarrow")

    how = {
        "inner": "inner",
        "left outer": "left outer",
        "left": "left outer",
        "full outer": "full outer",
        "full": "full outer",
        "right outer": "right outer",
        "right": "right outer",
    }[join_type]
    empty_out = pa.table({c: pa.nulls(0, _pa_type(types[c])) for c in lcols}).join(
        pa.table({c: pa.nulls(0, _pa_type(types[c])) for c in rcols}),
        keys=keys, join_type=how, right_suffix=suffix,
    )

    def per_bucket(tbl: pa.Table) -> pa.Table:
        # Arrow-native per-bucket join: the typed-null padding keeps int
        # columns int through the exchange and pa.Table.join needs no
        # pandas conversion or dtype-restore dance (round 3 used
        # pd.merge + _restore_int_dtypes here)
        if not tbl.num_rows:  # empty shuffle partitions carry no columns
            return empty_out
        mask0 = pc.equal(tbl.column("__side"), 0)
        ltb = tbl.filter(mask0).select(lcols)
        rtb = tbl.filter(pc.invert(mask0)).select(rcols)
        return ltb.join(rtb, keys=keys, join_type=how, right_suffix=suffix)

    return l.union(r).groupby(BUCKET_COL).map_groups(per_bucket, batch_format="pyarrow")


def asof_join(
    left: rd.Dataset,
    right: rd.Dataset,
    key: str,
    ts_col: str = "ts",
    right_ts_out: str = "matched_ts",
    right_cols: Iterable[str] = (),
    num_buckets: int = DEFAULT_BUCKETS,
    direction: str = "backward",
    tolerance=None,
) -> rd.Dataset:
    """As-of join: each left row gains the latest right row of the same
    key with ``right.ts <= left.ts`` (``direction="backward"``, default;
    inclusive — same semantics as DuckDB ``ASOF JOIN ... ON r.ts <=
    l.ts``), the EARLIEST right row with ``right.ts >= left.ts``
    (``"forward"``), or the closest in either direction (``"nearest"``).
    ``tolerance`` (a ``pd.Timedelta`` for timestamp keys) bounds the
    match distance. Unmatched left rows get nulls. When the right side
    has duplicate (key, ts) rows the matched PAYLOAD among the ties is
    arrival-order dependent — emit only the matched ts, or dedup the
    right side first, if ties are possible.

    Per-SIDE shuffles (round 2 padded BOTH sides to the union schema with
    typed nulls and pushed the widened union through one exchange — every
    probe row carried null build columns): the build (right) side is
    bucket-partitioned by a ``num_returns`` split-task fan-out + one
    ts-sorted concat task per bucket — only right columns move, and the
    per-bucket tables live in the object store as refs; the probe (left)
    side flows through its own bucketed groupby carrying only left
    columns, and each bucket task fetches exactly its right bucket for a
    vectorized ``pd.merge_asof``. Partitioning assumption: one key
    bucket's rows per side fit one task (same contract as hash_join)."""
    import numpy as np
    import ray

    right_cols = list(right_cols)
    lcols = left.schema().names
    keep_r = [key, ts_col] + right_cols

    r_schema = right.schema()
    if r_schema is not None:
        r_types = {c: _pa_type(t) for c, t in zip(r_schema.names, r_schema.types)}
    else:
        # fully-empty derived right side: schema unknowable — borrow the
        # key/ts types from the left, null payload columns become float64
        lsch = left.schema()
        l_types = {c: _pa_type(t) for c, t in zip(lsch.names, lsch.types)}
        r_types = {key: l_types[key], ts_col: l_types[ts_col]}
        r_types.update({c: pa.float64() for c in right_cols})
    empty_right = pa.table({c: pa.nulls(0, r_types[c]) for c in keep_r})

    # ---- build side: manual bucket shuffle, right columns only --------
    @ray.remote
    def split_block(tbl: pa.Table):
        if not tbl.num_rows:
            # empty blocks from derived datasets carry NO columns — the
            # same trap guarded in graph.dsu / sketch.or_all; emit typed
            # empty slices so concat_sorted keeps the projected schema
            return tuple(empty_right for _ in range(num_buckets))
        b = np.asarray(hash_bucket(tbl.column(key).to_pandas(), num_buckets))
        order = np.argsort(b, kind="stable")
        tbl = tbl.take(pa.array(order))
        bounds = np.searchsorted(b[order], np.arange(num_buckets + 1))
        return tuple(tbl.slice(bounds[i], bounds[i + 1] - bounds[i]) for i in range(num_buckets))

    @ray.remote
    def concat_sorted(*parts: pa.Table) -> pa.Table:
        t = pa.concat_tables(parts)
        return t.take(
            pa.compute.sort_indices(pa.table({"__ts": t.column(ts_col)}), sort_keys=[("__ts", "ascending")])
        )

    r_blocks = right.select_columns(keep_r).to_arrow_refs()
    per_block = [split_block.options(num_returns=num_buckets).remote(b) for b in r_blocks]
    if num_buckets == 1:  # num_returns=1 yields a bare ref, not a tuple
        per_block = [[p] for p in per_block]
    bucket_refs = [
        concat_sorted.remote(*[pb[i] for pb in per_block]) for i in range(num_buckets)
    ]

    # ---- probe side: one bucketed groupby, left columns only ----------
    def tag(tbl: pa.Table) -> pa.Table:
        b = hash_bucket(tbl.column(key).to_pandas(), num_buckets)
        if tbl.schema.metadata:
            tbl = tbl.replace_schema_metadata(None)
        return tbl.append_column(BUCKET_COL, pa.array(b))

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        bucket = int(df[BUCKET_COL].iloc[0])
        ldf = df.drop(columns=[BUCKET_COL]).sort_values(ts_col, kind="mergesort")
        rdf = ray.get(bucket_refs[bucket]).to_pandas()
        # derived right sides can arrive with a different pandas datetime
        # unit (Ray row-filter round-trips timestamps to [s]); merge_asof
        # requires identical on-key dtypes
        if rdf[ts_col].dtype != ldf[ts_col].dtype:
            rdf[ts_col] = rdf[ts_col].astype(ldf[ts_col].dtype)
        out = pd.merge_asof(
            ldf[lcols],
            rdf.rename(columns={ts_col: right_ts_out}),
            left_on=ts_col,
            right_on=right_ts_out,
            by=key,
            direction=direction,
            tolerance=tolerance,
            allow_exact_matches=True,
        )
        return out

    tagged = left.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
    return tagged.groupby(BUCKET_COL).map_groups(per_bucket, batch_format="pandas")


def semi_join(
    left: rd.Dataset,
    right: rd.Dataset,
    keys: str | list[str],
    anti: bool = False,
    num_buckets: int = DEFAULT_BUCKETS,
    bloom_prefilter: bool | str = False,
    bloom_m_bits: int = 1 << 20,
    bloom_min_bytes: int = 256 << 20,
) -> rd.Dataset:
    """Semi (``anti=False``) / anti (``anti=True``) join: keep left rows
    whose key does (not) appear in ``right``. Output columns = left's.

    Scale shape: the right side is PROJECTED TO ITS DISTINCT KEYS per
    block before the single bucketed shuffle — the exchange carries
    left's rows plus only right's key values (the decontamination /
    existence-filter pattern; unlike a full join, no right payload
    moves). Right rows pad left's non-key columns with typed nulls, but
    there are only distinct-keys-many of them.

    ``bloom_prefilter=True`` (single integer key only) first builds a
    Bloom filter of the right key set (m/62 int64 words), broadcasts it
    via ``ray.put``, and resolves DEFINITE-ABSENCE rows before the
    shuffle: semi drops them locally; anti emits them locally (absence
    is the keep condition). Only may-contain rows — the right-set hit
    rate plus the FPR — ride the exchange, which is the whole point of
    the pre-filter at 100 TB. Results are exactly identical to the
    unfiltered path (no false negatives).

    ``bloom_prefilter="auto"`` enables it only when the right side's
    input files exceed ``bloom_min_bytes`` (pure metadata, same recipe
    as ``exact_dedup`` auto): the register build is an extra sequential
    Dataset execution with a fixed ~2 s premium that only amortizes at
    volume, so toy-scale runs skip it. Output is identical either way."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    lsch = left.schema()
    lcols = lsch.names
    types = dict(zip(lsch.names, lsch.types))

    if bloom_prefilter == "auto":
        sz = input_file_bytes(right)
        bloom_prefilter = sz is not None and sz > bloom_min_bytes

    if bloom_prefilter and len(keys) == 1 and pa.types.is_integer(types[keys[0]]):
        import ray as _ray

        from vaero_ray.stages.sketch import bloom_may_contain, bloom_registers

        key = keys[0]
        # the register table is tiny by construction (<= m/62 rows)
        regs = bloom_registers(right, key, m_bits=bloom_m_bits, merge="task").to_pandas()
        regs_ref = _ray.put(regs)
        m_bits = bloom_m_bits

        def split(tbl: pa.Table, want_hit: bool) -> pa.Table:
            x = np.asarray(tbl.column(key).to_numpy(zero_copy_only=False))
            hit = bloom_may_contain(_ray.get(regs_ref), x, m_bits=m_bits)
            return tbl.filter(pa.array(hit if want_hit else ~hit))

        maybe = left.map_batches(
            lambda t: split(t, True), batch_format="pyarrow", zero_copy_batch=True
        )
        exact = semi_join(maybe, right, keys, anti=anti, num_buckets=num_buckets)
        if not anti:
            return exact  # definite-absence rows can never pass a semi join
        definite = left.map_batches(
            lambda t: split(t, False), batch_format="pyarrow", zero_copy_batch=True
        )
        return exact.union(definite)

    def rkeys(tbl: pa.Table) -> pa.Table:
        # per-block distinct of the key projection (combiner: global
        # distinct == distinct of per-block distincts)
        out = tbl.select(keys).group_by(keys).aggregate([])
        n = out.num_rows
        return pa.table(
            {c: (out.column(c) if c in keys else pa.nulls(n, _pa_type(types[c]))) for c in lcols}
        )

    l = left.map_batches(_tag(0, keys, num_buckets), batch_format="pyarrow", zero_copy_batch=True)
    r = right.map_batches(rkeys, batch_format="pyarrow", zero_copy_batch=True).map_batches(
        _tag(1, keys, num_buckets), batch_format="pyarrow"
    )

    how = "left anti" if anti else "left semi"
    empty_out = pa.table({c: pa.nulls(0, _pa_type(types[c])) for c in lcols})

    def per_bucket(tbl: pa.Table) -> pa.Table:
        # pyarrow's native left semi / left anti join: output columns are
        # exactly the left's with their original Arrow types (no pandas
        # indicator-merge, no _restore_int_dtypes)
        if not tbl.num_rows:  # empty shuffle partitions carry no columns
            return empty_out
        mask0 = pc.equal(tbl.column("__side"), 0)
        ltb = tbl.filter(mask0).select(lcols)
        rk = tbl.filter(pc.invert(mask0)).select(keys).group_by(keys).aggregate([])
        return ltb.join(rk, keys=keys, join_type=how)

    return l.union(r).groupby(BUCKET_COL).map_groups(per_bucket, batch_format="pyarrow")


def range_join(
    left: rd.Dataset,
    right: rd.Dataset,
    key: str,
    left_ts: str = "ts",
    right_start: str = "start",
    right_end: str = "end",
    num_buckets: int = DEFAULT_BUCKETS,
    suffix: str = "_r",
) -> rd.Dataset:
    """Keyed interval (range) join: every pair ``(l, r)`` with
    ``l.key == r.key`` and ``r.start <= l.ts <= r.end`` (inclusive both
    ends — SQL ``BETWEEN`` semantics). Output = left columns + right's
    interval bounds + right payload columns, right-side name collisions
    suffixed. Ray Data has no non-equi join; this is the engine's
    composition (SURVEY §2-adjacent: the task brief's "range join").

    Scale shape: ONE bucketed shuffle on ``hash(key)`` (both sides union
    through the same exchange, each padded with typed nulls like
    ``hash_join``'s fallback), then a per-bucket vectorized
    interval-stab: composite-shift each side's int64 timestamps by
    ``key_code * OFF`` (the cep.py offset-searchsorted trick, codes
    factorized over the CONCATENATED key arrays so both sides share the
    coding), sort rights by shifted start, and for each left row take
    the candidate slice ``start in [ts - max_dur, ts]`` via two
    ``np.searchsorted`` calls — ``max_dur`` = the bucket's longest
    interval, so no matching right can start earlier (``end = start +
    dur < ts``). Candidates expand via repeat/arange (no Python loop)
    and a final ``end >= ts`` mask. Per-left-row work is bounded by the
    number of intervals STARTING within one max-duration window — the
    merge_asof-tolerance trick generalized to all matches — instead of
    the per-key cross product a merge+filter would materialize.
    Partitioning assumptions: one bucket's rows (both sides) fit one
    task, and interval durations are not wildly skewed (one degenerate
    months-long interval widens every candidate window in its bucket)."""
    lsch, rsch = left.schema(), right.schema()
    lcols, rcols = lsch.names, rsch.names
    types = dict(zip(rsch.names, rsch.types))
    types.update(dict(zip(lsch.names, lsch.types)))  # left wins on collision
    rtypes = dict(zip(rsch.names, rsch.types))
    all_cols = list(dict.fromkeys(lcols + [c for c in rcols if c not in lcols]))
    # output naming: right's non-key columns, suffixed on collision
    r_out = {c: (c + suffix if c in lcols else c) for c in rcols if c != key}

    def pad(tbl: pa.Table) -> pa.Table:
        n = tbl.num_rows
        return pa.table(
            {c: (tbl.column(c) if c in tbl.column_names else pa.nulls(n, types[c])) for c in all_cols}
            | {BUCKET_COL: tbl.column(BUCKET_COL), "__side": tbl.column("__side")}
        )

    l = left.map_batches(_tag(0, [key], num_buckets), batch_format="pyarrow", zero_copy_batch=True)
    l = l.map_batches(pad, batch_format="pyarrow")
    r = right.map_batches(_tag(1, [key], num_buckets), batch_format="pyarrow", zero_copy_batch=True)
    r = r.map_batches(pad, batch_format="pyarrow")

    out_schema = [(c, types[c]) for c in lcols] + [
        (r_out[c], rtypes[c]) for c in rcols if c != key
    ]
    out_arrow_schema = pa.schema([(c, _pa_type(t)) for c, t in out_schema])
    empty_out = pa.table({c: pa.nulls(0, _pa_type(t)) for c, t in out_schema})

    def per_bucket(df: pd.DataFrame) -> pa.Table:
        if not len(df):
            return empty_out
        ldf = df[df["__side"] == 0]
        rdf = df[df["__side"] == 1]
        if not len(ldf) or not len(rdf):
            return empty_out
        # shared key coding across both sides (factorize the concat)
        codes_all = pd.factorize(
            pd.concat([ldf[key], rdf[key]], ignore_index=True), use_na_sentinel=False
        )[0].astype(np.int64)
        lcode, rcode = codes_all[: len(ldf)], codes_all[len(ldf):]

        def _us(s: pd.Series) -> np.ndarray:
            return s.to_numpy().astype("datetime64[us]").astype(np.int64)

        lts = _us(ldf[left_ts])
        rs, re_ = _us(rdf[right_start]), _us(rdf[right_end])
        max_dur = int((re_ - rs).max()) if len(rs) else 0
        max_dur = max(max_dur, 0)
        tmin = min(lts.min(), rs.min())
        span = int(max(lts.max(), rs.max()) - tmin)
        off = span + max_dur + 2
        n_codes = int(codes_all.max()) + 1
        if n_codes * off >= 2**63:
            # composite would wrap int64 and silently unsort the array
            raise ValueError(
                f"composite shift overflows int64 ({n_codes} keys x {off} us "
                "span in one bucket); raise num_buckets or narrow the range"
            )
        lc = lcode * off + (lts - tmin)
        rc = rcode * off + (rs - tmin)
        order = np.argsort(rc, kind="stable")
        rc_s = rc[order]
        lo = np.searchsorted(rc_s, lc - max_dur, side="left")
        hi = np.searchsorted(rc_s, lc, side="right")
        counts = hi - lo

        # chunked candidate expansion: under duration skew the UNFILTERED
        # candidate set (counts.sum()) can dwarf the true output (the
        # end >= ts mask drops most of a widened window), and a single
        # repeat/arange materializes all of it at once — the same
        # unbounded-intermediate class the dedup emitters capped, except
        # a join must not drop rows. Expanding left rows in slices of
        # ~CAND_CHUNK candidates bounds the temporaries at chunk size;
        # the final (exact) output is concatenated once.
        CAND_CHUNK = 1 << 22  # ~4M candidate rows per slice of temps
        csum = counts.cumsum()
        pieces = []
        i = 0
        while i < len(ldf):
            base = csum[i - 1] if i else 0
            j = int(np.searchsorted(csum, base + CAND_CHUNK, side="left")) + 1
            j = min(max(j, i + 1), len(ldf))
            cnt = counts[i:j]
            total = int(cnt.sum())
            li = np.repeat(np.arange(i, j), cnt)
            ri_base = np.arange(total) - np.repeat(cnt.cumsum() - cnt, cnt)
            ri = order[ri_base + np.repeat(lo[i:j], cnt)]
            keep = re_[ri] >= lts[li]
            li, ri = li[keep], ri[keep]
            if len(li):
                lout = ldf.iloc[li][lcols].reset_index(drop=True)
                rout = rdf.iloc[ri][[c for c in rcols if c != key]].reset_index(drop=True)
                rout.columns = [r_out[c] for c in rcols if c != key]
                out = pd.concat([lout, rout], axis=1)
                # the padded union degrades int columns to float64 through
                # pandas nulls; matched rows are null-free, so cast back to
                # the declared schema (hash_join's _restore_int_dtypes)
                pieces.append(
                    pa.Table.from_pandas(out, preserve_index=False)
                    .replace_schema_metadata(None)
                    .cast(out_arrow_schema)
                )
            i = j
        if not pieces:
            return empty_out
        return pa.concat_tables(pieces)

    return (
        l.union(r)
        .groupby(BUCKET_COL)
        .map_groups(per_bucket, batch_format="pandas")
    )


def skew_split_join(
    left: rd.Dataset,
    right: rd.Dataset,
    key: str,
    join_type: str = "inner",
    hot_count: int | None = None,
    hot_frac: float = 0.001,
    max_hot_keys: int = 100_000,
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Skew-aware join: HOT keys bypass the shuffle entirely.

    The classic failure of a partitioned hash join at corpus scale is one
    degenerate key (a bot user, an empty-string device id) sending its
    entire row set to ONE reducer — wall time becomes max-key volume, not
    volume/cpus. This operator splits the key space at runtime:

    1. exact left-key counts ride a partial-counts exchange (one row per
       distinct key per block — the vocabulary shape, never raw rows);
       keys with count >= ``hot_count`` (default: ``hot_frac`` of total
       rows, min 2) are HOT. The hot set is bounded by construction
       (sum of counts = n, so at most n/hot_count ~= 1/hot_frac keys);
       ``max_hot_keys`` guards the broadcast anyway.
    2. the right side's hot-key rows gather to a driver Arrow table and
       broadcast (``ray.put`` once); hot LEFT rows join per-batch with
       ZERO shuffle — the hot key's volume is spread across every input
       block instead of one reducer.
    3. cold rows of both sides take the normal partitioned ``hash_join``.
    4. the two disjoint results union; output == plain join, bit-exact
       (verified by the gate oracle and the planted-zipf parity test).

    Supports inner/left joins with no overlapping non-key columns (the
    broadcast kernel applies no suffix — same contract as ``auto_join``).
    The right side's hot rows must fit the driver (true in the fact ⋈
    dimension shape where skew lives on the left).
    """
    import ray
    from ray.data.aggregate import Sum

    jt = join_type.replace("_", " ").split()[0]
    if jt not in ("inner", "left"):
        raise ValueError("skew_split_join: inner/left only (broadcast kernel)")
    join_type = "inner" if jt == "inner" else "left outer"  # Arrow/Ray canonical
    overlap = (set(left.schema().names) & set(right.schema().names)) - {key}
    if overlap:
        raise ValueError(f"skew_split_join: overlapping non-key columns {sorted(overlap)}")

    # each side feeds MULTIPLE consumers (counts + hot/cold splits);
    # an unmaterialized dataset re-executes its whole upstream lineage
    # per consumer, so pin both once (object-store blocks spill at
    # scale) and compact pathological mostly-empty block layouts from
    # upstream shuffles (see keyed.compact_small_blocks)
    from vaero_ray.stages.keyed import compact_small_blocks

    left = compact_small_blocks(left.materialize())
    right = compact_small_blocks(right.materialize())

    def key_counts(tbl: pa.Table) -> pa.Table:
        import pandas as pd

        vc = tbl.column(key).to_pandas().value_counts(dropna=False)
        return pa.table({key: pa.array(vc.index), "__n": pa.array(vc.to_numpy(), pa.int64())})

    counts = left.map_batches(key_counts, batch_format="pyarrow", zero_copy_batch=True)
    merged = counts.groupby(key).aggregate(Sum("__n", alias_name="__n"))
    if hot_count is None:
        total = left.count()
        hot_count = max(2, int(total * hot_frac))
    hot_rows = merged.map_batches(
        lambda t: t.filter(pc.greater_equal(t.column("__n"), hot_count)),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).take_all()
    if len(hot_rows) > max_hot_keys:
        raise ValueError(
            f"skew_split_join: {len(hot_rows)} hot keys exceed max_hot_keys="
            f"{max_hot_keys}; raise hot_count"
        )
    if not hot_rows:
        return hash_join(left, right, [key], join_type, num_buckets)

    lsch = left.schema()  # Ray Schema wrapper: names/types lists, no .field
    key_type = dict(zip(lsch.names, lsch.types))[key]
    hot_arr = pa.array([r[key] for r in hot_rows], key_type)
    hot_ref = ray.put(hot_arr)

    def split(tbl: pa.Table, want_hot: bool) -> pa.Table:
        import ray as _ray

        hs = _ray.get(hot_ref)
        m = pc.is_in(tbl.column(key), value_set=hs)
        return tbl.filter(m if want_hot else pc.invert(m))

    right_hot_blocks = [
        t
        for t in ray.get(
            right.map_batches(
                lambda t: split(t, True), batch_format="pyarrow", zero_copy_batch=True
            )
            .materialize()
            .to_arrow_refs()
        )
        if t.num_rows
    ]
    right_sch = right.schema()
    right_hot = (
        pa.concat_tables(right_hot_blocks)
        if right_hot_blocks
        else pa.table(
            {n: pa.array([], t) for n, t in zip(right_sch.names, right_sch.types)}
        )
    )
    right_cold = right.map_batches(
        lambda t: split(t, False), batch_format="pyarrow", zero_copy_batch=True
    )

    left_hot = left.map_batches(
        lambda t: split(t, True), batch_format="pyarrow", zero_copy_batch=True
    )
    left_cold = left.map_batches(
        lambda t: split(t, False), batch_format="pyarrow", zero_copy_batch=True
    )

    out_cols = list(left.schema().names) + [n for n in right_sch.names if n != key]
    hot_out = broadcast_join(left_hot, right_hot, key, join_type).map_batches(
        lambda t: t.select(out_cols), batch_format="pyarrow", zero_copy_batch=True
    )
    # cold join takes the EXPLICIT bucketed path, not the native hash
    # shuffle: derived sides (aggregate/map_groups outputs) can carry
    # zero-COLUMN empty blocks that poison the native join's partition
    # schema seeding (flaked at sf0.001: "No match ... FieldRef.Name(k)
    # on right side" whenever a join partition received no rows); the
    # bucketed path's sort shuffle tolerates them (warn-only).
    cold_out = _bucketed_hash_join(
        left_cold, right_cold, [key], join_type, num_buckets or DEFAULT_BUCKETS
    ).map_batches(
        lambda t: t.select(out_cols), batch_format="pyarrow", zero_copy_batch=True
    )
    return hot_out.union(cold_out)
