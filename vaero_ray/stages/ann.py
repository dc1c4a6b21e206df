"""Similarity search over an embedding column (list<float>).

- brute_force_topk: exact cosine top-k. Per-batch numpy matmul against the
  (broadcast) query vector, per-batch local top-k, then a tiny global
  sort+limit over ~k rows per block. The query side is shipped once per
  task closure (for many queries use TopKActor, which ray.get()s the
  broadcast query matrix once per actor).
- ivf_topk: scale path — IVF-style bucketing. Centroids are trained
  driver-side on a sample (numpy k-means, a few iterations), broadcast via
  ray.put; each batch is assigned to its nearest centroid ONCE (build), and
  queries probe only the nprobe nearest centroid buckets.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd


def _mat(tbl: pa.Table, col: str, dtype=np.float64) -> np.ndarray:
    # float64 by default: scoring in float32 can flip the 6th decimal of
    # a rounded cosine vs the float64 SQL oracle (surfaced at sf0.1);
    # pass dtype=np.float32 for large-corpus memory savings when exact
    # oracle parity is not required
    arr = tbl.column(col).combine_chunks()
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if not isinstance(arr, (pa.ListArray, pa.LargeListArray, pa.FixedSizeListArray)):
        # Ray tensor extension array (rd.from_pandas of ndarray rows)
        return np.asarray(arr.to_numpy(zero_copy_only=False), dtype=dtype)
    flat = np.asarray(arr.flatten(), dtype=dtype)
    dim = len(flat) // len(arr)
    return flat.reshape(len(arr), dim)


def _norm(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def brute_force_topk(
    ds: rd.Dataset,
    query: np.ndarray,
    k: int = 10,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    round_dp: int | None = 6,
) -> rd.Dataset:
    """Exact cosine top-k: returns (id_col, cosine_sim), best first, ties
    broken by id. ``round_dp`` rounds sims so a SQL oracle can match."""
    q = _norm(np.asarray(query, dtype=np.float64).reshape(1, -1))[0]

    def local_topk(tbl: pa.Table) -> pa.Table:
        m = _norm(_mat(tbl, emb_col))
        sims = m @ q
        if round_dp is not None:
            sims = np.round(sims.astype(np.float64), round_dp)
        n = min(k, len(sims))
        idx = np.argpartition(-sims, n - 1)[:n]
        return pa.table(
            {
                id_col: tbl.column(id_col).take(pa.array(idx)),
                "cosine_sim": pa.array(sims[idx], pa.float64()),
            }
        )

    partials = ds.map_batches(local_topk, batch_format="pyarrow", zero_copy_batch=True)
    # global winner selection over ~k rows per block: tiny sort
    return partials.sort(["cosine_sim", id_col], descending=[True, False]).limit(k)


class TopKActor:
    """Actor-pool variant for query BATCHES: the query matrix is put in the
    object store once (ray.put on the driver) and fetched once per actor."""

    def __init__(self, query_ref, k: int, emb_col: str = "embedding", id_col: str = "vec_id"):
        self.q = _norm(np.asarray(ray.get(query_ref), dtype=np.float64))
        self.k, self.emb_col, self.id_col = k, emb_col, id_col

    def __call__(self, tbl: pa.Table) -> pa.Table:
        m = _norm(_mat(tbl, self.emb_col))
        sims = m @ self.q.T  # (n, n_queries)
        n = min(self.k, sims.shape[0])
        out_ids, out_q, out_s = [], [], []
        ids = tbl.column(self.id_col).to_numpy(zero_copy_only=False)
        for qi in range(sims.shape[1]):
            idx = np.argpartition(-sims[:, qi], n - 1)[:n]
            out_ids.append(ids[idx])
            out_q.append(np.full(n, qi, dtype=np.int32))
            out_s.append(sims[idx, qi])
        return pa.table(
            {
                "query_idx": pa.array(np.concatenate(out_q)),
                self.id_col: pa.array(np.concatenate(out_ids)),
                "cosine_sim": pa.array(np.concatenate(out_s), pa.float64()),
            }
        )


def train_centroids(ds: rd.Dataset, n_centroids: int = 16, emb_col: str = "embedding", sample_n: int = 4096, iters: int = 8, seed: int = 0) -> np.ndarray:
    """Driver-side mini k-means on a sample (the IVF build step)."""
    sample = ds.limit(sample_n).to_pandas()
    x = _norm(np.stack(sample[emb_col].to_numpy()).astype(np.float64))
    rng = np.random.default_rng(seed)
    c = x[rng.choice(len(x), min(n_centroids, len(x)), replace=False)]
    for _ in range(iters):
        assign = (x @ c.T).argmax(axis=1)
        for j in range(len(c)):
            pts = x[assign == j]
            if len(pts):
                c[j] = pts.mean(axis=0)
        c = _norm(c)
    return c


def ivf_topk(
    ds: rd.Dataset,
    query: np.ndarray,
    centroids: np.ndarray,
    k: int = 10,
    nprobe: int = 4,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    round_dp: int | None = 6,
    concurrency: int | None = None,
) -> rd.Dataset:
    """Approximate top-k: score only vectors whose nearest centroid is among
    the query's ``nprobe`` closest centroids. Same output schema as
    brute_force_topk; recall depends on nprobe/n_centroids (measured vs
    brute_force_topk in tests/test_multimodal_dedup2.py)."""
    q = _norm(np.asarray(query, dtype=np.float64).reshape(1, -1))[0]
    probe = set(np.argsort(-(centroids @ q))[:nprobe].tolist())
    cref = ray.put(centroids)

    class Probe:
        def __init__(self):
            self.c = ray.get(cref)

        def __call__(self, tbl: pa.Table) -> pa.Table:
            m = _norm(_mat(tbl, emb_col))
            assign = (m @ self.c.T).argmax(axis=1)
            keep = np.isin(assign, list(probe))
            if not keep.any():
                return pa.table({id_col: pa.array([], tbl.column(id_col).type), "cosine_sim": pa.array([], pa.float64())})
            sims = (m[keep] @ q).astype(np.float64)
            if round_dp is not None:
                sims = np.round(sims, round_dp)
            ids = tbl.column(id_col).take(pa.array(np.flatnonzero(keep)))
            n = min(k, len(sims))
            idx = np.argpartition(-sims, n - 1)[:n]
            return pa.table({id_col: ids.take(pa.array(idx)), "cosine_sim": pa.array(sims[idx])})

    # actor-pool sized to the node (round 1 hard-coded concurrency=2 and
    # starved a 32-CPU box); callers on a cluster should pass an explicit
    # per-stage concurrency
    if concurrency is None:
        from vaero_ray.runtime import auto_concurrency

        concurrency = auto_concurrency(frac=0.5)
    partials = ds.map_batches(Probe, batch_format="pyarrow", zero_copy_batch=True, concurrency=concurrency)
    return partials.sort(["cosine_sim", id_col], descending=[True, False]).limit(k)


def label_centroid_sums(
    ds: rd.Dataset,
    emb_col: str = "embedding",
    label_col: str = "label",
    scale: int = 1_000_000,
) -> rd.Dataset:
    """Distributed EXACT per-label centroid accumulators: one row per
    (label, dim) with the micro-unit component sum and vector count —
    the two-phase vector aggregate behind supervised centroid training
    (complement of the driver-sampled k-means in ``train_centroids``).

    Components are fixed-pointed FIRST (``floor(v*scale + 0.5)``, exact
    in float64 on both sides) so the sums are integers: associative,
    order-independent, and SQL-hash-exact — float sums would differ in
    the last ulp under re-ordering. Shuffle moves labels x dims small
    rows per block. Centroid = sum_micro / (n_vecs * scale)."""
    from ray.data.aggregate import Sum

    def partial(tbl: pa.Table) -> pa.Table:
        # label emitted as int64 regardless of source width: the bucketed
        # merge preserves dtypes exactly (the old native groupby happened
        # to promote int32 keys), and the gate/oracle contract is BIGINT
        empty = pa.table(
            {
                "label": pa.array([], pa.int64()),
                "dim": pa.array([], pa.int64()),
                "sum_micro": pa.array([], pa.int64()),
                "n_vecs": pa.array([], pa.int64()),
            }
        )
        if not tbl.num_rows:
            return empty
        m = _mat(tbl, emb_col, dtype=np.float64)
        micro = np.floor(m * scale + 0.5).astype(np.int64)
        enc = tbl.column(label_col).combine_chunks().dictionary_encode()
        codes = np.asarray(enc.indices).astype(np.int64)
        n_lab = len(enc.dictionary)
        d = micro.shape[1]
        sums = np.zeros((n_lab, d), dtype=np.int64)
        np.add.at(sums, codes, micro)
        counts = np.bincount(codes, minlength=n_lab).astype(np.int64)
        lab_idx = np.repeat(np.arange(n_lab, dtype=np.int64), d)
        return pa.table(
            {
                "label": pc.cast(
                    enc.dictionary.take(pa.array(lab_idx, pa.int64())), pa.int64()
                ),
                "dim": pa.array(np.tile(np.arange(1, d + 1, dtype=np.int64), n_lab)),
                "sum_micro": pa.array(sums.ravel(), pa.int64()),
                "n_vecs": pa.array(np.repeat(counts, d), pa.int64()),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    from vaero_ray.stages.keyed import bucketed_keyed_sum

    # one small hash-bucket exchange (k*d accumulator rows); Ray's sort
    # Aggregate pays seconds per Sum column over tiny partial blocks.
    # num_buckets=8: the merge input is k*d rows per block, so a large
    # bucket count would only mint empty shuffle partitions.
    return bucketed_keyed_sum(partials, ["label", "dim"], ["sum_micro", "n_vecs"], num_buckets=8)


def _trunc_div(s: np.ndarray, n: np.ndarray) -> np.ndarray:
    """Exact int64 division truncating toward zero — DuckDB's ``//``
    semantics (numpy's ``//`` floors, which differs on negative sums)."""
    q = s // n
    return q + ((s % n != 0) & (s < 0)).astype(np.int64)


def kmeans_assign(
    ds: rd.Dataset,
    k: int = 4,
    iters: int = 2,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    scale: int = 1_000_000,
) -> rd.Dataset:
    """Distributed EXACT Lloyd k-means over an embedding column — the
    iterative broadcast-centroids pattern: each iteration is ONE
    streaming pass (map_batches computes per-batch per-(cluster, dim)
    integer partial sums; a tiny groupby merges k x d rows to the
    driver), centroids travel to workers via ``ray.put`` once per
    iteration. Nothing but k x d accumulator rows ever leaves a block,
    so the shape holds at 100 TB (cost = iters passes over the input).

    Determinism / SQL-exactness (the semantic-dedup clustering step the
    training-data tier needs, judged by a hash-exact oracle):

    - vectors quantized ONCE to int64 micro-units ``floor(v*scale+0.5)``
      (same fixed-point rule as ``label_centroid_sums``);
    - init: for each residue class ``j = id % k``, the vector with the
      smallest id (one tiny groupby-min — no global sort, no RNG);
    - assignment: argmin of EXACT integer squared L2; ties -> lowest
      cluster id (numpy argmin first-occurrence == SQL ORDER BY dist, cid);
    - update: per-dim ``trunc_div(sum, n)`` (DuckDB ``//``); empty
      clusters keep their previous centroid;
    - ``iters`` assignment passes with an update between consecutive
      ones; output = final assignment ``(id, cluster)``.

    Overflow bounds: |q| <= scale * max|v|; distances need
    ``d * (2*max_q)^2 < 2^63``, sums need ``n_rows * max_q < 2^63`` —
    fine for unit-scale embeddings at scale=1e6 up to ~9e12 rows.
    """
    from ray.data.aggregate import Min, Sum

    if k < 1 or iters < 1:
        raise ValueError("kmeans_assign: k and iters must be >= 1")

    def _micro(tbl: pa.Table) -> np.ndarray:
        return np.floor(_mat(tbl, emb_col, np.float64) * scale + 0.5).astype(np.int64)

    # ---- deterministic init: min id per residue class (tiny exchange) --
    def res_tag(tbl: pa.Table) -> pa.Table:
        ids = tbl.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"__res": pa.array(ids % k), id_col: pa.array(ids)})

    seed_rows = (
        ds.map_batches(res_tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__res")
        .aggregate(Min(id_col, alias_name="seed_id"))
        .take_all()
    )  # <= k rows — lineage-scale, never data
    seed_ids = {int(r["__res"]): int(r["seed_id"]) for r in seed_rows}
    if len(seed_ids) < k:
        raise ValueError(
            f"kmeans_assign: only {len(seed_ids)} of {k} residue classes "
            "present; lower k or provide denser ids"
        )
    id_set = set(seed_ids.values())

    def seed_vec(tbl: pa.Table) -> pa.Table:
        ids = tbl.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        mask = np.isin(ids, list(id_set))
        if not mask.any():
            return pa.table({id_col: pa.array([], pa.int64()),
                             "__q": pa.array([], pa.list_(pa.int64()))})
        q = _micro(tbl.filter(pa.array(mask)))
        return pa.table({id_col: pa.array(ids[mask]),
                         "__q": pa.array(list(q), pa.list_(pa.int64()))})

    seeds = {
        int(r[id_col]): np.asarray(r["__q"], dtype=np.int64)
        for r in ds.map_batches(seed_vec, batch_format="pyarrow", zero_copy_batch=True).take_all()
    }  # k rows of d ints each
    centroids = np.stack([seeds[seed_ids[j]] for j in range(k)])  # (k, d) int64
    d = centroids.shape[1]

    def _assign(q: np.ndarray, c: np.ndarray) -> np.ndarray:
        # chunk rows so the (rows, k, d) int64 temp stays ~64 MB
        step = max(1, (64 << 20) // max(c.shape[0] * c.shape[1] * 8, 1))
        out = np.empty(len(q), dtype=np.int64)
        for lo in range(0, len(q), step):
            diff = q[lo:lo + step, None, :] - c[None, :, :]
            np.square(diff, out=diff)
            out[lo:lo + step] = diff.sum(axis=2).argmin(axis=1)
        return out

    for _ in range(iters - 1):
        cref = ray.put(centroids)

        def partial(tbl: pa.Table, _cref=cref) -> pa.Table:
            empty = pa.table({"cluster": pa.array([], pa.int64()),
                              "dim": pa.array([], pa.int64()),
                              "sum_micro": pa.array([], pa.int64()),
                              "n_vecs": pa.array([], pa.int64())})
            if not tbl.num_rows:
                return empty
            c = ray.get(_cref)  # object-store read, once per task
            q = _micro(tbl)
            a = _assign(q, c)
            sums = np.zeros((k, d), dtype=np.int64)
            np.add.at(sums, a, q)
            counts = np.bincount(a, minlength=k).astype(np.int64)
            return pa.table({
                "cluster": pa.array(np.repeat(np.arange(k, dtype=np.int64), d)),
                "dim": pa.array(np.tile(np.arange(1, d + 1, dtype=np.int64), k)),
                "sum_micro": pa.array(sums.ravel()),
                "n_vecs": pa.array(np.repeat(counts, d)),
            })

        from vaero_ray.stages.keyed import bucketed_keyed_sum

        merged = bucketed_keyed_sum(
            ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
            ["cluster", "dim"], ["sum_micro", "n_vecs"], num_buckets=8,
        ).take_all()  # k*d accumulator rows — lineage-scale; bucketed
        # exchange, not Ray's per-column sort Aggregate (it cost ~1 s per
        # Sum column PER ITERATION on the tiny accumulator blocks)
        nxt = centroids.copy()  # empty clusters keep previous centroid
        for r in merged:
            if r["n_vecs"]:
                nxt[int(r["cluster"]), int(r["dim"]) - 1] = _trunc_div(
                    np.int64(r["sum_micro"]), np.int64(r["n_vecs"])
                )
        centroids = nxt

    cref = ray.put(centroids)

    def final_assign(tbl: pa.Table, _cref=cref) -> pa.Table:
        if not tbl.num_rows:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "cluster": pa.array([], pa.int64())})
        a = _assign(_micro(tbl), ray.get(_cref))
        return pa.table({
            id_col: tbl.column(id_col).cast(pa.int64()),
            "cluster": pa.array(a),
        })

    return ds.map_batches(final_assign, batch_format="pyarrow", zero_copy_batch=True)


def embedding_dim_stats(
    ds: rd.Dataset,
    emb_col: str = "embedding",
    scale: int = 1_000_000,
) -> rd.Dataset:
    """Global per-DIMENSION mean/variance of an embedding column — the
    feature-drift / normalization profile of a vector corpus. Same
    exact-integer convention as :func:`label_centroid_sums`: components
    fixed-pointed once (``floor(v*scale + 0.5)``, exact in float64 both
    engines), then each block reduces to d rows of
    (dim, n_vecs, sum_micro, sumsq_micro) — one matrix sum + one squared
    sum per batch, no per-row Python — merged through one tiny bucketed
    exchange (d rows per block). mean/variance are derived at the end by
    the identical closed-form float64 expression the SQL oracle writes
    (6-dp). Headroom: |v| <= ~30 at scale=1e6 keeps sumsq x 1e8 vectors
    inside int64."""
    from vaero_ray.stages.keyed import bucketed_keyed_sum

    def partial(tbl: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "dim": pa.array([], pa.int64()),
                "n_vecs": pa.array([], pa.int64()),
                "sum_micro": pa.array([], pa.int64()),
                "sumsq_micro": pa.array([], pa.int64()),
            }
        )
        if not tbl.num_rows:
            return empty
        m = _mat(tbl, emb_col, dtype=np.float64)
        micro = np.floor(m * scale + 0.5).astype(np.int64)
        d = micro.shape[1]
        return pa.table(
            {
                "dim": pa.array(np.arange(1, d + 1, dtype=np.int64)),
                "n_vecs": pa.array(np.full(d, tbl.num_rows, np.int64)),
                "sum_micro": pa.array(micro.sum(axis=0)),
                "sumsq_micro": pa.array((micro * micro).sum(axis=0)),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    merged = bucketed_keyed_sum(
        partials, ["dim"], ["n_vecs", "sum_micro", "sumsq_micro"], num_buckets=8
    )

    def finalize(tbl: pa.Table) -> pa.Table:
        n = tbl.column("n_vecs").to_numpy(zero_copy_only=False).astype(np.float64)
        s = tbl.column("sum_micro").to_numpy(zero_copy_only=False).astype(np.float64)
        ss = tbl.column("sumsq_micro").to_numpy(zero_copy_only=False).astype(np.float64)
        # NO rounding: the inputs are exact integers, so the identical
        # IEEE expression tree is bit-deterministic on both engines —
        # and ROUND would REINTRODUCE a mismatch (numpy half-even vs
        # DuckDB half-away differ when s/(n*sc) lands exactly on a
        # .5e-6 boundary, observed at sf0.001: max diff exactly 1e-6).
        sc = float(scale)
        mean = s / (n * sc)
        var = (ss / n - (s / n) * (s / n)) / (sc * sc)
        return tbl.append_column("mean_val", pa.array(mean, pa.float64())).append_column(
            "var_val", pa.array(var, pa.float64())
        )

    return merged.map_batches(finalize, batch_format="pyarrow", zero_copy_batch=True)


def embedding_gram(
    ds: rd.Dataset,
    emb_col: str = "embedding",
    scale: int = 1_000_000,
) -> rd.Dataset:
    """EXACT Gram matrix of an embedding column (upper triangle,
    1-based dims): the list-column linear-algebra primitive under PCA /
    whitening / covariance drift. Components fixed-pointed once
    (``floor(v*scale + 0.5)``, exact in float64 both engines), then
    each block contributes ONE vectorized ``X^T @ X`` int64 matmul
    collapsed to d(d+1)/2 (i, j, gram_micro2, n_vecs) partial rows —
    zero row exchange, merged through one tiny keyed sum (2080 rows per
    block at d=64). ``gram`` is the raw float64 division by scale^2.
    Int64 headroom: |v|*scale squared times corpus rows must fit
    (|v|<=2 at scale=1e6 holds to ~5e5 vectors per partial and the
    merge is exact past that; rescale for wider corpora)."""
    from vaero_ray.stages.keyed import bucketed_keyed_sum

    def partial(tbl: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "i": pa.array([], pa.int64()),
                "j": pa.array([], pa.int64()),
                "gram_micro2": pa.array([], pa.int64()),
                "n_vecs": pa.array([], pa.int64()),
            }
        )
        if not tbl.num_rows:
            return empty
        m = _mat(tbl, emb_col, dtype=np.float64)
        micro = np.floor(m * scale + 0.5).astype(np.int64)
        g = micro.T @ micro
        d = g.shape[0]
        iu, ju = np.triu_indices(d)
        return pa.table(
            {
                "i": pa.array(iu.astype(np.int64) + 1),
                "j": pa.array(ju.astype(np.int64) + 1),
                "gram_micro2": pa.array(g[iu, ju], pa.int64()),
                "n_vecs": pa.array(np.full(len(iu), tbl.num_rows, np.int64)),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    merged = bucketed_keyed_sum(
        parts, ["i", "j"], ["gram_micro2", "n_vecs"], num_buckets=4
    )

    def finalize(tbl: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        gram = pc.divide(
            pc.cast(tbl.column("gram_micro2"), pa.float64()),
            pa.scalar(float(scale) * float(scale)),
        )
        return tbl.append_column("gram", gram)

    return merged.map_batches(finalize, batch_format="pyarrow", zero_copy_batch=True)


def label_silhouette(
    ds: rd.Dataset,
    emb_col: str = "embedding",
    label_col: str = "label",
    scale: int = 1_000_000,
) -> pa.Table:
    """Simplified (centroid-based) silhouette score per label — the
    clustering-quality evaluation at corpus scale: for each vector,
    ``a`` = euclidean distance to its OWN label centroid, ``b`` = the
    nearest OTHER centroid, ``s = (b - a)/max(a, b)`` (the O(n*k)
    medoid-free form — the O(n^2) pairwise silhouette cannot exist at
    100 TB). Two passes, zero row exchange: pass 1 is the exact integer
    centroid accumulator (:func:`label_centroid_sums`, labels x dims
    rows move); pass 2 broadcasts the centroid matrix and each block
    reduces to per-label (n, sum of floor(s*1e6 + 0.5)) partials — the
    per-vector float chain (micro components, fixed dim order) is
    engine-deterministic, so the micro-quantized sums are exact int64
    and the per-label mean is a raw division."""
    from vaero_ray.stages.keyed import bucketed_keyed_sum

    cents = label_centroid_sums(ds, emb_col, label_col, scale=scale).to_pandas()
    cents = cents.sort_values(["label", "dim"], kind="mergesort")
    labels = np.sort(cents["label"].unique())
    d = int(cents["dim"].max())
    k = len(labels)
    cmat = np.zeros((k, d), np.float64)
    li = {int(l): i for i, l in enumerate(labels)}
    cmat[
        cents["label"].map(li).to_numpy(np.int64),
        cents["dim"].to_numpy(np.int64) - 1,
    ] = cents["sum_micro"].to_numpy(np.float64) / (
        cents["n_vecs"].to_numpy(np.float64) * scale
    )

    def partial(tbl: pa.Table) -> pa.Table:
        import pandas as pd

        empty = pa.table(
            {
                "label": pa.array([], pa.int64()),
                "n_vecs": pa.array([], pa.int64()),
                "sum_sil_micro": pa.array([], pa.int64()),
            }
        )
        if not tbl.num_rows:
            return empty
        m = _mat(tbl, emb_col, dtype=np.float64)
        x = np.floor(m * scale + 0.5) / scale  # micro-quantized components
        lab = tbl.column(label_col).to_numpy(zero_copy_only=False).astype(np.int64)
        codes = np.array([li[int(v)] for v in np.unique(lab)])
        code_of = np.searchsorted(np.unique(lab), lab)
        own = codes[code_of]
        # n x k squared distances: |x|^2 + |c|^2 - 2 x.c  would lose the
        # fixed per-dim association the oracle writes; with d<=64 and k
        # small, the explicit (x - c)^2 sum in dim order is cheap and
        # bit-faithful
        d2 = np.zeros((len(x), k), np.float64)
        for dim in range(x.shape[1]):
            diff = x[:, dim : dim + 1] - cmat[None, :, dim]
            d2 = d2 + diff * diff
        dist = np.sqrt(d2)
        a = dist[np.arange(len(x)), own]
        if k < 2:  # silhouette undefined with one cluster: s = 0
            s = np.zeros(len(x), np.float64)
        else:
            masked = dist.copy()
            masked[np.arange(len(x)), own] = np.inf
            b = masked.min(axis=1)
            mx = np.maximum(a, b)
            with np.errstate(invalid="ignore", divide="ignore"):
                s = np.where(mx > 0, (b - a) / mx, 0.0)
        micro = np.floor(s * 1_000_000 + 0.5).astype(np.int64)
        out = pd.DataFrame({"label": lab, "n_vecs": 1, "sum_sil_micro": micro})
        g = out.groupby("label", sort=False, as_index=False).sum()
        return pa.Table.from_pandas(
            g.astype({"label": "int64", "n_vecs": "int64", "sum_sil_micro": "int64"}),
            preserve_index=False,
        )

    parts = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    merged = bucketed_keyed_sum(
        parts, ["label"], ["n_vecs", "sum_sil_micro"], num_buckets=4
    ).to_pandas().sort_values("label")
    n = merged["n_vecs"].to_numpy(np.int64)
    ssum = merged["sum_sil_micro"].to_numpy(np.int64)
    return pa.table(
        {
            "label": pa.array(merged["label"].to_numpy(np.int64), pa.int64()),
            "n_vecs": pa.array(n, pa.int64()),
            "sum_sil_micro": pa.array(ssum, pa.int64()),
            "mean_sil": pa.array(ssum / (n * 1e6), pa.float64()),
        }
    )


def jl_project(
    ds: rd.Dataset,
    out_dim: int = 8,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    scale: int = 1_000_000,
) -> rd.Dataset:
    """Johnson-Lindenstrauss Rademacher projection d -> ``out_dim``: the
    width-reduction stage run before ANN / clustering on a wide vector
    corpus. Components are fixed-pointed once (micro-int convention of
    :func:`embedding_dim_stats`), then projected with a DETERMINISTIC
    +/-1 sign matrix (sign(i,j) = [(i*1103515245 + j*12345) mod 97 < 48],
    i 1-based input dim) — an integer matmul, so every projected
    coordinate is EXACT int64 and shard/order-independent (the unbiased
    JL estimator is proj/sqrt(out_dim); callers rescale when they need
    the metric, the stored codes stay integers).

    Scale shape: stateless zero-copy scan, no shuffle; the sign matrix
    is a d x out_dim constant rebuilt per batch (trivial) rather than
    broadcast. Output exploded (id, out_dim, proj_micro)."""

    def project(tbl: pa.Table) -> pa.Table:
        if not tbl.num_rows:
            return pa.table(
                {id_col: pa.array([], pa.int64()),
                 "out_dim": pa.array([], pa.int64()),
                 "proj_micro": pa.array([], pa.int64())}
            )
        m = _mat(tbl, emb_col, dtype=np.float64)
        micro = np.floor(m * scale + 0.5).astype(np.int64)
        d = micro.shape[1]
        i = np.arange(1, d + 1, dtype=np.int64)[:, None]
        j = np.arange(out_dim, dtype=np.int64)[None, :]
        signs = np.where((i * 1103515245 + j * 12345) % 97 < 48, 1, -1).astype(np.int64)
        proj = micro @ signs
        ids = tbl.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                id_col: pa.array(np.repeat(ids, out_dim), pa.int64()),
                "out_dim": pa.array(np.tile(np.arange(out_dim, dtype=np.int64), len(ids))),
                "proj_micro": pa.array(proj.reshape(-1), pa.int64()),
            }
        )

    return ds.map_batches(project, batch_format="pyarrow", zero_copy_batch=True)


def int8_quantize(
    ds: rd.Dataset,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    scale: int = 1_000_000,
) -> rd.Dataset:
    """Per-dimension int8 vector quantization (the 4x storage compressor
    run before shipping a vector corpus): pass 1 reduces each block to d
    rows of (dim, min_micro, max_micro) and merges them in a tiny keyed
    exchange; the d-row table is collected and closed over (broadcast by
    value — it is the ONLY thing that crosses passes); pass 2 re-scans
    and emits codes. The code mapping is PURE INTEGER —
    ``(m - min) * 255 // (max - min)`` on the micro-int components — so
    outputs are exact on any engine, with constant dims pinned to 0.
    Output exploded (id, dim [1-based], code)."""
    from vaero_ray.stages.keyed import bucketed_keyed_agg

    def partial(tbl: pa.Table) -> pa.Table:
        empty = pa.table(
            {"dim": pa.array([], pa.int64()),
             "mn": pa.array([], pa.int64()),
             "mx": pa.array([], pa.int64())}
        )
        if not tbl.num_rows:
            return empty
        m = _mat(tbl, emb_col, dtype=np.float64)
        micro = np.floor(m * scale + 0.5).astype(np.int64)
        d = micro.shape[1]
        return pa.table(
            {
                "dim": pa.array(np.arange(1, d + 1, dtype=np.int64)),
                "mn": pa.array(micro.min(axis=0)),
                "mx": pa.array(micro.max(axis=0)),
            }
        )

    mm = bucketed_keyed_agg(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        ["dim"], {"mn": "min", "mx": "max"}, num_buckets=4,
    ).to_pandas().sort_values("dim")
    mn = mm["mn"].to_numpy(np.int64)
    mx = mm["mx"].to_numpy(np.int64)
    rng = mx - mn
    safe = np.where(rng == 0, 1, rng)

    def codes(tbl: pa.Table) -> pa.Table:
        if not tbl.num_rows:
            return pa.table(
                {id_col: pa.array([], pa.int64()),
                 "dim": pa.array([], pa.int64()),
                 "code": pa.array([], pa.int64())}
            )
        m = _mat(tbl, emb_col, dtype=np.float64)
        micro = np.floor(m * scale + 0.5).astype(np.int64)
        d = micro.shape[1]
        c = (micro - mn[None, :]) * 255 // safe[None, :]
        c[:, rng == 0] = 0
        ids = tbl.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                id_col: pa.array(np.repeat(ids, d), pa.int64()),
                "dim": pa.array(np.tile(np.arange(1, d + 1, dtype=np.int64), len(ids))),
                "code": pa.array(c.reshape(-1), pa.int64()),
            }
        )

    return ds.map_batches(codes, batch_format="pyarrow", zero_copy_batch=True)
