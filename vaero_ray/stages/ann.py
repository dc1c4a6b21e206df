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
        empty = pa.table(
            {
                "label": pa.array([], tbl.schema.field(label_col).type),
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
                "label": enc.dictionary.take(pa.array(lab_idx, pa.int64())),
                "dim": pa.array(np.tile(np.arange(1, d + 1, dtype=np.int64), n_lab)),
                "sum_micro": pa.array(sums.ravel(), pa.int64()),
                "n_vecs": pa.array(np.repeat(counts, d), pa.int64()),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return partials.groupby(["label", "dim"]).aggregate(
        Sum("sum_micro", alias_name="sum_micro"), Sum("n_vecs", alias_name="n_vecs")
    )
