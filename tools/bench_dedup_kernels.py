"""Dedup-kernel throughput benchmark: quantifies the round-2
vectorization of the MinHash/SimHash signature kernels (round 1 looped
`for i, t in enumerate(texts)` per document — the flagged dominant cost
of the dedup tier at corpus scale).

Synthesizes a deterministic corpus (seeded word-pool sampling, fully
vectorized via arrow binary_join), then measures:

1. single-process kernel A/B: new flat-buffer kernels vs a faithful
   reconstruction of the round-1 per-document loop, same documents;
2. corpus-scale signature throughput through Ray Data map_batches.

Usage: python tools/bench_dedup_kernels.py [n_docs_ab] [n_docs_ray]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_WORDS = (
    "key agg row scan slow fast table value part hash merge batch spark line sort window "
    "filter map join shard block chunk byte text token index queue stream epoch state actor "
    "plan query oracle count group limit union order field column record event turn role"
).split()


def make_docs(n: int, words_per_doc: int = 60, seed: int = 7) -> pa.Table:
    rng = np.random.default_rng(seed)
    pool = pa.array(_WORDS)
    idx = rng.integers(0, len(_WORDS), n * words_per_doc)
    flat = pc.take(pool, pa.array(idx))
    offs = pa.array(np.arange(n + 1, dtype=np.int32) * words_per_doc)
    texts = pc.binary_join(pa.ListArray.from_arrays(offs, flat), " ")
    return pa.table({"doc_id": pa.array(np.arange(n, dtype=np.int64)), "text": texts})


# faithful round-1 kernels (per-document Python loops) for the A/B
def minhash_signatures_r1(tbl, num_perm=64, shingle_k=5):
    from vaero_ray.stages.dedup import _MERSENNE, _perm_params, _shingle_hashes

    a, b = _perm_params(num_perm)
    texts = tbl.column("text").to_pylist()
    sigs = np.empty((len(texts), num_perm), dtype=np.uint64)
    for i, t in enumerate(texts):
        sh = _shingle_hashes(t, shingle_k)
        vals = (a[None, :] * (sh[:, None] % _MERSENNE) + b[None, :]) % _MERSENNE
        sigs[i] = vals.min(axis=0)
    return sigs


def main() -> None:
    n_ab = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    n_ray = int(sys.argv[2]) if len(sys.argv) > 2 else 400_000

    from vaero_ray.stages.dedup import minhash_signatures, simhash_signatures

    for wpd, label in ((60, "long docs (~370 chars)"), (8, "short docs (~50 chars)")):
        docs = make_docs(n_ab, words_per_doc=wpd)
        total_mb = docs.column("text").nbytes / 1e6
        t0 = time.perf_counter()
        new_sigs = minhash_signatures(docs)
        t_new = time.perf_counter() - t0
        t0 = time.perf_counter()
        old = minhash_signatures_r1(docs)
        t_old = time.perf_counter() - t0
        got = np.asarray(new_sigs.column("signature").combine_chunks().flatten()).reshape(n_ab, 64)
        assert np.array_equal(got, old), "vectorized kernel diverges from per-doc reference"
        print(
            f"minhash A/B ({n_ab} {label}, {total_mb:.0f} MB): "
            f"round1 per-doc {n_ab/t_old:,.0f} docs/s | round2 vectorized {n_ab/t_new:,.0f} docs/s "
            f"| speedup {t_old/t_new:.1f}x (identical signatures)"
        )

    docs = make_docs(n_ab)
    t0 = time.perf_counter()
    simhash_signatures(docs)
    t_sim = time.perf_counter() - t0
    print(f"simhash ({n_ab} docs): {n_ab/t_sim:,.0f} docs/s single-process")

    # corpus-scale through Ray Data
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False, logging_level="ERROR")
    import ray.data as rd

    rd.DataContext.get_current().enable_progress_bars = False
    big = make_docs(n_ray, seed=11)
    n_cpus = int(ray.cluster_resources()["CPU"])
    ds = rd.from_arrow(big).repartition(n_cpus * 8).materialize()
    rd.range(256, override_num_blocks=256).map_batches(lambda b: b, batch_format="pyarrow").count()
    t0 = time.perf_counter()
    n_out = ds.map_batches(minhash_signatures, batch_format="pyarrow", zero_copy_batch=True).count()
    t_ray = time.perf_counter() - t0
    mb = big.column("text").nbytes / 1e6
    print(
        f"minhash corpus-scale ({n_ray} docs, {mb:.0f} MB, Ray map_batches, "
        f"{int(ray.cluster_resources()['CPU'])} cpus): {n_out/t_ray:,.0f} docs/s, {mb/t_ray:,.0f} MB/s"
    )
    ray.shutdown()


if __name__ == "__main__":
    main()
