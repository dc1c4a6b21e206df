"""Round-4 third batch: distributed exact k-means, bigram corpus
commonness, negation CEP (absence pattern), and unpivot/melt."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd


def _blocks(df, nblocks=5):
    return rd.from_pandas([d for _, d in df.groupby(np.arange(len(df)) % nblocks)])


# ---------------------------------------------------------------- kmeans
def _vecs(n=90, d=6, seed=5):
    rng = np.random.default_rng(seed)
    # three planted blobs so the clustering is non-trivial
    centers = rng.normal(0, 0.25, (3, d))
    v = centers[np.arange(n) % 3] + rng.normal(0, 0.02, (n, d))
    return pd.DataFrame(
        {"vec_id": np.arange(n, dtype=np.int64), "embedding": list(v.astype(np.float32))}
    )


def _kmeans_ref(df, k, iters, scale=1_000_000):
    """Literal re-implementation of the documented semantics."""
    q = np.floor(np.stack(df["embedding"]).astype(np.float64) * scale + 0.5).astype(np.int64)
    ids = df["vec_id"].to_numpy()
    seed_ids = {}
    for j in range(k):
        cls = ids[ids % k == j]
        seed_ids[j] = cls.min()
    c = np.stack([q[np.flatnonzero(ids == seed_ids[j])[0]] for j in range(k)])
    for it in range(iters):
        d2 = ((q[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        a = d2.argmin(axis=1)
        if it == iters - 1:
            return pd.DataFrame({"vec_id": ids, "cluster": a.astype(np.int64)})
        nxt = c.copy()
        for j in range(k):
            pts = q[a == j]
            if len(pts):
                s = pts.sum(axis=0)
                n = len(pts)
                qd = s // n
                qd = qd + ((s % n != 0) & (s < 0)).astype(np.int64)  # trunc toward 0
                nxt[j] = qd
        c = nxt


def test_kmeans_assign_matches_reference(ray_session):
    from vaero_ray.stages.ann import kmeans_assign

    df = _vecs()
    exp = _kmeans_ref(df, k=3, iters=2).sort_values("vec_id", ignore_index=True)
    got = (
        kmeans_assign(_blocks(df), k=3, iters=2)
        .to_pandas()
        .sort_values("vec_id", ignore_index=True)
    )
    pd.testing.assert_frame_equal(got, exp)
    assert got["cluster"].nunique() == 3  # blobs actually separate


def test_kmeans_more_iters_converges(ray_session):
    from vaero_ray.stages.ann import kmeans_assign

    df = _vecs(n=60, seed=9)
    a3 = kmeans_assign(_blocks(df), k=3, iters=3).to_pandas().sort_values("vec_id")
    a4 = kmeans_assign(_blocks(df), k=3, iters=4).to_pandas().sort_values("vec_id")
    # planted blobs: assignment is stable once converged
    assert (a3["cluster"].to_numpy() == a4["cluster"].to_numpy()).all()


# ------------------------------------------------------ bigram commonness
def test_bigram_commonness_matches_naive(ray_session):
    from vaero_ray.stages.textstats import bigram_commonness

    docs = pd.DataFrame(
        {
            "doc_id": np.arange(6, dtype=np.int64),
            "text": [
                "the cat sat on the mat",
                "the cat sat",
                "on the mat the cat",
                "one",  # no bigram -> absent from output
                "",  # empty -> absent
                "THE CAT sat  on the   mat",  # case/space-normalizes to doc 0
            ],
        }
    )
    # naive reference
    from collections import Counter

    per_doc = {}
    cnt = Counter()
    for _, r in docs.iterrows():
        toks = r["text"].lower().split()
        bgs = [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        per_doc[r["doc_id"]] = bgs
        cnt.update(bgs)
    rows = []
    for did, bgs in per_doc.items():
        if not bgs:
            continue
        s = sum(cnt[b] for b in bgs)
        rows.append((did, len(bgs), s, s // len(bgs)))
    exp = pd.DataFrame(rows, columns=["doc_id", "n_bigrams", "sum_freq", "avg_freq"]).sort_values(
        "doc_id", ignore_index=True
    )
    got = (
        bigram_commonness(_blocks(docs, 3), num_buckets=4)
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


# ------------------------------------------------------------ absence CEP
def test_absence_counts_matches_naive(ray_session):
    from vaero_ray.stages.cep import absence_counts

    rng = np.random.default_rng(17)
    n = 400
    df = pd.DataFrame(
        {
            "user_id": rng.integers(0, 8, n),
            "ts": pd.to_datetime(rng.integers(0, 50_000, n), unit="s"),
            "event_type": rng.choice(["view", "purchase", "click"], n, p=[0.5, 0.2, 0.3]),
        }
    )
    w = 3600
    rows = []
    for uid, g in df.groupby("user_id"):
        v = g[g["event_type"] == "view"]["ts"].to_numpy()
        p = np.sort(g[g["event_type"] == "purchase"]["ts"].to_numpy())
        if not len(v):
            continue
        ab = sum(
            1
            for t in v
            if not ((p > t) & (p <= t + np.timedelta64(w, "s"))).any()
        )
        rows.append((uid, len(v), ab))
    exp = pd.DataFrame(rows, columns=["user_id", "n_first", "n_abandoned"]).sort_values(
        "user_id", ignore_index=True
    )
    got = (
        absence_counts(
            _blocks(df), "user_id", "ts", "event_type", "view", "purchase", w, num_buckets=4
        )
        .to_pandas()
        .sort_values("user_id", ignore_index=True)
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_absence_equal_ts_not_counted(ray_session):
    """A purchase at EXACTLY the view's ts does not convert (strictly
    after), but one at ts + window does (inclusive right edge)."""
    from vaero_ray.stages.cep import absence_counts

    df = pd.DataFrame(
        {
            "user_id": [1, 1, 2, 2],
            "ts": pd.to_datetime([100, 100, 200, 200 + 60], unit="s"),
            "event_type": ["view", "purchase", "view", "purchase"],
        }
    )
    got = (
        absence_counts(_blocks(df, 2), "user_id", "ts", "event_type", "view", "purchase", 60)
        .to_pandas()
        .sort_values("user_id", ignore_index=True)
    )
    assert got.loc[got["user_id"] == 1, "n_abandoned"].item() == 1  # same-ts: no
    assert got.loc[got["user_id"] == 2, "n_abandoned"].item() == 0  # right edge: yes


# ---------------------------------------------------------------- unpivot
def test_unpivot_matches_melt(ray_session):
    from vaero_ray.stages.relational import unpivot

    df = pd.DataFrame(
        {
            "doc_id": np.arange(7, dtype=np.int64),
            "a": np.arange(7, dtype=np.int64) * 2,
            "b": np.arange(7, dtype=np.int64) + 100,
        }
    )
    exp = (
        df.melt(id_vars=["doc_id"], value_vars=["a", "b"], var_name="metric", value_name="value")
        .sort_values(["doc_id", "metric"], ignore_index=True)
    )
    got = (
        unpivot(_blocks(df, 3), ["doc_id"], ["a", "b"])
        .to_pandas()
        .sort_values(["doc_id", "metric"], ignore_index=True)
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


# ------------------------------------------------- emitter shard params
def test_pair_emitters_shard_invariant(ray_session):
    """num_shards / pair_buckets only partition work: results identical
    at any setting (the corpus-scale rehearsal raises them into the
    thousands to bound per-task pair output)."""
    from vaero_ray.stages.dedup import minhash_lsh_dup_edges, simhash_dup_pairs

    rng = np.random.default_rng(3)
    base = [
        "the quick brown fox jumps over the lazy dog again and again",
        "pack my box with five dozen liquor jugs every single day",
        "how vexingly quick daft zebras jump over fences at dawn",
    ]
    texts = []
    for i in range(120):
        t = base[i % 3]
        if i % 4 == 0:
            t = t + " extra token"
        texts.append(t)
    docs = pd.DataFrame({"doc_id": np.arange(120, dtype=np.int64), "text": texts})

    def run(fn, **kw):
        return (
            fn(_blocks(docs, 4), **kw)
            .to_pandas()
            .sort_values(["doc_id", "dup_of"], ignore_index=True)
        )

    a = run(simhash_dup_pairs)
    b = run(simhash_dup_pairs, num_shards=5, pair_buckets=3)
    pd.testing.assert_frame_equal(a, b)
    assert len(a) > 0

    c = run(minhash_lsh_dup_edges)
    d = run(minhash_lsh_dup_edges, num_shards=7, pair_buckets=2)
    pd.testing.assert_frame_equal(c, d)
    assert len(c) > 0
