"""Multimodal actor-pool stages + second-wave dedup ops (embedding
cosine exact/LSH, n-gram Jaccard)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from vaero_ray.stages.dedup import embedding_cosine_dups, embedding_lsh_dups, ngram_jaccard_dups
from vaero_ray.stages.multimodal import (
    ImageFeatures,
    ImageResize,
    make_fake_media,
    media_features,
)

SF = "/root/testdata/sf0.001"


def test_fake_media_roundtrip_and_features(ray_session):
    docs = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    media = docs.map_batches(make_fake_media, batch_format="pyarrow", zero_copy_batch=True)
    feats = media_features(media, concurrency=(1, 2), batch_size=16).to_pandas()
    n_docs = docs.count()
    assert len(feats) == n_docs
    assert set(feats.columns) == {"doc_id", "width", "height", "channels", "pixel_sum", "pixel_sumsq"}
    assert (feats["width"] >= 16).all() and (feats["pixel_sum"] > 0).all()
    # closed-form fake codec: pixel_sum of (seed+i)%256 over w*h*3 bytes
    import pyarrow as _pa

    from vaero_ray.stages.textstats import fingerprint as _fp

    one = docs.take(1)[0]
    seed = _fp(_pa.table({"text": [one["text"]]})).column("fingerprint")[0].as_py()
    w, h = 16 + seed % 48, 16 + (seed // 48) % 48
    vals = (seed + np.arange(w * h * 3)) % 256
    row = feats[feats["doc_id"] == one["doc_id"]].iloc[0]
    assert row["pixel_sum"] == vals.sum() and row["pixel_sumsq"] == (vals * vals).sum()
    # deterministic: same input -> same features
    feats2 = media_features(media, concurrency=(1, 2), batch_size=16).to_pandas()
    pd.testing.assert_frame_equal(
        feats.sort_values("doc_id", ignore_index=True), feats2.sort_values("doc_id", ignore_index=True)
    )


def test_image_resize_stage():
    docs = pa.table({"doc_id": [1, 2], "text": ["hello world", "another document"]})
    media = make_fake_media(docs)
    resized = ImageResize(target=(8, 8))(media)
    assert resized.column("width").to_pylist() == [8, 8]
    feats = ImageFeatures()(resized)
    assert feats.num_rows == 2


def test_embedding_cosine_exact_vs_bruteforce(ray_session):
    ds = rd.read_parquet(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    got = embedding_cosine_dups(ds, threshold=0.45).to_pandas()
    # brute-force oracle in numpy
    tbl = pa.concat_tables([pa.Table.from_pandas(ds.to_pandas())])
    ids = tbl.column("vec_id").to_numpy()
    m = np.stack([np.asarray(v, dtype=np.float64) for v in tbl.column("embedding").to_pylist()])
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    sims = m @ m.T
    ii, jj = np.nonzero((sims >= 0.45) & (ids[:, None] < ids[None, :]))
    want = pd.DataFrame(
        {"vec_id": ids[ii], "dup_of": ids[jj], "cosine_sim": np.round(sims[ii, jj], 6)}
    )
    got = got.sort_values(["vec_id", "dup_of"], ignore_index=True)
    want = want.sort_values(["vec_id", "dup_of"], ignore_index=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_embedding_lsh_subset_of_exact(ray_session):
    ds = rd.read_parquet(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    exact = embedding_cosine_dups(ds, threshold=0.45).to_pandas()
    lsh = embedding_lsh_dups(ds, threshold=0.45).to_pandas()
    exact_pairs = set(zip(exact["vec_id"], exact["dup_of"]))
    lsh_pairs = set(zip(lsh["vec_id"], lsh["dup_of"]))
    assert lsh_pairs <= exact_pairs  # LSH proposes, exact confirms: no false pairs


def test_ngram_jaccard_finds_planted_dup(ray_session):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": [base, base + " extra", "completely different content with other words"],
        }
    )
    out = ngram_jaccard_dups(rd.from_arrow(docs), threshold=0.5).to_pandas()
    assert (2, 1) in set(zip(out["doc_id"], out["dup_of"]))
    assert 3 not in set(out["doc_id"])
    # true Jaccard counts, not an estimate: recompute directly
    from vaero_ray.stages.dedup import _shingle_hashes

    s1 = np.unique(_shingle_hashes(base, 5))
    s2 = np.unique(_shingle_hashes(base + " extra", 5))
    inter = np.intersect1d(s1, s2).size
    row = out[(out["doc_id"] == 2) & (out["dup_of"] == 1)].iloc[0]
    assert row["n_common"] == inter
    assert row["n_union"] == s1.size + s2.size - inter


def test_ngram_word_mode_and_minhash_est(ray_session):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": [base, base + " lambda", "one two three four five six seven eight"],
        }
    )
    out = ngram_jaccard_dups(rd.from_arrow(docs), shingle_k=3, threshold=0.5, unit="word").to_pandas()
    pairs = set(zip(out["doc_id"], out["dup_of"]))
    assert (2, 1) in pairs and not any(3 in p for p in pairs)
    row = out[(out["doc_id"] == 2) & (out["dup_of"] == 1)].iloc[0]
    # doc1: 8 word-3-grams; doc2: 9; all of doc1's are shared
    assert row["n_common"] == 8 and row["n_union"] == 9
    # est-only minhash operator: planted dup surfaces with est close to true
    from vaero_ray.stages.dedup import minhash_lsh_dup_edges

    est = minhash_lsh_dup_edges(rd.from_arrow(docs), threshold=0.5).to_pandas()
    est_pairs = set(zip(est["doc_id"], est["dup_of"]))
    assert (2, 1) in est_pairs


def test_ivf_recall_vs_bruteforce(ray_session):
    from vaero_ray.stages.ann import brute_force_topk, ivf_topk, train_centroids

    ds = rd.read_parquet(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    import pyarrow.parquet as pq

    q = np.asarray(
        pq.read_table(f"{SF}/embeddings.parquet").column("embedding")[0].as_py(), dtype=np.float64
    )
    exact = brute_force_topk(ds, q, k=10).to_pandas()
    cents = train_centroids(ds, n_centroids=8)
    approx = ivf_topk(ds, q, cents, k=10, nprobe=2).to_pandas()
    recall = len(set(exact["vec_id"]) & set(approx["vec_id"])) / 10
    assert recall >= 0.5  # approximate regime: documented recall floor
    # full-probe degenerates to exact
    full = ivf_topk(ds, q, cents, k=10, nprobe=8).to_pandas()
    assert set(full["vec_id"]) == set(exact["vec_id"])


def test_simhash_dup_pairs_planted(ray_session):
    base = "the quick brown fox jumps over the lazy dog and runs far away today again"
    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": [base, base + " extra", "totally unrelated words entirely different topic list"],
        }
    )
    from vaero_ray.stages.dedup import simhash_dup_pairs

    out = simhash_dup_pairs(rd.from_arrow(docs), max_hamming=16).to_pandas()
    pairs = set(zip(out["doc_id"], out["dup_of"]))
    assert (2, 1) in pairs
    assert not any(3 in p for p in pairs)


def test_frame_sample_stage(ray_session):
    from vaero_ray.stages.multimodal import FrameSample, ImageFeatures, make_fake_video

    docs = pa.table({"doc_id": pa.array([1, 2], pa.int64()), "text": ["video one", "video two"]})
    vids = make_fake_video(docs)
    ds = rd.from_arrow(vids)
    frames = ds.map_batches(FrameSample, batch_size=8, concurrency=(1, 2), batch_format="pyarrow")
    fdf = frames.to_pandas()
    nf = vids.column("n_frames").to_pylist()
    import math

    assert len(fdf) == sum(math.ceil(n / 4) for n in nf)  # stride 4
    assert set(fdf["doc_id"]) == {1, 2}
    # sampled frames are valid image payloads: features run on them
    feats = frames.map_batches(ImageFeatures, batch_size=8, concurrency=(1, 2), batch_format="pyarrow").to_pandas()
    assert len(feats) == len(fdf)


def test_pack_sequences_prefix_sum_across_blocks(ray_session):
    """The global token offset must be exact across MANY blocks (the
    broadcast exclusive-offset pattern), equal to a single-process scan."""
    import pyarrow as _pa

    from vaero_ray.stages.pack import pack_sequences

    texts = [f"{'tok ' * ((i * 7) % 23)}".strip() for i in range(997)]  # some empty
    tbl = _pa.table({"doc_id": _pa.array(range(997), _pa.int64()), "text": _pa.array(texts)})
    ds = rd.from_arrow(tbl).repartition(13)  # force multi-block prefix sum
    out = pack_sequences(ds, target_len=64).to_pandas().sort_values("doc_id", ignore_index=True)
    # oracle: sequential scan
    acc = 0
    want = []
    for i, t in enumerate(texts):
        n = len(t.split())
        if n > 0:
            want.append((i, n, acc, acc // 64, (acc + n - 1) // 64))
        acc += n
    assert len(out) == len(want)
    got = list(out.itertuples(index=False, name=None))
    assert got == want
