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
    assert set(feats.columns) == {"doc_id", "width", "height", "pixel_mean", "pixel_std", "content_hash"}
    assert (feats["width"] >= 16).all() and (feats["pixel_mean"] > 0).all()
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
    # true Jaccard, not an estimate: recompute directly
    from vaero_ray.stages.dedup import _shingle_hashes

    s1 = np.unique(_shingle_hashes(base, 5))
    s2 = np.unique(_shingle_hashes(base + " extra", 5))
    inter = np.intersect1d(s1, s2).size
    j = inter / (s1.size + s2.size - inter)
    row = out[(out["doc_id"] == 2) & (out["dup_of"] == 1)].iloc[0]
    assert abs(row["jaccard"] - round(j, 6)) < 1e-9


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
