"""Corpus-scale rehearsal of the session-13 operators over the cached
16M-turn transcript corpus (regenerated on demand, same fixture as
tools/session5_rehearsal.py).

- emd: Wasserstein-1 + Hellinger of text length, user vs assistant —
  the distinct-value-compressed exchange carries one (len, c1, c2) row
  per distinct length, never turns.
- kappa: Cohen's kappa of each conversation's MODAL role between its
  own halves over ~800k conversations — one conv-bucketed shuffle,
  contingency cells out.
- cycle: first-harmonic daily-cycle amplitude per role over all turns
  (exact (role, hod, count) cells, <= roles x 24 rows move).
- chain: Markov conditional entropy of the per-conversation role
  sequence (bounded transition-cell exchange + driver fold).
- aa: Adamic-Adar over the conv<->text-hash-bucket bipartite graph
  (item = hash(text) mod 200k, baskets ~ conversation turn sets) —
  the in-basket quadratic pair emission at 800k baskets.
- containment: set-containment join with planted 80%-subset replica
  baskets every 64th conversation (full-width text hashes keep posting
  lists honest; the planted replicas are the only signal).

Run: python tools/session13_rehearsal.py [--op emd|kappa|cycle|chain|aa|containment|all]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

CORPUS = "/tmp/vaero_ray_bench/transcripts_16m"


def ensure_corpus(turns=16_000_000):
    if not os.path.isdir(CORPUS):
        from vaero_ray.sources.transcripts import write_transcripts_chunks

        write_transcripts_chunks(
            CORPUS, n_files=128, n_convs=turns // 20, mean_turns=20, seed=42
        )
    return CORPUS


def rehearse_emd():
    from vaero_ray.stages.keyed import bucketed_keyed_sum
    from vaero_ray.stages.numstats import emd_two_sample

    ds = rd.read_parquet(CORPUS, columns=["role", "text"])

    def partial(t: pa.Table) -> pa.Table:
        role = t.column("role")
        ln = pc.cast(pc.utf8_length(t.column("text")), pa.int64())
        u = pc.equal(role, "user").to_numpy(zero_copy_only=False)
        a = pc.equal(role, "assistant").to_numpy(zero_copy_only=False)
        df = pd.DataFrame(
            {"v": ln.to_numpy(zero_copy_only=False),
             "c1": u.astype(np.int64), "c2": a.astype(np.int64)}
        )
        df = df[(df.c1 > 0) | (df.c2 > 0)]
        return pa.Table.from_pandas(
            df.groupby("v", sort=False, as_index=False).sum(), preserve_index=False
        )

    t0 = time.time()
    merged = bucketed_keyed_sum(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        ["v"], ["c1", "c2"], num_buckets=4,
    )
    out = emd_two_sample(merged, "v").to_pylist()[0]
    wall = time.time() - t0
    return {"op": "emd_user_vs_assistant", "n1": out["n1"], "n2": out["n2"],
            "w1": out["w1"], "hellinger": out["hellinger"],
            "wall_s": round(wall, 1)}


def rehearse_kappa():
    from vaero_ray.stages.numstats import paired_halves_kappa

    ds = rd.read_parquet(CORPUS, columns=["conv_id", "turn_idx", "role", "ts"])
    t0 = time.time()
    out = paired_halves_kappa(
        ds, "conv_id", "ts", "turn_idx", "role"
    ).to_pylist()[0]
    wall = time.time() - t0
    return {"op": "paired_halves_kappa_role", "n_convs": out["n_keys"],
            "agree": out["agree"], "kappa": out["kappa"],
            "wall_s": round(wall, 1)}


def rehearse_cycle():
    from vaero_ray.stages.numstats import daily_cycle_per_group

    ds = rd.read_parquet(CORPUS, columns=["role", "ts"])
    t0 = time.time()
    out = daily_cycle_per_group(ds, "role", "ts").to_pandas()
    wall = time.time() - t0
    return {"op": "daily_cycle_per_role", "groups": len(out),
            "rel_amp": dict(zip(out["role"], out["rel_amp"])),
            "wall_s": round(wall, 1)}


def rehearse_chain():
    from vaero_ray.stages.cep import transition_counts
    from vaero_ray.stages.numstats import markov_entropy

    ds = rd.read_parquet(CORPUS, columns=["conv_id", "turn_idx", "role", "ts"])
    t0 = time.time()
    cells = transition_counts(ds, "conv_id", "ts", "role", "turn_idx")
    out = markov_entropy(cells.select(["prev", "cur", "n"])).to_pylist()[0]
    wall = time.time() - t0
    return {"op": "role_chain_entropy", "n_trans": out["n_trans"],
            "n_cells": out["n_cells"], "h_cond": out["h_cond"], "mi": out["mi"],
            "wall_s": round(wall, 1)}


def _conv_item_ds(domain=200_000):
    ds = rd.read_parquet(CORPUS, columns=["conv_id", "text"])

    def project(t: pa.Table) -> pa.Table:
        cid = pd.util.hash_array(
            t.column("conv_id").to_numpy(zero_copy_only=False), categorize=False
        ).astype(np.int64) & (2**62 - 1)
        th = pd.util.hash_array(
            np.asarray(t.column("text")), categorize=False
        ).astype(np.uint64)
        item = (th % np.uint64(domain)).astype(np.int64)
        return pa.table(
            {"grp": pa.array(cid, pa.int64()), "item": pa.array(item, pa.int64())}
        )

    return ds.map_batches(project, batch_format="pyarrow", zero_copy_batch=True)


def rehearse_aa():
    from vaero_ray.stages.basket import adamic_adar_pairs

    t0 = time.time()
    out = adamic_adar_pairs(_conv_item_ds(), "grp", "item", top_k=20).to_pandas()
    wall = time.time() - t0
    return {"op": "adamic_adar_conv_baskets", "top_aa": float(out["aa"].iloc[0]),
            "top_common": int(out["common_groups"].iloc[0]),
            "rows_out": len(out), "wall_s": round(wall, 1)}


def rehearse_containment():
    from vaero_ray.stages.dedup import set_containment_pairs

    ds = rd.read_parquet(CORPUS, columns=["conv_id", "text"])

    def project(t: pa.Table) -> pa.Table:
        """Full-width text-hash items; every 64th conversation also
        emits a replica basket (conv-hash + 1) carrying ~80% of its
        items — the planted subset signal."""
        cid = pd.util.hash_array(
            t.column("conv_id").to_numpy(zero_copy_only=False), categorize=False
        ).astype(np.int64) & (2**61 - 1)
        th = pd.util.hash_array(
            np.asarray(t.column("text")), categorize=False
        ).astype(np.int64) & (2**62 - 1)
        planted = (cid % 64 == 0) & (th % 5 != 0)  # ~80% of a planted conv's items
        out = pd.DataFrame({"grp": 2 * cid, "item": th})
        rep = pd.DataFrame({"grp": 2 * cid[planted] + 1, "item": th[planted]})
        return pa.Table.from_pandas(pd.concat([out, rep]), preserve_index=False)

    items = ds.map_batches(project, batch_format="pyarrow", zero_copy_batch=True)
    t0 = time.time()
    out = set_containment_pairs(
        items, "grp", "item", containment_num=3, containment_den=4,
        min_common=4, num_shards=64, pair_buckets=32,
    ).to_pandas()
    wall = time.time() - t0
    # planted pairs have grp ids (2c+1, 2c): every found pair should be one
    planted_ok = int(((out["grp"] - out["dup_of"]) == 1).sum())
    return {"op": "set_containment_planted", "pairs_found": len(out),
            "planted_shape": planted_ok, "wall_s": round(wall, 1)}


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--op", default="all")
    ap.add_argument("--cpus", type=int, default=32)
    args = ap.parse_args()
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.cpus, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    ensure_corpus()
    ops = {
        "emd": rehearse_emd,
        "kappa": rehearse_kappa,
        "cycle": rehearse_cycle,
        "chain": rehearse_chain,
        "aa": rehearse_aa,
        "containment": rehearse_containment,
    }
    for name, fn in ops.items():
        if args.op in (name, "all"):
            print(json.dumps(fn()), flush=True)
    ray.shutdown()
