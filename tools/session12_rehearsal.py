"""Corpus-scale rehearsal of the session-12 suite over the cached
16M-turn transcript corpus (tools/session5_rehearsal.py regenerates it).

- anova: one-way ANOVA F + Welch t of text length across / between
  roles — the per-group (n, sum, sumsq) exchange is three int64s per
  role x block, nothing scales with the 16M rows.
- shape: per-role skewness/kurtosis via distinct-value-compressed
  power sums (exchange bounded by the length domain x 3 roles).
- bf: Brown-Forsythe equal-spread F on |len - median_role| (same
  compressed exchange, medians by the quantile_disc rule).
- gamma: Goodman-Kruskal gamma / Somers' D / tau-a of
  (n_chars, n_tokens) — the distinct-pair exchange + one Fenwick
  sweep over ~|distinct pairs|, never rows.
- damerau: blocked Damerau-Levenshtein pair verifier with planted
  swap+substitution replicas (every 64th turn) — the full-DP-cube
  kernel at corpus scale, blocking on the 40-char prefix.
- bfs: 3-hop multi-source BFS over a 16M-edge derived graph
  (consecutive-turn text-hash nodes mod 200k) — frontier broadcast +
  bounded rescans of the materialized edge set.

Run: python tools/session12_rehearsal.py [--op anova|shape|bf|gamma|damerau|bfs|all]
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


def _len_role_ds():
    ds = rd.read_parquet(CORPUS, columns=["text", "role"])

    def project(tbl: pa.Table) -> pa.Table:
        return pa.table(
            {
                "n_chars": pc.cast(pc.utf8_length(tbl.column("text")), pa.int64()),
                "source": tbl.column("role"),
            }
        )

    return ds.map_batches(project, batch_format="pyarrow", zero_copy_batch=True)


def rehearse_anova():
    from vaero_ray.stages.numstats import anova_oneway, welch_t_test

    t0 = time.time()
    a = anova_oneway(_len_role_ds(), "n_chars", "source")
    wall_a = time.time() - t0
    t0 = time.time()
    w = welch_t_test(_len_role_ds(), "n_chars", "source", "user", "assistant")
    wall_w = time.time() - t0
    da, dw = a.to_pydict(), w.to_pydict()
    return {
        "op": "anova+welch",
        "rows_in": int(da["n"][0]),
        "f_stat": da["f_stat"][0],
        "eta2": da["eta2"][0],
        "welch_t": dw["t"][0],
        "welch_df": dw["df"][0],
        "wall_anova_s": round(wall_a, 1),
        "wall_welch_s": round(wall_w, 1),
    }


def rehearse_shape():
    from vaero_ray.stages.numstats import shape_per_group

    t0 = time.time()
    out = shape_per_group(_len_role_ds(), "n_chars", "source")
    wall = time.time() - t0
    d = out.to_pydict()
    return {
        "op": "shape",
        "groups": d["source"],
        "n": d["n"],
        "skew": d["skew"],
        "ex_kurt": d["ex_kurt"],
        "wall_s": round(wall, 1),
    }


def rehearse_bf():
    from vaero_ray.stages.numstats import brown_forsythe

    t0 = time.time()
    out = brown_forsythe(_len_role_ds(), "n_chars", "source")
    wall = time.time() - t0
    d = out.to_pydict()
    return {
        "op": "brown_forsythe",
        "groups": d["source"],
        "med": d["med"],
        "f_bf": d["f_bf"][0],
        "wall_s": round(wall, 1),
    }


def rehearse_gamma():
    from vaero_ray.stages.keyed import bucketed_keyed_sum
    from vaero_ray.stages.numstats import ordinal_association_from_pairs
    from vaero_ray.stages.textstats import token_counts

    ds = rd.read_parquet(CORPUS, columns=["text"])

    def pair_counts(t: pa.Table) -> pa.Table:
        wt = token_counts(t, "text")
        g = (
            pa.table(
                {
                    "x": pc.cast(pc.utf8_length(t.column("text")), pa.int64()),
                    "y": wt.column("n_tokens"),
                }
            )
            .group_by(["x", "y"])
            .aggregate([([], "count_all")])
        )
        return g.rename_columns(["x", "y", "c"])

    t0 = time.time()
    pairs = ds.map_batches(pair_counts, batch_format="pyarrow", zero_copy_batch=True)
    merged = pa.Table.from_pylist(
        bucketed_keyed_sum(pairs, ["x", "y"], ["c"], num_buckets=8).take_all()
    )
    r = ordinal_association_from_pairs(
        merged.column("x").to_pylist(),
        merged.column("y").to_pylist(),
        merged.column("c").to_pylist(),
    )
    wall = time.time() - t0
    return {
        "op": "gamma",
        "rows_in": r["n"],
        "distinct_pairs": merged.num_rows,
        "gamma_e6": r["gamma_e6"],
        "d_yx_e6": r["d_yx_e6"],
        "tau_a_e6": r["tau_a_e6"],
        "wall_s": round(wall, 1),
    }


def rehearse_damerau():
    ds = rd.read_parquet(CORPUS, columns=["conv_id", "turn_idx", "text"])

    def derive(tbl: pa.Table) -> pa.Table:
        ti = tbl.column("turn_idx").to_numpy().astype(np.int64)
        conv = tbl.column("conv_id").to_pandas()
        ch = pd.util.hash_array(conv.to_numpy(object), categorize=False).astype(
            np.uint64
        )
        rid = ((ch >> np.uint64(16)) << np.uint64(10)).astype(np.int64) + (
            ti % 512
        ) * 2
        texts = tbl.column("text").to_pylist()
        base = pa.table(
            {
                "rid": pa.array(rid, pa.int64()),
                "text": tbl.column("text"),
                "blk": pa.array([t[:40] for t in texts], pa.string()),
            }
        )
        sel = np.flatnonzero((ti % 64 == 0) & np.array([len(t) >= 48 for t in texts]))
        # swap the last two chars AND substitute the 44th: DL = 2 where
        # plain Levenshtein counts 3; blocking prefix untouched
        mtexts = [
            texts[i][:43] + "#" + texts[i][44:-2] + texts[i][-1] + texts[i][-2]
            for i in sel
        ]
        rep = pa.table(
            {
                "rid": pa.array(rid[sel] + 1, pa.int64()),
                "text": pa.array(mtexts, pa.string()),
                "blk": pa.array([t[:40] for t in mtexts], pa.string()),
            }
        )
        return pa.concat_tables([base, rep.cast(base.schema)])

    both = ds.map_batches(derive, batch_format="pyarrow", zero_copy_batch=True)
    from vaero_ray.stages.editdist import damerau_pairs

    t0 = time.time()
    out = damerau_pairs(both, "rid", "text", ["blk"], max_distance=2)
    n_pairs = out.count()
    wall = time.time() - t0
    return {
        "op": "damerau_pairs",
        "rows_in": both.count(),
        "pairs_out": n_pairs,
        "wall_s": round(wall, 1),
    }


def rehearse_bfs():
    from vaero_ray.stages.graph import bfs_hops

    NODES = 200_000
    ds = rd.read_parquet(CORPUS, columns=["conv_id", "turn_idx", "text"])

    def edges(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["conv_id", "turn_idx"], kind="mergesort")
        h = (
            pd.util.hash_array(df["text"].to_numpy(object), categorize=False)
            .astype(np.int64)
            % NODES
        )
        same = df["conv_id"].to_numpy(object)[1:] == df["conv_id"].to_numpy(object)[:-1]
        u, v = h[:-1][same], h[1:][same]
        keep = u != v
        return pd.DataFrame({"u": u[keep], "v": v[keep]})

    t0 = time.time()
    e = ds.map_batches(edges, batch_format="pandas")
    seeds = np.arange(0, NODES, 997, dtype=np.int64)
    out = bfs_hops(e, "u", "v", seeds, max_hops=3)
    wall = time.time() - t0
    hops = out.column("hop").to_numpy(zero_copy_only=False)
    return {
        "op": "bfs_hops",
        "edges_in": e.count(),
        "seeds": len(seeds),
        "reached": out.num_rows,
        "by_hop": {int(h): int((hops == h).sum()) for h in sorted(set(hops))},
        "wall_s": round(wall, 1),
    }


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--op", default="all")
    args = ap.parse_args()
    if not ray.is_initialized():
        ray.init(
            address="local", num_cpus=32, include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    ops = {
        "anova": rehearse_anova,
        "shape": rehearse_shape,
        "bf": rehearse_bf,
        "gamma": rehearse_gamma,
        "damerau": rehearse_damerau,
        "bfs": rehearse_bfs,
    }
    for name, fn in ops.items():
        if args.op in (name, "all"):
            print(json.dumps(fn()))
    ray.shutdown()
