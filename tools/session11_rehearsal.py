"""Corpus-scale rehearsal of the session-11 nonparametric suite over
the cached 16M-turn transcript corpus (tools/session5_rehearsal.py
regenerates it).

- kruskal: Kruskal-Wallis rank ingredients of text length across ALL
  roles — the (length, role) distinct-value-compressed exchange is
  bounded by the length domain x 3 roles, never the 16M rows.
- jsd: Jensen-Shannon divergence user vs assistant length
  distributions (same compressed exchange, two-group projection).
- hl: Hodges-Lehmann location shift user vs assistant — the driver
  crosses two compressed sides (~|length domain| each) and takes the
  weighted median of ~16M x ~16M implied pairwise diffs without ever
  materializing them.
- mood: Mood's median test across roles (pooled quantile_disc median
  + per-role above-median counts).
- friedman: Friedman blocked ranks across roles with hours as blocks
  (+ Kendall's W), complete-block filtered.
- siegel: Siegel repeated-median hourly-count slope per role.

Run: python tools/session11_rehearsal.py [--op kruskal|jsd|hl|mood|friedman|siegel|all]
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
import ray
import ray.data as rd

CORPUS = "/tmp/vaero_ray_bench/transcripts_16m"


def _len_role_ds():
    ds = rd.read_parquet(CORPUS, columns=["text", "role"])

    def project(tbl: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "n_chars": pc.cast(pc.utf8_length(tbl.column("text")), pa.int64()),
                "source": tbl.column("role"),
            }
        )

    return ds.map_batches(project, batch_format="pyarrow", zero_copy_batch=True)


def rehearse_kruskal():
    from vaero_ray.stages.numstats import kruskal_rank_ingredients

    t0 = time.time()
    out = kruskal_rank_ingredients(_len_role_ds(), "n_chars", "source")
    wall = time.time() - t0
    d = out.to_pydict()
    return {
        "op": "kruskal",
        "rows_in": int(d["n"][0]),
        "groups": d["source"],
        "h_tie": d["h_tie"][0],
        "wall_s": round(wall, 1),
    }


def rehearse_jsd():
    from vaero_ray.stages.numstats import jsd_two_sample

    t0 = time.time()
    out = jsd_two_sample(_len_role_ds(), "n_chars", "source", "user", "assistant")
    wall = time.time() - t0
    d = out.to_pydict()
    return {
        "op": "jsd",
        "n1": d["n1"][0],
        "n2": d["n2"][0],
        "support": d["support"][0],
        "jsd": d["jsd"][0],
        "wall_s": round(wall, 1),
    }


def rehearse_hl():
    from vaero_ray.stages.numstats import hodges_lehmann_shift

    t0 = time.time()
    out = hodges_lehmann_shift(
        _len_role_ds(), "n_chars", "source", "user", "assistant"
    )
    wall = time.time() - t0
    d = out.to_pydict()
    return {
        "op": "hodges_lehmann",
        "n1": d["n1"][0],
        "n2": d["n2"][0],
        "n_pairs": d["n_pairs"][0],
        "n_diffs": d["n_diffs"][0],
        "hl_e6": d["hl_e6"][0],
        "wall_s": round(wall, 1),
    }


def rehearse_mood():
    from vaero_ray.stages.numstats import mood_median_test

    t0 = time.time()
    out = mood_median_test(_len_role_ds(), "n_chars", "source")
    wall = time.time() - t0
    d = out.to_pydict()
    return {
        "op": "mood",
        "rows_in": int(d["n"][0]),
        "med": d["med"][0],
        "chi2": d["chi2"][0],
        "wall_s": round(wall, 1),
    }


def _hourly_role_counts():
    from vaero_ray.stages.keyed import bucketed_keyed_sum

    ds = rd.read_parquet(CORPUS, columns=["ts", "role"])

    def hour_partial(df: pd.DataFrame) -> pd.DataFrame:
        hr = (
            df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
            // 3_600_000_000
        )
        out = pd.DataFrame({"role": df["role"], "hr": hr})
        out["n"] = np.int64(1)
        return out.groupby(["role", "hr"], sort=False, as_index=False).sum()

    return (
        pa.Table.from_pylist(
            bucketed_keyed_sum(
                ds.map_batches(hour_partial, batch_format="pandas"),
                ["role", "hr"],
                ["n"],
                num_buckets=8,
            ).take_all()
        )
        .to_pandas()
        .sort_values(["role", "hr"])
    )


def rehearse_friedman():
    t0 = time.time()
    df = _hourly_role_counts()
    k = int(df["role"].nunique())
    cnt = df.groupby("hr")["role"].size()
    complete = cnt[cnt == k].index
    sub = df[df["hr"].isin(complete)].copy()
    sub["two_rank"] = (
        (2 * sub.groupby("hr")["n"].rank(method="average")).round().astype(np.int64)
    )
    g = sub.groupby("role", sort=True)["two_rank"].sum()
    b = int(len(complete))
    tc = sub.groupby(["hr", "n"]).size().to_numpy(np.int64)
    tie_sum = int(np.sum(tc * tc * tc - tc))
    s = float(np.sum(g.to_numpy(np.float64) ** 2 / 4.0))
    chi2 = 12.0 / (b * k * (k + 1.0)) * s - 3.0 * b * (k + 1.0)
    chi2_tie = chi2 / (1.0 - tie_sum / (b * k * (float(k) * k - 1.0)))
    wall = time.time() - t0
    return {
        "op": "friedman",
        "blocks": b,
        "k": k,
        "chi2_tie": round(chi2_tie, 3),
        "kendall_w": round(chi2_tie / (b * (k - 1.0)), 6),
        "wall_s": round(wall, 1),
    }


def rehearse_siegel():
    from vaero_ray.stages.numstats import siegel_slope_e6

    t0 = time.time()
    df = _hourly_role_counts()
    slopes = {
        role: siegel_slope_e6(g["hr"].to_numpy(np.int64), g["n"].to_numpy(np.int64))
        for role, g in df.groupby("role", sort=True)
        if len(g) >= 2
    }
    wall = time.time() - t0
    return {
        "op": "siegel",
        "series_rows": len(df),
        "slopes_e6": slopes,
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
        "kruskal": rehearse_kruskal,
        "jsd": rehearse_jsd,
        "hl": rehearse_hl,
        "mood": rehearse_mood,
        "friedman": rehearse_friedman,
        "siegel": rehearse_siegel,
    }
    for name, fn in ops.items():
        if args.op in (name, "all"):
            print(json.dumps(fn()))
    ray.shutdown()
