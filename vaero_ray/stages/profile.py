"""One-pass multi-column table profiling — DESCRIBE at corpus scale.

``profile_table`` answers the first question anyone asks of a new
100-TB table — row count, per-column null counts, min/max, exact
distinct cardinalities — with exchanges that never carry a data row:

- counts/min/max: each block reduces to ONE wide partial row (n, and
  per column nulls/min/max in NATIVE types — stringifying before the
  merge would order "10" < "9"); a single global Sum/Min/Max aggregate
  over those per-block rows finishes. One scan, metadata-row exchange.
- distinct: per block, each profiled column collapses to its DISTINCT
  dual-lane 64-bit hash pairs (the table_diff trick — wrong-equal odds
  ~n^2/2^128, the standard exchange for distinct-count at scale since
  raw strings can't ride a 100-TB shuffle); one (col, h1)-bucketed
  exchange dedups pairs globally and per-bucket counts sum per column.
  Nulls are excluded (SQL ``COUNT(DISTINCT col)`` semantics).

Output is a driver-assembled long table, one row per profiled column:
``(col, n_rows, n_nulls, n_distinct, min_val, max_val)`` with min/max
rendered as strings AFTER the native-type merge (int -> str matches
DuckDB ``CAST(x AS VARCHAR)``; profiling timestamp/float columns works
but their string rendering is not oracle-aligned — documented).

No reference counterpart (the reference has no profiling); the
data-QA entry point of the training-data tier.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

_KEY2 = "9ec24bf02cd53b21"  # second hash lane key (same constant as diff.py)


def _col_hash_pairs(arr) -> "tuple[np.ndarray, np.ndarray]":
    """Distinct dual-lane hash pairs of a column chunk, nulls excluded."""
    s = arr.to_pandas()
    s = s[~s.isna()]
    npv = s.to_numpy()
    if npv.dtype == object or npv.dtype.kind in "USO":
        npv = npv.astype(object)
    h1 = pd.util.hash_array(npv, categorize=False).astype(np.uint64)
    h2 = pd.util.hash_array(npv, hash_key=_KEY2, categorize=False).astype(np.uint64)
    # pre-dedup inside the block before anything is emitted — on the FULL
    # (h1, h2) pair (a mixed single-lane dedup key could collide and
    # silently undercount)
    order = np.lexsort((h2, h1))
    h1, h2 = h1[order], h2[order]
    keep = np.ones(len(h1), dtype=bool)
    keep[1:] = (h1[1:] != h1[:-1]) | (h2[1:] != h2[:-1])
    return h1[keep], h2[keep]


def profile_table(
    ds: rd.Dataset,
    cols: "list[str]",
    num_buckets: int | None = None,
) -> pa.Table:
    from ray.data.aggregate import Max, Min, Sum

    from vaero_ray.stages.keyed import bucketed_map_groups

    if not cols:
        raise ValueError("profile_table: no columns to profile")

    # --- pass 1: one wide partial row per block, native-typed min/max ---
    def partial(tbl: pa.Table) -> pa.Table:
        out = {"n": pa.array([tbl.num_rows], pa.int64())}
        for c in cols:
            arr = tbl.column(c)
            out[f"nulls_{c}"] = pa.array([arr.null_count], pa.int64())
            typ = tbl.schema.field(c).type
            if tbl.num_rows - arr.null_count:
                mm = pc.min_max(arr)
                out[f"min_{c}"] = pa.array([mm["min"].as_py()], typ)
                out[f"max_{c}"] = pa.array([mm["max"].as_py()], typ)
            else:
                out[f"min_{c}"] = pa.array([None], typ)
                out[f"max_{c}"] = pa.array([None], typ)
        return pa.table(out)

    aggs = [Sum("n", alias_name="n")]
    for c in cols:
        aggs += [
            Sum(f"nulls_{c}", alias_name=f"nulls_{c}"),
            Min(f"min_{c}", alias_name=f"min_{c}"),
            Max(f"max_{c}", alias_name=f"max_{c}"),
        ]
    stats = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).aggregate(*aggs)

    # --- pass 2: exact distinct per column via deduped hash pairs ---
    def dpartial(tbl: pa.Table) -> pa.Table:
        ci, h1s, h2s = [], [], []
        for i, c in enumerate(cols):
            h1, h2 = _col_hash_pairs(tbl.column(c))
            ci.append(np.full(len(h1), i, dtype=np.int64))
            h1s.append(h1)
            h2s.append(h2)
        return pa.table(
            {
                "ci": pa.array(np.concatenate(ci), pa.int64()),
                "h1": pa.array(np.concatenate(h1s), pa.uint64()),
                "h2": pa.array(np.concatenate(h2s), pa.uint64()),
            }
        )

    def count_bucket(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates(["ci", "h1", "h2"])
        g = d.groupby("ci", sort=False, as_index=False).size()
        return pd.DataFrame({"ci": g["ci"].astype(np.int64), "d": g["size"].astype(np.int64)})

    pairs = ds.map_batches(dpartial, batch_format="pyarrow", zero_copy_batch=True)
    dcounts = bucketed_map_groups(pairs, "h1", count_bucket, num_buckets=num_buckets)
    dist = np.zeros(len(cols), dtype=np.int64)
    for r in dcounts.groupby("ci").sum("d").take_all():  # len(cols) rows
        dist[int(r["ci"])] = int(r["sum(d)"])

    def render(v) -> "str | None":
        return None if v is None else str(v)

    return pa.table(
        {
            "col": pa.array(cols, pa.string()),
            "n_rows": pa.array([stats["n"]] * len(cols), pa.int64()),
            "n_nulls": pa.array([stats[f"nulls_{c}"] for c in cols], pa.int64()),
            "n_distinct": pa.array(dist, pa.int64()),
            "min_val": pa.array([render(stats[f"min_{c}"]) for c in cols], pa.string()),
            "max_val": pa.array([render(stats[f"max_{c}"]) for c in cols], pa.string()),
        }
    )
