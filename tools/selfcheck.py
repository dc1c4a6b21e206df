"""Driver-style correctness self-check: run every queries() entry and its
oracle_sql() side-by-side over a testdata sf dir, compare row count, schema
and order-insensitive values. Usage:

    python tools/selfcheck.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data as rd

    if isinstance(res, rd.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare(name: str, got: pd.DataFrame, want: pd.DataFrame) -> list[str]:
    problems = []
    if len(got) != len(want):
        problems.append(f"rows {len(got)} != {len(want)}")
    gs = {c: str(t) for c, t in got.dtypes.items()}
    ws = {c: str(t) for c, t in want.dtypes.items()}
    if set(gs) != set(ws):
        problems.append(f"columns {sorted(gs)} != {sorted(ws)}")
        return problems
    for c in gs:
        if gs[c] != ws[c]:
            problems.append(f"dtype[{c}] {gs[c]} != {ws[c]}")
    if problems:
        return problems
    g, w = canon(got), canon(want)
    for c in g.columns:
        a, b = g[c], w[c]
        if a.dtype.kind == "f":
            import numpy as np

            if not np.allclose(a.fillna(0), b.fillna(0), rtol=0, atol=1e-9, equal_nan=True):
                problems.append(f"values[{c}] differ (max abs diff "
                                f"{(a - b).abs().max()})")
        else:
            eq = (a == b) | (a.isna() & b.isna())
            if not eq.all():
                i = int((~eq).idxmax())
                problems.append(f"values[{c}] differ at canon row {i}: {a[i]!r} != {b[i]!r}")
    return problems


def main(sf_dir: str, only: list[str] | None = None) -> int:
    import ray

    ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    failed = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        try:
            got = to_pandas(fn(sf_dir))
        except Exception as e:
            print(f"FAIL {name}: query raised {type(e).__name__}: {e}")
            failed += 1
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(got)} rows)")
            continue
        want = con.execute(oracles[name]).fetchdf()
        problems = compare(name, got, want)
        if problems:
            failed += 1
            print(f"FAIL {name}: " + "; ".join(problems))
        else:
            print(f"ok   {name}: {len(got)} rows match oracle")
    ray.shutdown()
    return failed


if __name__ == "__main__":
    # usage: selfcheck.py [sf_dir] [query_name ...]
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2:] or None
    sys.exit(1 if main(sf, only) else 0)
