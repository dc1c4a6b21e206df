"""Pivot (wide conditional aggregate): one output column per category,
counting each key's rows per category — the reshape step every
label-distribution / per-source-mix report needs.

Two-phase, bounded exchange (same contract as the sketch tier): a
per-block partial pivots via one factorize + one ``np.bincount`` over
composite (key, category) codes — at most ``keys x categories`` rows
leave any block — then Ray's native ``groupby(key).sum`` merges
partials (map-side combine, no empty-bucket partitions).

``categories`` is EXPLICIT by design: deriving it would need a full
pass before the schema is known, and at corpus scale the label set is a
known contract, not data. Rows outside ``categories`` are ignored
(documented; mirror in any oracle with a WHERE or FILTER).

No reference counterpart (the reference has no aggregates); equivalent
SQL: ``count(*) FILTER (WHERE cat = '...')`` per category.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd


def pivot_counts(
    ds: rd.Dataset,
    key: str,
    cat_col: str,
    categories: "list[str]",
    prefix: str = "n_",
) -> rd.Dataset:
    """Per ``key``: count of rows per category, one ``prefix+category``
    int64 column each. Keys with no in-category rows emit no row."""
    cats = list(categories)
    out_cols = [prefix + c for c in cats]

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        kcodes, kuniq = pd.factorize(df[key], use_na_sentinel=False)
        ccodes = pd.Categorical(df[cat_col], categories=cats).codes.astype(np.int64)
        mask = ccodes >= 0
        flat = kcodes[mask].astype(np.int64) * len(cats) + ccodes[mask]
        counts = np.bincount(flat, minlength=len(kuniq) * len(cats)).reshape(
            len(kuniq), len(cats)
        )
        keep = counts.sum(axis=1) > 0
        out = pd.DataFrame({key: np.asarray(kuniq)[keep]})
        for j, c in enumerate(out_cols):
            out[c] = counts[keep, j]
        return out

    partials = ds.map_batches(partial, batch_format="pandas")
    merged = partials.groupby(key).sum(out_cols)
    # Ray names sum outputs "sum(col)"; restore the declared schema
    # (map_batches rename — Dataset.rename_columns rejects the pandas
    # blocks the aggregate emits)
    names = {f"sum({c})": c for c in out_cols}

    def fix_names(tbl):
        import pyarrow as pa  # noqa: F401

        return tbl.rename_columns([names.get(c, c) for c in tbl.column_names])

    return merged.map_batches(fix_names, batch_format="pyarrow")
