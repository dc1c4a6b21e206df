"""Corpus-curation selection ops (C4/Gopher-style pipeline stages).

``cap_per_key``: keep at most ``cap`` rows per key (e.g. max N documents
per source domain — the standard anti-template / anti-spam cap in web
corpus construction). Deterministic: survivors are the ``cap`` smallest
``order_col`` values per key, so re-runs and re-shards agree.

Scale shape: a per-block PARTIAL prune first (the global smallest-cap set
of a key is a subset of the union of per-block smallest-cap sets), so at
most ``cap`` rows per (block, key) enter the single bucketed shuffle —
the exchange is bounded by blocks x keys_per_block x cap regardless of
how hot a key is.

No reference counterpart (the reference has no keyed selection); extends
the training-data tier mandated by the task.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray.data as rd

from vaero_ray.stages.keyed import DEFAULT_BUCKETS, bucketed_map_groups


def cap_per_key(
    ds: rd.Dataset,
    key: str,
    cap: int,
    order_col: str,
    num_buckets: int = DEFAULT_BUCKETS,
) -> rd.Dataset:
    """Keep the ``cap`` lowest-``order_col`` rows of each ``key`` group.

    Partitioning assumption: the PRUNED rows of one bucket (<= cap per
    key) fit in one task's heap — num_buckets >= keys / (task_mem /
    (cap * row_bytes)).
    """

    def prune(df: pd.DataFrame) -> pd.DataFrame:
        # vectorized per-block combiner: smallest cap per key
        return (
            df.sort_values(order_col, kind="stable")
            .groupby(key, sort=False)
            .head(cap)
        )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.sort_values(order_col, kind="stable")
            .groupby(key, sort=False)
            .head(cap)
            .reset_index(drop=True)
        )

    partial = ds.map_batches(prune, batch_format="pandas")
    return bucketed_map_groups(partial, key, final, num_buckets=num_buckets)
