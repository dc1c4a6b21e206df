"""Grouped top-k: the bounded-exchange replacement for a global
``sort`` + window-function rank at corpus scale.

Two-phase shape (same contract as the engine's sketch/aggregate tiers):

1. per-BLOCK partial top-k (stateless ``map_batches``, vectorized pandas
   sort + ``groupby(...).head(k)``) — at most ``k`` rows per (group,
   block) survive, so the shuffle moves ``<= k * groups * blocks`` rows
   no matter how large the input;
2. ONE bucketed shuffle on ``hash(group)`` (``keyed.bucketed_map_groups``)
   and the identical kernel per bucket for the exact global top-k.

Ties break deterministically on ``tie_col`` ascending (required for
shard-invariant output — see corpus.cap_per_key's documented
uniqueness caveat; here the tie column makes re-runs stable without a
uniqueness assumption on ``order_col``).

No reference counterpart (the reference has no ranking operators);
equivalent SQL: ``ROW_NUMBER() OVER (PARTITION BY group ORDER BY
order_col DESC, tie_col) <= k``.
"""

from __future__ import annotations

import pandas as pd
import ray.data as rd

from vaero_ray.stages.keyed import bucketed_map_groups


def top_k_per_group(
    ds: rd.Dataset,
    group_col: str,
    order_col: str,
    k: int,
    tie_col: str,
    descending: bool = True,
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Exact top-``k`` rows per ``group_col`` by ``order_col``
    (``descending`` by default), ties broken by ``tie_col`` ascending.
    Keeps all input columns."""

    def head_k(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            [order_col, tie_col], ascending=[not descending, True], kind="mergesort"
        )
        return df.groupby(group_col, sort=False, dropna=False).head(k)

    # per-block partial prune: the same kernel bounds the exchange to
    # k rows per group per block before the bucketed merge
    partials = ds.map_batches(head_k, batch_format="pandas")
    return bucketed_map_groups(partials, group_col, head_k, num_buckets=num_buckets)
