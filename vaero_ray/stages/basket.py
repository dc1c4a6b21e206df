"""Market-basket pair co-occurrence: support counts for every unordered
item pair that appears together in a group (order, session, document).

Scale shape (100 TB): the quadratic blow-up lives INSIDE a basket, never
across the corpus —

1. one bucketed keyed shuffle co-locates each group's rows
   (``keyed.bucketed_map_groups``: hash(group) % num_buckets, one
   all-to-all, one vectorized UDF call per bucket, metadata-derived
   bucket count);
2. per bucket, pair emission is pure numpy index arithmetic over the
   group-sorted distinct items (repeat/cumsum offsets — no per-group
   Python loop, no itertools.combinations), immediately collapsed to
   per-bucket partial ``(item_a, item_b, partial support)`` rows, so at
   most distinct-pairs-per-bucket rows enter the second exchange;
3. partials merge in one further hash-bucket exchange
   (``bucketed_keyed_sum``) and the ``min_support`` filter prunes the
   long tail before anything is returned.

Fat-basket guard (same policy as the dedup pair emitters,
``dedup.py::_cap_bucket``): a degenerate group with millions of items
would emit a quadratic pair set; baskets above ``max_basket`` are
DETERMINISTICALLY truncated to their ``max_basket`` smallest items and
every cap is logged with the group key count — no silent caps.

Reference scope note: the reference engine (vaerohq/vaero) has no
relational/analytic tier at all — this operator is part of the mandated
training-data/analytics extension, not reference parity.
"""

from __future__ import annotations

import logging

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from vaero_ray.stages.keyed import bucketed_keyed_sum, bucketed_map_groups

_LOG = logging.getLogger("vaero_ray.stages.basket")

# items per basket above which the quadratic emission is truncated;
# real baskets (order lines, session items) are tiny — anything near
# this bound is degenerate data, not signal
DEFAULT_MAX_BASKET = 4096


def pair_cooccurrence(
    ds: rd.Dataset,
    group_col: str,
    item_col: str,
    min_support: int = 1,
    num_buckets: "int | None" = None,
    max_basket: int = DEFAULT_MAX_BASKET,
) -> rd.Dataset:
    """Support count per unordered distinct-item pair co-occurring in a
    group. Output columns: ``item_a``, ``item_b`` (item_a < item_b, the
    item dtype) and ``support`` (int64). Duplicate (group, item) rows
    count once (DISTINCT semantics, matching the SQL self-join oracle)."""

    def emit_partials(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "item_a": pd.Series([], dtype=df[item_col].dtype),
                "item_b": pd.Series([], dtype=df[item_col].dtype),
                "support": pd.Series([], dtype="int64"),
            }
        )
        if not len(df):
            return empty
        df = df[[group_col, item_col]].drop_duplicates()
        df = df.sort_values([group_col, item_col], kind="mergesort")
        g = df[group_col].to_numpy()
        items = df[item_col].to_numpy()
        n = len(df)
        # group end offset per position (groups are contiguous post-sort)
        bounds = np.flatnonzero(g[1:] != g[:-1]) + 1
        starts = np.concatenate(([0], bounds))
        ends = np.concatenate((bounds, [n]))
        sizes = ends - starts
        if max_basket and (sizes > max_basket).any():
            fat = int((sizes > max_basket).sum())
            _LOG.warning(
                "pair_cooccurrence: truncating %d fat basket(s) > max_basket=%d "
                "(keeping each basket's %d smallest items)",
                fat, max_basket, max_basket,
            )
            rank = np.arange(n) - np.repeat(starts, sizes)
            keep = rank < max_basket
            g, items = g[keep], items[keep]
            n = len(g)
            if not n:
                return empty
            bounds = np.flatnonzero(g[1:] != g[:-1]) + 1
            starts = np.concatenate(([0], bounds))
            ends = np.concatenate((bounds, [n]))
            sizes = ends - starts
        # pair index arithmetic: position i pairs with every later
        # position of its group; items are group-sorted ascending so
        # item_a < item_b holds by construction
        end_at = np.repeat(ends, sizes)
        reps = end_at - np.arange(n) - 1
        total = int(reps.sum())
        if not total:
            return empty
        left = np.repeat(np.arange(n), reps)
        cum = np.concatenate(([0], np.cumsum(reps)))
        right = np.arange(total) - cum[left] + left + 1
        part = pd.DataFrame({"item_a": items[left], "item_b": items[right]})
        out = part.groupby(["item_a", "item_b"], sort=False).size().reset_index(name="support")
        out["support"] = out["support"].astype("int64")
        return out

    partials = bucketed_map_groups(ds, group_col, emit_partials, num_buckets=num_buckets)
    merged = bucketed_keyed_sum(partials, ["item_a", "item_b"], ["support"])
    if min_support <= 1:
        return merged

    def prune(tbl: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return tbl.filter(pc.greater_equal(tbl.column("support"), min_support))

    return merged.map_batches(prune, batch_format="pyarrow", zero_copy_batch=True)
