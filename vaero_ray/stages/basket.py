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


def adamic_adar_pairs(
    ds: rd.Dataset,
    group_col: str,
    item_col: str,
    top_k: int = 20,
    num_buckets: "int | None" = None,
    max_basket: int = DEFAULT_MAX_BASKET,
) -> rd.Dataset:
    """Adamic-Adar link prediction over the bipartite item<->group graph:
    for each co-occurring unordered item pair, ``AA = sum over common
    groups g of 1/ln(|g|)`` — common neighbors discounted by how
    promiscuous they are (a 2-item order is strong evidence the pair
    belongs together; a 100-item order is weak). Same in-basket pair
    emission as :func:`pair_cooccurrence` (numpy offset arithmetic, fat
    baskets truncated and logged), but each pair carries the group's
    weight ``round(1e12 / ln(size))`` as integer MICRO-units
    (half-away-from-zero, mirroring SQL ROUND), so partial sums stay
    exact int64 and order/shard-invariant; ``aa`` is the raw float64
    division aa_micro/1e12 (bit-identical cross-engine). Singleton
    groups emit nothing (no pair) — ln(1)=0 never divides. Returns the
    deterministic top-k by (aa_micro DESC, item_a, item_b)."""

    def emit_partials(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "item_a": pd.Series([], dtype=df[item_col].dtype),
                "item_b": pd.Series([], dtype=df[item_col].dtype),
                "aa_micro": pd.Series([], dtype="int64"),
                "common_groups": pd.Series([], dtype="int64"),
            }
        )
        if not len(df):
            return empty
        df = df[[group_col, item_col]].drop_duplicates()
        df = df.sort_values([group_col, item_col], kind="mergesort")
        g = df[group_col].to_numpy()
        items = df[item_col].to_numpy()
        n = len(df)
        bounds = np.flatnonzero(g[1:] != g[:-1]) + 1
        starts = np.concatenate(([0], bounds))
        ends = np.concatenate((bounds, [n]))
        sizes = ends - starts
        if max_basket and (sizes > max_basket).any():
            fat = int((sizes > max_basket).sum())
            _LOG.warning(
                "adamic_adar_pairs: truncating %d fat basket(s) > max_basket=%d",
                fat, max_basket,
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
        # integer micro-unit weight per group; ln(size) valid for size>=2
        # (size-1 groups emit no pairs anyway, their weight is never used)
        safe = np.maximum(sizes, 2).astype(np.float64)
        wt = np.floor(1e12 / np.log(safe) + 0.5).astype(np.int64)
        end_at = np.repeat(ends, sizes)
        reps = end_at - np.arange(n) - 1
        total = int(reps.sum())
        if not total:
            return empty
        left = np.repeat(np.arange(n), reps)
        cum = np.concatenate(([0], np.cumsum(reps)))
        right = np.arange(total) - cum[left] + left + 1
        grp_of = np.repeat(np.arange(len(sizes)), sizes)
        part = pd.DataFrame(
            {
                "item_a": items[left],
                "item_b": items[right],
                "aa_micro": wt[grp_of[left]],
                "common_groups": np.ones(total, np.int64),
            }
        )
        out = part.groupby(["item_a", "item_b"], sort=False, as_index=False)[
            ["aa_micro", "common_groups"]
        ].sum()
        out["aa_micro"] = out["aa_micro"].astype("int64")
        out["common_groups"] = out["common_groups"].astype("int64")
        return out

    partials = bucketed_map_groups(ds, group_col, emit_partials, num_buckets=num_buckets)
    merged = bucketed_keyed_sum(
        partials, ["item_a", "item_b"], ["aa_micro", "common_groups"]
    )

    def finalize(tbl: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        aa = pc.divide(
            pc.cast(tbl.column("aa_micro"), pa.float64()), pa.scalar(1e12)
        )
        return tbl.append_column("aa", aa)

    scored = merged.map_batches(finalize, batch_format="pyarrow", zero_copy_batch=True)
    return scored.sort(
        ["aa_micro", "item_a", "item_b"], descending=[True, False, False]
    ).limit(top_k)


def pair_lift(
    ds: rd.Dataset,
    group_col: str,
    item_col: str,
    min_support: int = 5,
    top_k: int = 20,
    num_buckets: "int | None" = None,
    max_basket: int = DEFAULT_MAX_BASKET,
) -> rd.Dataset:
    """Association-rule lift per co-occurring item pair:
    ``lift = P(a,b) / (P(a)P(b)) = support * N / (cnt_a * cnt_b)`` with
    N = distinct groups, cnt_x = distinct groups containing x — >1 means
    the pair co-occurs more than independence predicts. All-integer
    numerator/denominator (exact, shard-invariant); ``lift`` is the raw
    float64 division. Composition: in-basket pair supports
    (:func:`pair_cooccurrence`), per-item group counts off the same
    distinct (group, item) projection, two adaptive joins to attach
    cnt_a / cnt_b (broadcast at dimension scale, partitioned above),
    min_support pruning BEFORE the joins. Top-k by (lift DESC, item_a,
    item_b) via the exact integer cross ordering."""
    from vaero_ray.stages.joins import auto_join

    pairs = pair_cooccurrence(
        ds, group_col, item_col, min_support=min_support,
        num_buckets=num_buckets, max_basket=max_basket,
    ).materialize()
    if not pairs.count():
        # an empty pruned pair set would propagate a schemaless dataset
        # through the joins (auto_join needs .schema().names) — return
        # the typed empty result instead
        it = pa.int64()
        try:
            sch = ds.schema()
            it = sch.types[sch.names.index(item_col)]
        except Exception:
            pass
        empty = pa.table(
            {
                "item_a": pa.array([], it), "item_b": pa.array([], it),
                "support": pa.array([], pa.int64()),
                "cnt_a": pa.array([], pa.int64()), "cnt_b": pa.array([], pa.int64()),
                "lift_num": pa.array([], pa.int64()),
                "lift_den": pa.array([], pa.int64()),
                "lift": pa.array([], pa.float64()),
            }
        )
        return rd.from_arrow(empty)

    def distinct_gi(df: pd.DataFrame) -> pd.DataFrame:
        return df[[group_col, item_col]].drop_duplicates()

    gi = bucketed_map_groups(ds, group_col, distinct_gi, num_buckets=num_buckets)
    n_groups_tbl = bucketed_map_groups(
        gi,
        group_col,
        lambda df: pd.DataFrame({"ng": [df[group_col].nunique()]}),
        num_buckets=num_buckets,
    )
    n_groups = int(n_groups_tbl.sum("ng"))

    def cnt_partial(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(item_col, sort=False).size().rename("cnt").reset_index()
        out["cnt"] = out["cnt"].astype("int64")
        return out

    cnts = bucketed_map_groups(gi, item_col, cnt_partial, num_buckets=8)

    def as_a(tbl: pa.Table) -> pa.Table:
        return tbl.rename_columns(["item_a", "cnt_a"])

    def as_b(tbl: pa.Table) -> pa.Table:
        return tbl.rename_columns(["item_b", "cnt_b"])

    j = auto_join(pairs, cnts.map_batches(as_a, batch_format="pyarrow"), keys="item_a")
    j = auto_join(j, cnts.map_batches(as_b, batch_format="pyarrow"), keys="item_b")

    def finalize(tbl: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        num = pc.multiply(tbl.column("support"), pa.scalar(n_groups, pa.int64()))
        den = pc.multiply(tbl.column("cnt_a"), tbl.column("cnt_b"))
        lift = pc.divide(pc.cast(num, pa.float64()), pc.cast(den, pa.float64()))
        return (
            tbl.append_column("lift_num", num)
            .append_column("lift_den", den)
            .append_column("lift", lift)
        )

    scored = j.map_batches(finalize, batch_format="pyarrow", zero_copy_batch=True)
    return scored.sort(
        ["lift", "item_a", "item_b"], descending=[True, False, False]
    ).limit(top_k)


def bipartite_butterflies(
    ds: rd.Dataset,
    group_col: str,
    item_col: str,
    num_buckets: "int | None" = None,
    max_basket: int = DEFAULT_MAX_BASKET,
) -> "pa.Table":
    """Butterfly (bipartite 4-cycle) census of a group-item graph — the
    bipartite analogue of triangle counting (motif density of the
    co-purchase structure): butterflies B, caterpillars (3-paths) C,
    both wedge counts, and the bipartite clustering coefficient
    4B / C.

    Identities that keep everything ONE-exchange sized: with per-group
    degrees d_g and per-item degrees c_i over DISTINCT edges,
    caterpillars = sum over edges of (d_g-1)(c_i-1) = sum_i (c_i-1)*s_i
    where s_i = sum of (d_g - 1) over the item's incident groups — so
    ONE basket pass emits (item, d_g-1, 1) partials, one keyed exchange
    sums (s_i, c_i), and group-side wedges fall out as sum(s_i)/2
    without any group-side aggregate. Butterflies ride the existing
    in-basket quadratic pair emission (`pair_cooccurrence`) as
    sum C(co, 2). All counts exact int64; the coefficient is the one
    mirrored float division.

    ``max_basket`` is the SHARED fat-basket cap: the same deterministic
    truncation (each basket's ``max_basket`` smallest items) is applied
    to BOTH the butterfly pass and the wedge/caterpillar pass, so the
    census stays internally consistent (bcc = 4B/C over one edge set)
    even when a basket exceeds the cap. Pass ``max_basket=0`` for exact
    counts over the untruncated graph (quadratic in the fattest basket)."""
    pairs = pair_cooccurrence(ds, group_col, item_col, min_support=1,
                              num_buckets=num_buckets, max_basket=max_basket)

    def bf_partial(tbl: pa.Table) -> pa.Table:
        if not tbl.num_rows:
            return pa.table({"b": pa.array([], pa.int64())})
        n = tbl.column("support").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"b": pa.array([int((n * (n - 1) // 2).sum())], pa.int64())})

    bsum = pairs.map_batches(bf_partial, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    butterflies = int(bsum["b"].sum())

    def item_partials(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"item": pd.Series([], dtype=df[item_col].dtype),
                                 "s": pd.Series([], dtype="int64"),
                                 "c": pd.Series([], dtype="int64")})
        df = df[[group_col, item_col]].drop_duplicates()
        # identical truncation to pair_cooccurrence's: keep each basket's
        # max_basket smallest items, so wedges/caterpillars are computed
        # over exactly the edge set the butterfly pass saw
        if max_basket:
            df = df.sort_values([group_col, item_col], kind="mergesort")
            rank = df.groupby(group_col, sort=False).cumcount().to_numpy()
            df = df[rank < max_basket]
            if not len(df):
                return pd.DataFrame({"item": pd.Series([], dtype=df[item_col].dtype),
                                     "s": pd.Series([], dtype="int64"),
                                     "c": pd.Series([], dtype="int64")})
        sizes = df.groupby(group_col, sort=False)[item_col].transform("size").to_numpy(np.int64)
        out = pd.DataFrame({"item": df[item_col].to_numpy(), "s": sizes - 1,
                            "c": np.ones(len(df), np.int64)})
        return out.groupby("item", sort=False, as_index=False).sum()

    merged = bucketed_map_groups(
        ds, group_col,
        lambda df: item_partials(df), num_buckets=num_buckets,
    )
    merged = bucketed_keyed_sum(merged, ["item"], ["s", "c"])

    def fold(tbl: pa.Table) -> pa.Table:
        if not tbl.num_rows:
            z = [0, 0, 0, 0]
        else:
            s = tbl.column("s").to_numpy(zero_copy_only=False).astype(np.int64)
            c = tbl.column("c").to_numpy(zero_copy_only=False).astype(np.int64)
            z = [int(c.sum()), int(s.sum()), int((c * (c - 1) // 2).sum()),
                 int(((c - 1) * s).sum())]
        return pa.table({k: pa.array([v], pa.int64())
                         for k, v in zip(["e", "ss", "wi", "cat"], z)})

    agg = merged.map_batches(fold, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    n_edges = int(agg["e"].sum())
    wedges_group = int(agg["ss"].sum()) // 2
    wedges_item = int(agg["wi"].sum())
    caterpillars = int(agg["cat"].sum())
    bcc = round(4.0 * butterflies / caterpillars, 6) if caterpillars else None
    return pa.table(
        {
            "n_edges": pa.array([n_edges], pa.int64()),
            "wedges_group": pa.array([wedges_group], pa.int64()),
            "wedges_item": pa.array([wedges_item], pa.int64()),
            "n_butterflies": pa.array([butterflies], pa.int64()),
            "n_caterpillars": pa.array([caterpillars], pa.int64()),
            "bcc": pa.array([bcc], pa.float64()),
        }
    )
