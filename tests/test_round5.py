"""Round-5 regression tests: ADVICE fixes (blocklist case folding,
butterfly census fat-basket consistency) and new round-5 guards."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd


def test_compressed_finalize_max_distinct_guard(ray_session):
    """A high-cardinality column breaks the distinct-value-compression
    contract: the driver-side finalize must raise loudly instead of
    silently materializing millions of rows; under the cap the result
    is unchanged."""
    from vaero_ray.stages.numstats import rank_sum_test, shape_per_group

    df = pd.DataFrame({"v": np.arange(1000, dtype=np.int64),
                       "g": ["a", "b"] * 500})
    ds = rd.from_pandas(df)
    with pytest.raises(ValueError, match="max_distinct"):
        rank_sum_test(ds, "v", "g", "a", "b", max_distinct=100)
    with pytest.raises(ValueError, match="max_distinct"):
        shape_per_group(ds, "v", "g", max_distinct=100)
    t = rank_sum_test(ds, "v", "g", "a", "b").to_pandas()
    # exact check: ranks of evens (a) among 0..999
    assert int(t["n1"][0]) == 500 and int(t["n2"][0]) == 500
    two_r1 = int(2 * sum(range(1, 1001, 2)))  # a holds values 0,2,..,998 -> ranks 1,3,..,999
    assert int(t["two_r1"][0]) == two_r1


def test_blocklist_uppercase_terms_match(ray_session):
    """Case-insensitive contract holds for terms containing uppercase:
    the text is lowercased per batch, so terms must be folded too."""
    from vaero_ray.stages.textstats import blocklist_scan

    docs = pd.DataFrame({
        "doc_id": [1, 2],
        "text": ["Spark and SPARK", "no match"],
    })
    ds = rd.from_pandas(docs)
    out = (
        blocklist_scan(ds, ["Spark", "MATCH"], min_hits=2)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert list(out["total_hits"]) == [2, 1]
    assert list(out["n_terms"]) == [1, 1]
    assert list(out["flagged"]) == [1, 0]


def test_butterflies_fat_basket_internally_consistent(ray_session):
    """With a basket over max_basket, BOTH passes (butterflies via pair
    emission, wedges/caterpillars via item partials) must use the same
    truncated edge set — the census must equal the brute-force census of
    the graph truncated to each basket's max_basket smallest items."""
    from vaero_ray.stages.basket import bipartite_butterflies

    rng = np.random.default_rng(5)
    rows = []
    for g in range(12):
        k = 20 if g < 2 else int(rng.integers(2, 6))  # two fat baskets
        items = rng.choice(30, size=k, replace=False)
        rows.extend({"g": g, "i": int(i)} for i in items)
    df = pd.DataFrame(rows)
    cap = 5
    ds = rd.from_pandas(df).repartition(3)
    t = bipartite_butterflies(ds, "g", "i", max_basket=cap).to_pandas()

    # brute force over the truncated edge set
    trunc = (
        df.drop_duplicates().sort_values(["g", "i"], kind="mergesort")
        .groupby("g", sort=False).head(cap)
    )
    groups, items = {}, {}
    for g, i in trunc.to_numpy():
        groups.setdefault(g, set()).add(i)
        items.setdefault(i, set()).add(g)
    n_edges = sum(len(v) for v in groups.values())
    wg = sum(len(v) * (len(v) - 1) // 2 for v in groups.values())
    wi = sum(len(v) * (len(v) - 1) // 2 for v in items.values())
    from itertools import combinations
    co = {}
    for g, its in groups.items():
        for a, b in combinations(sorted(its), 2):
            co[(a, b)] = co.get((a, b), 0) + 1
    bf = sum(c * (c - 1) // 2 for c in co.values())
    cat = sum(
        (len(groups[g]) - 1) * (len(items[i]) - 1) for g, its in groups.items() for i in its
    )
    assert int(t["n_edges"][0]) == n_edges
    assert int(t["wedges_group"][0]) == wg
    assert int(t["wedges_item"][0]) == wi
    assert int(t["n_butterflies"][0]) == bf
    assert int(t["n_caterpillars"][0]) == cat
    if cat:
        assert abs(float(t["bcc"][0]) - 4.0 * bf / cat) < 1e-6
