"""Session-8 batch 1: KMV distinct sketch, Pareto frontier (skyline),
Morton Z-order dilation — brute-force numpy/python oracles on
randomized inputs."""

import numpy as np
import pyarrow as pa
import ray.data as rd


def _rng():
    return np.random.default_rng(7)


def test_kmv_estimate_accuracy(ray_session):
    from vaero_ray.stages.sketch import kmv_estimate, kmv_minima

    rng = _rng()
    true_n = 40_000
    # duplicated draws from a 40k-distinct pool, sharded into many blocks
    vals = rng.choice(np.arange(true_n, dtype=np.int64), size=120_000, replace=True)
    vals = np.concatenate([vals, np.arange(true_n, dtype=np.int64)])  # force all present
    ds = rd.from_arrow(pa.table({"v": pa.array(vals, pa.int64())})).repartition(16)
    k = 256
    minima = kmv_minima(ds, "v", k=k)
    tbl = pa.Table.from_pylist(minima.take_all())
    assert tbl.num_rows == k
    hv = tbl.column("hv").to_numpy()
    assert (np.diff(hv) > 0).all()  # distinct, ascending
    est = kmv_estimate(tbl, k=k)
    assert abs(est - true_n) / true_n < 0.15  # ~1/sqrt(k-1) ≈ 6% std


def test_kmv_exact_below_k(ray_session):
    from vaero_ray.stages.sketch import kmv_estimate, kmv_minima

    ds = rd.from_arrow(pa.table({"v": pa.array(np.arange(37, dtype=np.int64))}))
    tbl = pa.Table.from_pylist(kmv_minima(ds, "v", k=64).take_all())
    assert tbl.num_rows == 37
    assert kmv_estimate(tbl, k=64) == 37.0


def test_kmv_merge_shard_invariant(ray_session):
    """Same input under different sharding -> identical minima."""
    from vaero_ray.stages.sketch import kmv_minima

    rng = _rng()
    vals = rng.integers(0, 1 << 40, size=5000).astype(np.int64)
    t = pa.table({"v": pa.array(vals, pa.int64())})
    a = pa.Table.from_pylist(kmv_minima(rd.from_arrow(t), "v", k=128).take_all())
    b = pa.Table.from_pylist(
        kmv_minima(rd.from_arrow(t).repartition(13), "v", k=128).take_all()
    )
    assert a.column("hv").to_pylist() == b.column("hv").to_pylist()


def _brute_pareto(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    keep = np.ones(len(x), bool)
    for i in range(len(x)):
        dom = (x >= x[i]) & (y >= y[i]) & ((x > x[i]) | (y > y[i]))
        if dom.any():
            keep[i] = False
    return keep


def test_block_pareto_matches_bruteforce():
    from vaero_ray.stages.selection import _block_pareto

    rng = _rng()
    for _ in range(20):
        n = int(rng.integers(1, 200))
        # small domain -> plenty of ties and duplicate points
        x = rng.integers(0, 12, size=n).astype(np.int64)
        y = rng.integers(0, 12, size=n).astype(np.int64)
        tbl = pa.table({"x": pa.array(x), "y": pa.array(y)})
        got = _block_pareto(tbl, "x", "y")
        keep = _brute_pareto(x, y)
        want = sorted(zip(x[keep].tolist(), y[keep].tolist()))
        have = sorted(zip(got.column("x").to_pylist(), got.column("y").to_pylist()))
        assert have == want


def test_pareto_frontier_combiner_property(ray_session):
    """pareto over many blocks == brute-force pareto over the union."""
    from vaero_ray.stages.selection import pareto_frontier

    rng = _rng()
    n = 4000
    x = rng.integers(0, 1000, size=n).astype(np.int64)
    y = (1000 - x + rng.integers(-80, 80, size=n)).astype(np.int64)  # anti-correlated
    ds = rd.from_arrow(pa.table({"x": pa.array(x), "y": pa.array(y)})).repartition(11)
    got = pa.Table.from_pylist(pareto_frontier(ds, "x", "y").take_all())
    keep = _brute_pareto(x, y)
    want = sorted(zip(x[keep].tolist(), y[keep].tolist()))
    have = sorted(zip(got.column("x").to_pylist(), got.column("y").to_pylist()))
    assert have == want


def test_morton16_roundtrip_and_order():
    from vaero_ray.stages.keyed import _spread16, morton16

    rng = _rng()
    a = rng.integers(0, 1 << 16, size=2000).astype(np.uint64)
    b = rng.integers(0, 1 << 16, size=2000).astype(np.uint64)
    z = morton16(a, b).astype(np.uint64)

    def compact(v):  # inverse dilation: gather even bits
        v = v & np.uint64(0x55555555)
        v = (v | (v >> np.uint64(1))) & np.uint64(0x33333333)
        v = (v | (v >> np.uint64(2))) & np.uint64(0x0F0F0F0F)
        v = (v | (v >> np.uint64(4))) & np.uint64(0x00FF00FF)
        v = (v | (v >> np.uint64(8))) & np.uint64(0x0000FFFF)
        return v

    assert (compact(z) == a).all()
    assert (compact(z >> np.uint64(1)) == b).all()
    # dilation is strictly monotone, so equal-b rows sort by a
    sa = np.sort(a)
    assert (np.diff(_spread16(sa)[np.argsort(sa, kind="stable")]) >= 0).all()


def test_regex_pattern_counts_bruteforce(ray_session):
    """Randomized sequences vs pure-Python re.findall per key."""
    import re

    from vaero_ray.stages.cep import regex_pattern_counts

    rng = _rng()
    n = 3000
    keys = rng.integers(0, 60, size=n).astype(np.int64)
    ts = rng.integers(0, 10**9, size=n).astype("datetime64[us]")
    types = rng.choice(np.array(["A", "B", "C", "odd"]), size=n, p=[0.4, 0.3, 0.2, 0.1])
    eid = np.arange(n, dtype=np.int64)
    tbl = pa.table(
        {"k": pa.array(keys), "ts": pa.array(ts), "eid": pa.array(eid),
         "t": pa.array(types)}
    )
    mapping = {"A": "a", "B": "b", "C": "c"}  # 'odd' unmapped -> wall
    pat = r"ab+c"
    got = regex_pattern_counts(
        rd.from_arrow(tbl).repartition(9), "k", ["ts", "eid"], "t", mapping, pat
    )
    have = {
        r["k"]: r["n_matches"] for r in got.take_all()
    }
    import pandas as pd

    df = pd.DataFrame({"k": keys, "ts": ts, "eid": eid, "t": types}).sort_values(
        ["k", "ts", "eid"]
    )
    want = {}
    for k, g in df.groupby("k"):
        s = "".join(mapping.get(t, "-") for t in g["t"])
        want[k] = len(re.findall(pat, s))
    assert have == want


def test_regex_pattern_counts_no_cross_key_match(ray_session):
    """A pattern spanning two keys' sequences must NOT match."""
    from vaero_ray.stages.cep import regex_pattern_counts

    tbl = pa.table(
        {
            "k": pa.array([1, 1, 2, 2], pa.int64()),
            "ts": pa.array(
                np.array([0, 1, 2, 3], dtype="datetime64[us]")
            ),
            "eid": pa.array([0, 1, 2, 3], pa.int64()),
            "t": pa.array(["A", "B", "B", "C"]),
        }
    )
    got = regex_pattern_counts(
        rd.from_arrow(tbl), "k", ["ts", "eid"], "t",
        {"A": "a", "B": "b", "C": "c"}, r"ab+c"
    )
    assert {r["k"]: r["n_matches"] for r in got.take_all()} == {1: 0, 2: 0}


def test_cusum_peak_bruteforce(ray_session):
    """Segmented-cumsum argmax vs a per-key Python fold."""
    from vaero_ray.stages.numstats import cusum_peak_per_group

    rng = _rng()
    rows = []
    for k in range(12):
        n = int(rng.integers(1, 40))
        hrs = np.sort(rng.choice(np.arange(200), size=n, replace=False))
        # plant a level shift in half the keys
        vals = rng.integers(1, 20, size=n)
        if k % 2:
            vals[n // 2:] += 30
        rows.append((k, hrs, vals))
    tbl = pa.table(
        {
            "k": pa.array(np.concatenate([[k] * len(h) for k, h, _ in rows]).astype(np.int64)),
            "hr": pa.array(np.concatenate([h for _, h, _ in rows]).astype(np.int64)),
            "c": pa.array(np.concatenate([v for _, _, v in rows]).astype(np.int64)),
        }
    )
    got = {
        r["k"]: (r["n_points"], r["total"], r["peak_dev"], r["peak_ord"])
        for r in cusum_peak_per_group(
            rd.from_arrow(tbl).repartition(5), "k", "hr", "c"
        ).take_all()
    }
    for k, hrs, vals in rows:
        n, tot = len(vals), int(vals.sum())
        best = (-1, None)
        pref = 0
        for i, (h, v) in enumerate(zip(hrs, vals), start=1):
            pref += int(v)
            dev = abs(n * pref - i * tot)
            if dev > best[0]:
                best = (dev, int(h))
        assert got[k] == (n, tot, best[0], best[1]), k


def test_lag_autocorr_matches_numpy(ray_session):
    from vaero_ray.stages.numstats import lag_autocorr_per_group

    rng = _rng()
    ks, hs, cs = [], [], []
    for k in range(6):
        n = int(rng.integers(3, 60))
        hrs = np.sort(rng.choice(np.arange(300), size=n, replace=False))
        vals = rng.integers(0, 50, size=n)
        ks.append(np.full(n, k)); hs.append(hrs); cs.append(vals)
    tbl = pa.table(
        {"k": pa.array(np.concatenate(ks).astype(np.int64)),
         "hr": pa.array(np.concatenate(hs).astype(np.int64)),
         "c": pa.array(np.concatenate(cs).astype(np.int64))}
    )
    got = {
        r["k"]: r["autocorr"]
        for r in lag_autocorr_per_group(
            rd.from_arrow(tbl).repartition(4), "k", "hr", "c"
        ).take_all()
    }
    for k, v in zip(range(6), cs):
        x, y = v[:-1].astype(float), v[1:].astype(float)
        want = np.corrcoef(x, y)[0, 1]
        assert abs(got[k] - want) < 1e-5, k


def test_last_touch_counts_bruteforce(ray_session):
    from vaero_ray.stages.cep import last_touch_counts

    rng = _rng()
    n = 2500
    users = rng.integers(0, 40, size=n).astype(np.int64)
    ts = rng.integers(0, 10**8, size=n).astype("datetime64[us]")
    eid = np.arange(n, dtype=np.int64)
    types = rng.choice(np.array(["view", "click", "purchase"]), size=n, p=[0.5, 0.3, 0.2])
    tbl = pa.table(
        {"user_id": pa.array(users), "ts": pa.array(ts), "event_id": pa.array(eid),
         "event_type": pa.array(types)}
    )
    got = {
        r["attr_type"]: r["n"]
        for r in last_touch_counts(
            rd.from_arrow(tbl).repartition(7), "user_id", ["ts", "event_id"],
            "event_type", "purchase"
        ).take_all()
    }
    import pandas as pd
    from collections import Counter

    want = Counter()
    df = pd.DataFrame({"u": users, "ts": ts, "eid": eid, "t": types}).sort_values(
        ["u", "ts", "eid"]
    )
    for _, g in df.groupby("u"):
        last = None
        for t in g["t"]:
            if t == "purchase":
                want[last or "none"] += 1
            else:
                last = t
    assert got == dict(want)


def test_kmv_by_key_shard_invariant_and_exact(ray_session):
    from vaero_ray.stages.sketch import hll_hash, kmv_minima_by_key

    rng = _rng()
    n = 8000
    ks = rng.choice(np.array(["a", "b", "c"]), size=n)
    vs = rng.integers(0, 500, size=n).astype(np.int64)
    tbl = pa.table({"g": pa.array(ks), "v": pa.array(vs)})
    a = sorted(
        (r["g"], r["rk"], r["hv"])
        for r in kmv_minima_by_key(rd.from_arrow(tbl), "g", "v", k=16).take_all()
    )
    b = sorted(
        (r["g"], r["rk"], r["hv"])
        for r in kmv_minima_by_key(
            rd.from_arrow(tbl).repartition(11), "g", "v", k=16
        ).take_all()
    )
    assert a == b
    # brute force: per key, bottom-16 of distinct hashes
    import pandas as pd

    df = pd.DataFrame({"g": ks, "v": vs})
    want = []
    for g, sub in df.groupby("g"):
        hv = np.unique(hll_hash(sub["v"].to_numpy().astype(np.uint64)).astype(np.int64))[:16]
        want += [(g, i, int(h)) for i, h in enumerate(hv)]
    assert a == sorted(want)


def test_rolling_zscores_matches_pandas(ray_session):
    from vaero_ray.stages.numstats import rolling_zscores_per_group

    rng = _rng()
    ks, hs, cs = [], [], []
    for k in range(5):
        n = int(rng.integers(2, 80))
        hrs = np.sort(rng.choice(np.arange(400), size=n, replace=False))
        vals = rng.integers(0, 100, size=n)
        ks.append(np.full(n, k)); hs.append(hrs); cs.append(vals)
    tbl = pa.table(
        {"k": pa.array(np.concatenate(ks).astype(np.int64)),
         "hr": pa.array(np.concatenate(hs).astype(np.int64)),
         "c": pa.array(np.concatenate(cs).astype(np.int64))}
    )
    got = {
        (r["k"], r["hr"]): (r["m"], r["s1"], r["s2"], r["z"])
        for r in rolling_zscores_per_group(
            rd.from_arrow(tbl).repartition(3), "k", "hr", "c", w=7
        ).take_all()
    }
    for k, hrs, vals in zip(range(5), hs, cs):
        for i, (h, x) in enumerate(zip(hrs, vals)):
            wlo = max(0, i - 7)
            win = vals[wlo:i].astype(np.int64)
            m, s1, s2 = len(win), int(win.sum()), int((win * win).sum())
            zm, zs1, zs2, z = got[(k, int(h))]
            assert (zm, zs1, zs2) == (m, s1, s2)
            den2 = float(m) * s2 - float(s1) * s1
            if m > 0 and den2 > 0:
                assert abs(z - round((float(m) * x - s1) / np.sqrt(den2), 6)) < 1e-9
            else:
                assert z is None


def test_kmv_overlap_estimates_accuracy(ray_session):
    """Planted overlap: |A|=30k, |B|=20k, |A∩B|=10k -> estimates within
    ~3/sqrt(k-1) of truth."""
    from vaero_ray.stages.sketch import hll_hash, kmv_overlap_stats

    a_ids = np.arange(0, 30_000, dtype=np.int64)
    b_ids = np.arange(20_000, 40_000, dtype=np.int64)  # overlap 10k
    k = 256
    ha = np.sort(hll_hash(a_ids.astype(np.uint64)).astype(np.int64))[:k]
    hb = np.sort(hll_hash(b_ids.astype(np.uint64)).astype(np.int64))[:k]
    st = kmv_overlap_stats(ha, hb, k)
    assert abs(st["est_a"] - 30_000) / 30_000 < 0.25
    assert abs(st["est_b"] - 20_000) / 20_000 < 0.25
    assert abs(st["est_union"] - 40_000) / 40_000 < 0.25
    assert abs(st["est_intersection"] - 10_000) / 10_000 < 0.45
    # exact identity: sketches of the same set -> jaccard exactly 1
    st2 = kmv_overlap_stats(ha, ha.copy(), k)
    assert st2["jaccard"] == 1.0
    assert st2["hk_union"] == st2["hk_a"]


def test_cms_inner_product_bound_and_exactness():
    """Estimate upper-bounds the true inner product; exact when no
    collisions (few keys vs width)."""
    import pandas as pd

    from vaero_ray.stages.sketch import cms_inner_product, cms_slots

    rng = _rng()
    keys = rng.choice(np.arange(50, dtype=np.int64), size=5000)  # 50 distinct << 1024
    width, depth = 1024, 4
    counters = np.zeros((depth, width), np.int64)
    for r in range(depth):
        counters[r] = np.bincount(
            cms_slots(keys.astype(np.uint64), r, width), minlength=width
        )
    rows, slots = np.nonzero(counters)
    regs = pd.DataFrame({"row": rows, "slot": slots, "cnt": counters[rows, slots]})
    est = cms_inner_product(regs, width=width, depth=depth)
    true = int((np.bincount(keys) ** 2).sum())
    assert est >= true
    # 50 keys in 1024 slots: overwhelmingly likely collision-free in
    # at least one of 4 rows -> exact
    assert est == true


def test_zorder_layout_prunes_row_groups(tmp_path):
    """Scale evidence for the Morton layout key: sorting a file by
    zcode(user, hr) makes row-group min/max stats selective on BOTH
    dimensions, so a predicate on either prunes most row groups —
    unsorted layout prunes (almost) nothing."""
    import pyarrow.parquet as pq

    from vaero_ray.stages.keyed import morton16

    rng = _rng()
    n = 200_000
    user = rng.integers(0, 1 << 12, size=n).astype(np.uint64)
    hr = rng.integers(0, 1 << 12, size=n).astype(np.uint64)
    z = morton16(user, hr)
    tbl = pa.table(
        {"user_id": pa.array(user.astype(np.int64)), "hr": pa.array(hr.astype(np.int64)),
         "z": pa.array(z)}
    )

    def matching_groups(path, col, lo, hi):
        f = pq.ParquetFile(path)
        idx = f.schema_arrow.get_field_index(col)
        m = 0
        for g in range(f.metadata.num_row_groups):
            st = f.metadata.row_group(g).column(idx).statistics
            if st.max >= lo and st.min <= hi:
                m += 1
        return m, f.metadata.num_row_groups

    p_sorted = str(tmp_path / "zsorted.parquet")
    p_plain = str(tmp_path / "plain.parquet")
    order = np.argsort(z, kind="stable")
    pq.write_table(tbl.take(pa.array(order)), p_sorted, row_group_size=5_000)
    pq.write_table(tbl, p_plain, row_group_size=5_000)

    lo, hi = 100, 160  # narrow band on ONE dimension
    for col in ("user_id", "hr"):
        m_sorted, total = matching_groups(p_sorted, col, lo, hi)
        m_plain, _ = matching_groups(p_plain, col, lo, hi)
        assert m_plain == total  # random layout: every group overlaps
        assert m_sorted <= total // 2, (col, m_sorted, total)


def test_lateness_coverage_bruteforce(ray_session):
    from vaero_ray.pipelines.queries import QUERIES

    # tiny planted stream via the real gate path is covered by selfcheck;
    # here: the segmented running max must not cross user boundaries
    import pandas as pd
    import ray.data as rd2

    from vaero_ray.stages.keyed import bucketed_map_groups

    # reuse the gate's kernel indirectly: craft 2 users where user B's
    # first event is EARLIER than user A's max — cross-segment carry
    # would mark it late
    tbl = pa.table(
        {
            "user_id": pa.array([1, 1, 2, 2], pa.int64()),
            "event_id": pa.array([10, 11, 12, 13], pa.int64()),
            "ts": pa.array(
                np.array([1000_000_000, 2000_000_000, 500_000_000, 400_000_000],
                         dtype="datetime64[us]")
            ),
        }
    )
    import tempfile, os
    import pyarrow.parquet as pq2

    d = tempfile.mkdtemp()
    pq2.write_table(tbl, os.path.join(d, "events.parquet"))
    got = {r["lateness_s"]: r["n_late"] for r in QUERIES["lateness_coverage"](d).take_all()}
    # only user 2's second event (100 s behind) is late at L=0/60, not at 300+
    assert got[0] == 1 and got[60] == 1 and got[300] == 0 and got[3600] == 0


def test_funnel_dropoff_bruteforce(ray_session):
    from vaero_ray.stages.cep import funnel_dropoff

    rng = _rng()
    n = 4000
    users = rng.integers(0, 80, size=n).astype(np.int64)
    ts = rng.integers(0, 10**7, size=n).astype("datetime64[us]")
    types = rng.choice(np.array(["A", "B", "C", "x"]), size=n, p=[0.35, 0.3, 0.25, 0.1])
    tbl = pa.table(
        {"u": pa.array(users), "ts": pa.array(ts), "t": pa.array(types)}
    )
    got = {
        r["step_idx"]: r["n_reached"]
        for r in funnel_dropoff(
            rd.from_arrow(tbl).repartition(6), "u", "ts", "t", ["A", "B", "C"]
        ).take_all()
    }
    import pandas as pd

    df = pd.DataFrame({"u": users, "ts": ts.astype("int64"), "t": types})
    want = {1: 0, 2: 0, 3: 0}
    for _, g in df.sort_values(["u", "ts"]).groupby("u"):
        a = g[g["t"] == "A"]["ts"]
        if a.empty:
            continue
        want[1] += 1
        t1 = a.iloc[0]
        b = g[(g["t"] == "B") & (g["ts"] >= t1)]["ts"]
        if b.empty:
            continue
        want[2] += 1
        t2 = b.iloc[0]
        c = g[(g["t"] == "C") & (g["ts"] >= t2)]["ts"]
        if not c.empty:
            want[3] += 1
    assert got == want


def test_kendall_trend_bruteforce(ray_session):
    from vaero_ray.stages.numstats import kendall_trend_per_group

    rng = _rng()
    ks, hs, cs = [], [], []
    for k in range(6):
        n = int(rng.integers(1, 60))
        hrs = np.sort(rng.choice(np.arange(200), size=n, replace=False))
        vals = rng.integers(0, 15, size=n)  # small domain -> ties
        ks.append(np.full(n, k)); hs.append(hrs); cs.append(vals)
    tbl = pa.table(
        {"k": pa.array(np.concatenate(ks).astype(np.int64)),
         "hr": pa.array(np.concatenate(hs).astype(np.int64)),
         "c": pa.array(np.concatenate(cs).astype(np.int64))}
    )
    got = {
        r["k"]: (r["n_points"], r["s_stat"])
        for r in kendall_trend_per_group(
            rd.from_arrow(tbl).repartition(4), "k", "hr", "c"
        ).take_all()
    }
    for k, vals in zip(range(6), cs):
        s = 0
        for i in range(len(vals)):
            for j in range(i + 1, len(vals)):
                s += int(np.sign(int(vals[j]) - int(vals[i])))
        assert got[k] == (len(vals), s), k


def test_ks_two_sample_matches_scipy_style(ray_session):
    """Exact KS vs a brute-force CDF-gap computation."""
    from vaero_ray.stages.numstats import ks_two_sample

    rng = _rng()
    a = rng.integers(0, 50, size=3000)
    b = rng.integers(5, 60, size=2000)  # shifted -> nonzero D
    vals = np.concatenate([a, b])
    c1 = np.concatenate([np.ones(len(a), np.int64), np.zeros(len(b), np.int64)])
    import pandas as pd

    df = pd.DataFrame({"v": vals, "c1": c1, "c2": 1 - c1}).groupby(
        "v", as_index=False
    ).sum()
    tbl = pa.Table.from_pandas(df, preserve_index=False)
    out = ks_two_sample(rd.from_arrow(tbl).repartition(5), "v")
    n1, n2 = out["n1"][0].as_py(), out["n2"][0].as_py()
    assert (n1, n2) == (3000, 2000)
    grid = np.arange(0, 61)
    cdf1 = np.searchsorted(np.sort(a), grid, side="right") / len(a)
    cdf2 = np.searchsorted(np.sort(b), grid, side="right") / len(b)
    want = np.abs(cdf1 - cdf2).max()
    assert abs(out["d_stat"][0].as_py() - want) < 1e-9


def test_hourly_active_sessions_spanning(ray_session):
    """A session spanning 3 hours counts once in each hour."""
    from vaero_ray.pipelines.queries import QUERIES
    import tempfile, os
    import pyarrow.parquet as pq2

    ts = np.array(
        ["2026-01-01T10:10", "2026-01-01T10:30", "2026-01-01T10:50",
         "2026-01-01T11:10", "2026-01-01T11:30", "2026-01-01T11:50",
         "2026-01-01T12:10",  # same 30-min-gap chain -> one session 10..12
         "2026-01-01T15:00"],  # second session, hour 15
        dtype="datetime64[us]",
    )
    tbl = pa.table(
        {"user_id": pa.array([7] * 8, pa.int64()), "ts": pa.array(ts)}
    )
    d = tempfile.mkdtemp()
    pq2.write_table(tbl, os.path.join(d, "events.parquet"))
    got = {r["hr"]: r["n_sessions"] for r in QUERIES["hourly_active_sessions"](d).take_all()}
    h10 = int(ts[0].astype("datetime64[h]").astype("int64"))
    assert got == {h10: 1, h10 + 1: 1, h10 + 2: 1, h10 + 5: 1}
