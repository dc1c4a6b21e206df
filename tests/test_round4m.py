"""Session-9 batch 1: TPC-H Q20/Q21 shape kernels — brute-force python
oracles on randomized synthetic lineitem tables (the in-bucket share /
uniqueness logic is the part the SQL oracle can't isolate)."""

import os
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _rng():
    return np.random.default_rng(11)


def _write_lineitem(d, n_orders=400, n_parts=60, n_supp=12, n=5000):
    rng = _rng()
    order = rng.integers(0, n_orders, size=n).astype(np.int64)
    part = rng.integers(0, n_parts, size=n).astype(np.int64)
    supp = rng.integers(0, n_supp, size=n).astype(np.int64)
    qty = rng.integers(1, 51, size=n).astype(np.float64)
    # dense second-resolution ship dates => frequent exact ties at max
    ship = np.datetime64("2026-01-01") + rng.integers(0, 3600, size=n).astype(
        "timedelta64[s]"
    )
    tbl = pa.table(
        {
            "l_orderkey": order,
            "l_partkey": part,
            "l_suppkey": supp,
            "l_quantity": qty,
            "l_shipdate": pa.array(ship.astype("datetime64[us]")),
        }
    )
    pq.write_table(tbl, os.path.join(d, "lineitem.parquet"))
    return tbl


def test_order_blocker_bruteforce(ray_session):
    """Unique-strict-max supplier per multi-supplier order vs a python
    dict oracle, including tie-at-max orders (excluded) and
    single-supplier orders (excluded)."""
    from vaero_ray.pipelines.queries import QUERIES

    d = tempfile.mkdtemp()
    tbl = _write_lineitem(d)
    got = {
        r["l_suppkey"]: r["n_blocked"]
        for r in QUERIES["order_blocker_suppliers"](d).take_all()
    }

    smax = {}
    for o, s, ts in zip(
        tbl["l_orderkey"].to_pylist(),
        tbl["l_suppkey"].to_pylist(),
        tbl["l_shipdate"].to_pylist(),
    ):
        k = (o, s)
        if k not in smax or ts > smax[k]:
            smax[k] = ts
    per_order = {}
    for (o, s), ts in smax.items():
        per_order.setdefault(o, []).append((ts, s))
    want = {}
    n_tied = n_single = 0
    for o, lst in per_order.items():
        if len(lst) < 2:
            n_single += 1
            continue
        mx = max(ts for ts, _ in lst)
        at_max = [s for ts, s in lst if ts == mx]
        if len(at_max) != 1:
            n_tied += 1
            continue
        want[at_max[0]] = want.get(at_max[0], 0) + 1
    assert n_tied > 0, "fixture must exercise the tie-at-max exclusion"
    assert got == want


def test_dominant_suppliers_bruteforce(ray_session):
    """q*nsup > 2*tot share filter vs a python oracle; also checks the
    emitted part_qty/n_supp columns."""
    from vaero_ray.pipelines.queries import QUERIES

    d = tempfile.mkdtemp()
    tbl = _write_lineitem(d, n_orders=200, n_parts=40, n_supp=6, n=3000)
    rows = QUERIES["dominant_part_suppliers"](d).take_all()
    got = {(r["l_partkey"], r["l_suppkey"]): (r["qty"], r["part_qty"], r["n_supp"]) for r in rows}

    ps = {}
    for p, s, q in zip(
        tbl["l_partkey"].to_pylist(),
        tbl["l_suppkey"].to_pylist(),
        tbl["l_quantity"].to_pylist(),
    ):
        ps[(p, s)] = ps.get((p, s), 0) + int(q)
    tot, nsup = {}, {}
    for (p, s), q in ps.items():
        tot[p] = tot.get(p, 0) + q
        nsup[p] = nsup.get(p, 0) + 1
    want = {
        (p, s): (q, tot[p], nsup[p])
        for (p, s), q in ps.items()
        if nsup[p] >= 3 and q * nsup[p] > 2 * tot[p]
    }
    assert got == want


def test_spearman_bruteforce(ray_session):
    """Pair-count Spearman vs direct tie-averaged-rank Pearson on the
    raw rows (numpy average ranks), heavy ties included."""
    import tempfile

    from vaero_ray.pipelines.queries import QUERIES

    rng = _rng()
    n = 4000
    x = rng.integers(5, 40, size=n)  # heavy ties
    # monotone-ish in x plus noise, also tied
    y = (x // 3 + rng.integers(0, 6, size=n)).astype(np.int64)
    texts = [" ".join(["w"] * int(t)) if t > 0 else "" for t in y]
    tbl = pa.table(
        {
            "text": pa.array(texts, pa.string()),
            "n_chars": pa.array(x, pa.int64()),
        }
    )
    d = tempfile.mkdtemp()
    pq.write_table(tbl, os.path.join(d, "documents.parquet"))
    out = QUERIES["length_token_spearman"](d)
    assert out["n"][0].as_py() == n

    def avg_rank(v):
        order = np.argsort(v, kind="stable")
        ranks = np.empty(n, dtype=np.float64)
        sv = v[order]
        i = 0
        while i < n:
            j = i
            while j < n and sv[j] == sv[i]:
                j += 1
            ranks[order[i:j]] = (i + j + 1) / 2.0
            i = j
        return ranks

    rx, ry = avg_rank(np.asarray(x, np.float64)), avg_rank(np.asarray(y, np.float64))
    want = np.corrcoef(rx, ry)[0, 1]
    got = out["rho_e6"][0].as_py() / 1e6
    assert abs(got - want) < 2e-6


def test_kendall_bruteforce(ray_session):
    """Fenwick-sweep tau-b vs the O(n^2) sign-product definition,
    heavy ties on both margins."""
    import tempfile

    from vaero_ray.pipelines.queries import QUERIES

    rng = _rng()
    n = 900
    x = rng.integers(0, 25, size=n).astype(np.int64)
    y = (x // 2 + rng.integers(0, 8, size=n)).astype(np.int64)
    texts = [" ".join(["w"] * int(t)) if t > 0 else "" for t in y]
    tbl = pa.table(
        {"text": pa.array(texts, pa.string()), "n_chars": pa.array(x, pa.int64())}
    )
    d = tempfile.mkdtemp()
    pq.write_table(tbl, os.path.join(d, "documents.parquet"))
    out = QUERIES["length_token_kendall"](d)

    dx = np.sign(x[:, None] - x[None, :])
    dy = np.sign(y[:, None] - y[None, :])
    prod = dx * dy
    iu = np.triu_indices(n, k=1)
    conc = int((prod[iu] > 0).sum())
    disc = int((prod[iu] < 0).sum())
    assert out["conc"][0].as_py() == conc
    assert out["disc"][0].as_py() == disc
    n0 = n * (n - 1) // 2
    n1 = int((dx[iu] == 0).sum())
    n2 = int((dy[iu] == 0).sum())
    want = (conc - disc) / np.sqrt(float(n0 - n1) * float(n0 - n2))
    assert abs(out["tau_e6"][0].as_py() / 1e6 - want) < 2e-6


def test_theil_sen_bruteforce(ray_session):
    """Driver Fenwick-free finalize vs direct pairwise-median numpy,
    duckdb-interpolation semantics on even pair counts."""
    import math
    import tempfile

    from vaero_ray.pipelines.queries import QUERIES

    rng = _rng()
    rows = []
    base = np.datetime64("2026-03-01T00:00:00", "us")
    for et, trend in [("a", 3), ("b", -2)]:
        for h in range(40):
            # trend * h events in hour h, plus outlier noise hours
            cnt = max(1, trend * h + 200 + int(rng.integers(-5, 6)))
            if h in (7, 23):
                cnt += 5000  # outliers Theil-Sen must shrug off
            for _ in range(cnt):
                rows.append((base + np.timedelta64(h, "h"), et))
    ts = pa.array([r[0] for r in rows], pa.timestamp("us"))
    tbl = pa.table(
        {
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "ts": ts,
            "user_id": pa.array([0] * len(rows), pa.int64()),
            "event_type": pa.array([r[1] for r in rows], pa.string()),
            "value": pa.array([0.0] * len(rows), pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    d = tempfile.mkdtemp()
    pq.write_table(tbl, os.path.join(d, "events.parquet"))
    out = QUERIES["hourly_theil_sen"](d)
    got = dict(zip(out["event_type"].to_pylist(), out["slope_e6"].to_pylist()))

    import pandas as pd

    df = pd.DataFrame({"ts": [r[0] for r in rows], "et": [r[1] for r in rows]})
    hr = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64) // 3_600_000_000
    df["hr"] = hr
    for et in ("a", "b"):
        g = df[df["et"] == et].groupby("hr").size()
        h = g.index.to_numpy(np.int64)
        n = g.to_numpy(np.int64)
        i, j = np.triu_indices(len(h), k=1)
        sl = np.sort((n[j] - n[i]) / (h[j] - h[i]).astype(np.float64))
        rn = (len(sl) - 1) * 0.5
        lo, hi = int(math.floor(rn)), int(math.ceil(rn))
        med = sl[lo] + (sl[hi] - sl[lo]) * (rn - lo)
        assert got[et] == math.floor(med * 1e6 + 0.5)
        # robustness: the estimator tracks the planted trend, not the outliers
        assert abs(got[et] / 1e6 - (3 if et == "a" else -2)) < 1.5


def test_customer_order_distribution_zeros(ray_session):
    """Zero-order customers come from parquet-footer arithmetic, not a
    customer-table scan — verify the zero bucket and the histogram."""
    import tempfile

    from vaero_ray.pipelines.queries import QUERIES

    rng = _rng()
    n_cust = 300
    # customers 0..99 get orders, 100..299 get none
    ck = rng.integers(0, 100, size=1200).astype(np.int64)
    d = tempfile.mkdtemp()
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(range(1200), pa.int64()),
                "o_custkey": pa.array(ck, pa.int64()),
            }
        ),
        os.path.join(d, "orders.parquet"),
    )
    pq.write_table(
        pa.table({"c_custkey": pa.array(range(n_cust), pa.int64())}),
        os.path.join(d, "customer.parquet"),
    )
    out = QUERIES["customer_order_distribution"](d)
    got = dict(zip(out["c_count"].to_pylist(), out["custdist"].to_pylist()))
    import collections

    per = collections.Counter(ck.tolist())
    want = collections.Counter(per.values())
    want[0] = n_cust - len(per)
    assert got == dict(want)
    assert sum(got.values()) == n_cust


def test_batch_jaro_winkler_matches_duckdb():
    """Pair-vectorized JW kernel vs DuckDB's jaro_winkler_similarity,
    bit-exact, incl. empties, shared prefixes, and transpositions."""
    import duckdb

    from vaero_ray.stages.editdist import _batch_jaro_winkler

    rng = _rng()
    alpha = list("abcdefgh XYZ0123")
    cases = []
    for _ in range(5000):
        l1 = int(rng.integers(0, 36))
        l2 = int(rng.integers(0, 36))
        s1 = "".join(rng.choice(alpha, size=l1))
        s2 = "".join(rng.choice(alpha, size=l2))
        r = rng.random()
        if r < 0.25 and l1 > 3:
            s2 = s1[: l1 // 2] + s2[: max(0, l2 - l1 // 2)]
        elif r < 0.4 and l1 > 4:
            ls = list(s1)
            ls[1], ls[2] = ls[2], ls[1]
            s2 = "".join(ls)
        cases.append((s1, s2))
    con = duckdb.connect()
    con.execute("create table t(a varchar, b varchar)")
    con.executemany("insert into t values (?,?)", cases)
    want = np.array(
        [r[0] for r in con.sql("select jaro_winkler_similarity(a,b) from t").fetchall()]
    )
    got = _batch_jaro_winkler([c[0] for c in cases], [c[1] for c in cases])
    assert (got == want).all()  # bit-exact, not approx


def test_jaro_winkler_pairs_blocked(ray_session):
    """jaro_winkler_pairs finds planted transposed replicas within
    (source, length) blocks and nothing across blocks."""
    import tempfile

    import ray.data as rd

    from vaero_ray.stages.editdist import _batch_jaro_winkler, jaro_winkler_pairs

    rng = _rng()
    alpha = list("abcdefghij")
    rows = []
    for i in range(120):
        t = "".join(rng.choice(alpha, size=32))
        rows.append((i, t, f"s{i % 3}"))
        if i % 4 == 0:  # transposed replica, same block
            rows.append((1000 + i, t[0] + t[2] + t[1] + t[3:], f"s{i % 3}"))
    import pandas as pd

    df = pd.DataFrame(rows, columns=["doc_id", "k", "source"])
    df["n"] = df["k"].str.len().astype("int64")
    ds = rd.from_pandas(df)
    out = pa.Table.from_pylist(
        jaro_winkler_pairs(
            ds, "doc_id", "k", ["source", "n"], min_sim=0.99, num_buckets=4
        ).take_all()
    )
    # brute-force oracle over the same blocks
    want = set()
    recs = list(df.itertuples(index=False))
    A, B, pairs = [], [], []
    for x in range(len(recs)):
        for y in range(x + 1, len(recs)):
            a, b = recs[x], recs[y]
            if a.source == b.source and a.n == b.n:
                lo, hi = sorted((a.doc_id, b.doc_id))
                A.append(a.k)
                B.append(b.k)
                pairs.append((lo, hi))
    sims = _batch_jaro_winkler(A, B)
    for (lo, hi), s in zip(pairs, sims):
        if s >= 0.99:
            want.add((lo, hi, int(np.floor(s * 1e6 + 0.5))))
    got = set(
        zip(
            out["id_a"].to_pylist(),
            out["id_b"].to_pylist(),
            out["jw_e6"].to_pylist(),
        )
    )
    assert got == want
    assert len(got) >= 30  # the planted replicas are actually found


def test_mutual_info_bruteforce(ray_session):
    """MI/NMI finalize vs direct scipy-free computation on a planted
    dependent contingency."""
    import math
    import tempfile

    from vaero_ray.pipelines.queries import QUERIES

    rng = _rng()
    n = 4000
    src = rng.integers(0, 6, size=n)
    # lang depends on source (strong association) with noise
    lang = np.where(rng.random(n) < 0.7, src % 3, rng.integers(0, 3, size=n))
    tbl = pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array(["x"] * n, pa.string()),
            "source": pa.array([f"s{i}" for i in src], pa.string()),
            "lang": pa.array([f"l{i}" for i in lang], pa.string()),
            "n_chars": pa.array([1] * n, pa.int64()),
        }
    )
    d = tempfile.mkdtemp()
    pq.write_table(tbl, os.path.join(d, "documents.parquet"))
    out = QUERIES["source_lang_mutual_info"](d)

    import collections

    cnt = collections.Counter(zip(src.tolist(), lang.tolist()))
    r = collections.Counter(src.tolist())
    s = collections.Counter(lang.tolist())
    mi = sum(
        (c / n) * math.log(c * n / (r[a] * s[b])) for (a, b), c in cnt.items()
    )
    hx = math.log(n) - sum(v * math.log(v) for v in r.values()) / n
    hy = math.log(n) - sum(v * math.log(v) for v in s.values()) / n
    assert abs(out["mi"][0].as_py() - mi) < 2e-6
    assert abs(out["h_source"][0].as_py() - hx) < 2e-6
    assert abs(out["h_lang"][0].as_py() - hy) < 2e-6
    assert abs(out["nmi"][0].as_py() - mi / math.sqrt(hx * hy)) < 2e-6
    assert out["n_rows"][0].as_py() == n
    assert out["mi"][0].as_py() > 0.3  # the planted dependence is detected


def test_view_purchase_lag_bruteforce(ray_session):
    """Lag cross-products vs a dict-based brute force, incl. missing
    hours (gaps must drop pairs, not zero-fill)."""
    import collections
    import tempfile

    from vaero_ray.pipelines.queries import QUERIES

    rng = _rng()
    rows = []
    base = np.datetime64("2026-05-01T00:00:00", "us")
    for h in range(50):
        if h % 7 == 3:
            continue  # hour gap
        for _ in range(int(rng.integers(1, 20))):
            rows.append((base + np.timedelta64(h, "h"), "view"))
        for _ in range(int(rng.integers(0, 10))):
            rows.append((base + np.timedelta64(h, "h"), "purchase"))
        for _ in range(int(rng.integers(0, 5))):
            rows.append((base + np.timedelta64(h, "h"), "click"))  # ignored
    tbl = pa.table(
        {
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "ts": pa.array([r[0] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([0] * len(rows), pa.int64()),
            "event_type": pa.array([r[1] for r in rows], pa.string()),
            "value": pa.array([0.0] * len(rows), pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    d = tempfile.mkdtemp()
    pq.write_table(tbl, os.path.join(d, "events.parquet"))
    out = QUERIES["hourly_view_purchase_lag"](d)

    v = collections.Counter()
    p = collections.Counter()
    for ts, et in rows:
        hr = ts.astype("datetime64[h]").astype(np.int64)
        if et == "view":
            v[int(hr)] += 1
        elif et == "purchase":
            p[int(hr)] += 1
    hours = sorted(set(v) | set(p))
    got = {
        r["lag"]: (r["n_pairs"], r["sum_vp"]) for r in out.to_pylist()
    }
    for lag in range(-3, 4):
        pairs = [(a, a + lag) for a in hours if a + lag in set(hours)]
        want_n = len(pairs)
        want_s = sum(v.get(a, 0) * p.get(b, 0) for a, b in pairs)
        assert got[lag] == (want_n, want_s), lag
