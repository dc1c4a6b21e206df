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
