"""Session-11 batch: k-group Kruskal-Wallis rank ingredients,
Jensen-Shannon divergence, Siegel repeated-median slope — brute-force
python oracles on randomized synthetic tables (explicit average-rank
assignment / dict histograms / nested-loop medians vs the vectorized
distinct-value-compressed kernels)."""

import math
import os
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _rng():
    return np.random.default_rng(17)


def _write_documents(d, n=4000, n_sources=5, vmax=60):
    """Small value domain => heavy ties (the tie-block closed forms are
    the part under test)."""
    rng = _rng()
    src = np.array([f"src{int(i)}" for i in rng.integers(0, n_sources, size=n)])
    n_chars = rng.integers(1, vmax, size=n).astype(np.int64)
    tbl = pa.table({"source": pa.array(src), "n_chars": pa.array(n_chars)})
    pq.write_table(tbl, os.path.join(d, "documents.parquet"))
    return src, n_chars


def _avg_ranks(vals):
    """Explicit 1-based average ranks with ties (the textbook
    definition, independent of the kernel's cumsum closed form)."""
    order = np.argsort(vals, kind="stable")
    ranks = np.empty(len(vals), dtype=np.float64)
    sv = vals[order]
    i = 0
    while i < len(sv):
        j = i
        while j < len(sv) and sv[j] == sv[i]:
            j += 1
        ranks[order[i:j]] = (i + 1 + j) / 2.0  # mean of ranks i+1..j
        i = j
    return ranks


def test_kruskal_bruteforce(ray_session):
    from vaero_ray.pipelines.queries import QUERIES

    d = tempfile.mkdtemp()
    src, vals = _write_documents(d)
    got = QUERIES["source_length_kruskal"](d).to_pandas().set_index("source")

    ranks = _avg_ranks(vals)
    n = len(vals)
    s = 0.0
    for g in sorted(set(src)):
        sel = src == g
        n_j = int(sel.sum())
        r_j = float(ranks[sel].sum())
        assert int(got.loc[g, "n_j"]) == n_j
        # doubled rank sums are exact ints; 2*sum(avg ranks) is integral
        assert int(got.loc[g, "two_r"]) == int(round(2 * r_j))
        s += r_j * r_j / n_j
    h = 12.0 / (n * (n + 1.0)) * s - 3.0 * (n + 1.0)
    _, cnt = np.unique(vals, return_counts=True)
    tie = int(np.sum(cnt.astype(object) ** 3 - cnt))
    assert int(got["tie_sum"].iloc[0]) == tie
    assert int(got["n"].iloc[0]) == n
    assert abs(float(got["h"].iloc[0]) - h) < 1e-6
    hc = h / (1.0 - tie / (float(n) ** 3 - n))
    assert abs(float(got["h_tie"].iloc[0]) - hc) < 1e-6
    assert tie > 0, "fixture must exercise ties"


def test_jsd_bruteforce(ray_session):
    from vaero_ray.pipelines.queries import QUERIES

    d = tempfile.mkdtemp()
    src, vals = _write_documents(d, n=3000, n_sources=3, vmax=40)
    got = QUERIES["source_length_jsd"](d).to_pandas().iloc[0]

    h1: dict = {}
    h2: dict = {}
    for s, v in zip(src, vals):
        if s == "src0":
            h1[v] = h1.get(v, 0) + 1
        elif s == "src1":
            h2[v] = h2.get(v, 0) + 1
    n1, n2 = sum(h1.values()), sum(h2.values())
    support = set(h1) | set(h2)
    jsd = 0.0
    for v in support:
        p = h1.get(v, 0) / n1
        q = h2.get(v, 0) / n2
        m = (p + q) / 2.0
        if p > 0:
            jsd += 0.5 * p * math.log(p / m)
        if q > 0:
            jsd += 0.5 * q * math.log(q / m)
    assert int(got["n1"]) == n1 and int(got["n2"]) == n2
    assert int(got["support"]) == len(support)
    assert int(got["overlap"]) == len(set(h1) & set(h2))
    assert abs(float(got["jsd"]) - jsd) < 1e-6
    # JSD in nats is bounded by ln(2)
    assert 0.0 <= float(got["jsd"]) <= math.log(2.0)


def _qc_median(xs):
    """DuckDB quantile_cont(0.5) interpolation, exactly as the kernel
    writes it: lo + (hi - lo) * frac on the sorted array."""
    xs = sorted(xs)
    rn = (len(xs) - 1) * 0.5
    lo = int(math.floor(rn))
    hi = int(math.ceil(rn))
    return xs[lo] + (xs[hi] - xs[lo]) * (rn - lo)


def test_siegel_slope_bruteforce():
    from vaero_ray.stages.numstats import siegel_slope_e6

    rng = _rng()
    for trial in range(20):
        H = int(rng.integers(2, 30))
        h = np.sort(rng.choice(np.arange(100), size=H, replace=False)).astype(
            np.int64
        )
        n = rng.integers(0, 1000, size=H).astype(np.int64)
        got = siegel_slope_e6(h, n)
        med_i = []
        for i in range(H):
            sl = [
                (float(n[j]) - float(n[i])) / (float(h[j]) - float(h[i]))
                for j in range(H)
                if j != i
            ]
            med_i.append(_qc_median(sl))
        want = int(math.floor(_qc_median(med_i) * 1e6 + 0.5))
        assert got == want, (trial, H)


def test_siegel_outlier_robustness():
    """One wild outlier hour must not move the repeated-median slope:
    a perfect slope-3 line with a single corrupted point keeps
    slope_e6 == 3_000_000 (Theil-Sen survives one outlier too, but
    Siegel survives up to 50% — this pins the baseline behavior)."""
    from vaero_ray.stages.numstats import siegel_slope_e6

    h = np.arange(20, dtype=np.int64)
    n = 3 * h + 7
    n[11] = 100_000
    assert siegel_slope_e6(h, n) == 3_000_000
