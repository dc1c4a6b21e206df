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


def test_hodges_lehmann_bruteforce(ray_session):
    """Weighted-median-over-compressed-diffs vs the fully EXPANDED
    all-pairs multiset median (the thing HL is defined as)."""
    from vaero_ray.pipelines.queries import QUERIES

    d = tempfile.mkdtemp()
    src, vals = _write_documents(d, n=2500, n_sources=4, vmax=50)
    got = QUERIES["source_length_hl_shift"](d).to_pandas().iloc[0]

    a = vals[src == "src0"]
    b = vals[src == "src1"]
    diffs = np.sort((a[:, None].astype(np.int64) - b[None, :]).ravel())
    tot = len(diffs)
    rn = (tot - 1) * 0.5
    lo = int(math.floor(rn))
    hi = int(math.ceil(rn))
    hl = diffs[lo] + (diffs[hi] - diffs[lo]) * (rn - lo)
    assert int(got["n1"]) == len(a) and int(got["n2"]) == len(b)
    assert int(got["n_pairs"]) == tot
    assert int(got["n_diffs"]) == len(set(diffs.tolist()))
    assert int(got["hl_e6"]) == int(math.floor(hl * 1e6 + 0.5))


def test_mood_median_bruteforce(ray_session):
    from vaero_ray.pipelines.queries import QUERIES

    d = tempfile.mkdtemp()
    src, vals = _write_documents(d, n=3000, n_sources=6, vmax=45)
    got = QUERIES["source_length_mood"](d).to_pandas().set_index("source")

    n = len(vals)
    med = int(np.sort(vals)[max(math.ceil(0.5 * n) - 1, 0)])
    njs, ajs = {}, {}
    for g in sorted(set(src)):
        sel = src == g
        njs[g] = int(sel.sum())
        ajs[g] = int((vals[sel] > med).sum())
        assert int(got.loc[g, "n_j"]) == njs[g]
        assert int(got.loc[g, "n_above"]) == ajs[g]
    assert int(got["med"].iloc[0]) == med
    A = sum(ajs.values())
    B = n - A
    chi2 = sum(
        (ajs[g] - njs[g] * A / n) ** 2 / (njs[g] * A / n)
        + ((njs[g] - ajs[g]) - njs[g] * B / n) ** 2 / (njs[g] * B / n)
        for g in njs
    )
    assert int(got["n_above_total"].iloc[0]) == A
    assert abs(float(got["chi2"].iloc[0]) - chi2) < 1e-6


def test_friedman_bruteforce(ray_session):
    """Friedman blocked ranks vs an explicit per-hour average-rank
    oracle, on a fixture where some hours MISS some types (the
    complete-block filter is the part the sf gates can't exercise —
    driver hours are dense)."""
    from vaero_ray.pipelines.queries import QUERIES

    rng = _rng()
    n = 6000
    ts = np.datetime64("2026-01-01", "us") + rng.integers(
        0, 48 * 3600, size=n
    ).astype("timedelta64[s]").astype("timedelta64[us]")
    # signup is rare => many hours lack it => incomplete blocks exist
    et = np.array(["view", "click", "purchase", "signup"])[
        np.minimum(rng.integers(0, 40, size=n), 3)
    ]
    d = tempfile.mkdtemp()
    pq.write_table(
        pa.table({"ts": pa.array(ts), "event_type": pa.array(et)}),
        os.path.join(d, "events.parquet"),
    )
    got = QUERIES["hourly_friedman"](d).to_pandas().set_index("event_type")

    hr = ts.astype("datetime64[us]").astype(np.int64) // 3_600_000_000
    counts: dict = {}
    for h, e in zip(hr, et):
        counts[(h, e)] = counts.get((h, e), 0) + 1
    k = len(set(et))
    hours: dict = {}
    for (h, e), c in counts.items():
        hours.setdefault(h, []).append((e, c))
    complete = {h: rows for h, rows in hours.items() if len(rows) == k}
    assert len(complete) < len(hours), "fixture must have incomplete blocks"
    two_r: dict = {}
    tie_sum = 0
    for h, rows in complete.items():
        vals = np.array([c for _, c in rows])
        ranks = _avg_ranks(vals)
        _, tcnt = np.unique(vals, return_counts=True)
        tie_sum += int(np.sum(tcnt.astype(np.int64) ** 3 - tcnt))
        for (e, _), r in zip(rows, ranks):
            two_r[e] = two_r.get(e, 0) + int(round(2 * r))
    b = len(complete)
    for e in sorted(two_r):
        assert int(got.loc[e, "two_r"]) == two_r[e], e
    assert int(got["b"].iloc[0]) == b and int(got["k"].iloc[0]) == k
    assert int(got["tie_sum"].iloc[0]) == tie_sum
    s = sum(v * v / 4.0 for v in two_r.values())
    chi2 = 12.0 / (b * k * (k + 1.0)) * s - 3.0 * b * (k + 1.0)
    chi2_tie = chi2 / (1.0 - tie_sum / (b * k * (float(k) * k - 1.0)))
    assert abs(float(got["chi2"].iloc[0]) - chi2) < 1e-6
    assert abs(float(got["chi2_tie"].iloc[0]) - chi2_tie) < 1e-6
    assert abs(float(got["kendall_w"].iloc[0]) - chi2_tie / (b * (k - 1.0))) < 1e-6
    # W is a [0, 1] concordance coefficient
    assert -1e-9 <= float(got["kendall_w"].iloc[0]) <= 1.0 + 1e-9


def test_cramers_v_bruteforce(ray_session):
    """Full-grid chi-square (unobserved cells contribute their
    expected mass) vs an explicit r x c double loop — the missing-cell
    identity is the part under test."""
    import collections

    from vaero_ray.pipelines.queries import QUERIES

    rng = _rng()
    n = 3000
    sidx = rng.integers(0, 6, size=n)
    src = np.array([f"src{int(i)}" for i in sidx])
    LANGS = ["en", "fr", "de", "es"]
    # source k draws only from the first (k % 4) + 1 langs => some
    # (lang, source) combos never occur
    lang = np.array([LANGS[int(rng.integers(0, (int(k) % 4) + 1))] for k in sidx])
    d = tempfile.mkdtemp()
    pq.write_table(
        pa.table({"source": pa.array(src), "lang": pa.array(lang)}),
        os.path.join(d, "documents.parquet"),
    )
    got = QUERIES["source_lang_cramers_v"](d).to_pandas().iloc[0]

    obs = collections.Counter(zip(lang, src))
    langs, srcs = sorted(set(lang)), sorted(set(src))
    rt, ct = collections.Counter(lang), collections.Counter(src)
    chi2 = sum(
        (obs.get((L, S), 0) - rt[L] * ct[S] / n) ** 2 / (rt[L] * ct[S] / n)
        for L in langs
        for S in srcs
    )
    r, c = len(langs), len(srcs)
    assert r * c - int(got["n_cells"]) > 0, "fixture must have unobserved cells"
    assert int(got["n"]) == n and int(got["r"]) == r and int(got["c"]) == c
    assert abs(float(got["chi2"]) - chi2) < 1e-5
    assert abs(float(got["cramers_v"]) - math.sqrt(chi2 / (n * min(r - 1, c - 1)))) < 1e-6
    assert (
        abs(float(got["tschuprow_t"]) - math.sqrt(chi2 / (n * math.sqrt((r - 1) * (c - 1)))))
        < 1e-6
    )


def _write_events(d, n=6000, hours=72, types=("view", "click", "purchase")):
    rng = _rng()
    ts = np.datetime64("2026-01-01", "us") + rng.integers(
        0, hours * 3600, size=n
    ).astype("timedelta64[s]").astype("timedelta64[us]")
    et = np.array(types)[rng.integers(0, len(types), size=n)]
    pq.write_table(
        pa.table({"ts": pa.array(ts), "event_type": pa.array(et)}),
        os.path.join(d, "events.parquet"),
    )
    return ts, et


def test_runs_test_bruteforce(ray_session):
    from vaero_ray.pipelines.queries import QUERIES

    d = tempfile.mkdtemp()
    ts, et = _write_events(d)
    got = QUERIES["hourly_runs_test"](d).to_pandas().set_index("event_type")

    hr = ts.astype(np.int64) // 3_600_000_000
    for t in sorted(set(et)):
        counts: dict = {}
        for h, e in zip(hr, et):
            if e == t:
                counts[h] = counts.get(h, 0) + 1
        nn = np.array([counts[h] for h in sorted(counts)])
        sgn = np.sign(np.diff(nn))
        sgn = sgn[sgn != 0]
        n1, n2 = int((sgn > 0).sum()), int((sgn < 0).sum())
        runs = int(1 + (sgn[1:] != sgn[:-1]).sum())
        assert int(got.loc[t, "n_plus"]) == n1
        assert int(got.loc[t, "n_minus"]) == n2
        assert int(got.loc[t, "n_runs"]) == runs
        m = n1 + n2
        mu = 2.0 * n1 * n2 / m + 1.0
        var = 2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2) / (float(m) * m * (m - 1.0))
        assert abs(float(got.loc[t, "z"]) - (runs - mu) / math.sqrt(var)) < 1e-6


def test_durbin_watson_bruteforce(ray_session):
    from vaero_ray.pipelines.queries import QUERIES

    d = tempfile.mkdtemp()
    ts, et = _write_events(d, n=4000, hours=48)
    got = QUERIES["hourly_durbin_watson"](d).to_pandas().set_index("event_type")

    hr = ts.astype(np.int64) // 3_600_000_000
    for t in sorted(set(et)):
        counts: dict = {}
        for h, e in zip(hr, et):
            if e == t:
                counts[h] = counts.get(h, 0) + 1
        nn = np.array([counts[h] for h in sorted(counts)], dtype=np.int64)
        ssd = int(np.sum(np.diff(nn) ** 2))
        assert int(got.loc[t, "ssd"]) == ssd
        assert int(got.loc[t, "t_hours"]) == len(nn)
        den = int(np.sum(nn * nn)) - int(nn.sum()) ** 2 / len(nn)
        assert abs(float(got.loc[t, "dw"]) - ssd / den) < 1e-6
        # a mean-reverting random hourly series sits near DW ~ 2-3
        assert 0.0 < float(got.loc[t, "dw"]) < 4.0


def test_ordinal_association_bruteforce(ray_session):
    """gamma / Somers' D / tau-a finalizer vs an explicit O(n^2)
    double loop over raw rows (ties in x, y, and both planted)."""
    from vaero_ray.stages.numstats import ordinal_association_from_pairs

    rng = _rng()
    n = 400
    x = rng.integers(0, 12, size=n).astype(np.int64)
    y = (x // 2 + rng.integers(-3, 4, size=n)).astype(np.int64)
    cells: dict = {}
    for a, b in zip(x, y):
        cells[(int(a), int(b))] = cells.get((int(a), int(b)), 0) + 1
    xs = [k[0] for k in cells]
    ys = [k[1] for k in cells]
    cs = list(cells.values())
    r = ordinal_association_from_pairs(xs, ys, cs)

    conc = disc = tx = ty = txy = 0
    for i in range(n):
        for j in range(i + 1, n):
            dx, dy = x[i] - x[j], y[i] - y[j]
            if dx == 0 and dy == 0:
                txy += 1
                tx += 1
                ty += 1
            elif dx == 0:
                tx += 1
            elif dy == 0:
                ty += 1
            elif (dx > 0) == (dy > 0):
                conc += 1
            else:
                disc += 1
    n0 = n * (n - 1) // 2
    assert r["n"] == n and r["conc"] == conc and r["disc"] == disc
    assert r["tied_x"] == tx and r["tied_y"] == ty and r["tied_xy"] == txy
    assert r["gamma_e6"] == math.floor((conc - disc) / (conc + disc) * 1e6 + 0.5)
    assert r["d_yx_e6"] == math.floor((conc - disc) / (n0 - tx) * 1e6 + 0.5)
    assert r["d_xy_e6"] == math.floor((conc - disc) / (n0 - ty) * 1e6 + 0.5)
    assert r["tau_a_e6"] == math.floor((conc - disc) / n0 * 1e6 + 0.5)
    # ordering: |tau_a| <= |D| <= |gamma| (denominators shrink)
    assert abs(r["tau_a_e6"]) <= abs(r["d_yx_e6"]) <= abs(r["gamma_e6"])


def test_cliffs_delta_bruteforce(ray_session):
    """Compressed-cumsum pair counts vs the explicit n1 x n2 loop."""
    from vaero_ray.stages.numstats import cliffs_delta

    import ray.data as rd

    rng = _rng()
    n = 3000
    grp = np.where(rng.random(n) < 0.5, "a", "b")
    # group a shifted up => positive delta; small domain => heavy ties
    v = rng.integers(0, 40, size=n) + np.where(grp == "a", 4, 0)
    ds = rd.from_arrow(
        pa.table({"g": pa.array(grp), "v": pa.array(v.astype(np.int64))})
    )
    got = cliffs_delta(ds, "v", "g", "a", "b").to_pandas().iloc[0]

    va, vb = v[grp == "a"], v[grp == "b"]
    gt = int(np.sum(va[:, None] > vb[None, :]))
    lt = int(np.sum(va[:, None] < vb[None, :]))
    eq = int(np.sum(va[:, None] == vb[None, :]))
    assert int(got["n1"]) == len(va) and int(got["n2"]) == len(vb)
    assert int(got["n_gt"]) == gt and int(got["n_lt"]) == lt and int(got["n_eq"]) == eq
    assert gt + lt + eq == len(va) * len(vb)
    assert int(got["delta_e6"]) == math.floor((gt - lt) / (len(va) * len(vb)) * 1e6 + 0.5)
    assert int(got["delta_e6"]) > 0


def test_theil_u_gtest_bruteforce(ray_session):
    """Theil's U and the G-test vs explicit dict-histogram entropy
    arithmetic on a planted source->lang dependence."""
    import collections

    from vaero_ray.pipelines.queries import QUERIES

    rng = _rng()
    n = 5000
    sidx = rng.integers(0, 5, size=n)
    src = np.array([f"src{int(i)}" for i in sidx])
    LANGS = ["en", "fr", "de"]
    lang = np.array(
        [LANGS[int((k + rng.integers(0, 2)) % 3)] for k in sidx]
    )
    d = tempfile.mkdtemp()
    pq.write_table(
        pa.table({"source": pa.array(src), "lang": pa.array(lang)}),
        os.path.join(d, "documents.parquet"),
    )

    joint = collections.Counter(zip(src, lang))
    cs, cl = collections.Counter(src), collections.Counter(lang)
    mi = sum(
        c / n * math.log(c * n / (cs[s] * cl[L])) for (s, L), c in joint.items()
    )
    h_s = -sum(c / n * math.log(c / n) for c in cs.values())
    h_l = -sum(c / n * math.log(c / n) for c in cl.values())
    h_j = -sum(c / n * math.log(c / n) for c in joint.values())

    u = QUERIES["source_lang_theil_u"](d).to_pandas().iloc[0]
    assert int(u["n_rows"]) == n and int(u["n_cells"]) == len(joint)
    assert abs(float(u["h_joint"]) - h_j) < 1e-6
    assert abs(float(u["u_lang_given_source"]) - mi / h_l) < 1e-6
    assert abs(float(u["u_source_given_lang"]) - mi / h_s) < 1e-6
    assert abs(float(u["u_symmetric"]) - 2 * mi / (h_s + h_l)) < 1e-6
    # dependence planted => a real chunk of lang uncertainty is removed
    assert 0.05 < float(u["u_lang_given_source"]) <= 1.0

    g = QUERIES["source_lang_gtest"](d).to_pandas().iloc[0]
    nr, nc = len(cl), len(cs)
    assert int(g["df"]) == (nr - 1) * (nc - 1)
    assert abs(float(g["g"]) - 2.0 * n * mi) < 1e-5
    qw = 1.0 + (n * sum(1.0 / c for c in cl.values()) - 1.0) * (
        n * sum(1.0 / c for c in cs.values()) - 1.0
    ) / (6.0 * n * (nr - 1) * (nc - 1))
    assert abs(float(g["williams_q"]) - qw) < 1e-6
    assert abs(float(g["g_adj"]) - float(g["g"]) / qw) < 1e-4


def test_page_trend_bruteforce(ray_session):
    """Page's L against explicit per-block average ranks and the
    textbook chi2_L / z formulas, on a fixture with a planted
    alphabetical trend and some incomplete blocks."""
    from vaero_ray.pipelines.queries import QUERIES

    rng = _rng()
    types = ["a_ev", "b_ev", "c_ev", "d_ev"]
    rows_ts, rows_et = [], []
    base = np.datetime64("2026-02-01", "us")
    for h in range(60):
        for j, t in enumerate(types):
            # planted increasing trend in alphabetical position + noise;
            # every 7th hour drops one type => incomplete block
            if h % 7 == 0 and j == 2:
                continue
            cnt = 1 + 2 * j + int(rng.integers(0, 3))
            for _ in range(cnt):
                rows_ts.append(base + np.timedelta64(h * 3600 + int(rng.integers(0, 3600)), "s"))
                rows_et.append(t)
    d = tempfile.mkdtemp()
    pq.write_table(
        pa.table(
            {
                "ts": pa.array(np.array(rows_ts, dtype="datetime64[us]")),
                "event_type": pa.array(rows_et),
            }
        ),
        os.path.join(d, "events.parquet"),
    )
    got = QUERIES["hourly_page_trend"](d).to_pandas().iloc[0]

    # brute force: hourly counts, complete blocks, average ranks
    hr = np.array(rows_ts, dtype="datetime64[us]").astype(np.int64) // 3_600_000_000
    et = np.array(rows_et)
    k = len(types)
    blocks = {}
    for h in sorted(set(hr)):
        present = {t: int(np.sum((hr == h) & (et == t))) for t in types}
        present = {t: c for t, c in present.items() if c > 0}
        if len(present) == k:
            blocks[h] = present
    b = len(blocks)
    two_l = 0
    for h, cnts in blocks.items():
        vals = np.array([cnts[t] for t in types], dtype=np.int64)
        r = _avg_ranks(vals)
        two_l += int(np.sum((np.arange(1, k + 1)) * np.round(2 * r).astype(np.int64)))
    assert int(got["b"]) == b and int(got["k"]) == k
    assert int(got["two_l"]) == two_l
    num = 6.0 * two_l - 3.0 * b * k * (k + 1) * (k + 1)
    den = b * k * k * (k + 1.0) * (k * k - 1)
    assert abs(float(got["chi2_l"]) - num * num / den) < 1e-5
    assert abs(float(got["z"]) - num / math.sqrt(den)) < 1e-6
    # planted monotone trend => strongly positive z
    assert float(got["z"]) > 3.0


def test_cochran_q_bruteforce(ray_session):
    """Cochran's Q on the binary hour x type occurrence design vs the
    explicit x_ij matrix formula (one type planted rare)."""
    from vaero_ray.pipelines.queries import QUERIES

    rng = _rng()
    types = ["view", "click", "purchase"]
    probs = [0.95, 0.7, 0.25]  # purchase present in few hours
    rows_ts, rows_et = [], []
    base = np.datetime64("2026-03-01", "us")
    for h in range(80):
        any_row = False
        for t, p in zip(types, probs):
            if rng.random() < p:
                any_row = True
                for _ in range(int(rng.integers(1, 4))):
                    rows_ts.append(
                        base + np.timedelta64(h * 3600 + int(rng.integers(0, 3600)), "s")
                    )
                    rows_et.append(t)
        if not any_row:  # keep every hour a block for the brute force
            rows_ts.append(base + np.timedelta64(h * 3600, "s"))
            rows_et.append("view")
    d = tempfile.mkdtemp()
    pq.write_table(
        pa.table(
            {
                "ts": pa.array(np.array(rows_ts, dtype="datetime64[us]")),
                "event_type": pa.array(rows_et),
            }
        ),
        os.path.join(d, "events.parquet"),
    )
    got = QUERIES["hourly_cochran_q"](d).to_pandas().set_index("event_type")

    hr = np.array(rows_ts, dtype="datetime64[us]").astype(np.int64) // 3_600_000_000
    et = np.array(rows_et)
    hours = sorted(set(hr))
    k = len(set(et))
    x = np.zeros((len(hours), k), dtype=np.int64)
    tl = sorted(set(et))
    for i, h in enumerate(hours):
        for j, t in enumerate(tl):
            x[i, j] = int(np.any((hr == h) & (et == t)))
    c_j = x.sum(axis=0)
    r_i = x.sum(axis=1)
    n_tot = int(x.sum())
    q = (k - 1.0) * (k * int(np.sum(c_j**2)) - float(n_tot) * n_tot) / (
        k * n_tot - int(np.sum(r_i**2))
    )
    for j, t in enumerate(tl):
        assert int(got.loc[t, "c_j"]) == int(c_j[j])
    assert int(got["b"].iloc[0]) == len(hours)
    assert int(got["n_tot"].iloc[0]) == n_tot
    assert int(got["sum_r2"].iloc[0]) == int(np.sum(r_i**2))
    assert abs(float(got["q"].iloc[0]) - q) < 1e-6
    # planted rare type => Q clearly significant vs chi2(2)
    assert float(got["q"].iloc[0]) > 10.0


def test_batch_damerau_matches_duckdb():
    """Pair-vectorized Lowrance-Wagner kernel vs DuckDB's
    damerau_levenshtein — exact, incl. empties, adjacent AND
    non-adjacent transpositions (tiny alphabet forces repeats), and
    the OSA-vs-unrestricted divergence case."""
    import duckdb

    from vaero_ray.stages.editdist import _batch_damerau

    rng = _rng()
    alpha = list("abcd")
    cases = [("CA", "ABC"), ("", ""), ("", "ab"), ("ba", "ab"), ("abcd", "acbd")]
    for _ in range(5000):
        l1 = int(rng.integers(0, 24))
        l2 = int(rng.integers(0, 24))
        s1 = "".join(rng.choice(alpha, size=l1))
        s2 = "".join(rng.choice(alpha, size=l2))
        r = rng.random()
        if r < 0.3 and l1 > 4:
            ls = list(s1)
            i = int(rng.integers(0, l1 - 1))
            ls[i], ls[i + 1] = ls[i + 1], ls[i]
            s2 = "".join(ls)
        elif r < 0.45 and l1 > 6:
            ls = list(s1)
            i = int(rng.integers(0, l1 - 3))
            ls[i], ls[i + 2] = ls[i + 2], ls[i]  # gap transposition
            s2 = "".join(ls)
        cases.append((s1, s2))
    con = duckdb.connect()
    con.execute("create table t(a varchar, b varchar)")
    con.executemany("insert into t values (?,?)", cases)
    want = np.array(
        [r[0] for r in con.sql("select damerau_levenshtein(a,b) from t").fetchall()],
        dtype=np.int64,
    )
    got = _batch_damerau([c[0] for c in cases], [c[1] for c in cases])
    assert (got == want).all()
    assert got[0] == 2  # the unrestricted-DL signature case


def test_damerau_pairs_blocked(ray_session):
    """damerau_pairs finds planted swap+substitution replicas within
    blocks at max_distance=2 (Levenshtein would need 3)."""
    import pandas as pd
    import ray.data as rd

    from vaero_ray.stages.editdist import _batch_damerau, damerau_pairs

    rng = _rng()
    alpha = list("abcdefghij")
    rows = []
    for i in range(150):
        t = "".join(rng.choice(alpha, size=28))
        rows.append((i, t, f"s{i % 3}"))
        if i % 4 == 0:  # swap chars 2/3 + substitute char 6 => DL 2
            lt = list(t)
            lt[2], lt[3] = lt[3], lt[2]
            lt[6] = "Z"
            rows.append((1000 + i, "".join(lt), f"s{i % 3}"))
    df = pd.DataFrame(rows, columns=["doc_id", "k", "source"])
    df["n"] = df["k"].str.len().astype("int64")
    ds = rd.from_pandas(df)
    out = pa.Table.from_pylist(
        damerau_pairs(
            ds, "doc_id", "k", ["source", "n"], max_distance=2, num_buckets=4
        ).take_all()
    )
    got = {
        (a, b): d
        for a, b, d in zip(
            out.column("id_a").to_pylist(),
            out.column("id_b").to_pylist(),
            out.column("dl_dist").to_pylist(),
        )
    }
    # brute-force over the same blocks
    recs = list(df.itertuples(index=False))
    want = {}
    A, B, key = [], [], []
    for i in range(len(recs)):
        for j in range(i + 1, len(recs)):
            a, b = recs[i], recs[j]
            if a.source == b.source and a.n == b.n:
                lo, hi = sorted((a.doc_id, b.doc_id))
                A.append(a.k)
                B.append(b.k)
                key.append((lo, hi))
    d = _batch_damerau(A, B)
    for kk, dd in zip(key, d):
        if dd <= 2:
            want[kk] = int(dd)
    assert got == want
    assert len(want) >= 30  # the planted replicas are all found


def test_anova_welch_bruteforce(ray_session):
    """ANOVA F / eta2 and Welch t/df vs explicit textbook formulas on
    raw group arrays (planted mean shift)."""
    from vaero_ray.pipelines.queries import QUERIES

    d = tempfile.mkdtemp()
    rng = _rng()
    n = 4000
    sidx = rng.integers(0, 4, size=n)
    src = np.array([f"src{int(i)}" for i in sidx])
    v = (rng.integers(10, 120, size=n) + 6 * sidx).astype(np.int64)  # shifted means
    pq.write_table(
        pa.table({"source": pa.array(src), "n_chars": pa.array(v)}),
        os.path.join(d, "documents.parquet"),
    )

    groups = [v[src == f"src{j}"] for j in range(4)]
    grand = v.mean()
    ssb = sum(len(g) * (g.mean() - grand) ** 2 for g in groups)
    ssw = sum(((g - g.mean()) ** 2).sum() for g in groups)
    k = 4
    f_want = (ssb / (k - 1)) / (ssw / (n - k))
    a = QUERIES["source_length_anova"](d).to_pandas()
    assert len(a) == k
    for j in range(4):
        row = a[a["source"] == f"src{j}"].iloc[0]
        assert int(row["n_j"]) == len(groups[j])
        assert int(row["s1"]) == int(groups[j].sum())
        assert int(row["s2"]) == int((groups[j].astype(np.int64) ** 2).sum())
    assert abs(float(a["f_stat"].iloc[0]) - f_want) < 1e-4
    assert abs(float(a["eta2"].iloc[0]) - ssb / (ssb + ssw)) < 1e-6
    assert float(a["f_stat"].iloc[0]) > 10.0  # planted shift detected

    w = QUERIES["source_length_welch"](d).to_pandas().iloc[0]
    g0, g1 = groups[0], groups[1]
    v0, v1 = g0.var(ddof=1), g1.var(ddof=1)
    se2 = v0 / len(g0) + v1 / len(g1)
    t_want = (g0.mean() - g1.mean()) / math.sqrt(se2)
    df_want = se2**2 / (
        (v0 / len(g0)) ** 2 / (len(g0) - 1) + (v1 / len(g1)) ** 2 / (len(g1) - 1)
    )
    assert abs(float(w["t"]) - t_want) < 1e-5
    assert abs(float(w["df"]) - df_want) < 1e-3
    assert abs(float(w["mean_diff"]) - (g0.mean() - g1.mean())) < 1e-6
    assert float(w["t"]) < -3.0  # src1 shifted up


def test_shape_brown_forsythe_bruteforce(ray_session):
    """Skewness/kurtosis and the Brown-Forsythe F vs explicit
    central-moment / median-deviation arithmetic (one group planted
    with doubled spread, one with a long right tail)."""
    from vaero_ray.pipelines.queries import QUERIES

    d = tempfile.mkdtemp()
    rng = _rng()
    n = 6000
    sidx = rng.integers(0, 3, size=n)
    src = np.array([f"src{int(i)}" for i in sidx])
    base = rng.integers(10, 110, size=n)
    v = np.where(sidx == 1, 10 + (base - 10) * 2, base)  # doubled spread
    tail = (sidx == 2) & (rng.random(n) < 0.1)
    v = np.where(tail, v + 400, v).astype(np.int64)  # right tail => skew
    pq.write_table(
        pa.table({"source": pa.array(src), "n_chars": pa.array(v)}),
        os.path.join(d, "documents.parquet"),
    )

    sh = QUERIES["source_length_shape"](d).to_pandas().set_index("source")
    for j in range(3):
        g = v[src == f"src{j}"].astype(np.float64)
        m2 = ((g - g.mean()) ** 2).mean()
        m3 = ((g - g.mean()) ** 3).mean()
        m4 = ((g - g.mean()) ** 4).mean()
        row = sh.loc[f"src{j}"]
        gi = v[src == f"src{j}"].astype(object)
        for p, col in ((1, "s1"), (2, "s2"), (3, "s3"), (4, "s4")):
            assert int(row[col]) == int(sum(x**p for x in gi))
        assert abs(float(row["skew"]) - m3 / m2**1.5) < 1e-4
        assert abs(float(row["ex_kurt"]) - (m4 / m2**2 - 3.0)) < 1e-4
    assert float(sh.loc["src2", "skew"]) > 1.0  # planted tail

    bf = QUERIES["source_length_brown_forsythe"](d).to_pandas()
    zs = []
    for j in range(3):
        g = np.sort(v[src == f"src{j}"])
        med = int(g[max(math.ceil(0.5 * len(g)) - 1, 0)])  # quantile_disc rule
        row = bf[bf["source"] == f"src{j}"].iloc[0]
        assert int(row["med"]) == med
        z = np.abs(v[src == f"src{j}"] - med).astype(np.float64)
        assert int(row["sz"]) == int(z.sum())
        assert int(row["szz"]) == int((z**2).sum())
        zs.append(z)
    grand = np.concatenate(zs).mean()
    ssb = sum(len(z) * (z.mean() - grand) ** 2 for z in zs)
    ssw = sum(((z - z.mean()) ** 2).sum() for z in zs)
    f_want = (ssb / 2) / (ssw / (n - 3))
    assert abs(float(bf["f_bf"].iloc[0]) - f_want) < 1e-4
    assert float(bf["f_bf"].iloc[0]) > 10.0  # doubled spread detected


def test_gk_lambda_bruteforce(ray_session):
    """Goodman-Kruskal lambda vs explicit modal-guess error counting
    (deterministic source->lang mapping => lambda(lang|source) = 1
    region exercised separately via a perfect-association fixture)."""
    import collections

    from vaero_ray.pipelines.queries import QUERIES

    rng = _rng()
    n = 4000
    sidx = rng.integers(0, 5, size=n)
    src = np.array([f"src{int(i)}" for i in sidx])
    LANGS = ["en", "fr", "de"]
    lang = np.array(
        [
            LANGS[int(k) % 3] if rng.random() < 0.7 else LANGS[int(rng.integers(0, 3))]
            for k in sidx
        ]
    )
    d = tempfile.mkdtemp()
    pq.write_table(
        pa.table({"source": pa.array(src), "lang": pa.array(lang)}),
        os.path.join(d, "documents.parquet"),
    )
    got = QUERIES["source_lang_lambda"](d).to_pandas().iloc[0]

    joint = collections.Counter(zip(src, lang))
    cs, cl = collections.Counter(src), collections.Counter(lang)
    mr, ms = max(cl.values()), max(cs.values())
    sa = sum(
        max(c for (s2, _), c in joint.items() if s2 == s) for s in cs
    )
    sb = sum(
        max(c for (_, l2), c in joint.items() if l2 == L) for L in cl
    )
    assert int(got["n"]) == n
    assert int(got["max_lang_marginal"]) == mr
    assert int(got["max_source_marginal"]) == ms
    assert int(got["sum_best_lang_per_source"]) == sa
    assert int(got["sum_best_source_per_lang"]) == sb
    assert abs(float(got["lambda_lang_given_source"]) - (sa - mr) / (n - mr)) < 1e-6
    assert abs(float(got["lambda_source_given_lang"]) - (sb - ms) / (n - ms)) < 1e-6
    assert (
        abs(float(got["lambda_symmetric"]) - (sa + sb - mr - ms) / (2 * n - mr - ms))
        < 1e-6
    )
    # 70% deterministic mapping => strong PRE for lang given source
    assert float(got["lambda_lang_given_source"]) > 0.3

    # perfect association: lambda(lang|source) == 1 exactly
    lang2 = np.array([LANGS[int(k) % 3] for k in sidx])
    d2 = tempfile.mkdtemp()
    pq.write_table(
        pa.table({"source": pa.array(src), "lang": pa.array(lang2)}),
        os.path.join(d2, "documents.parquet"),
    )
    got2 = QUERIES["source_lang_lambda"](d2).to_pandas().iloc[0]
    assert float(got2["lambda_lang_given_source"]) == 1.0


def test_cochran_armitage_bruteforce(ray_session):
    """Cochran-Armitage z vs the explicit 2xk formula on a planted
    rising purchase share across hour-of-day."""
    from vaero_ray.pipelines.queries import QUERIES

    rng = _rng()
    n = 8000
    hod = rng.integers(0, 24, size=n)
    is_p = rng.random(n) < (0.05 + 0.01 * hod)  # rising share
    et = np.where(is_p, "purchase", "view")
    day = rng.integers(0, 30, size=n)
    ts = (
        np.datetime64("2026-01-01", "us")
        + (day * 86400 + hod * 3600 + rng.integers(0, 3600, size=n)).astype(
            "timedelta64[s]"
        ).astype("timedelta64[us]")
    )
    d = tempfile.mkdtemp()
    pq.write_table(
        pa.table({"ts": pa.array(ts), "event_type": pa.array(et)}),
        os.path.join(d, "events.parquet"),
    )
    got = QUERIES["hod_purchase_trend"](d).to_pandas().iloc[0]

    n_i = np.array([int(np.sum(hod == h)) for h in range(24)], dtype=np.int64)
    y_i = np.array([int(np.sum((hod == h) & is_p)) for h in range(24)], dtype=np.int64)
    t = np.arange(24, dtype=np.int64)
    N, Y = int(n_i.sum()), int(y_i.sum())
    assert int(got["n"]) == N and int(got["y"]) == Y
    assert int(got["stn"]) == int(np.sum(t * n_i))
    assert int(got["sty"]) == int(np.sum(t * y_i))
    assert int(got["st2n"]) == int(np.sum(t * t * n_i))
    t_stat = float(np.sum(t * y_i)) - Y / N * float(np.sum(t * n_i))
    p = Y / N
    var = p * (1 - p) * (float(np.sum(t * t * n_i)) - float(np.sum(t * n_i)) ** 2 / N)
    assert abs(float(got["t_num"]) - t_stat) < 1e-5
    assert abs(float(got["z"]) - t_stat / math.sqrt(var)) < 1e-6
    assert float(got["z"]) > 5.0  # planted rising trend


def test_bfs_hops_bruteforce(ray_session):
    """bfs_hops vs an explicit queue BFS on a planted multi-component
    graph (chain + clique + isolated pair), incl. the max_hops cutoff."""
    import collections

    import ray.data as rd

    from vaero_ray.stages.graph import bfs_hops

    rng = _rng()
    # chain 0-1-2-...-9, clique 100..104, pair 200-201, random extras
    edges = [(i, i + 1) for i in range(9)]
    edges += [(100 + i, 100 + j) for i in range(5) for j in range(i + 1, 5)]
    edges += [(200, 201)]
    for _ in range(40):
        a, b = int(rng.integers(300, 340)), int(rng.integers(300, 340))
        if a != b:
            edges.append((min(a, b), max(a, b)))
    edges = sorted(set(edges))
    ds = rd.from_arrow(
        pa.table(
            {
                "u": pa.array([e[0] for e in edges], pa.int64()),
                "v": pa.array([e[1] for e in edges], pa.int64()),
            }
        )
    )
    seeds = [0, 100, 305]
    got = bfs_hops(ds, "u", "v", seeds, max_hops=3).to_pandas()
    gm = dict(zip(got["node"].astype(int), got["hop"].astype(int)))

    adj = collections.defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    want = {s: 0 for s in seeds}
    q = collections.deque((s, 0) for s in seeds)
    while q:
        nd, h = q.popleft()
        if h == 3:
            continue
        for nb in adj[nd]:
            if nb not in want:
                want[nb] = h + 1
                q.append((nb, h + 1))
    assert gm == want
    assert gm[3] == 3 and 4 not in gm  # chain cut at max_hops
    assert all(gm[100 + i] <= 1 for i in range(5))  # clique all within 1
    assert 200 not in gm  # unreachable component


def test_bfs_hops_empty_frontier(ray_session):
    """Seeds absent from the edge set terminate immediately with just
    the seed rows."""
    import ray.data as rd

    from vaero_ray.stages.graph import bfs_hops

    ds = rd.from_arrow(
        pa.table({"u": pa.array([1, 2], pa.int64()), "v": pa.array([2, 3], pa.int64())})
    )
    got = bfs_hops(ds, "u", "v", [99], max_hops=3).to_pandas()
    assert list(got["node"]) == [99] and list(got["hop"]) == [0]
