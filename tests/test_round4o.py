"""Session-13 batch: Kaplan-Meier / Nelson-Aalen with right censoring,
the two-group log-rank test, the Jonckheere-Terpstra ordered trend, and
Chao1 / Good-Turing vocabulary richness — brute-force per-subject /
per-pair python oracles on randomized synthetic tables, plus a
permutation Monte-Carlo guard on the JT null-moment formulas."""

import math
import os
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _rng(seed=29):
    return np.random.default_rng(seed)


def _write_events(d, n_users=300, max_ev=8, span_s=5000):
    """Random event histories: every user gets 1..max_ev events at
    random whole-second-ish timestamps; ~55% of users purchase at some
    point, first event is a view for a random subset (the cohort)."""
    rng = _rng()
    rows_uid, rows_ts, rows_ty = [], [], []
    base = 1_700_000_000_000_000  # us epoch
    for u in range(n_users):
        k = int(rng.integers(1, max_ev + 1))
        ts = np.sort(rng.choice(span_s * 1_000_000, size=k, replace=False))
        types = rng.choice(["view", "click", "purchase"], size=k, p=[0.5, 0.3, 0.2])
        if rng.random() < 0.45:  # force a never-purchaser (censored)
            types = np.where(types == "purchase", "click", types)
        rows_uid.extend([u] * k)
        rows_ts.extend((base + ts).tolist())
        rows_ty.extend(types.tolist())
    tbl = pa.table(
        {
            "event_id": pa.array(range(len(rows_uid)), pa.int64()),
            "ts": pa.array(rows_ts, pa.timestamp("us")),
            "user_id": pa.array(rows_uid, pa.int64()),
            "event_type": pa.array(rows_ty, pa.string()),
            "value": pa.array([0.0] * len(rows_uid), pa.float64()),
            "props": pa.array([""] * len(rows_uid), pa.string()),
        }
    )
    pq.write_table(tbl, os.path.join(d, "events.parquet"))
    return (
        np.asarray(rows_uid, np.int64),
        np.asarray(rows_ts, np.int64),
        np.asarray(rows_ty, object),
    )


def _subjects(uid, ts, ty):
    """Brute-force per-subject (duration_s, event, cohort) triples."""
    out = {}
    for u in np.unique(uid):
        sel = uid == u
        t, y = ts[sel], ty[sel]
        t0 = int(t.min())
        pe = t[y == "purchase"]
        ve = t[y == "view"]
        if len(pe):
            dur = (int(pe.min()) - t0) // 1_000_000
            ev = 1
        else:
            dur = (int(t.max()) - t0) // 1_000_000
            ev = 0
        cohort = int(len(ve) > 0 and int(ve.min()) == t0)
        out[int(u)] = (dur, ev, cohort)
    return out


def test_km_curve_bruteforce(ray_session):
    from vaero_ray.pipelines.queries import QUERIES

    d = tempfile.mkdtemp()
    uid, ts, ty = _write_events(d)
    got = QUERIES["km_time_to_purchase"](d).to_pandas()

    subs = _subjects(uid, ts, ty)
    durs = np.array([v[0] for v in subs.values()], np.int64)
    evs = np.array([v[1] for v in subs.values()], np.int64)
    ev_times = np.unique(durs[evs == 1])
    assert list(got["t_sec"]) == list(ev_times)
    s = 1.0
    ch = 0.0
    for i, t in enumerate(ev_times):
        n_risk = int(np.sum(durs >= t))
        dd = int(np.sum((durs == t) & (evs == 1)))
        assert int(got["n_risk"].iloc[i]) == n_risk
        assert int(got["n_event"].iloc[i]) == dd
        s *= 1.0 - dd / n_risk
        ch += dd / n_risk
        assert abs(float(got["surv"].iloc[i]) - s) < 1e-5
        assert abs(float(got["cumhaz"].iloc[i]) - ch) < 1e-5
    # curve is a nonincreasing step function from < 1
    sv = got["surv"].to_numpy()
    assert np.all(np.diff(sv) <= 1e-12) and sv[0] < 1.0
    assert (evs == 0).sum() > 0, "fixture must exercise censoring"


def test_logrank_bruteforce(ray_session):
    from vaero_ray.pipelines.queries import QUERIES

    d = tempfile.mkdtemp()
    uid, ts, ty = _write_events(d, n_users=400)
    got = QUERIES["logrank_purchase_cohorts"](d).to_pandas().set_index("cohort")

    subs = _subjects(uid, ts, ty)
    durs = np.array([v[0] for v in subs.values()], np.int64)
    evs = np.array([v[1] for v in subs.values()], np.int64)
    coh = np.array([v[2] for v in subs.values()], np.int64)
    assert int(got.loc["cohort_first", "n_subj"]) == int(coh.sum())
    assert int(got.loc["other", "n_subj"]) == int((coh == 0).sum())
    o1 = int(np.sum((evs == 1) & (coh == 1)))
    o2 = int(np.sum((evs == 1) & (coh == 0)))
    assert int(got.loc["cohort_first", "n_event"]) == o1
    assert int(got.loc["other", "n_event"]) == o2
    e1 = v = 0.0
    for t in np.unique(durs[evs == 1]):
        at = durs >= t
        n = int(at.sum())
        n1 = int((at & (coh == 1)).sum())
        dd = int(np.sum((durs == t) & (evs == 1)))
        e1 += n1 * dd / n
        if n > 1:
            v += dd * (n1 / n) * (1 - n1 / n) * (n - dd) / (n - 1)
    assert abs(float(got.loc["cohort_first", "expected"]) - e1) < 1e-5
    assert abs(float(got.loc["other", "expected"]) - ((o1 + o2) - e1)) < 1e-5
    chi2 = (o1 - e1) ** 2 / v
    assert abs(float(got["chi2"].iloc[0]) - chi2) < 1e-5
    assert coh.sum() > 20 and (coh == 0).sum() > 20


def _jt_bruteforce(vals, grp):
    """O(n^2) doubled JT: over ordered group pairs, 2*#(x<y) + #(x=y)."""
    order = np.argsort(grp, kind="stable")
    two = 0
    gs = sorted(set(grp))
    by_g = {g: vals[grp == g] for g in gs}
    for i, gi in enumerate(gs):
        for gj in gs[i + 1 :]:
            a, b = by_g[gi], by_g[gj]
            two += 2 * int(np.sum(a[:, None] < b[None, :]))
            two += int(np.sum(a[:, None] == b[None, :]))
    del order
    return two


def test_jonckheere_bruteforce(ray_session):
    from vaero_ray.pipelines.queries import QUERIES

    d = tempfile.mkdtemp()
    rng = _rng(31)
    n = 1200
    src = np.array([f"src{int(i)}" for i in rng.integers(0, 4, size=n)])
    # plant a mild upward trend by group index so z is solidly positive
    gix = np.array([int(s[-1]) for s in src])
    vals = (rng.integers(1, 30, size=n) + 3 * gix).astype(np.int64)
    tbl = pa.table({"source": pa.array(src), "n_chars": pa.array(vals)})
    pq.write_table(tbl, os.path.join(d, "documents.parquet"))
    got = QUERIES["source_length_jonckheere"](d).to_pandas()

    two_jt = _jt_bruteforce(vals, src)
    assert int(got["two_jt"].iloc[0]) == two_jt
    n_js = got.set_index("source")["n_j"]
    for g in sorted(set(src)):
        assert int(n_js.loc[g]) == int(np.sum(src == g))
    # planted trend detected
    assert float(got["z_jt"].iloc[0]) > 3.0
    # exact integer ingredient identities
    n_j = np.array([np.sum(src == g) for g in sorted(set(src))], np.int64)
    _, t_v = np.unique(vals, return_counts=True)
    assert int(got["mean4"].iloc[0]) == n * n - int(np.sum(n_j * n_j))
    assert int(got["c1"].iloc[0]) == int(np.sum(n_j * (n_j - 1)))
    assert int(got["c2"].iloc[0]) == int(np.sum(t_v * (t_v - 1)))


def test_jonckheere_null_moments_montecarlo(ray_session):
    """Permutation guard on the tie-corrected null mean/variance: under
    random relabeling, the empirical JT mean/var must match mean4/4 and
    the Hollander-Wolfe variance closed form (formula-level check that
    no published-constant typo survives)."""
    rng = _rng(37)
    n = 90
    grp = np.repeat(np.arange(3), 30)
    vals = rng.integers(1, 12, size=n).astype(np.int64)  # heavy ties

    def two_jt_of(v, g):
        two = 0
        for i in range(3):
            for j in range(i + 1, 3):
                a, b = v[g == i], v[g == j]
                two += 2 * int(np.sum(a[:, None] < b[None, :]))
                two += int(np.sum(a[:, None] == b[None, :]))
        return two

    sims = np.array(
        [two_jt_of(vals, rng.permutation(grp)) / 2.0 for _ in range(4000)]
    )
    n_j = np.array([30, 30, 30], np.int64)
    _, t_v = np.unique(vals, return_counts=True)
    mean = (n * n - int(np.sum(n_j * n_j))) / 4.0
    a_term = (
        n * (n - 1) * (2 * n + 5)
        - int(np.sum(n_j * (n_j - 1) * (2 * n_j + 5)))
        - int(np.sum(t_v * (t_v - 1) * (2 * t_v + 5)))
    )
    b1 = int(np.sum(n_j * (n_j - 1) * (n_j - 2)))
    b2 = int(np.sum(t_v * (t_v - 1) * (t_v - 2)))
    c1 = int(np.sum(n_j * (n_j - 1)))
    c2 = int(np.sum(t_v * (t_v - 1)))
    var = (
        a_term / 72.0
        + b1 * b2 / (36.0 * n * (n - 1) * (n - 2))
        + c1 * c2 / (8.0 * n * (n - 1))
    )
    assert abs(sims.mean() - mean) < 0.02 * mean
    assert abs(sims.var() - var) < 0.10 * var


def test_vocab_richness_identities(ray_session):
    from vaero_ray.pipelines.queries import QUERIES

    d = tempfile.mkdtemp()
    rng = _rng(41)
    # zipfy corpus with a known singleton tail
    vocab = [f"w{i}" for i in range(200)]
    docs = []
    for _ in range(300):
        k = int(rng.integers(3, 20))
        idx = np.minimum((rng.pareto(1.2, size=k) * 8).astype(int), 199)
        docs.append(" ".join(vocab[i] for i in idx))
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(docs)), pa.int64()),
            "text": pa.array(docs, pa.string()),
        }
    )
    pq.write_table(tbl, os.path.join(d, "documents.parquet"))
    got = QUERIES["vocab_richness"](d).to_pandas().iloc[0]

    from collections import Counter

    cnt = Counter(w for t in docs for w in t.lower().split())
    v = len(cnt)
    ntok = sum(cnt.values())
    f1 = sum(1 for c in cnt.values() if c == 1)
    f2 = sum(1 for c in cnt.values() if c == 2)
    assert int(got["v_terms"]) == v
    assert int(got["n_tokens"]) == ntok
    assert int(got["f1"]) == f1 and int(got["f2"]) == f2
    assert abs(float(got["chao1"]) - (v + f1 * (f1 - 1) / (2.0 * (f2 + 1)))) < 1e-6
    assert abs(float(got["gt_coverage"]) - (1.0 - f1 / ntok)) < 1e-6
    assert float(got["chao1"]) >= v  # estimator never below observed richness


def test_quade_bruteforce(ray_session):
    """Textbook Quade on a small random blocked design: float average
    ranks, range-ranked block weights, S_ij = Q_i*(r_ij - (k+1)/2),
    F = (b-1)B/(A-B) — vs the gate's 4x-scaled integer fold."""
    import pandas as pd

    from vaero_ray.pipelines.queries import QUERIES

    d = tempfile.mkdtemp()
    rng = _rng(43)
    k, hours = 3, 40
    rows_ts, rows_ty = [], []
    base_us = 472_223 * 3_600_000_000  # hour-aligned so block h == bucket hr+h
    types = ["view", "click", "purchase"]
    counts = {}
    for h in range(hours):
        for j, ty in enumerate(types):
            c = int(rng.integers(1, 25))
            counts[(h, ty)] = c
            for _ in range(c):
                rows_ts.append(base_us + h * 3_600_000_000 + int(rng.integers(0, 3_600_000_000)))
                rows_ty.append(ty)
    n = len(rows_ts)
    tbl = pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array(rows_ts, pa.timestamp("us")),
            "user_id": pa.array([0] * n, pa.int64()),
            "event_type": pa.array(rows_ty, pa.string()),
            "value": pa.array([0.0] * n, pa.float64()),
            "props": pa.array([""] * n, pa.string()),
        }
    )
    pq.write_table(tbl, os.path.join(d, "events.parquet"))
    got = QUERIES["hourly_quade"](d).to_pandas().set_index("event_type")

    # textbook reference (float ranks)
    hrs = sorted({base_us // 3_600_000_000 + h for h in range(hours)})
    mat = pd.DataFrame(
        {ty: [counts[(h, ty)] for h in range(hours)] for ty in types},
        index=hrs,
    )
    r = mat.rank(axis=1, method="average")
    q = (mat.max(axis=1) - mat.min(axis=1)).rank(method="average")
    s = (r.sub((k + 1) / 2.0)).mul(q, axis=0)
    a = float((s**2).values.sum())
    sj = s.sum(axis=0)
    bstat = float((sj**2).sum()) / hours
    f = (hours - 1) * bstat / (a - bstat)
    assert int(got["b"].iloc[0]) == hours and int(got["k"].iloc[0]) == k
    for ty in types:
        assert abs(int(got.loc[ty, "s4"]) - 4 * float(sj[ty])) < 1e-9
    assert abs(float(got["f_quade"].iloc[0]) - f) < 1e-5


def test_mcnemar_and_odds_bruteforce(ray_session):
    from vaero_ray.pipelines.queries import QUERIES

    d = tempfile.mkdtemp()
    uid, ts, ty = _write_events(d, n_users=350)
    mcn = QUERIES["user_halves_mcnemar"](d).to_pandas().iloc[0]
    odd = QUERIES["cohort_conversion_odds"](d).to_pandas().iloc[0]

    mid = (int(ts.min()) + int(ts.max())) // 2
    n11 = bb = cc = 0
    a = b = c = dd = 0
    for u in np.unique(uid):
        sel = uid == u
        t, y = ts[sel], ty[sel]
        a1, a2 = bool(t.min() < mid), bool(t.max() >= mid)
        n11 += a1 and a2
        bb += a1 and not a2
        cc += (not a1) and a2
        ve = t[y == "view"]
        coh = len(ve) > 0 and int(ve.min()) == int(t.min())
        conv = bool((y == "purchase").any())
        a += coh and conv
        b += coh and not conv
        c += (not coh) and conv
        dd += (not coh) and not conv
    assert int(mcn["n_both"]) == n11
    assert int(mcn["b_then_not"]) == bb and int(mcn["c_not_then"]) == cc
    assert abs(float(mcn["chi2"]) - (bb - cc) ** 2 / (bb + cc)) < 1e-6
    assert int(odd["a_conv"]) == a and int(odd["b_noconv"]) == b
    assert int(odd["c_conv"]) == c and int(odd["d_noconv"]) == dd
    want_or = ((a + 0.5) * (dd + 0.5)) / ((b + 0.5) * (c + 0.5))
    assert abs(float(odd["odds_ratio"]) - want_or) < 1e-5
    assert float(odd["ci_lo"]) < float(odd["odds_ratio"]) < float(odd["ci_hi"])


def test_bm25_bruteforce(ray_session):
    """Textbook Okapi BM25 (float k1=1.2, b=0.75, avgdl division) on a
    small corpus vs the gate's integer-rational formulation — scores
    must agree to fp tolerance and the ranking exactly."""
    from vaero_ray.pipelines.queries import QUERIES

    d = tempfile.mkdtemp()
    rng = _rng(47)
    vocab = ["hash", "join", "stream", "alpha", "beta", "gamma", "delta"]
    docs = []
    for _ in range(400):
        k = int(rng.integers(2, 40))
        docs.append(" ".join(rng.choice(vocab, size=k, p=[0.08, 0.06, 0.04, 0.3, 0.2, 0.2, 0.12])))
    tbl = pa.table(
        {"doc_id": pa.array(range(len(docs)), pa.int64()),
         "text": pa.array(docs, pa.string())}
    )
    pq.write_table(tbl, os.path.join(d, "documents.parquet"))
    got = QUERIES["bm25_top_docs"](d).to_pandas()

    terms = ["hash", "join", "stream"]
    toks = [t.lower().split() for t in docs]
    n = len(docs)
    ntok = sum(len(t) for t in toks)
    avgdl = ntok / n
    dfs = {q: sum(1 for t in toks if q in t) for q in terms}
    k1, b = 1.2, 0.75
    scores = []
    for i, t in enumerate(toks):
        s = 0.0
        for q in terms:
            tf = t.count(q)
            if tf == 0:
                continue
            idf = math.log((n - dfs[q] + 0.5) / (dfs[q] + 0.5) + 1.0)
            s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(t) / avgdl))
        scores.append((s, i))
    scores.sort(key=lambda x: (-x[0], x[1]))
    want = scores[:10]
    assert list(got["doc_id"]) == [i for _, i in want]
    for (ws, _), gs in zip(want, got["score"]):
        assert abs(ws - float(gs)) < 1e-6
    assert float(got["score"].iloc[0]) > 0
