"""Session-13 batch 1: Wasserstein-1 / Hellinger two-sample distance
and paired-halves Cohen's kappa — brute-force python/scipy-free oracles
on randomized synthetic inputs."""

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd


def _rng(seed=31):
    return np.random.default_rng(seed)


def _merged_counts(v1, v2):
    """Build the (v, c1, c2) compressed-counts Dataset the stage
    contracts expect, split across several blocks."""
    rows = []
    for v in v1:
        rows.append({"v": int(v), "c1": 1, "c2": 0})
    for v in v2:
        rows.append({"v": int(v), "c1": 0, "c2": 1})
    df = pd.DataFrame(rows).groupby("v", as_index=False).sum()
    return rd.from_pandas(df).repartition(4)


def _w1_brute(v1, v2):
    """O(n^2)-free brute force: integrate |F1 - F2| over the union grid."""
    v1, v2 = np.sort(v1), np.sort(v2)
    grid = np.unique(np.concatenate([v1, v2]))
    f1 = np.searchsorted(v1, grid, side="right") / len(v1)
    f2 = np.searchsorted(v2, grid, side="right") / len(v2)
    return float(np.sum(np.abs(f1 - f2)[:-1] * np.diff(grid)))


def test_emd_matches_bruteforce(ray_session):
    from vaero_ray.stages.numstats import emd_two_sample

    rng = _rng()
    for trial in range(5):
        v1 = rng.integers(0, 400, size=int(rng.integers(5, 300)))
        v2 = rng.integers(50, 500, size=int(rng.integers(5, 300)))
        out = emd_two_sample(_merged_counts(v1, v2), "v").to_pylist()[0]
        assert out["n1"] == len(v1) and out["n2"] == len(v2)
        expect = _w1_brute(v1, v2)
        assert math.isclose(out["w1"], expect, rel_tol=1e-9, abs_tol=1e-12), (
            trial, out["w1"], expect
        )
        # integer numerator consistent with the float
        assert out["w1"] == out["w1_num"] / (len(v1) * len(v2))


def test_emd_hellinger_bounds_and_identity(ray_session):
    from vaero_ray.stages.numstats import emd_two_sample

    rng = _rng(7)
    v = rng.integers(0, 100, size=200)
    out = emd_two_sample(_merged_counts(v, v), "v").to_pylist()[0]
    # identical samples: zero distance, affinity 1
    assert out["w1_num"] == 0 and out["w1"] == 0.0
    assert out["bc"] == 1.0 and out["hellinger"] == 0.0
    # disjoint supports: bc 0, hellinger 1
    out2 = emd_two_sample(
        _merged_counts(np.arange(10), np.arange(100, 110)), "v"
    ).to_pylist()[0]
    assert out2["bc"] == 0.0 and out2["hellinger"] == 1.0
    assert out2["w1"] == 100.0  # shift-by-100 point masses


def _kappa_brute(df):
    """Per-user python loop oracle for paired_halves_kappa."""
    m1m2 = []
    for _, g in df.sort_values(["user_id", "ts", "event_id"]).groupby("user_id"):
        n = len(g)
        if n < 2:
            continue
        cut = (n + 1) // 2
        halves = (g.iloc[:cut], g.iloc[cut:])
        modal = []
        for h in halves:
            cnt = h.groupby("event_type").size()
            top = cnt[cnt == cnt.max()].index.min()  # ties -> lexic. smallest
            modal.append(top)
        m1m2.append(tuple(modal))
    n = len(m1m2)
    agree = sum(1 for a, b in m1m2 if a == b)
    rows = pd.Series([a for a, _ in m1m2]).value_counts()
    cols = pd.Series([b for _, b in m1m2]).value_counts()
    pe_num = sum(int(rows.get(k, 0)) * int(cols.get(k, 0))
                 for k in set(rows.index) | set(cols.index))
    return n, agree, pe_num


def test_paired_halves_kappa_matches_bruteforce(ray_session):
    from vaero_ray.stages.numstats import paired_halves_kappa

    rng = _rng(11)
    rows = []
    eid = 0
    for u in range(120):
        k = int(rng.integers(1, 9))
        ts = np.sort(rng.choice(10_000, size=k, replace=False))
        for t in ts:
            rows.append(
                {"user_id": u, "ts": int(t), "event_id": eid,
                 "event_type": str(rng.choice(["a", "b", "c"]))}
            )
            eid += 1
    df = pd.DataFrame(rows)
    out = paired_halves_kappa(
        rd.from_pandas(df).repartition(6), "user_id", "ts", "event_id",
        "event_type", num_buckets=8,
    ).to_pylist()[0]
    n, agree, pe_num = _kappa_brute(df)
    assert out["n_keys"] == n and out["agree"] == agree and out["pe_num"] == pe_num
    assert out["kappa_num"] == agree * n - pe_num
    assert out["kappa_den"] == n * n - pe_num
    assert out["kappa"] == (agree * n - pe_num) / (n * n - pe_num)


def test_paired_halves_kappa_edge_cases(ray_session):
    from vaero_ray.stages.numstats import paired_halves_kappa

    # all single-event users -> empty design, null kappa
    df = pd.DataFrame(
        {"user_id": range(5), "ts": range(5), "event_id": range(5),
         "event_type": ["a"] * 5}
    )
    out = paired_halves_kappa(
        rd.from_pandas(df), "user_id", "ts", "event_id", "event_type", num_buckets=4
    ).to_pylist()[0]
    assert out["n_keys"] == 0 and out["kappa"] is None
    # perfect agreement, single category: kappa degenerate (den==0 -> null)
    df2 = pd.DataFrame(
        {"user_id": [1, 1, 2, 2], "ts": [0, 1, 0, 1], "event_id": [0, 1, 2, 3],
         "event_type": ["a", "a", "a", "a"]}
    )
    out2 = paired_halves_kappa(
        rd.from_pandas(df2), "user_id", "ts", "event_id", "event_type", num_buckets=4
    ).to_pylist()[0]
    assert out2["n_keys"] == 2 and out2["agree"] == 2
    assert out2["kappa_den"] == 0 and out2["kappa"] is None


# ---------------- batch 2: basket link prediction ----------------

def _rand_baskets(rng, n_groups=80, max_items=8, domain=30):
    rows = []
    for g in range(n_groups):
        k = int(rng.integers(1, max_items + 1))
        for it in rng.choice(domain, size=k, replace=False):
            rows.append({"g": g, "it": int(it)})
            if rng.random() < 0.2:  # duplicate (group, item) rows: DISTINCT semantics
                rows.append({"g": g, "it": int(it)})
    return pd.DataFrame(rows)


def test_adamic_adar_matches_bruteforce(ray_session):
    from vaero_ray.stages.basket import adamic_adar_pairs

    rng = _rng(13)
    df = _rand_baskets(rng)
    out = adamic_adar_pairs(
        rd.from_pandas(df).repartition(5), "g", "it", top_k=10, num_buckets=8
    ).to_pandas()
    # brute force
    import collections
    groups = df.drop_duplicates().groupby("g")["it"].apply(sorted)
    scores = collections.defaultdict(lambda: [0, 0])
    for items in groups:
        if len(items) < 2:
            continue
        wt = int(np.floor(1e12 / np.log(len(items)) + 0.5))
        for i in range(len(items)):
            for j in range(i + 1, len(items)):
                s = scores[(items[i], items[j])]
                s[0] += wt
                s[1] += 1
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1][0], kv[0]))[:10]
    assert len(out) == min(10, len(ranked))
    for row, (pair, (micro, common)) in zip(out.itertuples(), ranked):
        assert (row.item_a, row.item_b) == pair
        assert row.aa_micro == micro and row.common_groups == common
        assert row.aa == micro / 1e12


def test_pair_lift_matches_bruteforce(ray_session):
    from vaero_ray.stages.basket import pair_lift

    rng = _rng(17)
    df = _rand_baskets(rng, n_groups=120, max_items=6, domain=12)
    out = pair_lift(
        rd.from_pandas(df).repartition(5), "g", "it",
        min_support=3, top_k=8, num_buckets=8,
    ).to_pandas()
    dd = df.drop_duplicates()
    n_groups = dd["g"].nunique()
    cnt = dd.groupby("it")["g"].nunique()
    import collections
    sup = collections.Counter()
    for _, items in dd.groupby("g")["it"].apply(sorted).items():
        for i in range(len(items)):
            for j in range(i + 1, len(items)):
                sup[(items[i], items[j])] += 1
    cands = [
        (a, b, s, s * n_groups, int(cnt[a]) * int(cnt[b]))
        for (a, b), s in sup.items() if s >= 3
    ]
    cands.sort(key=lambda t: (-(t[3] / t[4]), t[0], t[1]))
    for row, (a, b, s, num, den) in zip(out.itertuples(), cands[:8]):
        assert (row.item_a, row.item_b, row.support) == (a, b, s)
        assert (row.lift_num, row.lift_den) == (num, den)
        assert row.lift == num / den


def test_degree_assortativity_matches_bruteforce(ray_session):
    from vaero_ray.stages.basket import pair_cooccurrence
    from vaero_ray.stages.graph import degree_assortativity

    rng = _rng(19)
    df = _rand_baskets(rng, n_groups=60, max_items=5, domain=25)
    edges_ds = pair_cooccurrence(
        rd.from_pandas(df).repartition(4), "g", "it", num_buckets=8
    ).drop_columns(["support"])
    out = degree_assortativity(edges_ds).to_pylist()[0]
    edges = set()
    for _, items in df.drop_duplicates().groupby("g")["it"].apply(sorted).items():
        for i in range(len(items)):
            for j in range(i + 1, len(items)):
                edges.add((items[i], items[j]))
    import collections
    deg = collections.Counter()
    for a, b in edges:
        deg[a] += 1
        deg[b] += 1
    xs, ys = [], []
    for a, b in edges:
        xs += [deg[a], deg[b]]
        ys += [deg[b], deg[a]]
    xs, ys = np.array(xs, np.int64), np.array(ys, np.int64)
    n = len(xs)
    sx, sxx, sxy = int(xs.sum()), int((xs * xs).sum()), int((xs * ys).sum())
    assert (out["n"], out["sx"], out["sxx"], out["sxy"]) == (n, sx, sxx, sxy)
    r_num, r_den = n * sxy - sx * sx, n * sxx - sx * sx
    assert out["r_num"] == r_num and out["r_den"] == r_den
    assert out["assortativity"] == (r_num / r_den if r_den else None)


# ---------------- batch 3: seasonality + chain entropy ----------------

def test_daily_cycle_bruteforce_and_flat(ray_session):
    from vaero_ray.stages.numstats import daily_cycle_per_group

    rng = _rng(23)
    # concentrated type: all events at hod 9; flat type: uniform over 24h
    base = pd.Timestamp("2024-01-01")
    rows = []
    for i in range(240):
        rows.append({"k": "peaky", "ts": base + pd.Timedelta(hours=9, days=i)})
    for i in range(240):
        rows.append({"k": "flat", "ts": base + pd.Timedelta(hours=i % 24, days=i // 24)})
    df = pd.DataFrame(rows)
    out = daily_cycle_per_group(
        rd.from_pandas(df).repartition(4), "k", "ts"
    ).to_pandas().set_index("k")
    assert out.loc["flat", "rel_amp"] == 0.0  # exact cancellation over a full period
    assert abs(out.loc["peaky", "rel_amp"] - 2.0) < 1e-9  # 2*amp/n with amp=n
    # brute force a random profile
    hods = rng.integers(0, 24, size=500)
    df2 = pd.DataFrame({"k": "r", "ts": [base + pd.Timedelta(hours=int(h)) for h in hods]})
    got = daily_cycle_per_group(rd.from_pandas(df2).repartition(3), "k", "ts").to_pylist()[0]
    ang = (2.0 * math.pi * hods.astype(np.float64)) / 24.0
    a1, b1 = float(np.cos(ang).sum()), float(np.sin(ang).sum())
    assert abs(got["a1"] - round(a1, 6)) <= 1e-6 and abs(got["b1"] - round(b1, 6)) <= 1e-6
    assert abs(got["amp"] - round(math.sqrt(a1 * a1 + b1 * b1), 6)) <= 1e-6


def test_markov_entropy_bruteforce(ray_session):
    from vaero_ray.stages.cep import transition_counts
    from vaero_ray.stages.numstats import markov_entropy

    rng = _rng(29)
    rows = []
    eid = 0
    for u in range(60):
        k = int(rng.integers(2, 10))
        for t in range(k):
            rows.append({"user_id": u, "ts": t, "event_type": str(rng.choice(list("abc"))),
                         "event_id": eid})
            eid += 1
    df = pd.DataFrame(rows)
    cells = transition_counts(
        rd.from_pandas(df).repartition(4), "user_id", "ts", "event_type", "event_id",
        num_buckets=8,
    )
    out = markov_entropy(cells.select(["prev", "cur", "n"])).to_pylist()[0]
    # brute force transitions
    import collections
    cnt = collections.Counter()
    for _, g in df.sort_values(["user_id", "ts", "event_id"]).groupby("user_id"):
        seq = g["event_type"].tolist()
        for a, b in zip(seq, seq[1:]):
            cnt[(a, b)] += 1
    nn = sum(cnt.values())
    ra = collections.Counter()
    mb = collections.Counter()
    for (a, b), c in cnt.items():
        ra[a] += c
        mb[b] += c
    h_cond = -sum((c / nn) * math.log(c / ra[a]) for (a, b), c in cnt.items())
    h_next = -sum((c / nn) * math.log(c / nn) for c in mb.values())
    assert out["n_trans"] == nn and out["n_cells"] == len(cnt)
    assert abs(out["h_cond"] - h_cond) < 1e-6
    assert abs(out["h_next"] - h_next) < 1e-6
    assert abs(out["mi"] - (h_next - h_cond)) < 1e-6
    # deterministic chain: zero conditional entropy, positive mi
    det = pd.DataFrame(
        {"user_id": 0, "ts": range(30), "event_id": range(30),
         "event_type": ["a", "b", "c"] * 10}
    )
    cells2 = transition_counts(
        rd.from_pandas(det), "user_id", "ts", "event_type", "event_id", num_buckets=4
    )
    out2 = markov_entropy(cells2.select(["prev", "cur", "n"])).to_pylist()[0]
    assert out2["h_cond"] == 0.0 and out2["mi"] == out2["h_next"]


# ---------------- batch 4: containment dedup ----------------

def _char_grams(text, k=5):
    if len(text) < k:
        return {text + " " * (k - len(text))}
    return {text[i:i + k] for i in range(len(text) - k + 1)}


def test_containment_finds_planted_quote(ray_session):
    from vaero_ray.stages.dedup import ngram_containment_dups

    rng = _rng(37)
    vocab = ["alpha", "bravo", "crate", "delta", "ember", "fjord", "gamma"]
    docs = []
    for i in range(40):
        docs.append(" ".join(rng.choice(vocab, size=60)))
    quote = docs[7][40:160]  # a 120-char span of doc 7
    docs.append(quote)  # doc 40 is contained in doc 7
    tbl = pa.table({"doc_id": pa.array(range(len(docs)), pa.int64()),
                    "text": pa.array(docs, pa.string())})
    out = ngram_containment_dups(
        rd.from_arrow(tbl).repartition(4), containment_num=4, containment_den=5,
        num_shards=8, pair_buckets=4,
    ).to_pandas()
    pairs = set(zip(out["doc_id"], out["dup_of"]))
    assert (40, 7) in pairs
    # brute force with the SAME capped semantics (df <= 256 trivially holds here)
    grams = [_char_grams(d) for d in docs]
    import collections
    df_cnt = collections.Counter(g for s in grams for g in s)
    kept = [{g for g in s if df_cnt[g] <= 256} for s in grams]
    expect = set()
    for a in range(len(docs)):
        for b in range(a):
            inter = len(kept[a] & kept[b])
            small = min(len(kept[a]), len(kept[b]))
            if small and 5 * inter >= 4 * small:
                expect.add((a, b))
    assert pairs == expect
    # exact intersection counts match
    for row in out.itertuples():
        assert row.n_common == len(kept[row.doc_id] & kept[row.dup_of])
        assert row.n_small == min(len(kept[row.doc_id]), len(kept[row.dup_of]))


def test_containment_stop_gram_cap(ray_session):
    from vaero_ray.stages.dedup import ngram_containment_dups

    # every doc shares one boilerplate prefix; cap at df<=3 removes its
    # grams, so only the planted near-identical pair survives
    boiler = "COMMON HEADER TEXT " * 3
    docs = [boiler + f"unique tail {i} " + "x" * i for i in range(8)]
    docs.append(docs[3])  # exact dup of doc 3
    tbl = pa.table({"doc_id": pa.array(range(len(docs)), pa.int64()),
                    "text": pa.array(docs, pa.string())})
    out = ngram_containment_dups(
        rd.from_arrow(tbl).repartition(2), containment_num=9, containment_den=10,
        max_postings=3, num_shards=4, pair_buckets=2,
    ).to_pandas()
    pairs = set(zip(out["doc_id"], out["dup_of"]))
    assert (8, 3) in pairs
    # boilerplate alone must not pair unrelated docs at the 0.9 bar
    assert all((a, b) == (8, 3) for a, b in pairs)


# ---------------- batch 5: RRF fusion + set-containment join ----------------

def test_rrf_fusion_bruteforce(ray_session):
    """Brute-force both rankers in python and check the fused top-k."""
    from vaero_ray.stages.textstats import rrf_topk_docs

    rng = _rng(41)
    vocab = ["hash", "join", "stream", "filler", "noise", "pad"]
    docs = [" ".join(rng.choice(vocab, size=int(rng.integers(5, 40))))
            for _ in range(120)]
    tbl = pa.table({"doc_id": pa.array(range(len(docs)), pa.int64()),
                    "text": pa.array(docs, pa.string())})
    terms = ["hash", "join", "stream"]
    n_docs = len(docs)
    ntok = sum(len(d.split()) for d in docs)
    out = rrf_topk_docs(
        rd.from_arrow(tbl).repartition(4), terms, n_docs, ntok, k=10
    ).to_pandas()
    # brute force
    import collections
    tf = [collections.Counter(d.split()) for d in docs]
    dfs = {t: sum(1 for c in tf if c[t] > 0) for t in terms}
    idf = {t: math.log((n_docs - dfs[t] + 0.5) / (dfs[t] + 0.5) + 1.0) for t in terms}
    w = {t: (1000 * n_docs) // max(dfs[t], 1) for t in terms}
    cands = [i for i in range(n_docs) if any(tf[i][t] for t in terms)]
    s_int, s_bm = {}, {}
    for i in cands:
        dl = len(docs[i].split())
        si, sb = 0, 0.0
        for t in sorted(terms):
            f = tf[i][t]
            si += f * w[t]
            den = float(10 * f * ntok + 3 * ntok + 9 * dl * n_docs)
            sb = sb + idf[t] * (((22.0 * f) * ntok) / den)
        s_int[i], s_bm[i] = si, sb
    ra = {d: r + 1 for r, d in enumerate(sorted(cands, key=lambda d: (-s_int[d], d)))}
    rb = {d: r + 1 for r, d in enumerate(sorted(cands, key=lambda d: (-s_bm[d], d)))}
    fused = {
        d: int(np.floor(1e9 / (60 + ra[d]) + 0.5)) + int(np.floor(1e9 / (60 + rb[d]) + 0.5))
        for d in cands
    }
    expect = sorted(cands, key=lambda d: (-fused[d], d))[:10]
    assert out["doc_id"].tolist() == expect
    for row in out.itertuples():
        assert row.rank_tfidf == ra[row.doc_id] and row.rank_bm25 == rb[row.doc_id]
        assert row.rrf_nano == fused[row.doc_id]
        assert row.rrf == fused[row.doc_id] / 1e9


def test_set_containment_pairs_bruteforce(ray_session):
    from vaero_ray.stages.dedup import set_containment_pairs

    rng = _rng(43)
    df = _rand_baskets(rng, n_groups=100, max_items=7, domain=20)
    out = set_containment_pairs(
        rd.from_pandas(df.rename(columns={"g": "grp", "it": "item"})).repartition(4),
        "grp", "item", containment_num=2, containment_den=3, min_common=2,
        num_shards=8, pair_buckets=4,
    ).to_pandas()
    sets = df.drop_duplicates().groupby("g")["it"].apply(set)
    expect = {}
    keys = sorted(sets.index)
    for i, a in enumerate(keys):
        for b in keys[:i]:
            inter = len(sets[a] & sets[b])
            small = min(len(sets[a]), len(sets[b]))
            if inter >= 2 and 3 * inter >= 2 * small:
                expect[(a, b)] = (inter, small)
    got = {(r.grp, r.dup_of): (r.n_common, r.n_small) for r in out.itertuples()}
    assert got == expect


# ---------------- batch 6: FK audit, Hill alpha, embedding Gram ----------------

def test_hill_alpha_recovers_planted_exponent(ray_session):
    from vaero_ray.stages.numstats import hill_alpha

    rng = _rng(47)
    # discrete samples from a Pareto(alpha=2.5) tail, xmin=5
    alpha_true = 2.5
    x = np.floor(5.0 * (1.0 - rng.random(60_000)) ** (-1.0 / (alpha_true - 1.0))).astype(np.int64)
    cells = pd.DataFrame({"v": x}).groupby("v", as_index=False).size().rename(
        columns={"size": "c"}
    )
    out = hill_alpha(rd.from_pandas(cells).repartition(3), "v", xmin=5).to_pylist()[0]
    assert out["n_tail"] == len(x)
    assert abs(out["alpha"] - alpha_true) < 0.15  # MLE consistency at 60k samples
    # brute-force identity on the exact fold
    lnsum = float(np.sum(np.log(np.sort(x) / 5.0)))
    assert abs(out["alpha"] - round(1.0 + len(x) / lnsum, 6)) <= 2e-6


def test_hill_alpha_empty_tail(ray_session):
    from vaero_ray.stages.numstats import hill_alpha

    cells = pd.DataFrame({"v": [1, 2, 3], "c": [5, 5, 5]})
    out = hill_alpha(rd.from_pandas(cells), "v", xmin=10).to_pylist()[0]
    assert out["n_tail"] == 0 and out["alpha"] is None


def test_embedding_gram_matches_numpy(ray_session):
    from vaero_ray.stages.ann import embedding_gram

    rng = _rng(53)
    n, d = 200, 8
    m = rng.normal(size=(n, d)).astype(np.float32)
    tbl = pa.table(
        {"embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(m.reshape(-1), pa.float32()), d)}
    )
    out = embedding_gram(rd.from_arrow(tbl).repartition(5), "embedding").to_pandas()
    micro = np.floor(m.astype(np.float64) * 1e6 + 0.5).astype(np.int64)
    g = micro.T @ micro
    assert len(out) == d * (d + 1) // 2
    for row in out.itertuples():
        assert row.gram_micro2 == g[row.i - 1, row.j - 1]
        assert row.n_vecs == n
        assert row.gram == g[row.i - 1, row.j - 1] / 1e12


def test_referential_integrity_detects_planted_orphans(ray_session, tmp_path):
    import pyarrow.parquet as pq2
    from vaero_ray.pipelines.queries import q_referential_integrity

    src = "/root/testdata/sf0.001"
    import shutil
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        shutil.copy(f"{src}/{t}.parquet", tmp_path / f"{t}.parquet")
    # plant 3 orphan lineitem rows pointing at a nonexistent order
    li = pq2.read_table(tmp_path / "lineitem.parquet")
    extra = li.slice(0, 3).to_pandas()
    extra["l_orderkey"] = [999_999_001, 999_999_001, 999_999_002]
    pq2.write_table(
        pa.concat_tables([li, pa.Table.from_pandas(extra, schema=li.schema)]),
        tmp_path / "lineitem.parquet",
    )
    out = q_referential_integrity(str(tmp_path)).to_pandas().set_index("fk")
    row = out.loc["lineitem.l_orderkey->orders"]
    assert row["n_orphan_rows"] == 3 and row["n_orphan_keys"] == 2
    assert row["n_rows"] == li.num_rows + 3
    # untouched FKs stay clean
    assert out.loc["orders.o_custkey->customer", "n_orphan_rows"] == 0


# ---------------- batch 7: ML-eval operators ----------------

def test_label_silhouette_separated_vs_mixed(ray_session):
    from vaero_ray.stages.ann import label_silhouette

    rng = _rng(59)
    d = 6
    # well-separated clusters -> silhouette near 1
    a = rng.normal(0, 0.05, size=(150, d)) + np.r_[np.ones(3), np.zeros(3)]
    b = rng.normal(0, 0.05, size=(150, d)) - np.r_[np.zeros(3), np.ones(3)]
    m = np.vstack([a, b]).astype(np.float32)
    lab = np.r_[np.zeros(150, np.int32), np.ones(150, np.int32)]
    tbl = pa.table(
        {"embedding": pa.FixedSizeListArray.from_arrays(pa.array(m.reshape(-1), pa.float32()), d),
         "label": pa.array(lab, pa.int32())}
    )
    out = label_silhouette(rd.from_arrow(tbl).repartition(4)).to_pandas()
    assert set(out["label"]) == {0, 1}
    assert (out["mean_sil"] > 0.8).all()
    # random labels on one blob -> silhouette near 0 (can be slightly negative)
    lab2 = rng.integers(0, 2, size=300).astype(np.int32)
    tbl2 = tbl.set_column(1, "label", pa.array(lab2, pa.int32()))
    out2 = label_silhouette(rd.from_arrow(tbl2).repartition(4)).to_pandas()
    assert (out2["mean_sil"].abs() < 0.4).all()
    # exact identity vs a brute-force recomputation of the same formula
    cents = {}
    for lv in (0, 1):
        micro = np.floor(m[lab2 == lv].astype(np.float64) * 1e6 + 0.5)
        cents[lv] = micro.sum(axis=0) / (float((lab2 == lv).sum()) * 1e6)
    x = np.floor(m.astype(np.float64) * 1e6 + 0.5) / 1e6
    sums = {0: 0, 1: 0}
    for i in range(300):
        da = {lv: math.sqrt(float(((x[i] - cents[lv]) ** 2).sum())) for lv in (0, 1)}
        own = int(lab2[i])
        aa, bb = da[own], da[1 - own]
        mx = max(aa, bb)
        s = (bb - aa) / mx if mx > 0 else 0.0
        sums[own] += int(np.floor(s * 1_000_000 + 0.5))
    got = dict(zip(out2["label"], out2["sum_sil_micro"]))
    # brute force sums dims in a different association; allow 1-micro slack per vec
    for lv in (0, 1):
        assert abs(got[lv] - sums[lv]) <= 300


def test_bm25_ndcg_perfect_when_ranking_matches_relevance(ray_session):
    from vaero_ray.stages.textstats import bm25_ndcg

    # corpus where coverage and BM25 agree: docs with all 3 terms rank first
    docs = (["hash join stream"] * 3 + ["hash join x"] * 4
            + ["hash y z"] * 5 + ["plain filler text"] * 8)
    tbl = pa.table({"doc_id": pa.array(range(len(docs)), pa.int64()),
                    "text": pa.array(docs, pa.string())})
    ntok = sum(len(d.split()) for d in docs)
    out = bm25_ndcg(
        rd.from_arrow(tbl).repartition(3), ["hash", "join", "stream"],
        len(docs), ntok, k=10,
    ).to_pylist()[0]
    assert out["n_candidates"] == 12
    assert out["ndcg"] == 1.0  # ranking order equals relevance order
    # sanity: dcg equals the hand-computed ideal over rels [3,3,3,2,2,2,2,1,1,1]
    rels = [3, 3, 3, 2, 2, 2, 2, 1, 1, 1]
    idcg = sum((2.0 ** r - 1.0) / np.log2(i + 2.0) for i, r in enumerate(rels))
    assert abs(out["idcg"] - round(idcg, 6)) <= 1e-6


# ---------------- batch 8: perplexity filter + lang confusion ----------------

def test_unigram_xent_bruteforce(ray_session):
    from vaero_ray.stages.textstats import unigram_xent

    rng = _rng(61)
    vocab = [f"w{i}" for i in range(50)]
    docs = [" ".join(rng.choice(vocab, size=int(rng.integers(3, 30))))
            for _ in range(80)] + [""]
    tbl = pa.table({"doc_id": pa.array(range(len(docs)), pa.int64()),
                    "text": pa.array(docs, pa.string())})
    out = unigram_xent(
        rd.from_arrow(tbl).repartition(4), top_v=20
    ).to_pandas().set_index("doc_id").sort_index()
    # brute force with identical quantization
    import collections
    cnt = collections.Counter(t for d in docs for t in d.split())
    n_total = sum(cnt.values())
    top = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    denom = float(n_total + 21)
    lp = {t: int(np.floor(math.log((c + 1) / denom) * 1e9 + 0.5)) for t, c in top}
    oov_c = n_total - sum(c for _, c in top)
    lp_oov = int(np.floor(math.log((oov_c + 1) / denom) * 1e9 + 0.5))
    for i, d in enumerate(docs):
        toks = d.split()
        s = sum(lp.get(t, lp_oov) for t in toks)
        assert out.loc[i, "n_toks"] == len(toks)
        assert out.loc[i, "sum_lp_nano"] == s
        if toks:
            assert out.loc[i, "xent"] == -s / (len(toks) * 1e9)
        else:
            assert np.isnan(out.loc[i, "xent"]) or out.loc[i, "xent"] is None
    # a gibberish doc must score higher xent than a common-word doc
    docs2 = ["the the the the the"] * 50 + ["zzq qqz zqz qzz zzz"]
    tbl2 = pa.table({"doc_id": pa.array(range(len(docs2)), pa.int64()),
                     "text": pa.array(docs2, pa.string())})
    o2 = unigram_xent(rd.from_arrow(tbl2), top_v=3).to_pandas().set_index("doc_id")
    assert o2.loc[50, "xent"] > o2.loc[0, "xent"]


def test_lang_confusion_cells_sum_to_corpus(ray_session):
    from vaero_ray.pipelines.queries import q_lang_confusion_matrix

    out = q_lang_confusion_matrix("/root/testdata/sf0.001").to_pandas()
    assert out["n"].sum() == 500
    # the stopword classifier beats the 1/5 chance rate (the synthetic
    # lorem corpus keeps absolute accuracy modest: 177/500 here)
    diag = out[out["true_lang"] == out["pred_lang"]]["n"].sum()
    assert diag > 100
