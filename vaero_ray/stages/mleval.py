"""Model-evaluation operators over compressed (score, pos, neg) cells.

The classifier-eval tier a training-data pipeline needs once it starts
scoring documents/users with a model: exact ROC AUC, a full
precision/recall curve over every decision threshold, and range-bucket
lift — all computed from ONE compressed exchange.

Scale shape (the whole point): the raw stream (events at 100 TB) is
collapsed per-block to per-key partials inside ``map_batches``, merged
once by ``bucketed_keyed_sum`` (the only keyed exchange), and then
re-compressed to (score, pos, neg) CELLS — one row per distinct score
value. Every metric below is a function of the cells alone, so the
finalizers run over thousands of rows regardless of input size. This
requires an integer (or quantized) score domain; for continuous model
scores, quantize to fixed micro-units first (house convention, see
ann.label_centroid_sums) so the cell count stays bounded and the math
stays order/shard-exact.

AUC is the exact rank-statistic form: with cells sorted ascending by
score, ``auc_num2 = sum_i pos_i * (2 * cumneg_below_i + neg_i)`` counts
concordant pairs twice and ties once, so ``AUC = auc_num2 / (2 * P * N)``
equals P(score_pos > score_neg) + 0.5 * P(tie) with no sampling and no
per-pair work — the cells make it O(distinct scores).

No reference counterpart (the reference has no eval/metric surface at
all); the tier is mandated by the training-data extension goals.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from vaero_ray.stages.keyed import bucketed_keyed_sum


def user_score_label_cells(ds: rd.Dataset) -> pd.DataFrame:
    """Per-user (score = view count, label = purchase count above the
    corpus lower-median) compressed to (score, pos, neg) cells —
    the MARGINAL of :func:`user_two_score_cells` over its first score
    (same exchange implementation, same label rule; the joint cell
    table is tiny, so marginalizing costs nothing and keeps one code
    path for every cell-family gate)."""
    j = user_two_score_cells(ds)
    cells = (j.rename(columns={"s1": "score"})
              .groupby("score", as_index=False)[["pos", "neg"]].sum())
    return cells.sort_values("score").reset_index(drop=True)


def roc_auc(cells: pd.DataFrame) -> pa.Table:
    """Exact AUC from sorted (score, pos, neg) cells — one row:
    (n_pos, n_neg, auc_num2, auc). auc_num2 is the doubled integer
    rank-sum numerator (concordant pairs x2 + ties x1), exact int64 and
    independent of shard/row order; the only float op is the final
    division, mirrored verbatim in the SQL oracle."""
    if not len(cells):
        return pa.table({"n_pos": pa.array([0], pa.int64()),
                         "n_neg": pa.array([0], pa.int64()),
                         "auc_num2": pa.array([0], pa.int64()),
                         "auc": pa.array([None], pa.float64())})
    pos = cells["pos"].to_numpy(np.int64)
    neg = cells["neg"].to_numpy(np.int64)
    p = int(pos.sum())
    n = int(neg.sum())
    cumneg = np.concatenate(([0], np.cumsum(neg)[:-1]))
    num2 = int(np.sum(pos * (2 * cumneg + neg)))
    auc = round(num2 / (2.0 * p * n), 6) if p and n else None
    return pa.table(
        {
            "n_pos": pa.array([p], pa.int64()),
            "n_neg": pa.array([n], pa.int64()),
            "auc_num2": pa.array([num2], pa.int64()),
            "auc": pa.array([auc], pa.float64()),
        }
    )


def pr_curve(cells: pd.DataFrame) -> pa.Table:
    """Precision/recall/F1 at EVERY decision threshold (predict positive
    when score >= t, one row per distinct score): cumulative tp/fp from
    the top of the score range — exact int64 counts, 6-dp ratio floats.
    O(distinct scores) rows however large the scored population."""
    c = cells.sort_values("score", ascending=False)
    score = c["score"].to_numpy(np.int64)
    tp = np.cumsum(c["pos"].to_numpy(np.int64))
    fp = np.cumsum(c["neg"].to_numpy(np.int64))
    p = int(tp[-1]) if len(tp) else 0
    fn = p - tp
    prec = np.round(tp / (tp + fp), 6)
    rec = np.round(tp / float(p), 6) if p else np.full(len(tp), np.nan)
    f1 = np.round(2.0 * tp / (2.0 * tp + fp + fn), 6)
    return pa.table(
        {
            "threshold": pa.array(score, pa.int64()),
            "tp": pa.array(tp, pa.int64()),
            "fp": pa.array(fp, pa.int64()),
            "fn": pa.array(fn, pa.int64()),
            "prec": pa.array(prec, pa.float64()),
            "rec": pa.array(rec, pa.float64()),
            "f1": pa.array(f1, pa.float64()),
        }
    )


def delong_auc_ci(cells: pd.DataFrame) -> pa.Table:
    """DeLong variance and 95% CI for the AUC — the standard
    uncertainty estimate, computed EXACTLY from the cells: every
    positive in cell c has placement (2*cumneg_c + neg_c)/(2N), so the
    DeLong component sums reduce to integer numerators
    U10 = sum_c pos_c*(a_c*P - num2)^2 (and symmetrically U01) over the
    common denominator (2NP)^2 — accumulated in arbitrary-precision
    Python ints (the HUGEINT-mirror recipe of the Spearman gate), with
    ONE shared float expression tree for se/ci at the end. O(distinct
    scores); P<2 or N<2 yields NULL uncertainty, not a crash."""
    if not len(cells):
        z = pa.array([0], pa.int64())
        return pa.table({"n_pos": z, "n_neg": z, "auc_num2": z, "u10": z,
                         "u01": z, "auc": pa.array([None], pa.float64()),
                         "auc_se": pa.array([None], pa.float64()),
                         "ci_lo": pa.array([None], pa.float64()),
                         "ci_hi": pa.array([None], pa.float64())})
    import math

    pos = cells["pos"].to_numpy(np.int64)
    neg = cells["neg"].to_numpy(np.int64)
    p = int(pos.sum())
    n = int(neg.sum())
    cumneg = np.concatenate(([0], np.cumsum(neg)[:-1]))
    cumpos = np.concatenate(([0], np.cumsum(pos)[:-1]))
    a = 2 * cumneg + neg   # placement numerator per positive (over 2N)
    # placement numerator per negative (over 2P): positives ABOVE + ties
    b = 2 * (p - cumpos - pos) + pos
    num2 = int(np.sum(pos * a))
    u10 = sum(int(pc_) * (int(ac) * p - num2) ** 2 for pc_, ac in zip(pos, a))
    u01 = sum(int(nc) * (int(bc) * n - num2) ** 2 for nc, bc in zip(neg, b))
    auc = round(num2 / (2.0 * p * n), 6) if p and n else None
    se = lo = hi = None
    if p > 1 and n > 1:
        d = (2.0 * n * p) * (2.0 * n * p)
        s10 = u10 / ((p - 1) * d)
        s01 = u01 / ((n - 1) * d)
        se_raw = math.sqrt(s10 / p + s01 / n)
        theta = num2 / (2.0 * p * n)
        se = round(se_raw, 6)
        lo = round(theta - 1.96 * se_raw, 6)
        hi = round(theta + 1.96 * se_raw, 6)
    return pa.table(
        {
            "n_pos": pa.array([p], pa.int64()),
            "n_neg": pa.array([n], pa.int64()),
            "auc_num2": pa.array([num2], pa.int64()),
            "u10": pa.array([u10], pa.int64()),
            "u01": pa.array([u01], pa.int64()),
            "auc": pa.array([auc], pa.float64()),
            "auc_se": pa.array([se], pa.float64()),
            "ci_lo": pa.array([lo], pa.float64()),
            "ci_hi": pa.array([hi], pa.float64()),
        }
    )


def ks_separation(cells: pd.DataFrame) -> pa.Table:
    """KS separation of the score distributions of positives vs
    negatives — the classic scoring-power statistic (credit-scoring
    'KS'): max over thresholds of |F_pos - F_neg|. Integer-exact
    d_scaled = max |N*cumpos - P*cumneg| over the cells (same
    compression trick as numstats.ks_two_sample: one row per distinct
    score moves, never the population); d_stat is the single mirrored
    float division."""
    if not len(cells):
        z = pa.array([0], pa.int64())
        return pa.table({"n_pos": z, "n_neg": z, "d_scaled": z,
                         "d_stat": pa.array([None], pa.float64())})
    pos = cells["pos"].to_numpy(np.int64)
    neg = cells["neg"].to_numpy(np.int64)
    p = int(pos.sum())
    n = int(neg.sum())
    cump = np.cumsum(pos)
    cumn = np.cumsum(neg)
    d_scaled = int(np.max(np.abs(n * cump - p * cumn))) if len(cump) else 0
    d_stat = round(d_scaled / (1.0 * p * n), 6) if p and n else None
    return pa.table(
        {
            "n_pos": pa.array([p], pa.int64()),
            "n_neg": pa.array([n], pa.int64()),
            "d_scaled": pa.array([d_scaled], pa.int64()),
            "d_stat": pa.array([d_stat], pa.float64()),
        }
    )


def confusion_mcc(cells: pd.DataFrame) -> pa.Table:
    """Confusion counts + accuracy/F1/MCC at the natural operating point
    (threshold = lower-median score, predict positive when score > t):
    one row of exact int64 cells and 6-dp mirrored ratios. The median
    comes from the CELL histogram (weighted order statistic — no sort of
    the population), so the finalizer stays O(distinct scores)."""
    if not len(cells):
        z = pa.array([0], pa.int64())
        return pa.table({"threshold": z, "tp": z, "fp": z, "fn": z, "tn": z,
                         "acc": pa.array([None], pa.float64()),
                         "f1": pa.array([None], pa.float64()),
                         "mcc": pa.array([None], pa.float64())})
    import math

    score = cells["score"].to_numpy(np.int64)
    pos = cells["pos"].to_numpy(np.int64)
    neg = cells["neg"].to_numpy(np.int64)
    n = int((pos + neg).sum())
    cum = (pos + neg).cumsum()
    med = int(score[np.searchsorted(cum, (n + 1) // 2, side="left")])
    pred = score > med
    tp = int(pos[pred].sum())
    fp = int(neg[pred].sum())
    fn = int(pos[~pred].sum())
    tn = int(neg[~pred].sum())
    acc = round((tp + tn) * 1.0 / n, 6)
    f1 = round(2.0 * tp / (2.0 * tp + fp + fn), 6) if tp + fp + fn else None
    den = ((tp + fp) * 1.0) * (tp + fn) * (tn + fp) * (tn + fn)
    mcc = round((tp * 1.0 * tn - fp * 1.0 * fn) / math.sqrt(den), 6) if den else None
    return pa.table(
        {
            "threshold": pa.array([med], pa.int64()),
            "tp": pa.array([tp], pa.int64()),
            "fp": pa.array([fp], pa.int64()),
            "fn": pa.array([fn], pa.int64()),
            "tn": pa.array([tn], pa.int64()),
            "acc": pa.array([acc], pa.float64()),
            "f1": pa.array([f1], pa.float64()),
            "mcc": pa.array([mcc], pa.float64()),
        }
    )


def isotonic_rates(cells: pd.DataFrame) -> pa.Table:
    """Isotonic (PAV) calibration of the positive rate over the score
    cells: the least-squares NONDECREASING fit to the per-score rates —
    the standard post-hoc calibrator. Pool-adjacent-violators with
    EXACT rational comparisons (cross-multiplied int64, no float
    compares), so the pooled blocks are the unique exact solution; each
    fitted value is ONE correctly-rounded division of exact integer
    block sums, which equals the minimax formula
    max_{i<=k} min_{j>=k} avg(i,j) a SQL oracle computes from the same
    integers (IEEE division is correctly rounded, so equal rationals
    give bit-equal doubles whatever integer pair produced them).
    O(distinct scores) after the cell exchange. Returns one row per
    cell: (score, n, pos, iso_rate 6-dp)."""
    score = cells["score"].to_numpy(np.int64)
    pos = cells["pos"].to_numpy(np.int64)
    n = (cells["pos"] + cells["neg"]).to_numpy(np.int64)
    # PAV stack: merge while the previous block's rate >= current's
    bp: list[int] = []  # block pos sums
    bn: list[int] = []  # block n sums
    bc: list[int] = []  # block cell counts
    for k in range(len(score)):
        cp, cn, cc = int(pos[k]), int(n[k]), 1
        while bp and bp[-1] * cn >= cp * bn[-1]:
            cp += bp.pop()
            cn += bn.pop()
            cc += bc.pop()
        bp.append(cp)
        bn.append(cn)
        bc.append(cc)
    iso = np.concatenate(
        [np.full(c, round(p / (1.0 * q), 6)) for p, q, c in zip(bp, bn, bc)]
    ) if bp else np.empty(0)
    return pa.table(
        {
            "score": pa.array(score, pa.int64()),
            "n": pa.array(n, pa.int64()),
            "pos": pa.array(pos, pa.int64()),
            "iso_rate": pa.array(iso, pa.float64()),
        }
    )


def bucket_lift(cells: pd.DataFrame, k: int = 10) -> pa.Table:
    """Range-bucket lift table: scores split into k equal-width integer
    ranges (bucket = (score - lo) * k // (hi - lo + 1) — deterministic,
    NO global ordering or NTILE, so no sort and no tie ambiguity at any
    scale), per-bucket size, positives, positive rate, and lift vs the
    base rate. Buckets with no scores are absent (cells are the domain)."""
    if not len(cells):
        z = pa.array([], pa.int64())
        return pa.table({"bucket": z, "n_users": z, "n_pos": z,
                         "pos_rate": pa.array([], pa.float64()),
                         "lift": pa.array([], pa.float64())})
    score = cells["score"].to_numpy(np.int64)
    pos = cells["pos"].to_numpy(np.int64)
    neg = cells["neg"].to_numpy(np.int64)
    lo, hi = int(score.min()), int(score.max())
    bucket = (score - lo) * k // (hi - lo + 1)
    df = pd.DataFrame({"bucket": bucket, "pos": pos, "n": pos + neg})
    g = df.groupby("bucket", as_index=False).agg({"pos": "sum", "n": "sum"})
    p_tot = int(pos.sum())
    n_tot = int((pos + neg).sum())
    gp = g["pos"].to_numpy(np.int64)
    gn = g["n"].to_numpy(np.int64)
    rate = np.round(gp * 1.0 / gn, 6)
    lift = np.round((gp * 1.0 / gn) / (p_tot * 1.0 / n_tot), 6)
    return pa.table(
        {
            "bucket": pa.array(g["bucket"].to_numpy(np.int64), pa.int64()),
            "n_users": pa.array(gn, pa.int64()),
            "n_pos": pa.array(gp, pa.int64()),
            "pos_rate": pa.array(rate, pa.float64()),
            "lift": pa.array(lift, pa.float64()),
        }
    )


def user_two_score_cells(ds: rd.Dataset) -> pd.DataFrame:
    """Joint (s1 = view count, s2 = click count, pos, neg) cells per
    user, same label rule as :func:`user_score_label_cells` — the input
    of the paired model comparison. One keyed exchange; the joint cell
    count is bounded by distinct (s1, s2) pairs."""
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        et = df["event_type"].to_numpy()
        out = pd.DataFrame(
            {
                "user_id": df["user_id"],
                "vc": (et == "view").astype(np.int64),
                "cc": (et == "click").astype(np.int64),
                "pc": (et == "purchase").astype(np.int64),
            }
        )
        return out.groupby("user_id", sort=False, as_index=False).agg(
            {"vc": "sum", "cc": "sum", "pc": "sum"}
        )

    per_user = bucketed_keyed_sum(
        ds.map_batches(partial, batch_format="pandas"),
        ["user_id"], ["vc", "cc", "pc"],
    ).materialize()

    def pc_cells(tbl: pa.Table) -> pa.Table:
        if not tbl.num_rows:
            return pa.table({"pc": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        g = pa.table({"pc": tbl.column("pc")}).group_by(["pc"]).aggregate(
            [([], "count_all")]
        )
        return g.rename_columns(["pc", "n"])

    hist = bucketed_keyed_sum(
        per_user.map_batches(pc_cells, batch_format="pyarrow",
                             zero_copy_batch=True),
        ["pc"], ["n"], num_buckets=4,
    ).to_pandas().sort_values("pc")
    n_users = int(hist["n"].sum())
    if n_users == 0:
        return pd.DataFrame({c: pd.Series([], dtype=np.int64)
                             for c in ("s1", "s2", "pos", "neg")})
    cum = hist["n"].to_numpy(np.int64).cumsum()
    med = int(hist["pc"].to_numpy(np.int64)[
        np.searchsorted(cum, (n_users + 1) // 2, side="left")])

    def sc(df: pd.DataFrame) -> pd.DataFrame:
        y = (df["pc"].to_numpy(np.int64) > med).astype(np.int64)
        out = pd.DataFrame(
            {"s1": df["vc"].to_numpy(np.int64),
             "s2": df["cc"].to_numpy(np.int64), "pos": y, "neg": 1 - y}
        )
        return out.groupby(["s1", "s2"], sort=False, as_index=False).agg(
            {"pos": "sum", "neg": "sum"}
        )

    cells = bucketed_keyed_sum(
        per_user.map_batches(sc, batch_format="pandas"),
        ["s1", "s2"], ["pos", "neg"], num_buckets=4,
    ).to_pandas()
    return cells.sort_values(["s1", "s2"]).reset_index(drop=True)


def delong_paired(jcells: pd.DataFrame) -> pa.Table:
    """Paired DeLong test: are two scores of the SAME population
    different predictors of the label? The model-A/B comparison at
    scale — correlated AUCs, so the covariance of the placement vectors
    enters the z denominator. Everything up to the final expression is
    exact integer arithmetic over the joint cells: per-score marginal
    placements a_k (positives) / b_k (negatives), component sums
    U10/U01 per score and cross sums C10/C01 as arbitrary-precision
    ints over the common denominator (2NP)^2 (HUGEINT-mirror recipe),
    then ONE shared float tree for z. O(distinct joint cells)."""
    if not len(jcells):
        z = pa.array([0], pa.int64())
        return pa.table({"n_pos": z, "n_neg": z, "auc1_num2": z,
                         "auc2_num2": z, "c10": z, "c01": z,
                         "auc1": pa.array([None], pa.float64()),
                         "auc2": pa.array([None], pa.float64()),
                         "z": pa.array([None], pa.float64())})
    import math

    pos = jcells["pos"].to_numpy(np.int64)
    neg = jcells["neg"].to_numpy(np.int64)
    p = int(pos.sum())
    n = int(neg.sum())

    def marginal(col: str):
        m = (jcells.groupby(col, as_index=False)[["pos", "neg"]].sum()
             .sort_values(col).reset_index(drop=True))
        cn = np.concatenate(([0], np.cumsum(m["neg"].to_numpy(np.int64))[:-1]))
        cp = np.concatenate(([0], np.cumsum(m["pos"].to_numpy(np.int64))[:-1]))
        a = 2 * cn + m["neg"].to_numpy(np.int64)
        b = 2 * (p - cp - m["pos"].to_numpy(np.int64)) + m["pos"].to_numpy(np.int64)
        amap = dict(zip(m[col], a))
        bmap = dict(zip(m[col], b))
        return (jcells[col].map(amap).to_numpy(np.int64),
                jcells[col].map(bmap).to_numpy(np.int64))

    a1, b1 = marginal("s1")
    a2, b2 = marginal("s2")
    num2_1 = int(np.sum(pos * a1))
    num2_2 = int(np.sum(pos * a2))
    u10_1 = sum(int(w) * (int(x) * p - num2_1) ** 2 for w, x in zip(pos, a1))
    u10_2 = sum(int(w) * (int(x) * p - num2_2) ** 2 for w, x in zip(pos, a2))
    u01_1 = sum(int(w) * (int(x) * n - num2_1) ** 2 for w, x in zip(neg, b1))
    u01_2 = sum(int(w) * (int(x) * n - num2_2) ** 2 for w, x in zip(neg, b2))
    c10 = sum(int(w) * (int(x) * p - num2_1) * (int(y2) * p - num2_2)
              for w, x, y2 in zip(pos, a1, a2))
    c01 = sum(int(w) * (int(x) * n - num2_1) * (int(y2) * n - num2_2)
              for w, x, y2 in zip(neg, b1, b2))
    auc1 = round(num2_1 / (2.0 * p * n), 6) if p and n else None
    auc2 = round(num2_2 / (2.0 * p * n), 6) if p and n else None
    z = None
    if p > 1 and n > 1:
        d = (2.0 * n * p) * (2.0 * n * p)
        var1 = (u10_1 / ((p - 1) * d)) / p + (u01_1 / ((n - 1) * d)) / n
        var2 = (u10_2 / ((p - 1) * d)) / p + (u01_2 / ((n - 1) * d)) / n
        cov = (c10 / ((p - 1) * d)) / p + (c01 / ((n - 1) * d)) / n
        den = var1 + var2 - 2 * cov
        if den > 0:
            z = round((num2_1 / (2.0 * p * n) - num2_2 / (2.0 * p * n))
                      / math.sqrt(den), 6)
    return pa.table(
        {
            "n_pos": pa.array([p], pa.int64()),
            "n_neg": pa.array([n], pa.int64()),
            "auc1_num2": pa.array([num2_1], pa.int64()),
            "auc2_num2": pa.array([num2_2], pa.int64()),
            "c10": pa.array([c10], pa.int64()),
            "c01": pa.array([c01], pa.int64()),
            "auc1": pa.array([auc1], pa.float64()),
            "auc2": pa.array([auc2], pa.float64()),
            "z": pa.array([z], pa.float64()),
        }
    )


def grouped_roc_auc(cells: pd.DataFrame, group_col: str = "grp") -> pa.Table:
    """Per-SLICE exact AUC — the fairness/slice-metrics primitive (one
    AUC per subpopulation from ONE keyed exchange): cells carry
    (group, score, pos, neg); the finalizer computes every group's
    rank-statistic AUC with segmented cumulative sums (sort by
    (group, score), per-group cumneg via offset subtraction — fully
    vectorized across groups, no per-group Python). Single-class
    slices yield NULL auc, not a crash."""
    c = cells.sort_values([group_col, "score"], kind="mergesort",
                          ignore_index=True)
    g = c[group_col].to_numpy()
    pos = c["pos"].to_numpy(np.int64)
    neg = c["neg"].to_numpy(np.int64)
    first = np.ones(len(c), dtype=bool)
    first[1:] = g[1:] != g[:-1]
    gid = np.cumsum(first) - 1
    cum = np.cumsum(neg)
    # exclusive cumulative negatives, re-based per group segment
    sh = np.concatenate(([0], cum[:-1]))
    cumneg = sh - np.repeat(sh[np.flatnonzero(first)], np.bincount(gid))
    term = pos * (2 * cumneg + neg)
    df = pd.DataFrame({group_col: g, "p": pos, "n": neg, "t": term})
    agg = df.groupby(group_col, sort=True, as_index=False).agg(
        {"p": "sum", "n": "sum", "t": "sum"}
    )
    p = agg["p"].to_numpy(np.int64)
    n = agg["n"].to_numpy(np.int64)
    num2 = agg["t"].to_numpy(np.int64)
    auc = np.where((p > 0) & (n > 0),
                   np.round(num2 / (2.0 * np.maximum(p, 1) * np.maximum(n, 1)), 6),
                   np.nan)
    return pa.table(
        {
            group_col: pa.array(agg[group_col]),
            "n_pos": pa.array(p, pa.int64()),
            "n_neg": pa.array(n, pa.int64()),
            "auc_num2": pa.array(num2, pa.int64()),
            "auc": pa.array(auc, pa.float64()),
        }
    )


def cuped_ab_arms(ds: rd.Dataset) -> pa.Table:
    """CUPED-adjusted A/B arm summary — the experimentation primitive at
    scale: users split into arms by id parity, pre-period covariate
    x = first-time-half event count, outcome y = second-half purchase
    count; theta = cov(x,y)/var(x) POOLED, each arm's outcome mean
    adjusted by theta*(xbar_arm - xbar_pooled) (variance-reduced
    estimate). Everything that moves is exact int64 moment sums
    (n, Sx, Sy, Sxy, Sxx, Syy per arm — 2 rows); theta/means/vars are
    ONE shared float expression tree. Two scans of the events input
    (split bound needs global min/max ts first), one keyed exchange."""
    import pyarrow.compute as _pc

    bounds = ds.map_batches(
        lambda t: pa.table(
            {"lo": pa.array([_pc.min(t.column("ts")).cast(pa.timestamp("us")).cast(pa.int64()).as_py()
                             if t.num_rows else (1 << 62)], pa.int64()),
             "hi": pa.array([_pc.max(t.column("ts")).cast(pa.timestamp("us")).cast(pa.int64()).as_py()
                             if t.num_rows else -(1 << 62)], pa.int64())}
        ),
        batch_format="pyarrow", zero_copy_batch=True,
    ).to_pandas()
    lo, hi = int(bounds["lo"].min()), int(bounds["hi"].max())
    split = (lo + hi + 1) // 2

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        us = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        et = df["event_type"].to_numpy()
        out = pd.DataFrame(
            {
                "user_id": df["user_id"],
                "x": (us < split).astype(np.int64),
                "y": ((us >= split) & (et == "purchase")).astype(np.int64),
            }
        )
        return out.groupby("user_id", sort=False, as_index=False).agg(
            {"x": "sum", "y": "sum"}
        )

    per_user = bucketed_keyed_sum(
        ds.map_batches(partial, batch_format="pandas"), ["user_id"], ["x", "y"]
    )

    def moments(tbl: pa.Table) -> pa.Table:
        if not tbl.num_rows:
            return pa.table({c: pa.array([], pa.int64())
                             for c in ("arm", "n", "sx", "sy", "sxy", "sxx", "syy")})
        uid = tbl.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        x = tbl.column("x").to_numpy(zero_copy_only=False).astype(np.int64)
        y = tbl.column("y").to_numpy(zero_copy_only=False).astype(np.int64)
        df = pd.DataFrame({"arm": uid % 2, "n": 1, "sx": x, "sy": y,
                           "sxy": x * y, "sxx": x * x, "syy": y * y})
        return pa.Table.from_pandas(
            df.groupby("arm", sort=False, as_index=False).sum(), preserve_index=False
        )

    m = bucketed_keyed_sum(
        per_user.map_batches(moments, batch_format="pyarrow", zero_copy_batch=True),
        ["arm"], ["n", "sx", "sy", "sxy", "sxx", "syy"], num_buckets=2,
    ).to_pandas().sort_values("arm").reset_index(drop=True)
    pn = int(m["n"].sum())
    psx = int(m["sx"].sum())
    psy = int(m["sy"].sum())
    psxy = int(m["sxy"].sum())
    psxx = int(m["sxx"].sum())
    den = pn * psxx - psx * psx
    theta = (pn * psxy - psx * psy) * 1.0 / den if den > 0 else 0.0
    xbar = psx * 1.0 / pn if pn else 0.0
    rows = []
    for _, r in m.iterrows():
        n = int(r["n"])
        sx, sy = int(r["sx"]), int(r["sy"])
        sxy, sxx, syy = int(r["sxy"]), int(r["sxx"]), int(r["syy"])
        adj_mean = round(sy * 1.0 / n - theta * (sx * 1.0 / n - xbar), 6)
        raw_var = round(syy * 1.0 / n - (sy * 1.0 / n) * (sy * 1.0 / n), 6)
        adj_var = round(
            (syy * 1.0 / n - (sy * 1.0 / n) * (sy * 1.0 / n))
            - 2 * theta * (sxy * 1.0 / n - (sx * 1.0 / n) * (sy * 1.0 / n))
            + theta * theta * (sxx * 1.0 / n - (sx * 1.0 / n) * (sx * 1.0 / n)),
            6,
        )
        rows.append((int(r["arm"]), n, sx, sy, adj_mean, raw_var, adj_var,
                     round(theta, 6)))
    cols = list(zip(*rows)) if rows else [[]] * 8
    return pa.table(
        {
            "arm": pa.array(cols[0], pa.int64()),
            "n": pa.array(cols[1], pa.int64()),
            "sx": pa.array(cols[2], pa.int64()),
            "sy": pa.array(cols[3], pa.int64()),
            "adj_mean": pa.array(cols[4], pa.float64()),
            "raw_var": pa.array(cols[5], pa.float64()),
            "adj_var": pa.array(cols[6], pa.float64()),
            "theta": pa.array(cols[7], pa.float64()),
        }
    )
