"""Survival analysis over event streams: Kaplan-Meier time-to-convert
curves (with right censoring), Nelson-Aalen cumulative hazard, and the
two-group log-rank test.

The reference engine has no survival tier; this follows the repo's
exact-aggregate convention (see numstats module docstring): the
DISTRIBUTED part is one keyed exchange of per-user int64 reductions
(first/last event timestamps — 3-4 int64 per user), then a
distinct-DURATION compression (one (dur_s, event[, cohort], c) row per
distinct whole-second duration — bounded by the observation span, not
by rows), and the curve fold runs driver-side over that tiny table.
Survival / hazard / chi-square are the only floats, written as the
identical expression in the SQL oracle (6-dp rounded); all counts on
the wire are exact int64.

Censoring model (the standard funnel reading): a subject is a user;
entry time t0 = their first event; the event is their first
``event_value`` occurrence (duration 0 allowed when it IS the first
event); users who never convert are right-censored at their LAST
event. Subjects censored exactly at an event time count as at-risk at
that time (the textbook convention, mirrored in the oracle's
``dur >= t`` risk set).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from vaero_ray.stages.keyed import bucketed_keyed_agg, bucketed_keyed_sum

__all__ = ["km_curve", "logrank_test"]

_NO_TS = 1 << 62  # sentinel: absent conditional min (absorbing under min)


def _duration_counts(
    ds: rd.Dataset,
    user_col: str,
    ts_col: str,
    type_col: str,
    event_value: str,
    cohort_value: "str | None",
) -> pd.DataFrame:
    """Compressed (dur_s, event[, cohort], c) counts. Two exchanges:
    per-user conditional mins/max (sentinel-encoded int64, the
    view_to_purchase pattern), then the distinct-duration count merge.
    Only the compressed table (bounded by the span in whole seconds)
    reaches the driver."""
    with_cohort = cohort_value is not None

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        us = df[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        et = df[type_col].to_numpy()
        out = pd.DataFrame(
            {
                user_col: df[user_col],
                "t0": us,
                "pe": np.where(et == event_value, us, _NO_TS),
                "tm": us,
            }
        )
        plan = {"t0": "min", "pe": "min", "tm": "max"}
        if with_cohort:
            out["ve"] = np.where(et == cohort_value, us, _NO_TS)
            plan["ve"] = "min"
        return out.groupby(user_col, sort=False, as_index=False).agg(plan)

    plan = {"t0": "min", "pe": "min", "tm": "max"}
    if with_cohort:
        plan["ve"] = "min"
    firsts = bucketed_keyed_agg(
        ds.map_batches(partial, batch_format="pandas"), [user_col], plan
    )

    def to_durations(df: pd.DataFrame) -> pd.DataFrame:
        ev = (df["pe"].to_numpy(np.int64) < _NO_TS).astype(np.int64)
        end = np.where(ev == 1, df["pe"].to_numpy(np.int64), df["tm"].to_numpy(np.int64))
        out = pd.DataFrame(
            {
                "dur_s": (end - df["t0"].to_numpy(np.int64)) // 1_000_000,
                "event": ev,
            }
        )
        keys = ["dur_s", "event"]
        if with_cohort:
            # cohort-first: the user's earliest event timestamp is also
            # the earliest cohort_value timestamp (ties at the first
            # microsecond count as cohort-first, same as the oracle)
            out["cohort"] = (
                df["ve"].to_numpy(np.int64) == df["t0"].to_numpy(np.int64)
            ).astype(np.int64)
            keys.append("cohort")
        g = out.groupby(keys, sort=False).size()
        return g.rename("c").reset_index()

    keys = ["dur_s", "event"] + (["cohort"] if with_cohort else [])
    merged = bucketed_keyed_sum(
        firsts.map_batches(to_durations, batch_format="pandas"), keys, ["c"]
    )
    return merged.to_pandas()


def km_curve(
    ds: rd.Dataset,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    event_value: str = "purchase",
) -> pa.Table:
    """Kaplan-Meier survival table of time-to-first-``event_value``:
    one row per distinct event duration (whole seconds) with the exact
    int64 risk/event counts, the KM survival estimate and the
    Nelson-Aalen cumulative hazard (both 6-dp).

    Floats use ``math.log``/``math.exp`` in a sequential ascending-time
    fold — the same glibc calls and the same per-term inputs as the
    oracle's ``EXP(SUM(LN(1 - d/n)) OVER (ORDER BY t))``; once the risk
    set is fully consumed (d == n) survival is pinned to exactly 0.0 on
    both sides (LN(0) never evaluated)."""
    comp = _duration_counts(ds, user_col, ts_col, type_col, event_value, None)
    if not len(comp):
        return pa.table(
            {
                "t_sec": pa.array([], pa.int64()),
                "n_risk": pa.array([], pa.int64()),
                "n_event": pa.array([], pa.int64()),
                "surv": pa.array([], pa.float64()),
                "cumhaz": pa.array([], pa.float64()),
            }
        )
    total = int(comp["c"].sum())
    alld = comp.groupby("dur_s", sort=True)["c"].sum()
    before = alld.cumsum() - alld  # subjects with dur < t, per distinct dur
    evd = (
        comp[comp["event"] == 1].groupby("dur_s", sort=True)["c"].sum()
    )  # d_t per distinct event duration
    t_sec = evd.index.to_numpy(np.int64)
    d = evd.to_numpy(np.int64)
    n_risk = total - before.loc[t_sec].to_numpy(np.int64)
    surv = np.empty(len(t_sec), np.float64)
    cumhaz = np.empty(len(t_sec), np.float64)
    lsum, ch, dead = 0.0, 0.0, False
    for i in range(len(t_sec)):
        di, ni = int(d[i]), int(n_risk[i])
        if di < ni:
            lsum += math.log(1.0 - di / ni)
        else:
            dead = True
        ch += di / ni
        surv[i] = 0.0 if dead else round(math.exp(lsum), 6)
        cumhaz[i] = round(ch, 6)
    return pa.table(
        {
            "t_sec": pa.array(t_sec, pa.int64()),
            "n_risk": pa.array(n_risk, pa.int64()),
            "n_event": pa.array(d, pa.int64()),
            "surv": pa.array(surv, pa.float64()),
            "cumhaz": pa.array(cumhaz, pa.float64()),
        }
    )


def logrank_test(
    ds: rd.Dataset,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    event_value: str = "purchase",
    cohort_value: str = "view",
) -> pa.Table:
    """Two-group log-rank test of time-to-``event_value`` between
    cohort-first users (first event is a ``cohort_value``) and the
    rest: per cohort the exact subject / observed-event counts plus
    the expected-event total and the shared chi-square (1 df, 6-dp).

    Hypergeometric fold at each distinct event time t: with d events
    out of n at risk overall and n1 at risk in the cohort,
    ``E += n1*d/n`` and ``V += d*(n1/n)*(1-n1/n)*(n-d)/(n-1)``
    (skipped when n == 1, as in the oracle). Same
    distinct-duration-compressed exchange as :func:`km_curve`."""
    comp = _duration_counts(ds, user_col, ts_col, type_col, event_value, cohort_value)
    cols = {
        "cohort": pa.array(["cohort_first", "other"], pa.string()),
        "n_subj": pa.array([0, 0], pa.int64()),
        "n_event": pa.array([0, 0], pa.int64()),
        "expected": pa.array([0.0, 0.0], pa.float64()),
        "chi2": pa.array([0.0, 0.0], pa.float64()),
    }
    if not len(comp):
        return pa.table(cols)
    total = int(comp["c"].sum())
    n1_total = int(comp.loc[comp["cohort"] == 1, "c"].sum())
    alld = comp.groupby("dur_s", sort=True)["c"].sum()
    before_all = alld.cumsum() - alld
    c1 = comp[comp["cohort"] == 1].groupby("dur_s", sort=True)["c"].sum()
    ev = comp[comp["event"] == 1].groupby("dur_s", sort=True)["c"].sum()
    ev1 = (
        comp[(comp["event"] == 1) & (comp["cohort"] == 1)]
        .groupby("dur_s", sort=True)["c"]
        .sum()
    )
    t_sec = ev.index.to_numpy(np.int64)
    d = ev.to_numpy(np.int64)
    d1 = ev1.reindex(ev.index, fill_value=0).to_numpy(np.int64)
    n = total - before_all.loc[t_sec].to_numpy(np.int64)
    # at-risk in cohort 1: n1_total minus cohort-1 subjects with dur < t
    idx1 = np.searchsorted(c1.index.to_numpy(np.int64), t_sec)
    b1 = np.r_[0, (c1.cumsum()).to_numpy(np.int64)]
    n1 = n1_total - b1[idx1]
    o1 = int(d1.sum())
    o2 = int(d.sum()) - o1
    e1, var = 0.0, 0.0
    for i in range(len(t_sec)):
        di, ni, n1i = int(d[i]), int(n[i]), int(n1[i])
        e1 += n1i * di / ni
        if ni > 1:
            var += di * (n1i / ni) * (1.0 - n1i / ni) * (ni - di) / (ni - 1)
    e2 = float(d.sum()) - e1
    chi2 = round((o1 - e1) * (o1 - e1) / var, 6) if var > 0 else None
    return pa.table(
        {
            "cohort": pa.array(["cohort_first", "other"], pa.string()),
            "n_subj": pa.array([n1_total, total - n1_total], pa.int64()),
            "n_event": pa.array([o1, o2], pa.int64()),
            "expected": pa.array([round(e1, 6), round(e2, 6)], pa.float64()),
            "chi2": pa.array([chi2, chi2], pa.float64()),
        }
    )
