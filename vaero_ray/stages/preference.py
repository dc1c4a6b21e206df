"""Preference-pair assembly (DPO/RLHF-style chosen-vs-rejected pairs).

Given candidate responses grouped by a prompt key, emit one pair per
group with >= 2 candidates:

  chosen   = the first row by (score DESC, id ASC)
  rejected = the first row by (score ASC,  id DESC)

The opposed tie-break directions guarantee chosen != rejected whenever
the group has >= 2 rows (all-equal scores pick the min-id and max-id
rows), so every emitted pair is a genuine pair — deterministically, as
a pure function of the candidate set (shard/re-run invariant).

Scale shape: a per-block PARTIAL prune keeps at most the two extreme
rows per (group, block) plus a piggybacked per-block group count, so
the single bucketed exchange moves <= 2 rows per group per block no
matter how many candidates a hot prompt accumulates; the exact global
extremes are a function of the per-block extremes (min/max compose).

Equivalent SQL: two ROW_NUMBER() windows with the orderings above plus
COUNT(*) OVER (PARTITION BY group), aggregated per group.

No reference counterpart (the reference has no ranking/pairing
operators); extends the LLM-training-data tier mandated by the task.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray.data as rd

from vaero_ray.stages.keyed import bucketed_map_groups

_N_COL = "__pp_n"


def _extremes(df: pd.DataFrame, group: str, score: str, id_col: str) -> pd.DataFrame:
    """Chosen-head and rejected-head row per group, concatenated.

    The per-block group count rides on the chosen-head rows in ``_N_COL``
    (0 on rejected-head rows), so counts sum correctly across blocks even
    when the same physical row is both heads.
    """
    up = df.sort_values([score, id_col], ascending=[False, True], kind="mergesort")
    chosen = up.groupby(group, sort=False, dropna=False).head(1).copy()
    sizes = df.groupby(group, sort=False, dropna=False)[id_col].size()
    chosen[_N_COL] = sizes[chosen[group]].to_numpy()
    down = df.sort_values([score, id_col], ascending=[True, False], kind="mergesort")
    rejected = down.groupby(group, sort=False, dropna=False).head(1).copy()
    rejected[_N_COL] = 0
    return pd.concat([chosen, rejected], ignore_index=True)


def preference_pairs(
    ds: rd.Dataset,
    group_col: str,
    score_col: str,
    id_col: str,
    num_buckets: int | None = None,
) -> rd.Dataset:
    """(group, n_candidates, chosen_id, chosen_score, rejected_id,
    rejected_score, margin) per group with >= 2 candidate rows.

    ``score_col`` and ``id_col`` must be integer columns (exact margins;
    the engine-wide fixed-point-before-aggregation rule)."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return _extremes(df, group_col, score_col, id_col)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        up = df.sort_values([score_col, id_col], ascending=[False, True], kind="mergesort")
        chosen = up.groupby(group_col, sort=False, dropna=False).head(1)
        down = df.sort_values([score_col, id_col], ascending=[True, False], kind="mergesort")
        rejected = down.groupby(group_col, sort=False, dropna=False).head(1)
        n = df.groupby(group_col, sort=False, dropna=False)[_N_COL].sum()
        out = pd.DataFrame(
            {
                group_col: chosen[group_col].to_numpy(),
                "n_candidates": n[chosen[group_col]].to_numpy(),
                "chosen_id": chosen[id_col].to_numpy(),
                "chosen_score": chosen[score_col].to_numpy(),
            }
        )
        rej = rejected.set_index(group_col)
        out["rejected_id"] = rej[id_col][out[group_col]].to_numpy()
        out["rejected_score"] = rej[score_col][out[group_col]].to_numpy()
        out["margin"] = out["chosen_score"] - out["rejected_score"]
        return out[out["n_candidates"] >= 2].reset_index(drop=True)

    partials = ds.map_batches(partial, batch_format="pandas")
    return bucketed_map_groups(partials, group_col, final, num_buckets=num_buckets)
