"""Turn-sequence stitch join oracles (SURVEY.md §2b)."""

import pandas as pd
import ray.data as rd

from vaero_ray.sources import make_transcripts
from vaero_ray.stages import assign_exchanges, stitch_conversations
from vaero_ray.stages.stitch import stitch_exchanges

TBL = make_transcripts(30, 10, seed=9, disorder_frac=0.15)
PDF = TBL.to_pandas()


def test_assign_exchanges_matches_window_function():
    got = assign_exchanges(rd.from_arrow(TBL)).to_pandas()
    want = PDF.sort_values(["conv_id", "turn_idx"]).copy()
    want["exchange_idx"] = (
        (want.role == "user").astype("int64").groupby(want.conv_id).cumsum()
    )
    merged = got.merge(
        want[["conv_id", "turn_idx", "exchange_idx"]],
        on=["conv_id", "turn_idx"],
        suffixes=("", "_w"),
    )
    assert len(merged) == len(PDF)
    assert (merged.exchange_idx == merged.exchange_idx_w).all()


def test_stitch_conversations():
    got = stitch_conversations(rd.from_arrow(TBL)).to_pandas().set_index("conv_id").sort_index()
    g = PDF.sort_values(["conv_id", "turn_idx"]).groupby("conv_id")
    assert (got.n_turns == g.size()).all()
    assert (got.n_user == g.apply(lambda x: (x.role == "user").sum(), include_groups=False)).all()
    assert (got.first_ts == g.ts.min()).all()
    assert (got.last_ts == g.ts.max()).all()
    # transcript is turn-ordered "role: text" lines
    conv = PDF[PDF.conv_id == got.index[0]].sort_values("turn_idx")
    want_tr = "\n".join(conv.role.str.cat(conv.text, sep=": "))
    assert got.transcript.iloc[0] == want_tr
    # deterministic under different block layouts
    got2 = (
        stitch_conversations(rd.from_arrow(TBL).repartition(5))
        .to_pandas()
        .set_index("conv_id")
        .sort_index()
    )
    assert got.equals(got2)


def test_stitch_exchanges():
    got = stitch_exchanges(rd.from_arrow(TBL)).to_pandas()
    # exchange 1..n_user per conversation; every user turn opens an exchange
    w = PDF.sort_values(["conv_id", "turn_idx"]).copy()
    w["exchange_idx"] = (w.role == "user").astype("int64").groupby(w.conv_id).cumsum()
    want_counts = w.groupby("conv_id").exchange_idx.nunique()
    got_counts = got.groupby("conv_id").exchange_idx.nunique()
    assert got_counts.sort_index().equals(want_counts.sort_index())
    # spot-check one exchange's stitched texts
    conv_id = got.conv_id.iloc[0]
    ex = w[(w.conv_id == conv_id) & (w.exchange_idx == 1)]
    row = got[(got.conv_id == conv_id) & (got.exchange_idx == 1)].iloc[0]
    assert row.user_text == "\n".join(ex.loc[ex.role == "user", "text"])
    assert row.assistant_text == "\n".join(ex.loc[ex.role == "assistant", "text"])
    assert row.n_tool_calls == int((ex.role == "tool").sum())
