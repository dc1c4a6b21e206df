"""Driver-contract checks: __ray_entry__ entry/queries/oracle_sql, plus a
compact in-process version of the driver's oracle compare at sf0.001
(the full sweep lives in tools/selfcheck.py, run at sf0.01)."""

import sys

import duckdb
import pytest

sys.path.insert(0, "/root/repo")

import __ray_entry__ as entrymod

SF = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return c


def test_entry_smoke():
    ds = entrymod.entry()
    df = ds.to_pandas()
    assert len(df) >= 0
    assert sorted(df.columns) == ["n_turns", "role", "sum_chars", "window_start"]


def test_every_oracle_key_has_query():
    q, o = entrymod.queries(), entrymod.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) >= 20


@pytest.mark.parametrize(
    "name",
    ["vaero_mask", "tumbling_window_agg", "transcript_stitch", "exact_dedup_docs", "ann_topk_bruteforce"],
)
def test_query_matches_oracle_sf0001(con, name):
    from tools.selfcheck import compare, to_pandas

    got = to_pandas(entrymod.queries()[name](SF))
    want = con.execute(entrymod.oracle_sql()[name]).fetchdf()
    assert compare(name, got, want) == []


def test_derived_transcripts_lockstep(con):
    """derive_transcripts (Ray) must equal TRANSCRIPTS_CTE (SQL) exactly."""
    from vaero_ray.pipelines.derived import TRANSCRIPTS_CTE, derive_transcripts

    got = (
        derive_transcripts(SF)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    want = (
        con.execute(f"WITH {TRANSCRIPTS_CTE} SELECT * FROM transcripts")
        .fetchdf()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    assert got.equals(want)
