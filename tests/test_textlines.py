"""Raw-text / JSON-lines source parity (reference: source_s3.go:74
newline split; http_server jsonarray breaker). The five demo transforms
run end-to-end over a plain .log fixture through the DSL + run_batch."""

import json

import pandas as pd
import pyarrow as pa

from vaero_ray import Vaero, run_batch
from vaero_ray.sources.textlines import (
    jsonlines_to_columns,
    read_jsonl_events,
    read_text_events,
)


def _write_jsonl(path, rows):
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_read_text_events_one_message_per_line(ray_session, tmp_path):
    p = tmp_path / "a.log"
    p.write_text("first line\nsecond line\nthird line\n")
    out = read_text_events(str(p)).to_pandas()
    assert sorted(out["message"]) == ["first line", "second line", "third line"]


def test_jsonl_breaker_scalars_and_nested(ray_session, tmp_path):
    p = tmp_path / "ev.log"
    _write_jsonl(
        p,
        [
            {"user": "u1", "n": 1, "meta": {"ip": "10.0.0.1"}, "tags": ["a", "b"]},
            {"user": "u2", "n": 2, "meta": {"ip": "10.0.0.2"}, "tags": []},
        ],
    )
    out = read_jsonl_events(str(p)).to_pandas()
    assert out["user"].tolist() == ["u1", "u2"]
    assert out["n"].tolist() == [1, 2]
    # nested values are compact JSON strings (engine event convention)
    assert json.loads(out["meta"].iloc[0]) == {"ip": "10.0.0.1"}
    assert out["tags"].tolist() == ['["a","b"]', "[]"]


def test_jsonl_breaker_non_json_falls_back_to_message():
    tbl = pa.table({"message": ["plain text line", "another one"]})
    out = jsonlines_to_columns(tbl)
    assert out.column_names == ["message"]
    assert out.column("message").to_pylist() == ["plain text line", "another one"]


def test_five_demo_transforms_over_text_fixture(ray_session, tmp_path):
    """End-to-end: a bucket of .log files -> jsonl source -> the five
    reference demo transforms (add, delete+rename, filter_regexp, mask,
    parse_regexp+select) -> collected sink."""
    logdir = tmp_path / "logs"
    logdir.mkdir()
    rows = [
        {
            "user": f"user{i}@corp.example",
            "role": "user" if i % 2 == 0 else "assistant",
            "req": f"GET /api/v{i % 3}/items status={200 + (i % 2) * 300}",
            "tmp": i,
        }
        for i in range(10)
    ]
    _write_jsonl(logdir / "a.log", rows[:5])
    _write_jsonl(logdir / "b.log", rows[5:])

    Vaero.reset()
    src = Vaero().source("jsonl", path=str(logdir))
    (
        src.add("env", "prod")                               # add
        .rename("tmp", "seq")                                # rename
        .filter_regexp("role", "^user$")                     # filter_regexp
        .mask("user", r"user(\d+)@", "u$1@")                 # mask
        .parse_regexp("req", r"status=(?P<status>\d+)")      # parse_regexp
        .sink("stdout")
    )
    src.select("user").sink("stdout")                        # select (branch 2)
    res = run_batch(Vaero.start())
    full, sel = list(res.values())
    df = full.to_pandas()
    assert len(df) == 5  # only role == user survives
    assert set(df["env"]) == {"prod"}
    assert "seq" in df.columns and "tmp" not in df.columns
    assert df["user"].str.match(r"u\d+@corp\.example").all()
    assert set(df["status"]) == {"200"}  # even i -> status 200
    sdf = sel.to_pandas()
    assert sdf.columns.tolist() == ["user"] and len(sdf) == 10


def test_csv_source_runs_transform_chain(tmp_path, ray_session):
    """Header CSV -> typed columns -> the demo transform chain (source
    format breadth: csv joins parquet/text/jsonl in resolve_source)."""
    csvdir = tmp_path / "csv"
    csvdir.mkdir()
    for name, lo, hi in (("a.csv", 0, 5), ("b.csv", 5, 10)):
        with open(csvdir / name, "w") as fh:
            fh.write("user,role,seq\n")
            for i in range(lo, hi):
                fh.write(f"user{i}@corp.example,{'user' if i % 2 == 0 else 'assistant'},{i}\n")

    Vaero.reset()
    src = Vaero().source("csv", path=str(csvdir))
    (
        src.add("env", "prod")
        .filter_regexp("role", "^user$")
        .mask("user", r"user(\d+)@", "u$1@")
        .sink("stdout")
    )
    res = run_batch(Vaero.start())
    df = list(res.values())[0].to_pandas()
    assert len(df) == 5
    assert df["seq"].dtype.kind == "i"  # Arrow CSV typed the int column
    assert df["user"].str.match(r"u\d+@corp\.example").all()
    assert set(df["env"]) == {"prod"}
