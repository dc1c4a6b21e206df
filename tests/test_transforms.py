"""Operator unit oracles: Arrow kernels vs the pure-Python reference
interpreter, covering the edge semantics of SURVEY.md §2a / FIXTURES.md F3.
No Ray needed — kernels are pure pa.Table functions."""

import pyarrow as pa
import pyarrow.compute as pc
import pytest

from vaero_ray import transforms as T
from vaero_ray.sources import make_log_events, make_nested_events

from tests import oracle


def rows(tbl: pa.Table) -> list[dict]:
    return tbl.to_pylist()


def assert_matches_oracle(tbl, ops):
    got = rows(T.compile_chain(ops)(tbl))
    want = oracle.run_chain(rows(tbl), ops)
    assert got == want


EVENTS = make_log_events(32, seed=3)
NESTED = make_nested_events(24, seed=5)


@pytest.mark.parametrize(
    "ops",
    [
        [("add", {"path": "newfield", "value": 42})],
        [("add", {"path": "newfield", "value": "Hello, world!"})],
        [("add", {"path": "replay", "value": True})],
        [("add", {"path": "severity", "value": "overwritten"})],  # upsert
        [("delete", {"path": "severity"})],
        [("delete", {"path": "not_there"})],  # no-op
        [("rename", {"path": "hostname", "new_path": "myhost"})],
        [("rename", {"path": "missingcol", "new_path": "ghost"})],  # creates null
        [("filter_regexp", {"path": "severity", "regex": "^(info|alert)$"})],
        [("filter_regexp", {"path": "msg", "regex": "droids"})],
        [("filter_regexp", {"path": "missing", "regex": "^$"})],  # matches "" -> keep all
        [("filter_regexp", {"path": "missing", "regex": "x"})],  # drop all
        [("mask", {"path": "msg", "regex": r"o", "replace_expr": "0"})],
        [("mask", {"path": "missing", "regex": "x", "replace_expr": "y"})],  # creates ""
        [("mask", {"path": "msg", "regex": r"(\w+)!", "replace_expr": "<$1>"})],  # $1 group ref
        [("parse_regexp", {"path": "timestamp", "regex": r"(?P<year>\d{4})-(?P<month>\d{2})"})],
        [("select", {"path": "msg"})],
        [  # fused chain
            ("add", {"path": "newfield", "value": 42}),
            ("rename", {"path": "hostname", "new_path": "host"}),
            ("filter_regexp", {"path": "severity", "regex": "info|debug"}),
            ("mask", {"path": "msg", "regex": r"[aeiou]", "replace_expr": "*"}),
            ("delete", {"path": "f"}),
        ],
    ],
)
def test_against_oracle(ops):
    assert_matches_oracle(EVENTS, ops)


@pytest.mark.parametrize(
    "ops",
    [
        [("filter_regexp", {"path": "actor.id", "regex": "00u73"})],
        [("mask", {"path": "actor.alternateId", "regex": "^[^@]+", "replace_expr": "MASKED"})],
        [("delete", {"path": "actor.id"})],
        [("rename", {"path": "actor.id", "new_path": "actorid"})],
        [("add", {"path": "actor.source", "value": "okta"})],
        [("select", {"path": "actor.alternateId"})],
        [  # okta_pipe.py transform chain
            ("add", {"path": "newfield", "value": "Hello, world!"}),
            ("filter_regexp", {"path": "actor.id", "regex": "00u73*"}),
            ("mask", {"path": "actor.alternateId", "regex": "^[^@]+", "replace_expr": "MASKED"}),
        ],
    ],
)
def test_nested_paths_against_oracle(ops):
    assert_matches_oracle(NESTED, ops)


def test_parse_regexp_nonmatch_yields_nulls():
    """Documented deviation: reference panics on non-match
    (/root/reference/transform/parse_regexp.go:30); we emit nulls."""
    tbl = pa.table({"text": ["a@b.com", "nomatch"]})
    out = T.parse_regexp(tbl, "text", r"(?P<user>\w+)@(?P<dom>[\w.]+)")
    assert out.column("user").to_pylist() == ["a", None]
    assert out.column("dom").to_pylist() == ["b.com", None]


def test_mask_numeric_and_bool_string_form():
    tbl = pa.table({"n": [42.0, 3.5], "b": [True, False]})
    out = T.mask(tbl, "n", r"^42$", "X")
    assert out.column("n").to_pylist() == ["X", "3.5"]
    out2 = T.mask(tbl, "b", "true", "yes")
    assert out2.column("b").to_pylist() == ["yes", "false"]


def test_go_replacement_translation():
    assert T.go_replacement_to_re2(r"(\d+)", "<$1>") == r"<\1>"
    assert T.go_replacement_to_re2(r"(?P<x>\d+)", "${x}!") == "\\1!"
    assert T.go_replacement_to_re2(r"(\d+)", "$$1") == "$1"


def test_output_schema_propagation():
    ops = [
        ("add", {"path": "k", "value": 1}),
        ("parse_regexp", {"path": "msg", "regex": r"(?P<w>\w+)"}),
        ("delete", {"path": "t"}),
    ]
    fn = T.compile_chain(ops)
    sch = T.output_schema(fn, EVENTS.schema)
    assert sch.field("k").type == pa.int64()
    assert sch.field("w").type == pa.string()
    assert "t" not in sch.names
    # fused fn output schema equals the propagated schema on real data
    assert fn(EVENTS).schema == sch


def test_select_string_form():
    tbl = pa.table({"a": [1, 2]})
    out = T.select(tbl, "a")
    assert out.column_names == ["a"]
    assert out.column("a").to_pylist() == ["1", "2"]


def test_parse_json_promotes_fields():
    import pyarrow as pa

    from vaero_ray.transforms import parse_json

    t = pa.table(
        {
            "event_id": [1, 2, 3, 4],
            "props": ['{"k": 69}', '{"k": 2, "nested": {"x": "y"}}', None, "   "],
        }
    )
    out = parse_json(t, "props")
    assert out.column("k").to_pylist() == [69, 2, None, None]
    # nested objects land as struct columns the path helpers can read
    from vaero_ray.paths import get_path

    nested_x = get_path(out, "nested.x")
    assert nested_x.to_pylist() == [None, "y", None, None]
    # empty batch passes through unchanged (schema unknowable without rows)
    assert parse_json(t.slice(0, 0), "props").column_names == ["event_id", "props"]


def test_parse_json_multiline_and_invalid():
    import pyarrow as pa
    import pytest

    from vaero_ray.transforms import parse_json

    # pretty-printed (raw newlines BETWEEN tokens) is lossless to flatten
    t = pa.table({"props": ['{\n  "k": 1\n}']})
    assert parse_json(t, "props").column("k").to_pylist() == [1]
    # invalid JSON fails the batch loudly (documented deviation from gjson)
    bad = pa.table({"props": ["{not json"]})
    with pytest.raises(Exception):
        parse_json(bad, "props")


def test_parse_json_dsl_roundtrip():
    from vaero_ray.dsl import Vaero

    Vaero.reset()
    Vaero().source("random").parse_json("props").sink("stdout")
    graph = Vaero.start()
    ops = [n["op"] for n in graph if isinstance(n, dict) and n.get("type") == "tn"]
    assert "parse_json" in ops
