"""Integration oracles: the reference's five demo pipelines
(/root/reference/pipelines/*.py) recreated on our DSL, executed with the
Ray batch runner over fixture tables, compared row-for-row against the
pure-Python oracle interpreter."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from vaero_ray.dsl import Vaero
from vaero_ray.runner import run_batch
from vaero_ray.sources import make_log_events, make_nested_events

from tests import oracle


@pytest.fixture(autouse=True)
def _reset():
    Vaero.reset()
    yield
    Vaero.reset()


def sort_rows(rows, keys=None):
    return sorted(rows, key=lambda r: sorted((k, str(v)) for k, v in r.items()))


def oracle_branches(tbl: pa.Table, plan_branches):
    return [oracle.run_chain(tbl.to_pylist(), b.transforms) for b in plan_branches]


def test_pipe_py():
    # pipelines/pipe.py
    Vaero().source("random", 3).rename("hostname", "host").add("newfield", "Hello, world!").sink(
        "stdout", batch_max_time=3
    )
    graph = Vaero.start()
    tbl = make_log_events(64, seed=7)
    res = run_batch(graph, source_data=tbl)
    (got,) = res.values()
    from vaero_ray.planner import plan_graph

    want = oracle_branches(tbl, plan_graph(graph).branches)[0]
    assert sort_rows(got.to_pylist()) == sort_rows(want)


def test_route_pipe():
    # pipelines/route_pipe.py: fan-out, both branches must see the shared prefix
    result = Vaero().source("random", 3).rename("hostname", "host")
    result.sink("stdout", batch_max_time=5)
    result.add("newfield", "Hello, world!").sink("stdout", batch_max_time=3)
    graph = Vaero.start()
    tbl = make_log_events(48, seed=13)
    res = run_batch(graph, source_data=tbl)
    from vaero_ray.planner import plan_graph

    wants = oracle_branches(tbl, plan_graph(graph).branches)
    gots = list(res.values())
    assert len(gots) == 2
    for got, want in zip(gots, wants):
        assert sort_rows(got.to_pylist()) == sort_rows(want)


def test_complex_pipe():
    # pipelines/complex_pipe.py: 5 sinks, nested fan-out
    vs = Vaero()
    result = vs.source("random").add("newfield", 42)
    result2 = result.delete("severity").rename("hostname", "myhost")
    result.sink("stdout", batch_max_time=3)
    result2.sink("stdout", batch_max_time=3)
    result2.rename("msg", "mymessage").sink("datadog", batch_max_time=3)
    result3 = result2.add("author", "Douglas Adams").add("title", "Hitchhiker's Guide to the Galaxy")
    result3.rename("severity", "myseverity").sink("elastic", batch_max_time=3)
    result.add("author", "Stan Lee").add("title", "Spiderman").sink("splunk", batch_max_time=3)
    graph = Vaero.start()
    tbl = make_log_events(32, seed=21)
    res = run_batch(graph, source_data=tbl)
    from vaero_ray.planner import plan_graph

    wants = oracle_branches(tbl, plan_graph(graph).branches)
    assert len(res) == 5
    for got, want in zip(res.values(), wants):
        assert sort_rows(got.to_pylist()) == sort_rows(want)


def test_okta_pipe_chain():
    # pipelines/okta_pipe.py transform chain over nested actor events
    Vaero().source("random").add("newfield", "Hello, world!").filter_regexp("actor.id", "00u73*").mask(
        "actor.alternateId", "^[^@]+", "MASKED"
    ).sink("stdout")
    graph = Vaero.start()
    tbl = make_nested_events(40, seed=9)
    res = run_batch(graph, source_data=tbl)
    (got,) = res.values()
    from vaero_ray.planner import plan_graph

    want = oracle_branches(tbl, plan_graph(graph).branches)[0]
    assert sort_rows(got.to_pylist()) == sort_rows(want)
    # masked logins really masked
    assert all(r["actor"]["alternateId"].startswith("MASKED@") for r in got.to_pylist())


def test_replay_pipe_parquet_sink(tmp_path):
    # pipelines/replay_pipe.py: s3 -> add(replay) -> s3 with %Y/%m/%d prefix
    Vaero().source("random", 1200).add("replay", True).sink(
        "s3", timestamp_key="timestamp", filename_prefix="replay/%Y/%m/%d"
    )
    graph = Vaero.start()
    tbl = make_log_events(64, seed=17)
    res = run_batch(graph, source_data=tbl, out_dir=str(tmp_path))
    (path,) = res.values()
    out = pq.read_table(path)
    assert out.num_rows == 64
    assert set(out.column("replay").to_pylist()) == {True}
    # hive partitioning by derived prefix, multiple day partitions
    parts = {d for d in os.listdir(path) if d.startswith("vx_prefix=")}
    assert len(parts) >= 2
    assert all(p.startswith("vx_prefix=replay-2026-01-0") for p in parts)
