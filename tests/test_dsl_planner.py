"""DSL graph-building + planner flattening parity with the reference DSL
(/root/reference/vaero/stream.py:111-162 linked-list -> array IR)."""

from vaero_ray.dsl import Vaero
from vaero_ray.planner import Planner, plan_graph


def setup_function(_):
    Vaero.reset()


def test_linear_graph():
    Vaero().source("random", 3).rename("hostname", "host").add("newfield", "Hello, world!").sink(
        "stdout", batch_max_time=3
    )
    graph = Vaero.start()
    assert [n["type"] for n in graph] == ["source", "tn", "tn", "sink"]
    plan = plan_graph(graph)
    assert plan.source.op == "random"
    assert plan.source.args["interval"] == 3
    assert len(plan.branches) == 1
    b = plan.branches[0]
    assert b.transforms == [
        ("rename", {"path": "hostname", "new_path": "host"}),
        ("add", {"path": "newfield", "value": "Hello, world!"}),
    ]
    assert b.sink.op == "stdout"
    assert b.sink.args["batch_max_time"] == 3


def test_fanout_graph_route_pipe():
    # pipelines/route_pipe.py: two sinks off one intermediate
    result = Vaero().source("random", 3).rename("hostname", "host")
    result.sink("stdout", batch_max_time=5)
    result.add("newfield", "Hello, world!").sink("stdout", batch_max_time=3)
    plan = plan_graph(Vaero.start())
    assert len(plan.branches) == 2
    assert plan.branches[0].transforms == [("rename", {"path": "hostname", "new_path": "host"})]
    assert plan.branches[1].transforms[-1] == ("add", {"path": "newfield", "value": "Hello, world!"})


def test_complex_pipe_four_sinks():
    # pipelines/complex_pipe.py: nested fan-out, 5 sinks
    vs = Vaero()
    result = vs.source("random").add("newfield", 42)
    result2 = result.delete("severity").rename("hostname", "myhost")
    result.sink("stdout", batch_max_time=3)
    result2.sink("stdout", batch_max_time=3)
    result2.rename("msg", "mymessage").sink("datadog", batch_max_time=3)
    result3 = result2.add("author", "Douglas Adams").add("title", "Hitchhiker's Guide to the Galaxy")
    result3.rename("severity", "myseverity").sink("elastic", batch_max_time=3)
    result.add("author", "Stan Lee").add("title", "Spiderman").sink("splunk", batch_max_time=3)
    plan = plan_graph(Vaero.start())
    assert len(plan.branches) == 5
    sinks = [b.sink.op for b in plan.branches]
    assert sorted(sinks) == ["datadog", "elastic", "splunk", "stdout", "stdout"]
    # every branch carries the shared prefix add(newfield, 42)
    for b in plan.branches:
        assert b.transforms[0] == ("add", {"path": "newfield", "value": 42})


def test_option_and_secret():
    Vaero().source("okta").option("interval", 10).secret(
        "./scripts/aws_secrets.py", [{"okta_token": "token"}], cache_time_seconds=2
    ).add("newfield", "x").sink("s3", bucket="b").option("batch_max_bytes", 50_000)
    plan = plan_graph(Vaero.start())
    assert plan.source.args["interval"] == 10
    assert plan.source.secret["command"] == "./scripts/aws_secrets.py"
    assert plan.branches[0].sink.args["batch_max_bytes"] == 50_000
    assert plan.branches[0].sink.args["bucket"] == "b"


def test_start_is_rerunnable():
    Vaero().source("random").add("a", 1).sink("stdout")
    g1 = Vaero.start()
    g2 = Vaero.start()
    assert g1 == g2  # linked_list_to_arr must not mutate the graph


def test_planner_compiled():
    Vaero().source("random").add("a", 1).sink("stdout")
    p = Planner(Vaero.start())
    fns = p.compiled()
    assert len(fns) == 1
    import pyarrow as pa

    out = fns[0][0](pa.table({"x": [1]}))
    assert out.column("a").to_pylist() == [1]
