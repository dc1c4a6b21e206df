"""Job lifecycle registry (reference cmd/util.go add/start/stop/list/
detail/delete semantics over a JSON registry dir)."""

from __future__ import annotations

import time

import pyarrow as pa
import pyarrow.parquet as pq

from vaero_ray.dsl import Vaero
from vaero_ray.registry import JobRegistry


def _write_chunk(d, seq, n=4, base=0):
    tbl = pa.table(
        {
            "timestamp": pa.array(["2026-01-02T03:04:05Z"] * n),
            "v": pa.array(range(base, base + n), pa.int64()),
        }
    )
    d.mkdir(parents=True, exist_ok=True)
    pq.write_table(tbl, d / f"chunk-{seq:04d}.parquet")


def _graph(tag):
    Vaero.reset()
    v = Vaero().source("random", interval=0)
    v.add("tag", tag).sink("stdout")
    return Vaero.start()


def test_registry_lifecycle(tmp_path, ray_session):
    reg = JobRegistry(str(tmp_path / "reg"))

    in1, in2 = tmp_path / "in1", tmp_path / "in2"
    _write_chunk(in1, 0)
    _write_chunk(in2, 0)

    j1 = reg.add(_graph("one"), spec="spec_one.py")
    j2 = reg.add(_graph("two"), spec="spec_two.py")
    assert [e["id"] for e in reg.list()] == [j1, j2]
    assert all(e["status"] == "staged" for e in reg.list())
    assert reg.detail(j1)["spec"] == "spec_one.py"

    started = reg.start(input_dirs={j1: str(in1), j2: str(in2)})
    assert sorted(started) == [j1, j2]

    # both jobs consume their first chunk
    deadline = time.monotonic() + 180
    while time.monotonic() < deadline:
        try:
            if (
                reg.committed_output(j1).count() == 4
                and reg.committed_output(j2).count() == 4
            ):
                break
        except ValueError:
            pass
        time.sleep(0.2)
    out1 = reg.committed_output(j1).to_pandas()
    assert (out1["tag"] == "one").all() and len(out1) == 4

    # stop job 1 mid-stream; job 2 keeps consuming new chunks
    assert reg.stop(j1)
    reg.wait(j1, timeout_s=60)
    assert reg.detail(j1)["status"] == "stopped"

    _write_chunk(in1, 1, base=100)  # arrives after the stop: never consumed
    _write_chunk(in2, 1, base=100)
    deadline = time.monotonic() + 180
    while time.monotonic() < deadline:
        if reg.committed_output(j2).count() == 8:
            break
        time.sleep(0.2)
    assert reg.committed_output(j2).count() == 8
    assert reg.committed_output(j1).count() == 4  # stopped: untouched
    assert reg.detail(j2)["status"] == "running"

    # delete stops and removes
    assert reg.delete(j2)
    assert reg.detail(j2) is None
    assert [e["id"] for e in reg.list()] == [j1]

    # unknown ids are no-ops (reference prints not-found)
    assert not reg.stop(999)
    assert not reg.delete(999)
