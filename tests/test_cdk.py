"""Connector CDK + secrets tests (no network — fake transports/clocks).

Oracle: the reference CDK semantics (SURVEY.md §2a user-extension
surface): steady pacing, backoff on 429/5xx with give-up on other 4xx,
cursor persisted around polls (okta pattern: max(published)+1ms), and the
secret subprocess protocol (JSON map on stdin -> JSON values on stdout).
"""

from __future__ import annotations

import json
import os

import pytest

from vaero_ray.cdk import ApiCursor, BackoffRateLimiter, GiveUpError, HTTPConnector, SteadyRateLimiter
from vaero_ray.cdk.http_connector import jsonarray_event_breaker
from vaero_ray.cdk.pull_driver import PullSourceDriver, events_to_table
from vaero_ray.secrets import SecretResolver


class FakeClock:
    def __init__(self):
        self.t = 0.0
        self.sleeps = []

    def clock(self):
        return self.t

    def sleep(self, s):
        self.sleeps.append(s)
        self.t += s


def test_steady_rate_limiter_paces():
    fc = FakeClock()
    rl = SteadyRateLimiter(max_calls_per_period=2, limit_period=10, clock=fc.clock, sleep=fc.sleep)
    rl.wait()  # first call free
    rl.wait()  # must wait the 5 s slot
    assert fc.sleeps == [5.0]
    fc.t += 7.0
    rl.wait()  # 7 s already elapsed > slot -> no sleep
    assert fc.sleeps == [5.0]


def test_backoff_retries_then_succeeds():
    fc = FakeClock()
    rl = BackoffRateLimiter(max_retries=6, base_delay=1.0, sleep=fc.sleep)
    statuses = iter([429, 503, 200])

    out = rl.call(lambda: (next(statuses), "ok"))
    assert out == "ok"
    assert fc.sleeps == [1.0, 2.0]  # exponential


def test_backoff_gives_up_on_4xx_immediately():
    rl = BackoffRateLimiter(max_retries=6, sleep=lambda s: None)
    with pytest.raises(GiveUpError) as e:
        rl.call(lambda: (403, "forbidden"))
    assert e.value.attempts == 1


def test_backoff_exhausts_retries():
    rl = BackoffRateLimiter(max_retries=2, base_delay=0, sleep=lambda s: None)
    with pytest.raises(GiveUpError) as e:
        rl.call(lambda: (500, "boom"))
    assert e.value.attempts == 3  # initial + 2 retries


class OktaLike(HTTPConnector):
    """Paginated connector with okta-style cursor advance
    (max(published)+1, source_okta.py:116-130 pattern)."""

    def __init__(self, pages, **kw):
        self.pages = pages  # list of list[event]
        self._served = 0
        super().__init__("https://example.test", transport=self._fake_transport, **kw)

    def _fake_transport(self, url, params, headers):
        # 'since' param filters events (incremental sync)
        since = params.get("since", -1)
        if self._served >= len(self.pages):
            return 200, json.dumps([])
        page = [e for e in self.pages[self._served] if e["published"] >= since]
        self._served += 1
        return 200, json.dumps(page)

    def subpath(self):
        return "/api/v1/logs"

    def get_request_params(self, cursor_value, page_token):
        p = {}
        if cursor_value is not None:
            p["since"] = cursor_value
        if page_token is not None:
            p["page"] = page_token
        return p

    def parse_response(self, body):
        events = json.loads(body)
        if not events:
            return [], None
        return events, max(e["published"] for e in events) + 1

    def get_next_page_token(self, status, body, events):
        return None if not events else self._served


def test_connector_poll_and_cursor(tmp_path):
    cur = ApiCursor(str(tmp_path / "cursor.json"))
    pages = [
        [{"id": 1, "published": 10}, {"id": 2, "published": 20}],
        [{"id": 3, "published": 30}],
    ]
    c = OktaLike(pages, cursor=cur, sleep=lambda s: None, clock=lambda: 0.0)
    events = c.poll()
    assert [e["id"] for e in events] == [1, 2, 3]
    assert cur.read() == 31  # max(published)+1 persisted

    # next poll resumes from cursor: nothing new
    c2 = OktaLike([[{"id": 2, "published": 20}]], cursor=cur, sleep=lambda s: None, clock=lambda: 0.0)
    assert c2.poll() == []  # filtered by since=31


def test_jsonarray_event_breaker():
    body = '[{"a": 1, "b": {"c": 2}}, {"a": 2}]'
    events = jsonarray_event_breaker(body)
    assert len(events) == 2
    assert json.loads(events[0])["b"]["c"] == 2
    with pytest.raises(Exception):
        jsonarray_event_breaker('{"not": "array"}')


def test_pull_driver_lands_chunks(tmp_path):
    pages = [[{"id": 1, "published": 10, "meta": {"x": 1}}], [{"id": 2, "published": 20}]]
    c = OktaLike(pages, sleep=lambda s: None, clock=lambda: 0.0)
    fc = FakeClock()
    d = PullSourceDriver(c, str(tmp_path / "stream"), interval_s=10, sleep=fc.sleep, clock=fc.clock)
    written = d.run(max_polls=1)
    assert len(written) == 1
    import pyarrow.parquet as pq

    t = pq.read_table(written[0])
    assert t.num_rows == 2
    assert json.loads(t.column("meta")[0].as_py()) == {"x": 1}  # nested kept as JSON
    # sequence numbering resumes after restart
    d2 = PullSourceDriver(c, str(tmp_path / "stream"), interval_s=10, sleep=fc.sleep, clock=fc.clock)
    assert d2._seq == 1


def test_secret_resolver(tmp_path):
    # Protocol-conforming provider (mirrors scripts/aws_secrets.py): stdin is
    # the LIST of {secret_name: arg_name} pairs; stdout is keyed by ARG name.
    provider = tmp_path / "provider.py"
    provider.write_text(
        "import sys, json\n"
        "pairs = json.load(sys.stdin)\n"
        "out = {}\n"
        "for pair in pairs:\n"
        "    for secret_name, arg_name in pair.items():\n"
        "        out[arg_name] = f'val-{secret_name}'\n"
        "print(json.dumps(out))\n"
    )
    spec = {
        "command": f"python {provider}",
        "secrets": [{"api_token": "token"}, {"db_pass": "password"}],
        "cache_time_seconds": 3600,
        "timeout_seconds": 10,
    }
    r = SecretResolver(spec)
    args = r.resolve_into({"host": "h"})
    assert args == {"host": "h", "token": "val-api_token", "password": "val-db_pass"}
    # cached: refresh within ttl is a no-op (same values, no re-exec needed)
    args2 = r.maybe_refresh(dict(args))
    assert args2 == args


def test_push_source_server(tmp_path):
    import urllib.request

    import pyarrow.parquet as pq

    from vaero_ray.cdk.push_server import PushSourceServer

    srv = PushSourceServer(str(tmp_path / "stream"), port=0, now_fn=lambda: 1_767_225_600.0).start()
    try:
        body = json.dumps([{"a": 1, "nested": {"b": 2}}, {"a": 2}]).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/logevent", data=body, method="POST"
        )
        with urllib.request.urlopen(req, timeout=10) as resp:
            assert resp.status == 200
        # 404 off-endpoint, 400 on non-array body (reference parity-ish)
        bad = urllib.request.Request(f"http://127.0.0.1:{srv.port}/other", data=body, method="POST")
        try:
            urllib.request.urlopen(bad, timeout=10)
            assert False
        except urllib.error.HTTPError as e:
            assert e.code == 404
    finally:
        srv.stop()
    files = sorted((tmp_path / "stream").glob("*.parquet"))
    assert len(files) == 1
    t = pq.read_table(files[0])
    assert t.num_rows == 2
    # auto fields: timestamp (RFC3339 of receive time) + remoteaddr
    assert t.column("timestamp")[0].as_py() == "2026-01-01T00:00:00Z"
    assert t.column("remoteaddr")[0].as_py() == "127.0.0.1"
    assert json.loads(t.column("nested")[0].as_py()) == {"b": 2}


# ------------------------------------------------------------------
# Concrete Okta connector (reference source_okta.py semantics)
# ------------------------------------------------------------------


class FakeOktaServer:
    """Two pages of system-log events + Link-header pagination + one 429.

    Events are deliberately OUT of published order (the reference notes
    Okta's ASCENDING sort is unreliable) to prove max(published)+1ms."""

    def __init__(self):
        self.events = [
            {"uuid": "e1", "published": "2024-01-01T00:00:01.000Z", "actor": "a"},
            {"uuid": "e3", "published": "2024-01-01T00:00:03.000Z", "actor": "c"},  # out of order
            {"uuid": "e2", "published": "2024-01-01T00:00:02.000Z", "actor": "b"},
            {"uuid": "e4", "published": "2024-01-01T00:00:04.000Z", "actor": "d"},
        ]
        self.calls = []
        self.rate_limited_once = False

    def transport(self, url, params, headers):
        self.calls.append((url, dict(params), dict(headers)))
        assert headers["Authorization"].startswith("SSWS ")
        if not self.rate_limited_once:
            self.rate_limited_once = True
            return 429, "slow down", {}
        since = params.get("since")
        from vaero_ray.cdk.source_okta import _parse_iso

        live = [e for e in self.events if _parse_iso(e["published"]) >= _parse_iso(since)]
        after = params.get("after")
        start = int(after) if after else 0
        page = live[start : start + 2]
        hdrs = {}
        if page:
            hdrs["link"] = f'<{url}?after={start + 2}>; rel="next"'
        return 200, json.dumps(page), hdrs


def test_okta_connector_pagination_cursor_and_backoff(tmp_path):
    from vaero_ray.cdk.source_okta import OktaSource

    srv = FakeOktaServer()
    fc = FakeClock()
    cur = ApiCursor(str(tmp_path / "okta_cursor.json"))
    src = OktaSource(
        host="https://example.okta.com",
        token="tok",
        cursor=cur,
        transport=srv.transport,
        clock=fc.clock,
        sleep=fc.sleep,
    )
    import datetime as dt

    src._now = lambda: dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
    events = src.poll()
    assert [e["uuid"] for e in events] == ["e1", "e3", "e2", "e4"]
    # 429 retried with backoff, then two pages + final empty page
    assert len(fc.sleeps) >= 1
    # cursor = max(published) + 1ms, persisted
    assert cur.read() == {"since": "2024-01-01T00:00:04.001000+00:00"}
    # restart: a NEW connector resumes from the stored cursor and sees
    # only later events
    srv.events.append({"uuid": "e5", "published": "2024-01-01T00:00:05.000Z", "actor": "e"})
    src2 = OktaSource(
        host="https://example.okta.com", token="tok", cursor=cur,
        transport=srv.transport, clock=fc.clock, sleep=fc.sleep,
    )
    assert [e["uuid"] for e in src2.poll()] == ["e5"]
    assert cur.read() == {"since": "2024-01-01T00:00:05.001000+00:00"}
    # drained: next poll returns nothing and leaves the cursor alone
    assert src2.poll() == []
    assert cur.read() == {"since": "2024-01-01T00:00:05.001000+00:00"}


def test_okta_to_streaming_job_end_to_end(tmp_path, ray_session):
    """Okta connector -> PullSourceDriver chunks -> StreamingTransformJob
    epochs: the reference's whole source->transform->sink path."""
    from vaero_ray.cdk.source_okta import OktaSource
    from vaero_ray.dsl import Vaero
    from vaero_ray.streaming.transform_job import StreamingTransformJob

    srv = FakeOktaServer()
    srv.rate_limited_once = True  # skip the 429 for this test
    fc = FakeClock()
    cur = ApiCursor(str(tmp_path / "cursor.json"))
    src = OktaSource(
        host="https://example.okta.com", token="tok", cursor=cur,
        transport=srv.transport, clock=fc.clock, sleep=fc.sleep,
    )
    import datetime as dt

    src._now = lambda: dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
    stream = tmp_path / "stream"
    d = PullSourceDriver(src, str(stream), interval_s=10, sleep=fc.sleep, clock=fc.clock)
    assert d.poll_once() is not None  # chunk-00000000.parquet

    graph = (
        Vaero()
        .source("okta")
        .add("kind", "auth")
        .rename("actor", "who")
        .sink("stdout", timestamp_key="published")
    ).start()
    job = StreamingTransformJob(
        input_dir=str(stream),
        out_dir=str(tmp_path / "out"),
        ckpt_dir=str(tmp_path / "ckpt"),
        graph=graph,
        extra_read_kw={},
    )
    ms = job.run()
    assert len(ms) == 1 and ms[0].rows_in == 4
    out = job.committed_output().to_pandas()
    assert set(out["who"]) == {"a", "b", "c", "d"}
    assert (out["kind"] == "auth").all()


# ------------------------------------------------------------------
# Google Workspace connector (reference source_google_workspace.py)
# ------------------------------------------------------------------


class FakeReportsServer:
    """Two applications, two pages each, body-token pagination."""

    def __init__(self):
        self.data = {
            "admin": [
                [{"id": {"time": "t1"}, "app": "admin", "n": 1}, {"id": {"time": "t2"}, "app": "admin", "n": 2}],
                [{"id": {"time": "t3"}, "app": "admin", "n": 3}],
            ],
            "login": [
                [{"id": {"time": "t4"}, "app": "login", "n": 4}],
            ],
        }
        self.calls = []

    def transport(self, url, params, headers):
        assert headers["Authorization"] == "Bearer fake-token"
        app = url.rsplit("/", 1)[-1]
        self.calls.append((app, dict(params)))
        pages = self.data.get(app, [[]])
        idx = int(params.get("pageToken", "p0")[1:]) if "pageToken" in params else 0
        page = pages[idx] if idx < len(pages) else []
        body = {"items": page}
        if idx + 1 < len(pages):
            body["nextPageToken"] = f"p{idx + 1}"
        return 200, json.dumps(body), {}


def test_google_workspace_multi_app_pagination_and_cursor(tmp_path):
    from vaero_ray.cdk.source_google_workspace import REPORTING_LAGS, GoogleWorkspaceSource

    srv = FakeReportsServer()
    fc = FakeClock()
    fc.t = 1_700_000_000.0
    cur = ApiCursor(str(tmp_path / "gw_cursor.json"))
    src = GoogleWorkspaceSource(
        apps=["admin", "login"],
        token_provider=lambda: "fake-token",
        cursor=cur,
        transport=srv.transport,
        now_fn=lambda: fc.t,
        clock=fc.clock,
        sleep=fc.sleep,
    )
    t0 = fc.t  # poll-start clock == the connector's captured init_time
    events = src.poll()
    assert [e["n"] for e in events] == [1, 2, 3, 4]  # both apps, all pages
    # every request carried an RFC3339 window ending at init - lag
    for app, params in srv.calls:
        assert params["startTime"].endswith("Z") and params["endTime"].endswith("Z")
    # per-app cursor advanced to init_time - lag and persisted
    stored = cur.read()
    assert stored["admin"] == t0 - REPORTING_LAGS["admin"]
    assert stored["login"] == t0 - REPORTING_LAGS["login"]
    # resume: second poll starts from the stored cursor (startTime == cursor)
    srv.calls.clear()
    src.poll()
    first_admin_params = srv.calls[0][1]
    from datetime import datetime, timezone

    got_start = datetime.fromisoformat(first_admin_params["startTime"].replace("Z", "+00:00"))
    assert got_start.timestamp() == stored["admin"]


def test_google_workspace_service_account_stub():
    from vaero_ray.cdk.source_google_workspace import GoogleWorkspaceSource

    src = GoogleWorkspaceSource(secrets={"email": "x"}, sleep=lambda s: None, clock=lambda: 0.0)
    with pytest.raises(ValueError):  # bad config caught before any signing
        src.authorize()
    src2 = GoogleWorkspaceSource(
        secrets={
            "email": "admin@corp.test",
            "auth_file": {"client_email": "svc@p.iam", "private_key": "k", "type": "service_account"},
        },
        sleep=lambda s: None,
        clock=lambda: 0.0,
    )
    with pytest.raises(NotImplementedError):  # jwt lib absent: clearly-marked stub
        src2.authorize()
