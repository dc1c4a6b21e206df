"""HTTPConnector ABC — the CDK's paginated pull-source surface.

Mirrors the reference's abstract surface exactly
(/root/reference/vaero_cdk/http_connector.py:68-99): subclasses implement
``get_next_page_token`` / ``subpath`` / ``get_request_params`` /
``parse_response``; the base class drives the pagination loop with steady
rate limiting, backoff retries, and an incremental cursor persisted
around each poll (:220-237). The okta connector pattern (cursor advance =
max(published) + 1ms, /root/reference/integrations/python/source_okta.py:116-130)
is expressible unchanged.

``transport`` is injectable: any callable
``(url, params, headers) -> (status:int, body:str)``. The default uses
urllib (no third-party deps); tests inject fakes — no network needed.
"""

from __future__ import annotations

import json
from abc import ABC, abstractmethod
from typing import Any, Callable, Iterable

from vaero_ray.cdk.cursor import ApiCursor
from vaero_ray.cdk.rate_limiters import BackoffRateLimiter, SteadyRateLimiter

Transport = Callable[[str, dict, dict], tuple[int, str]]


class HTTPError(Exception):
    pass


def urllib_transport(url: str, params: dict, headers: dict) -> tuple[int, str]:
    import urllib.error
    import urllib.parse
    import urllib.request

    if params:
        url = f"{url}?{urllib.parse.urlencode(params)}"
    req = urllib.request.Request(url, headers=headers)
    try:
        with urllib.request.urlopen(req, timeout=30) as resp:
            return resp.status, resp.read().decode("utf-8", "replace")
    except urllib.error.HTTPError as e:  # pragma: no cover - needs network
        return e.code, e.read().decode("utf-8", "replace")


class HTTPConnector(ABC):
    def __init__(
        self,
        host: str,
        token: str = "",
        cursor: ApiCursor | None = None,
        max_calls_per_period: int = 60,
        limit_period: float = 60.0,
        max_retries: int = 6,
        transport: Transport = urllib_transport,
        clock=None,
        sleep=None,
    ):
        kw = {}
        if clock is not None:
            kw["clock"] = clock
        if sleep is not None:
            kw["sleep"] = sleep
        self.host = host.rstrip("/")
        self.token = token
        self.cursor = cursor
        self.steady = SteadyRateLimiter(max_calls_per_period, limit_period, **kw)
        self.backoff = BackoffRateLimiter(max_retries=max_retries, **({"sleep": sleep} if sleep else {}))
        self.transport = transport
        self.last_response_headers: dict = {}

    # -- abstract surface (reference http_connector.py:68-99) ----------
    @abstractmethod
    def subpath(self) -> str:
        """Path under host, e.g. '/api/v1/logs'."""

    @abstractmethod
    def get_request_params(self, cursor_value: Any, page_token: Any) -> dict:
        """Query params for the next request given cursor + page token."""

    @abstractmethod
    def parse_response(self, body: str) -> tuple[list[dict], Any]:
        """Body -> (events, new_cursor_value_or_None)."""

    @abstractmethod
    def get_next_page_token(self, status: int, body: str, events: list[dict]) -> Any:
        """Pagination token for the next page, or None to stop."""

    def headers(self) -> dict:
        return {"Authorization": f"Bearer {self.token}"} if self.token else {}

    # -- the poll loop (reference http_connector.py:190-237) -----------
    def poll(self, max_pages: int = 100) -> list[dict]:
        """One poll: read cursor, page until exhausted, write cursor."""
        cursor_value = self.cursor.read() if self.cursor else None
        events: list[dict] = []
        page_token = None
        new_cursor = cursor_value
        for _ in range(max_pages):
            self.steady.wait()
            params = self.get_request_params(cursor_value, page_token)
            # subpath per request (reference http_connector.py:208): it can
            # depend on pagination state (google_workspace iterates apps)
            url = self.host + self.subpath()

            status_body: dict[str, Any] = {}

            def do_request():
                res = self.transport(url, params, self.headers())
                # transports may return (status, body) or (status, body,
                # response_headers) — Okta-style Link pagination needs the
                # headers (reference source_okta.py:36-63 reads rel=next)
                s, b = res[0], res[1]
                status_body["status"], status_body["body"] = s, b
                self.last_response_headers = dict(res[2]) if len(res) > 2 else {}
                return s, b

            body = self.backoff.call(do_request)
            page_events, cursor_candidate = self.parse_response(body)
            events.extend(page_events)
            if cursor_candidate is not None:
                new_cursor = cursor_candidate
            page_token = self.get_next_page_token(status_body["status"], body, page_events)
            if page_token is None:
                break
        if self.cursor and new_cursor != cursor_value:
            self.cursor.write(new_cursor)
        return events


def jsonarray_event_breaker(body: str) -> list[str]:
    """Split a JSON-array body into per-event JSON strings — semantics of
    the reference's brace-depth splitter
    (/root/reference/integrations/sources/source_python.go:71-103), which
    only handled arrays of objects. Parse-and-redump keeps each event a
    compact JSON object string."""
    arr = json.loads(body)
    if not isinstance(arr, list):
        raise HTTPError("jsonarray event breaker expects a JSON array body")
    return [json.dumps(e, separators=(",", ":"), sort_keys=False) for e in arr]
