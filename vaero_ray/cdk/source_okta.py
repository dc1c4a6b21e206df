"""Concrete Okta System Log connector — the reference's flagship real
pull source, re-expressed on this CDK's HTTPConnector ABC.

Semantics mirrored from /root/reference/integrations/python/source_okta.py:

- auth header ``SSWS {token}`` (:33-34)
- endpoint ``/api/v1/logs`` with ``sortOrder=ASCENDING`` (:66-71)
- cursor = ``{"since": iso}``; default since = now - 91 days (Okta stores
  90 days, :80-86)
- pagination: Okta returns a ``Link`` header with ``rel="next"`` whose
  ``after`` query param is the next-page token; the System Log API always
  returns a next link on polling queries, so pagination stops when no
  RETURNED event is at-or-after the cursor (:44-63)
- Okta may return events slightly before ``since``: responses are
  filtered to ``published >= cursor`` (:97-104)
- cursor advance: events are NOT guaranteed ascending, so the new cursor
  is max(published) + 1 millisecond (:116-130)

No third-party deps: iso parsing via ``datetime.fromisoformat`` (Z
handled), Link header parsed with a small regex. The transport is
injectable, so tests drive the full pagination/cursor/429-backoff
contract with a fake server and zero network.
"""

from __future__ import annotations

import re
from datetime import datetime, timedelta, timezone
from typing import Any, Callable
from urllib.parse import parse_qs, urlparse

from vaero_ray.cdk.http_connector import HTTPConnector, jsonarray_event_breaker

_LINK_NEXT_RE = re.compile(r'<([^>]+)>\s*;\s*rel="next"')


def _parse_iso(s: str) -> datetime:
    dt = datetime.fromisoformat(s.replace("Z", "+00:00"))
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    return dt


_EPOCH = datetime.min.replace(tzinfo=timezone.utc)


class OktaSource(HTTPConnector):
    def __init__(
        self,
        host: str,
        token: str = "",
        name: str = "okta",
        now_fn: Callable[[], datetime] | None = None,
        **kw,
    ):
        super().__init__(host, token, **kw)
        self.name = name
        self._now = now_fn or (lambda: datetime.now(timezone.utc))

    # reference source_okta.py:33-34 — Okta uses the SSWS scheme
    def headers(self) -> dict:
        return {"Authorization": f"SSWS {self.token}"} if self.token else {}

    def subpath(self) -> str:
        return "/api/v1/logs"

    def get_request_params(self, cursor_value: Any, page_token: Any) -> dict:
        params: dict = {"sortOrder": "ASCENDING"}
        if page_token:
            params.update(page_token)
        if cursor_value and cursor_value.get("since"):
            params.update(cursor_value)
        else:
            # default 91 days back (Okta stores 90; reference :80-86)
            params["since"] = (self._now() - timedelta(days=91)).isoformat()
        self._effective_since = params["since"]
        return params

    def parse_response(self, body: str) -> tuple[list[dict], Any]:
        import json

        since = _parse_iso(self._effective_since) if getattr(self, "_effective_since", None) else _EPOCH
        events = [e for e in (json.loads(s) for s in jsonarray_event_breaker(body)) if _parse_iso(e["published"]) >= since]
        if not events:
            return [], None
        # events are not necessarily ascending: cursor = max(published)+1ms
        last = max(_parse_iso(e["published"]) for e in events)
        return events, {"since": (last + timedelta(milliseconds=1)).isoformat()}

    def get_next_page_token(self, status: int, body: str, events: list[dict]) -> Any:
        # stop when the page contributed nothing at/after the cursor
        # (the System Log API always sends a next link on polling queries)
        if not events:
            return None
        link = self.last_response_headers.get("link") or self.last_response_headers.get("Link")
        if not link:
            return None
        m = _LINK_NEXT_RE.search(link)
        if not m:
            return None
        after = parse_qs(urlparse(m.group(1)).query).get("after")
        return {"after": after[0]} if after else None
