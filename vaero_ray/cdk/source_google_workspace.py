"""Google Workspace (Admin Reports API) connector — the reference's
second Python connector, re-expressed on this CDK's HTTPConnector ABC.

Semantics mirrored from
/root/reference/integrations/python/source_google_workspace.py:

- iterates a configured list of "applications" (admin, login, saml,
  user_accounts), one Reports endpoint per app
  (``v1/activity/users/all/applications/{app}``, :208-226)
- body-token pagination (``nextPageToken``); when an app's pages are
  exhausted the connector advances to the next app via the sentinel
  ``__FLAG__`` token (:187-205)
- per-app cursor = epoch seconds; query interval is
  [cursor[app], init_time - reporting_lag(app)) in RFC3339, because
  Google's reports lag behind real time (:229-266, lag table :34-41);
  after an app completes its cursor advances to the interval end
- default cursor: six months back (Google's retention window, :48-63)
- auth: service-account JWT -> bearer token. RS256 signing needs the
  ``jwt`` package (absent in this container), so the real exchange is
  stubbed behind an injectable ``token_provider``; the JWT claim set is
  still constructed per the reference (:146-171) so a real deployment
  only supplies the signer.
"""

from __future__ import annotations

from datetime import datetime, timedelta, timezone
from typing import Any, Callable

from vaero_ray.cdk.http_connector import HTTPConnector

_FLAG = "__FLAG__"

# reporting lags (seconds) — reference :34-41 / Google answer 7061566
REPORTING_LAGS = {
    "access_transparency": 600,
    "admin": 600,
    "mobile": 600,
    "login": 600,
    "saml": 600,
    "ldap": 600,
}
DEFAULT_APPS = ["admin", "login", "saml", "user_accounts"]
SCOPES = [
    "https://www.googleapis.com/auth/admin.reports.audit.readonly",
    "https://www.googleapis.com/auth/admin.reports.usage.readonly",
]


class GoogleWorkspaceSource(HTTPConnector):
    def __init__(
        self,
        host: str = "https://admin.googleapis.com/admin/reports",
        apps: list[str] | None = None,
        token_provider: Callable[[], str] | None = None,
        secrets: dict | None = None,
        now_fn: Callable[[], float] | None = None,
        max_results: int = 20,
        **kw,
    ):
        super().__init__(host, **kw)
        self.apps = list(apps or DEFAULT_APPS)
        self.token_provider = token_provider
        self.secrets = secrets or {}
        self.max_results = max_results
        import time as _time

        self._now = now_fn or _time.time
        self._app_idx = 0
        self._cursor_work: dict = {}
        self._init_time = 0.0

    # -- auth ----------------------------------------------------------
    def authorize(self) -> str:
        """Bearer token: injected provider, else the reference's
        service-account JWT exchange (needs the ``jwt`` package and
        network — stubbed in this container)."""
        if self.token_provider is not None:
            return self.token_provider()
        auth_file = self.secrets.get("auth_file", {})
        missing = [k for k in ("client_email", "private_key", "type") if k not in auth_file]
        if missing or auth_file.get("type") != "service_account" or "@" not in self.secrets.get("email", ""):
            raise ValueError(f"google_workspace: bad service-account config (missing {missing})")
        now = int(self._now())
        claims = {  # reference :146-156
            "iss": auth_file["client_email"],
            "scope": " ".join(SCOPES),
            "aud": "https://www.googleapis.com/oauth2/v4/token",
            "exp": now + 3599,
            "iat": now,
            "sub": self.secrets["email"],
        }
        try:  # pragma: no cover - jwt not installed in this container
            import jwt  # type: ignore

            assertion = jwt.encode(claims, auth_file["private_key"], algorithm="RS256")
        except ImportError as e:
            raise NotImplementedError(
                "service-account JWT signing needs the 'jwt' package; inject token_provider"
            ) from e
        raise NotImplementedError(  # pragma: no cover - needs network
            f"wire the oauth2/v4/token exchange here (assertion built: {len(assertion)} bytes)"
        )

    def headers(self) -> dict:
        tok = self.authorize()
        return {"Authorization": f"Bearer {tok}", "Accept": "application/json"}

    # -- paging across applications ------------------------------------
    def _current_app(self) -> str:
        return self.apps[self._app_idx]

    def _six_months_ago(self) -> float:
        return (datetime.fromtimestamp(self._now(), tz=timezone.utc) - timedelta(days=183)).timestamp()

    def subpath(self) -> str:
        return f"/v1/activity/users/all/applications/{self._current_app()}"

    def get_request_params(self, cursor_value: Any, page_token: Any) -> dict:
        if page_token is None:  # fresh poll: reset app iteration + working cursor
            self._app_idx = 0
            self._cursor_work = dict(cursor_value or {})
            self._init_time = float(self._now())
        app = self._current_app()
        if app not in self._cursor_work:
            self._cursor_work[app] = self._six_months_ago()
        start = datetime.fromtimestamp(self._cursor_work[app], tz=timezone.utc)
        end = datetime.fromtimestamp(
            self._init_time - REPORTING_LAGS.get(app, 600), tz=timezone.utc
        )
        params = {
            "maxResults": self.max_results,
            "startTime": start.replace(tzinfo=None).isoformat() + "Z",
            "endTime": end.replace(tzinfo=None).isoformat() + "Z",
        }
        if page_token and page_token != _FLAG:
            params["pageToken"] = page_token
        return params

    def parse_response(self, body: str) -> tuple[list[dict], Any]:
        import json

        js = json.loads(body)
        # the SAME dict object is returned every page: later per-app cursor
        # advances in get_next_page_token are visible when the base loop
        # persists the final cursor
        return js.get("items", []), self._cursor_work

    def get_next_page_token(self, status: int, body: str, events: list[dict]) -> Any:
        import json

        tok = json.loads(body).get("nextPageToken")
        if tok is None:
            # this app is exhausted: advance its cursor to the interval end
            app = self._current_app()
            self._cursor_work[app] = self._init_time - REPORTING_LAGS.get(app, 600)
            if self._app_idx < len(self.apps) - 1:
                self._app_idx += 1
                return _FLAG
            return None
        return tok
