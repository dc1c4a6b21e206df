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

from vaero_ray.cdk.http_connector import HTTPConnector, HTTPError

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


TOKEN_URL = "https://www.googleapis.com/oauth2/v4/token"


def urllib_post_transport(url: str, params: dict, headers: dict) -> tuple[int, str]:
    """Form-POST transport for the OAuth token exchange (the read-path
    ``urllib_transport`` is GET-only)."""
    import urllib.error
    import urllib.parse
    import urllib.request

    data = urllib.parse.urlencode(params).encode()
    req = urllib.request.Request(url, data=data, headers=headers, method="POST")
    try:  # pragma: no cover - needs network
        with urllib.request.urlopen(req, timeout=30) as resp:
            return resp.status, resp.read().decode("utf-8", "replace")
    except urllib.error.HTTPError as e:  # pragma: no cover - needs network
        return e.code, e.read().decode("utf-8", "replace")


class GoogleWorkspaceSource(HTTPConnector):
    def __init__(
        self,
        host: str = "https://admin.googleapis.com/admin/reports",
        apps: list[str] | None = None,
        token_provider: Callable[[], str] | None = None,
        secrets: dict | None = None,
        now_fn: Callable[[], float] | None = None,
        max_results: int = 20,
        token_transport: Callable[..., tuple] | None = None,
        signer: Callable[[dict, str], str] | None = None,
        **kw,
    ):
        super().__init__(host, **kw)
        self.apps = list(apps or DEFAULT_APPS)
        self.token_provider = token_provider
        self.secrets = secrets or {}
        self.max_results = max_results
        self.token_transport = token_transport or urllib_post_transport
        self.signer = signer
        import time as _time

        self._now = now_fn or _time.time
        self._app_idx = 0
        self._cursor_work: dict = {}
        self._init_time = 0.0
        self._token: str | None = None
        self._token_expiry = 0.0
        # a 401 on the read path invalidates the cached token and retries
        # ONCE with a fresh exchange (reference re-authorizes per poll)
        self.transport = self._auth_refreshing(self.transport)

    # -- auth ----------------------------------------------------------
    def _auth_refreshing(self, inner):
        def t(url, params, headers):
            res = inner(url, params, headers)
            if res[0] == 401 and self.token_provider is None and self._token:
                self.invalidate_token()
                fresh = dict(headers)
                fresh["Authorization"] = f"Bearer {self.authorize()}"
                res = inner(url, params, fresh)
            return res

        return t

    def invalidate_token(self) -> None:
        self._token, self._token_expiry = None, 0.0

    def _sign(self, claims: dict, private_key: str) -> str:
        if self.signer is not None:
            return self.signer(claims, private_key)
        try:  # pragma: no cover - jwt not installed in this container
            import jwt  # type: ignore
        except ImportError as e:
            raise NotImplementedError(
                "service-account JWT signing needs the 'jwt' package; "
                "inject signer= or token_provider="
            ) from e
        return jwt.encode(claims, private_key, algorithm="RS256")  # pragma: no cover

    def authorize(self) -> str:
        """Bearer token: injected provider, else the reference's
        service-account flow — RS256-signed JWT assertion POSTed to
        ``oauth2/v4/token``, access token cached until expiry
        (reference :139-180)."""
        if self.token_provider is not None:
            return self.token_provider()
        now = float(self._now())
        if self._token and now < self._token_expiry - 60:
            return self._token
        auth_file = self.secrets.get("auth_file", {})
        missing = [k for k in ("client_email", "private_key", "type") if k not in auth_file]
        if missing or auth_file.get("type") != "service_account" or "@" not in self.secrets.get("email", ""):
            raise ValueError(f"google_workspace: bad service-account config (missing {missing})")
        claims = {  # reference :146-156
            "iss": auth_file["client_email"],
            "scope": " ".join(SCOPES),
            "aud": TOKEN_URL,
            "exp": int(now) + 3599,
            "iat": int(now),
            "sub": self.secrets["email"],
        }
        assertion = self._sign(claims, auth_file["private_key"])
        params = {
            "grant_type": "urn:ietf:params:oauth:grant-type:jwt-bearer",
            "assertion": assertion,
        }
        res = self.token_transport(TOKEN_URL, params, {"Accept": "application/json"})
        status, body = res[0], res[1]
        if status != 200:
            raise HTTPError(f"google_workspace token exchange failed: HTTP {status}")
        import json as _json

        j = _json.loads(body)
        self._token = j["access_token"]
        self._token_expiry = now + float(j.get("expires_in", 3599))
        return self._token

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
