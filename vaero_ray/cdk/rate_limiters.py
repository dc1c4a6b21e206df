"""Rate limiting for pull connectors.

Semantics match the reference CDK:

- Steady: at most ``max_calls_per_period`` calls per ``limit_period``
  seconds, enforced by sleeping the remainder of the per-call slot
  (/root/reference/vaero_cdk/rate_limiter_steady.py:6-22).
- Backoff: exponential backoff on 429 and 5xx, give up immediately on
  any other 4xx, give up after ``max_retries``
  (/root/reference/vaero_cdk/rate_limiter_backoff.py:18-41; retry policy
  /root/reference/vaero_cdk/http_connector.py:101-102,148-163).

``clock``/``sleep`` are injectable for deterministic tests.
"""

from __future__ import annotations

import time
from typing import Callable


class GiveUpError(Exception):
    """Raised when the retry policy decides the request will never succeed."""

    def __init__(self, status: int, attempts: int, detail: str = ""):
        super().__init__(f"gave up after {attempts} attempt(s), status={status} {detail}")
        self.status = status
        self.attempts = attempts


class SteadyRateLimiter:
    def __init__(
        self,
        max_calls_per_period: int = 60,
        limit_period: float = 60.0,
        clock: Callable[[], float] = time.monotonic,
        sleep: Callable[[float], None] = time.sleep,
    ):
        self.slot = limit_period / max(1, max_calls_per_period)
        self._clock = clock
        self._sleep = sleep
        self._last: float | None = None

    def wait(self) -> None:
        now = self._clock()
        if self._last is not None:
            remaining = self.slot - (now - self._last)
            if remaining > 0:
                self._sleep(remaining)
                now = self._clock()
        self._last = now


class BackoffRateLimiter:
    """Wrap a request callable returning (status, payload)."""

    RETRYABLE = frozenset({429}) | frozenset(range(500, 600))

    def __init__(
        self,
        max_retries: int = 6,
        base_delay: float = 1.0,
        max_delay: float = 60.0,
        sleep: Callable[[float], None] = time.sleep,
    ):
        self.max_retries = max_retries
        self.base_delay = base_delay
        self.max_delay = max_delay
        self._sleep = sleep

    def call(self, fn: Callable[[], tuple[int, object]]) -> object:
        attempts = 0
        while True:
            status, payload = fn()
            attempts += 1
            if 200 <= status < 300:
                return payload
            if status in self.RETRYABLE:
                if attempts > self.max_retries:
                    raise GiveUpError(status, attempts, "retries exhausted")
                self._sleep(min(self.max_delay, self.base_delay * (2 ** (attempts - 1))))
                continue
            # non-retryable 4xx (or anything else): give up immediately
            raise GiveUpError(status, attempts, "non-retryable")
