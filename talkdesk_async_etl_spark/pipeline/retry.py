"""Retry policy with exponential backoff (SURVEY.md §2.12 E4).

Preserves the reference's exact semantics
(databricks/talkdesk_databricks_etl.py:285-327, local/async_utils.py:18-52):

- retriable: HTTP 429 and 5xx, plus transport errors/timeouts;
- final (no retry): other 4xx;
- backoff: ``base * 2**(attempt-1)`` seconds (base 1 s, DB:324);
- default 3 attempts (ddl_talkdesk_config.py:72-88 seeds, AU:22).

The sleep/clock are injectable so tests assert the exact schedule with
a fake clock (SURVEY.md §5.4).
"""

from __future__ import annotations

import asyncio
from collections.abc import Awaitable, Callable
from dataclasses import dataclass


class HttpStatusError(Exception):
    """Transport-level HTTP failure carrying the status code."""

    def __init__(self, status: int, message: str = ""):
        super().__init__(f"HTTP {status}: {message}")
        self.status = status


class RetryExhaustedError(Exception):
    def __init__(self, attempts: int, last: Exception):
        super().__init__(f"retry exhausted after {attempts} attempts: {last}")
        self.attempts = attempts
        self.last = last


def is_retriable(exc: Exception) -> bool:
    """429 + 5xx + transport errors retry; other 4xx are final
    (reference DB:303-327)."""
    if isinstance(exc, HttpStatusError):
        return exc.status == 429 or 500 <= exc.status <= 599
    return isinstance(exc, (asyncio.TimeoutError, ConnectionError, OSError))


@dataclass(frozen=True)
class RetryPolicy:
    max_attempts: int = 3
    backoff_base_sec: float = 1.0

    def delay(self, attempt: int) -> float:
        """Backoff before retrying after the given 1-based attempt:
        ``base * 2**(attempt-1)`` (reference DB:324)."""
        return self.backoff_base_sec * (2 ** (attempt - 1))

    async def run(
        self,
        fn: Callable[[], Awaitable],
        sleep: Callable[[float], Awaitable] = asyncio.sleep,
    ):
        last: Exception | None = None
        for attempt in range(1, self.max_attempts + 1):
            try:
                return await fn()
            except Exception as exc:  # noqa: BLE001 — policy decides
                last = exc
                if not is_retriable(exc) or attempt == self.max_attempts:
                    raise
                await sleep(self.delay(attempt))
        raise RetryExhaustedError(self.max_attempts, last)  # pragma: no cover
