"""OAuth2 token manager (SURVEY.md §2.12 E5).

Preserves the reference's TokenManager semantics
(databricks/talkdesk_databricks_etl.py:76-131): cache the bearer token,
refresh 300 s before expiry (floor 60 s — DB:109-114), double-checked
refresh under an ``asyncio.Lock`` so concurrent report tasks trigger at
most one refresh. The clock is injectable for deterministic tests.
"""

from __future__ import annotations

import asyncio
import time
from collections.abc import Awaitable, Callable

REFRESH_BUFFER_SEC = 300.0
MIN_BUFFER_SEC = 60.0


class TokenManager:
    def __init__(
        self,
        fetch_token: Callable[[], Awaitable[tuple[str, float]]],
        clock: Callable[[], float] = time.monotonic,
    ):
        """``fetch_token`` returns ``(token, expires_in_sec)``."""
        self._fetch = fetch_token
        self._clock = clock
        self._lock = asyncio.Lock()
        self._token: str | None = None
        self._expires_at: float = 0.0

    def _fresh(self) -> bool:
        return self._token is not None and self._clock() < self._expires_at

    async def get_token(self) -> str:
        if self._fresh():
            return self._token  # type: ignore[return-value]
        async with self._lock:
            if self._fresh():  # double-checked: another task refreshed
                return self._token  # type: ignore[return-value]
            token, expires_in = await self._fetch()
            # Remaining validity = max(expires_in - 300, floor) with the
            # floor clamped to half the actual lifetime. The reference's
            # flat 60 s floor (DB:113) would treat a token with
            # expires_in <= 60 as fresh PAST its real expiry — a 401 in
            # waiting; clamping keeps the floor's refetch-amortization
            # while never exceeding actual validity.
            self._token = token
            floor = min(MIN_BUFFER_SEC, expires_in / 2.0)
            self._expires_at = self._clock() + max(
                expires_in - REFRESH_BUFFER_SEC, floor
            )
            return token
