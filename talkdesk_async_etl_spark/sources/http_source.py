"""Report source connector (SURVEY.md §2.1 S3): the POST→GET CSV
ingestion boundary, pluggable so tests run without a network.

The reference's flow (async_utils.py:77-129, DB:330-382):
POST ``{base}{post_endpoint}`` → ``report_id``; poll/GET
``{base}{get_endpoint}?id=...`` → CSV text. Everything network-touching
sits behind the ``ReportSource`` protocol:

- ``HttpReportSource`` — aiohttp when available, else stdlib urllib
  via ``asyncio.to_thread`` (this container has no aiohttp; the
  fallback keeps the real HTTP path runnable and localhost-testable).
- ``LocalFileReportSource`` — the test double: POST returns a fake
  report id, GET reads ``{fixture_dir}/{report_name}.csv``. Failure
  injection via a set of report names that raise a given status.

Both honor the per-report RetryPolicy and the TokenManager — identical
retry/backoff semantics to the reference (E4/E5).
"""

from __future__ import annotations

import asyncio
from dataclasses import dataclass, field
from pathlib import Path
from typing import Protocol

from talkdesk_async_etl_spark.pipeline.retry import HttpStatusError, RetryPolicy
from talkdesk_async_etl_spark.pipeline.token import TokenManager


class ReportSource(Protocol):
    async def generate_report_id(self, report_name: str, from_date: str, to_date: str) -> str: ...

    async def download_report(self, report_id: str) -> str:
        """Returns the report payload as CSV text."""
        ...


@dataclass
class LocalFileReportSource:
    """Filesystem fake standing in for the HTTP API (SURVEY.md §5.3).

    ``fail_reports`` maps report_name → HTTP status to raise;
    ``fail_times`` bounds how many times each raises (to exercise
    retry-then-succeed paths)."""

    fixture_dir: str
    fail_reports: dict[str, int] = field(default_factory=dict)
    fail_times: int = 10**9
    calls: list[tuple[str, str]] = field(default_factory=list)
    _fail_counts: dict[str, int] = field(default_factory=dict)

    async def generate_report_id(self, report_name: str, from_date: str, to_date: str) -> str:
        self.calls.append(("post", report_name))
        return f"{report_name}:{from_date}:{to_date}"

    async def download_report(self, report_id: str) -> str:
        report_name = report_id.split(":", 1)[0]
        self.calls.append(("get", report_name))
        if report_name in self.fail_reports:
            n = self._fail_counts.get(report_name, 0)
            if n < self.fail_times:
                self._fail_counts[report_name] = n + 1
                raise HttpStatusError(self.fail_reports[report_name], f"injected for {report_name}")
        path = Path(self.fixture_dir) / f"{report_name}.csv"
        if not path.exists():
            raise HttpStatusError(404, f"no fixture for {report_name}")
        return path.read_text(encoding="utf-8")


def _aiohttp_available() -> bool:
    try:
        import aiohttp  # noqa: F401

        return True
    except ImportError:
        return False


class HttpReportSource:
    """HTTP production source (reference async_utils.py:77-129).

    Prefers aiohttp (true async sockets, right for hundreds of
    concurrent report fetches); when aiohttp is absent (this
    container) it degrades to stdlib ``urllib`` driven through
    ``asyncio.to_thread`` — same POST→GET semantics, thread-per-
    in-flight-request instead of an event-loop socket, still bounded
    by the runner's concurrency cap."""

    def __init__(
        self,
        base_url: str,
        post_endpoint: str,
        get_endpoint: str,
        token_manager: TokenManager,
        timeout_sec: float = 30.0,
    ):
        self._base = base_url
        self._post = post_endpoint
        self._get = get_endpoint
        self._tokens = token_manager
        self._timeout = timeout_sec
        self._use_aiohttp = _aiohttp_available()

    # -- one transport seam per verb; each returns (status, body) ------

    async def _post_json(self, url: str, payload: dict, token: str) -> tuple[int, str]:
        if self._use_aiohttp:
            import aiohttp

            async with aiohttp.ClientSession() as session:
                async with session.post(
                    url,
                    json=payload,
                    headers={"Authorization": f"Bearer {token}"},
                    timeout=aiohttp.ClientTimeout(total=self._timeout),
                ) as resp:
                    return resp.status, await resp.text()
        return await asyncio.to_thread(self._urllib_request, url, payload, token)

    async def _get_text(self, url: str, token: str) -> tuple[int, str]:
        if self._use_aiohttp:
            import aiohttp

            async with aiohttp.ClientSession() as session:
                async with session.get(
                    url,
                    headers={"Authorization": f"Bearer {token}"},
                    timeout=aiohttp.ClientTimeout(total=self._timeout),
                ) as resp:
                    return resp.status, await resp.text()
        return await asyncio.to_thread(self._urllib_request, url, None, token)

    def _urllib_request(self, url: str, payload: dict | None, token: str) -> tuple[int, str]:
        import json
        import urllib.error
        import urllib.request

        data = None
        headers = {"Authorization": f"Bearer {token}"}
        if payload is not None:
            data = json.dumps(payload).encode("utf-8")
            headers["Content-Type"] = "application/json"
        req = urllib.request.Request(url, data=data, headers=headers)
        try:
            with urllib.request.urlopen(req, timeout=self._timeout) as resp:  # noqa: S310
                return resp.status, resp.read().decode("utf-8", errors="replace")
        except urllib.error.HTTPError as exc:
            return exc.code, exc.read().decode("utf-8", errors="replace")

    # -- ReportSource protocol -----------------------------------------

    async def generate_report_id(self, report_name: str, from_date: str, to_date: str) -> str:
        import json

        token = await self._tokens.get_token()
        status, body = await self._post_json(
            f"{self._base}{self._post}",
            {"report": report_name, "from_date": from_date, "to_date": to_date},
            token,
        )
        if status >= 400:
            raise HttpStatusError(status, body[:200])
        return str(json.loads(body)["report_id"])

    async def download_report(self, report_id: str) -> str:
        from urllib.parse import quote

        token = await self._tokens.get_token()
        status, body = await self._get_text(
            f"{self._base}{self._get}?id={quote(report_id)}", token
        )
        if status >= 400:
            raise HttpStatusError(status, body[:200])
        return body


async def fetch_report_csv(
    source: ReportSource,
    report_name: str,
    from_date: str,
    to_date: str,
    policy: RetryPolicy,
    sleep=asyncio.sleep,
) -> str:
    """POST→GET with the reference's retry semantics applied to each
    call independently (DB:330-382)."""

    async def _post():
        return await source.generate_report_id(report_name, from_date, to_date)

    async def _get():
        return await source.download_report(report_id)

    report_id = await policy.run(_post, sleep=sleep)
    return await policy.run(_get, sleep=sleep)
