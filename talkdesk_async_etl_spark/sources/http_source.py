"""Report source connector (SURVEY.md §2.1 S3): the POST→GET CSV
ingestion boundary, pluggable so tests run without a network.

The reference's flow (async_utils.py:77-129, DB:330-382):
POST ``{base}{post_endpoint}`` → ``report_id``; poll/GET
``{base}{get_endpoint}?id=...`` → CSV text. Everything network-touching
sits behind the ``ReportSource`` protocol:

- ``HttpReportSource`` — aiohttp implementation (import-gated: aiohttp
  is not in this container; instantiating raises with a clear message).
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


class HttpReportSource:
    """aiohttp-backed production source (reference async_utils.py:77-129).

    aiohttp is not installed in this environment; construction is
    import-gated so the engine remains importable everywhere."""

    def __init__(
        self,
        base_url: str,
        post_endpoint: str,
        get_endpoint: str,
        token_manager: TokenManager,
        timeout_sec: float = 30.0,
    ):
        try:
            import aiohttp  # noqa: F401
        except ImportError as exc:  # pragma: no cover
            raise NotImplementedError(
                "HttpReportSource requires aiohttp (not available in this "
                "environment); use LocalFileReportSource for tests"
            ) from exc
        self._base = base_url
        self._post = post_endpoint
        self._get = get_endpoint
        self._tokens = token_manager
        self._timeout = timeout_sec

    async def generate_report_id(self, report_name: str, from_date: str, to_date: str) -> str:
        import aiohttp

        token = await self._tokens.get_token()
        async with aiohttp.ClientSession() as session:
            async with session.post(
                f"{self._base}{self._post}",
                json={"report": report_name, "from_date": from_date, "to_date": to_date},
                headers={"Authorization": f"Bearer {token}"},
                timeout=aiohttp.ClientTimeout(total=self._timeout),
            ) as resp:
                if resp.status >= 400:
                    raise HttpStatusError(resp.status, await resp.text())
                body = await resp.json()
                return str(body["report_id"])

    async def download_report(self, report_id: str) -> str:
        import aiohttp

        token = await self._tokens.get_token()
        async with aiohttp.ClientSession() as session:
            async with session.get(
                f"{self._base}{self._get}",
                params={"id": report_id},
                headers={"Authorization": f"Bearer {token}"},
                timeout=aiohttp.ClientTimeout(total=self._timeout),
            ) as resp:
                if resp.status >= 400:
                    raise HttpStatusError(resp.status, await resp.text())
                return await resp.text()


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
