"""Run-parameter binding (SURVEY.md §2.12 E8).

The reference binds ``env/from_date/to_date`` from Databricks widgets
(databricks/talkdesk_databricks_etl.py:25-30, 479-497) or argparse
(local/talkdesk_local_etl.py:23-35) with a yesterday→today default
window — but the local variant uses LOCAL time (LOC:33) while the
Databricks one uses UTC (DB:495). The engine standardizes on UTC
everywhere; the date-string format stays the reference's ``YYYY-MM-DD``
quirk (dates-as-strings, DB:497).
"""

from __future__ import annotations

import argparse
import datetime as dt

DATE_FMT = "%Y-%m-%d"


def auto_dates(
    from_date: str | None = None,
    to_date: str | None = None,
    today: dt.date | None = None,
) -> tuple[str, str]:
    """Yesterday→today defaults in UTC; explicit values pass through
    after format validation (fail fast on malformed dates rather than
    sending them to the API)."""
    today = today or dt.datetime.now(dt.timezone.utc).date()
    if from_date is None:
        from_date = (today - dt.timedelta(days=1)).strftime(DATE_FMT)
    if to_date is None:
        to_date = today.strftime(DATE_FMT)
    for label, v in (("from_date", from_date), ("to_date", to_date)):
        try:
            dt.datetime.strptime(v, DATE_FMT)
        except ValueError as exc:
            raise ValueError(f"{label} must be YYYY-MM-DD, got {v!r}") from exc
    if from_date > to_date:
        raise ValueError(f"from_date {from_date} is after to_date {to_date}")
    return from_date, to_date


def parse_args(argv: list[str] | None = None) -> argparse.Namespace:
    """CLI binding for the pipeline runner (env + date window + profile)."""
    p = argparse.ArgumentParser(description="Run the report pipeline")
    p.add_argument("--env", default="dev", help="config environment (dev/prod)")
    p.add_argument("--from-date", dest="from_date", default=None, help="YYYY-MM-DD (default: yesterday UTC)")
    p.add_argument("--to-date", dest="to_date", default=None, help="YYYY-MM-DD (default: today UTC)")
    p.add_argument(
        "--profile", choices=("driver-async", "distributed"), default="driver-async",
        help="fan-out profile (driver asyncio vs mapInPandas partitions)",
    )
    p.add_argument("--config", default="config.json", help="path to the JSON config document")
    args = p.parse_args(argv)
    args.from_date, args.to_date = auto_dates(args.from_date, args.to_date)
    return args
