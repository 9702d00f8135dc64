"""Monitoring store (SURVEY.md §2.1 S6-S8, §1.2).

One monitoring backend for all profiles (the reference has two: Delta
tables on Databricks, DB:208-278, and SQLite locally, MON:21-147).
Writes are append-only parquet (Delta in production); the reference's
SQL ``UPDATE job_monitoring`` (DB:245-253) becomes append-then-
latest-wins: job close appends a second row per run_id and readers
take the latest by end_time/row order (the W1 window pattern) — the
plan that still works when the sink is an immutable 100 TB table.

Status rules preserved exactly (§1.2):
- report: RUNNING → SUCCESS | FAILED (MON:66,126)
- job: fail==0 → SUCCESS; ok==0 → FAILED; else PARTIAL_SUCCESS
  (DB:563-568); zero reports → SUCCESS-with-0 (MON:99-100 local rule
  normalizes to SUCCESS since nothing failed).
"""

from __future__ import annotations

import datetime as dt
import os
import uuid
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from talkdesk_async_etl_spark.schemas import JOB_MONITORING_SCHEMA, REPORT_MONITORING_SCHEMA


def new_run_id() -> str:
    """UUID4 run ids (reference DB:518, DIST:230)."""
    return str(uuid.uuid4())


def utc_now() -> dt.datetime:
    """Engine standardizes UTC (the reference mixes local and UTC —
    LOC:33 vs DB:495)."""
    return dt.datetime.now(dt.timezone.utc).replace(tzinfo=None)


def derive_job_status(total: int, ok: int, fail: int) -> str:
    """Reference DB:563-568 / MON:96-106."""
    if total == 0 or fail == 0:
        return "SUCCESS"
    if ok == 0:
        return "FAILED"
    return "PARTIAL_SUCCESS"


@dataclass(frozen=True)
class ReportResult:
    report_name: str
    status: str  # SUCCESS | FAILED
    rows_written: int
    output_path: str | None = None
    error_message: str | None = None
    start_time: dt.datetime | None = None
    end_time: dt.datetime | None = None


class MonitoringStore:
    """Parquet-append monitoring sink with latest-wins reads."""

    def __init__(self, spark: SparkSession, base_dir: str):
        self.spark = spark
        self.base = base_dir
        self.job_path = os.path.join(base_dir, "job_monitoring")
        self.report_path = os.path.join(base_dir, "report_monitoring")

    # -- writes (append-only; each is one tiny Spark write job) --------

    def log_job_start(self, run_id: str, from_date: str, to_date: str, total_reports: int) -> None:
        row = [
            (run_id, from_date, to_date, utc_now(), None, "RUNNING", total_reports, None, None, None)
        ]
        self.spark.createDataFrame(row, JOB_MONITORING_SCHEMA).write.mode("append").parquet(
            self.job_path
        )

    def log_job_end(
        self, run_id: str, from_date: str, to_date: str, total: int, ok: int, fail: int,
        error_message: str | None = None,
    ) -> str:
        status = derive_job_status(total, ok, fail) if error_message is None else "FAILED"
        row = [(run_id, from_date, to_date, None, utc_now(), status, total, ok, fail, error_message)]
        self.spark.createDataFrame(row, JOB_MONITORING_SCHEMA).write.mode("append").parquet(
            self.job_path
        )
        return status

    def log_reports(self, run_id: str, from_date: str, to_date: str, results: list[ReportResult]) -> None:
        """ONE append for all report outcomes of a run — the reference
        writes one Delta commit per report (DB:448-456), N tiny
        transactions; batching is the scale-correct shape."""
        if not results:
            return
        rows = [
            (
                run_id, r.report_name, from_date, to_date, r.start_time, r.end_time,
                r.status, r.rows_written, r.error_message,
            )
            for r in results
        ]
        self.spark.createDataFrame(rows, REPORT_MONITORING_SCHEMA).write.mode("append").parquet(
            self.report_path
        )

    # -- reads ----------------------------------------------------------

    def jobs(self) -> DataFrame:
        """Latest state per run_id (append-then-latest-wins replaces the
        reference's in-place UPDATE, DB:245-253)."""
        raw = self.spark.read.parquet(self.job_path)
        w = Window.partitionBy("run_id").orderBy(
            F.col("end_time").desc_nulls_last(), F.col("start_time").desc_nulls_last()
        )
        return (
            raw.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")
        )

    def reports(self) -> DataFrame:
        """Latest row per (run_id, report_name): a Spark task retry or
        an operator re-run can append a duplicate status row; readers
        must stay idempotent (SURVEY.md §7 risk register). Same W1
        latest-wins pattern as jobs()."""
        raw = self.spark.read.parquet(self.report_path)
        w = Window.partitionBy("run_id", "report_name").orderBy(
            F.col("end_time").desc_nulls_last(), F.col("start_time").desc_nulls_last()
        )
        return raw.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")

    def job_summary(self, run_id: str) -> dict:
        """Per-run counts in one aggregate pass (replaces the
        reference's three correlated COUNT(*) queries, MON:71-90)."""
        agg = (
            self.reports()
            .filter(F.col("run_id") == run_id)
            .agg(
                F.count("*").alias("total"),
                F.sum(F.when(F.col("status") == "SUCCESS", 1).otherwise(0)).alias("ok"),
                F.sum(F.when(F.col("status") == "FAILED", 1).otherwise(0)).alias("fail"),
            )
            .first()
        )
        return {"total": agg["total"] or 0, "ok": int(agg["ok"] or 0), "fail": int(agg["fail"] or 0)}
