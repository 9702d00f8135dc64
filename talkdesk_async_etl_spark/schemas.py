"""Explicit StructTypes for every table the engine touches.

The reference declares config/monitoring schemas as Delta DDL
(ddl/ddl_talkdesk_config.py:10-34, ddl/ddl_talkdesk_monitoring.py:10-41)
and leaves payload schemas to pandas inference. Engine policy: every
DataFrame the engine *creates* has an explicit schema (never inferred);
payload CSV inference is allowed only at the ingestion boundary and the
inferred schema is recorded with the sink.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- Config domain (reference ddl/ddl_talkdesk_config.py:10-34) ---------

REPORT_CONFIG_SCHEMA = T.StructType(
    [
        T.StructField("report_name", T.StringType(), False),
        T.StructField("enabled", T.BooleanType(), False),
        T.StructField("endpoint_type", T.StringType(), False),
        T.StructField("retries", T.IntegerType(), False),
        T.StructField("timeout_sec", T.IntegerType(), False),
        T.StructField("env", T.StringType(), False),
    ]
)

ENDPOINT_CONFIG_SCHEMA = T.StructType(
    [
        T.StructField("endpoint_type", T.StringType(), False),
        T.StructField("base_url", T.StringType(), False),
        T.StructField("auth_endpoint", T.StringType(), False),
        T.StructField("post_endpoint", T.StringType(), False),
        T.StructField("get_endpoint", T.StringType(), False),
        T.StructField("env", T.StringType(), False),
    ]
)

# --- Monitoring domain (reference ddl/ddl_talkdesk_monitoring.py:10-41) --

JOB_MONITORING_SCHEMA = T.StructType(
    [
        T.StructField("run_id", T.StringType(), False),
        T.StructField("from_date", T.StringType(), True),  # YYYY-MM-DD quirk (DB:497)
        T.StructField("to_date", T.StringType(), True),
        T.StructField("start_time", T.TimestampType(), True),
        T.StructField("end_time", T.TimestampType(), True),
        T.StructField("status", T.StringType(), True),
        T.StructField("total_reports", T.IntegerType(), True),
        T.StructField("success_count", T.IntegerType(), True),
        T.StructField("failed_count", T.IntegerType(), True),
        T.StructField("error_message", T.StringType(), True),
    ]
)

REPORT_MONITORING_SCHEMA = T.StructType(
    [
        T.StructField("run_id", T.StringType(), False),
        T.StructField("report_name", T.StringType(), False),
        T.StructField("from_date", T.StringType(), True),
        T.StructField("to_date", T.StringType(), True),
        T.StructField("start_time", T.TimestampType(), True),
        T.StructField("end_time", T.TimestampType(), True),
        T.StructField("status", T.StringType(), True),
        T.StructField("rows_written", T.IntegerType(), True),
        T.StructField("error_message", T.StringType(), True),
    ]
)

# Status enums (reference local/monitoring_db.py:66,126; DB:414,450,465,563-568)
REPORT_STATUS = ("RUNNING", "SUCCESS", "FAILED")
JOB_STATUS = ("RUNNING", "SUCCESS", "PARTIAL_SUCCESS", "FAILED")

# --- Multimodal extension columns (north star; no reference analogue) ---

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("content", T.BinaryType(), True),  # opaque payload bytes
        T.StructField("mime_type", T.StringType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

# --- Driver testdata tables (FIXTURES.md §A) ----------------------------

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
