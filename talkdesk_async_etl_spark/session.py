"""SparkSession builders for the engine's execution profiles.

The reference configures Spark implicitly (Databricks runtime) and tunes
nothing; we centralize session construction so every profile gets the
same scale-oriented defaults:

- AQE on (runtime re-plan: broadcast-demotion, skew-join splitting,
  partition coalescing) — replaces the reference's manual
  ``repartition(ceil(n/100))`` sizing for relational work.
- ``spark.sql.shuffle.partitions`` sized to cores locally; on a real
  cluster AQE coalesces from a high initial number.
- UTC session timezone: the reference mixes local time
  (local/talkdesk_local_etl.py:33) and UTC
  (databricks/talkdesk_databricks_etl.py:495); the engine is UTC-only.
- Arrow enabled for every pandas boundary (pandas UDFs, toPandas).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def build_session(
    app_name: str = "talkdesk_async_etl_spark",
    master: str | None = None,
    cpus: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build the engine SparkSession with scale-safe defaults.

    On a real cluster, ``master`` comes from the environment and the
    shuffle-partition default should be left to AQE coalescing from a
    high initial count; locally we pin it to the core count so tiny
    test data is not over-parallelized (200 empty tasks).
    """
    cpus = cpus or DEFAULT_CPUS
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Parquet TIMESTAMP(NANOS) (the events table) is illegal for the
        # vectorized reader; read as epoch-nanos long and convert in
        # sources.io.read_table. Keeps the scan vectorized + prunable.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # ContextCleaner frees broadcast/shuffle/persist blocks only when
        # the driver GCs their weak refs; the default forced-GC interval
        # (30 min) lets dead blocks accumulate in the shared local JVM
        # until execution memory starves and later queries slow 10-30x.
        .config("spark.cleaner.periodicGC.interval", "15s")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    if master:
        builder = builder.config("spark.master", master)
    elif not os.environ.get("SPARK_MASTER"):
        builder = builder.config("spark.master", f"local[{cpus}]")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def get_or_create(spark: SparkSession | None = None) -> SparkSession:
    """Reuse an active session (driver-provided) or build the default."""
    if spark is not None:
        return spark
    active = SparkSession.getActiveSession()
    return active if active is not None else build_session()
