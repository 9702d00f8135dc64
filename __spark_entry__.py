"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All queries live in ``talkdesk_async_etl_spark.plans.registry``; this
file only adapts the registry to the driver's interface.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Daily grouped conditional aggregation over orders (the reference's
    job-summary dashboard shape, README.md:447-457), ordered latest
    day first.
    """
    from pyspark.sql import functions as F

    from talkdesk_async_etl_spark.plans.registry import load_all

    q = load_all()["agg_conditional_sum"]
    return q.fn(spark, "/root/testdata/sf0.001").orderBy(F.col("order_date").desc())


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from talkdesk_async_etl_spark.plans.registry import load_all

    return {name: spec.fn for name, spec in load_all().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query; omitted entries (approx/LSH/seeded
    ops) get the driver's weaker rows-only check."""
    from talkdesk_async_etl_spark.plans.registry import load_all

    return {name: spec.oracle for name, spec in load_all().items() if spec.oracle is not None}
