"""Spatial join operator (SURVEY.md §2.3 J12).

The reference has no spatial queries; this is the standard
grid-bucketing pattern for radius joins at scale — the join family a
geo-enriched contact-center dataset (callers × service sites) needs.
The naive form is a cross join with a distance predicate: O(n·m) and
unshardable. The scale form buckets space into cells the size of the
search radius so a point's matches can only live in its own cell or
the 8 neighbors — the cross join becomes an EQUI-join on cell id, and
Catalyst can broadcast or shuffle-partition it like any other join.

Exactness: coordinates are integer micro-units derived from keys by
pure BIGINT formulas, and the distance test is exact BIGINT
dx²+dy² ≤ r², so Spark and DuckDB cannot disagree on a boundary point.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from talkdesk_async_etl_spark.plans.registry import query
from talkdesk_async_etl_spark.sources.io import read_table as t

_R = 50_000  # search radius in micro-units; also the grid cell size
_SPACE = 1_000_000  # coordinate domain [0, _SPACE)

_SPATIAL_ORACLE = f"""
    WITH pts AS (
        SELECT c.c_custkey,
               ((c.c_custkey * 48271) % {_SPACE})
                 - ((s.s_suppkey * 16807 + 333333) % {_SPACE}) AS dx,
               ((c.c_custkey * 69621 + 12345) % {_SPACE})
                 - ((s.s_suppkey * 65539 + 777777) % {_SPACE}) AS dy
        FROM customer c, supplier s
    )
    SELECT c_custkey,
           CAST(count(*) AS BIGINT) AS n_within,
           CAST(min(dx*dx + dy*dy) AS BIGINT) AS min_d2,
           CAST(sum(dx*dx + dy*dy) AS BIGINT) AS sum_d2
    FROM pts
    WHERE dx*dx + dy*dy <= {_R * _R}
    GROUP BY c_custkey
"""


@query("join_spatial_grid", oracle=_SPATIAL_ORACLE, tags=("join", "spatial"))
def join_spatial_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J12: radius join via grid bucketing. Every supplier site is
    replicated to its grid cell plus the 8 neighbors (build side ×9 —
    dim-sized, broadcast); every customer probes exactly its own cell
    (probe side ×1 — the fact side is never exploded and never
    shuffled). The 3×3 neighborhood is sufficient because the cell
    size equals the radius, so any point within r of a probe lies in
    an adjacent cell; the exact BIGINT dx²+dy² ≤ r² filter then
    discards corner candidates. The oracle is the O(n·m) cross join
    this pattern replaces. At 100 TB with a LARGE build side the same
    plan shuffle-partitions both sides on cell id instead of
    broadcasting — the cell-key equi-join is what makes either
    strategy available; replicating the BUILD side (not the probe)
    keeps the big side's volume constant."""
    c = t(spark, sf_dir, "customer", spread=True).select(
        "c_custkey",
        ((F.col("c_custkey") * 48271) % _SPACE).alias("cx"),
        ((F.col("c_custkey") * 69621 + 12345) % _SPACE).alias("cy"),
    )
    s = t(spark, sf_dir, "supplier").select(
        "s_suppkey",
        ((F.col("s_suppkey") * 16807 + 333333) % _SPACE).alias("sx"),
        ((F.col("s_suppkey") * 65539 + 777777) % _SPACE).alias("sy"),
    )
    s9 = (
        s.select("*", F.explode(F.expr("sequence(-1, 1)")).alias("ox"))
        .select("*", F.explode(F.expr("sequence(-1, 1)")).alias("oy"))
        .select(
            "s_suppkey",
            "sx",
            "sy",
            (F.expr(f"sx div {_R}") + F.col("ox")).alias("cellx"),
            (F.expr(f"sy div {_R}") + F.col("oy")).alias("celly"),
        )
    )
    probe = c.select(
        "c_custkey",
        "cx",
        "cy",
        F.expr(f"cx div {_R}").alias("cellx"),
        F.expr(f"cy div {_R}").alias("celly"),
    )
    d2 = (F.col("cx") - F.col("sx")) * (F.col("cx") - F.col("sx")) + (
        F.col("cy") - F.col("sy")
    ) * (F.col("cy") - F.col("sy"))
    return (
        probe.join(F.broadcast(s9), ["cellx", "celly"])
        .withColumn("d2", d2)
        .filter(F.col("d2") <= _R * _R)
        .groupBy("c_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_within"),
            F.min("d2").alias("min_d2"),
            F.sum("d2").alias("sum_d2"),
        )
    )
