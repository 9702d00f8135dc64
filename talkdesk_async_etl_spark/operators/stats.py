"""Statistical aggregates: correlation/regression, winsorization, and
mergeable distinct-count sketches.

Extends SURVEY.md §2.4 beyond the reference's count/sum surface
(databricks/talkdesk_databricks_etl.py:191-200 groups and counts its
monitoring rows; a production analytics engine also needs second-moment
statistics and sketch-mergeable cardinalities). All three queries run on
the ``events`` fact table.

Scale notes: every aggregate here is a single hash-shuffle on a
low-cardinality key (5 event types) with map-side partial aggregation —
the shuffled relation is O(groups), not O(rows), at any corpus size.
The winsorize query adds one broadcast join of the per-group quantile
relation (5 rows) back onto the fact scan. The HLL invariant is the
100 TB story for distinct counts: Datasketches HLL state merges
associatively, so per-partition sketches combine without ever shuffling
raw user ids, and sketches persisted per ingest batch union
incrementally instead of rescanning history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from talkdesk_async_etl_spark.plans.registry import query
from talkdesk_async_etl_spark.sources.io import read_table as t


@query(
    "agg_corr_regr",
    oracle="""
        SELECT event_type, CAST(count(*) AS BIGINT) AS n,
               round(corr(value, x), 6) AS corr_vx,
               round(regr_slope(value, x), 6) AS slope,
               round(regr_intercept(value, x), 6) AS intercept,
               round(covar_samp(value, x), 6) AS covar_vx,
               round(stddev_samp(value), 6) AS sd_value
        FROM (SELECT event_type, value,
                     CAST(hour(CAST(ts AS TIMESTAMP)) AS DOUBLE) AS x
              FROM events)
        GROUP BY event_type
    """,
    tags=("agg", "stats"),
)
def agg_corr_regr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group correlation and least-squares fit of event value vs
    hour-of-day — the drift/seasonality diagnostic a monitoring pipeline
    runs over its metric stream (the reference only counts statuses,
    MON:71-90; this is the second-moment extension).

    All six statistics are JVM-side builtins sharing one hash aggregate
    (Spark fuses them into a single ObjectHashAggregate pass): corr,
    regr_slope/intercept, covar_samp, stddev_samp. Both engines compute
    identical co-moment recurrences; results are rounded to 6 dp so
    partial-aggregation term order cannot flip the hash."""
    ev = t(spark, sf_dir, "events", spread=True).withColumn(
        "x", F.hour("ts").cast("double")
    )
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.round(F.corr("value", "x"), 6).alias("corr_vx"),
        F.round(F.expr("regr_slope(value, x)"), 6).alias("slope"),
        F.round(F.expr("regr_intercept(value, x)"), 6).alias("intercept"),
        F.round(F.covar_samp("value", "x"), 6).alias("covar_vx"),
        F.round(F.stddev_samp("value"), 6).alias("sd_value"),
    )


@query(
    "window_winsorize",
    oracle="""
        WITH pct AS (
            SELECT event_type, quantile_cont(value, 0.05) AS p05,
                   quantile_cont(value, 0.95) AS p95
            FROM events GROUP BY event_type
        )
        SELECT e.event_type, CAST(count(*) AS BIGINT) AS n,
               round(avg(greatest(p05, least(p95, value))), 6) AS avg_clip,
               round(min(greatest(p05, least(p95, value))), 6) AS min_clip,
               round(max(greatest(p05, least(p95, value))), 6) AS max_clip,
               CAST(sum(CASE WHEN value < p05 OR value > p95 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_clipped
        FROM events e JOIN pct USING (event_type)
        GROUP BY e.event_type
    """,
    tags=("agg", "stats", "percentile"),
)
def window_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group winsorization (clip to [p05, p95]) then re-aggregate —
    the outlier-trimming step value-distribution monitoring applies
    before alerting on averages.

    Two-pass shape, NOT a window: an exact-percentile aggregate first
    (Spark ``percentile`` interpolates identically to DuckDB
    ``quantile_cont``), producing a groups-sized relation that
    broadcast-joins back onto the fact scan. A window formulation
    (percentile OVER (PARTITION BY type)) would shuffle and sort the
    full fact table per group; the agg+broadcast form shuffles only
    per-group percentile state and rescans — at 100 TB the rescan is
    the cheap side of that trade, and AQE turns the 5-row join into a
    BroadcastHashJoin without being asked."""
    ev = t(spark, sf_dir, "events", spread=True)
    pct = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.05)").alias("p05"),
        F.expr("percentile(value, 0.95)").alias("p95"),
    )
    clipped = ev.join(F.broadcast(pct), "event_type").withColumn(
        "v_clip", F.greatest(F.col("p05"), F.least(F.col("p95"), F.col("value")))
    )
    return clipped.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.round(F.avg("v_clip"), 6).alias("avg_clip"),
        F.round(F.min("v_clip"), 6).alias("min_clip"),
        F.round(F.max("v_clip"), 6).alias("max_clip"),
        F.sum(
            ((F.col("value") < F.col("p05")) | (F.col("value") > F.col("p95"))).cast(
                "long"
            )
        ).alias("n_clipped"),
    )


_HLL_TOL = 0.05  # Datasketches HLL default lgK=12 → ~1.6% rse; 5% is 3σ+


@query(
    "agg_hll_sketch_ok",
    # Invariant companion (same pattern as sim_kmeans_inertia_ok): the
    # oracle pins the exact group count and TRUE for both tolerance
    # checks. A sketch-update bug, a wrong estimate transform, or a
    # broken union inflates the error beyond 3σ and flips a flag →
    # driver hash mismatch.
    oracle="""
        SELECT CAST(1 AS BOOLEAN) AS groups_within_tol,
               CAST(1 AS BOOLEAN) AS union_within_tol,
               (SELECT CAST(count(DISTINCT event_type) AS BIGINT) FROM events)
                   AS n_groups
    """,
    tags=("agg", "sketch", "invariant"),
)
def agg_hll_sketch_ok(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable distinct-count sketches (Apache Datasketches HLL,
    built into Spark as ``hll_sketch_agg``/``hll_union_agg``): estimate
    distinct users per event type AND the distinct users overall by
    UNIONING the per-group sketches — never re-touching raw ids — then
    attest both against exact counts within ±5%.

    This is the incremental-cardinality shape a 100 TB pipeline needs:
    per-partition sketch state is a few KB regardless of row count, the
    shuffle moves sketches instead of user ids, and the union step
    proves per-batch sketches can roll up without a global re-scan
    (persist one sketch per ingest day; total distinct = union of 365
    sketches). The exact counts computed here for attestation are the
    expensive path the sketch replaces."""
    ev = t(spark, sf_dir, "events", spread=True)
    per_group = ev.groupBy("event_type").agg(
        F.expr("hll_sketch_agg(user_id)").alias("sk"),
        F.count_distinct("user_id").alias("exact"),
    )
    # Union the 5 per-group sketches into the overall estimate; compare
    # against the directly-computed overall exact count.
    unioned = per_group.agg(
        F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("union_est"),
        F.bool_and(
            F.abs(F.expr("hll_sketch_estimate(sk)") - F.col("exact"))
            / F.col("exact")
            <= _HLL_TOL
        ).alias("groups_within_tol"),
        F.count("*").alias("n_groups"),
    )
    overall = ev.agg(F.count_distinct("user_id").alias("overall_exact"))
    return (
        unioned.crossJoin(F.broadcast(overall))
        .select(
            "groups_within_tol",
            (
                F.abs(F.col("union_est") - F.col("overall_exact"))
                / F.col("overall_exact")
                <= _HLL_TOL
            ).alias("union_within_tol"),
            F.col("n_groups").cast("long").alias("n_groups"),
        )
    )
