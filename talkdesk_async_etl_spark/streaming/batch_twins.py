"""Streaming-shaped operators, batch-first (SURVEY.md §2.9 T1-T3).

The reference is a pure batch daily job (README.md:152-155); the north
star requires streaming semantics over the events table. Each operator
is implemented batch-first on the same ``F.window`` /
``F.session_window`` expressions the streaming engine uses, so a DuckDB
oracle exists; streaming/streams.py re-exposes the identical plans over
``readStream`` with watermarks.

Scale: windowed aggregation shuffles on (window, key) — time-bucketed
keys are naturally balanced; session windows shuffle on user_id and
merge-sort per user (state bounded by events-per-user-per-gap-chain).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from talkdesk_async_etl_spark.plans.registry import query
from talkdesk_async_etl_spark.sources.io import read_table as t


@query(
    "stream_tumbling",
    oracle="""
        SELECT time_bucket(INTERVAL 1 HOUR, CAST(ts AS TIMESTAMP)) AS window_start,
               event_type,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        FROM events GROUP BY 1, 2
    """,
    tags=("streaming",),
)
def stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1: tumbling 1-hour window × event_type. Identical expression
    runs under readStream with a watermark (streams.py)."""
    return (
        t(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            # value is 2-decimal-logical; decimal accumulation is exact
            # and order-free (double sums are partial-agg-order-dependent).
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "total_value")
    )


@query(
    "stream_sliding",
    oracle="""
        SELECT time_bucket(INTERVAL 15 MINUTES, CAST(ts AS TIMESTAMP)) - (k * INTERVAL 15 MINUTES)
               AS window_start,
               event_type,
               CAST(count(*) AS BIGINT) AS n_events
        FROM events, range(4) r(k)
        GROUP BY 1, 2
    """,
    tags=("streaming",),
)
def stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T2: sliding window (1 h length, 15 min slide) — each event lands
    in exactly 4 windows. The oracle expands the window assignment
    explicitly (bucket(ts) − k·slide for k ∈ 0..3), which is also
    precisely what Spark's window expression generates internally."""
    return (
        t(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events")
    )


@query(
    "stream_session",
    oracle="""
        WITH ev AS (
            SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events
        ),
        flagged AS (
            SELECT user_id, ts,
                   CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                             >= INTERVAL 30 MINUTES
                         OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                        THEN 1 ELSE 0 END AS new_session
            FROM ev
        ),
        numbered AS (
            SELECT user_id, ts,
                   sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                          ROWS UNBOUNDED PRECEDING) AS session_no
            FROM flagged
        )
        SELECT user_id,
               min(ts) AS session_start,
               max(ts) + INTERVAL 30 MINUTES AS session_end,
               CAST(count(*) AS BIGINT) AS n_events
        FROM numbered GROUP BY user_id, session_no
    """,
    tags=("streaming",),
)
def stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T3: session windows per user with a 30-minute gap.
    ``session_window`` is the native Spark operator (works in batch and
    streaming); the oracle is the classic lag-gap-cumsum island SQL.
    Session end = last event + gap, matching Spark's definition."""
    return (
        t(spark, sf_dir, "events")
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


@query(
    "stream_interval_join",
    oracle="""
        SELECT p.event_id AS p_id, p.user_id AS p_user, p.ts AS p_ts,
               v.event_id AS v_id, v.ts AS v_ts
        FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
              FROM events WHERE event_type = 'purchase') p
        LEFT JOIN (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
                   FROM events WHERE event_type = 'view') v
          ON p.user_id = v.user_id
         AND v.ts >= p.ts - INTERVAL 24 HOUR
         AND v.ts <= p.ts
    """,
    tags=("streaming", "join"),
)
def stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T4/J6 twin: the watermarked stream-stream interval join
    (streams.purchases_with_prior_views, streams.py:185) run as a batch
    plan — ``withWatermark`` is a no-op on a batch DataFrame, so this
    executes the IDENTICAL join expression the streaming engine runs
    (purchases left-outer views by the same user within the preceding
    24 h) and its driver row attests the streaming join's logic, not a
    re-derivation of it. Row-level output (unlike join_range, the
    aggregated count form) so the oracle checks the join's actual pair
    set including unmatched-purchase NULL rows."""
    from talkdesk_async_etl_spark.streaming.streams import purchases_with_prior_views

    return purchases_with_prior_views(t(spark, sf_dir, "events"), lookback="24 hours")


@query(
    "stream_funnel_state",
    oracle="""
        WITH f AS (
            SELECT user_id,
                   min(CASE WHEN event_type = 'view'
                            THEN CAST(ts AS TIMESTAMP) END) AS fv,
                   min(CASE WHEN event_type = 'purchase'
                            THEN CAST(ts AS TIMESTAMP) END) AS fp
            FROM events GROUP BY user_id
        )
        SELECT user_id,
               fv AS first_view_ts,
               fp AS first_purchase_ts,
               COALESCE(fp >= fv, FALSE) AS converted,
               CASE WHEN fp >= fv
                    THEN date_diff('microseconds', fv, fp) END AS latency_us
        FROM f
    """,
    tags=("streaming", "stateful"),
)
def stream_funnel_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5 depth: batch twin of the ``applyInPandasWithState`` funnel
    operator (streams.funnel_state) — per-user first-view / first-
    purchase timestamps (as epoch-micros), conversion flag, and latency.
    The stateful stream holds exactly two running minimums per user and
    derives converted/latency at emission, so this single conditional-
    min aggregate IS its converged semantics; the equivalence is pinned
    stream-vs-batch in tests/test_streaming.py and this twin carries the
    hash-checked driver row.

    Plan: one hash aggregate on user_id — conditional mins fold
    map-side, the shuffle carries two timestamps per (partition, user),
    and no window or join appears anywhere. The latency uses
    ``timestampdiff(MICROSECOND, ...)`` / ``date_diff('microseconds')``
    — exact integer arithmetic that is timezone-free on the fixture's
    TIMESTAMP_NTZ column (``unix_micros`` rejects NTZ, and an NTZ→LTZ
    cast would shift values by the session timezone)."""
    ev = t(spark, sf_dir, "events", spread=True)
    fv = F.min(F.when(F.col("event_type") == "view", F.col("ts")))
    fp = F.min(F.when(F.col("event_type") == "purchase", F.col("ts")))
    agg = ev.groupBy("user_id").agg(fv.alias("fv"), fp.alias("fp"))
    converted = F.coalesce(F.col("fp") >= F.col("fv"), F.lit(False))
    return agg.select(
        "user_id",
        F.col("fv").alias("first_view_ts"),
        F.col("fp").alias("first_purchase_ts"),
        converted.alias("converted"),
        F.when(
            F.col("fp") >= F.col("fv"),
            F.expr("timestampdiff(MICROSECOND, fv, fp)"),
        ).alias("latency_us"),
    )
