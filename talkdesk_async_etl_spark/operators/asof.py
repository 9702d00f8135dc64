"""As-of (point-in-time) join — SURVEY.md §2.3 J6.

Spark has no native ASOF JOIN (DuckDB does — the oracle uses it). The
engine expresses it as the union-window pattern: interleave the two
event streams per key, sort by time, and carry the last "quote" forward
onto each "trade" with ``last(..., ignorenulls=True)``.

Scale: ONE shuffle on the key (user_id) + per-partition sort — the same
cost as a groupBy, with no range-condition join explosion. The naive
alternative (non-equi join ``v.ts <= p.ts`` + max) is O(n·m) per key
pair and is exactly what this pattern avoids at 100 TB. Skewed keys
(one user with 10^8 events) would sort wide; mitigate by time-bucketing
the partition key (salt on day) and as-of-joining bucket-locally with a
carry-in boundary row — documented here, not needed at test scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from talkdesk_async_etl_spark.plans.registry import query
from talkdesk_async_etl_spark.sources.io import read_table as t


@query(
    "join_range",
    oracle="""
        SELECT p.event_id,
               CAST(count(v.event_id) AS BIGINT) AS n_prior_views
        FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
              FROM events WHERE event_type = 'purchase') p
        LEFT JOIN (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
                   FROM events WHERE event_type = 'view') v
          ON p.user_id = v.user_id
         AND v.ts >= p.ts - INTERVAL 1 HOUR
         AND v.ts <= p.ts
        GROUP BY p.event_id
    """,
    tags=("join", "range"),
)
def join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6b: range (interval) join — views by the same user within the
    hour before each purchase. The equality key (user_id) carries the
    shuffle; the time-range condition evaluates as the join filter
    inside each key's sorted partition, so cost is bounded by events
    per (user, hour) rather than |views|×|purchases|. At 100 TB,
    time-bucket both sides on (user_id, hour) to make the range
    bucket-local; AQE handles hot users via skew split."""
    e = t(spark, sf_dir, "events").select("event_id", "user_id", "ts", "event_type")
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"), F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    v = e.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("v_id"), F.col("user_id").alias("v_user"), F.col("ts").alias("v_ts")
    )
    joined = p.join(
        v,
        (F.col("p_user") == F.col("v_user"))
        & (F.col("v_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("v_ts") <= F.col("p_ts")),
        "left",
    )
    return joined.groupBy(F.col("p_id").alias("event_id")).agg(
        F.count("v_id").alias("n_prior_views")
    )


@query(
    "join_asof",
    oracle="""
        SELECT p.event_id, p.user_id, p.ts, v.ts AS prior_view_ts
        FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
              FROM events WHERE event_type = 'purchase') p
        ASOF LEFT JOIN (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
                        FROM events WHERE event_type = 'view') v
          ON p.user_id = v.user_id AND v.ts <= p.ts
    """,
    tags=("join", "asof"),
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6: for each purchase, the latest view by the same user at or
    before the purchase time (time-series enrichment). Implemented with
    the union-window pattern; ties at identical ts resolve view-first,
    matching the oracle's inclusive ``v.ts <= p.ts``."""
    e = t(spark, sf_dir, "events").select("event_id", "user_id", "ts", "event_type")
    both = e.filter(F.col("event_type").isin("purchase", "view")).withColumn(
        "is_view", (F.col("event_type") == "view").cast("int")
    )
    # Views sort before purchases at equal ts (is_view DESC) so an
    # exactly-simultaneous view is visible to the purchase (<= semantics).
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("is_view").desc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = both.withColumn(
        "prior_view_ts",
        F.last(F.when(F.col("is_view") == 1, F.col("ts")), ignorenulls=True).over(w),
    )
    return (
        carried.filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "ts", "prior_view_ts")
    )


@query(
    "join_asof_forward_tol",
    # Forward as-of with a 1-hour tolerance: the FIRST view at or
    # after each purchase, nulled when it falls outside the window.
    # The oracle takes min(following view ts) per purchase and applies
    # the tolerance afterward — the declarative form of the same
    # semantics.
    oracle="""
        SELECT p.event_id, p.user_id, CAST(p.ts AS TIMESTAMP) AS ts,
               CASE WHEN min(v.ts) <= p.ts + INTERVAL 1 HOUR
                    THEN CAST(min(v.ts) AS TIMESTAMP) END AS next_view_ts
        FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
              FROM events WHERE event_type = 'purchase') p
        LEFT JOIN (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts
                   FROM events WHERE event_type = 'view') v
          ON p.user_id = v.user_id AND v.ts >= p.ts
        GROUP BY p.event_id, p.user_id, p.ts
    """,
    tags=("join", "asof"),
)
def join_asof_forward_tol(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6 completion: FORWARD as-of join with tolerance — for each
    purchase, the first view by the same user at or after the purchase,
    but only within 1 hour (the "did the user come back?" enrichment).
    Same union-window pattern as the backward join, mirrored: the
    frame is [current row, unbounded FOLLOWING] and ``first(...,
    ignorenulls)`` picks the earliest following view; at equal
    timestamps views sort AFTER purchases (is_view ASC) so a
    simultaneous view is inside the forward-inclusive frame, matching
    the oracle's ``v.ts >= p.ts``. The tolerance is a post-window
    conditional — no second join. Cost: the same ONE shuffle on
    user_id + per-partition sort as the backward variant; direction
    is free, which is the point of the union-window form over a
    range-join (where forward/backward each pay their own O(n·m)
    envelope)."""
    e = t(spark, sf_dir, "events").select("event_id", "user_id", "ts", "event_type")
    both = e.filter(F.col("event_type").isin("purchase", "view")).withColumn(
        "is_view", (F.col("event_type") == "view").cast("int")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("is_view").asc(), F.col("event_id").asc())
        .rowsBetween(0, Window.unboundedFollowing)
    )
    carried = both.withColumn(
        "next_view_raw",
        F.first(F.when(F.col("is_view") == 1, F.col("ts")), ignorenulls=True).over(w),
    )
    return (
        carried.filter(F.col("event_type") == "purchase")
        .select(
            "event_id",
            "user_id",
            "ts",
            F.when(
                F.col("next_view_raw") <= F.col("ts") + F.expr("INTERVAL 1 HOUR"),
                F.col("next_view_raw"),
            ).alias("next_view_ts"),
        )
    )


_OVERLAP_ORACLE = """
    WITH spans AS (
        SELECT user_id, CAST(ts AS DATE) AS day,
               min(CAST(ts AS TIMESTAMP)) AS s, max(CAST(ts AS TIMESTAMP)) AS e
        FROM events GROUP BY user_id, CAST(ts AS DATE)
    )
    SELECT a.day,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(sum(date_diff('second',
                              greatest(a.s, b.s),
                              least(a.e, b.e))) AS BIGINT) AS total_overlap_s
    FROM spans a JOIN spans b
      ON a.day = b.day AND a.user_id < b.user_id
     AND a.s <= b.e AND b.s <= a.e
    GROUP BY a.day
"""


@query("join_interval_overlap", oracle=_OVERLAP_ORACLE, tags=("join", "interval"))
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6 completion: interval-OVERLAP self-join — which users' daily
    activity spans overlap, per day (concurrency analysis: the shape
    behind co-presence, meeting conflicts, session collision counts).
    Intervals are built by collapsing events to per-(user, day)
    [min ts, max ts] spans — the ONLY corpus-sized pass — then the
    overlap pairs come from an equi-join on the DAY bucket with the
    symmetric overlap predicate (a.s ≤ b.e AND b.s ≤ a.e) as the join
    filter and a.user < b.user deduplicating the symmetric pair. At
    100 TB the day bucket bounds each join group to that day's active
    users (intervals spanning bucket boundaries split into one
    fragment per bucket, same as any interval index); the shuffle
    carries span rows (users × days), never events. Overlap seconds
    are exact integer arithmetic on both engines — no float in the
    hash."""
    ev = t(spark, sf_dir, "events")
    spans = ev.groupBy(
        "user_id", F.col("ts").cast("date").alias("day")
    ).agg(F.min("ts").alias("s"), F.max("ts").alias("e"))
    a = spans.select(
        F.col("day"), F.col("user_id").alias("ua"),
        F.col("s").alias("sa"), F.col("e").alias("ea"),
    )
    b = spans.select(
        F.col("day").alias("day_b"), F.col("user_id").alias("ub"),
        F.col("s").alias("sb"), F.col("e").alias("eb"),
    )
    pairs = a.join(
        b,
        (F.col("day") == F.col("day_b"))
        & (F.col("ua") < F.col("ub"))
        & (F.col("sa") <= F.col("eb"))
        & (F.col("sb") <= F.col("ea")),
    )
    overlap_s = (
        F.unix_timestamp(F.least("ea", "eb")) - F.unix_timestamp(F.greatest("sa", "sb"))
    )
    return pairs.groupBy("day").agg(
        F.count("*").alias("n_pairs"),
        F.sum(overlap_s).alias("total_overlap_s"),
    )


_SCD2_ORACLE = """
    WITH dim AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS valid_from,
               lead(CAST(ts AS TIMESTAMP)) OVER w AS valid_to,
               CAST(row_number() OVER w AS BIGINT) AS version_no,
               CAST(floor(value) AS BIGINT) AS plan_level
        FROM events WHERE event_type = 'signup'
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), f AS (
        SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
        FROM events WHERE event_type = 'purchase'
    )
    SELECT f.event_id, f.user_id, d.version_no, d.plan_level
    FROM f LEFT JOIN dim d
      ON f.user_id = d.user_id
     AND f.ts >= d.valid_from
     AND (d.valid_to IS NULL OR f.ts < d.valid_to)
"""


@query("join_scd2_point_in_time", oracle=_SCD2_ORACLE, tags=("join", "asof", "scd2"))
def join_scd2_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 (slowly-changing-dimension type 2) build + point-in-time
    join — the warehouse pattern behind "which plan was this user on
    when they purchased?". The dimension's version history is DERIVED
    (each signup event opens a version; `lead` over the per-user
    signup order closes the previous one) and every purchase fact is
    enriched with the version valid AT ITS EVENT TIME; purchases
    before a user's first version stay NULL (left semantics). The
    ORACLE is the textbook interval formulation (validity-range
    predicate join); the ENGINE never materializes intervals at all —
    the union-window as-of carries (version_no, plan_level) forward
    onto facts in the per-user event order, which is semantically
    identical (a fact's governing version IS the last version opened
    at or before it) and costs ONE shuffle + sort instead of a
    range-predicate join whose per-user cost is |facts|×|versions|.
    Equal-timestamp edges mirror exactly: a same-instant signup is
    visible to the purchase (dim sorts first at equal ts), and of two
    same-instant signups the later event_id governs — in the interval
    form the first's [t, t) validity is empty, in the window form the
    carry takes the last. plan_level is floor(value) → exact BIGINT;
    no floats in the output. Scale: the standard per-user-window
    envelope; version histories are bounded per user so the carried
    state is O(1)."""
    ev = t(spark, sf_dir, "events").select("event_id", "user_id", "ts", "event_type", "value")
    wv = Window.partitionBy("user_id").orderBy("ts", "event_id")
    sign = (
        ev.filter(F.col("event_type") == "signup")
        .withColumn("version_no", F.row_number().over(wv).cast("long"))
        .withColumn("plan_level", F.floor("value").cast("long"))
        .select("event_id", "user_id", "ts", "version_no", "plan_level", F.lit(1).alias("is_dim"))
    )
    fact = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            "event_id", "user_id", "ts",
            F.lit(None).cast("long").alias("version_no"),
            F.lit(None).cast("long").alias("plan_level"),
            F.lit(0).alias("is_dim"),
        )
    )
    wc = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("is_dim").desc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = sign.unionByName(fact).select(
        "event_id", "user_id", "ts", "is_dim",
        F.last("version_no", ignorenulls=True).over(wc).alias("version_no"),
        F.last("plan_level", ignorenulls=True).over(wc).alias("plan_level"),
    )
    return carried.filter(F.col("is_dim") == 0).select(
        "event_id", "user_id", "version_no", "plan_level"
    )


_NEAREST_ORACLE = """
    WITH e AS (
        SELECT user_id, event_id, event_type,
               epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
        FROM events WHERE event_type IN ('purchase', 'view')
    ), carried AS (
        SELECT *,
               last_value(CASE WHEN event_type = 'view' THEN ts_us END
                          IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY ts_us, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS prev_view_us,
               first_value(CASE WHEN event_type = 'view' THEN ts_us END
                           IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY ts_us, event_id
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                   AS next_view_us
        FROM e
    )
    SELECT event_id, user_id,
           CASE
             WHEN prev_view_us IS NULL AND next_view_us IS NULL THEN NULL
             WHEN next_view_us IS NULL THEN ts_us - prev_view_us
             WHEN prev_view_us IS NULL THEN -(next_view_us - ts_us)
             WHEN ts_us - prev_view_us <= next_view_us - ts_us
                  THEN ts_us - prev_view_us
             ELSE -(next_view_us - ts_us)
           END AS nearest_gap_us
    FROM carried
    WHERE event_type = 'purchase'
"""


@query("join_asof_nearest", oracle=_NEAREST_ORACLE, tags=("join", "asof"))
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6c: NEAREST-direction as-of — for each purchase, the closest
    view in time in EITHER direction, ties resolved toward the past
    (the `merge_asof(direction='nearest')` semantic, the third member
    of the family after backward and forward). One union-sorted pass:
    the backward carry and the forward carry are two mirrored frames
    over the SAME per-user sort — one exchange, two Window layers —
    then the smaller absolute gap wins. The output is the SIGNED gap
    in exact microseconds (positive = view before purchase, negative
    = after), so both the choice and the tie-break are pure BIGINT
    comparisons with no float anywhere; purchases by users with no
    views stay NULL. The oracle runs the IDENTICAL window formulation
    — a range-join restatement would cost DuckDB an O(n·m) per-user
    envelope for nothing. Scale: the standard per-user-window
    envelope, both directions in the same pass."""
    ev = t(spark, sf_dir, "events").select("event_id", "user_id", "ts", "event_type")
    both = ev.filter(F.col("event_type").isin("purchase", "view"))
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    view_ts = F.when(F.col("event_type") == "view", ts_us)
    back = (
        Window.partitionBy("user_id")
        .orderBy(ts_us.asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    fwd = (
        Window.partitionBy("user_id")
        .orderBy(ts_us.asc(), F.col("event_id").asc())
        .rowsBetween(0, Window.unboundedFollowing)
    )
    carried = both.select(
        "event_id", "user_id", "event_type", ts_us.alias("ts_us"),
        F.last(view_ts, ignorenulls=True).over(back).alias("prev_view_us"),
        F.first(view_ts, ignorenulls=True).over(fwd).alias("next_view_us"),
    )
    prev_gap = F.col("ts_us") - F.col("prev_view_us")
    next_gap = F.col("next_view_us") - F.col("ts_us")
    nearest = (
        F.when(F.col("prev_view_us").isNull() & F.col("next_view_us").isNull(), F.lit(None))
        .when(F.col("next_view_us").isNull(), prev_gap)
        .when(F.col("prev_view_us").isNull(), -next_gap)
        .when(prev_gap <= next_gap, prev_gap)
        .otherwise(-next_gap)
    )
    return (
        carried.filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", nearest.alias("nearest_gap_us"))
    )


_RB_WIN_S = 1800  # 30-minute range window


@query(
    "join_range_bucket_equi",
    oracle=f"""
        SELECT p.event_id,
               CAST(count(v.event_id) AS BIGINT) AS n_nearby_views
        FROM (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts
              FROM events WHERE event_type = 'purchase') p
        LEFT JOIN (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts
                   FROM events WHERE event_type = 'view') v
          ON v.ts > p.ts - INTERVAL {_RB_WIN_S} SECOND
         AND v.ts <= p.ts
        GROUP BY p.event_id
    """,
    tags=("join", "range"),
)
def join_range_bucket_equi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6c: PURE range join (no equality key — views by ANY user in
    the 30 minutes before each purchase) re-planned as a BUCKETED
    EQUI-JOIN: J6b's range join rides its user_id equality key through
    the hash shuffle, but a range join with no equi key plans as a
    nested-loop — O(|purchases|·|views|) — which is exactly what dies
    first at 100 TB. The standard fix, built from primitives: bucket
    time into window-width slots (floor(epoch/1800)), explode each
    probe row into the ≤2 slots its window overlaps (b and b−1 — a
    pure projection, always distinct), hash-join on the slot, and
    re-check the exact range as the join residual. Every view falls in
    exactly one slot, so no candidate can double-count; unmatched
    purchases survive the left join as count 0. The oracle states the
    ORIGINAL range-join semantics (DuckDB plans it as IEJoin), so the
    green hash row IS the equivalence proof that bucketing preserves
    the answer.

    Scale shape: one hash exchange per side on the slot key (probe
    carries 2× purchase rows); per-slot work is bounded by the event
    arrival rate per 30 minutes, not the corpus — and a hot slot
    (flash-sale burst) salts like any hot key, which no nested-loop
    formulation can. Slot width = window width is the sweet spot: ≤2
    probe slots, one build slot, residual selectivity ≥ 50%."""
    e = t(spark, sf_dir, "events").select(
        "event_id", F.col("ts").cast("timestamp").alias("ts"), "event_type"
    )
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        F.col("ts").alias("p_ts"),
        F.unix_timestamp("ts").alias("p_sec"),
    )
    v = e.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("v_id"),
        F.col("ts").alias("v_ts"),
        F.floor(F.unix_timestamp("ts") / _RB_WIN_S).alias("slot"),
    )
    probe = p.select(
        "p_id",
        "p_ts",
        F.explode(
            F.array(
                F.floor(F.col("p_sec") / _RB_WIN_S),
                F.floor((F.col("p_sec") - _RB_WIN_S) / _RB_WIN_S),
            )
        ).alias("slot"),
    )
    joined = probe.join(
        v,
        (probe["slot"] == v["slot"])
        & (F.col("v_ts") > F.col("p_ts") - F.expr(f"INTERVAL {_RB_WIN_S} SECOND"))
        & (F.col("v_ts") <= F.col("p_ts")),
        "left",
    )
    return joined.groupBy(F.col("p_id").alias("event_id")).agg(
        F.count("v_id").alias("n_nearby_views")
    )


_IVM_WIN_MIN = 5  # each event opens a 5-minute activity interval


@query(
    "join_interval_merge",
    oracle=f"""
        WITH iv AS (
            SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS s,
                   CAST(ts AS TIMESTAMP) + INTERVAL {_IVM_WIN_MIN} MINUTE AS e
            FROM events
        ),
        walked AS (
            SELECT user_id, event_id, s, e,
                   max(e) OVER (PARTITION BY user_id ORDER BY s, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND 1 PRECEDING) AS prev_max_e
            FROM iv
        ),
        flagged AS (
            SELECT user_id, event_id, s, e,
                   CASE WHEN prev_max_e IS NULL OR s > prev_max_e
                        THEN 1 ELSE 0 END AS new_island
            FROM walked
        ),
        islands AS (
            SELECT user_id, s, e,
                   sum(new_island) OVER (PARTITION BY user_id
                                         ORDER BY s, event_id
                                         ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND CURRENT ROW) AS island
            FROM flagged
        ),
        merged AS (
            SELECT user_id, island,
                   CAST(count(*) AS BIGINT) AS n_events,
                   CAST(date_diff('microseconds', min(s), max(e)) AS BIGINT)
                       AS covered_us
            FROM islands GROUP BY user_id, island
        )
        SELECT user_id,
               CAST(sum(n_events) AS BIGINT) AS n_events,
               CAST(count(*) AS BIGINT) AS n_intervals,
               CAST(sum(covered_us) AS BIGINT) AS covered_us,
               CAST(max(n_events) AS BIGINT) AS densest_interval
        FROM merged GROUP BY user_id
    """,
    tags=("join", "intervals"),
)
def join_interval_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6d: INTERVAL COALESCING — merge each user's overlapping
    5-minute activity windows into maximal covered spans (the
    union-of-intervals primitive behind "total engaged time", SLA
    coverage, and on-call overlap math; join_interval_overlap COUNTS
    pairwise overlaps, this one performs the UNION). The classic
    sweep: sort each user's intervals by start, a new span opens
    exactly when a start exceeds the running max of prior ends
    (touching spans merge — s > prev_max_e, strict), island id = the
    running sum of those flags, covered time = max(end) − min(start)
    per island in EXACT microseconds. One user-keyed sort serves the
    running-max, the flag, and the island id (three frames over the
    same window spec → one Window exchange).

    Plan: one shuffle on user_id + per-partition sort — the as-of
    cost envelope; island collapse and the per-user closer are
    grain-sized aggregates on the same partitioning. Mega-user skew
    mitigates with the time-bucket salt + carry-in boundary row
    documented at module head."""
    iv = t(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.col("ts").cast("timestamp").alias("s"),
        (F.col("ts").cast("timestamp") + F.expr(f"INTERVAL {_IVM_WIN_MIN} MINUTE")).alias("e"),
    )
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("s", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = iv.withColumn("prev_max_e", F.max("e").over(w_prev)).withColumn(
        "new_island",
        F.when(
            F.col("prev_max_e").isNull() | (F.col("s") > F.col("prev_max_e")), 1
        ).otherwise(0),
    )
    # BOTH running windows share the fully tie-broken (s, event_id)
    # order — ordering the island sum by (s, e) would tie whenever two
    # events share a timestamp and let the engines disagree on which
    # island a tied row joins.
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("s", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    islands = flagged.withColumn("island", F.sum("new_island").over(w_run))
    merged = islands.groupBy("user_id", "island").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.expr("timestampdiff(MICROSECOND, min(s), max(e))")
        .cast("long")
        .alias("covered_us"),
    )
    return merged.groupBy("user_id").agg(
        F.sum("n_events").cast("long").alias("n_events"),
        F.count(F.lit(1)).cast("long").alias("n_intervals"),
        F.sum("covered_us").cast("long").alias("covered_us"),
        F.max("n_events").cast("long").alias("densest_interval"),
    )
