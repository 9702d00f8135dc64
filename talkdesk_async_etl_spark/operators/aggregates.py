"""Aggregation operators (SURVEY.md §2.4): grouped/conditional
counts, multi-aggregate passes, distinct and approx-distinct,
rollup/cube/grouping sets, pivot, percentiles, argmax/mode, listagg,
boolean aggregates, approx_top_k, unpivot.

Split out of relational.py in round 9 (VERDICT r8 task 6) — same
query ids, same plans; scale notes stay inline per operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from talkdesk_async_etl_spark.plans.registry import query
from talkdesk_async_etl_spark.sources.io import read_table as t


# ---------------------------------------------------------------------------
# §2.4 Aggregations
# ---------------------------------------------------------------------------


@query(
    "agg_count",
    oracle="""
        SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n
        FROM orders GROUP BY o_orderstatus
    """,
    tags=("agg",),
)
def agg_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: counts by status in ONE pass — the reference issues two
    separate filtered ``.count()`` actions (DIST:262-263), i.e. two
    full scans; a single groupBy is one scan + map-side partial agg."""
    return t(spark, sf_dir, "orders").groupBy("o_orderstatus").agg(F.count("*").alias("n"))


@query(
    "agg_count_per_key",
    oracle="""
        SELECT l_orderkey,
               CAST(count(*) AS BIGINT) AS n_items,
               CAST(sum(CASE WHEN l_linestatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_finished,
               CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS n_returned
        FROM lineitem GROUP BY l_orderkey
    """,
    tags=("agg",),
)
def agg_count_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: all per-key conditional counts in one shuffle (replaces the
    reference's three correlated COUNT queries per job,
    local/monitoring_db.py:71-90)."""
    return (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(
            F.count("*").alias("n_items"),
            F.sum(F.when(F.col("l_linestatus") == "F", 1).otherwise(0)).alias("n_finished"),
            F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias("n_returned"),
        )
    )


FLAGSHIP_ORACLE = """
    SELECT CAST(o_orderdate AS DATE) AS order_date,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_finished,
           CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
           CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_partial,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
    FROM orders
    GROUP BY CAST(o_orderdate AS DATE)
"""


@query("agg_conditional_sum", oracle=FLAGSHIP_ORACLE, tags=("agg", "flagship"))
def agg_conditional_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3+X1+X8 (flagship): daily grouped conditional aggregation — the
    reference's job-summary dashboard (README.md:447-457,
    ``SUM(CASE WHEN status='X' THEN 1 ELSE 0 END) GROUP BY
    date(start_time)``) transplanted onto orders. One shuffle; the
    CASE/`when` folds into the partial aggregate map-side."""
    orders = t(spark, sf_dir, "orders")
    return (
        orders.groupBy(F.col("o_orderdate").cast("date").alias("order_date"))
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)).alias("n_finished"),
            F.sum(F.when(F.col("o_orderstatus") == "O", 1).otherwise(0)).alias("n_open"),
            F.sum(F.when(F.col("o_orderstatus") == "P", 1).otherwise(0)).alias("n_partial"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total_price"),
        )
    )


@query(
    "agg_group_counts",
    oracle="""
        SELECT o_orderpriority,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_finished,
               CAST(sum(CASE WHEN o_orderstatus <> 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_other
        FROM orders GROUP BY o_orderpriority
    """,
    tags=("agg",),
)
def agg_group_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: per-group success/failure split (reference README.md:462-471
    per-report-name monitoring counts)."""
    return (
        t(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)).alias("n_finished"),
            F.sum(F.when(F.col("o_orderstatus") != "F", 1).otherwise(0)).alias("n_other"),
        )
    )


@query(
    "agg_sum_two_keys",
    oracle="""
        SELECT CAST(l_shipdate AS DATE) AS ship_date, l_returnflag,
               round(sum(l_quantity), 2) AS sum_qty,
               CAST(count(*) AS BIGINT) AS n_items
        FROM lineitem GROUP BY CAST(l_shipdate AS DATE), l_returnflag
    """,
    tags=("agg",),
)
def agg_sum_two_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5: two-key grouped SUM (reference's daily rows-written summary,
    README.md:491-500)."""
    return (
        t(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_shipdate").cast("date").alias("ship_date"), F.col("l_returnflag"))
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"), F.count("*").alias("n_items"))
    )


@query(
    "agg_status_rollup",
    oracle="""
        WITH per_order AS (
            SELECT l_orderkey,
                   sum(CASE WHEN l_linestatus = 'F' THEN 1 ELSE 0 END) AS n_f,
                   sum(CASE WHEN l_linestatus = 'O' THEN 1 ELSE 0 END) AS n_o
            FROM lineitem GROUP BY l_orderkey
        )
        SELECT CASE WHEN n_o = 0 THEN 'SUCCESS'
                    WHEN n_f = 0 THEN 'FAILED'
                    ELSE 'PARTIAL_SUCCESS' END AS derived_status,
               CAST(count(*) AS BIGINT) AS n_orders
        FROM per_order GROUP BY 1
    """,
    tags=("agg",),
)
def agg_status_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6: the reference's job-status derivation fold
    (``fail==0 → SUCCESS; ok==0 → FAILED; else PARTIAL_SUCCESS``,
    DB:563-568) as a two-level aggregate, treating each order's
    lineitems as a job's reports."""
    per_order = (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(
            F.sum(F.when(F.col("l_linestatus") == "F", 1).otherwise(0)).alias("n_f"),
            F.sum(F.when(F.col("l_linestatus") == "O", 1).otherwise(0)).alias("n_o"),
        )
    )
    status = F.when(F.col("n_o") == 0, "SUCCESS").when(F.col("n_f") == 0, "FAILED").otherwise(
        "PARTIAL_SUCCESS"
    )
    return per_order.groupBy(status.alias("derived_status")).agg(F.count("*").alias("n_orders"))


@query(
    "agg_multi",
    oracle="""
        SELECT l_returnflag,
               CAST(count(*) AS BIGINT) AS n,
               sum(l_quantity) / count(*) AS avg_qty,
               min(l_extendedprice) AS min_price,
               max(l_extendedprice) AS max_price,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        FROM lineitem GROUP BY l_returnflag
    """,
    tags=("agg",),
)
def agg_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7: many aggregates in one pass — one shuffle computes all five
    (generalizes the reference's row-count reporting, DB:438)."""
    return (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n"),
            # avg as explicit sum/count: quantities are integer-valued so
            # the double sum is exact; an engine-internal incremental-mean
            # avg would not be reproducible across engines.
            (F.sum("l_quantity") / F.count("*")).alias("avg_qty"),
            F.min("l_extendedprice").alias("min_price"),
            F.max("l_extendedprice").alias("max_price"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double").alias("sum_price"),
        )
    )


@query(
    "agg_count_distinct",
    oracle="""
        SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
               CAST(count(*) AS BIGINT) AS n_events
        FROM events GROUP BY event_type
    """,
    tags=("agg",),
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8a: exact distinct count (Catalyst expands to a two-stage
    partial-distinct aggregate — no driver-side set)."""
    return (
        t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n_users"), F.count("*").alias("n_events"))
    )


@query("agg_approx_distinct", oracle=None, tags=("agg", "approx"))
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8b: HyperLogLog++ approximate distinct — the 100 TB path (fixed
    sketch memory instead of a per-group hash set; mergeable map-side).
    No exact oracle → rows-only check."""
    return (
        t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"))
    )


@query(
    "agg_approx_distinct_tol",
    # The invariant IS the query: HLL++ with rsd=0.02 is deterministic
    # for a given dataset, so every group's estimate sits within the 5%
    # tolerance of the exact count and the result is a constant
    # all-TRUE table. A sketch/precision regression flips rows to FALSE
    # → driver hash mismatch.
    oracle="SELECT event_type, CAST(1 AS BOOLEAN) AS within_tol FROM events GROUP BY event_type",
    tags=("agg", "approx", "invariant"),
)
def agg_approx_distinct_tol(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-attestable accuracy invariant for A8b: the approximate
    distinct count must land within 5% of the exact per-group count
    (2.5σ at rsd=0.02). Turns the approx operator's rows-only check
    into driver evidence the same way dedup_lsh_containment does for
    LSH."""
    exact = agg_count_distinct(spark, sf_dir).select("event_type", "n_users")
    approx = agg_approx_distinct(spark, sf_dir)
    return exact.join(approx, "event_type").select(
        "event_type",
        (F.abs(F.col("approx_users") - F.col("n_users")) <= 0.05 * F.col("n_users")).alias(
            "within_tol"
        ),
    )


@query(
    "agg_rollup",
    oracle="""
        SELECT o_orderstatus, o_orderpriority,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
    tags=("agg",),
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9: hierarchical rollup (status, priority) → (status) → () — the
    reference's day+report / day / total summary levels in one plan."""
    return (
        t(spark, sf_dir, "orders")
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total_price"),
        )
    )


@query(
    "agg_cube",
    oracle="""
        SELECT o_orderstatus, o_orderpriority,
               CAST(count(*) AS BIGINT) AS n
        FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    tags=("agg",),
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9b: full cube — all four grouping combinations (status×priority,
    status, priority, total) in one plan; the cross-dimension companion
    to agg_rollup's hierarchy."""
    return (
        t(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n"))
    )


@query(
    "agg_grouping_sets",
    oracle="""
        SELECT o_orderstatus, o_orderpriority,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
    """,
    tags=("agg",),
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9c: explicit GROUPING SETS — per-status totals AND per-priority
    totals in ONE pass, the arbitrary-set shape neither rollup
    (hierarchical) nor cube (full cross product) expresses. Catalyst
    plans it as a single Expand + one hash aggregate, so the fact table
    is still scanned exactly once; at 100 TB this replaces two separate
    aggregation jobs (and their two scans) with one."""
    return (
        t(spark, sf_dir, "orders")
        .groupingSets(
            [["o_orderstatus"], ["o_orderpriority"]],
            "o_orderstatus",
            "o_orderpriority",
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total_price"),
        )
    )


_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


@query(
    "pivot_event_counts",
    oracle="SELECT CAST(ts AS DATE) AS event_date, "
    + ", ".join(
        f"CAST(sum(CASE WHEN event_type = '{et}' THEN 1 ELSE 0 END) AS BIGINT) AS {et}"
        for et in _EVENT_TYPES
    )
    + " FROM events GROUP BY CAST(ts AS DATE)",
    tags=("agg", "pivot"),
)
def pivot_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (crosstab): daily counts per event type as columns.
    The pivot values are declared explicitly — an undeclared pivot
    costs an extra distinct-values job and makes the output schema
    data-dependent, both wrong at scale."""
    e = t(spark, sf_dir, "events").withColumn("event_date", F.col("ts").cast("date"))
    return (
        e.groupBy("event_date")
        .pivot("event_type", list(_EVENT_TYPES))
        .agg(F.count(F.lit(1)))  # count("*") is invalid inside pivot
        .select(
            "event_date",
            *[F.coalesce(F.col(et), F.lit(0)).cast("long").alias(et) for et in _EVENT_TYPES],
        )
    )


@query(
    "agg_percentile",
    oracle="""
        SELECT l_returnflag,
               quantile_disc(l_extendedprice, 0.5) AS p50_price,
               quantile_disc(l_extendedprice, 0.95) AS p95_price
        FROM lineitem GROUP BY l_returnflag
    """,
    tags=("agg",),
)
def agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10a: exact discrete percentiles (report-latency p50/p95 in the
    reference's monitoring workload). Discrete (not interpolated)
    percentiles return actual data values, so both engines agree
    bit-for-bit — interpolated variants differ in last-ulp float
    arithmetic and flip rounded cents at boundaries."""
    return (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY l_extendedprice)").alias("p50_price"),
            F.expr("percentile_disc(0.95) WITHIN GROUP (ORDER BY l_extendedprice)").alias("p95_price"),
        )
    )


@query("agg_percentile_approx", oracle=None, tags=("agg", "approx"))
def agg_percentile_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10b: approximate percentiles — the scale path (fixed-size
    mergeable sketch vs. exact percentile's full sort per group).
    Returned as two scalar columns (not array<double>) so row-wise
    harnesses can hash/sort the result."""
    return (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.percentile_approx("l_extendedprice", [0.5, 0.95], 10000).alias("approx_pcts"))
        .select(
            "l_returnflag",
            F.element_at("approx_pcts", 1).alias("p50_price"),
            F.element_at("approx_pcts", 2).alias("p95_price"),
        )
    )


@query(
    "agg_percentile_approx_tol",
    # Constant all-TRUE oracle: percentile_approx at accuracy 10000 has
    # rank error <= n/10000 (a handful of ranks at test scale) on a
    # dense price distribution, far inside the 1% value tolerance, and
    # the sketch is deterministic for a given dataset.
    oracle="SELECT DISTINCT l_returnflag, CAST(1 AS BOOLEAN) AS within_tol FROM lineitem",
    tags=("agg", "approx", "invariant"),
)
def agg_percentile_approx_tol(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-attestable accuracy invariant for A10b: approximate
    p50/p95 must land within 1% of the exact discrete percentiles per
    group."""
    exact = agg_percentile(spark, sf_dir)
    approx = (
        agg_percentile_approx(spark, sf_dir)
        .withColumnRenamed("p50_price", "a50")
        .withColumnRenamed("p95_price", "a95")
    )
    tol = (F.abs(F.col("a50") - F.col("p50_price")) <= 0.01 * F.col("p50_price")) & (
        F.abs(F.col("a95") - F.col("p95_price")) <= 0.01 * F.col("p95_price")
    )
    return exact.join(approx, "l_returnflag").select("l_returnflag", tol.alias("within_tol"))


@query(
    "agg_unpivot_melt",
    # The oracle computes the same per-type stats straight from the
    # long-form source — a lossy pivot→melt roundtrip (dropped type,
    # miscounted nulls, wrong value column) breaks the hash.
    oracle="SELECT event_type, "
    "CAST(count(DISTINCT user_id) AS BIGINT) AS n_users, "
    "CAST(count(*) AS BIGINT) AS n_events "
    "FROM events GROUP BY event_type",
    tags=("agg", "unpivot"),
)
def agg_unpivot_melt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9's inverse: wide→long via ``DataFrame.unpivot`` (melt). The
    pivoted per-user crosstab (pivot_event_counts' shape keyed by user)
    melts back to (user_id, event_type, n) rows, and re-aggregating the
    melted relation must reproduce the per-type stats of the original
    long-form events — the roundtrip that proves neither direction
    drops or double-counts.

    Scale shape: unpivot is an Expand (×|value columns|) inside the
    stage — no shuffle of its own; the only exchanges are the two
    aggregations either side. The melt keeps NULL cells out via the
    post-filter (a user with no 'error' events contributes no long
    row), matching the long-form source exactly."""
    e = t(spark, sf_dir, "events", spread=True)
    wide = (
        e.groupBy("user_id")
        .pivot("event_type", list(_EVENT_TYPES))
        .agg(F.count(F.lit(1)))
    )
    long = wide.unpivot(
        ids=["user_id"],
        values=list(_EVENT_TYPES),
        variableColumnName="event_type",
        valueColumnName="n",
    ).where(F.col("n").isNotNull())
    return long.groupBy("event_type").agg(
        F.count("*").alias("n_users"),
        F.sum("n").cast("long").alias("n_events"),
    )


_MAXBY_ORACLE = """
    WITH rk AS (
        SELECT o_orderstatus, o_orderkey,
               row_number() OVER (PARTITION BY o_orderstatus
                   ORDER BY o_totalprice DESC, o_orderkey DESC) AS rmax,
               row_number() OVER (PARTITION BY o_orderstatus
                   ORDER BY o_totalprice ASC, o_orderkey ASC) AS rmin
        FROM orders
    ),
    c AS (
        SELECT o_orderstatus, o_orderpriority, count(*) AS cnt
        FROM orders GROUP BY o_orderstatus, o_orderpriority
    ),
    cr AS (
        SELECT o_orderstatus, o_orderpriority,
               row_number() OVER (PARTITION BY o_orderstatus
                   ORDER BY cnt DESC, o_orderpriority DESC) AS r
        FROM c
    )
    SELECT mx.o_orderstatus,
           CAST(mx.o_orderkey AS BIGINT) AS top_order,
           CAST(mn.o_orderkey AS BIGINT) AS bottom_order,
           cr.o_orderpriority AS mode_priority
    FROM (SELECT o_orderstatus, o_orderkey FROM rk WHERE rmax = 1) mx
    JOIN (SELECT o_orderstatus, o_orderkey FROM rk WHERE rmin = 1) mn
      USING (o_orderstatus)
    JOIN cr USING (o_orderstatus)
    WHERE cr.r = 1
"""


@query("agg_max_by_mode", oracle=_MAXBY_ORACLE, tags=("agg",))
def agg_max_by_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-family depth: ``max_by`` / ``min_by`` (argmax/argmin without
    a self-join or window) and a DETERMINISTIC mode. The ordering
    argument is a struct — (o_totalprice, o_orderkey) — so ties on
    the price break on the key and the answer is reproducible; a bare
    ``mode()`` is tie-arbitrary on both engines, so the mode here is
    max_by over the per-(status, priority) counts with the same
    struct-tie-break trick. One hash aggregate for argmax/argmin (the
    state per group is ONE (ordering, value) pair — compare a window
    row_number formulation, which sorts the whole partition), plus a
    groups-sized second aggregate for the mode; the oracle uses the
    window formulation precisely because it is the semantics max_by
    replaces."""
    o = t(spark, sf_dir, "orders").select(
        "o_orderstatus", "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    ords = F.struct("o_totalprice", "o_orderkey")
    extremes = o.groupBy("o_orderstatus").agg(
        F.max_by("o_orderkey", ords).alias("top_order"),
        F.min_by("o_orderkey", ords).alias("bottom_order"),
    )
    mode = (
        o.groupBy("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("cnt"))
        .groupBy("o_orderstatus")
        .agg(
            F.max_by(
                "o_orderpriority", F.struct("cnt", "o_orderpriority")
            ).alias("mode_priority")
        )
    )
    return extremes.join(F.broadcast(mode), "o_orderstatus").select(
        "o_orderstatus", "top_order", "bottom_order", "mode_priority"
    )


_LISTAGG_ORACLE = """
    SELECT c_mktsegment,
           string_agg(DISTINCT o_orderpriority, '|' ORDER BY o_orderpriority)
               AS priorities,
           CAST(count(*) AS BIGINT) AS n_orders
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
"""


@query("agg_listagg_ordered", oracle=_LISTAGG_ORACLE, tags=("agg", "string"))
def agg_listagg_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A20: ordered string aggregation — Spark 4's `listagg(DISTINCT …)
    WITHIN GROUP (ORDER BY …)`, the SQL-standard surface every report
    migration hits (DuckDB/Postgres `string_agg`, Oracle LISTAGG).
    Determinism is the whole point of the WITHIN GROUP clause: an
    unordered collect would hash-mismatch between engines on every
    run, so this row attests the ordering contract itself. DISTINCT
    bounds the per-group state to the value domain (5 priorities)
    rather than the row count — without it a 100 TB group would
    concatenate billions of rows; at scale pair with an explicit
    domain cap or switch to collect_set + array_join + slice. One
    broadcast dim join + one map-side-partial aggregate."""
    orders = t(spark, sf_dir, "orders").select("o_custkey", "o_orderpriority")
    cust = t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    joined = orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
    joined.createOrReplaceTempView("listagg_src")
    return joined.sparkSession.sql(
        """
        SELECT c_mktsegment,
               listagg(DISTINCT o_orderpriority, '|')
                   WITHIN GROUP (ORDER BY o_orderpriority) AS priorities,
               CAST(count(*) AS BIGINT) AS n_orders
        FROM listagg_src
        GROUP BY c_mktsegment
        """
    )


_BOOL_ORACLE = """
    SELECT c_mktsegment,
           bool_and(o_totalprice > 1500) AS all_above_min,
           bool_or(o_orderstatus = 'F') AS any_finished,
           CAST(count(*) FILTER (o_orderpriority = '1-URGENT') AS BIGINT)
               AS n_urgent,
           CAST(count(*) AS BIGINT) AS n_orders
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
"""


@query("agg_bool_family", oracle=_BOOL_ORACLE, tags=("agg", "bool"))
def agg_bool_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A21: the boolean aggregate family — `every` (bool_and), `some`
    (bool_or), `count_if` — the predicates-per-group surface data
    quality checks compile to ("every order above the floor?", "any
    finished?"). All three fold map-side as single-bit/long partials;
    one broadcast dim join + one aggregate."""
    orders = t(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice", "o_orderstatus", "o_orderpriority"
    )
    cust = t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.every(F.col("o_totalprice") > 1500).alias("all_above_min"),
            F.some(F.col("o_orderstatus") == "F").alias("any_finished"),
            F.count_if(F.col("o_orderpriority") == "1-URGENT").alias("n_urgent"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


_ATK_ORACLE = """
    SELECT o_orderpriority AS item,
           CAST(count(*) AS BIGINT) AS est_count
    FROM orders
    GROUP BY o_orderpriority
"""


@query("agg_approx_top_k_exact_domain", oracle=_ATK_ORACLE, tags=("agg", "sketch"))
def agg_approx_top_k_exact_domain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A22: the BUILT-IN `approx_top_k` sketch function (Spark 4) —
    the engine-native counterpart to the hand-rolled count-min top-k
    (agg_cms_topk_ok). Attested in the regime where the sketch is
    provably exact: k = the full value domain (5 priorities) and the
    default 10 000 tracked items dwarf it, so the frequency summary
    must equal true counts — DuckDB's plain group-by count IS the
    oracle, no tolerance needed. The struct-array result explodes to
    atomic (item, est_count) rows for the harness. Scale: the sketch
    state is bounded by maxItemsTracked regardless of rows, merges
    associatively across partitions, and replaces a full shuffle of
    group keys with a fixed-size summary when the domain outgrows the
    tracked budget — at that point the exactness guarantee degrades
    to top-k-with-error, which is the documented trade."""
    orders = t(spark, sf_dir, "orders")
    return (
        orders.select(
            F.explode(F.expr("approx_top_k(o_orderpriority, 5)")).alias("e")
        )
        .select(
            F.col("e.item").alias("item"),
            F.col("e.count").cast("long").alias("est_count"),
        )
    )


_GROUPING_ID_ORACLE = """
    SELECT o_orderstatus, o_orderpriority,
           CAST(GROUPING(o_orderstatus) AS INTEGER) AS g_status,
           CAST(GROUPING(o_orderpriority) AS INTEGER) AS g_priority,
           CAST(GROUPING(o_orderstatus, o_orderpriority) AS INTEGER) AS gid,
           CAST(count(*) AS BIGINT) AS n
    FROM orders
    GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
"""


@query("agg_grouping_id", oracle=_GROUPING_ID_ORACLE, tags=("agg", "rollup"))
def agg_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9 depth — ``grouping()`` / ``grouping_id()`` over a ROLLUP:
    the flags that let a consumer tell a subtotal row from a data row
    whose key is genuinely NULL (without them a rollup over a nullable
    column is ambiguous). Both engines share the bit convention
    (leftmost grouping column = most significant bit — probed). Same
    single-Expand plan as agg_rollup; the flags are free metadata on
    the Expand's tag column."""
    o = t(spark, sf_dir, "orders", spread=True)
    return o.rollup("o_orderstatus", "o_orderpriority").agg(
        F.grouping("o_orderstatus").cast("int").alias("g_status"),
        F.grouping("o_orderpriority").cast("int").alias("g_priority"),
        F.grouping_id().cast("int").alias("gid"),
        F.count(F.lit(1)).alias("n"),
    )

