"""Relational operators: scans, filters, joins, aggregations, sorts, sets.

Covers SURVEY.md §2.1 (S1/S2/S4), §2.2 (F1-F7), §2.3 (J1-J5, J7),
§2.4 (A1-A9), §2.6 (O1-O3), §2.7 (set ops). Reference behaviors are
transplanted onto the driver testdata star schema: the reference's
config/monitoring tables (report_config, job_monitoring — see
ddl/ddl_talkdesk_config.py:10-34) have the same relational shapes as
orders/lineitem here (filtered scans, single-key equi joins, grouped
conditional counts), so each query id exercises the identical operator
on the oracle-checkable tables.

Scale notes are inline per operator: what shuffles, what broadcasts,
what prunes. All plans are pure DataFrame expressions — Catalyst pushes
filters/projections into the parquet scans (verify via
``.explain("formatted")`` → ``PushedFilters``/``ReadSchema``).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from talkdesk_async_etl_spark.plans.registry import query
from talkdesk_async_etl_spark.sources.io import read_table as t

# ---------------------------------------------------------------------------
# §2.1 Scans / sources
# ---------------------------------------------------------------------------


@query(
    "scan_parquet",
    oracle="SELECT r_regionkey, r_name FROM region",
    tags=("scan",),
)
def scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1: plain columnar scan (reference scans its Delta config tables,
    databricks/talkdesk_databricks_etl.py:191-200)."""
    return t(spark, sf_dir, "region").select("r_regionkey", "r_name")


@query(
    "csv_roundtrip",
    oracle="""
        SELECT o_orderstatus,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        FROM orders WHERE o_orderkey % 10 = 0
        GROUP BY o_orderstatus
    """,
    tags=("scan", "csv"),
)
def csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4+S5: write a slice of orders to a CSV sink and read it back
    with an explicit schema (the reference round-trips every payload
    through CSV text, DB:437/441-446), then aggregate — proves the CSV
    codec preserves values. Distributed write (directory of parts), no
    ``coalesce(1)`` bottleneck."""
    out = os.path.join(tempfile.gettempdir(), "tde_csv_roundtrip")
    slice_df = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 10 == 0)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
    )
    slice_df.write.mode("overwrite").option("header", True).csv(out)
    back = spark.read.schema("o_orderkey BIGINT, o_orderstatus STRING, o_totalprice DOUBLE").option(
        "header", True
    ).csv(out)
    # Money sums go through DECIMAL: double summation is
    # order-dependent (parallel partial aggregates reorder terms), so a
    # rounded double sum can flip a cent vs the oracle at any SF.
    # Decimal accumulation is exact and order-free on both engines.
    return back.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total_price"),
    )


# The reference's 8 seeded report kinds (ddl/ddl_talkdesk_config.py:72-88,
# config.example.json:11-20) — the fixture content for scan_json_doc.
_SEED_REPORTS = (
    "agent_activity", "call_volume", "queue_activity", "call_details",
    "inbound_calls", "outbound_calls", "service_level", "call_dispositions",
)


@query(
    "scan_json_doc",
    oracle="SELECT * FROM (VALUES "
    + ", ".join(
        f"('{r}', 3, {60 if r == 'call_details' else 30})" for r in _SEED_REPORTS
    )
    + ") t(report_name, retries, timeout_sec)",
    tags=("scan", "json"),
)
def scan_json_doc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2: JSON config-document load (reference ``load_config()``,
    local/async_utils.py:11-15). Writes the reference-shaped document,
    loads it driver-side into the typed config model, and returns the
    report rows as a DataFrame — config is orchestration metadata, so
    it is parsed on the driver (one small doc), never as a Spark job."""
    import json

    from talkdesk_async_etl_spark.sources.io import read_json_doc

    doc = {
        "base_url": "https://api.example.com",
        "output_base_path": "/tmp/tde_out",
        "reports": [
            {
                "report_name": r,
                "retries": 3,
                "timeout_sec": 60 if r == "call_details" else 30,
            }
            for r in _SEED_REPORTS
        ],
    }
    path = os.path.join(tempfile.gettempdir(), "tde_scan_json_doc.json")
    with open(path, "w", encoding="utf-8") as fh:
        json.dump(doc, fh)
    loaded = read_json_doc(path)
    return spark.createDataFrame(
        [(r["report_name"], r["retries"], r["timeout_sec"]) for r in loaded["reports"]],
        "report_name STRING, retries INT, timeout_sec INT",
    )


# ---------------------------------------------------------------------------
# §2.2 Filters / projections
# ---------------------------------------------------------------------------


@query(
    "filter_conj_eq",
    oracle="""
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders
        WHERE o_orderstatus = 'F' AND o_orderpriority = '1-URGENT'
    """,
    tags=("filter",),
)
def filter_conj_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1: conjunctive equality filter — the reference's config-scan
    predicate ``enabled = true AND env = 'prod'`` (DB:192-194). Both
    conjuncts push down into the parquet scan."""
    return (
        t(spark, sf_dir, "orders")
        .filter((F.col("o_orderstatus") == "F") & (F.col("o_orderpriority") == "1-URGENT"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@query(
    "filter_col_eq",
    oracle="SELECT event_id, user_id, value FROM events WHERE event_type = 'error'",
    tags=("filter",),
)
def filter_col_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2: single column-expression equality (reference
    ``.filter(F.col('status') == 'SUCCESS')``, DIST:259-263)."""
    return (
        t(spark, sf_dir, "events")
        .filter(F.col("event_type") == "error")
        .select("event_id", "user_id", "value")
    )


@query(
    "filter_limit1",
    oracle="""
        SELECT c_custkey, c_name, c_mktsegment
        FROM customer WHERE c_mktsegment = 'BUILDING'
        ORDER BY c_custkey LIMIT 1
    """,
    tags=("filter", "limit"),
)
def filter_limit1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3: filter → LIMIT 1 lookup (reference's pandas
    ``mask → iloc[0]``, DB:537-541). Deterministic via ORDER BY key;
    Spark plans TakeOrderedAndProject — no full sort."""
    return (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .orderBy("c_custkey")
        .limit(1)
        .select("c_custkey", "c_name", "c_mktsegment")
    )


@query(
    "filter_date_range",
    oracle="""
        SELECT event_id, user_id, event_type
        FROM events
        WHERE ts >= TIMESTAMP '2024-01-08 00:00:00'
          AND ts <  TIMESTAMP '2024-01-15 00:00:00'
    """,
    tags=("filter", "date"),
)
def filter_date_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4: date-range predicate (reference's 7-day dashboard windows,
    README.md:455). Parameterized to a fixed literal week for oracle
    determinism; at scale this predicate prunes date partitions."""
    return (
        t(spark, sf_dir, "events")
        .filter(
            (F.col("ts") >= F.lit("2024-01-08 00:00:00").cast("timestamp"))
            & (F.col("ts") < F.lit("2024-01-15 00:00:00").cast("timestamp"))
        )
        .select("event_id", "user_id", "event_type")
    )


@query(
    "project_columns",
    oracle="SELECT o_orderkey, o_orderdate, o_totalprice FROM orders",
    tags=("filter", "projection"),
)
def project_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5: column pruning — ReadSchema must list exactly these three
    columns (the scan must not read the other 3)."""
    return t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate", "o_totalprice")


@query(
    "filter_null_handling",
    oracle="""
        SELECT l_linestatus,
               CAST(sum(CASE WHEN nullif(l_returnflag, 'N') IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
               CAST(sum(CASE WHEN nullif(l_returnflag, 'N') IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_not_null,
               count(coalesce(nullif(l_returnflag, 'N'), NULL)) AS n_counted
        FROM lineitem GROUP BY l_linestatus
    """,
    tags=("filter", "null"),
)
def filter_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6: null semantics — isNull / isNotNull / coalesce / null-skipping
    count (reference: FAILED rows carry error_message, NULL otherwise,
    README.md:484)."""
    li = t(spark, sf_dir, "lineitem")
    flag = F.nullif(F.col("l_returnflag"), F.lit("N"))
    return li.groupBy("l_linestatus").agg(
        F.sum(F.when(flag.isNull(), 1).otherwise(0)).alias("n_null"),
        F.sum(F.when(flag.isNotNull(), 1).otherwise(0)).alias("n_not_null"),
        F.count(flag).alias("n_counted"),
    )


@query(
    "filter_in_like",
    oracle="""
        SELECT p_partkey, p_name, p_brand, p_type
        FROM part
        WHERE p_brand IN ('Brand#1', 'Brand#2', 'Brand#3')
          AND p_type LIKE '%A%'
    """,
    tags=("filter",),
)
def filter_in_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7: IN-list + LIKE pattern predicates (report-name routing
    generalized from DB:536-541). Both push down to the scan. The
    pattern is '%A%' because the fixture's p_type values are uppercase
    words (STANDARD/LARGE/...) — a lowercase pattern matches nothing
    and the vacuity gate rejects the empty attestation."""
    return (
        t(spark, sf_dir, "part")
        .filter(F.col("p_brand").isin("Brand#1", "Brand#2", "Brand#3") & F.col("p_type").like("%A%"))
        .select("p_partkey", "p_name", "p_brand", "p_type")
    )


# ---------------------------------------------------------------------------
# §2.3 Joins
# ---------------------------------------------------------------------------


@query(
    "join_inner_using",
    oracle="""
        SELECT n_nationkey, n_name, r_name
        FROM nation JOIN region ON n_regionkey = r_regionkey
    """,
    tags=("join",),
)
def join_inner_using(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1: single-key equi inner join, USING-style deduplicated key
    (the reference's ``report_df.join(endpoint_df, 'endpoint_type')``,
    DIST:53). Both sides tiny → AQE broadcasts automatically."""
    nation = t(spark, sf_dir, "nation").withColumnRenamed("n_regionkey", "regionkey")
    region = t(spark, sf_dir, "region").withColumnRenamed("r_regionkey", "regionkey")
    return nation.join(region, "regionkey").select("n_nationkey", "n_name", "r_name")


@query(
    "join_broadcast_lookup",
    oracle="""
        SELECT c_custkey, c_acctbal, n_name
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        WHERE n_regionkey = 2 AND c_mktsegment = 'MACHINERY'
    """,
    tags=("join", "broadcast"),
)
def join_broadcast_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2: dimension-lookup join with an explicit broadcast hint —
    replaces the reference's driver-side pandas row loop (DB:536-541):
    never loop rows on the driver; ship the small side to every
    executor and stream the fact table through it (no shuffle of the
    big side). The hint is a CONTRACT that the build side is bounded:
    nation has a FIXED 25 rows at every scale factor (it stands in for
    the reference's 8-row endpoint_config lookup, DB:537-541), so the
    hint is safe at 100 TB. The scaling ``customer`` side is never
    hinted — for a side that grows with the data, leave the choice to
    AQE (see join_star). tests/test_plans.py locks the build side to
    the nation scan."""
    cust = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "MACHINERY")
    dim = t(spark, sf_dir, "nation").filter(F.col("n_regionkey") == 2)
    return (
        cust.join(F.broadcast(dim), cust.c_nationkey == dim.n_nationkey)
        .select("c_custkey", "c_acctbal", "n_name")
    )


@query(
    "join_fk_monitoring",
    oracle="""
        SELECT o_orderkey, o_orderstatus,
               CAST(count(l_orderkey) AS BIGINT) AS n_items,
               CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS n_returned
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        GROUP BY o_orderkey, o_orderstatus
    """,
    tags=("join", "agg"),
)
def join_fk_monitoring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3+A2: FK join + per-key counts — the reference's per-job report
    counts (``SELECT COUNT(*) FROM reports WHERE job_id=?`` ×3,
    local/monitoring_db.py:71-90) collapsed into ONE shuffle: a single
    groupBy computes all conditional counts per key instead of three
    correlated scans."""
    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_returnflag")
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_orderstatus")
        .agg(
            F.count("l_orderkey").alias("n_items"),
            F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias("n_returned"),
        )
    )


@query(
    "join_left_outer",
    oracle="""
        SELECT c_custkey, c_mktsegment, CAST(count(o_orderkey) AS BIGINT) AS n_orders
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey, c_mktsegment
    """,
    tags=("join",),
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4: left outer join preserving zero-match rows (the reference's
    zero-report job case, local/monitoring_db.py:99-100)."""
    cust = t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey", "c_mktsegment")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@query(
    "join_semi",
    oracle="""
        SELECT c_custkey, c_name FROM customer
        WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
    """,
    tags=("join",),
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5a: left-semi join (EXISTS) — customers with a finished order.
    Semi join never duplicates the left side, unlike inner+distinct."""
    cust = t(spark, sf_dir, "customer")
    fin = t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return (
        cust.join(fin, cust.c_custkey == fin.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
    )


@query(
    "join_anti",
    oracle="""
        SELECT c_custkey, c_name FROM customer
        WHERE NOT EXISTS
            (SELECT 1 FROM orders
             WHERE o_orderpriority = '1-URGENT' AND o_custkey = c_custkey)
    """,
    tags=("join",),
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5b: left-anti join (NOT EXISTS) — customers with no urgent
    orders. The build side is filtered (every fixture customer has SOME
    order, which made the unfiltered formulation vacuously empty); the
    priority predicate pushes into the orders scan before the anti
    join."""
    cust = t(spark, sf_dir, "customer")
    urgent = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    return (
        cust.join(urgent, cust.c_custkey == urgent.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
    )


@query(
    "join_star",
    oracle="""
        SELECT r_name, n_name,
               CAST(count(*) AS BIGINT) AS n_lineitems,
               CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name
    """,
    tags=("join", "agg"),
)
def join_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7: multi-way star join (TPC-H shape). Scale strategy: the two
    SF-scaling joins (lineitem ⋈ orders, ⋈ customer) are left to AQE —
    it broadcasts customer while it fits and switches to sort-merge
    with skew splitting when it doesn't (customer GROWS with the data;
    a hard broadcast hint on it would OOM the build side at 100 TB).
    Only the fixed-cardinality dimensions (nation 25 rows, region 5)
    get explicit broadcast hints, so the fact stream never reshuffles
    after the customer hop."""
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice", "l_discount")
    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = t(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    region = t(spark, sf_dir, "region").select("r_regionkey", "r_name")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count("*").alias("n_lineitems"),
            # revenue is a 4-decimal-logical product (2dp × 2dp):
            # decimal(18,4) accumulation is exact and order-free, so the
            # parallel partial-agg term order can't flip cents.
            F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)"))
            .cast("double")
            .alias("revenue"),
        )
    )


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


# ---------------------------------------------------------------------------
# §2.6 Sorts / limits / top-k
# ---------------------------------------------------------------------------


@query(
    "sort_multi_key",
    oracle="""
        SELECT o_orderkey, o_orderdate, o_orderpriority, o_totalprice
        FROM orders
        ORDER BY o_orderdate DESC, o_orderpriority ASC, o_orderkey ASC
        LIMIT 100
    """,
    tags=("sort",),
)
def sort_multi_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1: multi-key mixed-direction sort (reference README.md:500
    ``ORDER BY date DESC, report_name``) with a unique tie-break key.
    With LIMIT, Spark plans TakeOrderedAndProject — per-partition
    top-100 then merge, never a global sort."""
    return (
        t(spark, sf_dir, "orders")
        .orderBy(F.col("o_orderdate").desc(), F.col("o_orderpriority").asc(), F.col("o_orderkey").asc())
        .limit(100)
        .select("o_orderkey", "o_orderdate", "o_orderpriority", "o_totalprice")
    )


@query(
    "sort_topk_global",
    oracle="""
        SELECT o_orderkey, o_totalprice
        FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
    """,
    tags=("sort",),
)
def sort_topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O3: global top-K — TakeOrderedAndProject keeps K rows per
    partition then merges K·P rows on the driver; O(K) memory at any
    scale."""
    return (
        t(spark, sf_dir, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(10)
        .select("o_orderkey", "o_totalprice")
    )


# ---------------------------------------------------------------------------
# §2.7 Set operations
# ---------------------------------------------------------------------------


@query(
    "set_union",
    oracle="""
        SELECT c_nationkey AS nationkey FROM customer
        UNION
        SELECT s_nationkey AS nationkey FROM supplier
    """,
    tags=("set",),
)
def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-op: UNION (distinct) — nations having customers or
    suppliers (the reference's dev/prod env-diff admin query shape,
    ddl_talkdesk_config.py:72-88)."""
    c = t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.unionByName(s).distinct()


@query(
    "set_intersect",
    oracle="""
        SELECT c_nationkey AS nationkey FROM customer
        INTERSECT
        SELECT s_nationkey AS nationkey FROM supplier
    """,
    tags=("set",),
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-op: INTERSECT — nations with both customers and suppliers."""
    c = t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@query(
    "set_except",
    oracle="""
        SELECT l_shipdate AS activity_date FROM lineitem
        EXCEPT
        SELECT o_orderdate AS activity_date FROM orders
    """,
    tags=("set",),
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-op: EXCEPT (distinct) — days with shipments but no newly
    placed orders. (The earlier customer-vs-supplier nation formulation
    was vacuously empty: all 25 fixture nations have both.) Shipdates
    run past the last orderdate, so this is non-empty at every SF."""
    ship = t(spark, sf_dir, "lineitem").select(F.col("l_shipdate").alias("activity_date"))
    ordd = t(spark, sf_dir, "orders").select(F.col("o_orderdate").alias("activity_date"))
    return ship.subtract(ordd)


@query(
    "sink_partition_prune_ok",
    # Invariant companion (pattern of sim_kmeans_inertia_ok): prune_ok
    # is pinned TRUE — it flips FALSE if the reread plan loses its
    # PartitionFilters (layout or reader regression) — while n_langs
    # and n_en are real oracle-checked values: DuckDB computes them on
    # the ORIGINAL table, so a sink that drops/duplicates rows or
    # mangles the partition column breaks the hash even though Spark
    # counted the round-tripped copy.
    oracle="""
        SELECT CAST(1 AS BOOLEAN) AS prune_ok,
               (SELECT CAST(count(DISTINCT lang) AS BIGINT) FROM documents)
                   AS n_langs,
               (SELECT CAST(count(*) AS BIGINT) FROM documents
                WHERE lang = 'en') AS n_en
    """,
    tags=("sink", "invariant"),
)
def sink_partition_prune_ok(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5/S6 depth: write documents as a hive-partitioned parquet
    dataset (``partitionBy(lang)``, sorted by doc_id within files),
    read it back filtered on the partition key, and attest from the
    PHYSICAL PLAN that the filter became a partition-directory prune
    (``PartitionFilters``) rather than a data filter — the property
    that makes a 100 TB corpus queryable per-language without scanning
    the other languages. The row counts cross-check against the source
    table via the oracle, so the sink round-trip is value-checked too."""
    import contextlib
    import io as _io

    from talkdesk_async_etl_spark.sources.io import write_partitioned

    d = t(spark, sf_dir, "documents")
    out = os.path.join(tempfile.gettempdir(), "tde_sink_partitioned")
    write_partitioned(d, out, partition_by=("lang",), sort_by=("doc_id",))

    back = spark.read.parquet(out)
    pruned = back.filter(F.col("lang") == "en")
    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        pruned.explain("formatted")
    plan = buf.getvalue()
    pf_line = next((l for l in plan.splitlines() if "PartitionFilters" in l), "")
    prune_ok = "lang" in pf_line and "en" in pf_line
    n_langs = back.select("lang").distinct().count()
    n_en = pruned.count()
    return spark.createDataFrame(
        [(bool(prune_ok), n_langs, n_en)],
        "prune_ok boolean, n_langs bigint, n_en bigint",
    )


_BUCKETS = 8


@query(
    "join_bucketed_noshuffle_ok",
    # Invariant + value check: noshuffle_ok pins the plan property (a
    # SortMergeJoin with ZERO Exchange operators — co-located bucketed
    # reads); the per-segment counts are real oracle values computed by
    # DuckDB on the SOURCE tables, so a bucketed write that drops or
    # mis-hashes rows breaks the hash even though Spark joined its own
    # round-tripped copies.
    oracle="""
        SELECT CAST(1 AS BOOLEAN) AS noshuffle_ok, c_mktsegment,
               CAST(count(*) AS BIGINT) AS n_orders
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment
    """,
    tags=("join", "bucketed", "invariant"),
)
def join_bucketed_noshuffle_ok(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-depth: bucketed co-located join — write orders and customer
    bucketed (and sorted) on the join key into catalog tables, join
    them, and attest from the physical plan that NO shuffle happened:
    both sides' buckets line up, so the SortMergeJoin reads bucket i of
    each table in the same task. This is THE repeated-join optimization
    at 100 TB — the shuffle is paid once at write time and amortized
    over every subsequent join/aggregation on the bucket key, and it's
    the one co-location strategy that works when BOTH sides are too big
    to broadcast.

    The ``merge`` hint forces SortMergeJoin (at test scale the
    dimension fits the broadcast threshold, which would bypass the
    bucketed path being attested; at production scale SMJ is what AQE
    picks anyway). Bucket metadata requires catalog tables —
    ``bucketBy`` + ``saveAsTable`` with an explicit path; a plain
    path-based parquet write has no bucket spec."""
    import contextlib
    import io as _io

    out = os.path.join(tempfile.gettempdir(), "tde_bucketed")
    for tbl, name, key in (
        ("tde_orders_b", "orders", "o_custkey"),
        ("tde_customer_b", "customer", "c_custkey"),
    ):
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        (
            t(spark, sf_dir, name)
            .write.mode("overwrite")
            .format("parquet")
            .option("path", os.path.join(out, name))
            .bucketBy(_BUCKETS, key)
            .sortBy(key)
            .saveAsTable(tbl)
        )
    ob, cb = spark.table("tde_orders_b"), spark.table("tde_customer_b")
    joined = ob.hint("merge").join(cb, ob.o_custkey == cb.c_custkey)
    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        joined.explain("formatted")
    plan = buf.getvalue()
    noshuffle = "SortMergeJoin" in plan and "Exchange" not in plan
    return (
        joined.groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_orders"))
        .select(F.lit(bool(noshuffle)).alias("noshuffle_ok"), "c_mktsegment", "n_orders")
    )


_SALTS = 16


@query(
    "join_skew_salted",
    oracle="""
        SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_events,
               CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        FROM events JOIN customer ON user_id = c_custkey
        GROUP BY c_mktsegment
    """,
    tags=("join", "skew"),
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-depth: skew-salted equi-join — the manual remedy when one join
    key holds a disproportionate share of the fact rows and a plain
    shuffle join serializes that key's partition onto one task (AQE's
    skew-join split handles moderate skew; extreme single-key skew
    still wants salting). The fact side gets a deterministic salt
    (event_id mod 16 — reproducible, unlike rand()); the dimension side
    is EXPLODED 16× so every (key, salt) pair exists; the join key
    becomes (key, salt), spreading each hot key over 16 tasks. The
    result is provably identical to the unsalted join — the oracle IS
    the plain join — because each fact row matches exactly one
    replicated dim row.

    Scale shape: dim replication costs salts × |dim| rows, which for a
    broadcast-sized dim is free and for a larger dim trades 16× dim
    shuffle volume for 16× hot-key parallelism — the right trade
    exactly when skew, not volume, is the bottleneck. Decimal
    accumulation for the money sum, as everywhere."""
    ev = t(spark, sf_dir, "events", spread=True).withColumn(
        "salt", F.pmod("event_id", F.lit(_SALTS))
    )
    cust = (
        t(spark, sf_dir, "customer")
        .select("c_custkey", "c_mktsegment")
        .withColumn("salt", F.explode(F.sequence(F.lit(0), F.lit(_SALTS - 1))))
    )
    return (
        ev.join(cust, (ev.user_id == cust.c_custkey) & (ev.salt == cust.salt))
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
    )


@query(
    "cdc_latest_wins",
    oracle="""
        WITH v1 AS (
            SELECT o_orderkey AS key, o_orderstatus AS status, 1 AS version
            FROM orders
        ),
        v2 AS (
            SELECT o_orderkey AS key, 'U' AS status, 2 AS version
            FROM orders WHERE o_orderkey % 7 = 0
        ),
        merged AS (SELECT * FROM v1 UNION ALL SELECT * FROM v2),
        latest AS (
            SELECT key, status, version,
                   row_number() OVER (PARTITION BY key
                                      ORDER BY version DESC) AS rn
            FROM merged
        )
        SELECT status, CAST(count(*) AS BIGINT) AS n_keys,
               CAST(sum(version) AS BIGINT) AS version_sum
        FROM latest WHERE rn = 1 GROUP BY status
    """,
    tags=("cdc", "window"),
)
def cdc_latest_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7's read semantics, driver-attested: the append-then-latest-wins
    upsert emulation that replaces the reference's in-place Delta
    UPDATE/MERGE (databricks/talkdesk_databricks_etl.py:245-253; live
    MERGE is environment-blocked — no delta jars). Two deterministic
    row versions are derived from orders (v2 'updates' every 7th key),
    unioned, and resolved with the IDENTICAL window pattern
    ``pipeline.monitoring.MonitoringStore.jobs()`` runs on its
    append-only store: row_number per key ordered by version desc, keep
    rank 1. ``version_sum`` proves updated keys actually won (each
    key%7==0 contributes 2, others 1) — a tie-break or ordering bug
    shifts it even when counts survive.

    Scale shape: one window shuffle on the upsert key. At 100 TB the
    append log is partitioned by ingest date, so the window reads only
    partitions newer than the last compaction; a periodic compaction
    job materializes rank-1 rows and truncates the log — the classic
    merge-on-read table format, hand-rolled."""
    from pyspark.sql import Window

    base = t(spark, sf_dir, "orders", spread=True)
    v1 = base.select(
        F.col("o_orderkey").alias("key"),
        F.col("o_orderstatus").alias("status"),
        F.lit(1).alias("version"),
    )
    v2 = (
        base.filter(F.col("o_orderkey") % 7 == 0)
        .select(
            F.col("o_orderkey").alias("key"),
            F.lit("U").alias("status"),
            F.lit(2).alias("version"),
        )
    )
    w = Window.partitionBy("key").orderBy(F.col("version").desc())
    latest = (
        v1.unionAll(v2)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
    )
    return latest.groupBy("status").agg(
        F.count("*").alias("n_keys"),
        F.sum("version").cast("long").alias("version_sum"),
    )


@query(
    "join_lateral_topn",
    # DuckDB runs the genuine correlated LATERAL; both sides order by
    # (acctbal DESC, custkey) so ties cannot flip membership or order.
    oracle="""
        SELECT n.n_name AS nation, c.c_custkey AS custkey,
               c.c_acctbal AS acctbal
        FROM nation n, LATERAL (
            SELECT c_custkey, c_acctbal
            FROM customer c
            WHERE c.c_nationkey = n.n_nationkey
            ORDER BY c_acctbal DESC, c_custkey
            LIMIT 2
        ) c
    """,
    tags=("join", "lateral"),
)
def join_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-depth: correlated LATERAL join — for every nation, the top-2
    customers by account balance, expressed as a per-row correlated
    subquery via Spark 4's ``DataFrame.lateralJoin`` (the DataFrame
    face of SQL ``LATERAL``). The window formulation (W4
    window_topk_per_group) covers the uniform-top-N case; LATERAL is
    the general tool when the inner query differs per outer row
    (per-row limits, per-row predicates, table functions).

    Plan note: Catalyst decorrelates this into a join + per-key limit
    (WindowGroupLimit-style) rather than executing one subquery per
    outer row — the declarative form keeps the 100 TB path open: a
    naive per-row re-scan of customer would be O(|nation| · |customer|);
    the decorrelated plan is one shuffle of each side."""
    n = t(spark, sf_dir, "nation")
    c = t(spark, sf_dir, "customer")
    inner = (
        c.where(F.col("c_nationkey") == F.col("n_nationkey").outer())
        .orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
        .limit(2)
        .select("c_custkey", "c_acctbal")
    )
    return n.lateralJoin(inner).select(
        F.col("n_name").alias("nation"),
        F.col("c_custkey").alias("custkey"),
        F.col("c_acctbal").alias("acctbal"),
    )


_RECURSIVE_ORACLE = """
    WITH RECURSIVE anc(doc_id, anc_id, depth) AS (
        SELECT doc_id, doc_id, 0 FROM documents
        UNION ALL
        SELECT doc_id, anc_id // 10, depth + 1 FROM anc WHERE anc_id >= 10
    )
    SELECT doc_id,
           CAST(max(depth) AS INTEGER) AS depth,
           CAST(min(anc_id) FILTER (WHERE anc_id < 10) AS BIGINT) AS root_id,
           CAST(sum(anc_id) AS BIGINT) AS path_sum
    FROM anc GROUP BY doc_id
"""


@query("scan_recursive_cte", oracle=_RECURSIVE_ORACLE, tags=("scan", "recursive"))
def scan_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S-depth: Spark 4 recursive CTE (``WITH RECURSIVE``) — the
    declarative form of the hierarchy walk / recursive rollup
    (org chart, category tree, bill of materials) that previously
    required a driver-side DataFrame loop (dedup.py's
    propagate_min_labels). The hierarchy here is derived from the data
    itself (parent = doc_id div 10, a forest rooted at the one-digit
    ids), so both engines recurse over identical, acyclic chains and
    every per-doc rollup (depth, root, path checksum) hash-matches.

    Scale + semantics notes: Spark supports UNION ALL recursion only
    (verified: UNION-dedup recursion raises
    UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE), so the recursion must be
    ACYCLIC with per-row termination — exactly the hierarchy-walk
    shape; cyclic graph closure (components) stays on the iterative
    checkpointed loop, which dedups its frontier each round. Each
    recursion level is one join pass over the previous level; total
    rows = Σ chain lengths (≤ digits(doc_id) per doc). The level and
    row caps (``spark.sql.cteRecursionLevelLimit`` 100,
    ``spark.sql.cteRecursionRowLimit`` 1M — raise the latter for real
    hierarchies) bound runaway recursion at 100 TB."""
    t(spark, sf_dir, "documents").createOrReplaceTempView("rec_documents")
    return spark.sql(
        """
        WITH RECURSIVE anc(doc_id, anc_id, depth) AS (
            SELECT doc_id, doc_id, 0 FROM rec_documents
            UNION ALL
            SELECT doc_id, anc_id DIV 10, depth + 1 FROM anc WHERE anc_id >= 10
        )
        SELECT doc_id,
               CAST(max(depth) AS INT) AS depth,
               CAST(min(CASE WHEN anc_id < 10 THEN anc_id END) AS BIGINT)
                   AS root_id,
               CAST(sum(anc_id) AS BIGINT) AS path_sum
        FROM anc GROUP BY doc_id
        """
    )


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


# --- Round 7: bloom-filter semi-join reduction (runtime-filter shape).
_BLOOM_BITS = 1024  # 16 longs
_BLOOM_WORDS = _BLOOM_BITS // 64
_BLOOM_K = 3
_BLOOM_NATIONS = (0, 1, 2, 3, 4)


def _bloom_pos_sql(key_sql: str, k: int) -> str:
    """SQL for bit position k of a key — xxhash64 with the probe index
    as a second hashed column, identical on build and probe sides."""
    return f"pmod(xxhash64({key_sql}, {k}), {_BLOOM_BITS})"


@query(
    "join_bloom_prefilter_ok",
    # n_exact is a REAL oracle value (the semi-join count DuckDB
    # recomputes); the flags pin the bloom guarantees: membership has
    # NO false negatives (structural), and the filter actually prunes.
    oracle=f"""
        SELECT CAST(count(*) AS BIGINT) AS n_exact,
               CAST(1 AS BOOLEAN) AS no_false_negatives,
               CAST(1 AS BOOLEAN) AS prune_effective
        FROM lineitem
        WHERE l_suppkey IN (SELECT s_suppkey FROM supplier
                            WHERE s_nationkey IN {_BLOOM_NATIONS})
    """,
    tags=("join", "runtime-filter", "invariant"),
)
def join_bloom_prefilter_ok(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime-filter / bloom semi-join reduction: build a 1024-bit
    3-hash bloom filter over the build side's join keys (suppliers in
    a 5-nation set), ship it to the probe side as a LITERAL word array
    (the broadcast-variable shape), and pre-filter the lineitem scan
    with a pure codegen expression — the technique that turns a
    shuffle-everything semi join into a scan-local row drop at 100 TB
    (what Spark's own runtime row-level filtering and Dynamic
    Partition Pruning do under the hood).

    The build side aggregates to ≤16 longs via explode(K positions) →
    bit_or of single-bit masks — then a driver fetch bounded by the
    filter's BIT WIDTH (16 rows), never by data. The probe predicate
    is zero-join, zero-shuffle: element_at on the literal word array +
    bitwiseAND, inside the scan's codegen stage. Attested in ONE
    distributed pass (a left join against the key set supplies the
    exact-membership flag — no driver-side key list, the key set
    scales with SF): the bloom loses NO true member and actually
    prunes; the exact member count is the hash-checked real value."""
    keys = (
        t(spark, sf_dir, "supplier")
        .filter(F.col("s_nationkey").isin(list(_BLOOM_NATIONS)))
        .select(F.col("s_suppkey").alias("key"))
    )
    words_df = (
        keys.select(
            F.explode(
                F.array(*[F.expr(_bloom_pos_sql("key", k)) for k in range(_BLOOM_K)])
            ).alias("p")
        )
        .selectExpr(
            "CAST(p / 64 AS INT) AS w",
            "shiftleft(1L, CAST(p % 64 AS INT)) AS m",
        )
        .groupBy("w")
        .agg(F.bit_or("m").alias("bits"))
    )
    # Bounded driver fetch: ≤ _BLOOM_WORDS rows by construction.
    words = [0] * _BLOOM_WORDS
    for r in words_df.collect():
        words[r["w"]] = r["bits"]
    arr_sql = "array(" + ", ".join(f"{w}L" for w in words) + ")"
    bit_checks = []
    for k in range(_BLOOM_K):
        p = _bloom_pos_sql("l_suppkey", k)
        bit_checks.append(
            f"(element_at({arr_sql}, CAST(({p}) / 64 AS INT) + 1)"
            f" & shiftleft(1L, CAST(({p}) % 64 AS INT))) != 0"
        )
    hit = F.expr(" AND ".join(bit_checks))

    li = t(spark, sf_dir, "lineitem").select("l_suppkey")
    flagged = li.join(
        keys.withColumn("is_member", F.lit(True)),
        li.l_suppkey == F.col("key"),
        "left",
    ).select(hit.alias("hit"), F.coalesce("is_member", F.lit(False)).alias("exact"))
    agg = flagged.agg(
        F.sum(F.col("exact").cast("long")).alias("n_exact"),
        F.sum((F.col("exact") & ~F.col("hit")).cast("long")).alias("n_missed"),
        F.sum(F.col("hit").cast("long")).alias("n_candidates"),
        F.count("*").alias("n_total"),
    )
    return agg.select(
        F.col("n_exact").cast("long").alias("n_exact"),
        (F.col("n_missed") == 0).alias("no_false_negatives"),
        (F.col("n_candidates") < F.col("n_total")).alias("prune_effective"),
    )


@query(
    "scan_table_checksum",
    # Same canonicalization on both engines: integer/string columns
    # verbatim, the timestamp via strftime, the money column as exact
    # cents — md5 of the '|'-joined string, 60-bit hex prefix as a
    # BIGINT, folded per group with the order-insensitive bit_xor.
    oracle="""
        SELECT o_orderstatus,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(bit_xor(CAST(('0x' || substr(md5(concat_ws('|',
                   CAST(o_orderkey AS VARCHAR),
                   CAST(o_custkey AS VARCHAR),
                   o_orderstatus,
                   o_orderpriority,
                   strftime(o_orderdate, '%Y-%m-%d %H:%M:%S'),
                   CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS VARCHAR)
               )), 1, 15)) AS BIGINT)) AS BIGINT) AS xor_checksum
        FROM orders GROUP BY o_orderstatus
    """,
    tags=("scan", "checksum"),
)
def scan_table_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Migration fingerprint: an engine-independent per-group content
    checksum — md5 over a canonical row serialization, 60-bit prefix
    as a BIGINT, folded with bit_xor. This is the operator a user
    switching engines (the repo's whole premise) runs on BOTH systems
    to prove a table survived the move: bit_xor is commutative and
    associative, so the fold is partition-order- and shuffle-
    order-insensitive, parallelizes map-side like any aggregate, and
    any single changed/dropped/duplicated row flips the result.
    Canonicalization rules (pinned identically in the oracle):
    integers and strings verbatim, timestamps formatted to seconds,
    money as exact cents — never raw double-to-string, which engines
    format differently. Scale: one scan + one |groups|-row exchange;
    the md5 runs codegen-side (JVM commons-codec), ~100 MB/s/core —
    checksum a 100 TB table in one pass alongside ingestion."""
    o = t(spark, sf_dir, "orders")
    canon = F.concat_ws(
        "|",
        F.col("o_orderkey").cast("string"),
        F.col("o_custkey").cast("string"),
        F.col("o_orderstatus"),
        F.col("o_orderpriority"),
        F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss"),
        F.round(F.col("o_totalprice") * 100).cast("long").cast("string"),
    )
    h = F.conv(F.substring(F.md5(canon), 1, 15), 16, 10).cast("long")
    return o.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_rows"),
        F.bit_xor(h).alias("xor_checksum"),
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


_NULLSAFE_MOD = 7

_NULLSAFE_ORACLE = f"""
    WITH n AS (
        SELECT CASE WHEN o_custkey % {_NULLSAFE_MOD} = 0 THEN NULL
                    ELSE o_custkey END AS k,
               o_orderstatus
        FROM orders
    ),
    a AS (SELECT k, count(*) AS n_f FROM n WHERE o_orderstatus = 'F' GROUP BY k),
    b AS (SELECT k, count(*) AS n_o FROM n WHERE o_orderstatus = 'O' GROUP BY k)
    SELECT CAST(a.k AS BIGINT) AS k,
           CAST(a.n_f AS BIGINT) AS n_f,
           CAST(b.n_o AS BIGINT) AS n_o
    FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
"""


@query("join_null_safe", oracle=_NULLSAFE_ORACLE, tags=("join",))
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-family depth: NULL-safe equality join (``eqNullSafe`` /
    ``<=>`` — SQL's IS NOT DISTINCT FROM). A plain equi-join silently
    drops every NULL-keyed row (NULL = NULL is NULL), which is exactly
    wrong when NULL is a real category ("no customer id"); the
    null-safe comparator treats NULL as a joinable value. Here a
    deterministic NULL-injection (custkey ≡ 0 mod 7 → NULL) builds two
    per-key aggregates and joins them null-safely, so the NULL group's
    row survives — the oracle joins with IS NOT DISTINCT FROM and
    would lose that row (hash mismatch) if the comparator degraded to
    plain equality. Catalyst plans <=> as a hash join key (it's still
    an equality predicate on a normalized key), not a nested loop —
    same shuffle shape as any equi-join at 100 TB."""
    o = t(spark, sf_dir, "orders").select(
        F.when(F.col("o_custkey") % _NULLSAFE_MOD == 0, F.lit(None))
        .otherwise(F.col("o_custkey"))
        .alias("k"),
        "o_orderstatus",
    )
    a = o.filter(F.col("o_orderstatus") == "F").groupBy("k").agg(F.count("*").alias("n_f"))
    b = (
        o.filter(F.col("o_orderstatus") == "O")
        .groupBy(F.col("k").alias("kb"))
        .agg(F.count("*").alias("n_o"))
    )
    return (
        a.join(b, a.k.eqNullSafe(F.col("kb")))
        .select("k", "n_f", "n_o")
    )


_SQL_TEXT = """
    SELECT c.c_mktsegment,
           CAST(count(DISTINCT c.c_custkey) AS BIGINT) AS n_customers,
           CAST(count(o.o_orderkey) AS BIGINT) AS n_orders,
           CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS total_value
    FROM {cust} c LEFT JOIN {ord} o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
"""


@query(
    "sql_text_api",
    oracle=_SQL_TEXT.format(cust="customer", ord="orders"),
    tags=("scan", "sql"),
)
def sql_text_api(spark: SparkSession, sf_dir: str) -> DataFrame:
    """API-surface attestation: the engine's queries are equally
    expressible as SQL TEXT over registered temp views — the entry
    point a SQL-first user of the reference would reach for. The exact
    statement the DuckDB oracle runs (modulo view names) goes through
    ``spark.sql``; Catalyst parses/optimizes it into the same plan the
    DataFrame API builds (left join + two-level hash aggregate with a
    distinct-count Expand), so this row attests the SQL parser/
    analyzer path end-to-end, not new operator semantics. Temp view
    names are prefixed to avoid colliding with other queries sharing
    the session."""
    t(spark, sf_dir, "customer").createOrReplaceTempView("sql_api_customer")
    t(spark, sf_dir, "orders").createOrReplaceTempView("sql_api_orders")
    return spark.sql(_SQL_TEXT.format(cust="sql_api_customer", ord="sql_api_orders"))


_PIPE_ORACLE = """
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM orders
    WHERE o_orderstatus = 'F'
    GROUP BY o_orderpriority
    HAVING count(*) > 10
"""

_PIPE_SQL = """
    FROM {ord}
    |> WHERE o_orderstatus = 'F'
    |> AGGREGATE CAST(count(*) AS BIGINT) AS n_orders,
                 CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                     AS total_value
       GROUP BY o_orderpriority
    |> WHERE n_orders > 10
    |> SELECT o_orderpriority, n_orders, total_value
"""


@query("sql_pipe_syntax", oracle=_PIPE_ORACLE, tags=("scan", "sql"))
def sql_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """API-surface attestation #2: Spark 4's SQL PIPE syntax
    (`FROM t |> WHERE … |> AGGREGATE … |> WHERE …`) — the linear
    query form where each `|>` stage consumes the previous result, so
    post-aggregation filters reference OUTPUT aliases (`n_orders`)
    instead of repeating HAVING expressions. Catalyst lowers the pipe
    chain to the identical filter→aggregate→filter logical plan as the
    classic formulation, which is exactly what the oracle runs as
    plain ANSI SQL (DuckDB has no pipe syntax — the semantic
    equivalence IS the attestation). Same plan economics as any
    scan-agg: pushed status filter, two-level hash aggregate."""
    t(spark, sf_dir, "orders").createOrReplaceTempView("pipe_api_orders")
    return spark.sql(_PIPE_SQL.format(ord="pipe_api_orders"))


@query(
    "join_dpp_prune_ok",
    # Invariant + value check (same contract as the bucketed/static
    # prune attestations): dpp_ok pins the runtime-pruning plan
    # property; the day/event counts are real oracle values from the
    # SOURCE events table, so a partitioned write that drops rows or
    # mis-dates partitions breaks the hash.
    oracle="""
        SELECT CAST(1 AS BOOLEAN) AS dpp_ok,
               CAST(count(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_days,
               CAST(count(*) AS BIGINT) AS n_events
        FROM events
        WHERE day(CAST(ts AS DATE)) = 1
    """,
    tags=("join", "prune", "invariant"),
)
def join_dpp_prune_ok(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S12 depth: DYNAMIC partition pruning — the runtime complement
    to the static prune attestation. The static case pushes a literal
    partition predicate; here the selective predicate lives on a
    JOINED dimension (a derived day-dim filtered to first-of-month
    days), so the prunable partition set is only known at run time.
    Spark plans a dynamicpruning subquery into the fact scan's
    PartitionFilters (reusing the dim's broadcast), and the fact side
    reads ONLY the surviving day directories — at 100 TB this is the
    difference between scanning 1/30th of a date-partitioned fact
    table and scanning all of it, for a query whose date filter never
    mentions the fact table. Attested from the physical plan
    ("dynamicpruning" inside the scan's PartitionFilters) and
    value-checked: day and event counts for the selected days must
    match the source table exactly."""
    import contextlib
    import io as _io

    ev = t(spark, sf_dir, "events").withColumn(
        "event_date", F.col("ts").cast("date")
    )
    out = os.path.join(tempfile.gettempdir(), "tde_dpp_partitioned")
    ev.write.mode("overwrite").partitionBy("event_date").parquet(out)

    facts = spark.read.parquet(out)
    day_dim = (
        t(spark, sf_dir, "events")
        .select(F.col("ts").cast("date").alias("d"))
        .distinct()
        .filter(F.dayofmonth("d") == 1)
    )
    joined = facts.join(day_dim, facts.event_date == day_dim.d)
    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        joined.explain("formatted")
    plan = buf.getvalue()
    dpp_ok = "dynamicpruning" in plan
    agg = joined.agg(
        F.countDistinct("event_date").alias("n_days"),
        F.count(F.lit(1)).alias("n_events"),
    ).collect()[0]
    return spark.createDataFrame(
        [(bool(dpp_ok), agg["n_days"], agg["n_events"])],
        "dpp_ok boolean, n_days bigint, n_events bigint",
    )


_BANDS = (
    ("micro", 0, 50_000),
    ("small", 50_000, 150_000),
    ("mid", 150_000, 300_000),
    ("large", 300_000, 450_000),
    ("jumbo", 450_000, 1_000_000_000),
)

_BAND_VALUES = ", ".join(f"('{n}', {lo}, {hi})" for n, lo, hi in _BANDS)

_BAND_ORACLE = f"""
    SELECT band,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS band_value
    FROM orders
    JOIN (VALUES {_BAND_VALUES}) AS bands(band, lo, hi)
      ON o_totalprice >= lo AND o_totalprice < hi
    GROUP BY band
"""


@query("join_band_nonequi", oracle=_BAND_ORACLE, tags=("join", "nonequi"))
def join_band_nonequi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J11: pure non-equi (band) join — classify every order into a
    price band by joining against a half-open interval dimension with
    NO equality key at all. This is the one join shape where a
    nested-loop is the RIGHT plan: the band dim is tiny and broadcast,
    so the fact stream never shuffles and each row probes five
    in-memory intervals inside the scan stage (BroadcastNestedLoopJoin
    — cheap here, catastrophic if the build side scaled; the bounded
    literal dim is the contract). The range join (join_range) carries
    an equality key that bounds the explosion; this op covers the
    keyless case a banding/bucketing migration actually hits. Bands
    are half-open and exhaustive over the fixture's price domain, so
    the join is lossless (count cross-checks total orders via the
    oracle). Money sums accumulate in DECIMAL."""
    bands = spark.createDataFrame(
        list(_BANDS), "band string, lo long, hi long"
    )
    orders = t(spark, sf_dir, "orders").select("o_totalprice")
    return (
        orders.join(
            F.broadcast(bands),
            (F.col("o_totalprice") >= F.col("lo")) & (F.col("o_totalprice") < F.col("hi")),
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("band_value"),
        )
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


_NAMED_PARAMS_SQL = """
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM IDENTIFIER(:tbl)
    WHERE o_totalprice > :price_floor AND o_orderstatus = :status
    GROUP BY o_orderpriority
"""

_NP_FLOOR = 50_000
_NP_STATUS = "F"

_NAMED_PARAMS_ORACLE = f"""
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM orders
    WHERE o_totalprice > {_NP_FLOOR} AND o_orderstatus = '{_NP_STATUS}'
    GROUP BY o_orderpriority
"""


@query("sql_named_params", oracle=_NAMED_PARAMS_ORACLE, tags=("scan", "sql"))
def sql_named_params(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S20: parameterized SQL — named parameter markers (`:param`)
    bound through `spark.sql(..., args=...)` plus the `IDENTIFIER()`
    clause for a safely-parameterized table reference. This is the
    injection-safe surface an application embedding the engine should
    use instead of f-string SQL: values bind as typed literals
    (Catalyst constant-folds them like any literal — pushdown intact),
    and IDENTIFIER() restricts the table slot to a valid identifier.
    The oracle is the identical query with the parameters inlined, so
    the binding itself is the attested behavior."""
    t(spark, sf_dir, "orders").createOrReplaceTempView("np_orders")
    return spark.sql(
        _NAMED_PARAMS_SQL,
        args={"tbl": "np_orders", "price_floor": _NP_FLOOR, "status": _NP_STATUS},
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
