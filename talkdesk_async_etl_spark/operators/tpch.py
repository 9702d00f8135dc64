"""Classic TPC-H query shapes over the driver testdata star schema.

The reference's own relational surface is config-scan-and-join thin
(SURVEY.md §0); these three canonical warehouse queries demonstrate the
engine on the heavier plans the same tables support — multi-aggregate
scan (Q1), join + top-k (Q3), selective filter-aggregate (Q6) — each
with a deterministic DuckDB oracle. Date parameters are pinned
literals: the driver diff and bench must be reproducible, and constant
predicates also let Catalyst push them into the parquet scan.

Scale notes per query are in the docstrings; all three are
pure built-in DataFrame expressions (no UDFs, no collects).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from talkdesk_async_etl_spark.plans.registry import query
from talkdesk_async_etl_spark.sources.io import read_table as t

_Q1_CUTOFF = "1998-09-02"

_Q1_ORACLE = f"""
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
               AS sum_disc_price,
           CAST(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))
               ) AS DOUBLE) AS sum_charge,
           round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6)
               AS avg_qty,
           round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6)
               AS avg_price,
           round(CAST(sum(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / count(*), 6)
               AS avg_disc,
           CAST(count(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= DATE '{_Q1_CUTOFF}'
    GROUP BY l_returnflag, l_linestatus
"""


@query("tpch_q1", oracle=_Q1_ORACLE, tags=("tpch", "agg"))
def tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 pricing summary: the canonical wide-aggregate scan —
    eight aggregates in ONE pass over the fact table (two-level
    HashAggregate: map-side partials, then a tiny 6-group shuffle).
    Money sums accumulate in DECIMAL so partial-agg order can't flip
    cents; the averages are likewise DECIMAL-accumulated sums divided
    by the exact count — a plain avg(double) is summation-order
    dependent, so a value near a 6-decimal rounding boundary could
    flip under a different partitioning. Here both engines round the
    same bit-exact double."""
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= F.lit(_Q1_CUTOFF).cast("date"))
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("sum_qty"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double").alias("sum_base_price"),
            F.sum(disc_price.cast("decimal(18,4)")).cast("double").alias("sum_disc_price"),
            F.sum((disc_price * (1 + F.col("l_tax"))).cast("decimal(18,6)"))
            .cast("double")
            .alias("sum_charge"),
            F.round(
                F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("avg_qty"),
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("avg_price"),
            F.round(
                F.sum(F.col("l_discount").cast("decimal(18,4)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


_Q3_SEGMENT = "BUILDING"
_Q3_DATE = "1995-03-15"

_Q3_ORACLE = f"""
    SELECT l_orderkey,
           CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
               AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = '{_Q3_SEGMENT}'
      AND o_orderdate < DATE '{_Q3_DATE}'
      AND l_shipdate  > DATE '{_Q3_DATE}'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate ASC, l_orderkey ASC
    LIMIT 10
"""


@query("tpch_q3", oracle=_Q3_ORACLE, tags=("tpch", "join", "topk"))
def tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shipping priority: selective three-way join + grouped
    revenue + global top-10. Filters are applied BEFORE the joins so
    they push into each parquet scan; the final ordering carries an
    l_orderkey tie-break for determinism and plans as
    TakeOrderedAndProject (no global sort). AQE picks the join
    strategies — the filtered customer side broadcasts while small and
    falls back to shuffle join at scale."""
    cust = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == _Q3_SEGMENT).select("c_custkey")
    orders = t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit(_Q3_DATE).cast("date")
    ).select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    li = t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit(_Q3_DATE).cast("date")
    ).select("l_orderkey", "l_extendedprice", "l_discount")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, F.col("o_orderkey") == li.l_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)"))
            .cast("double")
            .alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("o_orderdate").asc(), F.col("l_orderkey").asc())
        .limit(10)
    )


_Q6_ORACLE = """
    SELECT CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= DATE '1994-01-01' AND l_shipdate < DATE '1995-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
"""


@query("tpch_q6", oracle=_Q6_ORACLE, tags=("tpch", "agg"))
def tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 forecast revenue: the pure filter-aggregate —
    every predicate reaches the scan (PushedFilters on date, discount,
    quantity), then one global decimal sum. The canonical test that
    predicate pushdown and column pruning survive: the scan should
    read exactly four columns and skip row groups by min/max stats."""
    li = t(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1994-01-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1995-01-01").cast("date"))
        & (F.col("l_discount").between(0.05, 0.07))
        & (F.col("l_quantity") < 24)
    ).agg(
        F.sum((F.col("l_extendedprice") * F.col("l_discount")).cast("decimal(18,4)"))
        .cast("double")
        .alias("revenue")
    )


_Q5_REGION = "ASIA"

_Q5_ORACLE = f"""
    SELECT n_name,
           CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
               AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = '{_Q5_REGION}'
      AND o_orderdate >= DATE '1994-01-01' AND o_orderdate < DATE '1995-01-01'
    GROUP BY n_name
"""


@query("tpch_q5", oracle=_Q5_ORACLE, tags=("tpch", "join", "agg"))
def tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 local-supplier volume: a six-way join whose
    supplier hop carries the extra c_nationkey = s_nationkey equality —
    a join shape join_star doesn't have (the customer and supplier
    legs must agree on nation, not just chain through keys). Scale
    strategy mirrors join_star: hard broadcast hints only on the
    fixed-cardinality nation/region dimensions; the SF-scaling
    customer/orders/lineitem/supplier joins are left to AQE."""
    region = t(spark, sf_dir, "region").filter(F.col("r_name") == _Q5_REGION).select("r_regionkey")
    nation = t(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    cust = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1994-01-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1995-01-01").cast("date"))
    ).select("o_orderkey", "o_custkey")
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    supp = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, F.col("o_orderkey") == li.l_orderkey)
        .join(
            supp,
            (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)"))
            .cast("double")
            .alias("revenue")
        )
    )


_Q10_DATE_LO = "1993-10-01"
_Q10_DATE_HI = "1994-01-01"

_Q10_ORACLE = f"""
    SELECT c_custkey, c_name,
           CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
               AS revenue,
           c_acctbal, n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= DATE '{_Q10_DATE_LO}' AND o_orderdate < DATE '{_Q10_DATE_HI}'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey ASC
    LIMIT 20
"""


@query("tpch_q10", oracle=_Q10_ORACLE, tags=("tpch", "join", "topk"))
def tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 returned-item reporting: who returned the most revenue
    in a quarter — join + grouped sum + deterministic top-20
    (c_custkey tie-break, TakeOrderedAndProject). The returnflag and
    date predicates push into the lineitem/orders scans so the joins
    see only the quarter's returned rows."""
    cust = t(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_acctbal", "c_nationkey")
    orders = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(_Q10_DATE_LO).cast("date"))
        & (F.col("o_orderdate") < F.lit(_Q10_DATE_HI).cast("date"))
    ).select("o_orderkey", "o_custkey")
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    nation = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, F.col("o_orderkey") == li.l_orderkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)"))
            .cast("double")
            .alias("revenue")
        )
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )
