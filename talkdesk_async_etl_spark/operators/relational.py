"""Relational operators: scans, filters, joins, aggregations, sorts, sets.

Covers SURVEY.md §2.1 (S1/S2/S4 + sink/CDC/SQL-entry surfaces),
§2.2 (F1-F7), §2.6 (O1-O3), §2.7 (set ops). §2.3 joins live in
joins.py and §2.4 aggregations in aggregates.py (split in round 9 —
same query ids, same plans). Reference behaviors are
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
from talkdesk_async_etl_spark.sources.io import session_scratch_path

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
    out = session_scratch_path(spark, sf_dir, "tde_csv_roundtrip")
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
    path = session_scratch_path(spark, sf_dir, "tde_scan_json_doc.json")
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


_KEYSET_ORACLE = """
    SELECT o_orderkey, o_orderdate, CAST(o_totalprice AS DOUBLE) AS o_totalprice
    FROM orders
    WHERE (o_orderdate, o_orderkey) >
          (SELECT (o_orderdate, o_orderkey) FROM orders
           ORDER BY o_orderdate, o_orderkey LIMIT 1 OFFSET 249)
    ORDER BY o_orderdate, o_orderkey LIMIT 50
"""


@query("sort_keyset_pagination", oracle=_KEYSET_ORACLE, tags=("sort", "pagination"))
def sort_keyset_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O4: KEYSET pagination — "the 50 rows after cursor (date, key)" as
    a pushed-down predicate + top-50, the scale-correct replacement for
    LIMIT/OFFSET page N (OFFSET must materialize and discard every
    earlier row, so page cost grows linearly and the last pages of a
    100 TB export each re-sort the world; a keyset page is O(page) via
    TakeOrderedAndProject over the rows passing the cursor predicate,
    and with the S13 range-clustered layout the predicate also prunes
    files). The cursor here is derived as the 250th row's key so the
    query is self-contained and the oracle can reproduce it exactly;
    a real pager passes the previous page's last (date, key) in.

    The composite-key row comparison is expanded to the explicit
    (a > c1) OR (a = c1 AND b > c2) form — Spark has no tuple
    comparison; DuckDB's row-value comparison in the oracle is the
    semantic twin. The (date, key) cursor is total-ordered (key is
    unique), so pages can neither skip nor duplicate rows on ties —
    the defect an OFFSET pager has on any non-unique sort key."""
    o = t(spark, sf_dir, "orders")
    cur = (
        o.orderBy("o_orderdate", "o_orderkey")
        .limit(250)
        .orderBy(F.col("o_orderdate").desc(), F.col("o_orderkey").desc())
        .limit(1)
        .select("o_orderdate", "o_orderkey")
        .first()
    )
    after_cursor = (F.col("o_orderdate") > F.lit(cur[0])) | (
        (F.col("o_orderdate") == F.lit(cur[0])) & (F.col("o_orderkey") > F.lit(cur[1]))
    )
    return (
        o.filter(after_cursor)
        .orderBy("o_orderdate", "o_orderkey")
        .limit(50)
        .select("o_orderkey", "o_orderdate", "o_totalprice")
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
    out = session_scratch_path(spark, sf_dir, "tde_sink_partitioned")
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
    # One scan, not a 2-branch union (r16, guide §2.4): each order row
    # generates its own log ops via explode over a conditional array —
    # same merged rows as the former v1 ∪ v2 without the second scan
    # and spread-repartition (the cdc_tombstone_deletes device).
    k = F.col("o_orderkey")
    ops = F.array(
        F.struct(
            F.col("o_orderstatus").alias("status"), F.lit(1).alias("version")
        ),
        F.when(
            k % 7 == 0,
            F.struct(F.lit("U").alias("status"), F.lit(2).alias("version")),
        ),
    )
    merged = base.select(
        k.alias("key"),
        F.explode(F.filter(ops, lambda x: x.isNotNull())).alias("e"),
    ).select("key", "e.status", "e.version")
    w = Window.partitionBy("key").orderBy(F.col("version").desc())
    latest = (
        merged
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
    )
    return latest.groupBy("status").agg(
        F.count("*").alias("n_keys"),
        F.sum("version").cast("long").alias("version_sum"),
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



# --- §2.7 multiset completion (moved from dedup.py in the round-9
# file split; orders-table workload, not a dedup op)


_SETALL_ORACLE = """
    WITH a AS (SELECT o_custkey FROM orders
               WHERE o_orderdate >= DATE '1995-01-01'
                 AND o_orderdate < DATE '1996-01-01'),
         b AS (SELECT o_custkey FROM orders
               WHERE o_orderdate >= DATE '1996-01-01'
                 AND o_orderdate < DATE '1997-01-01'),
         ia AS (SELECT o_custkey FROM a INTERSECT ALL SELECT o_custkey FROM b),
         ea AS (SELECT o_custkey FROM a EXCEPT ALL SELECT o_custkey FROM b)
    SELECT 'intersect_all' AS op, o_custkey,
           CAST(count(*) AS BIGINT) AS n
    FROM ia GROUP BY 2
    UNION ALL
    SELECT 'except_all', o_custkey, CAST(count(*) AS BIGINT)
    FROM ea GROUP BY 2
"""


@query("set_ops_all", oracle=_SETALL_ORACLE, tags=("setop",))
def set_ops_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.7 completion — the MULTISET set operations: ``INTERSECT ALL``
    keeps min(multiplicity) per value and ``EXCEPT ALL`` keeps the
    excess, semantics the distinct variants (set_intersect/set_except)
    erase. Workload: per-customer order-count overlap between two
    years (how much of 1995's ordering behavior repeated in 1996).
    Catalyst compiles both to aggregate-and-replicate plans — no
    row-pairing join; the shuffle key is the value itself. The
    year-bag multiplicities are the hash-checked evidence that
    duplicates survived."""
    o = t(spark, sf_dir, "orders", spread=True)
    d = F.col("o_orderdate")
    a = o.filter(
        (d >= F.lit("1995-01-01").cast("timestamp"))
        & (d < F.lit("1996-01-01").cast("timestamp"))
    ).select("o_custkey")
    b = o.filter(
        (d >= F.lit("1996-01-01").cast("timestamp"))
        & (d < F.lit("1997-01-01").cast("timestamp"))
    ).select("o_custkey")
    ia = (
        a.intersectAll(b)
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("intersect_all").alias("op"), "o_custkey", "n")
    )
    ea = (
        a.exceptAll(b)
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("except_all").alias("op"), "o_custkey", "n")
    )
    return ia.unionByName(ea)


_GBA_SQL = """
    SELECT o_orderstatus, o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS total_value
    FROM {ord}
    WHERE o_totalprice > 1000
    GROUP BY ALL
"""


@query(
    "sql_group_by_all",
    oracle=_GBA_SQL.format(ord="orders"),
    tags=("scan", "sql"),
)
def sql_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """API-surface attestation #4: ``GROUP BY ALL`` — the analyst
    shorthand (DuckDB-originated, adopted by Spark 3.4+) where the
    grouping keys are inferred as every non-aggregate select item. The
    ORACLE RUNS THE IDENTICAL STATEMENT (modulo the view name): both
    engines must infer the same (o_orderstatus, o_orderpriority) key
    set for the hashes to meet, so this row attests the inference rule
    itself, not just the aggregate. Plan economics are unchanged from
    an explicit GROUP BY: pushed price filter + two-level hash
    aggregate."""
    t(spark, sf_dir, "orders").createOrReplaceTempView("gba_orders")
    return spark.sql(_GBA_SQL.format(ord="gba_orders"))


_TOMBSTONE_ORACLE = """
    WITH log AS (
        SELECT o_orderkey AS key, 'I' AS op, o_orderstatus AS status,
               1 AS version
        FROM orders
        UNION ALL
        SELECT o_orderkey, 'U', 'U2', 2 FROM orders WHERE o_orderkey % 5 = 0
        UNION ALL
        SELECT o_orderkey, 'D', NULL, 3 FROM orders WHERE o_orderkey % 3 = 0
        UNION ALL
        SELECT o_orderkey, 'I', 'R4', 4 FROM orders WHERE o_orderkey % 15 = 0
    ),
    latest AS (
        SELECT key, op, status, version,
               row_number() OVER (PARTITION BY key
                                  ORDER BY version DESC) AS rn
        FROM log
    )
    SELECT CASE WHEN op = 'D' THEN '__DELETED__' ELSE status END AS state,
           CAST(count(*) AS BIGINT) AS n_keys,
           CAST(sum(version) AS BIGINT) AS version_sum
    FROM latest WHERE rn = 1 GROUP BY 1
"""


@query("cdc_tombstone_deletes", oracle=_TOMBSTONE_ORACLE, tags=("cdc", "window"))
def cdc_tombstone_deletes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7 completion: CDC DELETE semantics over the append-only upsert
    log — the half of merge-on-read that ``cdc_latest_wins`` leaves
    out. The change log carries op ∈ {I, U, D}; a key's live state is
    its LATEST op, so a delete tombstone hides the key from the live
    view, and a later re-insert REVIVES it (delete at v3, insert at
    v4 → alive with v4's attributes — the sequence that breaks naive
    "filter out any key that ever saw a D" implementations). The
    deterministic log derives four versions from orders (every 5th
    key updated, every 3rd deleted, every 15th revived — the 15s
    exercise delete-then-revive, the 3s-not-15s stay dead); the
    report groups live keys by final status plus one ``__DELETED__``
    row, and ``version_sum`` pins which version actually won per
    class (1/2/3/4 mixes shift it if any precedence is wrong).

    Scale shape: identical to cdc_latest_wins — one window shuffle on
    the upsert key; at scale the log is date-partitioned and a
    compaction job materializes rank-1 rows (now DROPPING tombstoned
    keys — the delete is physically applied only at compaction, the
    standard merge-on-read contract)."""
    from pyspark.sql import Window

    base = t(spark, sf_dir, "orders", spread=True)

    # One scan, not a 4-branch union (r16, guide §2.4): each order row
    # GENERATES its own 1-4 log ops via explode over a conditional
    # array — the same log rows as the former
    # union(I, U%5, D%3, I%15) build without re-scanning (and
    # spread-repartitioning) orders once per branch. Measured 1.65 ->
    # 0.93 s min-of-5 at sf0.1 with set-identical output.
    k = F.col("o_orderkey")
    ops = F.array(
        F.struct(
            F.lit("I").alias("op"),
            F.col("o_orderstatus").alias("status"),
            F.lit(1).alias("version"),
        ),
        F.when(
            k % 5 == 0,
            F.struct(
                F.lit("U").alias("op"),
                F.lit("U2").alias("status"),
                F.lit(2).alias("version"),
            ),
        ),
        F.when(
            k % 3 == 0,
            F.struct(
                F.lit("D").alias("op"),
                F.lit(None).cast("string").alias("status"),
                F.lit(3).alias("version"),
            ),
        ),
        F.when(
            k % 15 == 0,
            F.struct(
                F.lit("I").alias("op"),
                F.lit("R4").alias("status"),
                F.lit(4).alias("version"),
            ),
        ),
    )
    log = base.select(
        k.alias("key"),
        F.explode(F.filter(ops, lambda x: x.isNotNull())).alias("e"),
    ).select("key", "e.op", "e.status", "e.version")
    w = Window.partitionBy("key").orderBy(F.col("version").desc())
    latest = log.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    state = F.when(F.col("op") == "D", F.lit("__DELETED__")).otherwise(
        F.col("status")
    )
    return latest.groupBy(state.alias("state")).agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("version").cast("long").alias("version_sum"),
    )


# --- Keyed table diff (VERDICT r10 task 5) ----------------------------
# scan_table_checksum proves two tables MATCH; this reports WHERE they
# differ when they don't. The "migrated" right side is derived from
# orders by a deterministic mutation both engines replay: keys % 97
# dropped (-> removed), % 89 get +1.00 on the price and % 83 a mutated
# status (-> changed, with per-column attribution), % 101 re-inserted
# under an offset key (-> added). Priority is compared but never
# mutated, so its change counter must read 0 — the attribution proof.

_DIFF_KEY_OFS = 1_000_000_000_000


def _table_diff_oracle() -> str:
    return f"""
    WITH base AS (
        SELECT o_orderkey AS k, o_orderstatus AS st,
               CAST(round(o_totalprice * 100) AS BIGINT) AS pc,
               o_orderpriority AS pr
        FROM orders
    ),
    rgt AS (
        SELECT k,
               CASE WHEN k % 83 = 0 THEN 'X' ELSE st END AS st,
               CASE WHEN k % 89 = 0 THEN pc + 100 ELSE pc END AS pc,
               pr
        FROM base WHERE k % 97 <> 0
        UNION ALL
        SELECT k + {_DIFF_KEY_OFS}, st, pc, pr FROM base WHERE k % 101 = 0
    ),
    d AS (
        SELECT coalesce(l.k, r.k) AS k,
               CASE WHEN r.k IS NULL THEN 'removed'
                    WHEN l.k IS NULL THEN 'added'
                    WHEN l.st IS DISTINCT FROM r.st
                      OR l.pc IS DISTINCT FROM r.pc
                      OR l.pr IS DISTINCT FROM r.pr THEN 'changed'
               END AS verdict,
               CASE WHEN l.k IS NOT NULL AND r.k IS NOT NULL
                     AND l.pc IS DISTINCT FROM r.pc THEN 1 ELSE 0 END AS d_price,
               CASE WHEN l.k IS NOT NULL AND r.k IS NOT NULL
                     AND l.st IS DISTINCT FROM r.st THEN 1 ELSE 0 END AS d_status,
               CASE WHEN l.k IS NOT NULL AND r.k IS NOT NULL
                     AND l.pr IS DISTINCT FROM r.pr THEN 1 ELSE 0 END AS d_priority
        FROM base l FULL OUTER JOIN rgt r ON l.k = r.k
    ),
    diffs AS (SELECT * FROM d WHERE verdict IS NOT NULL),
    counts AS (
        SELECT verdict,
               CAST(count(*) AS BIGINT) AS n_keys,
               CAST(sum(d_price) AS BIGINT) AS n_price_changed,
               CAST(sum(d_status) AS BIGINT) AS n_status_changed,
               CAST(sum(d_priority) AS BIGINT) AS n_priority_changed
        FROM diffs GROUP BY verdict
    ),
    samp AS (
        SELECT verdict,
               string_agg(CAST(k AS VARCHAR), ',' ORDER BY k) AS sample_keys
        FROM (
            SELECT verdict, k,
                   row_number() OVER (PARTITION BY verdict ORDER BY k) AS rn
            FROM diffs
        ) WHERE rn <= 5 GROUP BY verdict
    )
    SELECT c.verdict, c.n_keys, c.n_price_changed, c.n_status_changed,
           c.n_priority_changed, s.sample_keys
    FROM counts c JOIN samp s ON c.verdict = s.verdict
    """


@query("scan_table_diff", oracle=_table_diff_oracle(), tags=("scan", "checksum"))
def scan_table_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Migration DIFF report: full-outer join two keyed table versions
    and report, per verdict class (added / removed / changed), the key
    count, per-COLUMN change counts (null-safe compares — which columns
    drifted, not just that rows did), and a deterministic sample of the
    5 smallest differing keys as a comma-joined list — the actionable
    companion to scan_table_checksum's boolean answer. Money compares
    as exact cents (never raw doubles), and the never-mutated priority
    column's counter attests attribution by reading 0.

    Scale shape: ONE key-partitioned shuffle joins the two versions
    (sort-merge at 100 TB; AQE handles key skew); the diff relation
    persists so the counts and sample branches don't each re-run that
    join; everything after runs on DIFF rows only, which a sane
    migration keeps orders of magnitude smaller than the table. The
    per-class key sample is skew-flat WITHOUT hand-salting: Spark
    plans the constant-N rank filter as Partial WindowGroupLimit, so
    map tasks forward at most 5 keys per class into the verdict
    exchange, never a class's full key set (verified in the executed
    plan — a first version carried a redundant salted pre-window that
    only added an exchange). Reference behavior: the
    monitoring store's status reconciliation (DB:285-327 reads back
    what it wrote); this generalizes it to arbitrary keyed tables."""
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    base = t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("st"),
        cents.alias("pc"),
        F.col("o_orderpriority").alias("pr"),
    )
    right = (
        base.filter(F.col("k") % 97 != 0)
        .select(
            "k",
            F.when(F.col("k") % 83 == 0, F.lit("X")).otherwise(F.col("st")).alias("st"),
            F.when(F.col("k") % 89 == 0, F.col("pc") + 100).otherwise(F.col("pc")).alias("pc"),
            "pr",
        )
        .unionAll(
            base.filter(F.col("k") % 101 == 0).select(
                (F.col("k") + F.lit(_DIFF_KEY_OFS)).alias("k"), "st", "pc", "pr"
            )
        )
    )
    return keyed_table_diff(
        base, right, "k", [("pc", "price"), ("st", "status"), ("pr", "priority")]
    )


def keyed_table_diff(
    left: DataFrame,
    right: DataFrame,
    key: str,
    compare: "list[tuple[str, str]]",
    sample_n: int = 5,
) -> DataFrame:
    """Reusable diff core behind ``scan_table_diff``: full-outer join
    ``left`` and ``right`` on ``key``, classify every differing key as
    added / removed / changed, count per-column drift (null-safe), and
    attach the ``sample_n`` smallest differing keys per class.
    ``compare`` maps column name -> output label (counter column
    ``n_{label}_changed``). Returns the materialized (collect_release)
    class-grain result — <= 3 rows by construction; the lazy plan is
    exposed as :func:`keyed_table_diff_plan` for the physical-plan
    tests (triangle_count_plan precedent). See the query docstring for
    the scale argument (one keyed shuffle, persisted diff relation,
    group-limit sample)."""
    from talkdesk_async_etl_spark.plans.cache import cache_scope, collect_release

    with cache_scope():
        return collect_release(
            keyed_table_diff_plan(left, right, key, compare, sample_n)
        )


def keyed_table_diff_plan(
    left: DataFrame,
    right: DataFrame,
    key: str,
    compare: "list[tuple[str, str]]",
    sample_n: int = 5,
) -> DataFrame:
    """Lazy plan for :func:`keyed_table_diff` — caller must hold an
    active cache_scope (the diff relation is scoped_persist'ed so the
    counts and sample branches share one join execution)."""
    from pyspark.sql import Window

    from talkdesk_async_etl_spark.plans.cache import scoped_persist

    l, r = left.alias("l"), right.alias("r")
    both = F.col(f"l.{key}").isNotNull() & F.col(f"r.{key}").isNotNull()
    col_diff = {
        c: both & ~F.col(f"l.{c}").eqNullSafe(F.col(f"r.{c}")) for c, _ in compare
    }
    any_diff = None
    for c, _ in compare:
        any_diff = col_diff[c] if any_diff is None else (any_diff | col_diff[c])
    verdict = (
        F.when(F.col(f"r.{key}").isNull(), "removed")
        .when(F.col(f"l.{key}").isNull(), "added")
        .when(any_diff, "changed")
    )
    diffs = scoped_persist(
        l.join(r, F.col(f"l.{key}") == F.col(f"r.{key}"), "full_outer")
        .select(
            F.coalesce(F.col(f"l.{key}"), F.col(f"r.{key}")).alias("k"),
            verdict.alias("verdict"),
            *[col_diff[c].cast("int").alias(f"d_{lbl}") for c, lbl in compare],
        )
        .filter(F.col("verdict").isNotNull())
    )
    counts = diffs.groupBy("verdict").agg(
        F.count(F.lit(1)).alias("n_keys"),
        *[
            F.sum(f"d_{lbl}").cast("long").alias(f"n_{lbl}_changed")
            for _, lbl in compare
        ],
    )
    w_class = Window.partitionBy("verdict").orderBy("k")
    samp = (
        diffs.select("verdict", "k")
        .withColumn("rn", F.row_number().over(w_class))
        .filter(F.col("rn") <= sample_n)
        .groupBy("verdict")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("k")), lambda x: x.cast("string")
                ),
                ",",
            ).alias("sample_keys")
        )
    )
    return counts.join(F.broadcast(samp), "verdict")


_RANGE_PARTS = 8

_RANGE_SORT_ORACLE = """
    SELECT CAST(count(*) AS BIGINT) AS total_rows,
           CAST(1 AS BOOLEAN) AS parts_ok,
           CAST(1 AS BOOLEAN) AS all_sorted_within,
           CAST(1 AS BOOLEAN) AS boundaries_disjoint,
           CAST(bit_xor(CAST(('0x' || substr(md5(concat_ws('|',
               CAST(o_orderkey AS VARCHAR),
               CAST(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
                    AS VARCHAR))), 1, 15)) AS BIGINT)) AS BIGINT)
               AS xor_checksum
    FROM orders
"""


@query("sort_range_partitioned_ok", oracle=_RANGE_SORT_ORACLE, tags=("sort", "invariant"))
def sort_range_partitioned_ok(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O4: the TERASORT primitive attested — ``repartitionByRange`` +
    ``sortWithinPartitions`` is how a cluster globally sorts 100 TB
    (every partition holds a disjoint key range, each sorts locally,
    concatenation IS the total order — no single-point merge), and
    this query PROVES all three properties distributed instead of
    assuming them: a ``mapInPandas`` pass walks every partition's
    Arrow batches carrying the running last key (so sortedness is
    checked across batch boundaries, where a naive per-batch check
    lies), emitting one stats row per partition — pid, count,
    first/last key; the ≤8-row stats relation is a bounded driver
    fetch (the sampling-family precedent) that checks partitions
    really are sorted within AND pairwise disjoint in (cents, key)
    lexicographic order. Row survival is attested separately by the
    partitioning-independent bit_xor-of-md5 checksum on a second
    branch of the source scan, so a dropped/duplicated row cannot
    hide behind TRUE flags. The oracle pins count, checksum, and
    constant-TRUE flags — any violated property flips a flag →
    driver hash mismatch.

    Plan: ONE range exchange (sampled boundaries) + local sorts —
    the exact shape Spark plans for a global ORDER BY, made explicit
    and verifiable; the verification adds a feature-row-sized
    mapInPandas and a map-side-combinable checksum aggregate."""
    import pandas as pd

    o = t(spark, sf_dir, "orders", spread=True).select(
        "o_orderkey",
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long").alias("cents"),
    )
    ranged = o.repartitionByRange(
        _RANGE_PARTS, F.col("cents"), F.col("o_orderkey")
    ).sortWithinPartitions("cents", "o_orderkey")

    def per_partition(batches):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        n = 0
        first = last = None
        ok = True
        for pdf in batches:
            for c, k in zip(pdf["cents"], pdf["o_orderkey"]):
                cur = (int(c), int(k))
                if first is None:
                    first = cur
                elif cur < last:
                    ok = False
                last = cur
                n += 1
        if n:
            yield pd.DataFrame(
                [(pid, n, first[0], first[1], last[0], last[1], ok)],
                columns=["pid", "n", "min_c", "min_k", "max_c", "max_k", "ok"],
            )

    stats = ranged.mapInPandas(
        per_partition,
        schema="pid int, n long, min_c long, min_k long, max_c long, max_k long, ok boolean",
    ).collect()  # bounded: <= _RANGE_PARTS rows by construction

    rows = sorted(stats, key=lambda r: (r["min_c"], r["min_k"]))
    all_sorted = all(r["ok"] for r in rows)
    disjoint = all(
        (a["max_c"], a["max_k"]) < (b["min_c"], b["min_k"])
        for a, b in zip(rows, rows[1:])
    )
    parts_ok = 1 < len(rows) <= _RANGE_PARTS

    checksum = o.select(
        F.count(F.lit(1)).alias("total_rows"),
        F.bit_xor(
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            "|",
                            F.col("o_orderkey").cast("string"),
                            F.col("cents").cast("string"),
                        )
                    ),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("long")
        ).alias("xor_checksum"),
    )
    return checksum.select(
        "total_rows",
        F.lit(bool(parts_ok)).alias("parts_ok"),
        F.lit(bool(all_sorted)).alias("all_sorted_within"),
        F.lit(bool(disjoint)).alias("boundaries_disjoint"),
        "xor_checksum",
    )
