"""Engine-extension API surfaces (SURVEY.md §2.1 S21-S22, §2.11 U6-U9).

The reference is extended through plain Python modules that its runner
imports (local/async_utils.py, databricks/talkdesk_databricks_etl.py) —
its "plugin" surface is the Python import system. Spark's counterparts
are first-class engine entry points, each attested here with a
hash-checked oracle:

- the Spark 4 **Python DataSource API** (`pyspark.sql.datasource`) —
  a user-defined source that plugs into `spark.read.format(...)` with
  real partition planning, so third-party feeds (ticket exports, audit
  APIs) enter the DataFrame world as parallel scans, not driver loops;
- **grouped applyInArrow** — the zero-pandas grouped aggregation hook
  (mapInArrow's grouped sibling; completes the Arrow surface next to
  udf_map_in_arrow / udaf_grouped_apply / udaf_cogroup_asof);
- **SQL-defined functions** (`CREATE FUNCTION ... RETURN`) — scalar
  and TABLE-valued, the Spark 4 way to package reusable business
  expressions without shipping Python to executors at all;
- **EXECUTE IMMEDIATE** — parameterized dynamic SQL, the SQL-scripting
  twin of `spark.sql(args=...)` (sql_named_params);
- **DataFrame.transpose** — the Spark 4.1 rows↔columns flip for
  report-shaped summaries (the reference emails wide per-metric CSV
  reports, DB:441-446).

Scale notes: the Python DataSource generates rows executor-side per
InputPartition (the driver only plans partitions); applyInArrow state
is one Arrow batch per group; SQL UDFs inline into Catalyst plans and
stay inside whole-stage codegen; transpose collects the (tiny,
pre-aggregated) input by contract — never point it at a fact table.
"""

from __future__ import annotations

import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from talkdesk_async_etl_spark.plans.registry import query
from talkdesk_async_etl_spark.sources.io import read_table as t

# ---------------------------------------------------------------------------
# S21: Python DataSource API
# ---------------------------------------------------------------------------

_PYDS_ROWS = 35_000
_PYDS_PARTS = 8
_PYDS_EPOCH = datetime.date(2024, 1, 1)


class SynthRowsDataSource(DataSource):
    """A deterministic synthetic-feed source: every column is a pure
    integer formula of the row id, so a DuckDB ``generate_series``
    oracle re-derives the full content. The point is the API contract:
    ``partitions()`` plans N independent splits on the driver and each
    executor task calls ``read`` for its own split — the same
    planning/reading split a real REST-cursor or file-manifest source
    would implement."""

    @classmethod
    def name(cls) -> str:
        return "synthrows"

    def schema(self) -> str:
        return "id bigint, bucket int, amount_cents bigint, day date"

    def reader(self, schema) -> "SynthRowsReader":
        return SynthRowsReader(self.options)


class SynthRowsReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("n_rows", _PYDS_ROWS))
        self.n_parts = int(options.get("partitions", _PYDS_PARTS))

    def partitions(self):
        return [InputPartition(i) for i in range(self.n_parts)]

    def read(self, partition):
        # Contiguous id ranges per split; the LAST split absorbs the
        # remainder so every id in [0, n_rows) is emitted exactly once.
        per = self.n_rows // self.n_parts
        i = partition.value
        lo = i * per
        hi = self.n_rows if i == self.n_parts - 1 else lo + per
        for k in range(lo, hi):
            yield (
                k,
                k % 7,
                (k * k) % 1_000_003,
                _PYDS_EPOCH + datetime.timedelta(days=k % 365),
            )


_PYDS_ORACLE = f"""
    SELECT CAST(i % 7 AS INTEGER) AS bucket,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum((i * i) % 1000003) AS BIGINT) AS total_cents,
           min(DATE '2024-01-01' + CAST(i % 365 AS INTEGER)) AS first_day,
           max(DATE '2024-01-01' + CAST(i % 365 AS INTEGER)) AS last_day
    FROM generate_series(0, {_PYDS_ROWS - 1}) t(i)
    GROUP BY 1
"""


@query("scan_python_datasource", oracle=_PYDS_ORACLE, tags=("scan", "datasource"))
def scan_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S21: the Spark 4 Python DataSource API end-to-end — register a
    user-defined source, plan 8 InputPartitions driver-side, generate
    rows executor-side, and aggregate the result. The oracle re-derives
    every value from the generating formula, so a dropped partition, a
    double-read split, or a remainder-row bug all break the hash (the
    row count is NOT divisible by the split count by construction:
    35000 = 8·4375 exactly — so use 7 buckets over 8 parts to keep
    bucket≠partition alignment honest)."""
    spark.dataSource.register(SynthRowsDataSource)
    feed = (
        spark.read.format("synthrows")
        .option("n_rows", _PYDS_ROWS)
        .option("partitions", _PYDS_PARTS)
        .load()
    )
    return feed.groupBy(F.col("bucket")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("amount_cents").alias("total_cents"),
        F.min("day").alias("first_day"),
        F.max("day").alias("last_day"),
    )


# ---------------------------------------------------------------------------
# §2.11 U6: grouped applyInArrow
# ---------------------------------------------------------------------------

_AIA_ORACLE = """
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(floor(value * 1000000 + 0.5) AS BIGINT)) AS BIGINT)
               AS value_sum_micros,
           CAST(min(user_id) AS BIGINT) AS min_user,
           CAST(max(user_id) AS BIGINT) AS max_user
    FROM events
    GROUP BY event_type
"""


def _arrow_group_stats(table):
    """pyarrow.Table (one group) → pyarrow.Table (one row). Quantizes
    value to integer micro-units per element BEFORE summation so the
    Arrow-side reduction is exact BIGINT arithmetic that cannot diverge
    from DuckDB's fold on float addition order."""
    import numpy as np
    import pyarrow as pa

    vals = table.column("value").to_numpy(zero_copy_only=False).astype("float64")
    q = np.floor(vals * 1_000_000 + 0.5).astype("int64")
    users = table.column("user_id").to_numpy(zero_copy_only=False)
    return pa.table(
        {
            "event_type": [table.column("event_type")[0].as_py()],
            "n": [table.num_rows],
            "value_sum_micros": [int(q.sum())],
            "min_user": [int(users.min())],
            "max_user": [int(users.max())],
        }
    )


@query("udaf_apply_in_arrow", oracle=_AIA_ORACLE, tags=("udf", "arrow"))
def udaf_apply_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U6: ``groupBy().applyInArrow`` — the grouped RecordBatch surface
    (mapInArrow's grouped sibling). Each group arrives as ONE Arrow
    table with zero pandas materialization; numpy reads the value
    buffer directly. Grouping by event_type bounds per-group state to
    the (small) type domain — for high-cardinality groups this is the
    same bucket trick udaf_ewma_timeseries uses. Exactness: per-element
    integer quantization before the sum."""
    ev = t(spark, sf_dir, "events", spread=True).select("event_type", "user_id", "value")
    return ev.groupBy("event_type").applyInArrow(
        _arrow_group_stats,
        schema="event_type string, n long, value_sum_micros long, min_user long, max_user long",
    )


# ---------------------------------------------------------------------------
# §2.11 U7/U8: SQL-defined scalar + table functions
# ---------------------------------------------------------------------------

_SQLUDF_ORACLE = """
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
                         AS BIGINT)) AS BIGINT) AS disc_cents_sum
    FROM lineitem
    GROUP BY l_returnflag
"""


@query("sql_udf_scalar", oracle=_SQLUDF_ORACLE, tags=("udf", "sql"))
def sql_udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U7: a SQL-defined scalar function (Spark 4
    ``CREATE FUNCTION ... RETURN <expr>``) — business logic packaged in
    the catalog, inlined by Catalyst into whole-stage codegen: no
    Python on executors, unlike every UDF above. The function body is
    the suite's standard exact-cents discount quantization; the oracle
    inlines the identical expression, so the attestation covers the
    CREATE/resolve/inline path, not just the arithmetic."""
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION disc_cents(ep DOUBLE, disc DOUBLE)
        RETURNS BIGINT
        RETURN CAST(floor(ep * (1 - disc) * 100 + 0.5) AS BIGINT)
        """
    )
    t(spark, sf_dir, "lineitem").createOrReplaceTempView("sqludf_lineitem")
    return spark.sql(
        """
        SELECT l_returnflag,
               count(*) AS n,
               sum(disc_cents(l_extendedprice, l_discount)) AS disc_cents_sum
        FROM sqludf_lineitem
        GROUP BY l_returnflag
        """
    )


_SQLTF_ORACLE = """
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_small,
           CAST(sum(n_chars) AS BIGINT) AS chars_sum
    FROM documents
    WHERE n_chars < 600
    GROUP BY lang
"""


@query("sql_udf_table", oracle=_SQLTF_ORACLE, tags=("udf", "sql"))
def sql_udf_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U8: a SQL-defined TABLE function — a parameterized, reusable
    relation (`SELECT * FROM small_docs(600)`) resolved and inlined by
    the analyzer. This is the catalog-native alternative to the Python
    ``@udtf`` (udtf_word_chunks): same call-site ergonomics, zero
    Python runtime. Note Spark requires the parameter in a FOLDABLE
    position inside the body (probed: `range(n)` with a parameter end
    is rejected), so the body parameterizes a WHERE bound over a view."""
    t(spark, sf_dir, "documents").createOrReplaceTempView("sqltf_documents")
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION small_docs(mx BIGINT)
        RETURNS TABLE(doc_id BIGINT, lang STRING, n_chars BIGINT)
        RETURN SELECT doc_id, lang, n_chars FROM sqltf_documents WHERE n_chars < mx
        """
    )
    return spark.sql(
        """
        SELECT lang, count(*) AS n_small, sum(n_chars) AS chars_sum
        FROM small_docs(600)
        GROUP BY lang
        """
    )


# ---------------------------------------------------------------------------
# S22: EXECUTE IMMEDIATE (dynamic parameterized SQL)
# ---------------------------------------------------------------------------

_EXEC_IMM_ORACLE = """
    SELECT o_orderpriority AS priority,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS total_cents
    FROM orders
    WHERE o_orderdate >= DATE '1996-01-01'
    GROUP BY o_orderpriority
"""


@query("sql_execute_immediate", oracle=_EXEC_IMM_ORACLE, tags=("sql", "params"))
def sql_execute_immediate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S22: ``EXECUTE IMMEDIATE ... USING <expr> AS <name>`` — the
    SQL-scripting surface for dynamic parameterized statements (the
    statement text is itself data). Complements sql_named_params
    (python ``spark.sql(args=...)``): same named-marker binding, but
    driven entirely from SQL, which is how stored procedures and SQL
    workflows template queries. The query string binds a DATE
    parameter; injection-safe by construction (markers, not f-string
    splicing — the reference interpolates dates into SQL text,
    DB:226-228)."""
    t(spark, sf_dir, "orders").createOrReplaceTempView("ei_orders")
    return spark.sql(
        """
        EXECUTE IMMEDIATE
          'SELECT o_orderpriority AS priority,
                  count(*) AS n,
                  sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS total_cents
           FROM ei_orders
           WHERE o_orderdate >= :cutoff
           GROUP BY o_orderpriority'
        USING DATE '1996-01-01' AS cutoff
        """
    )


# ---------------------------------------------------------------------------
# S23: DataFrame.transpose
# ---------------------------------------------------------------------------

_TRANSPOSE_ORACLE = """
    WITH agg AS (
        SELECT o_orderstatus,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
                   AS total_cents
        FROM orders GROUP BY o_orderstatus
    )
    SELECT 'n_orders' AS key,
           CAST(sum(CASE WHEN o_orderstatus = 'F' THEN n_orders END) AS BIGINT) AS F,
           CAST(sum(CASE WHEN o_orderstatus = 'O' THEN n_orders END) AS BIGINT) AS O,
           CAST(sum(CASE WHEN o_orderstatus = 'P' THEN n_orders END) AS BIGINT) AS P
    FROM agg
    UNION ALL
    SELECT 'total_cents',
           CAST(sum(CASE WHEN o_orderstatus = 'F' THEN total_cents END) AS BIGINT),
           CAST(sum(CASE WHEN o_orderstatus = 'O' THEN total_cents END) AS BIGINT),
           CAST(sum(CASE WHEN o_orderstatus = 'P' THEN total_cents END) AS BIGINT)
    FROM agg
"""


@query("scan_transpose", oracle=_TRANSPOSE_ORACLE, tags=("scan", "reshape"))
def scan_transpose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S23: ``DataFrame.transpose`` (Spark 4.1) — rows↔columns flip for
    report-shaped output (the reference's per-metric CSV emails,
    DB:441-446, are this shape). Input contract: transpose COLLECTS its
    input, so it is only ever pointed at a pre-aggregated relation —
    here 3 rows (order-status domain) × 2 metrics → 2 rows × 3 status
    columns. All metrics are BIGINT so the transposed common type is
    lossless; the index column is ordered before the flip so column
    derivation is deterministic."""
    agg = (
        t(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(
                F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
            ).alias("total_cents"),
        )
        .orderBy("o_orderstatus")
    )
    return agg.transpose()


# ---------------------------------------------------------------------------
# S24: SQL scripting (BEGIN ... END compound statements)
# ---------------------------------------------------------------------------

_SCRIPT_ORACLE = """
    WITH cents AS (
        SELECT o_orderstatus,
               CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c
        FROM orders
    ),
    cut AS (SELECT CAST(sum(c) // count(*) AS BIGINT) AS cutoff FROM cents)
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n_above,
           CAST(32 AS BIGINT) AS loop_pow
    FROM cents, cut
    WHERE c > cutoff
    GROUP BY o_orderstatus
"""


@query("sql_scripting_block", oracle=_SCRIPT_ORACLE, tags=("sql", "scripting"))
def sql_scripting_block(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S24: Spark 4 SQL SCRIPTING — a BEGIN...END compound with
    DECLARE'd variables, a scalar-subquery SET, and a WHILE loop, the
    procedural surface SQL-first users migrate stored procedures onto.
    The script derives a mean-price cutoff as a VARIABLE (exact
    integer cents — sum//count — because a double avg is
    partial-aggregation-order-dependent and could flip a boundary
    row between engines), loops a register to 2^5 (control-flow
    exercised, folded into the output), and returns the above-cutoff
    status counts. The oracle inlines variable and loop as plain SQL."""
    t(spark, sf_dir, "orders").createOrReplaceTempView("script_orders")
    return spark.sql(
        """
        BEGIN
          DECLARE cutoff BIGINT;
          DECLARE p BIGINT DEFAULT 1;
          DECLARE i INT DEFAULT 1;
          SET cutoff = (
            SELECT sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                     div count(*)
            FROM script_orders);
          WHILE i <= 5 DO
            SET p = p * 2;
            SET i = i + 1;
          END WHILE;
          SELECT o_orderstatus,
                 count(*) AS n_above,
                 p AS loop_pow
          FROM script_orders
          WHERE CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) > cutoff
          GROUP BY o_orderstatus;
        END
        """
    )


# ---------------------------------------------------------------------------
# T8: streaming Python DataSource (SimpleDataSourceStreamReader)
# ---------------------------------------------------------------------------


class SynthStreamDataSource(DataSource):
    """Streaming twin of :class:`SynthRowsDataSource`: a rate-like
    source whose offsets are plain row counters and whose rows derive
    from the same integer formulas, so a batch query over the union of
    all micro-batches is predictable exactly. Demonstrates the Spark 4
    simple stream reader contract: ``initialOffset`` → ``read(start)``
    → (offset bookkeeping by the engine) with replay via
    ``readBetweenOffsets`` — the at-least-once seam a real feed tap
    (webhook buffer, audit cursor) implements."""

    @classmethod
    def name(cls) -> str:
        return "synthstream"

    def schema(self) -> str:
        return "id bigint, bucket int, amount_cents bigint"

    def simpleStreamReader(self, schema):
        return SynthStreamReader(self.options)


from pyspark.sql.datasource import SimpleDataSourceStreamReader


class SynthStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options):
        self.batch_rows = int(options.get("batch_rows", 100))
        self.max_rows = int(options.get("max_rows", 1000))

    def initialOffset(self):
        return {"pos": 0}

    def read(self, start):
        pos = start["pos"]
        end = min(pos + self.batch_rows, self.max_rows)
        rows = [(k, k % 7, (k * k) % 1_000_003) for k in range(pos, end)]
        return iter(rows), {"pos": end}

    def readBetweenOffsets(self, start, end):
        return iter(
            (k, k % 7, (k * k) % 1_000_003)
            for k in range(start["pos"], end["pos"])
        )

    def commit(self, end):
        pass
