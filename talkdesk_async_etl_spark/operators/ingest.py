"""Ingestion robustness and sink maintenance (SURVEY.md §2.1 depth).

The reference ingests third-party HTTP CSV payloads with zero
malformed-row handling (``pd.read_csv`` on the raw download,
databricks/talkdesk_databricks_etl.py:437 — one bad line kills the
report) and appends monitoring rows forever with no compaction
(DB:221-223). These operators supply the production behaviors a
long-running ETL engine needs around those edges:

- ``scan_corrupt_recovery``: PERMISSIVE parsing with per-row corrupt
  capture, so one mangled record quarantines instead of failing a
  100 TB ingest.
- ``scan_schema_evolution``: ``mergeSchema`` reads across batches whose
  producers added columns over time — the append-only layout's schema
  story.
- ``sink_compaction_ok``: small-file compaction for append-heavy sinks
  — the maintenance job that keeps file counts (and thus task counts
  and NameNode/listing pressure) bounded.

Each query constructs its fixture DETERMINISTICALLY from the driver's
documents table via Spark itself (distributed write, no driver-side
row loops), so the DuckDB oracle can compute the expected outcome
directly from ``documents`` without ever seeing the intermediate files.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from talkdesk_async_etl_spark.plans.registry import query
from talkdesk_async_etl_spark.sources.io import read_table as t
from talkdesk_async_etl_spark.sources.io import session_scratch_path

# Every 13th doc_id is emitted as truncated JSON — deterministic, so
# both engines can predict exactly which rows quarantine.
_CORRUPT_MOD = 13


@query(
    "scan_corrupt_recovery",
    oracle=f"""
        SELECT CAST(sum(CASE WHEN doc_id % {_CORRUPT_MOD} <> 0
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_good,
               CAST(sum(CASE WHEN doc_id % {_CORRUPT_MOD} = 0
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_corrupt,
               CAST(sum(CASE WHEN doc_id % {_CORRUPT_MOD} <> 0
                             THEN doc_id END) AS BIGINT) AS sum_good_ids
        FROM documents
    """,
    tags=("scan", "robustness"),
)
def scan_corrupt_recovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4 depth: malformed-record quarantine. The reference feeds raw
    HTTP payloads straight into ``pd.read_csv`` (DB:437) — one bad line
    fails the whole report. Here a JSON-lines batch with a
    deterministic fraction of truncated records (every 13th doc) is
    parsed in PERMISSIVE mode with ``columnNameOfCorruptRecord``: good
    rows parse normally, bad rows land whole in ``_corrupt_record``
    with the data columns null, and ONE aggregate splits the batch into
    (n_good, n_corrupt) plus a value checksum over the surviving rows.

    The oracle never sees the dirty file — it predicts the outcome from
    the source table, so a parser that silently drops or mis-assigns a
    row breaks the hash. The aggregate references data columns alongside
    ``_corrupt_record`` deliberately: Spark disallows queries that
    project ONLY the corrupt column (the parser would need a second
    pass to fill it).

    Scale shape: the dirty write and the recovering read are both plain
    distributed scans — no shuffle until the final single-row aggregate
    (map-side partials → one exchange of 3 longs per task). At 100 TB
    the same plan quarantines bad rows at full scan throughput; the
    quarantined ``_corrupt_record`` column would be written to a
    side-channel table for replay instead of being counted."""
    d = t(spark, sf_dir, "documents", spread=True)
    out = session_scratch_path(spark, sf_dir, "tde_dirty_jsonl")
    shutil.rmtree(out, ignore_errors=True)
    line = F.when(
        F.col("doc_id") % _CORRUPT_MOD == 0,
        # Truncated object: no closing brace, no value for "source".
        F.concat(
            F.lit('{"doc_id": '), F.col("doc_id").cast("string"), F.lit(', "source": ')
        ),
    ).otherwise(F.to_json(F.struct("doc_id", "source", "n_chars")))
    d.select(line.alias("value")).write.mode("overwrite").text(out)

    parsed = (
        spark.read.schema(
            "doc_id bigint, source string, n_chars bigint, _corrupt_record string"
        )
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(out)
    )
    good = F.col("_corrupt_record").isNull()
    return parsed.agg(
        F.sum(good.cast("long")).alias("n_good"),
        F.sum((~good).cast("long")).alias("n_corrupt"),
        F.sum(F.when(good, F.col("doc_id"))).alias("sum_good_ids"),
    )


@query(
    "scan_schema_evolution",
    oracle="""
        SELECT CAST(count(*) AS BIGINT) AS n_total,
               CAST(sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_lang_null,
               (SELECT CAST(count(DISTINCT lang) AS BIGINT)
                FROM documents WHERE doc_id % 2 = 1) AS n_langs,
               CAST(sum(CASE WHEN doc_id % 2 = 0 THEN doc_id END)
                    AS BIGINT) AS sum_old_batch_ids
        FROM documents
    """,
    tags=("scan", "robustness"),
)
def scan_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1 depth: schema evolution across append batches. An old
    producer wrote (doc_id, source); a newer one added ``lang``. The
    two batches land as separate parquet directories and ONE
    ``mergeSchema`` read reconciles them: the union schema applies,
    old-batch rows surface ``lang = NULL``. The query proves no row was
    dropped (n_total), the null-fill hit exactly the old batch
    (n_lang_null + sum_old_batch_ids checksum), and the new column
    survived with its values (n_langs).

    Scale shape: ``mergeSchema`` pays one footer read per FILE at
    planning time (no data scan) — at 100 TB that is why production
    layouts keep schema in a catalog/manifest instead of re-merging
    per query; the read itself stays a plain parallel scan either way.
    The batch split (doc_id parity) is deterministic so the oracle
    reconstructs both batches from the source table."""
    d = t(spark, sf_dir, "documents", spread=True)
    out = session_scratch_path(spark, sf_dir, "tde_schema_evo")
    shutil.rmtree(out, ignore_errors=True)
    old = d.filter(F.col("doc_id") % 2 == 0).select("doc_id", "source")
    new = d.filter(F.col("doc_id") % 2 == 1).select("doc_id", "source", "lang")
    old.write.parquet(os.path.join(out, "batch_a"))
    new.write.parquet(os.path.join(out, "batch_b"))

    merged = spark.read.option("mergeSchema", "true").parquet(
        os.path.join(out, "batch_a"), os.path.join(out, "batch_b")
    )
    lang_null = F.col("lang").isNull()
    return merged.agg(
        F.count("*").alias("n_total"),
        F.sum(lang_null.cast("long")).alias("n_lang_null"),
        F.count_distinct("lang").alias("n_langs"),
        F.sum(F.when(lang_null, F.col("doc_id"))).alias("sum_old_batch_ids"),
    )


_SMALL_FILE_ROWS = 100
_COMPACT_FILES = 2


@query(
    "sink_compaction_ok",
    # Invariant companion (pattern of sink_partition_prune_ok): the two
    # flags are pinned TRUE — fewer files after compaction, and a
    # many-files-before precondition so the test cannot pass vacuously —
    # while the counts/checksum are real oracle values from the SOURCE
    # table, so a compaction that drops, duplicates, or mangles rows
    # breaks the hash even though Spark counted its own output.
    oracle="""
        SELECT CAST(1 AS BOOLEAN) AS compacted_ok,
               CAST(1 AS BOOLEAN) AS many_before_ok,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(doc_id) AS BIGINT) AS sum_ids
        FROM documents
    """,
    tags=("sink", "invariant"),
)
def sink_compaction_ok(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6 depth: small-file compaction — the maintenance job every
    append-only sink needs (the reference appends one monitoring row
    per run forever, DB:221-223; a year of runs is thousands of
    KB-sized files whose listing + per-file task overhead dominates the
    read). The fragmented state is produced with ``maxRecordsPerFile``
    (100 rows/file), then compacted by a ``repartition(2)`` rewrite;
    file counts are measured from ``input_file_name()`` on re-read and
    the row count + doc_id checksum prove the rewrite was lossless.

    Scale shape: compaction is one full shuffle of the fragmented data
    — unavoidable and linear — but it runs OFF the query path on the
    partitions newer than the last compaction watermark (same
    merge-on-read pattern as cdc_latest_wins), and every subsequent
    scan repays it with large sequential reads. Production sizes output
    files to ~128 MB–1 GB via ``maxRecordsPerFile``/AQE advisory
    partition size rather than a fixed count; the fixed 2 here makes
    the invariant deterministic."""
    d = t(spark, sf_dir, "documents", spread=True).select("doc_id", "source", "n_chars")
    out = session_scratch_path(spark, sf_dir, "tde_compaction")
    shutil.rmtree(out, ignore_errors=True)
    frag_dir, compact_dir = os.path.join(out, "frag"), os.path.join(out, "compact")
    (
        d.repartition(8)
        .write.option("maxRecordsPerFile", _SMALL_FILE_ROWS)
        .parquet(frag_dir)
    )

    frag = spark.read.parquet(frag_dir)
    n_files_before = frag.select(F.input_file_name()).distinct().count()
    frag.repartition(_COMPACT_FILES).write.parquet(compact_dir)

    compacted = spark.read.parquet(compact_dir)
    n_files_after = compacted.select(F.input_file_name()).distinct().count()
    return compacted.agg(
        F.lit(n_files_after < n_files_before).alias("compacted_ok"),
        F.lit(n_files_before >= 8).alias("many_before_ok"),
        F.count("*").alias("n_rows"),
        F.sum("doc_id").alias("sum_ids"),
    )


_CLUSTER_FILES = 8


@query(
    "sink_clustered_layout_ok",
    # Invariant companion: disjointness + file count are pinned, the
    # row count and key checksum are real oracle values from the
    # source — a clustering write that drops/duplicates rows or
    # produces overlapping file ranges breaks the hash.
    oracle="""
        SELECT CAST(1 AS BOOLEAN) AS ranges_disjoint,
               CAST(1 AS BOOLEAN) AS files_ok,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(o_custkey) AS BIGINT) AS sum_keys
        FROM orders
    """,
    tags=("sink", "layout", "invariant"),
)
def sink_clustered_layout_ok(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6 depth: range-CLUSTERED data layout — write orders
    range-partitioned + sorted on ``o_custkey`` so every file owns a
    disjoint key interval, then attest that disjointness from the
    files actually written. This is the layout story behind partition
    pruning's finer-grained sibling: with disjoint per-file (and
    per-row-group) min/max, a point or range predicate on the cluster
    key skips every non-overlapping file via parquet footer stats —
    at 100 TB the difference between touching ~1 file and all of them.

    Plan: ``repartitionByRange`` (one range exchange driven by a
    sampled boundary estimate — the same exchange any global sort
    pays) + ``sortWithinPartitions`` (in-partition sort, no second
    exchange) + write. The attestation re-reads with
    ``input_file_name()``, reduces to per-file [min, max] intervals,
    and checks non-overlap with a single lag window over the
    files-sized relation. Production swaps the fixed file count for
    AQE advisory sizing and multi-key layouts for Z-/Hilbert-curve
    encodings; single-key range clustering is the exact shape
    ``repartitionByRange`` gives for free."""
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    out = session_scratch_path(spark, sf_dir, "tde_clustered")
    shutil.rmtree(out, ignore_errors=True)
    (
        o.repartitionByRange(_CLUSTER_FILES, "o_custkey")
        .sortWithinPartitions("o_custkey")
        .write.parquet(out)
    )
    back = spark.read.parquet(out)
    per_file = back.groupBy(F.input_file_name().alias("f")).agg(
        F.min("o_custkey").alias("lo"),
        F.max("o_custkey").alias("hi"),
        F.count("*").alias("n"),
        F.sum("o_custkey").alias("s"),
    )
    from pyspark.sql import Window

    w = Window.orderBy("lo", "f")
    flagged = per_file.select(
        "n",
        "s",
        (F.lag("hi").over(w) < F.col("lo")).alias("disjoint_from_prev"),
    )
    return flagged.agg(
        F.coalesce(F.bool_and("disjoint_from_prev"), F.lit(True)).alias(
            "ranges_disjoint"
        ),
        (F.count("*") <= _CLUSTER_FILES).alias("files_ok"),
        F.sum("n").alias("n_rows"),
        F.sum("s").alias("sum_keys"),
    )


_Z_BITS = 16  # bits per dimension → 32-bit z-value
_Z_MASK = (1 << _Z_BITS) - 1
_Z_FILES = 8


def _z_terms_sql(xcol: str, ycol: str) -> str:
    """DuckDB expression: interleave the low 16 bits of two nonneg
    BIGINT expressions (x gets even bit positions, y odd)."""
    terms = []
    for b in range(_Z_BITS):
        terms.append(f"((({xcol}) >> {b}) & 1) * {1 << (2 * b)}")
        terms.append(f"((({ycol}) >> {b}) & 1) * {1 << (2 * b + 1)}")
    return " + ".join(terms)


def zorder_value(x, y):
    """JVM-side z-value: same bit interleave as :func:`_z_terms_sql`,
    built from shiftright/bitwiseAND/sum — stays inside whole-stage
    codegen, no UDF."""
    terms = []
    for b in range(_Z_BITS):
        terms.append(
            F.shiftright(x.bitwiseAND(_Z_MASK), b).bitwiseAND(1).cast("bigint")
            * F.lit(1 << (2 * b))
        )
        terms.append(
            F.shiftright(y.bitwiseAND(_Z_MASK), b).bitwiseAND(1).cast("bigint")
            * F.lit(1 << (2 * b + 1))
        )
    out = terms[0]
    for term in terms[1:]:
        out = out + term
    return out


@query(
    "sink_zorder_layout_ok",
    # The z-value checksum is REAL oracle data: DuckDB recomputes the
    # bit interleave from orders with plain integer arithmetic, so an
    # endianness/shift/masking bug on the Spark side breaks the hash —
    # the disjointness and file-count flags ride on top of that.
    oracle=f"""
        WITH z AS (
            SELECT {_z_terms_sql(f"o_custkey & {_Z_MASK}", f"o_orderkey & {_Z_MASK}")} AS zv
            FROM orders
        )
        SELECT CAST(1 AS BOOLEAN) AS ranges_disjoint,
               CAST(1 AS BOOLEAN) AS files_ok,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(zv) AS BIGINT) AS sum_z
        FROM z
    """,
    tags=("sink", "layout", "invariant"),
)
def sink_zorder_layout_ok(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S13 depth, multi-dimensional: Z-ORDER clustered layout — the
    two-column sibling of ``sink_clustered_layout_ok``. Single-key
    range clustering makes predicates on THAT key skip files but does
    nothing for a second column; interleaving the bits of two keys
    (o_custkey, o_orderkey) into one z-value and range-clustering on
    it gives every file a compact hypercube-ish region of the 2-D key
    space, so parquet footer min/max stats prune files for predicates
    on EITHER column — the OPTIMIZE ZORDER story, built from
    primitives Spark already has: a codegen'd bit-interleave
    expression, ``repartitionByRange`` (one sampled range exchange),
    ``sortWithinPartitions``, and a files-sized lag-window
    disjointness attestation on re-read. At 100 TB the z-exchange
    costs the same as any global sort and the attestation relation is
    |files|-sized, not data-sized."""
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    zv = zorder_value(F.col("o_custkey"), F.col("o_orderkey")).alias("zv")
    out = session_scratch_path(spark, sf_dir, "tde_zorder")
    shutil.rmtree(out, ignore_errors=True)
    (
        o.select("o_orderkey", "o_custkey", zv)
        .repartitionByRange(_Z_FILES, "zv")
        .sortWithinPartitions("zv")
        .write.parquet(out)
    )
    back = spark.read.parquet(out)
    per_file = back.groupBy(F.input_file_name().alias("f")).agg(
        F.min("zv").alias("lo"),
        F.max("zv").alias("hi"),
        F.count("*").alias("n"),
        F.sum("zv").alias("s"),
    )
    from pyspark.sql import Window

    w = Window.orderBy("lo", "f")
    flagged = per_file.select(
        "n",
        "s",
        (F.lag("hi").over(w) < F.col("lo")).alias("disjoint_from_prev"),
    )
    return flagged.agg(
        F.coalesce(F.bool_and("disjoint_from_prev"), F.lit(True)).alias("ranges_disjoint"),
        (F.count("*") <= _Z_FILES).alias("files_ok"),
        F.sum("n").alias("n_rows"),
        F.sum("s").alias("sum_z"),
    )


_JSONL_ORACLE = """
    SELECT substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS shard,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(bit_xor(doc_id) AS BIGINT) AS id_xor,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY 1
"""


@query("sink_jsonl_export_ok", oracle=_JSONL_ORACLE, tags=("sink", "export"))
def sink_jsonl_export_ok(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S19: JSONL training-export sink — the exchange format training
    pipelines actually emit. Documents are sharded by the first hex
    nibble of md5(doc_id) (the shuffle-shard exporter's deterministic
    key: both engines' md5 agree byte-for-byte), written as
    hive-partitioned JSON LINES, and READ BACK; the attested numbers
    (per-shard count, doc-id XOR, char total) are computed from the
    ROUND-TRIPPED files while the oracle computes them from the source
    table — a dropped row, a mangled escape, a shard misroute, or a
    lossy text round-trip through JSON encoding breaks the hash.
    Scale: one hash-partition exchange (16 shards; at production
    scale use 2-3 nibbles → 256-4096 shards sized to the writer's
    file target) and one partitioned write; the read-back is the
    attestation cost, not the operator cost."""
    out = session_scratch_path(spark, sf_dir, "tde_jsonl_export")
    docs = t(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text", "n_chars",
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1).alias("shard"),
    )
    docs.repartition("shard").write.mode("overwrite").partitionBy("shard").json(out)
    back = spark.read.schema(
        "doc_id long, lang string, text string, n_chars long, shard string"
    ).json(out)
    return back.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.expr("CAST(bit_xor(doc_id) AS BIGINT)").alias("id_xor"),
        F.sum("n_chars").alias("total_chars"),
    )


_IVM_CUTOFF = "1997-01-01"

_IVM_ORACLE = """
    SELECT o_custkey,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS total_cents
    FROM orders
    GROUP BY o_custkey
"""


@query("cdc_incremental_agg", oracle=_IVM_ORACLE, tags=("cdc", "agg", "ivm"))
def cdc_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7 depth — incremental aggregate maintenance (the materialized-
    view pattern): a per-customer (count, exact-cents sum) SNAPSHOT
    built from history is merged with a DELTA batch's partial
    aggregates by union + re-aggregate, WITHOUT rescanning history.
    This is the mergeable-state shape that makes nightly 100 TB
    rollups O(delta) instead of O(corpus): count and sum are
    associative, so partials combine per key exactly. The snapshot is
    localCheckpoint'd to sever lineage — the merge plan provably
    cannot reach back into the base scan (a stored snapshot behaves
    the same). The oracle recomputes the aggregate from the FULL
    table, so the attestation is maintain(snapshot, delta) ==
    recompute(all): any key dropped in the merge, double-counted
    partial, or cents-rounding drift between the two paths breaks the
    hash. Non-mergeable aggregates (exact distinct, median) need the
    sketch family instead (agg_hll_sketch_ok / agg_bitmap_distinct /
    agg_kll_quantiles_ok)."""
    orders = t(spark, sf_dir, "orders", spread=True)
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
    cutoff = F.lit(_IVM_CUTOFF).cast("timestamp")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("o_custkey").agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(cents).alias("total_cents"),
        )

    # The snapshot a previous run would have persisted (lineage cut).
    snapshot = partial(orders.filter(F.col("o_orderdate") < cutoff)).localCheckpoint()
    delta = partial(orders.filter(F.col("o_orderdate") >= cutoff))
    return (
        snapshot.unionByName(delta)
        .groupBy("o_custkey")
        .agg(
            F.sum("n_orders").alias("n_orders"),
            F.sum("total_cents").alias("total_cents"),
        )
    )


_DQ_ORACLE = """
    WITH ref AS (
        SELECT count(*) AS orphans
        FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
        WHERE c.c_custkey IS NULL
    )
    SELECT * FROM (
        SELECT 'r1_custkey_not_null' AS rule,
               CAST(count(*) AS BIGINT) AS n_checked,
               CAST(count(*) FILTER (WHERE o_custkey IS NULL) AS BIGINT)
                   AS n_violations
        FROM orders
        UNION ALL
        SELECT 'r2_orderkey_unique',
               CAST(count(*) AS BIGINT),
               CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT)
        FROM orders
        UNION ALL
        SELECT 'r3_status_in_domain',
               CAST(count(*) AS BIGINT),
               CAST(count(*) FILTER (WHERE o_orderstatus NOT IN ('F','O','P'))
                    AS BIGINT)
        FROM orders
        UNION ALL
        SELECT 'r4_price_positive',
               CAST(count(*) AS BIGINT),
               CAST(count(*) FILTER (WHERE o_totalprice IS NULL
                                        OR o_totalprice <= 0) AS BIGINT)
        FROM orders
        UNION ALL
        SELECT 'r5_price_under_300k',
               CAST(count(*) AS BIGINT),
               CAST(count(*) FILTER (WHERE o_totalprice > 300000) AS BIGINT)
        FROM orders
        UNION ALL
        SELECT 'r6_date_in_range',
               CAST(count(*) AS BIGINT),
               CAST(count(*) FILTER (WHERE o_orderdate < DATE '1992-01-01'
                                        OR o_orderdate >= DATE '1999-01-01')
                    AS BIGINT)
        FROM orders
        UNION ALL
        SELECT 'r7_custkey_references_customer',
               CAST((SELECT count(*) FROM orders) AS BIGINT),
               CAST(orphans AS BIGINT)
        FROM ref
    )
"""


@query("dq_expectations", oracle=_DQ_ORACLE, tags=("quality", "agg"))
def dq_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S25: a declarative data-quality expectation suite (the
    Great-Expectations/DLT-expectations pattern) — not-null,
    uniqueness, domain, range, business-threshold, date-window, and
    referential-integrity rules evaluated over the orders feed in
    ONE pass. Scale shape: all six single-table rules compile into a
    single aggregate over one scan (conditional counts share the
    partial-aggregation buffers); only the referential rule needs a
    second relation, as a broadcast-dim LEFT-ANTI count — the fact
    table is never shuffled at all. Output is the audit artifact
    (rule, n_checked, n_violations); r5 is deliberately calibrated to
    FAIL on real rows (~4% of orders exceed the 300k threshold) so
    the attestation proves violations are counted, not just that
    zeros match."""
    o = t(spark, sf_dir, "orders", spread=True)
    cust = t(spark, sf_dir, "customer").select("c_custkey")

    def cnt(cond) -> F.Column:
        return F.sum(F.when(cond, 1).otherwise(0)).cast("bigint")

    single = o.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_checked"),
        cnt(F.col("o_custkey").isNull()).alias("r1"),
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey")).cast("bigint").alias("r2"),
        cnt(~F.col("o_orderstatus").isin("F", "O", "P")).alias("r3"),
        cnt(F.col("o_totalprice").isNull() | (F.col("o_totalprice") <= 0)).alias("r4"),
        cnt(F.col("o_totalprice") > 300_000).alias("r5"),
        cnt(
            (F.col("o_orderdate") < F.lit("1992-01-01").cast("timestamp"))
            | (F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp"))
        ).alias("r6"),
    )
    orphans = (
        o.join(F.broadcast(cust), o.o_custkey == cust.c_custkey, "left_anti")
        .agg(F.count(F.lit(1)).cast("bigint").alias("r7"))
    )
    wide = single.crossJoin(orphans)  # 1×1 rows — assembling the audit row
    return wide.select(
        F.expr(
            "stack(7,"
            " 'r1_custkey_not_null', r1,"
            " 'r2_orderkey_unique', r2,"
            " 'r3_status_in_domain', r3,"
            " 'r4_price_positive', r4,"
            " 'r5_price_under_300k', r5,"
            " 'r6_date_in_range', r6,"
            " 'r7_custkey_references_customer', r7)"
            " AS (rule, n_violations)"
        ),
        "n_checked",
    ).select("rule", "n_checked", "n_violations")


_CSVQ_ORACLE = """
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(length('v,"' || substr(text, 1, 20) || '"' || chr(10)
                           || 'tail')) AS BIGINT) AS chars_total,
           CAST(bit_xor(doc_id) AS BIGINT) AS id_xor
    FROM documents
    GROUP BY lang
"""


@query("csv_quoted_roundtrip", oracle=_CSVQ_ORACLE, tags=("scan", "csv"))
def csv_quoted_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4 depth — CSV round-trip under adversarial content: every value
    carries an embedded comma, double quote, AND newline (the reference
    pipes raw HTTP text into pd.read_csv, DB:437 — exactly the payload
    shape that silently splits rows without proper quoting). The write
    quotes/escapes, the read uses multiLine=true (embedded newlines
    make records span physical lines — the option a naive reader
    misses), and per-lang count / char-total / id-XOR are attested
    against the SOURCE table, so a split row, a swallowed quote, or a
    lost newline all break the hash."""
    import tempfile

    d = t(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.concat(
            F.lit('v,"'),
            F.substring("text", 1, 20),
            F.lit('"\ntail'),
        ).alias("gnarly"),
    )
    out = tempfile.mkdtemp(prefix="tde_csvq_")
    d.write.mode("overwrite").option("header", True).csv(out)
    back = (
        spark.read.option("header", True)
        .option("multiLine", True)
        .option("inferSchema", True)
        .csv(out)
    )
    return back.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.length("gnarly")).cast("bigint").alias("chars_total"),
        F.expr("CAST(bit_xor(doc_id) AS BIGINT)").alias("id_xor"),
    )


_CBO_ORACLE = """
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(min(o_custkey) AS BIGINT) AS min_custkey,
           CAST(max(o_custkey) AS BIGINT) AS max_custkey,
           CAST(count(*) FILTER (WHERE o_custkey IS NULL) AS BIGINT) AS n_nulls,
           CAST(TRUE AS BOOLEAN) AS ndv_ok
    FROM orders
"""


@query("scan_cbo_stats_ok", oracle=_CBO_ORACLE, tags=("scan", "cbo", "catalog"))
def scan_cbo_stats_ok(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S26: cost-based-optimizer statistics — ``ANALYZE TABLE ...
    COMPUTE STATISTICS FOR COLUMNS`` is what lets Catalyst's CBO pick
    broadcast sides, reorder joins, and estimate filter selectivity on
    a 100 TB catalog (without stats every size guess falls back to
    file sizes). The attestation reads the stats BACK from the catalog
    (DESCRIBE EXTENDED) and emits them as the checked values: the
    row count, column min/max, and null count must EQUAL the source
    table's truth (they are exact in Spark's ANALYZE), and the
    NDV — an HLL estimate by design — must sit within 10% of the
    exact distinct count. A stats write that silently no-ops, a
    min/max swap, or a stale-snapshot ANALYZE all fail the driver
    hash."""
    import re

    o = t(spark, sf_dir, "orders")
    tbl = "tde_cbo_stats_orders"
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    o.write.saveAsTable(tbl)
    try:
        spark.sql(f"ANALYZE TABLE {tbl} COMPUTE STATISTICS FOR COLUMNS o_custkey")
        desc = spark.sql(f"DESCRIBE EXTENDED {tbl}").collect()
        stats_line = next(r.data_type for r in desc if r.col_name == "Statistics")
        n_rows = int(re.search(r"(\d+) rows", stats_line).group(1))
        col = {
            r.info_name: r.info_value
            for r in spark.sql(f"DESCRIBE EXTENDED {tbl} o_custkey").collect()
        }
        exact_ndv = o.select("o_custkey").distinct().count()
        ndv = int(col["distinct_count"])
        ndv_ok = abs(ndv - exact_ndv) <= max(1, exact_ndv // 10)
        return spark.createDataFrame(
            [
                (
                    n_rows,
                    int(col["min"]),
                    int(col["max"]),
                    int(col["num_nulls"]),
                    bool(ndv_ok),
                )
            ],
            "n_rows bigint, min_custkey bigint, max_custkey bigint,"
            " n_nulls bigint, ndv_ok boolean",
        )
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")


_ORC_ORACLE = """
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS chars_total,
           CAST(bit_xor(doc_id) AS BIGINT) AS id_xor
    FROM documents GROUP BY lang
"""


@query("scan_orc_roundtrip", oracle=_ORC_ORACLE, tags=("scan", "orc"))
def scan_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S27: ORC round-trip — the second columnar format Spark ships
    built-in (the lake-migration path: Hive estates are ORC). Write
    documents as ORC, read back, attest per-lang count / char-total /
    id-XOR against the parquet SOURCE — so type mapping, string
    encoding, and row fidelity across the format boundary are the
    checked property. (Avro is the documented environment block of
    this family: external spark-avro jars, absent here — same closure
    class as Delta MERGE.) ORC gets the same predicate-pushdown and
    column-pruning treatment from Catalyst as parquet."""
    import tempfile

    out = tempfile.mkdtemp(prefix="tde_orc_")
    t(spark, sf_dir, "documents").write.mode("overwrite").orc(out)
    return spark.read.orc(out).groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("chars_total"),
        F.expr("CAST(bit_xor(doc_id) AS BIGINT)").alias("id_xor"),
    )


_CODEC_ORACLE = """
    WITH src AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(bit_xor(doc_id) AS BIGINT) AS id_xor
        FROM documents
    )
    SELECT c.codec, src.n AS n_docs, src.id_xor,
           CAST(TRUE AS BOOLEAN) AS smaller_than_uncompressed
    FROM (VALUES ('gzip'), ('snappy'), ('zstd')) c(codec), src
"""


@query("sink_compression_codecs_ok", oracle=_CODEC_ORACLE, tags=("sink", "codec"))
def sink_compression_codecs_ok(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S28: parquet compression codecs — at 100 TB the codec choice is
    a first-order cost knob (zstd ≈ gzip ratio at ~snappy speed).
    Write the documents table under snappy / zstd / gzip AND
    uncompressed, attest per-codec losslessness (count + id-XOR vs the
    source oracle) and that every real codec beats the uncompressed
    byte size. A codec that silently falls back to uncompressed fails
    the size flag; one that corrupts rows fails the checksums."""
    import glob
    import os
    import tempfile

    base = tempfile.mkdtemp(prefix="tde_codec_")
    d = t(spark, sf_dir, "documents")

    def write_and_size(codec: str) -> int:
        path = os.path.join(base, codec)
        d.write.mode("overwrite").option("compression", codec).parquet(path)
        return sum(
            os.path.getsize(f) for f in glob.glob(os.path.join(path, "*.parquet"))
        )

    plain = write_and_size("none")
    rows = []
    for codec in ("gzip", "snappy", "zstd"):
        size = write_and_size(codec)
        back = spark.read.parquet(os.path.join(base, codec)).agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("CAST(bit_xor(doc_id) AS BIGINT)").alias("x"),
        ).collect()[0]
        rows.append((codec, back["n"], back["x"], size < plain))
    return spark.createDataFrame(
        rows,
        "codec string, n_docs bigint, id_xor bigint,"
        " smaller_than_uncompressed boolean",
    )


_DDL_DEFAULT_ORACLE = """
    SELECT CAST(o_orderkey AS BIGINT) AS k,
           CASE WHEN o_orderkey % 3 = 0 THEN 'EXPLICIT' ELSE 'NEW' END AS status,
           CAST(CASE WHEN o_orderkey % 3 = 0 THEN o_custkey ELSE 42 END
                AS BIGINT) AS score
    FROM orders WHERE o_orderkey % 20 = 0
"""


@query("ddl_default_columns", oracle=_DDL_DEFAULT_ORACLE, tags=("ddl", "catalog"))
def ddl_default_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S9 depth — column DEFAULT values (Spark 3.4+ DDL): producers
    that predate a schema change keep inserting the short column list
    and the engine fills declared defaults — the catalog-native half
    of schema evolution (scan_schema_evolution handles the files-
    on-disk half with null-fill; DEFAULT gives a chosen value
    instead). Rows ≡0 mod 3 insert explicit values, the rest omit the
    columns; the oracle predicts exactly which rows carry defaults."""
    tbl = "tde_ddl_defaults"
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 20 == 0)
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    spark.sql(
        f"""CREATE TABLE {tbl} (
            k BIGINT,
            status STRING DEFAULT 'NEW',
            score BIGINT DEFAULT 42
        ) USING parquet"""
    )
    try:
        o.filter(F.col("o_orderkey") % 3 == 0).selectExpr(
            "o_orderkey AS k", "'EXPLICIT' AS status", "o_custkey AS score"
        ).createOrReplaceTempView("ddl_full_rows")
        o.filter(F.col("o_orderkey") % 3 != 0).selectExpr(
            "o_orderkey AS k"
        ).createOrReplaceTempView("ddl_short_rows")
        spark.sql(f"INSERT INTO {tbl} SELECT * FROM ddl_full_rows")
        spark.sql(f"INSERT INTO {tbl} (k) SELECT k FROM ddl_short_rows")
        return spark.table(tbl).select("k", "status", "score").localCheckpoint()
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")


_SCD2_BUILD_ORACLE = """
    WITH e AS (
        SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
               event_type AS attr
        FROM events
    ),
    ch AS (
        SELECT user_id, event_id, ts, attr FROM (
            SELECT user_id, event_id, ts, attr,
                   lag(attr) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev
            FROM e
        ) WHERE prev IS NULL OR prev <> attr
    )
    SELECT user_id, attr, ts AS valid_from,
           lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
           lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
               AS is_current
    FROM ch
"""


@query("cdc_scd2_build", oracle=_SCD2_BUILD_ORACLE, tags=("cdc", "scd2"))
def cdc_scd2_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7 family completion: BUILD the SCD2 dimension from a change
    log — the inverse of join_scd2_point_in_time, which consumes one.
    Per user, consecutive events carrying the same tracked attribute
    collapse (only CHANGES version the dimension); each surviving
    change opens a [valid_from, valid_to) interval closed by the next
    change's timestamp, with the open interval flagged is_current.
    This is the nightly job that turns a Debezium/CDC event stream
    into the point-in-time-joinable dimension every warehouse keeps.

    Determinism: the change ordering is (ts, event_id) — event_id
    breaks timestamp ties identically on both engines. Scale shape:
    ONE hash exchange on user_id serves both window passes (lag to
    detect changes, lead to close intervals — same partitioning, no
    second shuffle), and per-user state is one row."""
    from pyspark.sql import Window

    e = t(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.col("ts").cast("timestamp").alias("ts"),
        F.col("event_type").alias("attr"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        e.withColumn("prev", F.lag("attr").over(w))
        .filter(F.col("prev").isNull() | (F.col("prev") != F.col("attr")))
        .drop("prev")
    )
    valid_to = F.lead("ts").over(w)
    return changes.select(
        "user_id",
        "attr",
        F.col("ts").alias("valid_from"),
        valid_to.alias("valid_to"),
        valid_to.isNull().alias("is_current"),
    )


_CSVM_ORACLE = """
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(length('k,' || substr(text, 1, 15) || '|x')) AS BIGINT)
               AS chars_total,
           CAST(bit_xor(doc_id) AS BIGINT) AS id_xor
    FROM documents
    GROUP BY lang
"""


@query("csv_multichar_delim", oracle=_CSVM_ORACLE, tags=("scan", "csv"))
def csv_multichar_delim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4 depth #2 — MULTI-CHARACTER delimiter CSV round-trip (Spark
    3+ `sep` accepts multi-char): the migration surface for feeds that
    picked `|~|`-style delimiters precisely because their values embed
    commas AND pipes unquoted (every value here carries both). With a
    single-char delimiter those values would need quoting or would
    split; with the multi-char sep they round-trip verbatim and
    UNQUOTED. Per-lang count / char-total / id-XOR are attested
    against the SOURCE table, so a mis-split or partial-delimiter
    match breaks the hash."""
    import tempfile

    d = t(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.concat(F.lit("k,"), F.substring("text", 1, 15), F.lit("|x")).alias("tricky"),
    )
    out = tempfile.mkdtemp(prefix="tde_csvm_")
    d.write.mode("overwrite").option("header", True).option("sep", "|~|").csv(out)
    back = (
        spark.read.option("header", True)
        .option("sep", "|~|")
        .option("inferSchema", True)
        .csv(out)
    )
    return back.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.length("tricky")).cast("bigint").alias("chars_total"),
        F.expr("CAST(bit_xor(doc_id) AS BIGINT)").alias("id_xor"),
    )


_MANIFEST_FILES = 8
_MANIFEST_DONE = 5  # files 0..4 were "processed" by the previous run

_MANIFEST_ORACLE = f"""
    SELECT CAST(o_orderkey % {_MANIFEST_FILES} AS INT) AS file_id,
           CASE WHEN o_orderkey % {_MANIFEST_FILES} < {_MANIFEST_DONE}
                THEN 'done' ELSE 'new' END AS status,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(bit_xor(CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)),
                                             1, 15)) AS BIGINT)) AS BIGINT)
               AS checksum
    FROM orders
    GROUP BY 1, 2
"""


@query("scan_file_manifest_delta", oracle=_MANIFEST_ORACLE, tags=("scan", "ingest"))
def scan_file_manifest_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S30: incremental-ingest MANIFEST delta — the reference's core
    loop re-expressed on partitioned storage (it downloads report
    files and tracks completion in its monitoring table, DB:206-253;
    the batch analogue is "which landed files has this pipeline not
    processed yet"). A landing zone partitioned by file id is diffed
    against the processed manifest: manifest rows re-emit as 'done'
    with the stats the PREVIOUS run recorded; unprocessed ids are
    discovered (bounded distinct over the partition column), scanned,
    and emitted as 'new' with freshly computed row counts and content
    checksums — the idempotence contract being that re-running after
    appending the new ids to the manifest changes only statuses, never
    stats (both passes compute the identical checksum expression).

    Scale shape: both the previous run's pass and the delta pass are
    PARTITION-PRUNED scans — the file_id predicate is on the hive
    partition column, so Spark lists and reads ONLY the matching
    directories (PartitionFilters in the scan node, zero data read
    from processed files); the manifest diff itself is driver-side set
    arithmetic over the partition VALUE list (≤ |files| entries, the
    catalog-listing analogue), never a data join. Checksum is the
    order-insensitive bit_xor fold scan_table_checksum established."""
    import os
    import tempfile

    from talkdesk_async_etl_spark.operators.dedup import _hex15_col

    # The landing zone is keyed by Spark application id AND the sf
    # fixture name: two concurrent sessions (parallel pytest,
    # overlapping bench/plan-audit runs) or two sf_dirs in one session
    # each get their own directory, so neither can overwrite the
    # other's landing data mid-read (ADVICE r11). Same-session
    # same-sf reruns still reuse (overwrite) one path, keeping the
    # operator idempotent rather than tempdir-accreting.
    landing = session_scratch_path(spark, sf_dir, "tde_manifest_landing")
    (
        t(spark, sf_dir, "orders")
        .select("o_orderkey", (F.col("o_orderkey") % _MANIFEST_FILES).cast("int").alias("file_id"))
        .write.mode("overwrite")
        .partitionBy("file_id")
        .parquet(landing)
    )
    land = spark.read.parquet(landing)
    h = _hex15_col(F.col("o_orderkey").cast("string"))

    def stats_for(ids: list[int], status: str) -> DataFrame:
        return (
            land.filter(F.col("file_id").isin(ids))  # partition-pruned scan
            .groupBy(F.col("file_id").cast("int").alias("file_id"))
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.bit_xor(h).alias("checksum"),
            )
            .select("file_id", F.lit(status).alias("status"), "n_rows", "checksum")
        )

    # the previous run: processed ids 0..4 and recorded their stats
    manifest = stats_for(list(range(_MANIFEST_DONE)), "done")
    # this run: discover landed ids (bounded partition-value listing),
    # diff against the manifest, process only the delta
    landed = sorted(
        r["file_id"] for r in land.select("file_id").distinct().collect()
    )
    todo = [i for i in landed if i >= _MANIFEST_DONE]
    return manifest.unionByName(stats_for(todo, "new"))


_METADATA_ORACLE = """
    SELECT o_orderstatus AS status,
           CAST(1 AS BIGINT) AS n_files,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(bit_xor(CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)),
                                             1, 15)) AS BIGINT)) AS BIGINT)
               AS checksum,
           CAST(1 AS INTEGER) AS files_nonempty
    FROM orders GROUP BY o_orderstatus
"""


@query("scan_file_metadata_cols", oracle=_METADATA_ORACLE, tags=("scan", "ingest"))
def scan_file_metadata_cols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S31: hidden FILE-METADATA columns — Spark's ``_metadata`` struct
    (file_path, file_size, …) exposed by every file source, the
    lineage/debugging surface an ingest pipeline uses to answer
    "which physical file did this row come from" without a custom
    reader. A deterministic landing is written (orders partitioned by
    status, repartition(1) pins EXACTLY one file per partition
    directory), read back with ``_metadata`` projected, and attested
    per status: the distinct-file count (must be the pinned 1), the
    row count and content checksum (predicted by the oracle straight
    from the source table — the write/read round-trip must be
    lossless), and a nonempty-file witness from ``_metadata.file_size``.
    File NAMES are deliberately absent from the output — Spark
    generates them nondeterministically (task UUIDs), so the contract
    attests counts-of-files and bytes-exist, the deterministic
    projections of the metadata.

    Scale shape: _metadata is populated per-task from the split being
    read — zero extra I/O, no shuffle beyond the status-grain
    aggregate; partition pruning and the hidden columns compose (the
    scan node carries both)."""
    import os
    import tempfile

    from talkdesk_async_etl_spark.operators.dedup import _hex15_col

    landing = os.path.join(
        tempfile.gettempdir(),
        "tde_metadata_landing_"
        f"{spark.sparkContext.applicationId}_"
        f"{os.path.basename(os.path.normpath(sf_dir))}",
    )
    (
        t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderstatus")
        .repartition(1)
        .write.mode("overwrite")
        .partitionBy("o_orderstatus")
        .parquet(landing)
    )
    land = spark.read.parquet(landing).select(
        "o_orderkey",
        F.col("o_orderstatus").alias("status"),
        F.col("_metadata.file_path").alias("fp"),
        F.col("_metadata.file_size").alias("fs"),
    )
    return land.groupBy("status").agg(
        F.countDistinct("fp").alias("n_files"),
        F.count(F.lit(1)).alias("n_rows"),
        F.bit_xor(_hex15_col(F.col("o_orderkey").cast("string"))).alias("checksum"),
        (F.min("fs") > 0).cast("int").alias("files_nonempty"),
    )


_CSV_BAD_MOD = 7  # every 7th order key carries a type-corrupt cents field

_CSV_MODES_ORACLE = f"""
    WITH src AS (
        SELECT o_orderkey,
               CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
               o_orderstatus,
               (o_orderkey % {_CSV_BAD_MOD} = 3) AS bad
        FROM orders
    ),
    tot AS (
        SELECT CAST(count(*) AS BIGINT) AS n_all,
               CAST(sum(CASE WHEN bad THEN 1 ELSE 0 END) AS BIGINT) AS n_bad,
               CAST(sum(CASE WHEN NOT bad THEN o_orderkey END) AS BIGINT)
                   AS sum_good_keys,
               CAST(sum(CASE WHEN NOT bad THEN cents END) AS BIGINT)
                   AS sum_good_cents
        FROM src
    )
    SELECT 'PERMISSIVE' AS mode, n_all AS n_rows, n_all - n_bad AS n_good,
           n_bad AS n_corrupt, sum_good_keys, sum_good_cents
    FROM tot
    UNION ALL
    SELECT 'DROPMALFORMED' AS mode, n_all - n_bad AS n_rows,
           n_all - n_bad AS n_good, CAST(0 AS BIGINT) AS n_corrupt,
           sum_good_keys, sum_good_cents
    FROM tot
"""


@query("scan_csv_malformed_modes", oracle=_CSV_MODES_ORACLE, tags=("scan", "robustness"))
def scan_csv_malformed_modes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4 depth, CSV face: the parse-mode CONTRACT matrix. The JSON
    twin (scan_corrupt_recovery) attests PERMISSIVE quarantine; this
    one attests PERMISSIVE and DROPMALFORMED side by side over the
    same deterministically type-corrupted CSV landing (every 7th-ish
    order's cents field reads 'abc'), pinning exactly what each mode
    does to row counts and surviving values: PERMISSIVE keeps every
    line and lands bad ones whole in ``_corrupt_record`` with null
    data columns; DROPMALFORMED silently deletes them — the mode
    whose silence costs pipelines data, which is why the matrix is
    worth a driver row (FAILFAST, the third mode, raises by design
    and is pinned in the unit test instead). The oracle predicts both
    rows from the SOURCE table without seeing a CSV byte, so a parser
    that drops, double-counts, or mis-assigns a row breaks the hash.

    The landing is keyed by application id + sf fixture (the
    manifest-delta concurrency lesson). Scale: dirty write and both
    reads are distributed scans; the only exchanges are two 1-row
    aggregate folds. The corrupt-column restriction (Spark refuses
    filters over ONLY ``_corrupt_record``) is satisfied by
    aggregating data columns alongside it, the corrupt-recovery
    precedent."""
    o = t(spark, sf_dir, "orders", spread=True).select(
        "o_orderkey",
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long").alias("cents"),
        "o_orderstatus",
    )
    landing = session_scratch_path(spark, sf_dir, "tde_csv_modes")
    bad = F.col("o_orderkey") % _CSV_BAD_MOD == 3
    line = F.concat_ws(
        ",",
        F.col("o_orderkey").cast("string"),
        F.when(bad, F.lit("abc")).otherwise(F.col("cents").cast("string")),
        F.col("o_orderstatus"),
    )
    o.select(line.alias("value")).write.mode("overwrite").text(landing)

    schema = "o_orderkey bigint, cents bigint, o_orderstatus string, _corrupt_record string"

    permissive = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(landing)
    )
    good = F.col("_corrupt_record").isNull()
    p_row = permissive.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(good.cast("long")).alias("n_good"),
        F.sum((~good).cast("long")).alias("n_corrupt"),
        F.sum(F.when(good, F.col("o_orderkey"))).alias("sum_good_keys"),
        F.sum(F.when(good, F.col("cents"))).alias("sum_good_cents"),
    ).select(F.lit("PERMISSIVE").alias("mode"), "n_rows", "n_good", "n_corrupt",
             "sum_good_keys", "sum_good_cents")

    dropped = (
        spark.read.schema("o_orderkey bigint, cents bigint, o_orderstatus string")
        .option("mode", "DROPMALFORMED")
        .csv(landing)
    )
    d_row = dropped.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.lit(1)).alias("n_good"),
        F.lit(0).cast("long").alias("n_corrupt"),
        F.sum("o_orderkey").alias("sum_good_keys"),
        F.sum("cents").alias("sum_good_cents"),
    ).select(F.lit("DROPMALFORMED").alias("mode"), "n_rows", "n_good", "n_corrupt",
             "sum_good_keys", "sum_good_cents")

    return p_row.unionAll(d_row)


_BINFILES_N = 8

_BINFILES_ORACLE = f"""
    WITH fx AS (
        SELECT CAST(doc_id % {_BINFILES_N} AS INT) AS file_id,
               bit_xor(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                            AS BIGINT)) AS x
        FROM documents GROUP BY 1
    )
    SELECT file_id,
           CAST(32 AS BIGINT) AS n_bytes,
           CAST(('0x' || substr(md5(md5(CAST(x AS VARCHAR))), 1, 15)) AS BIGINT)
               AS content_h
    FROM fx
"""


@query("scan_binary_files", oracle=_BINFILES_ORACLE, tags=("scan", "ingest", "binary"))
def scan_binary_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S32: the ``binaryFile`` DataSource — Spark's whole-file binary
    reader (schema: path, modificationTime, length, content), the
    ingestion surface every multimodal pipeline starts from when media
    arrives as FILES rather than parquet-embedded blobs. The landing
    is derived deterministically from the documents table (one bounded
    |files|-row aggregate collected, content_i = the md5 hex of file
    i's doc-id XOR — so the ORACLE recomputes every byte from the
    source table, the scan_file_manifest_delta precedent for
    session-scratch landings), written with a decoy ``ignore.txt``
    that ``pathGlobFilter='*.bin'`` must exclude; the read-back emits
    per file its name-derived id, the byte length the source reports,
    and the md5-60-bit of the CONTENT bytes — a wrong glob, a
    truncated read, or any content corruption breaks the hash.

    Scale shape: binaryFile lists and reads files across executors
    (one task per file up to maxPartitionBytes); the md5 fold runs
    inside the scan task, so the only driver traffic is the
    |files|-row result. At 100 TB of media this is the entry point
    that feeds the multimodal decode family (multimodal.py) —
    content stays binary, metadata is typed columns."""
    import hashlib
    import os

    from talkdesk_async_etl_spark.operators.dedup import _hex15_col
    from talkdesk_async_etl_spark.sources.io import session_scratch_path

    landing = session_scratch_path(spark, sf_dir, "tde_binfiles")
    os.makedirs(landing, exist_ok=True)
    per_file = (
        t(spark, sf_dir, "documents")
        .groupBy((F.col("doc_id") % _BINFILES_N).cast("int").alias("file_id"))
        .agg(F.bit_xor(_hex15_col(F.col("doc_id").cast("string"))).alias("x"))
        .collect()
    )  # bounded: |files| rows
    for r in per_file:
        content = hashlib.md5(str(r["x"]).encode()).hexdigest().encode("ascii")
        with open(os.path.join(landing, f"part_{r['file_id']}.bin"), "wb") as fh:
            fh.write(content)
    with open(os.path.join(landing, "ignore.txt"), "w", encoding="utf-8") as fh:
        fh.write("decoy - pathGlobFilter must exclude this file")
    back = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.bin")
        .load(landing)
    )
    return back.select(
        F.regexp_extract(F.col("path"), r"part_(\d+)\.bin", 1)
        .cast("int")
        .alias("file_id"),
        F.col("length").cast("long").alias("n_bytes"),
        _hex15_col(F.col("content").cast("string")).alias("content_h"),
    )


_GZ_ORACLE = """
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           CAST(bit_xor(CAST(('0x' || substr(md5(concat_ws('|',
                CAST(doc_id AS VARCHAR), md5(text))), 1, 15)) AS BIGINT))
                AS BIGINT) AS content_xor
    FROM documents GROUP BY lang
"""


@query("scan_jsonl_gzip", oracle=_GZ_ORACLE, tags=("scan", "codec"))
def scan_jsonl_gzip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S33: COMPRESSED JSONL ingestion — the wire format external text
    corpora actually arrive in (CommonCrawl-style .json.gz dumps).
    The landing is written by the engine itself (gzip-codec JSON
    LINES, one write), then read back through the codec; the attested
    numbers (per-lang count, char total, and a bit_xor md5-hex15 fold
    over (doc_id, md5(text)) — the text BYTES survive or the hash
    breaks) are computed from the DECOMPRESSED round trip while the
    oracle computes them from the source parquet. A truncated gzip
    member, a codec mismatch, or a lossy escape breaks the row.

    Scale shape: gzip is NOT splittable — each .json.gz file is one
    read task, so file COUNT is the parallelism dial (the write
    repartitions to 8 files here; production sizes files to ~100-500
    MB compressed). That constraint is the operator's documentation
    payload: at 100 TB, prefer zstd/bzip2 (splittable containers) or
    re-land to parquet on first touch — this query IS the re-land's
    verification step."""
    from talkdesk_async_etl_spark.operators.dedup import _hex15_col
    from talkdesk_async_etl_spark.sources.io import session_scratch_path

    out = session_scratch_path(spark, sf_dir, "tde_jsonl_gz")
    (
        t(spark, sf_dir, "documents")
        .select("doc_id", "lang", "text", "n_chars")
        .repartition(8)
        .write.mode("overwrite")
        .option("compression", "gzip")
        .json(out)
    )
    back = spark.read.schema(
        "doc_id long, lang string, text string, n_chars long"
    ).json(out)
    return back.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.bit_xor(
            _hex15_col(
                F.concat_ws("|", F.col("doc_id").cast("string"), F.md5("text"))
            )
        )
        .cast("long")
        .alias("content_xor"),
    )
