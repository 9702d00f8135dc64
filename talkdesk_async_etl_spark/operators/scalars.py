"""Scalar-function operators (SURVEY.md §2.8 X1-X12).

The reference's scalar surface is dates (truncation, arithmetic,
formatting — DB:495-497, README.md:449-455), string building
(URL/path concat — async_utils.py:56-106), escaping (DB:226-228), and
CASE logic (DB:563-568). Extended with math, JSON, array, and string
toolkits over the testdata's events/embeddings/documents columns.

All expressions are built-in ``pyspark.sql.functions`` — JVM-side,
inside whole-stage codegen. No Python executes per row anywhere here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from talkdesk_async_etl_spark.plans.registry import query
from talkdesk_async_etl_spark.sources.io import read_table as t


@query(
    "scalar_date_arith",
    oracle="""
        SELECT o_orderkey,
               CAST(o_orderdate AS DATE) + 30 AS due_date,
               CAST(o_orderdate AS DATE) - 7 AS week_before,
               date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since_epoch_start
        FROM orders WHERE o_orderkey % 100 = 0
    """,
    tags=("scalar", "date"),
)
def scalar_date_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2: date add/sub/diff (the reference's yesterday→today window
    defaults, DB:495-497, and 7-day dashboard ranges, README.md:455)."""
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 100 == 0)
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        F.date_add(d, 30).alias("due_date"),
        F.date_sub(d, 7).alias("week_before"),
        F.datediff(d, F.lit("1995-01-01").cast("date")).alias("days_since_epoch_start"),
    )


@query(
    "scalar_date_format",
    oracle="""
        SELECT o_orderkey,
               strftime(o_orderdate, '%Y-%m-%d') AS order_date_str,
               CAST(year(o_orderdate) AS INTEGER) AS order_year,
               CAST(month(o_orderdate) AS INTEGER) AS order_month,
               CAST(CAST(date_trunc('month', o_orderdate) AS DATE) AS VARCHAR) AS month_start
        FROM orders WHERE o_orderkey % 100 = 0
    """,
    tags=("scalar", "date"),
)
def scalar_date_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1+X3: formatting/parsing the reference's ``YYYY-MM-DD`` date
    strings (DB:497) and month truncation."""
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 100 == 0)
    return o.select(
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date_str"),
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.date_trunc("month", F.col("o_orderdate")).cast("date").cast("string").alias("month_start"),
    )


@query(
    "scalar_string_concat",
    oracle="""
        SELECT c_custkey,
               '/data/' || c_mktsegment || '/' || c_name || '.csv' AS output_path,
               concat_ws('_', c_mktsegment, CAST(c_nationkey AS VARCHAR)) AS seg_key
        FROM customer
    """,
    tags=("scalar", "string"),
)
def scalar_string_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5: path/URL building (the reference's
    ``{base}/{report}/{from}_to_{to}.csv`` output contract,
    DB:441-444)."""
    c = t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.concat(F.lit("/data/"), F.col("c_mktsegment"), F.lit("/"), F.col("c_name"), F.lit(".csv")).alias(
            "output_path"
        ),
        F.concat_ws("_", F.col("c_mktsegment"), F.col("c_nationkey").cast("string")).alias("seg_key"),
    )


@query(
    "scalar_string_replace",
    oracle="""
        SELECT p_partkey,
               replace(p_name, ' ', '_') AS name_snake,
               regexp_replace(p_type, '[aeiou]', '', 'g') AS type_novowels
        FROM part
    """,
    tags=("scalar", "string"),
)
def scalar_string_replace(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X6: replace/regexp_replace. The reference replaces quotes to
    build SQL literals (DB:226-228) — obsolete here by design (DataFrame
    writes, no string-SQL interpolation); shown as data cleaning."""
    p = t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_snake"),
        F.regexp_replace(F.col("p_type"), "[aeiou]", "").alias("type_novowels"),
    )


@query(
    "scalar_math",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               round(l_extendedprice * (1 - l_discount) * (1 + l_tax), 6) AS charge,
               round(abs(l_discount - 0.05), 4) AS disc_dev,
               CAST(floor(l_quantity) AS BIGINT) AS qty_floor,
               CAST(l_orderkey % 7 AS BIGINT) AS bucket
        FROM lineitem WHERE l_orderkey % 50 = 0
    """,
    tags=("scalar", "math"),
)
def scalar_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X9: arithmetic expression toolkit (TPC-H charge expression,
    abs/floor/modulo)."""
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 50 == 0)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        # Rounded at 6 decimals, not 2: the charge is 6-decimal-logical
        # (2dp × 2dp × 2dp), so a 2dp round can land EXACTLY on a
        # half-cent boundary where Spark (BigDecimal HALF_UP on the
        # exact double) and DuckDB (×100 then std::round) disagree; at
        # 6 decimals the data sits ~1e-10 from the value, never on the
        # 5e-7 boundary.
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax")), 6).alias(
            "charge"
        ),
        F.round(F.abs(F.col("l_discount") - 0.05), 4).alias("disc_dev"),
        F.floor(F.col("l_quantity")).alias("qty_floor"),
        (F.col("l_orderkey") % 7).alias("bucket"),
    )


@query(
    "scalar_json_extract",
    oracle="""
        SELECT event_id,
               CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val,
               CASE WHEN CAST(json_extract_string(props, '$.k') AS INTEGER) >= 50
                    THEN 'high' ELSE 'low' END AS k_bucket
        FROM events WHERE event_type = 'purchase'
    """,
    tags=("scalar", "json"),
)
def scalar_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X10: JSON extraction from the events.props string column.
    ``get_json_object`` stays JVM-side; at scale prefer parsing once
    via ``from_json`` into a struct column and pruning fields."""
    e = t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    return e.select(
        "event_id",
        k.alias("k_val"),
        F.when(k >= 50, "high").otherwise("low").alias("k_bucket"),
    )


@query(
    "scalar_json_struct",
    oracle="""
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS k_sum,
               CAST(max(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS INTEGER) AS k_max
        FROM events GROUP BY event_type
    """,
    tags=("scalar", "json"),
)
def scalar_json_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X10 scale path: parse the JSON props column ONCE into a typed
    struct with ``from_json``, then aggregate the extracted field.
    Repeated ``get_json_object`` calls re-parse the JSON per expression;
    from_json parses once and Catalyst prunes unneeded struct fields
    (OptimizeJsonExprs also rewrites single-field cases)."""
    from pyspark.sql import types as T

    e = t(spark, sf_dir, "events")
    props_schema = T.StructType([T.StructField("k", T.IntegerType())])
    parsed = e.withColumn("p", F.from_json("props", props_schema))
    return parsed.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(F.col("p.k")).alias("k_sum"),
        F.max(F.col("p.k")).alias("k_max"),
    )


@query(
    "scalar_array_ops",
    oracle="""
        SELECT vec_id,
               CAST(len(embedding) AS INTEGER) AS dim,
               embedding[1] AS first_elem,
               round(list_sum(CAST(embedding AS DOUBLE[])), 3) AS vec_sum,
               round(list_max(CAST(embedding AS DOUBLE[])), 6) AS vec_max
        FROM embeddings WHERE vec_id % 10 = 0
    """,
    tags=("scalar", "array"),
)
def scalar_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X11: array ops over the embedding column (size, element access,
    fold, max) — all JVM higher-order functions, no UDF."""
    e = t(spark, sf_dir, "embeddings").filter(F.col("vec_id") % 10 == 0)
    vec = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.element_at("embedding", 1).alias("first_elem"),
        F.round(F.aggregate(vec, F.lit(0.0), lambda acc, x: acc + x), 3).alias("vec_sum"),
        F.round(F.array_max(vec), 6).alias("vec_max"),
    )


@query(
    "scalar_string_toolkit",
    oracle="""
        SELECT doc_id,
               lower(substr(text, 1, 20)) AS head_lower,
               CAST(length(text) AS INTEGER) AS text_len,
               CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
               upper(lang) AS lang_upper,
               trim(source) AS source_trim
        FROM documents WHERE doc_id % 5 = 0
    """,
    tags=("scalar", "string"),
)
def scalar_string_toolkit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X12: string toolkit over documents.text
    (lower/substring/length/split/upper/trim)."""
    d = t(spark, sf_dir, "documents").filter(F.col("doc_id") % 5 == 0)
    return d.select(
        "doc_id",
        F.lower(F.substring("text", 1, 20)).alias("head_lower"),
        F.length("text").alias("text_len"),
        F.size(F.split("text", " ")).alias("n_tokens"),
        F.upper("lang").alias("lang_upper"),
        F.trim(F.col("source")).alias("source_trim"),
    )


@query(
    "scalar_variant_json",
    # DuckDB has no VARIANT; its JSON extraction is the semantic twin.
    oracle="""
        SELECT CAST(json_extract(props, '$.k') AS INTEGER) AS k,
               CAST(count(*) AS BIGINT) AS n_events,
               round(sum(value), 2) AS sum_value
        FROM events
        GROUP BY k
    """,
    tags=("scalar", "json", "variant"),
)
def scalar_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-depth: the Spark 4 VARIANT path for semi-structured data —
    ``parse_json`` once into a binary VARIANT, then typed
    ``variant_get`` extraction — vs scalar_json_extract's string-level
    ``get_json_object``. At 100 TB this is the difference that
    matters: VARIANT parses each JSON document ONCE into a shredded
    binary encoding (and stores that way in parquet), so N extractions
    cost one parse + N cheap binary probes, where get_json_object
    re-parses the string per call. The aggregate shape is the standard
    group-on-extracted-key rollup."""
    ev = t(spark, sf_dir, "events", spread=True)
    return (
        ev.select(
            F.expr("variant_get(parse_json(props), '$.k', 'int')").alias("k"),
            "value",
        )
        .groupBy("k")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


@query(
    "scalar_higher_order_lambda",
    # DuckDB's list lambdas mirror Spark's HOFs one-to-one; both
    # engines cast the float32 vector to double FIRST, then fold
    # sequentially, so the 6-dp rounded sums hash-match.
    oracle="""
        SELECT vec_id,
               round(list_sum(list_transform(CAST(embedding AS DOUBLE[]),
                                             x -> x * x)), 6) AS sq_norm,
               CAST(len(list_filter(embedding, x -> x > 0)) AS INTEGER) AS n_pos,
               round(list_sum(list_transform(
                   list_zip(CAST(embedding AS DOUBLE[]),
                            list_reverse(CAST(embedding AS DOUBLE[]))),
                   p -> p[1] * p[2])), 6) AS rev_dot
        FROM embeddings
    """,
    tags=("scalar", "lambda"),
)
def scalar_higher_order_lambda(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-family depth: the higher-order-function lambda surface —
    ``transform`` (map), ``filter``, ``zip_with`` (binary map), and
    ``aggregate`` (fold) over the embedding vectors, entirely inside
    whole-stage codegen: per-element lambdas compile to JVM
    expressions, so a 64-wide vector op costs array traversal, never a
    UDF row trip. This is the built-in path the similarity family's
    dot products ride; here it is attested standalone: squared L2 norm
    (fold of a map), positive-component count (filter + size), and the
    self-reversed dot product (zip_with of the vector against its
    reverse — an order-sensitive pairing that breaks if either
    engine's zip or reverse is off by one)."""
    vec = F.col("embedding").cast("array<double>")
    fold = lambda arr: F.aggregate(arr, F.lit(0.0), lambda a, x: a + x)  # noqa: E731
    return t(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.round(fold(F.transform(vec, lambda x: x * x)), 6).alias("sq_norm"),
        F.size(F.filter(F.col("embedding"), lambda x: x > 0)).alias("n_pos"),
        F.round(
            fold(F.zip_with(vec, F.reverse(vec), lambda x, y: x * y)), 6
        ).alias("rev_dot"),
    )


@query(
    "scalar_try_arithmetic",
    # DuckDB has no try_* family; the oracle spells out the NULL-on-
    # error contract the try functions implement — which is the point:
    # the CASE is what every pipeline writes by hand until it adopts
    # the try form.
    oracle="""
        SELECT o_orderkey,
               CASE WHEN (o_custkey % 10) = 0 THEN NULL
                    ELSE round(o_totalprice / (o_custkey % 10), 6) END
                   AS price_per_unit,
               CASE WHEN (o_custkey % 10) = 0 THEN NULL
                    ELSE o_orderkey / (o_custkey % 10) END AS key_div,
               try_cast(o_orderpriority AS INTEGER) AS prio_num
        FROM orders
    """,
    tags=("scalar",),
)
def scalar_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-family depth: ANSI error-safe arithmetic — ``try_divide`` and
    ``try_cast`` return NULL where strict ANSI mode would fail the
    whole 100 TB job (division by zero, a non-numeric cast). The
    divisor (custkey mod 10) hits zero on ~10% of rows by
    construction, so the NULL-on-error path is exercised and
    hash-attested, not just typed; the priority strings are never
    numeric, so try_cast's all-NULL column pins the cast side (the
    oracle's try_cast agrees). These stay inside whole-stage codegen —
    error-safety costs a branch, not a UDF. The oracle writes the
    equivalent guard CASE by hand, which is exactly the boilerplate
    the try family deletes."""
    o = t(spark, sf_dir, "orders")
    divisor = F.col("o_custkey") % 10
    return o.select(
        "o_orderkey",
        F.round(F.try_divide(F.col("o_totalprice"), divisor), 6).alias("price_per_unit"),
        F.try_divide(F.col("o_orderkey"), divisor).alias("key_div"),
        # Plain .cast THROWS here — Spark 4 defaults to ANSI mode, so a
        # non-numeric string kills the job; try_cast is the survivable
        # form (verified: the .cast variant fails this very query with
        # CAST_INVALID_INPUT).
        F.col("o_orderpriority").try_cast("int").alias("prio_num"),
    )


@query(
    "scalar_map_ops",
    # The oracle derives every output DIRECTLY from the source columns
    # — ground truth that never touches a map — so each scalar attests
    # that the Spark-side MapType pipeline (create_map → map_filter /
    # transform_values / map_values / element_at) lands on exactly the
    # values the columns dictate.
    oracle="""
        SELECT o_orderkey,
               CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS BIGINT)
                   AS price_cents,
               CAST((CASE WHEN CAST(round(o_totalprice * 100) AS BIGINT) % 2 = 0
                          THEN 1 ELSE 0 END)
                    + (CASE WHEN o_orderkey % 2 = 0 THEN 1 ELSE 0 END)
                    + (CASE WHEN o_custkey % 2 = 0 THEN 1 ELSE 0 END)
                    AS INTEGER) AS n_even,
               CAST(CAST(round(o_totalprice * 100) AS BIGINT)
                    + o_orderkey + o_custkey AS BIGINT) AS sum_vals,
               CAST(o_custkey * 2 AS BIGINT) AS cust_doubled
        FROM orders
    """,
    tags=("scalar", "map"),
)
def scalar_map_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-family depth: the MapType column surface — ``create_map``,
    ``map_filter`` (entry-level lambda over (k, v)),
    ``transform_values``, ``map_values`` + ``aggregate`` fold, and
    ``element_at`` lookup, all inside whole-stage codegen (map lambdas
    compile to JVM expressions like the array HOFs). Maps are how
    semi-structured per-row attributes ride a typed schema when the
    key set is open-ended (the `events.props` shape without the JSON
    re-parse); this query pins the full read/filter/rewrite path over
    a map built from exact integer columns, so every derived scalar
    has a column-derived ground truth and the hash-check is exact —
    no float ambiguity (money enters as exact cents)."""
    o = t(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    m = F.create_map(
        F.lit("price_cents"), cents,
        F.lit("key"), F.col("o_orderkey"),
        F.lit("cust"), F.col("o_custkey"),
    )
    return o.select(
        "o_orderkey",
        F.element_at(m, F.lit("price_cents")).alias("price_cents"),
        F.size(F.map_filter(m, lambda k, v: v % 2 == 0)).alias("n_even"),
        F.aggregate(F.map_values(m), F.lit(0).cast("long"), lambda a, x: a + x).alias(
            "sum_vals"
        ),
        F.element_at(
            F.transform_values(m, lambda k, v: v * 2), F.lit("cust")
        ).alias("cust_doubled"),
    )


_COLLATION_ORACLE = """
    WITH mixed AS (
        SELECT CASE WHEN doc_id % 2 = 0 THEN upper(source) ELSE source END AS src,
               n_chars
        FROM documents
    )
    SELECT lower(src) AS source_key,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM mixed
    GROUP BY lower(src)
"""


@query("scalar_collation_ci", oracle=_COLLATION_ORACLE, tags=("scalar", "collation"))
def scalar_collation_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X15: Spark 4 COLLATION surface — case-insensitive comparison
    semantics attached to the VALUE (``collate(col, 'UTF8_LCASE')``)
    instead of rewritten into every expression. Case variance is
    injected deterministically (even doc_ids upper-case their source),
    then the collated column feeds a plain ``groupBy`` — the engine
    must merge 'SRC1' and 'src1' into ONE group under the collation.
    The attestation is structural, not cosmetic: if collation silently
    degraded to binary comparison the groups would split per case and
    the output would carry DUPLICATE source_key rows after the
    lower() normalization — a row-count mismatch against the oracle
    (which expresses the same semantics as group-by-lower, the
    pre-collation rewrite this feature replaces). The group
    representative under a collation is whichever variant the
    aggregate sees, so the output key is normalized with lower() on
    both engines. Scale: identical plan economics to any string
    groupBy — collation affects the comparator, not the shuffle
    shape."""
    mixed = t(spark, sf_dir, "documents").select(
        F.when(F.col("doc_id") % 2 == 0, F.upper("source"))
        .otherwise(F.col("source"))
        .alias("src"),
        "n_chars",
    )
    return (
        mixed.withColumn("ck", F.collate(F.col("src"), "UTF8_LCASE"))
        .groupBy("ck")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
        .select(
            F.lower(F.col("ck")).alias("source_key"), "n_docs", "total_chars"
        )
    )


_XML_ORACLE = """
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(*) AS BIGINT) AS n_roundtrip_exact,
           CAST(bit_xor(doc_id) AS BIGINT) AS id_xor
    FROM documents
    GROUP BY lang
"""


@query("scalar_xml_roundtrip", oracle=_XML_ORACLE, tags=("scalar", "xml"))
def scalar_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X16: Spark 4 XML surface — `to_xml(struct)` → `from_xml(schema)`
    round-trip over real document text (which contains spaces and
    arbitrary characters the XML writer must escape). The oracle never
    parses XML: it predicts from the SOURCE table what a LOSSLESS
    round-trip must yield — every row exact, per-lang counts and
    doc-id XOR identical — so any escaping bug, encoding loss, or
    silent null-on-parse-error in either direction breaks the hash
    (the count of rows whose parsed struct equals the original
    columns IS an output column). Legacy-feed ingestion is the use
    case; the scale shape is row-local string codec work in the scan,
    zero shuffle before the per-lang rollup."""
    docs = t(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    xml = docs.withColumn("x", F.to_xml(F.struct("doc_id", "lang", "text")))
    parsed = xml.withColumn(
        "p", F.from_xml("x", "doc_id BIGINT, lang STRING, text STRING")
    )
    exact = (
        (F.col("p.doc_id") == F.col("doc_id"))
        & (F.col("p.lang") == F.col("lang"))
        & (F.col("p.text") == F.col("text"))
    )
    return (
        parsed.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(exact.cast("long")).alias("n_roundtrip_exact"),
            F.expr("CAST(bit_xor(CASE WHEN p.doc_id = doc_id THEN doc_id END) AS BIGINT)").alias("id_xor"),
        )
    )


_REGEX_FAMILY_ORACLE = """
    SELECT event_id,
           CAST(len(regexp_extract_all(props, '[0-9]+')) AS INTEGER) AS n_numbers,
           regexp_extract(props, '[0-9]+') AS first_number,
           CAST(regexp_matches(props, '"k": [0-9]+') AS BOOLEAN) AS has_k,
           CAST(CASE WHEN regexp_extract(props, '[0-9]+') = ''
                     THEN 0
                     ELSE CAST(regexp_extract(props, '[0-9]+') AS BIGINT)
                END AS BIGINT) AS first_value
    FROM events WHERE event_id % 10 = 0
"""


@query("scalar_regex_family", oracle=_REGEX_FAMILY_ORACLE, tags=("scalar", "regex"))
def scalar_regex_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X17: the Spark 3.5+ regex toolkit beyond replace/extract —
    ``regexp_count`` (occurrences), ``regexp_substr`` (first match or
    NULL), ``rlike``, and numeric extraction, over the events payload
    column (the reference regex-scrubs payloads only via replace,
    DB:226-228). All codegen'd JVM regex — no Python. DuckDB twins:
    len(regexp_extract_all) for count, regexp_extract for substr
    (which returns '' where Spark returns NULL — normalized via the
    CASE; the first_number column keeps DuckDB's ''-vs-NULL seam
    visible by coalescing Spark's NULL to '')."""
    from talkdesk_async_etl_spark.sources.io import read_table

    ev = read_table(spark, sf_dir, "events").filter(F.col("event_id") % 10 == 0)
    first = F.regexp_substr(F.col("props"), F.lit("[0-9]+"))
    return ev.select(
        "event_id",
        F.regexp_count(F.col("props"), F.lit("[0-9]+")).alias("n_numbers"),
        F.coalesce(first, F.lit("")).alias("first_number"),
        F.col("props").rlike('"k": [0-9]+').alias("has_k"),
        F.coalesce(first.cast("bigint"), F.lit(0)).alias("first_value"),
    )


_URL_ORACLE = """
    SELECT c_custkey,
           'talkdesk.example.com' AS host,
           '/' || lower(c_mktsegment) || '/report' AS path,
           'cust=' || CAST(c_custkey AS VARCHAR) AS query,
           replace(c_name, '#', '%23') AS name_enc,
           c_name AS name_roundtrip
    FROM customer
"""


@query("scalar_url_parse", oracle=_URL_ORACLE, tags=("scalar", "url"))
def scalar_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X18: URL building + parsing — the reference constructs report
    download URLs by concatenation (async_utils.py:56-106); here the
    built URL is parsed BACK with ``parse_url`` (HOST/PATH/QUERY) and
    the customer name round-trips through ``url_encode``/``url_decode``
    (application/x-www-form-urlencoded). The oracle re-derives every
    component from the SOURCE columns — if parse_url mis-splits or the
    encode/decode pair is lossy, the hash breaks. (Fixture names only
    contain '#', so the oracle's percent-encoding is one replace.)"""
    c = t(spark, sf_dir, "customer")
    url = F.concat(
        F.lit("https://talkdesk.example.com/"),
        F.lower(F.col("c_mktsegment")),
        F.lit("/report?cust="),
        F.col("c_custkey").cast("string"),
    )
    return c.select(
        "c_custkey",
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY")).alias("query"),
        F.url_encode(F.col("c_name")).alias("name_enc"),
        F.url_decode(F.url_encode(F.col("c_name"))).alias("name_roundtrip"),
    )


# DuckDB-oracle gotcha (probed, v1.0): INTERVAL 3 MONTH and
# INTERVAL 90 DAY compare EQUAL under the months≈30-days interval
# ordering convention, and common-subexpression elimination folds
# `ts + INTERVAL 3 MONTH` and `ts + INTERVAL 90 DAY` in one SELECT
# into a single expression — both columns silently become +3 months.
# The day-add is therefore written as DATE + 90 (integer day add).
_INTERVAL_ORACLE = """
    SELECT o_orderkey,
           CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS due_3mo,
           CAST(o_orderdate AS DATE) + 90 AS due_90d,
           CAST(date_diff('hour', TIMESTAMP '1995-01-01 00:00:00', o_orderdate)
                AS BIGINT) AS hours_since_anchor,
           CAST(year(o_orderdate) * 12 + month(o_orderdate) - (1995 * 12 + 1)
                AS BIGINT) AS months_since_anchor
    FROM orders WHERE o_orderkey % 100 = 0
"""


@query("scalar_interval_math", oracle=_INTERVAL_ORACLE, tags=("scalar", "date"))
def scalar_interval_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X19: INTERVAL arithmetic — month addition (end-of-month clamp
    semantics, identical in both engines: Jan 31 + 2 months = Mar 31),
    day addition, and elapsed units against an anchor. Cross-engine
    seam pinned here: Spark's ``timestampdiff(MONTH, ...)`` counts
    FULL elapsed months while DuckDB's ``date_diff('month', ...)``
    counts month BOUNDARIES crossed — the two disagree mid-month, so
    the month delta is computed with explicit year/month arithmetic
    (boundary semantics, written identically in both engines). Hours
    agree because order dates are midnight-aligned timestamps."""
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 100 == 0)
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.expr("date_add(MONTH, 3, o_orderdate)").cast("date").alias("due_3mo"),
        F.expr("date_add(DAY, 90, o_orderdate)").cast("date").alias("due_90d"),
        F.expr(
            "timestampdiff(HOUR, TIMESTAMP '1995-01-01 00:00:00', o_orderdate)"
        ).alias("hours_since_anchor"),
        (
            F.year(d) * 12 + F.month(d) - F.lit(1995 * 12 + 1)
        ).cast("bigint").alias("months_since_anchor"),
    )


_MASK_ORACLE = """
    SELECT c_custkey,
           regexp_replace(regexp_replace(regexp_replace(c_name,
               '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', 'n', 'g')
               AS name_masked,
           regexp_replace(regexp_replace(regexp_replace(c_mktsegment,
               '[A-Z]', '#', 'g'), '[a-z]', '*', 'g'), '[0-9]', '0', 'g')
               AS seg_masked
    FROM customer
"""


@query("scalar_mask_pii", oracle=_MASK_ORACLE, tags=("scalar", "pii"))
def scalar_mask_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X20: the built-in ``mask()`` PII redactor (Spark 3.5+) — class
    -preserving character masking (upper→X, lower→x, digit→n, other
    kept), plus the custom-replacement-chars form. Complements
    text_pii_scrub's pattern-level scrubbing: mask is the
    shape-preserving variant auditors want (length and character
    classes survive, content doesn't). The oracle rebuilds the exact
    masking with per-class regexp_replace chains."""
    c = t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.mask(F.col("c_name")).alias("name_masked"),
        F.mask(
            F.col("c_mktsegment"),
            F.lit("#"),
            F.lit("*"),
            F.lit("0"),
        ).alias("seg_masked"),
    )


# DuckDB's octet_length only takes BLOB; strlen(VARCHAR) is its
# byte-length twin of Spark's octet_length (probed on multibyte text).
_AES_ORACLE = """
    SELECT doc_id,
           CAST((strlen(text) // 16 + 1) * 16 AS BIGINT) AS ct_len,
           CAST(TRUE AS BOOLEAN) AS roundtrip_ok
    FROM documents
"""


@query("scalar_aes_roundtrip", oracle=_AES_ORACLE, tags=("scalar", "crypto"))
def scalar_aes_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X21: column-level encryption — ``aes_encrypt``/``aes_decrypt``
    round-trip in deterministic ECB mode (GCM's random IV would make
    the ciphertext non-attestable; ECB is used here precisely because
    determinism is the test contract — production key-per-column GCM
    is the same two calls). The oracle cannot compute AES, so it pins
    what it CAN predict exactly from the source: PKCS#7 ciphertext
    length ((len div 16)+1)·16 and round-trip identity per row — a
    truncated decrypt, wrong padding, or charset-lossy round-trip
    breaks either column."""
    d = t(spark, sf_dir, "documents")
    key = F.lit("0123456789abcdef")
    ct = F.expr("aes_encrypt(text, '0123456789abcdef', 'ECB')")
    back = F.expr(
        "CAST(aes_decrypt(aes_encrypt(text, '0123456789abcdef', 'ECB'),"
        " '0123456789abcdef', 'ECB') AS STRING)"
    )
    return d.select(
        "doc_id",
        F.octet_length(ct).cast("bigint").alias("ct_len"),
        (back == F.col("text")).alias("roundtrip_ok"),
    )


_BITWISE_ORACLE = """
    SELECT o_orderkey,
           o_orderkey << 3 AS shl,
           o_orderkey >> 2 AS shr,
           o_orderkey & 255 AS low_byte,
           o_orderkey | 4096 AS with_flag,
           xor(o_orderkey, 21845) AS toggled,
           CAST(bit_count(CAST(o_orderkey AS BIGINT)) AS INTEGER) AS popcount
    FROM orders WHERE o_orderkey % 50 = 0
"""


@query("scalar_bitwise_ops", oracle=_BITWISE_ORACLE, tags=("scalar", "bitwise"))
def scalar_bitwise_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X22: the bitwise toolkit — shifts, AND/OR/XOR masks, popcount —
    the primitives the engine's own z-order interleave
    (sink_zorder_layout_ok), bloom filter (join_bloom_prefilter_ok),
    and bitmap-distinct operators are built from, attested standalone.
    All codegen'd integer ops; exact cross-engine by construction."""
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 50 == 0)
    return o.select(
        "o_orderkey",
        F.shiftleft(F.col("o_orderkey"), 3).alias("shl"),
        F.shiftright(F.col("o_orderkey"), 2).alias("shr"),
        F.col("o_orderkey").bitwiseAND(F.lit(255)).alias("low_byte"),
        F.col("o_orderkey").bitwiseOR(F.lit(4096)).alias("with_flag"),
        F.col("o_orderkey").bitwiseXOR(F.lit(21845)).alias("toggled"),
        F.bit_count(F.col("o_orderkey")).alias("popcount"),
    )


_STRTOMAP_ORACLE = """
    SELECT c_custkey,
           c_mktsegment AS seg_val,
           CAST(c_nationkey AS VARCHAR) AS nation_val,
           CAST(2 AS INTEGER) AS n_keys
    FROM customer
"""


@query("scalar_str_to_map", oracle=_STRTOMAP_ORACLE, tags=("scalar", "map"))
def scalar_str_to_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X23: ``str_to_map`` — parsing ``k=v;k=v`` payload strings (the
    properties/tags format config feeds and HTTP headers arrive in)
    into a typed map in one call, then keyed extraction. The payload
    is built from source columns so the oracle predicts every
    extracted value without parsing anything; a delimiter mix-up or
    lost pair breaks the hash. In-scan, zero shuffle; the map never
    leaves the row (output is atomic-typed per the driver contract)."""
    c = t(spark, sf_dir, "customer")
    payload = F.concat(
        F.lit("seg="),
        F.col("c_mktsegment"),
        F.lit(";nation="),
        F.col("c_nationkey").cast("string"),
    )
    m = F.str_to_map(payload, F.lit(";"), F.lit("="))
    return c.select(
        "c_custkey",
        F.element_at(m, "seg").alias("seg_val"),
        F.element_at(m, "nation").alias("nation_val"),
        F.size(m).alias("n_keys"),
    )


# --- IPv4 parse + CIDR classification ---------------------------------
# Deterministic synthetic ips derived from user_id (both engines build
# the identical STRING, then the operator under test is the parse back
# to uint32 and the prefix-match arithmetic).
_CIDR_BLOCKS = (
    ("10.0.0.0/8", 10 * 2**24, 8),
    ("172.16.0.0/12", 172 * 2**24 + 16 * 2**16, 12),
    ("192.168.0.0/16", 192 * 2**24 + 168 * 2**16, 16),
)


def _cidr_case_sql(ip_col: str) -> str:
    cases = " ".join(
        f"WHEN ({ip_col} // {2 ** (32 - bits)}) * {2 ** (32 - bits)} = {base} "
        f"THEN '{name}'"
        for name, base, bits in _CIDR_BLOCKS
    )
    return f"CASE {cases} ELSE 'public' END"


_IP_ORACLE = f"""
    WITH ips AS (
        SELECT user_id,
               CAST((user_id * 3) % 224 + 1 AS VARCHAR) || '.' ||
               CAST((user_id * 13) % 256 AS VARCHAR) || '.' ||
               CAST((user_id * 17) % 256 AS VARCHAR) || '.' ||
               CAST((user_id * 19) % 254 + 1 AS VARCHAR) AS ip
        FROM (SELECT DISTINCT user_id FROM events)
    ),
    parsed AS (
        SELECT user_id,
               CAST(string_split(ip, '.')[1] AS BIGINT) * 16777216
             + CAST(string_split(ip, '.')[2] AS BIGINT) * 65536
             + CAST(string_split(ip, '.')[3] AS BIGINT) * 256
             + CAST(string_split(ip, '.')[4] AS BIGINT) AS ip_u32
        FROM ips
    )
    SELECT {_cidr_case_sql("ip_u32")} AS block,
           CAST(count(*) AS BIGINT) AS n_users,
           CAST(sum(ip_u32) AS BIGINT) AS ip_sum
    FROM parsed GROUP BY 1
"""


@query("scalar_ip_cidr", oracle=_IP_ORACLE, tags=("scalar",))
def scalar_ip_cidr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X24: IPv4 parsing + CIDR classification — the log-enrichment
    scalar every security/traffic pipeline runs: dotted-quad strings
    parse to uint32 (split + positional casts, pure JVM expressions),
    then classify against RFC-1918 CIDR blocks with prefix arithmetic
    (floor-align to the block size and compare — integer-exact on both
    engines; no bit-shift builtin dialect differences to reconcile).
    The first-octet multiplier is COPRIME with 224 so every octet
    value — including the three private-block leads — is reachable
    (a first draft used 7, whose gcd with 224 made 10/172/192
    unreachable and the classifier vacuously 'public').
    The fixture derives a deterministic ip string per user on BOTH
    engines, so the hash attests the round-trip parse and the block
    arithmetic, and ``ip_sum`` pins every parsed uint32, not just the
    block sizes.

    Scale shape: one distinct-user collapse (map-side combinable),
    then per-row scalar arithmetic inside the scan and a 4-row block
    rollup — nothing else shuffles."""
    users = (
        t(spark, sf_dir, "events", spread=True)
        .select("user_id")
        .distinct()
    )
    ip = F.concat_ws(
        ".",
        ((F.col("user_id") * 3) % 224 + 1).cast("string"),
        ((F.col("user_id") * 13) % 256).cast("string"),
        ((F.col("user_id") * 17) % 256).cast("string"),
        ((F.col("user_id") * 19) % 254 + 1).cast("string"),
    )
    parts = F.split(F.col("ip"), "\\.")
    ip_u32 = (
        parts[0].cast("long") * 16777216
        + parts[1].cast("long") * 65536
        + parts[2].cast("long") * 256
        + parts[3].cast("long")
    )
    block = F.lit("public")
    for name, base, bits in reversed(_CIDR_BLOCKS):
        size = 2 ** (32 - bits)
        block = F.when(
            (F.floor(F.col("ip_u32") / size) * size) == base, name
        ).otherwise(block)
    return (
        users.select("user_id", ip.alias("ip"))
        .select("user_id", ip_u32.alias("ip_u32"))
        .groupBy(block.alias("block"))
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum("ip_u32").cast("long").alias("ip_sum"),
        )
    )


_BASE_CODECS_ORACLE = """
    SELECT doc_id,
           base64(encode(substr(text, 1, 100))) AS b64,
           hex(encode(substr(text, 1, 20))) AS hx,
           CAST(decode(from_base64(base64(encode(substr(text, 1, 100)))))
                = substr(text, 1, 100) AS BOOLEAN) AS b64_roundtrip_ok,
           CAST(decode(from_hex(hex(encode(substr(text, 1, 20)))))
                = substr(text, 1, 20) AS BOOLEAN) AS hex_roundtrip_ok
    FROM documents
"""


@query("scalar_base_codecs", oracle=_BASE_CODECS_ORACLE, tags=("scalar",))
def scalar_base_codecs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X25: binary-text codec surface — base64 and hex encode/decode
    with BOTH the encodings and the round-trips value-hash-checked.
    The one real seam is pinned as the contract: Spark's ``base64``
    is the MIME variant (CRLF wrap every 76 chars, a java.util.Base64
    MimeEncoder inheritance) while DuckDB emits unwrapped RFC 4648,
    so the Spark side strips CRLF to make the UNWRAPPED encoding the
    cross-engine contract — exactly the normalization a migration off
    a JVM pipeline has to apply before comparing ETL outputs, and the
    unit test pins the raw wrap so a future Spark behavior change
    surfaces loudly. Hex is uppercase on both engines as-is.

    Plan: row-local projection in the scan, zero shuffles — codecs
    are free at any scale; the cost is only output width."""
    d = t(spark, sf_dir, "documents", spread=True)
    return d.select(
        "doc_id",
        F.expr(
            "replace(replace(base64(encode(substr(text, 1, 100), 'UTF-8')),"
            " '\\r', ''), '\\n', '')"
        ).alias("b64"),
        F.expr("hex(encode(substr(text, 1, 20), 'UTF-8'))").alias("hx"),
        F.expr(
            "string(unbase64(base64(encode(substr(text, 1, 100), 'UTF-8'))))"
            " = substr(text, 1, 100)"
        ).alias("b64_roundtrip_ok"),
        F.expr(
            "string(unhex(hex(encode(substr(text, 1, 20), 'UTF-8'))))"
            " = substr(text, 1, 20)"
        ).alias("hex_roundtrip_ok"),
    )
