"""Pandas-UDF surface demonstrations (SURVEY.md §2.11).

The reference has no Spark UDFs — its custom logic is driver-side
Python (TokenManager DB:76-131, retry DB:285-327). Engine policy:
built-ins first; when Python must run in-plan it is Arrow-batched
(``pandas_udf`` / ``applyInPandas``), never row-at-a-time. These two
queries exist to pin the pattern (and its oracle parity) down; the real
uses live in pipeline/runner.py (mapInPandas connector fan-out) and
operators/multimodal.py (decode stubs).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from talkdesk_async_etl_spark.plans.registry import query
from talkdesk_async_etl_spark.sources.io import read_table as t


# Type object (not a DDL string): string return types need an active
# SparkContext to parse, which would break import-time registration.
@F.pandas_udf(T.DoubleType())
def _charge_udf(price: pd.Series, discount: pd.Series, tax: pd.Series) -> pd.Series:
    """Vectorized charge expression: one Arrow batch in, one out.
    (Built-in column arithmetic would be faster still — this exists to
    demonstrate the scalar pandas_udf path.) No per-row rounding:
    IEEE double arithmetic in the same order is bit-identical to the
    oracle's; rounding would reintroduce engine-specific tie-breaking."""
    return price * (1.0 - discount) * (1.0 + tax)


@query(
    "udf_pandas_scalar",
    oracle="""
        SELECT l_returnflag,
               CAST(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6)))
                    AS DOUBLE) AS total_charge,
               CAST(count(*) AS BIGINT) AS n
        FROM lineitem GROUP BY l_returnflag
    """,
    tags=("udf",),
)
def udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar pandas UDF in a grouped aggregate plan. The UDF output
    feeds a normal JVM-side aggregation — only the scalar projection
    crosses the Arrow boundary."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.withColumn("charge", _charge_udf("l_extendedprice", "l_discount", "l_tax"))
        .groupBy("l_returnflag")
        .agg(
            # charge is 6-decimal-logical (2dp price × 2dp discount ×
            # 2dp tax): decimal(18,6) accumulation is exact/order-free.
            F.sum(F.col("charge").cast("decimal(18,6)")).cast("double").alias("total_charge"),
            F.count("*").alias("n"),
        )
    )


def _cust_stats(pdf: pd.DataFrame) -> pd.DataFrame:
    """Per-group pandas aggregation: order count + price spread."""
    return pd.DataFrame(
        {
            "o_custkey": [pdf["o_custkey"].iloc[0]],
            "n_orders": [len(pdf)],
            "price_spread": [round(pdf["o_totalprice"].max() - pdf["o_totalprice"].min(), 2)],
        }
    )


@query(
    "udaf_grouped_apply",
    oracle="""
        SELECT o_custkey,
               CAST(count(*) AS BIGINT) AS n_orders,
               round(max(o_totalprice) - min(o_totalprice), 2) AS price_spread
        FROM orders GROUP BY o_custkey
    """,
    tags=("udf",),
)
def udaf_grouped_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas (UDAF-equivalent): one shuffle on the
    group key, then each group visits Python once as an Arrow batch.
    State is bounded by the largest single group — at 100 TB, guard
    against skewed keys (pre-aggregate or salt) before this boundary."""
    o = t(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    return o.groupBy("o_custkey").applyInPandas(
        _cust_stats, schema="o_custkey bigint, n_orders bigint, price_spread double"
    )


_UDTF_CHUNK = 16


@F.udtf(returnType="chunk_idx int, chunk_text string, n_words int")
class _WordChunkUDTF:
    """Python UDTF: split a document into fixed 16-word chunks.

    Semantically a non-overlapping cousin of text_chunk's JVM-side
    sliding windows — it exists to pin Spark 4's Python UDTF machinery
    (register → LATERAL correlate → multi-row/multi-column yield)
    against a relational oracle, not to replace the built-in form.
    """

    def eval(self, text: str):  # noqa: D102 — interface method
        if text is None:
            return
        words = [w for w in text.split(" ") if w]
        for i in range(0, (len(words) + _UDTF_CHUNK - 1) // _UDTF_CHUNK):
            chunk = words[i * _UDTF_CHUNK : (i + 1) * _UDTF_CHUNK]
            yield i, " ".join(chunk), len(chunk)


@query(
    "udtf_word_chunks",
    # DuckDB rebuilds the same chunks relationally: words array →
    # correlated range() over the chunk count → 1-based list slice.
    oracle=f"""
        WITH w AS (
            SELECT doc_id,
                   list_filter(string_split(text, ' '), x -> x <> '') AS ws
            FROM documents
        ),
        e AS (
            SELECT doc_id, ws,
                   unnest(range(0, CAST(ceil(len(ws) / {_UDTF_CHUNK}.0)
                                        AS BIGINT))) AS idx
            FROM w
        )
        SELECT doc_id,
               CAST(idx AS INTEGER) AS chunk_idx,
               array_to_string(
                   ws[idx * {_UDTF_CHUNK} + 1 : (idx + 1) * {_UDTF_CHUNK}], ' '
               ) AS chunk_text,
               CAST(least({_UDTF_CHUNK}, len(ws) - idx * {_UDTF_CHUNK})
                    AS INTEGER) AS n_words
        FROM e
    """,
    tags=("udf", "udtf"),
)
def udtf_word_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.11 completion: a REAL Python UDTF (table function) — one
    input row yields many output rows with a typed multi-column
    schema — registered and consumed through SQL ``LATERAL``, the
    UDTF's native call form.

    Policy note: the UDTF API is row-at-a-time by design, so this is a
    demonstrator of the API surface, not a hot-path pattern — the
    production form of this exact computation is text_chunk's in-scan
    ``sequence``/``slice``/``explode`` (JVM-side, zero Python). When a
    UDTF is genuinely needed at scale (logic only expressible in
    Python), enable Arrow transport
    (``spark.sql.execution.pythonUDTF.arrow.enabled``) so batches
    cross the boundary columnar instead of pickled row-by-row."""
    spark.udtf.register("tde_word_chunks", _WordChunkUDTF)
    t(spark, sf_dir, "documents").createOrReplaceTempView("udtf_docs")
    return spark.sql(
        """
        SELECT d.doc_id, c.chunk_idx, c.chunk_text, c.n_words
        FROM udtf_docs d, LATERAL tde_word_chunks(d.text) c
        """
    )


_EWMA_ALPHA = 0.3

# pandas ewm(adjust=False) does NOT evaluate the textbook
# y = α·x + (1−α)·y. Its C kernel (pandas 2.x aggregations.pyx)
# computes the NORMALIZED form (old_wt·prev + new_wt·x) /
# (old_wt + new_wt), old_wt = 1−α — one ulp off the textbook form —
# AND skips the update entirely when prev == cur ("avoid numerical
# errors on constant series"), so a constant run stays bit-constant.
# The oracle steps the same guarded normalized form with repr-exact
# float literals, making both engines bit-identical BEFORE the 6-dp
# rounding (property-tested over random inputs incl. constant runs in
# tests/test_properties.py) instead of relying on rounding to absorb
# an ulp gap at a .5e-6 boundary.
_EWMA_OW = 1 - _EWMA_ALPHA

_EWMA_ORACLE = f"""
    WITH RECURSIVE e AS (
        SELECT user_id, value,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn
        FROM events
    ),
    r AS (
        SELECT user_id, rn, value AS ewma FROM e WHERE rn = 1
        UNION ALL
        SELECT e.user_id, e.rn,
               CASE WHEN r.ewma = e.value THEN r.ewma
                    ELSE ({_EWMA_OW!r} * r.ewma + {_EWMA_ALPHA!r} * e.value)
                         / ({_EWMA_OW!r} + {_EWMA_ALPHA!r}) END
        FROM e JOIN r ON e.user_id = r.user_id AND e.rn = r.rn + 1
    )
    SELECT CAST(user_id AS BIGINT) AS user_id,
           CAST(rn AS BIGINT) AS rn,
           CAST(floor(ewma * 1e6 + 0.5) AS BIGINT) AS ewma_micros
    FROM r
"""


def _ewma_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
    """One call per USER BUCKET, not per user: sort the bucket once,
    then pandas' grouped ewm runs the recurrence for every user in the
    bucket in one vectorized pass. Grouping by a bucket of ~dozens of
    users instead of by user_id cuts the Python-call count (and its
    ~2 ms/call Arrow round-trip floor) by the bucket factor — measured
    3.4 s → sub-second at sf0.1 for the same output."""
    pdf = pdf.sort_values(["user_id", "ts", "event_id"]).reset_index(drop=True)
    g = pdf.groupby("user_id", sort=False)
    # transform keeps the result aligned to pdf's row order (apply
    # would return a per-group MultiIndex needing careful flattening).
    ewma = g["value"].transform(
        lambda s: s.astype("float64").ewm(alpha=_EWMA_ALPHA, adjust=False).mean()
    )
    # NO rounding here — the caller quantizes to integer micros.
    # (Three round(…, 6) implementations were tried and all disagree
    # on this op's boundary-dense values: pandas .round is half-EVEN,
    # Spark F.round rounds the shortest-decimal repr half-up, DuckDB
    # rounds the scaled binary — at sf0.1, rn=6 values land EXACTLY on
    # .5e-6 decimal boundaries, where the three modes split 19 ways.)
    return pd.DataFrame(
        {
            "user_id": pdf["user_id"],
            "rn": g.cumcount().add(1),
            "ewma": ewma,
        }
    )


@query("udaf_ewma_timeseries", oracle=_EWMA_ORACLE, tags=("udf", "timeseries"))
def udaf_ewma_timeseries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-sensitive grouped sequential computation: per-user EWMA
    (α=0.3) over the event stream — the recurrence y_i = α·x_i +
    (1−α)·y_{i−1} that no window frame expresses (every output depends
    on the ENTIRE prefix through a multiplicative chain). One shuffle
    on a USER BUCKET key (xxhash64 mod 64 — every user's history lands
    wholly in one bucket, so the recurrence is intact), then each
    bucket visits Python once and pandas' grouped ``ewm(adjust=False)``
    evaluates the exact recurrence for all of the bucket's users in
    one vectorized pass — bucketing exists because the Arrow
    round-trip has a per-CALL floor that per-user grouping pays 1500×
    at sf0.1 (measured 3.4 s; bucketed, sub-second). The DuckDB oracle
    steps the same recurrence via a recursive CTE in the same
    (ts, event_id) order — float64 operations in identical sequence on
    both engines, so the integer micro-unit quantization (see the
    floor note below; round(…,6) is engine-divergent on this op's
    boundary-dense values) hash-matches exactly. State is
    bounded by the largest single bucket; at 100 TB raise the bucket
    count with user cardinality (buckets ≈ users/50) and split
    multi-year histories at watermark boundaries, chaining the
    carry-in y."""
    ev = t(spark, sf_dir, "events", spread=True).select(
        "user_id", "ts", "event_id", "value"
    )
    bucket = F.pmod(F.xxhash64("user_id"), F.lit(64)).alias("bucket")
    return (
        ev.withColumn("bucket", bucket)
        .groupBy("bucket")
        .applyInPandas(
            lambda pdf: _ewma_bucket(pdf.drop(columns=["bucket"])),
            schema="user_id bigint, rn bigint, ewma double",
        )
        # Quantize to integer MICRO-UNITS with floor(v·1e6 + 0.5):
        # both engines run the IDENTICAL double multiply/add/floor on
        # the bit-identical recurrence value, and the integer output
        # has no decimal-repr ambiguity — round(…, 6)'s three
        # implementations (pandas half-even, Spark shortest-repr
        # half-up, DuckDB scaled-binary) all disagree on this op's
        # boundary-dense values (19 exact .5e-6 splits at sf0.1).
        .withColumn(
            "ewma_micros",
            F.floor(F.col("ewma") * F.lit(1e6) + F.lit(0.5)).cast("long"),
        )
        .drop("ewma")
    )


_ASOF_TOL_US = 2 * 3600 * 1_000_000  # 2-hour match tolerance

_COGROUP_ORACLE = f"""
    WITH p AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts
               FROM events WHERE event_type = 'purchase'),
         c AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts
               FROM events WHERE event_type = 'click'),
         m AS (SELECT p.user_id, p.ts AS p_ts, c.ts AS c_ts
               FROM p ASOF LEFT JOIN c
                 ON p.user_id = c.user_id AND c.ts <= p.ts)
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_purchases,
           CAST(count(*) FILTER (c_ts IS NOT NULL
                AND epoch_us(p_ts) - epoch_us(c_ts) <= {_ASOF_TOL_US}) AS BIGINT)
               AS n_matched,
           CAST(coalesce(sum(epoch_us(p_ts) - epoch_us(c_ts))
                FILTER (c_ts IS NOT NULL
                        AND epoch_us(p_ts) - epoch_us(c_ts) <= {_ASOF_TOL_US}), 0)
               AS BIGINT) AS gap_sum_micros
    FROM m GROUP BY user_id
"""


def _micros(s: pd.Series) -> pd.Series:
    """Timestamp series → int64 microseconds, robust to pandas
    materializing Arrow timestamp[us] as either datetime64[us] or
    datetime64[ns] (the us→ns→us round-trip is exact for this range)."""
    return s.astype("datetime64[us]").astype("int64")


def _cogroup_asof_bucket(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
    """One call per user BUCKET (EWMA lesson: per-user calls pay the
    ~2 ms Arrow round-trip floor per user; per-bucket pays it per
    bucket and `merge_asof(by=...)` vectorizes the per-user as-of
    inside). Purchases and clicks arrive co-partitioned on the bucket
    key — THE cogroup contract: both sides shuffled with the same
    partitioner, so each Python call sees every row for its users from
    both relations and nothing else."""
    out_cols = ("user_id", "n_purchases", "n_matched", "gap_sum_micros")
    if left.empty:
        return pd.DataFrame({c: pd.Series(dtype="int64") for c in out_cols})
    left = left.sort_values("ts", kind="mergesort").reset_index(drop=True)
    if right.empty:
        merged = left.assign(c_ts=pd.NaT)
    else:
        right = right.rename(columns={"ts": "c_ts"}).sort_values(
            "c_ts", kind="mergesort"
        ).reset_index(drop=True)
        merged = pd.merge_asof(
            left, right, left_on="ts", right_on="c_ts",
            by="user_id", direction="backward", allow_exact_matches=True,
        )
    has_match = merged["c_ts"].notna()
    gap = pd.Series(0, index=merged.index, dtype="int64")
    gap[has_match] = _micros(merged.loc[has_match, "ts"]) - _micros(
        merged.loc[has_match, "c_ts"]
    )
    matched = has_match & (gap <= _ASOF_TOL_US)
    merged["is_matched"] = matched.astype("int64")
    merged["gap_in_tol"] = gap.where(matched, 0)
    g = merged.groupby("user_id", sort=False)
    res = pd.DataFrame(
        {
            "n_purchases": g.size().astype("int64"),
            "n_matched": g["is_matched"].sum().astype("int64"),
            "gap_sum_micros": g["gap_in_tol"].sum().astype("int64"),
        }
    ).reset_index()
    return res[list(out_cols)]


@query("udaf_cogroup_asof", oracle=_COGROUP_ORACLE, tags=("udf", "cogroup", "asof"))
def udaf_cogroup_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cogrouped ``applyInPandas`` — the two-sided Arrow surface
    (``df.groupBy(k).cogroup(other.groupBy(k)).applyInPandas``) the
    suite's other UDF entries don't touch: BOTH relations shuffle with
    the same partitioner and each Python call receives the aligned
    (left, right) group pair. The demonstration is the canonical
    cogroup workload — per-user point-in-time merge (``pd.merge_asof``)
    of two event streams: for every purchase, the latest click at or
    before it, matched when the gap is within 2 h, rolled up per user.
    The grouping key is a 32-way user bucket, not user_id (every user
    still lands wholly in one bucket on both sides, so per-user
    semantics are intact; `merge_asof(by="user_id")` vectorizes inside
    the bucket — the EWMA per-call-floor lesson applied to the
    two-sided case). The output carries timestamp GAPS, not joined
    values, so duplicate-timestamp ties cannot make the result
    engine-dependent: whichever equal-ts click wins the as-of, the gap
    is identical. All outputs are exact BIGINT microsecond arithmetic —
    no floats anywhere. The DuckDB oracle is a genuine ASOF LEFT JOIN
    with the same tolerance as a post-filter. Scale: two co-partitioned
    shuffles (one per side) on the bucket key and O(n log n) per-bucket
    sorts in pandas; state is bounded by the largest bucket — raise the
    bucket count with user cardinality at 100 TB, same policy as the
    EWMA op. Union-window expresses backward as-of without Python
    (operators/asof.py); this entry exists because tolerance + by-key
    merge + per-key rollup in ONE pass is where cogroup earns its
    shuffle, and the API itself is part of SURVEY §2.11's surface."""
    ev = t(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    bucket = F.pmod(F.xxhash64("user_id"), F.lit(32))
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id", "ts")
        .withColumn("bucket", bucket)
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .select("user_id", "ts")
        .withColumn("bucket", bucket)
    )
    return (
        p.groupBy("bucket")
        .cogroup(c.groupBy("bucket"))
        .applyInPandas(
            lambda left, right: _cogroup_asof_bucket(
                left.drop(columns=["bucket"]), right.drop(columns=["bucket"])
            ),
            schema="user_id bigint, n_purchases bigint, n_matched bigint, gap_sum_micros bigint",
        )
    )


_NORM_SCALE = 1e12  # per-element square quantization (values are |x| < 1)

_ARROW_NORM_ORACLE = """
    SELECT vec_id,
           CAST(len(embedding) AS INTEGER) AS n_dims,
           CAST(list_sum(list_transform(embedding,
                x -> CAST(floor(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) * 1e12 + 0.5)
                          AS BIGINT))) AS BIGINT) AS norm_q
    FROM embeddings
"""


def _arrow_norm_batches(batches):
    """Iterator[pyarrow.RecordBatch] → Iterator[pyarrow.RecordBatch]:
    zero pandas — list offsets and the flat float32 buffer are read
    directly, squared in float64, quantized to integer units, and
    segment-summed. Per-element quantization BEFORE the sum makes the
    reduction exact integer arithmetic, so numpy's segment sum and
    DuckDB's list fold cannot disagree on float addition order."""
    import numpy as np
    import pyarrow as pa

    for batch in batches:
        emb = batch.column(batch.schema.get_field_index("embedding"))
        if isinstance(emb, pa.ChunkedArray):  # defensive; batches are flat
            emb = emb.combine_chunks()
        offsets = emb.offsets.to_numpy().astype("int64")
        flat = emb.values.to_numpy(zero_copy_only=False).astype("float64")
        q = np.floor(flat * flat * _NORM_SCALE + 0.5).astype("int64")
        # ListArray offsets may start past 0 (sliced batches). reduceat
        # cannot take a start index == len(values) (raised by a trailing
        # empty list, or by index 0 when EVERY list is empty), and its
        # result at an interior empty list is the NEXT element rather
        # than an empty sum — so mask empty lists out before reduceat
        # and scatter the segment sums back over a zero base. Dropping
        # an empty list's start is lossless: its two offsets are equal,
        # so the surviving consecutive starts still delimit exactly the
        # non-empty segments.
        starts = offsets[:-1]
        nonempty = starts < offsets[1:]
        sums = np.zeros(len(starts), dtype="int64")
        if nonempty.any():
            sums[nonempty] = np.add.reduceat(q, starts[nonempty])
        yield pa.RecordBatch.from_arrays(
            [
                batch.column(batch.schema.get_field_index("vec_id")),
                pa.array((offsets[1:] - offsets[:-1]).astype("int32")),
                pa.array(sums),
            ],
            names=["vec_id", "n_dims", "norm_q"],
        )


@query("udf_map_in_arrow", oracle=_ARROW_NORM_ORACLE, tags=("udf", "arrow"))
def udf_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``mapInArrow`` — the RecordBatch-level Arrow surface (§2.11's
    last uncovered entry point): no pandas materialization at all, the
    Python side reads the list offsets and the flat float32 value
    buffer as numpy views and emits a new RecordBatch. The workload is
    the embedding-norm pass an ANN/quantization pipeline runs before
    indexing. Exactness: each squared element is quantized to integer
    units (floor(x²·1e12 + 0.5), identical IEEE double ops on both
    engines) BEFORE summation, so the per-row reduction is exact
    BIGINT arithmetic — numpy's pairwise/segment summation and
    DuckDB's sequential list fold cannot diverge the way raw float
    sums would. Scale: embarrassingly parallel, zero shuffle, Arrow
    batch memory bounds the footprint; this is the shape to drop
    tokenizers or ONNX feature extractors into when pandas conversion
    overhead matters (mapInPandas pays the to-pandas copy; mapInArrow
    does not)."""
    emb = t(spark, sf_dir, "embeddings", spread=True).select("vec_id", "embedding")
    return emb.mapInArrow(
        _arrow_norm_batches, schema="vec_id long, n_dims int, norm_q long"
    )


_ARROW_UDTF_ORACLE = """
    WITH toks AS (
        SELECT doc_id, t AS tok
        FROM documents, unnest(string_split(text, ' ')) AS u(t)
        WHERE t <> ''
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(count(*) FILTER (WHERE length(tok) >= 8) AS BIGINT) AS n_long,
           CAST(sum(length(tok)) AS BIGINT) AS chars_total
    FROM toks
    GROUP BY doc_id
"""


@query("udtf_arrow_tokens", oracle=_ARROW_UDTF_ORACLE, tags=("udf", "udtf", "arrow"))
def udtf_arrow_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U9: the ARROW-OPTIMIZED Python UDTF (Spark 4 ``@udtf(useArrow=
    True)``) — same table-function semantics as the row-at-a-time
    udtf_word_chunks, but rows cross the Python boundary in Arrow
    batches, removing the per-row pickle round-trip that docstring
    flags as the scale caveat. The UDTF splits on single spaces
    (mirroring DuckDB's string_split exactly, empty fragments dropped
    on both sides) and the lateral output is re-aggregated per doc so
    the checked result is atomic-typed."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="tok string", useArrow=True)
    class SpaceTokens:
        def eval(self, text: str):
            if text:
                for w in text.split(" "):
                    if w:
                        yield (w,)

    spark.udtf.register("space_tokens_arrow", SpaceTokens)
    t(spark, sf_dir, "documents").createOrReplaceTempView("udtfa_docs")
    return spark.sql(
        """
        SELECT doc_id,
               count(*) AS n_tokens,
               sum(CASE WHEN length(tok) >= 8 THEN 1 ELSE 0 END) AS n_long,
               sum(length(tok)) AS chars_total
        FROM udtfa_docs, LATERAL space_tokens_arrow(text) AS s
        GROUP BY doc_id
        """
    )
