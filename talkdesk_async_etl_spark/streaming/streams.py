"""Structured Streaming profile (SURVEY.md §2.9 T1-T5).

Re-exposes the batch twins' window expressions over ``readStream``:
the SAME groupBy/window/session_window plans, plus the
streaming-only pieces — watermarks (T4), streaming dedup (T5), and a
``foreachBatch`` sink that reuses the batch parquet writers.

Tests drive these with a file-source replay of the events table and
``processAllAvailable()`` (synchronous batch-to-stream smoke), the
standard local harness for streaming plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from talkdesk_async_etl_spark.sources.io import table_path

# The events parquet has shipped with BOTH timestamp physical types
# across testdata generations: TIMESTAMP(NANOS) (arrives as epoch-nanos
# longs under the session's nanosAsLong setting and needs a div-1000
# truncation) and plain TIMESTAMP(MICROS) (arrives as a real timestamp,
# no conversion). The streaming source must declare its schema up
# front, so it probes the file's decoded type with a batch read first —
# hardcoding the nanos variant silently shifted every MICROS event to
# 1970 (ts/1000) and the watermark never closed a window.
_EVENTS_DDL_TS_LONG = (
    "event_id BIGINT, ts BIGINT, user_id BIGINT, event_type STRING, "
    "value DOUBLE, props STRING"
)
_EVENTS_DDL_TS_TIMESTAMP = (
    "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, "
    "value DOUBLE, props STRING"
)


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source replay of the events table. The file source monitors
    a DIRECTORY (new files appear → new micro-batches); the glob filter
    selects the events file within the testdata dir. The ts physical
    type is probed batch-side (footer-only — no job) so the declared
    stream schema matches whichever generation of the fixture is on
    disk."""
    from pyspark.sql import types as T

    # The probe needs nanosAsLong (a NANOS file is otherwise rejected
    # outright). Save/restore the conf around it so a MICROS-generation
    # probe doesn't leak a session-wide setting that would silently
    # turn nanos timestamps into longs in unrelated batch reads. When
    # the file IS nanos the conf must stay set — the streaming source
    # re-reads the files at every micro-batch under the same session —
    # so the restore only happens on the MICROS path (and on probe
    # failure).
    _CONF = "spark.sql.legacy.parquet.nanosAsLong"
    try:
        prev = spark.conf.get(_CONF)
    except Exception:  # noqa: BLE001 — unset conf raises in Spark 4
        prev = None
    spark.conf.set(_CONF, "true")
    ts_is_long = True
    try:
        ts_type = spark.read.parquet(table_path(sf_dir, "events")).schema["ts"].dataType
        ts_is_long = isinstance(ts_type, T.LongType)
    finally:
        if not ts_is_long:
            if prev is None:
                spark.conf.unset(_CONF)
            else:
                spark.conf.set(_CONF, prev)
    raw = (
        spark.readStream.schema(_EVENTS_DDL_TS_LONG if ts_is_long else _EVENTS_DDL_TS_TIMESTAMP)
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    if ts_is_long:
        raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return raw


def tumbling_counts(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """T1+T4: tumbling 1 h window with late-data watermark. State for a
    window is dropped once the watermark passes its end — bounded state
    at any scale; late events beyond the watermark are dropped."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "total_value")
    )


def sliding_counts(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """T2: sliding 1 h / 15 min window."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events")
    )


def session_counts(events: DataFrame, gap: str = "30 minutes", watermark: str = "10 minutes") -> DataFrame:
    """T3: session windows per user (same expression as the batch twin)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def dedup_stream(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """T5: stateful streaming dedup on event_id.
    ``dropDuplicatesWithinWatermark`` bounds state to the watermark
    horizon (plain dropDuplicates would hold every id forever)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(["event_id"])


def running_user_totals(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: a
    per-user running aggregate (event count + value total) that emits an
    updated row per micro-batch — the pattern for stateful logic the
    built-in windowed aggregations can't express (counters, sessionized
    ML features, CDC-style accumulators).

    State is one small tuple per user, explicitly managed with a TTL via
    the watermark — bounded regardless of stream length. Arrives in
    Python as Arrow batches (one group per call), never row-at-a-time."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        import pandas as pd

        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 2)]}
        )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType="user_id bigint, n_events bigint, total_value double",
            stateStructType="n bigint, total double",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def funnel_state(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: per-user
    view→purchase funnel tracking — first view timestamp, first purchase
    timestamp, whether the user converted (first purchase at/after first
    view), and the conversion latency.

    The state is deliberately ORDER-INDEPENDENT: two running minimums
    (epoch-micros of the earliest view / earliest purchase), with
    ``converted``/``latency_us`` DERIVED from them at emission time.
    Micro-batches can replay events in any arrival order — a purchase
    can arrive before the view that precedes it in event time — and two
    mins still converge to the same final answer, so the stream provably
    agrees with the batch twin (``stream_funnel_state``) once all input
    is processed. A formulation that tracked "first purchase AFTER the
    current first view" online would need unbounded purchase history to
    stay correct under out-of-order arrival.

    State is two int64s per user — bounded regardless of stream length.
    ``n_seen`` counts events folded into the state so the latest
    update-mode emission per user is identifiable downstream."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        fv, fp, n = state.get if state.exists else (None, None, 0)
        for pdf in pdfs:
            n += len(pdf)
            micros = pdf["ts"].astype("int64") // 1000  # pandas ns → us
            views = micros[pdf["event_type"] == "view"]
            purchases = micros[pdf["event_type"] == "purchase"]
            if len(views):
                m = int(views.min())
                fv = m if fv is None else min(fv, m)
            if len(purchases):
                m = int(purchases.min())
                fp = m if fp is None else min(fp, m)
        state.update((fv, fp, n))
        converted = fv is not None and fp is not None and fp >= fv
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "first_view_us": [fv],
                "first_purchase_us": [fp],
                "converted": [converted],
                "latency_us": [fp - fv if converted else None],
                "n_seen": [n],
            }
        )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=(
                "user_id bigint, first_view_us bigint, first_purchase_us bigint, "
                "converted boolean, latency_us bigint, n_seen bigint"
            ),
            stateStructType="fv bigint, fp bigint, n bigint",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def run_to_memory_sink(stream_df: DataFrame, name: str, output_mode: str = "append"):
    """Drive a streaming plan to completion against the current files
    (tests/smoke): memory sink + processAllAvailable."""
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    q.processAllAvailable()
    return q


def foreach_batch_parquet(stream_df: DataFrame, out_path: str, checkpoint: str):
    """Exactly-once parquet sink: each micro-batch overwrites its OWN
    epoch directory (``{out}/epoch=<id>``), so a replayed epoch — the
    failure mode of foreachBatch, which is at-least-once by contract —
    rewrites the same files instead of appending duplicates. Combined
    with the checkpoint's offset log (epoch ids are stable across
    restarts), idempotent-per-epoch writes upgrade at-least-once to
    effectively-once; the layout doubles as hive partitioning, so
    readers see an ``epoch`` column for free and a 100 TB consumer can
    prune to the epochs newer than its last sync.
    ``partitionOverwriteMode=dynamic`` scopes each overwrite to the one
    epoch directory being (re)written — a static overwrite would
    truncate every previously committed epoch."""

    def write_epoch(df: DataFrame, epoch_id: int) -> None:
        (
            df.withColumn("epoch", F.lit(epoch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("epoch")
            .parquet(out_path)
        )

    return (
        stream_df.writeStream.foreachBatch(write_epoch)
        .option("checkpointLocation", checkpoint)
        .start()
    )


_INTERVAL_UNITS = {
    "second": 1, "seconds": 1, "minute": 60, "minutes": 60,
    "hour": 3600, "hours": 3600, "day": 86400, "days": 86400,
}


def _interval_seconds(spec: str) -> int | None:
    """Parse simple ``'N unit'`` interval strings; None when the form
    isn't recognized (compound intervals — caller is on their own)."""
    parts = spec.strip().lower().split()
    if len(parts) == 2 and parts[0].isdigit() and parts[1] in _INTERVAL_UNITS:
        return int(parts[0]) * _INTERVAL_UNITS[parts[1]]
    return None


def purchases_with_prior_views(
    events: DataFrame, *, lookback: str = "1 hour", watermark: str | None = None
) -> DataFrame:
    """Stream-stream interval join (the streaming twin of the batch
    ``join_range`` operator): each purchase joins views by the same
    user from the preceding ``lookback`` interval.

    Both sides carry watermarks and the join condition bounds the view
    timestamp to [purchase - lookback, purchase], so the state store
    can evict a buffered view once the watermark passes its horizon —
    bounded state on an unbounded stream. An unconstrained stream-
    stream join would buffer forever; the time bound is what makes
    this runnable at scale.

    ``lookback``/``watermark`` are keyword-only: an earlier revision
    took ``watermark`` as the second positional, so a positional caller
    would now silently narrow the join interval itself instead of just
    the watermark — the signature forces call sites to say which they
    mean. The watermark defaults to the lookback; a caller-supplied
    watermark SHORTER than the lookback is rejected as a conservative
    guard (Spark derives stream-stream join state retention from the
    join condition itself, so this is belt-and-suspenders against
    configurations whose intent is ambiguous, not a strict correctness
    requirement)."""
    wm = watermark if watermark is not None else lookback
    wm_s, lb_s = _interval_seconds(wm), _interval_seconds(lookback)
    if wm_s is not None and lb_s is not None and wm_s < lb_s:
        raise ValueError(
            f"watermark {wm!r} is shorter than the join lookback {lookback!r}: "
            "buffered rows would be evicted before the interval closes"
        )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("p_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", wm)
    )
    views = (
        events.filter(F.col("event_type") == "view")
        .select(
            F.col("event_id").alias("v_id"),
            F.col("user_id").alias("v_user"),
            F.col("ts").alias("v_ts"),
        )
        .withWatermark("v_ts", wm)
    )
    return purchases.join(
        views,
        (F.col("p_user") == F.col("v_user"))
        & (F.col("v_ts") >= F.col("p_ts") - F.expr(f"INTERVAL {lookback}"))
        & (F.col("v_ts") <= F.col("p_ts")),
        "leftOuter",
    ).select("p_id", "p_user", "p_ts", "v_id", "v_ts")


def running_user_totals_tws(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """The same per-user running aggregate as ``running_user_totals``,
    on Spark 4's ``transformWithStateInPandas`` — the successor state
    API to ``applyInPandasWithState``. What the new API buys at scale:
    named state variables with per-variable TTLs (value/list/map state)
    instead of one packed tuple, timers decoupled from data arrival,
    and schema evolution of state across restarts. Keeping BOTH forms
    demonstrates the migration path; the batch-equivalence test pins
    that they converge to the identical groupBy answer.

    ENVIRONMENT NOTE (verified): the TWS state-server protocol speaks
    protobuf from the Python side
    (pyspark/sql/streaming/proto/StateMessage_pb2.py imports
    google.protobuf at runtime), so executing this requires the
    ``protobuf`` package. This container ships pyspark WITHOUT
    protobuf and installs are unavailable, so the query fails with
    STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE /
    ``ImportError: No module named 'google'`` — the equivalence test
    skips with that reason where protobuf is absent and runs
    everywhere else. The applyInPandasWithState form above has no
    such dependency and is the attested path here."""
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class _RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._tot = handle.getValueState("tot", "n bigint, total double")

        def handleInputRows(self, key, rows, timerValues):
            n, total = self._tot.get() if self._tot.exists() else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._tot.update((n, total))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_value": [round(total, 2)],
                }
            )

        def close(self) -> None:
            pass

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=_RunningTotals(),
            outputStructType="user_id bigint, n_events bigint, total_value double",
            outputMode="Update",
            timeMode="None",
        )
    )


def scd2_stream(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Watermark-FINALIZED streaming SCD2 build — the order-SENSITIVE
    custom stateful operator the rest of this module deliberately
    avoids (running totals and the funnel are order-independent by
    design; SCD2 is not: each change closes the PREVIOUS version, so
    processing order is part of the answer).

    The correctness argument: an event may only become a version
    boundary once no earlier-timestamped event can still arrive. The
    watermark is exactly that guarantee, so per user the state holds
    (a) the currently OPEN version and (b) a PENDING buffer of events
    with ts >= watermark, and each micro-batch: merges new arrivals
    into the buffer (self-dropping anything already older than the
    watermark — defense in depth beside the engine's own late-row
    filtering), then drains the buffer in (ts, event_id) order up to
    the current watermark, emitting a CLOSED version row whenever the
    tracked attribute changes. Same-value runs collapse exactly as in
    the batch twin (``cdc_scd2_build``). Emissions are append-only
    finalized facts — nothing is ever retracted — so any downstream
    sink (parquet append, Kafka) consumes them safely.

    State is bounded by the watermark horizon: the pending buffer
    holds at most one user's events from the last ``watermark``
    interval, and the open version is three scalars. At cluster scale
    the operator shuffles once on user_id (the groupBy), identical to
    the batch build's single exchange.

    Liveness: the pending buffer drains on WATERMARK ADVANCE, not on
    per-key traffic — whenever a key holds buffered events, an
    event-time timer is set at the earliest pending timestamp, so the
    key is re-invoked (``state.hasTimedOut``, empty batch iterator) as
    soon as the global watermark passes it, even if that user never
    sends another event (ADVICE r9: under NoTimeout a silent user's
    finalized versions were stuck until its next arrival). The one
    residual condition is inherent to event-time processing: if the
    WHOLE stream stops, the watermark freezes and nothing finalizes.

    Batch equivalence (pinned in test_streaming): the emitted closed
    versions equal the batch twin's ``is_current = false`` rows over
    the finalized region — byte-identical valid_from/valid_to/attr,
    including timestamp-tie resolution by event_id. The test's
    watermark-pushing traffic is single-user, so the other user's
    closures attest the timer path."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        if state.exists:
            open_attr, open_from, p_ts, p_eid, p_attr = state.get
            pend = list(zip(p_ts or [], p_eid or [], p_attr or []))
        else:
            open_attr, open_from, pend = None, None, []
        wm_ms = state.getCurrentWatermarkMs()
        wm_us = wm_ms * 1000
        for pdf in pdfs:
            micros = pdf["ts"].astype("int64") // 1000  # pandas ns -> us
            for ts_us, eid, attr in zip(micros, pdf["event_id"], pdf["event_type"]):
                if int(ts_us) >= wm_us or wm_us == 0:
                    pend.append((int(ts_us), int(eid), str(attr)))
        pend.sort()
        closed = []
        keep = []
        for ts_us, eid, attr in pend:
            if ts_us >= wm_us:
                keep.append((ts_us, eid, attr))
                continue
            # finalized event: apply the change-collapse rule
            if open_attr is None:
                open_attr, open_from = attr, ts_us
            elif attr != open_attr:
                closed.append((open_attr, open_from, ts_us))
                open_attr, open_from = attr, ts_us
        state.update(
            (
                open_attr,
                open_from,
                [t for t, _, _ in keep],
                [e for _, e, _ in keep],
                [a for _, _, a in keep],
            )
        )
        if keep:
            # Re-arm every invocation (timers clear on each call): fire
            # when the watermark passes the earliest pending event.
            # Event-time timers must sit strictly beyond the current
            # watermark, hence the wm_ms + 1 floor.
            state.setTimeoutTimestamp(max(keep[0][0] // 1000, wm_ms + 1))
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [key[0]] * len(closed),
                    "attr": [a for a, _, _ in closed],
                    "valid_from_us": [f for _, f, _ in closed],
                    "valid_to_us": [t for _, _, t in closed],
                }
            )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType="user_id bigint, attr string, "
            "valid_from_us bigint, valid_to_us bigint",
            stateStructType="open_attr string, open_from bigint, "
            "pend_ts array<bigint>, pend_eid array<bigint>, "
            "pend_attr array<string>",
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def cdc_upsert_stream(
    cdc_df: DataFrame, store_path: str, checkpoint: str, n_buckets: int = 16
):
    """Streaming CDC APPLY — the live side of the S7 merge-on-read
    family (batch twins: ``cdc_latest_wins`` read semantics,
    ``cdc_tombstone_deletes`` precedence): a stream of
    ``(key, status, version, op)`` change rows maintains a keyed
    parquet STORE via foreachBatch, latest version wins, tombstones
    (op='D') kept in the store and hidden by :func:`read_cdc_store` so
    a later re-insert revives the key — the reference's Delta
    MERGE-on-write (DB:245-253) re-expressed without delta jars.

    Bucketed-rewrite shape: the store partitions by ``key % n_buckets``
    and each epoch rewrites ONLY the buckets its batch touches
    (dynamic partition overwrite) — the merge-on-read compaction story
    at any scale: epoch cost follows the batch's key spread, never the
    store size. The rewrite is idempotent under epoch replay (the
    at-least-once window foreachBatch leaves): re-merging rows that
    already won changes nothing, so a crash between sink write and
    commit re-produces byte-identical buckets on restart.

    Single-JVM caveat, documented not hidden: the merged bucket
    content is persisted and materialized BEFORE the overwrite job so
    the write never scans the files it is replacing; a production
    deployment writes each epoch to a fresh snapshot directory and
    swaps a manifest pointer instead (the lineage under this persist
    would re-read overwritten input if an executor died mid-write)."""
    from pyspark.sql import Window

    def apply_epoch(batch: DataFrame, epoch_id: int) -> None:
        if not batch.take(1):
            return
        spark = batch.sparkSession
        b = batch.withColumn("bucket", F.col("key") % n_buckets)
        # "First epoch" is decided by an explicit existence probe, not
        # by catching the read's exception: a transient read failure
        # (FS hiccup, corrupt footer, concurrent writer) on an EXISTING
        # store must fail the epoch — falling back to the batch alone
        # would let the dynamic overwrite silently destroy every prior
        # version and tombstone in the touched buckets (ADVICE r11).
        jvm_path = spark._jvm.org.apache.hadoop.fs.Path(store_path)
        fs = jvm_path.getFileSystem(
            spark._jsc.hadoopConfiguration()  # noqa: SLF001 - py4j handle
        )
        if fs.exists(jvm_path):
            store = spark.read.parquet(store_path)
            touched = [r["bucket"] for r in b.select("bucket").distinct().collect()]
            merged = store.filter(F.col("bucket").isin(touched)).unionByName(b)
        else:  # first epoch: no store yet
            merged = b
        w = Window.partitionBy("key").orderBy(F.col("version").desc())
        latest = (
            merged.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .drop("rn")
            .persist()
        )
        latest.count()  # materialize before overwriting the inputs
        try:
            (
                latest.write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("bucket")
                .parquet(store_path)
            )
        finally:
            latest.unpersist()

    return (
        cdc_df.writeStream.foreachBatch(apply_epoch)
        .option("checkpointLocation", checkpoint)
        .start()
    )


def read_cdc_store(spark: SparkSession, store_path: str) -> DataFrame:
    """Read the live keys of a :func:`cdc_upsert_stream` store —
    tombstones stay in the store (they must outrank older versions on
    replay) and are filtered at read, the merge-on-read contract."""
    return spark.read.parquet(store_path).filter(F.col("op") != "D")


def enrich_with_static_dim(
    events: DataFrame, dim: DataFrame, watermark: str = "10 minutes"
) -> DataFrame:
    """T9: STREAM-STATIC enrichment — the most common production
    streaming shape after windowed aggregation: a fact stream joined
    to a slowly-changing dimension snapshot (tier table, feature
    flags, routing rules). Spark plans the static side as a broadcast
    into every micro-batch, so the stream never shuffles and the join
    adds no state to the streaming query (unlike stream-stream joins,
    there is nothing to watermark on the static side; the watermark
    here only bounds the downstream aggregate).

    Returns per-(window, tier) event counts so the test's batch twin
    can check exact equality. At 100 TB/day the static side refreshes
    by restarting the query on a new snapshot — or graduating to a
    stream-stream join when the dimension churns intra-day."""
    enriched = events.withWatermark("ts", watermark).join(
        F.broadcast(dim), "event_type"
    )
    return (
        enriched.groupBy(F.window("ts", "1 hour").alias("w"), "tier")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "tier", "n_events")
    )
