"""Central query registry backing ``__spark_entry__.py``.

Every operator from SURVEY.md §2 registers here as a named query:
a PySpark callable ``(spark, sf_dir) -> DataFrame`` plus (when the
semantics are SQL-expressible) an equivalent ANSI-SQL oracle string
that DuckDB runs on the same parquet tables. The driver compares both
at sf=0.01 (row count + schema + order-insensitive value hash), so:

- every computed column is aliased identically in both formulations;
- float aggregates are rounded identically on both sides;
- DuckDB integer sums are cast to BIGINT (DuckDB widens to HUGEINT);
- every ranking/limit query carries a deterministic tie-break key.

Queries with genuinely non-SQL-expressible or nondeterministic parts
(approx sketches, LSH candidate generation, hash-seeded signatures)
register with ``oracle=None`` → the driver records a rows-only check.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None = None
    tags: tuple[str, ...] = field(default_factory=tuple)


QUERIES: dict[str, QuerySpec] = {}

# Modules that register queries on import.
_QUERY_MODULES = (
    "talkdesk_async_etl_spark.operators.relational",
    "talkdesk_async_etl_spark.operators.joins",
    "talkdesk_async_etl_spark.operators.aggregates",
    "talkdesk_async_etl_spark.operators.windows",
    "talkdesk_async_etl_spark.operators.scalars",
    "talkdesk_async_etl_spark.operators.asof",
    "talkdesk_async_etl_spark.operators.udfs",
    "talkdesk_async_etl_spark.operators.multimodal",
    "talkdesk_async_etl_spark.operators.dedup",
    "talkdesk_async_etl_spark.operators.dedup_clusters",
    "talkdesk_async_etl_spark.operators.similarity",
    "talkdesk_async_etl_spark.operators.text",
    "talkdesk_async_etl_spark.operators.text_quality",
    "talkdesk_async_etl_spark.operators.stats",
    "talkdesk_async_etl_spark.operators.sketches",
    "talkdesk_async_etl_spark.operators.graph",
    "talkdesk_async_etl_spark.operators.sampling",
    "talkdesk_async_etl_spark.operators.ingest",
    "talkdesk_async_etl_spark.operators.tpch",
    "talkdesk_async_etl_spark.operators.tpch_deep",
    "talkdesk_async_etl_spark.operators.engine_api",
    "talkdesk_async_etl_spark.operators.spatial",
    "talkdesk_async_etl_spark.operators.mining",
    "talkdesk_async_etl_spark.operators.curation",
    "talkdesk_async_etl_spark.streaming.batch_twins",
)


def query(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator: register ``fn`` as a named engine query."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query id: {name}")
        QUERIES[name] = QuerySpec(name=name, fn=fn, oracle=oracle, tags=tags)
        return fn

    return deco


# Driver-facing check order. The driver verifies exactly the first 50
# registered queries per round, so ordering is budget allocation.
# Round-15 window, in priority order (executes ROUND_NOTES' committed
# round-15 rotation pre-plan VERBATIM, per VERDICT r14 task 1):
#   1. The 19 round-14 additions that registered AFTER the r14 window
#      froze (judge-parity-verified 19/19 by the r14 judge's own
#      check_parity run but still without a formal driver CORRECTNESS
#      row), in registration order per the pre-plan.
#   2. The three remaining aging rows-only/twin pairs ADJACENT
#      (VERDICT r14 task-5 pattern): sim_topk_ivf/sim_ivf_recall,
#      sim_topk_pq/sim_pq_recall_ok,
#      multimodal_image_features/multimodal_features_ok — each
#      rows-only candidate generator re-attests in the same window
#      position block as its hash-attested recall/invariant twin.
#   3. The 25 oldest remaining r8-tier ids (alphabetical) fill the
#      remaining slots.  window_sessionize_gap and the r9+ tiers
#      rotate r16+ (r8 first).
# Any id registered but absent here appends in registration order, so
# new operators are never silently dropped — and the first-50
# meta-test in tests/test_driver_profile.py fails on typos/miscounts.
# Round-15 additions registered after THIS window freezes lead the
# r16 window per the standing precedent.
_PRIORITY = (
    # --- tier 1: the 19 round-14 ids without a formal driver row ---
    "events_markov_stationary",
    "window_streak_days",
    "join_range_bucket_equi",
    "join_interval_merge",
    "sim_silhouette_centroid",
    "text_heaps_law",
    "text_burstiness",
    "text_source_vocab_overlap",
    "agg_spearman_corr",
    "agg_contingency_residuals",
    "agg_weighted_percentile",
    "agg_log2_histogram",
    "agg_welch_ttest",
    "agg_runs_test",
    "agg_ab_power_mde",
    "graph_hits_scores",
    "sample_ab_allocation",
    "scan_jsonl_gzip",
    "pipeline_training_export_e2e",
    # --- tier 2: rows-only/twin pairs adjacent (VERDICT r14 task 5) ---
    "sim_topk_ivf",
    "sim_ivf_recall",
    "sim_topk_pq",
    "sim_pq_recall_ok",
    "multimodal_image_features",
    "multimodal_features_ok",
    # --- tier 3: the 25 oldest remaining r8-tier ids (alphabetical) ---
    "scalar_xml_roundtrip",
    "scan_python_datasource",
    "scan_transpose",
    "sink_jsonl_export_ok",
    "sql_execute_immediate",
    "sql_named_params",
    "sql_pipe_syntax",
    "sql_text_api",
    "sql_udf_scalar",
    "sql_udf_table",
    "text_feature_hashing",
    "text_segment_dedup",
    "text_vocab_oov",
    "tpch_q1",
    "tpch_q11",
    "tpch_q12",
    "tpch_q16",
    "tpch_q2",
    "tpch_q9",
    "udaf_apply_in_arrow",
    "udaf_cogroup_asof",
    "udf_map_in_arrow",
    "window_fill_forward",
    "window_match_pattern",
    "window_range_time",
)


def load_all() -> dict[str, QuerySpec]:
    """Import every operator module (idempotent) and return the
    registry ordered by driver-check priority."""
    for mod in _QUERY_MODULES:
        importlib.import_module(mod)
    ordered = {name: QUERIES[name] for name in _PRIORITY if name in QUERIES}
    for name, spec in QUERIES.items():
        ordered.setdefault(name, spec)
    return ordered
