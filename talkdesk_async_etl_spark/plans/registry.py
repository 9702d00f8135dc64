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
# Round-16 window, in priority order (executes the r15 window's own
# committed pre-plan — "Round-15 additions registered after THIS
# window freezes lead the r16 window", and "window_sessionize_gap and
# the r9+ tiers rotate r16+ (r8 first)"):
#   1. The 32 round-15 additions (waves A-F) — the only registered
#      ids with NO driver CORRECTNESS row in any round — in
#      registration order.
#   2. window_sessionize_gap (the last r8-latest id) + the 17 oldest
#      r9-latest ids (alphabetical) fill the remaining slots. No
#      rows-only id sits in this window, so CORRECTNESS_r16 can be
#      50/50 hash-green.
# Any id registered but absent here appends in registration order, so
# new operators are never silently dropped — and the first-50
# meta-test in tests/test_driver_profile.py fails on typos/miscounts.
# The r9-tier remainder and the r10 tier rotate r17+.
_PRIORITY = (
    # --- tier 1: the 32 round-15 additions without a driver row ---
    "window_conversion_latency",
    "events_funnel_steps",
    "dedup_levenshtein_verify",
    "text_zipf_slope",
    "text_tv_distance_sources",
    "text_hapax_share",
    "text_length_quartiles",
    "sample_kfold_assign",
    "sample_negative_pairs",
    "events_ols_trend",
    "agg_ab_cuped",
    "events_wow_change",
    "agg_kendall_tau",
    "events_changepoint_binary",
    "events_ewma_smooth",
    "events_seasonal_decompose",
    "agg_hhi_concentration",
    "events_seasonality_strength",
    "events_user_churn_weekly",
    "events_hour_profile",
    "graph_adamic_adar",
    "graph_jaccard_link_pred",
    "graph_two_hop_reach",
    "ml_eval_pr_curve",
    "ml_eval_roc_auc",
    "ml_calibration_bins",
    "agg_assoc_rules",
    "ml_eval_confusion_multiclass",
    "ml_eval_ndcg",
    "ml_eval_brier",
    "ml_eval_mrr",
    "ml_eval_lift_table",
    # --- tier 2: oldest-attested rotation (r8 first, then r9 alpha) ---
    "window_sessionize_gap",
    "agg_conditional_sum",
    "agg_cooccurrence_pairs",
    "agg_grouping_id",
    "agg_percentile_approx_tol",
    "agg_skew_kurtosis",
    "agg_weighted_median",
    "cdc_incremental_agg",
    "csv_quoted_roundtrip",
    "csv_roundtrip",
    "ddl_default_columns",
    "dedup_minhash_jaccard_est",
    "dedup_simhash",
    "dedup_simhash_dupes_ok",
    "dedup_winnow_pairs",
    "dq_expectations",
    "graph_sssp_weighted",
    "join_asof",
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
