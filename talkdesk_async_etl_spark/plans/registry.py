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
    "talkdesk_async_etl_spark.operators.windows",
    "talkdesk_async_etl_spark.operators.scalars",
    "talkdesk_async_etl_spark.operators.asof",
    "talkdesk_async_etl_spark.operators.udfs",
    "talkdesk_async_etl_spark.operators.multimodal",
    "talkdesk_async_etl_spark.operators.dedup",
    "talkdesk_async_etl_spark.operators.similarity",
    "talkdesk_async_etl_spark.operators.text",
    "talkdesk_async_etl_spark.operators.stats",
    "talkdesk_async_etl_spark.operators.sketches",
    "talkdesk_async_etl_spark.operators.graph",
    "talkdesk_async_etl_spark.operators.sampling",
    "talkdesk_async_etl_spark.operators.ingest",
    "talkdesk_async_etl_spark.operators.tpch",
    "talkdesk_async_etl_spark.operators.engine_api",
    "talkdesk_async_etl_spark.operators.spatial",
    "talkdesk_async_etl_spark.operators.mining",
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
# Round-8 window, in priority order (executes ROUND_NOTES' round-8
# rotation pre-plan):
#   1. The 43 late-round-7 ids that have NEVER had a driver row
#      (registered after the round-7 window filled; every one is
#      pytest-oracle-green at sf0.001/0.01 AND swept green at sf0.1).
#      Green rows for all 43 take union driver coverage to the full
#      registry.
#   2. Ids NEW in round 8 — new ids always enter the window the round
#      they are registered, so never-attested debt stops accruing.
#      Each displaces one r4-stale id from tier 3 (rationale inline).
#   3. The r4-attested tier leftovers (latest driver row round 4,
#      displaced from the round-7 window). Whatever round-8 additions
#      push below slot 50 rotates to r9 with the r5 tier — every
#      deferred id keeps its every-pytest-run oracle parity check, so
#      deferral costs recency of the driver row, not coverage.
# The r5/r6/r7-attested tiers are deliberately out-of-window; they
# rotate r9+ per the pre-plan. Round-8 additions REGISTERED AFTER the
# window filled (join_spatial_grid, agg_cooccurrence_pairs,
# ml_logreg_score, cdc_incremental_agg, …) lead the r9 window — the
# same precedent as rounds 6-7's late batches; each is
# pytest-oracle-green at sf0.001/0.01/0.1. Any id registered but
# absent here appends in registration order, so new operators are
# never silently dropped — and the first-50 meta-test in
# tests/test_driver_profile.py fails on typos or miscounts.
_PRIORITY = (
    # --- tier 1: never driver-attested (late round-7 registrations) ---
    "agg_max_by_mode",
    "join_null_safe",
    "graph_bfs_distance",
    "join_asof_forward_tol",
    "sql_text_api",
    "multimodal_ppm_real",
    "text_vocab_oov",
    "agg_rolling_wau",
    "scalar_try_arithmetic",
    "agg_entropy_per_group",
    "scalar_map_ops",
    "join_interval_overlap",
    "window_range_time",
    "agg_bitmap_distinct",
    "tpch_q2",
    "tpch_q9",
    "tpch_q11",
    "tpch_q12",
    "tpch_q16",
    "window_fill_forward",
    "udaf_cogroup_asof",
    "window_sessionize_gap",
    "sql_pipe_syntax",
    "text_segment_dedup",
    "udf_map_in_arrow",
    "join_scd2_point_in_time",
    "window_match_pattern",
    "join_dpp_prune_ok",
    "sample_stratified_exact",
    "dedup_components_star",
    "sim_topk_pq",
    "sim_pq_recall_ok",
    "join_band_nonequi",
    "scalar_collation_ci",
    "sink_jsonl_export_ok",
    "text_feature_hashing",
    "agg_listagg_ordered",
    "join_asof_nearest",
    "graph_kcore",
    "scalar_xml_roundtrip",
    "agg_bool_family",
    "agg_approx_top_k_exact_domain",
    "sql_named_params",
    # --- tier 2: new in round 8 (each swap displaces one tier-3 id,
    #     deferral rationale at tier 3) ---
    "scan_python_datasource",
    "udaf_apply_in_arrow",
    "sql_udf_scalar",
    "sql_udf_table",
    "sql_execute_immediate",
    "scan_transpose",
    # --- tier 3: r4-tier leftovers displaced from the round-7 window.
    # The six round-8 additions above displace (bottom-up)
    # csv_roundtrip, multimodal_image_features, stream_sliding,
    # stream_tumbling, scalar_json_extract, udf_pandas_scalar — all six
    # re-prove under every-pytest-run oracle parity, the stream twins
    # additionally under test_streaming's batch-vs-stream equivalence,
    # udf_pandas_scalar inside the r6-green Arrow pipelines, and the
    # CSV surface under the S5 orchestration tests; the new ids are
    # never-attested engine entry points (Python DataSource, grouped
    # applyInArrow, SQL-defined functions, EXECUTE IMMEDIATE,
    # transpose). project_columns deferred again to r9: strict sub-plan
    # of every in-window query (same rationale as rounds 6-7).
    "tpch_q1",
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
