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
# Round-7 window, in priority order (executes the round-6 verdict's
# items 3–4 and ROUND_NOTES' rotation pre-plan):
#   1. The 8 ids that have NEVER had a driver row (registered late in
#      round 6 after the window filled): agg_gap_fill_daily,
#      join_lateral_topn, udtf_word_chunks, sink_clustered_layout_ok,
#      scan_recursive_cte, scalar_variant_json, agg_unpivot_melt,
#      graph_triangle_count. A green row for each takes union
#      coverage to 151/151.
#   2. Ids NEW in round 7 — new ids always enter the window the round
#      they are registered, so never-attested debt stops accruing.
#      Each new id displaces one r4-stale id from tier 4 (displacement
#      rationale inline at each swap).
#   3. The two r2-stale ids (scan_parquet, agg_approx_distinct) —
#      their sub-plan/dominated-coverage justification has carried
#      them five rounds; refreshing them now costs two cheap slots and
#      ends the staleness argument entirely.
#   4. The r4-attested tier (latest driver row round 4), oldest debt
#      first. 41 ids exist; the window fits 40 minus the round-7
#      additions. Deferred to r8 (with the rest of the r5 tier, which
#      rotates there per the pre-plan):
#      - project_columns — a strict sub-plan of literally every
#        in-window query; the weakest marginal slot in the tier.
#      Further deferrals, one per round-7 addition, are listed at the
#      point of the swap below.
# The 50 r5-attested ids and the 50 r6-attested ids are deliberately
# out-of-window: after this round no id's latest row is older than r5,
# and the r8 pre-plan rotates the r5 tier plus any r7 leftovers. The
# late round-7 additions (agg_max_by_mode, join_null_safe,
# graph_bfs_distance, join_asof_forward_tol, sql_text_api,
# multimodal_ppm_real, text_vocab_oov, agg_rolling_wau,
# scalar_try_arithmetic, agg_entropy_per_group, scalar_map_ops,
# join_interval_overlap, window_range_time, agg_bitmap_distinct,
# plus the canon-completing TPC-H batch tpch_q2/q9/q11/q12/q16 and
# window_fill_forward / udaf_cogroup_asof / window_sessionize_gap /
# sql_pipe_syntax / text_segment_dedup / udf_map_in_arrow /
# join_scd2_point_in_time / window_match_pattern /
# join_dpp_prune_ok / sample_stratified_exact /
# dedup_components_star / sim_topk_pq / sim_pq_recall_ok /
# join_band_nonequi / scalar_collation_ci / sink_jsonl_export_ok /
# text_feature_hashing / agg_listagg_ordered / join_asof_nearest /
# graph_kcore / scalar_xml_roundtrip / agg_bool_family /
# agg_approx_top_k_exact_domain / sql_named_params —
# registered after the window filled;
# pytest-oracle-green at sf0.001/0.01 AND swept green at sf0.1) LEAD
# the r8 window, same precedent as round 6's late batch. Any
# id registered but absent here appends in registration order, so new
# operators are never silently dropped — and the first-50 meta-test in
# tests/test_driver_profile.py fails on typos or miscounts.
_PRIORITY = (
    # --- tier 1: never driver-attested (late round-6 registrations) ---
    "agg_gap_fill_daily",
    "join_lateral_topn",
    "udtf_word_chunks",
    "sink_clustered_layout_ok",
    "scan_recursive_cte",
    "scalar_variant_json",
    "agg_unpivot_melt",
    "graph_triangle_count",
    # --- tier 2: new in round 7 (swaps documented at tier 4) ---
    # tpch_q21 displaces dedup_simhash_dupes_ok, tpch_q20 displaces
    # sim_blocked_topk_ok: both displaced ids are invariant COMPANIONS
    # whose equivalence claims re-prove every pytest run at two SFs,
    # while their subject ops (dedup_simhash, sim_topk_blocked) stay
    # in-window — the two new decorrelation shapes (multi-EXISTS /
    # NOT-EXISTS self-join, nested IN + correlated aggregate) have no
    # driver row at all yet.
    "tpch_q21",
    "tpch_q20",
    # multimodal_wav_real displaces multimodal_image_features: the new
    # id is the multimodal family's first HASH-CHECKED driver row with
    # a REAL codec on the path (stdlib RIFF/PCM parse, formula-derived
    # oracle), strictly stronger evidence than the displaced rows-only
    # fake-decoder id, whose plumbing invariant companion
    # multimodal_features_ok is r5-green and re-proves every pytest
    # run.
    "multimodal_wav_real",
    # sink_zorder_layout_ok displaces stream_tumbling and
    # agg_cms_topk_ok displaces stream_sliding: both displaced window
    # twins' exact expressions are re-attested every pytest run by
    # test_streaming's batch-vs-stream equivalence while
    # stream_session carries the family's driver row; the new ids are
    # novel surfaces (bit-interleaved layout checksum, frequency
    # sketch). join_bloom_prefilter_ok displaces tpch_q1: the
    # single-table scan-agg shape is the suite's most-covered surface
    # (t1-smoked flagship every round, deeper in-window TPC-H
    # aggregates, oracle parity every pytest run).
    "sink_zorder_layout_ok",
    "agg_cms_topk_ok",
    "join_bloom_prefilter_ok",
    # scalar_higher_order_lambda displaces scalar_json_extract: the
    # in-window (tier-1) scalar_variant_json exercises the JSON-path
    # surface strictly harder (parse_json → typed variant_get), while
    # the HOF lambda surface (transform/filter/zip_with/aggregate) has
    # no driver row anywhere. udaf_ewma_timeseries displaces
    # udf_pandas_scalar: the same Arrow transfer surface plus grouped
    # ordering and sequential state — and udf_pandas_scalar's scalar
    # path still runs inside the r6-green text_pack_sequences /
    # stream_funnel_state Arrow pipelines.
    "scalar_higher_order_lambda",
    "udaf_ewma_timeseries",
    # scan_table_checksum displaces csv_roundtrip: the engine-parity
    # fingerprint (md5-canonical bit_xor, hash-matched 60-bit
    # checksums across Spark and DuckDB) is the strongest row-content
    # attestation in the suite; the displaced CSV write/read surface
    # is exercised by the S5 CSV sink + observed-count orchestration
    # tests every pytest run.
    "scan_table_checksum",
    # --- tier 3: r2-stale refresh ---
    "scan_parquet",
    "agg_approx_distinct",
    # --- tier 4: the round-4 tier, attestation-staleness drain ---
    "scan_json_doc",
    "filter_conj_eq",
    "filter_col_eq",
    "filter_date_range",
    "join_inner_using",
    "agg_count",
    "agg_multi",
    "agg_count_distinct",
    "pivot_event_counts",
    "agg_percentile",
    "sort_topk_global",
    "window_row_number",
    "window_topk_per_group",
    "scalar_json_struct",
    "join_range",
    "dedup_exact",
    "dedup_near_jaccard",
    "dedup_components",
    "dedup_resolve_canonical",
    "dedup_simhash",
    "sim_topk_cosine",
    "sim_topk_blocked",
    "sim_topk_ivf",
    "sim_ivf_recall",
    "text_quality_filter",
    "text_lang_id",
    "text_fingerprint",
    "text_token_count_regex",
    "text_split_assign",
    "text_dominant_term",
    "tpch_q3",
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
