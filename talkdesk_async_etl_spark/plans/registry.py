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
# Round-4 window: first the five TPC-H canon queries (registered in
# round 3 at slots 51+, so they have never had a driver row), then the
# two new constructed-duplicate invariants (dedup.py — the last two
# operators whose guarantees previously lived only in unit tests),
# then the ids whose most recent driver hash-match is round 2 (stale),
# then sentinels for every operator touched this round (scoped-cache
# conversion, hot-key caps, eager-release invariants). Any id
# registered but absent here appends in registration order, so new
# operators are never silently dropped — and the first-50 meta-test in
# tests/test_driver_profile.py fails on typos or miscounts.
_PRIORITY = (
    # TPC-H canon: registered round 3, never driver-checked
    "tpch_q1",
    "tpch_q3",
    "tpch_q5",
    "tpch_q6",
    "tpch_q10",
    # new round-4 invariant companions (never attested)
    "dedup_simhash_dupes_ok",
    "dedup_winnow_containment",
    # stalest ids: last driver hash-match (or rows-only row) is round 2
    "filter_col_eq",
    "filter_date_range",
    "scan_json_doc",
    "csv_roundtrip",
    "filter_conj_eq",
    "project_columns",
    "join_inner_using",
    "join_range",
    "agg_count",
    "agg_multi",
    "agg_count_distinct",
    "agg_percentile",
    "pivot_event_counts",
    "scalar_json_extract",
    "scalar_json_struct",
    "window_row_number",
    "window_topk_per_group",
    "sort_topk_global",
    "udf_pandas_scalar",
    "dedup_near_jaccard",
    "dedup_simhash",
    "sim_topk_blocked",
    "sim_topk_ivf",
    "multimodal_image_features",
    "text_quality_filter",
    "text_lang_id",
    "text_fingerprint",
    "text_token_count_regex",
    "text_split_assign",
    "text_dominant_term",
    "stream_tumbling",
    "stream_sliding",
    # touched this round (scoped caches / hot-key caps / eager release /
    # decimal-avg fix) — every modified operator gets a fresh row
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_lsh_containment",
    "dedup_winnow_pairs",
    "dedup_components",
    "dedup_resolve_canonical",
    "dedup_embedding_cosine",
    "sim_topk_cosine",
    "sim_ivf_recall",
    "sim_blocked_topk_ok",
    "multimodal_features_ok",
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
