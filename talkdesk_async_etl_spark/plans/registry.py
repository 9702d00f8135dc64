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
# Round-3 window: first the single never-attested id (text_pii_scrub),
# then the 26 ids whose only driver hash-match is round 1 (round 2's
# window pushed them out), then the two new invariant queries that turn
# the LSH/IVF unit-test guarantees into driver evidence, then sentinels
# for queries modified this round (join_broadcast_lookup, text_chunk)
# and a cross-section of the round-2-green suites. Any id registered but
# absent here appends in registration order, so new operators are never
# silently dropped.
_PRIORITY = (
    # never driver-attested before round 3
    "text_pii_scrub",
    # round-1-only attestations: re-attest (26 ids)
    "filter_limit1",
    "filter_null_handling",
    "filter_in_like",
    "join_fk_monitoring",
    "join_left_outer",
    "join_semi",
    "join_anti",
    "agg_count_per_key",
    "agg_group_counts",
    "agg_sum_two_keys",
    "agg_status_rollup",
    "agg_rollup",
    "agg_cube",
    "window_lag",
    "window_moving_frame",
    "sort_multi_key",
    "set_union",
    "set_intersect",
    "set_except",
    "scalar_date_arith",
    "scalar_date_format",
    "scalar_string_concat",
    "scalar_string_replace",
    "scalar_math",
    "scalar_array_ops",
    "scalar_string_toolkit",
    # new round-3 queries (invariants + dedup-family completion) —
    # never attested, so they take window slots ahead of twice-green
    # sentinels
    "dedup_lsh_containment",
    "sim_ivf_recall",
    "dedup_resolve_canonical",
    "dedup_winnow_pairs",
    "agg_approx_distinct_tol",
    "agg_percentile_approx_tol",
    "sim_blocked_topk_ok",
    "multimodal_features_ok",
    # modified this round — need fresh attestation
    "join_broadcast_lookup",
    "text_chunk",
    # round-2-green sentinels (regression canaries across every suite)
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_components",
    "dedup_embedding_cosine",
    "sim_topk_cosine",
    "sim_centroid_assign",
    "text_token_stats",
    "stream_session",
    "join_asof",
    "udaf_grouped_apply",
    "multimodal_frame_sample",
    "join_star",
    "agg_conditional_sum",
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
