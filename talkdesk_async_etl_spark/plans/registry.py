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
# Round-5 window: first the queries whose SEMANTICS changed this round
# and therefore need a fresh attestation — the re-pinned TPC-H trio
# (date parameters moved inside the fixture's 1995–2001 span, so their
# oracle rows are now non-empty), the three de-vacuoused queries
# (filter_in_like / join_anti / set_except returned 0 rows at every SF
# until this round), the dedup ids downstream of the hot-key-cap
# rewrite (window count → groupBy-count broadcast anti-join), and the
# multimodal invariant after the fixture-constant dedupe — then every
# id whose most recent driver row is round 2/3 (the full complement of
# the round-4 window, restoring ≤2-round staleness across the
# registry). Any id registered but absent here appends in registration
# order, so new operators are never silently dropped — and the
# first-50 meta-test in tests/test_driver_profile.py fails on typos or
# miscounts.
_PRIORITY = (
    # re-pinned TPC-H parameters: previous rows hash-matched on EMPTY
    # results; these three must re-attest with real data
    "tpch_q5",
    "tpch_q6",
    "tpch_q10",
    # de-vacuoused this round (predicate/operand fixes)
    "filter_in_like",
    "join_anti",
    "set_except",
    # hot-key-cap rewrite flows into these pair generators + invariants
    "dedup_minhash_lsh",
    "dedup_lsh_containment",
    "dedup_winnow_pairs",
    "dedup_winnow_containment",
    # cosine threshold moved 0.5 → 0.45 this round (the old driver row
    # attests the old definition) + the new clustering consumer of the
    # same pairs
    "dedup_embedding_cosine",
    "dedup_semantic_components",
    # multimodal fixture-constant dedupe
    "multimodal_features_ok",
    # stale ids: last driver row is round 2/3. (scan_parquet and
    # agg_approx_distinct ceded their slots to the two
    # semantics-changed cosine ids above: the bare scan is implicitly
    # re-attested by every other query's scan, and the approx sketch's
    # guarantee is carried by its agg_approx_distinct_tol companion
    # below.)
    "filter_limit1",
    "filter_null_handling",
    "join_broadcast_lookup",
    "join_fk_monitoring",
    "join_left_outer",
    "join_semi",
    "join_star",
    "join_asof",
    "agg_count_per_key",
    "agg_conditional_sum",
    "agg_group_counts",
    "agg_sum_two_keys",
    "agg_status_rollup",
    "agg_approx_distinct_tol",
    "agg_rollup",
    "agg_cube",
    "agg_percentile_approx",
    "agg_percentile_approx_tol",
    "sort_multi_key",
    "set_union",
    "set_intersect",
    "window_lag",
    "window_moving_frame",
    "scalar_date_arith",
    "scalar_date_format",
    "scalar_string_concat",
    "scalar_string_replace",
    "scalar_math",
    "scalar_array_ops",
    "scalar_string_toolkit",
    "udaf_grouped_apply",
    "multimodal_frame_sample",
    "sim_centroid_assign",
    "text_token_stats",
    "text_chunk",
    "text_pii_scrub",
    "stream_session",
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
