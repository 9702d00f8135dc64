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


def load_all() -> dict[str, QuerySpec]:
    """Import every operator module (idempotent) and return the registry."""
    for mod in _QUERY_MODULES:
        importlib.import_module(mod)
    return QUERIES
