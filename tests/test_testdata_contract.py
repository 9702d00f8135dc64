"""Fixture-contract tests: the driver REGENERATES /root/testdata each
round and its properties are NOT byte-stable — the round-5 regeneration
silently flipped events.ts from parquet TIMESTAMP(NANOS) to
TIMESTAMP(MICROS) and broke four streaming tests whose reader assumed
nanos. These assertions pin the contract the engine's readers and the
pinned query parameters depend on, so the NEXT regeneration drift fails
here, by name, instead of surfacing as a mysterious operator failure.
"""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest

from tests.conftest import SF_ORACLE, SF_SMALL

_EXPECTED_COLUMNS = {
    "region": {"r_regionkey", "r_name"},
    "nation": {"n_nationkey", "n_name", "n_regionkey"},
    "customer": {"c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"},
    "supplier": {"s_suppkey", "s_name", "s_nationkey", "s_acctbal"},
    "part": {"p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"},
    "orders": {
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority",
    },
    "lineitem": {
        "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
        "l_linestatus", "l_shipdate",
    },
    "events": {"event_id", "ts", "user_id", "event_type", "value", "props"},
    "documents": {"doc_id", "text", "lang", "source", "n_chars"},
    "embeddings": {"vec_id", "embedding"},
}


@pytest.mark.parametrize("sf_dir", [SF_SMALL, SF_ORACLE])
@pytest.mark.parametrize("table", sorted(_EXPECTED_COLUMNS))
def test_table_columns(sf_dir, table):
    schema = pq.ParquetFile(f"{sf_dir}/{table}.parquet").schema_arrow
    assert set(schema.names) >= _EXPECTED_COLUMNS[table], (
        f"{table} lost columns: {_EXPECTED_COLUMNS[table] - set(schema.names)}"
    )


def test_events_ts_is_a_known_timestamp_flavor():
    """Both readers (sources.io.read_table, streams.read_events_stream)
    adapt between TIMESTAMP(NANOS) and TIMESTAMP(MICROS); any OTHER
    physical type for ts needs a reader change — fail here first."""
    import pyarrow as pa

    t = pq.ParquetFile(f"{SF_SMALL}/events.parquet").schema_arrow.field("ts").type
    assert t in (pa.timestamp("ns"), pa.timestamp("us")), t


def _column_span(table: str, column: str):
    """(min, max) from parquet footer statistics only — no Spark."""
    import datetime as dt

    def as_date(v):
        return v.date() if isinstance(v, dt.datetime) else v

    pf = pq.ParquetFile(f"{SF_ORACLE}/{table}.parquet")
    idx = pf.schema_arrow.names.index(column)
    lo, hi = None, None
    for rg in range(pf.num_row_groups):
        st = pf.metadata.row_group(rg).column(idx).statistics
        lo = as_date(st.min) if lo is None else min(lo, as_date(st.min))
        hi = as_date(st.max) if hi is None else max(hi, as_date(st.max))
    return lo, hi


def test_pinned_date_predicates_are_inside_fixture_span():
    """tpch date pins must stay inside the span of the COLUMN they
    filter (orders.o_orderdate vs lineitem.l_shipdate have different
    spans — shipdates run months past the last orderdate) or their
    oracle checks go vacuous again (round-4 failure mode), and each
    LO..HI window must be non-empty."""
    import datetime as dt

    from talkdesk_async_etl_spark.operators import tpch, tpch_deep

    def _pin(name):
        # Q8 and friends moved to tpch_deep in the round-9 file split.
        return getattr(tpch, name, None) or getattr(tpch_deep, name)

    spans = {
        "orders": _column_span("orders", "o_orderdate"),
        "ship": _column_span("lineitem", "l_shipdate"),
    }
    # pin constant → the column's span it must land inside
    pins = {
        "_Q3_DATE": "orders",  # filters both sides; orders is tighter
        "_Q4_DATE_LO": "orders",
        "_Q5_DATE_LO": "orders",
        "_Q8_DATE_LO": "orders",
        "_Q10_DATE_LO": "orders",
        "_Q1_CUTOFF": "ship",
        "_Q6_DATE_LO": "ship",
        "_Q7_DATE_LO": "ship",
        "_Q14_DATE_LO": "ship",
        "_Q15_DATE_LO": "ship",
    }
    for name, which in pins.items():
        lo, hi = spans[which]
        pin = dt.date.fromisoformat(_pin(name))
        assert lo <= pin <= hi, f"{name}={pin} outside {which} span [{lo}, {hi}]"
    # Every LO..HI window must be a real interval.
    for lo_name in ("_Q4_DATE_LO", "_Q5_DATE_LO", "_Q6_DATE_LO", "_Q7_DATE_LO",
                    "_Q8_DATE_LO", "_Q10_DATE_LO", "_Q14_DATE_LO", "_Q15_DATE_LO"):
        hi_name = lo_name.replace("_LO", "_HI")
        if getattr(tpch, hi_name, None) or getattr(tpch_deep, hi_name, None):
            assert _pin(lo_name) < _pin(hi_name), lo_name


# Several DuckDB oracles enumerate token positions via range(1, 2000)
# (curation._texp_oracle's decontamination stage, the dedup shingle
# oracles, the text unigram oracles) while the Spark sides enumerate
# with an unbounded F.sequence over ALL positions — a document with
# >= 2000 whitespace tokens would make oracle and implementation
# silently disagree on n-gram hits (ADVICE r14). Pin the fixture
# contract so the cap can never silently bind.
_ORACLE_POSITION_ENUM_BOUND = 2000


@pytest.mark.parametrize(
    "sf_dir",
    sorted({SF_SMALL, SF_ORACLE, "/root/testdata/sf0.01", "/root/testdata/sf0.1"}),
)
def test_document_token_count_below_oracle_enum_bound(sf_dir):
    import os

    import duckdb

    path = f"{sf_dir}/documents.parquet"
    if not os.path.exists(path):
        pytest.skip(f"{path} not generated")
    (mx,) = duckdb.sql(
        f"SELECT max(len(string_split(text, ' '))) FROM read_parquet('{path}')"
    ).fetchone()
    assert mx < _ORACLE_POSITION_ENUM_BOUND, (
        f"max documents token count {mx} at {sf_dir} reaches the"
        " range(1, 2000) oracle position-enumeration bound — the"
        " oracles would silently drop n-gram positions; raise the"
        " bound in every oracle before regenerating docs this long"
    )


def test_cuped_cut_inside_events_span():
    """agg_ab_cuped splits pre/post at a frozen date literal; if a
    fixture regeneration moves the events span off the cut, one
    period goes empty and theta silently pins to 0 — fail here by
    name instead (the tpch date-pin pattern)."""
    import datetime as dt

    from talkdesk_async_etl_spark.operators.stats import _CUPED_CUT

    lo, hi = _column_span("events", "ts")
    as_date = lambda v: v.date() if isinstance(v, dt.datetime) else v
    cut = dt.date.fromisoformat(_CUPED_CUT)
    assert as_date(lo) < cut <= as_date(hi), (
        f"CUPED cut {cut} outside events span [{lo}, {hi}]"
    )
