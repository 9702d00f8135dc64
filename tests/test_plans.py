"""Physical-plan regression tests: the properties that make these
operators scale are asserted on `.explain("formatted")` output so a
refactor can't silently reintroduce a full scan, a lost broadcast, or
an un-limited window sort."""

from __future__ import annotations

import contextlib
import io

import pytest

from talkdesk_async_etl_spark.plans.registry import load_all
from tests.conftest import SF_SMALL


def plan_of(spark, name: str) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        load_all()[name].fn(spark, SF_SMALL).explain("formatted")
    return buf.getvalue()


def test_projection_prunes_scan(spark):
    plan = plan_of(spark, "project_columns")
    read = next(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "o_orderkey" in read and "o_totalprice" in read
    assert "o_custkey" not in read and "o_orderpriority" not in read


def test_filters_push_into_scan(spark):
    plan = plan_of(spark, "filter_conj_eq")
    pushed = next(l for l in plan.splitlines() if "PushedFilters" in l)
    assert "EqualTo(o_orderstatus,F)" in pushed
    assert "o_orderpriority" in pushed  # both conjuncts reach the scan


def test_dimension_join_broadcasts(spark):
    plan = plan_of(spark, "join_broadcast_lookup")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_window_topk_pushes_group_limit(spark):
    plan = plan_of(spark, "window_topk_per_group")
    # Partial + final WindowGroupLimit: map tasks forward <=K rows/key.
    assert plan.count("WindowGroupLimit") >= 2


def test_global_topk_avoids_full_sort(spark):
    plan = plan_of(spark, "sort_topk_global")
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan  # no global sort


def test_flagship_partial_aggregates(spark):
    plan = plan_of(spark, "agg_conditional_sum")
    # Two-level HashAggregate = map-side partial aggregation.
    assert plan.count("HashAggregate") >= 2


@pytest.mark.parametrize("name", ["agg_count_per_key", "join_fk_monitoring"])
def test_single_shuffle_aggregations(spark, name):
    """The collapsed per-key counts must not multiply shuffles: one
    shuffle Exchange for the aggregation (dimension broadcasts are
    fine and excluded — they ship the small side, not the fact)."""
    import re

    plan = plan_of(spark, name)
    shuffles = re.findall(r"\(\d+\) Exchange\b", plan)
    assert len(shuffles) <= 1, shuffles


def test_ivf_broadcasts_queries_never_shuffles_corpus(spark):
    """Multi-table LSH: the probe join must broadcast the (tiny) query
    side; the exploded corpus never exchanges before the join. The only
    exchanges allowed are the candidate dedup + final ranking window."""
    plan = plan_of(spark, "sim_topk_ivf")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # corpus side: scan → explode → join with no Exchange in between;
    # downstream dedup-agg + window account for all exchanges.
    assert plan.count("Exchange hashpartitioning") <= 2
