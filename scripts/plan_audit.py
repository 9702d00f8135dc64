#!/usr/bin/env python3
"""Static physical-plan audit over EVERY registered query.

Writes ``plan_audit_r{NN}.json``: per-query counts of shuffle
exchanges, broadcast exchanges, join strategies, generators, window
nodes, and Python eval nodes, plus pushed-filter presence —
the mechanical evidence behind SCALING.md's per-operator claims. A
future change that adds a shuffle or drops a pushdown to any query
shows up as a diff of a committed artifact instead of a silent plan
regression (the driver's CORRECTNESS gate can't see plan shape, and
the bench only sees its wall-time consequence, usually within noise).

Runs against a FRESH vanilla session (like scripts/check_parity.py) so
session-conf drift can't flap join strategies between audits; plans
are analyzed statically (explain only, nothing executes) at sf0.001.

Flags (reported in the summary, non-zero exit on new ones):
- cartesian: CartesianProduct / BroadcastNestedLoopJoin anywhere
  outside the known bounded scalar-join allowlist;
- python_row_udf: a row-at-a-time BatchEvalPython node (the slow
  path; Arrow/pandas eval nodes are fine).
"""

from __future__ import annotations

import contextlib
import glob
import io
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_PLAN_SF", "/root/testdata/sf0.001")

# Queries whose nested-loop/cartesian joins are bounded by construction
# (one-row scalar relations broadcast into the probe — audited in
# VERDICT r8's anti-pattern sweep).
_BOUNDED_NLJ = {
    "tpch_q11", "tpch_q14", "tpch_q15", "tpch_q22",
    "agg_cohort_retention", "agg_gap_fill_daily",
    "text_decontaminate", "text_unigram_logprob", "text_bigram_logprob",
    "text_vocab_oov", "text_mixture_upsample", "text_lang_quota",
    "dedup_embedding_cosine", "dedup_semantic_components",
    "sim_topk_cosine", "sim_knn_label_vote", "sim_topk_blocked",
    "sim_topk_ivf", "sim_topk_pq", "sim_kmeans_inertia_ok",
    "sim_ivf_recall", "sim_blocked_topk_ok", "sim_pq_recall_ok",
    "dq_expectations", "scan_table_checksum", "sink_compaction_ok",
    # audited round 9 (all broadcast builds bounded by construction):
    "join_band_nonequi",      # 5-row literal band-dim broadcast
    "sim_centroid_assign",    # k centroid vectors (KB) broadcast
    "text_tfidf_top_terms",   # 1-row corpus doc-count scalar
    "agg_hll_sketch_ok",      # merged-sketch 1-row broadcast
    "agg_kll_quantiles_ok",   # merged-estimate 1-row broadcast
    "agg_cms_topk_ok",        # merged-sketch 1-row broadcast
    "agg_bitmap_distinct",    # overall-bitmap 1-row broadcast
    "agg_profile_columns",    # 1-row profile broadcast to stack()
    "multimodal_image_phash", # 36-image fixture self-pairing (demo corpus)
}


def main() -> None:
    from pyspark.sql import SparkSession

    from talkdesk_async_etl_spark.plans.registry import load_all

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .appName("plan_audit")
        .getOrCreate()
    )
    audit: dict[str, dict] = {}
    problems: list[str] = []
    for name, spec in load_all().items():
        try:
            df = spec.fn(spark, SF)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
        except Exception as exc:  # noqa: BLE001
            audit[name] = {"error": f"{type(exc).__name__}: {exc}"[:200]}
            problems.append(f"{name}: plan build failed")
            continue
        entry = {
            "exchanges": len(re.findall(r"\(\d+\) Exchange", plan)),
            "broadcasts": len(re.findall(r"\(\d+\) BroadcastExchange", plan)),
            "smj": len(re.findall(r"\(\d+\) SortMergeJoin", plan)),
            "bhj": len(re.findall(r"\(\d+\) BroadcastHashJoin", plan)),
            "nlj": len(re.findall(r"\(\d+\) (?:CartesianProduct|BroadcastNestedLoopJoin)", plan)),
            "generate": len(re.findall(r"\(\d+\) Generate", plan)),
            # (whole-stage-codegen spans are assigned at EXECUTION under
            # AQE — the static formatted plan shows none, so they are
            # not a static-audit metric.)
            "windows": len(re.findall(r"\(\d+\) Window", plan)),
            "python_eval": len(re.findall(r"\(\d+\) (?:ArrowEvalPython|FlatMapGroupsInPandas|MapInPandas|PythonMapInArrow|MapInArrow|FlatMapCoGroupsInPandas|ArrowEvalPythonUDTF|BatchEvalPythonUDTF|FlatMapGroupsInArrow)", plan)),
            "row_python_eval": len(re.findall(r"\(\d+\) BatchEvalPython\b", plan)),
            "pushed_filters": "PushedFilters: [" in plan and "PushedFilters: []" not in plan,
        }
        audit[name] = entry
        if entry["row_python_eval"]:
            problems.append(f"{name}: row-at-a-time BatchEvalPython in plan")
        if entry["nlj"] and name not in _BOUNDED_NLJ:
            problems.append(f"{name}: unallowlisted cartesian/nested-loop join")
    spark.stop()

    rounds = [
        int(m.group(1))
        for f in glob.glob(os.path.join(os.path.dirname(__file__), "..", "BENCH_r*.json"))
        if (m := re.search(r"BENCH_r(\d+)\.json$", f))
    ]
    stamp = (max(rounds) + 1) if rounds else 0
    out = os.path.join(
        os.path.dirname(__file__), "..", f"plan_audit_r{stamp:02d}.json"
    )
    with open(out, "w") as fh:
        json.dump({"sf": SF, "queries": audit, "problems": problems}, fh, indent=1, sort_keys=True)
        fh.write("\n")
    n_err = sum(1 for v in audit.values() if "error" in v)
    print(
        json.dumps(
            {
                "queries": len(audit),
                "plan_errors": n_err,
                "problems": problems,
                "total_exchanges": sum(v.get("exchanges", 0) for v in audit.values()),
                "out": os.path.relpath(out),
            }
        )
    )
    sys.exit(1 if problems else 0)


if __name__ == "__main__":
    main()
