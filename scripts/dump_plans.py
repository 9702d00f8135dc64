#!/usr/bin/env python3
"""Dump ``explain("formatted")`` for named registered queries into
``plans/r{NN}/<query>_<suffix>.txt`` — the before/after plan evidence
an optimization round commits next to its OPTIMIZATION notes.

Usage:
    python scripts/dump_plans.py --round 15 --suffix before \
        --only dedup_components_star,graph_hits_scores [--sf DIR]

Uses the same vanilla session profile as scripts/plan_audit.py so the
captured plans match the audit's join/exchange decisions. Queries that
materialize during construction (collect_release pipelines) still
build their full lazy core where one is exposed; for the handful that
return driver-local rows we capture the *_plan/lazy helper when the
registry exposes one, else the materialized result's trivial plan plus
a note.
"""

from __future__ import annotations

import argparse
import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, required=True)
    ap.add_argument("--suffix", required=True)
    ap.add_argument("--only", required=True, help="comma-separated query ids")
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("--cpus", type=int, default=8)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .config("spark.sql.shuffle.partitions", str(args.cpus))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from talkdesk_async_etl_spark.plans.cache import cache_scope, release_scoped
    from talkdesk_async_etl_spark.plans.registry import load_all

    registry = load_all()

    # Queries whose registered fn materializes on the driver
    # (collect_release) expose a lazy core for plan inspection — same
    # mapping idea as tests/test_plans.py. For these we explain the
    # CORE (the real join/iteration tree), not the driver-local result.
    def _lazy_core(qname):
        from talkdesk_async_etl_spark.operators import curation, graph

        cores = {
            "pipeline_curation_e2e": lambda sp, sf: curation.curation_audit_plan(sp, sf),
            "pipeline_incremental_e2e": lambda sp, sf: curation.incremental_audit_plan(sp, sf),
            "pipeline_training_export_e2e": lambda sp, sf: curation.training_export_audit_plan(sp, sf),
            "graph_triangle_count": lambda sp, sf: graph.triangle_count_plan(sp, sf, persist=True),
        }
        return cores.get(qname)
    outdir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        f"r{args.round}",
    )
    os.makedirs(outdir, exist_ok=True)
    for name in args.only.split(","):
        name = name.strip()
        if not name:
            continue
        spec = registry[name]
        core = _lazy_core(name)
        try:
            buf = io.StringIO()
            if core is not None:
                with cache_scope():
                    df = core(spark, args.sf)
                    with contextlib.redirect_stdout(buf):
                        df.explain("formatted")
            else:
                df = spec.fn(spark, args.sf)
                with contextlib.redirect_stdout(buf):
                    df.explain("formatted")
            text = buf.getvalue()
        except Exception as exc:  # noqa: BLE001
            text = f"EXPLAIN FAILED: {type(exc).__name__}: {exc}\n"
        finally:
            release_scoped()
        path = os.path.join(outdir, f"{name}_{args.suffix}.txt")
        with open(path, "w") as fh:
            fh.write(text)
        print(f"wrote {path} ({len(text)} bytes)", file=sys.stderr)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
