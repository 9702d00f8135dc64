#!/usr/bin/env python3
"""Round-15 optimization: stage-level timing for the composed
pipelines (guide §1.1 empirical loop). Replicates each pipeline's
stage boundaries with the SAME factored cores the operators call and
times each stage to a noop sink, so the expensive stage is identified
by measurement instead of guesswork. Throwaway evidence script — the
numbers land in OPTIMIZATION_r15.md.

Usage: python scripts/profile_pipelines_r15.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(label, fn, reps=3):
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print(f"  {label:<44} {best:7.3f} s")
    return best


def main():
    from pyspark.sql import functions as F

    from talkdesk_async_etl_spark.session import build_session
    from talkdesk_async_etl_spark.plans.cache import cache_scope, scoped_persist
    from talkdesk_async_etl_spark.sources.io import read_table as t
    from talkdesk_async_etl_spark.sources.io import session_scratch_path

    spark = build_session(app_name="profile_r15")
    sc = spark.sparkContext

    # Warm tables
    from talkdesk_async_etl_spark.schemas import TESTDATA_TABLES
    for name in TESTDATA_TABLES:
        t(spark, SF, name).count()

    print("== pipeline_incremental_e2e stages ==")
    from talkdesk_async_etl_spark.operators.curation import (
        _INC_DONE,
        _INC_FILES,
        incremental_audit_plan,
    )
    from talkdesk_async_etl_spark.operators.dedup import near_jaccard_pairs
    from talkdesk_async_etl_spark.plans.cache import release_scoped

    landing = session_scratch_path(spark, SF, "tde_prof_landing")

    def write_landing():
        (
            t(spark, SF, "documents", spread=True)
            .withColumn("file_id", (F.col("doc_id") % _INC_FILES).cast("int"))
            .write.mode("overwrite")
            .partitionBy("file_id")
            .parquet(landing)
        )

    sc.setJobDescription("inc: landing write")
    timed("landing write (partitionBy file_id)", write_landing)
    land = spark.read.parquet(landing)
    n_files = len([p for p in os.listdir(landing) if p.startswith("file_id=")])
    import glob as g
    n_parquet = len(g.glob(os.path.join(landing, "file_id=*", "*.parquet")))
    print(f"  landing: {n_files} partitions, {n_parquet} parquet files")

    sc.setJobDescription("inc: pass1 fstats")
    def fstats_pass(df):
        from talkdesk_async_etl_spark.operators.curation import _inc_hex15
        return df.groupBy(F.col("file_id").cast("int").alias("file_id")).agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.bit_xor(_inc_hex15(F.col("doc_id").cast("string"))).alias("content_xor"),
        )
    timed("fstats over full landing (pass2 shape)", lambda: noop(fstats_pass(land)))

    sc.setJobDescription("inc: live pairs")
    live = land.filter(
        ~((F.col("doc_id") % 3 == 0) & (F.col("file_id") < _INC_DONE))
    ).select("doc_id", "text")  # approximation of live set size
    def pairs_run():
        with cache_scope():
            noop(near_jaccard_pairs(live).select("doc_a", "doc_b"))
    timed("near_jaccard_pairs over ~live corpus", pairs_run)

    sc.setJobDescription("inc: full audit")
    def full():
        from talkdesk_async_etl_spark.plans.cache import collect_release
        with cache_scope():
            collect_release(incremental_audit_plan(spark, SF))
    timed("FULL pipeline_incremental_e2e", full)

    print("== pipeline_training_export_e2e stages ==")
    from talkdesk_async_etl_spark.operators.curation import (
        training_export_audit_plan,
    )
    from talkdesk_async_etl_spark.plans.cache import collect_release

    def texp():
        with cache_scope():
            collect_release(training_export_audit_plan(spark, SF))
    sc.setJobDescription("texp: full")
    timed("FULL pipeline_training_export_e2e", texp)

    print("== pipeline_curation_e2e ==")
    from talkdesk_async_etl_spark.operators.curation import curation_audit_plan

    def cur():
        with cache_scope():
            collect_release(curation_audit_plan(spark, SF))
    sc.setJobDescription("curation: full")
    timed("FULL pipeline_curation_e2e", cur)

    spark.stop()


if __name__ == "__main__":
    main()
