#!/usr/bin/env python3
"""Round-15: fine-grained stage timing inside pipeline_incremental_e2e
(replicates incremental_audit_plan's stages, forcing each persisted
stage to a noop sink in order, so each reading is that stage's
marginal cost). Throwaway evidence script for OPTIMIZATION_r15.md.

Usage: python scripts/profile_inc_stages_r15.py [sf_dir] [--onefile]
  --onefile: repartition("file_id") before the landing write
             (1 file per landing partition instead of 32).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("--") else "/root/testdata/sf0.1"
ONEFILE = "--onefile" in sys.argv


def main():
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from talkdesk_async_etl_spark.operators.curation import (
        _INC_DONE,
        _INC_FILES,
        _INC_DEL_MOD,
        _INC_RECRAWL,
        _INC_UPD_MOD,
        _inc_hex15,
    )
    from talkdesk_async_etl_spark.operators.dedup import near_jaccard_pairs
    from talkdesk_async_etl_spark.operators.dedup_clusters import (
        incremental_components_from,
    )
    from talkdesk_async_etl_spark.plans.cache import cache_scope, scoped_persist
    from talkdesk_async_etl_spark.session import build_session
    from talkdesk_async_etl_spark.sources.io import read_table as t
    from talkdesk_async_etl_spark.sources.io import session_scratch_path

    spark = build_session(app_name="profile_inc")
    from talkdesk_async_etl_spark.schemas import TESTDATA_TABLES
    for name in TESTDATA_TABLES:
        t(spark, SF, name).count()

    marks = []
    t_last = [time.perf_counter()]

    def mark(label):
        now = time.perf_counter()
        marks.append((label, now - t_last[0]))
        t_last[0] = now

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    with cache_scope():
        landing = session_scratch_path(spark, SF, "tde_prof_inc")
        src = t(spark, SF, "documents", spread=True).withColumn(
            "file_id", (F.col("doc_id") % _INC_FILES).cast("int")
        )
        if ONEFILE:
            src = src.repartition("file_id")
        src.write.mode("overwrite").partitionBy("file_id").parquet(landing)
        mark("landing write")
        land = spark.read.parquet(landing)
        old = scoped_persist(land.filter(F.col("file_id") < _INC_DONE))
        new = scoped_persist(land.filter(F.col("file_id") >= _INC_DONE))

        def fstats(df):
            return df.groupBy(F.col("file_id").cast("int").alias("file_id")).agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.bit_xor(_inc_hex15(F.col("doc_id").cast("string"))).alias("content_xor"),
            )

        pass1 = scoped_persist(
            fstats(old)
            .select("file_id", F.lit("done").alias("status"), "n_rows", "content_xor")
            .unionByName(
                fstats(new).select(
                    "file_id", F.lit("new").alias("status"), "n_rows", "content_xor"
                )
            )
        )
        noop(pass1)
        mark("stage1 pass1 (old+new fstats)")

        cols = ("doc_id", "source", "lang", "n_chars", "text")
        snapshot_live = old.select(*cols).localCheckpoint()
        mark("snapshot_live localCheckpoint")

        def op_rows(df, op, source_col, version):
            return df.select(
                "doc_id",
                F.lit(op).alias("op"),
                source_col.alias("source"),
                (F.lit(None).cast("string") if op == "D" else F.col("lang")).alias("lang"),
                (F.lit(None).cast("long") if op == "D" else F.col("n_chars")).alias("n_chars"),
                (F.lit(None).cast("string") if op == "D" else F.col("text")).alias("text"),
                F.lit(version).alias("version"),
            )

        ins = op_rows(new, "I", F.col("source"), 2)
        upd = op_rows(old.filter(F.col("doc_id") % _INC_UPD_MOD == 0), "U", F.lit(_INC_RECRAWL), 2)
        dele = op_rows(old.filter(F.col("doc_id") % _INC_DEL_MOD == 0), "D", F.lit(None).cast("string"), 3)
        delta_ops = ins.unionByName(upd).unionByName(dele)
        snap_ops = snapshot_live.select(
            "doc_id", F.lit("I").alias("op"), "source", "lang", "n_chars", "text",
            F.lit(1).alias("version"),
        )
        w_key = Window.partitionBy("doc_id").orderBy(F.col("version").desc())
        live = scoped_persist(
            snap_ops.unionByName(delta_ops)
            .withColumn("rn", F.row_number().over(w_key))
            .filter((F.col("rn") == 1) & (F.col("op") != "D"))
            .select(*cols)
        )
        noop(live)
        mark("stage2 live (cdc window)")

        snapshot_agg = (
            snapshot_live.groupBy("source")
            .agg(F.count(F.lit(1)).alias("dn"), F.sum("n_chars").alias("dchars"))
            .localCheckpoint()
        )
        delta_latest = (
            delta_ops.withColumn("rn", F.row_number().over(w_key))
            .filter(F.col("rn") == 1)
            .select("doc_id", "op", "source", "n_chars")
        )
        old_vals = snapshot_live.select(
            "doc_id", F.col("source").alias("old_source"), F.col("n_chars").alias("old_chars")
        )
        adj = scoped_persist(delta_latest.join(old_vals, "doc_id", "left"))
        retract = adj.filter(F.col("old_source").isNotNull()).select(
            F.col("old_source").alias("source"),
            F.lit(-1).cast("long").alias("dn"),
            (-F.col("old_chars")).alias("dchars"),
        )
        addnew = adj.filter(F.col("op") != "D").select(
            "source", F.lit(1).cast("long").alias("dn"), F.col("n_chars").alias("dchars")
        )
        view_src = scoped_persist(
            snapshot_agg.unionByName(retract)
            .unionByName(addnew)
            .groupBy("source")
            .agg(
                F.sum("dn").cast("long").alias("n_docs"),
                F.sum("dchars").cast("long").alias("total_chars"),
            )
            .filter(F.col("n_docs") > 0)
        )
        noop(view_src)
        mark("stage3 ivm view")

        pairs = scoped_persist(
            near_jaccard_pairs(live.select("doc_id", "text")).select("doc_a", "doc_b")
        )
        noop(pairs)
        mark("stage4a pair build")
        labels = scoped_persist(
            incremental_components_from(pairs, is_old=lambda c: (c % _INC_FILES) < _INC_DONE)
        )
        noop(labels)
        mark("stage4b incremental components")

        pass2 = scoped_persist(fstats(land))
        noop(pass2)
        mark("stage5 pass2 fstats")

        # audit aggregates (5 rows)
        matched = pass2.join(
            pass1.select("file_id", "n_rows", "content_xor"),
            ["file_id", "n_rows", "content_xor"],
        )
        n = (
            pass1.count(), live.count(), view_src.count(),
            labels.count(), matched.count(),
        )
        mark("audit aggregates (counts only)")
        print(f"rows: {n}")

    for label, dt in marks:
        print(f"  {label:<40} {dt:7.3f} s")
    print(f"  {'TOTAL':<40} {sum(d for _, d in marks):7.3f} s")
    import glob as g
    print("landing files:", len(g.glob(os.path.join(landing, 'file_id=*', '*.parquet'))))
    spark.stop()


if __name__ == "__main__":
    main()
