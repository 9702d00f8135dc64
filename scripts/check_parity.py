#!/usr/bin/env python3
"""Driver-gate simulation: run EVERY registered query under a vanilla
SparkSession (no repo-side builder confs — exactly the correctness
harness's profile) and diff against its DuckDB oracle; queries without
an oracle get the driver's weaker check (runs + canonicalizes + rows).

Usage:
    python scripts/check_parity.py [sf_dir] [--only name1,name2]

Exit code 0 iff every query passes — run this before a round ends.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default=None, help="comma-separated query ids")
    ap.add_argument("--cpus", type=int, default=8)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .config("spark.sql.shuffle.partitions", str(args.cpus))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    from oracle_harness import _normalize, compare

    from talkdesk_async_etl_spark.plans.registry import load_all

    qs = load_all()
    only = set(args.only.split(",")) if args.only else None
    fails: list[str] = []
    t0 = time.time()
    for name, spec in qs.items():
        if only and name not in only:
            continue
        qt = time.time()
        try:
            if spec.oracle:
                problems = compare(spark, name, spec.fn, spec.oracle, args.sf_dir)
                status = "ok" if not problems else "FAIL"
                if problems:
                    fails.append(problems[0])
            else:
                df = spec.fn(spark, args.sf_dir)
                rows = [tuple(r) for r in df.collect()]
                _normalize(list(df.columns), rows)  # must canonicalize cleanly
                status = f"rows-only ok ({len(rows)})"
                if not rows:
                    status = "FAIL (0 rows)"
                    fails.append(f"{name}: rows-only check returned 0 rows")
        except Exception as exc:  # noqa: BLE001
            status = "FAIL (exception)"
            fails.append(f"{name}: {type(exc).__name__}: {str(exc)[:300]}")
        finally:
            # Composed invariants release only their OWN cache_scope;
            # plain operators' scoped persists would otherwise
            # accumulate across the ~100-query sweep (MEMORY_AND_DISK
            # blocks for every shingle/signature table of the session).
            from talkdesk_async_etl_spark.plans.cache import release_scoped

            release_scoped()
        print(f"  {name}: {status} [{time.time() - qt:.2f}s]", file=sys.stderr)

    print(f"{len(qs)} queries in {time.time() - t0:.1f}s; {len(fails)} failures")
    for f in fails:
        print(" -", f)
    spark.stop()
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
