"""Regression net for the bench output contract (round-6 failure
class: the driver's bounded stdout tail capture could not parse the
single 93-query JSON line → BENCH_r06 `parsed: null`). Pins:

- the LAST stdout line is a compact JSON summary with the driver's
  required keys and NO per-query map (it must stay tail-sized);
- the full per-query detail is written to bench_detail.json AND
  printed as the penultimate line;
- both agree on the headline numbers.

Runs bench.py as a subprocess on a 3-query subset at sf0.001 so the
contract — not the queries — is what's under test."""

from __future__ import annotations

import json
import os
import subprocess
import sys

_SUBSET = "agg_conditional_sum,filter_limit1,scalar_math"


def test_bench_emits_parseable_summary_last(tmp_path):
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_CPUS="4",
        SPARK_GRAFT_BENCH_REPEATS="1",
        SPARK_GRAFT_BENCH_ONLY=_SUBSET,
    )
    proc = subprocess.run(
        [sys.executable, "bench.py"],
        capture_output=True,
        text=True,
        timeout=600,
        cwd="/root/repo",
        env=env,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [l for l in proc.stdout.strip().splitlines() if l.strip()]
    assert len(lines) >= 2, proc.stdout
    summary = json.loads(lines[-1])  # the driver parses the tail line
    for key in ("metric", "value", "unit", "core16_wall_time", "full_wall_time",
                "failed", "repeats", "sf", "n_queries", "detail"):
        assert key in summary, key
    assert "queries" not in summary  # the compact line must stay tail-sized
    assert summary["failed"] == []
    assert summary["n_queries"] == len(_SUBSET.split(","))
    detail_line = json.loads(lines[-2])
    assert set(detail_line["queries"]) == set(_SUBSET.split(","))
    assert set(detail_line["spread"]) == set(_SUBSET.split(","))
    with open("/root/repo/bench_detail.json") as fh:
        detail_file = json.load(fh)
    assert detail_file["queries"] == detail_line["queries"]
    assert detail_file["value"] == summary["value"]
