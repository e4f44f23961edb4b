#!/usr/bin/env python
"""Benchmark harness: runs the headline query suite at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...},
     "runs": [t1, t2], "sf": ...}

Protocol (BASELINE.md): wall-clock sec/query, median of BENCH_RUNS=3 warm
runs after BENCH_WARMUP=1 warmup, repeated for BENCH_PASSES=2 back-to-back
suite passes; AQE + whole-stage codegen on, UTC session.

Two full passes are the rule, not an option: host epochs on shared VMs
drift 1.1-1.3x uniformly (BASELINE.md "cross-run noise bands"), and a
single pass cannot distinguish that drift from a real regression. The
reported per-query figure is the MIN of the per-pass medians (the
quietest observation of a deterministic quantity); ``runs`` carries each
pass's raw total so uniform epoch drift shows up as runs[0] ≈ k·runs[1]
while a genuine regression moves the min too.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyveb_spark.queries import QUERIES  # noqa: E402
from pyveb_spark.session import get_spark  # noqa: E402

RUNS = int(os.environ.get("BENCH_RUNS", "3"))
WARMUP = int(os.environ.get("BENCH_WARMUP", "1"))
PASSES = int(os.environ.get("BENCH_PASSES", "2"))


def _run_once(fn, spark, sf_dir: str) -> float:
    t0 = time.perf_counter()
    df = fn(spark, sf_dir)
    n = df.count()  # force full execution; driver-side payload stays O(1)
    assert n >= 0
    return time.perf_counter() - t0


def _one_pass(spark, sf_dir: str) -> dict[str, float]:
    per_query: dict[str, float] = {}
    for name, fn in QUERIES.items():
        try:
            for _ in range(WARMUP):
                _run_once(fn, spark, sf_dir)
            times = [_run_once(fn, spark, sf_dir) for _ in range(RUNS)]
            per_query[name] = round(statistics.median(times), 4)
        except Exception as exc:  # a broken query shouldn't kill the bench
            print(f"bench: {name} failed: {exc}", file=sys.stderr)
            per_query[name] = -1.0
    return per_query


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("pyveb-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    passes = [_one_pass(spark, sf_dir) for _ in range(max(1, PASSES))]
    run_totals = [
        round(sum(t for t in p.values() if t >= 0), 4) for p in passes
    ]
    # min of per-pass medians; a query that failed in EVERY pass stays -1
    per_query = {
        name: (
            round(min(ts), 4)
            if (ts := [p[name] for p in passes if p[name] >= 0])
            else -1.0
        )
        for name in passes[0]
    }
    total = round(sum(t for t in per_query.values() if t >= 0), 4)
    payload = {
        "metric": "suite_total_wall_clock",
        "value": total,
        "unit": "sec",
        "queries": per_query,
        "runs": run_totals,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    line = json.dumps(payload)
    print(line)
    # the EXACT stdout line, mirrored to a file (r13, additive): the
    # driver archives only a bounded stdout tail, and the one-line JSON
    # outgrew it at 223 queries (~9 kB) — BENCH_r11.json came back
    # `parsed: null`, costing round 12 its automated per-query
    # comparison. The stdout contract and the $SPARK_GRAFT_* handling
    # are unchanged. (BENCH_LAST_OUT=path overrides; empty disables.)
    last = os.environ.get("BENCH_LAST_OUT", "bench_last.json")
    if last:
        with open(last, "w") as fh:
            fh.write(line + "\n")
    # full per-query artifact, diffable round-over-round without parsing
    # the driver's truncated tail (BENCH_FULL_OUT=path overrides; empty
    # string disables)
    out = os.environ.get("BENCH_FULL_OUT", "bench_full.json")
    if out:
        with open(out, "w") as fh:
            json.dump(payload, fh, indent=1, sort_keys=True)
            fh.write("\n")
    spark.stop()


if __name__ == "__main__":
    main()
