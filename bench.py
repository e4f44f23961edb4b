#!/usr/bin/env python
"""Benchmark harness: runs the headline query suite at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Protocol (BASELINE.md): wall-clock sec/query, median of 3 warm runs after 1
warmup, AQE + whole-stage codegen on, UTC session.
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


def _run_once(fn, spark, sf_dir: str) -> float:
    t0 = time.perf_counter()
    df = fn(spark, sf_dir)
    n = df.count()  # force full execution; driver-side payload stays O(1)
    assert n >= 0
    return time.perf_counter() - t0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("pyveb-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

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

    total = round(sum(t for t in per_query.values() if t >= 0), 4)
    payload = {
        "metric": "suite_total_wall_clock",
        "value": total,
        "unit": "sec",
        "queries": per_query,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    print(json.dumps(payload))
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
