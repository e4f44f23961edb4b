#!/usr/bin/env python
"""Isolated per-query profiler for the optimization rounds (guide §1).

Runs one or more named queries on the bench session, timing each with the
noop sink (computes every column, discards output — §1.4) after a warmup,
and optionally dumps ``.explain("formatted")`` to a file.

Usage::

    python tools/profile_query.py q41 q185 --runs 3 --sf-dir /root/testdata/sf0.1
    python tools/profile_query.py q17 --explain plans/r12/q17_before.txt

Accepts name prefixes (q41 matches q41_dup_clusters). The timed action is
the noop write; pass --count to time ``df.count()`` instead (the bench's
historical action) for comparability.
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyveb_spark.queries import QUERIES  # noqa: E402
from pyveb_spark.session import get_spark  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--warmup", type=int, default=1)
    ap.add_argument("--count", action="store_true",
                    help="time df.count() (bench action) instead of noop")
    ap.add_argument("--explain", default=None,
                    help="write explain('formatted') of the LAST query here")
    ap.add_argument("--conf", action="append", default=[],
                    help="runtime SQL conf k=v to set before profiling")
    args = ap.parse_args()

    spark = get_spark("pyveb-profile")
    for kv in args.conf:
        k, _, v = kv.partition("=")
        spark.conf.set(k, v)
    spark.sparkContext.setLogLevel("ERROR")

    selected = []
    for want in args.names:
        hits = [n for n in QUERIES if n.startswith(want)]
        if not hits:
            print(f"no query matches {want!r}", file=sys.stderr)
            return 2
        selected.extend(hits)

    for name in selected:
        fn = QUERIES[name]
        spark.sparkContext.setJobDescription(f"profile:{name}")

        def run_once() -> float:
            t0 = time.perf_counter()
            df = fn(spark, args.sf_dir)
            if args.count:
                df.count()
            else:
                df.write.format("noop").mode("overwrite").save()
            return time.perf_counter() - t0

        for _ in range(args.warmup):
            run_once()
        times = [run_once() for _ in range(args.runs)]
        print(
            f"{name}: median {statistics.median(times):.3f}s "
            f"min {min(times):.3f}s runs {[round(t, 3) for t in times]}"
        )
        if args.explain:
            df = fn(spark, args.sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(args.explain, "w") as fh:
                fh.write(plan)
            print(f"  plan -> {args.explain}")
        spark.sparkContext.setJobDescription(None)
    return 0


if __name__ == "__main__":
    sys.exit(main())
