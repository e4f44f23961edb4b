#!/usr/bin/env python
"""Interleaved A/B harness for RUNTIME SQL confs (guide §1).

The sandbox host's epoch drift (±1.2-3x waves) makes sequential A/B runs
unreliable; this alternates the two config legs run-by-run inside ONE
session, so both legs sample the same epoch, and reports each leg's MIN
(the quietest observation of a deterministic computation).

Usage::

    python tools/ab_conf.py q17 q28 --conf spark.sql.join.preferSortMergeJoin=false \
        --rounds 3
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyveb_spark.queries import QUERIES  # noqa: E402
from pyveb_spark.session import get_spark  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--rounds", type=int, default=3,
                    help="A/B pairs per query (each round runs both legs)")
    ap.add_argument("--conf", action="append", required=True,
                    help="k=v applied in the B leg (repeatable)")
    args = ap.parse_args()

    spark = get_spark("pyveb-ab")
    spark.sparkContext.setLogLevel("ERROR")
    confs = [kv.partition("=") for kv in args.conf]
    defaults = {k: spark.conf.get(k, None) for k, _, _ in confs}

    def set_leg(on: bool) -> None:
        for k, _, v in confs:
            if on:
                spark.conf.set(k, v)
            elif defaults[k] is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, defaults[k])

    selected = []
    for want in args.names:
        hits = [n for n in QUERIES if n.startswith(want)]
        if not hits:
            print(f"no query matches {want!r}", file=sys.stderr)
            return 2
        selected.extend(hits)

    for name in selected:
        fn = QUERIES[name]

        def run_once() -> float:
            t0 = time.perf_counter()
            fn(spark, args.sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            return time.perf_counter() - t0

        set_leg(False)
        run_once()  # warmup, A leg
        a_times, b_times = [], []
        # counterbalanced ABBA order: a monotonically quieting (or
        # loading) host otherwise hands the later-positioned leg a
        # systematic advantage
        for i in range(args.rounds):
            first_a = i % 2 == 0
            for leg_a in (first_a, not first_a):
                set_leg(not leg_a)
                (a_times if leg_a else b_times).append(run_once())
        set_leg(False)
        print(
            f"{name}: A min {min(a_times):.3f}s B min {min(b_times):.3f}s "
            f"(B/A {min(b_times) / min(a_times):.2f}) "
            f"A {[round(t, 2) for t in a_times]} "
            f"B {[round(t, 2) for t in b_times]}"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
