#!/usr/bin/env python
"""Scale-stress runner behind the BASELINE.md tables.

Times registered queries against any fixture directory (the committed
testdata, or a `gen_twin.py --mult N` twin) with the bench protocol's
warm-up + best-of-2 shape, one line per query plus a final JSON:

    python tools/gen_twin.py --mult 100 --out /tmp/twin_sf1
    python tools/scale_stress.py /tmp/twin_sf1 q28_minhash_pairs,q45_incremental_dedup
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyveb_spark.queries import QUERIES  # noqa: E402
from pyveb_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1]
    names = sys.argv[2].split(",") if len(sys.argv) > 2 else list(QUERIES)
    spark = get_spark("scale-stress")
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    for name in names:
        fn = QUERIES[name]
        fn(spark, sf_dir).count()  # warm
        ts = []
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            ts.append(round(time.perf_counter() - t0, 3))
        out[name] = ts
        print("DONE", name, ts, flush=True)
    print("RESULT " + json.dumps({"sf_dir": sf_dir, "times": out}))


if __name__ == "__main__":
    main()
