#!/usr/bin/env python
"""Measure state-store growth across micro-batches — the watermark-bounded
-state claim, measured instead of asserted.

Stages the events table as N time-ordered file drops (mtime-sequenced so
FileStreamSource processes them oldest-first), replays two stateful
queries over them with ``maxFilesPerTrigger=1``:

- ``dedup``: ``dropDuplicatesWithinWatermark`` on event_id (every key
  unique → worst case for dedup state),
- ``window``: 1-hour tumbling counts per event_type,

and prints per-batch ``stateOperators`` metrics (rows in state, rows
updated, rows dropped by watermark, memory). On an UNBOUNDED design the
state-row curve tracks cumulative input; with the watermark it must
plateau at ≈ one watermark-horizon of keys regardless of how many batches
have passed — that plateau is the number SCALE.md records.

Usage::

    python tools/gen_twin.py --mult 100 --out /tmp/twin_sf1   # 1M events
    python tools/stream_state_probe.py --sf-dir /tmp/twin_sf1 --drops 25
"""
from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def stage_time_ordered_drops(spark, sf_dir: str, out: str, n_drops: int):
    """Split events into n_drops contiguous time ranges, one parquet file
    each, written (and mtime-stamped) in time order so the file stream
    replays them as an in-order feed."""
    from pyveb_spark.sources.readers import read_table

    ev = read_table(spark, sf_dir, "events")
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).first()
    span = (hi - lo).total_seconds() + 1
    os.makedirs(out, exist_ok=True)
    tmp = tempfile.mkdtemp()
    bucket = F.least(
        F.lit(n_drops - 1),
        F.floor(
            (F.col("ts").cast("double") - F.lit(lo.timestamp()))
            / F.lit(span / n_drops)
        ).cast("int"),
    )
    ev.withColumn("__b", bucket).write.partitionBy("__b").mode(
        "overwrite"
    ).parquet(tmp)
    for i in range(n_drops):
        src_dir = os.path.join(tmp, f"__b={i}")
        parts = [f for f in os.listdir(src_dir) if f.endswith(".parquet")]
        assert len(parts) == 1, "expected one file per time bucket"
        dst = os.path.join(out, f"drop_{i:04d}.parquet")
        shutil.copyfile(os.path.join(src_dir, parts[0]), dst)
        os.utime(dst, (1_700_000_000 + i, 1_700_000_000 + i))
    shutil.rmtree(tmp)
    return ev.schema, int(ev.count())


def run_probe(spark, drops_path, schema, mode: str, watermark: str):
    from pyveb_spark.streaming import (
        read_file_stream,
        run_available_now,
        stateful_dedup,
        windowed_agg,
    )

    stream = read_file_stream(
        spark, drops_path, schema, max_files_per_trigger=1
    )
    if mode == "dedup":
        q_df = stateful_dedup(
            stream, ["event_id"], ts_col="ts", watermark=watermark
        )
        out_mode = "append"
    else:
        q_df = windowed_agg(
            stream,
            ts_col="ts",
            window_duration="1 hour",
            aggs={"n": F.count(F.lit(1))},
            group_by=["event_type"],
            watermark=watermark,
        )
        out_mode = "append"
    with tempfile.TemporaryDirectory() as ck:
        q = run_available_now(
            q_df,
            os.path.join(ck, "ck"),
            output_mode=out_mode,
            fmt="noop",
        )
        q.awaitTermination()
        progress = [json.loads(p.json) for p in q.recentProgress]
    rows = []
    for p in progress:
        for so in p.get("stateOperators", []):
            rows.append(
                {
                    "batch": p["batchId"],
                    "input_rows": p.get("numInputRows", 0),
                    "state_rows": so.get("numRowsTotal"),
                    "updated": so.get("numRowsUpdated"),
                    "evicted": so.get("numRowsRemoved"),
                    "state_bytes": so.get("memoryUsedBytes"),
                }
            )
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--drops", type=int, default=25)
    ap.add_argument("--watermark", default="2 hours")
    args = ap.parse_args()

    from pyveb_spark.session import get_spark

    spark = get_spark("stream-state-probe")
    spark.sparkContext.setLogLevel("ERROR")
    drops = tempfile.mkdtemp(prefix="drops_")
    schema, n_events = stage_time_ordered_drops(
        spark, args.sf_dir, drops, args.drops
    )
    print(f"staged {n_events} events into {args.drops} time-ordered drops")
    for mode in ("dedup", "window"):
        rows = run_probe(spark, drops, schema, mode, args.watermark)
        peak = max((r["state_rows"] or 0) for r in rows)
        final = rows[-1]["state_rows"] if rows else None
        peak_mb = max((r["state_bytes"] or 0) for r in rows) / 1e6
        print(f"\n== {mode}: watermark={args.watermark}, "
              f"{len(rows)} stateful batches ==")
        for r in rows:
            print(
                f"  batch {r['batch']:>3}  in={r['input_rows']:>8}  "
                f"state_rows={r['state_rows']:>8}  upd={r['updated']:>7}  "
                f"evicted={r['evicted']:>7}  state={r['state_bytes']/1e6:.1f}MB"
            )
        print(
            json.dumps(
                {
                    "mode": mode,
                    "n_events": n_events,
                    "n_batches": len(rows),
                    "peak_state_rows": peak,
                    "final_state_rows": final,
                    "peak_state_mb": round(peak_mb, 1),
                    "peak_state_fraction_of_input": round(
                        peak / n_events, 4
                    ),
                }
            )
        )
    shutil.rmtree(drops)


if __name__ == "__main__":
    main()
