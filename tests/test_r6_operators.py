"""Round-6 operator tests: conditional vocab broadcasts, lakehouse
dialects, streaming state bounds."""

from __future__ import annotations

import json
import os
import tempfile

import pytest


def test_stream_state_stays_bounded_across_many_batches(spark):
    """The watermark-bounded-state claim, MEASURED (VERDICT r5 item 6):
    replay the events table as 20+ time-ordered micro-batches
    (maxFilesPerTrigger=1) through dropDuplicatesWithinWatermark and
    assert from the per-batch stateOperators metrics that state rows
    PLATEAU at ≈ one watermark horizon instead of tracking cumulative
    input — an unbounded dedup would end holding every key it ever saw."""
    import sys

    sys.path.insert(0, "/root/repo/tools")
    from stream_state_probe import run_probe, stage_time_ordered_drops

    drops = tempfile.mkdtemp(prefix="state_drops_")
    schema, n_events = stage_time_ordered_drops(
        spark, "/root/testdata/sf0.001", drops, 20
    )
    rows = run_probe(spark, drops, schema, "dedup", "2 hours")
    assert len(rows) >= 20, "expected one stateful progress row per drop"
    assert sum(r["input_rows"] for r in rows) == n_events
    peak = max(r["state_rows"] for r in rows)
    # bounded: the peak is a small fraction of total keys processed
    # (every event_id is unique, so unbounded state would reach n_events)
    assert peak < 0.25 * n_events, (peak, n_events)
    # ...and eviction actually runs: by the last batches, removals keep
    # pace with ingestion instead of state accreting monotonically
    assert sum(r["evicted"] or 0 for r in rows) > 0.5 * n_events
    final = rows[-1]["state_rows"]
    assert final <= peak


def _analyzed_plan(df) -> str:
    # hints on a standalone frame live in the analyzed plan (the
    # optimizer prunes hints not attached to a join)
    return df._jdf.queryExecution().analyzed().toString()


def test_broadcast_if_bounded_gates_on_cap(spark):
    """joins.broadcast_if_bounded: hint under the cap, plain frame above
    it or with the cap disabled — the web-scale OOM guard for
    vocabulary-sized side tables (VERDICT r5 'What's wrong' #1)."""
    from pyveb_spark.operators.joins import (
        VOCAB_BROADCAST_CAP_CONF,
        broadcast_if_bounded,
    )

    vocab = spark.createDataFrame(
        [("x", 1), ("y", 2)], "token string, token_id int"
    )
    base = spark.conf.get(VOCAB_BROADCAST_CAP_CONF, None)
    try:
        # under the default cap: hinted
        assert "broadcast" in _analyzed_plan(
            broadcast_if_bounded(vocab, n_rows=2)
        ).lower()
        # known cardinality above the cap: NO hint
        spark.conf.set(VOCAB_BROADCAST_CAP_CONF, "1000")
        assert "broadcast" not in _analyzed_plan(
            broadcast_if_bounded(vocab, n_rows=10_000_000)
        ).lower()
        # cap <= 0 disables hints even for unknown cardinality
        spark.conf.set(VOCAB_BROADCAST_CAP_CONF, "0")
        assert "broadcast" not in _analyzed_plan(
            broadcast_if_bounded(vocab)
        ).lower()
    finally:
        if base is None:
            spark.conf.unset(VOCAB_BROADCAST_CAP_CONF)
        else:
            spark.conf.set(VOCAB_BROADCAST_CAP_CONF, base)


def test_token_kl_above_cap_still_correct(spark):
    """The above-cap (shuffle-join) branch of token_kl_divergence and
    dsir_importance_weights returns identical values to the hinted
    branch — the gate changes the physical strategy only."""
    from pyveb_spark.operators.joins import VOCAB_BROADCAST_CAP_CONF
    from pyveb_spark.operators.text import (
        dsir_importance_weights,
        token_kl_divergence,
    )

    df = spark.createDataFrame(
        [("a", "x x y"), ("b", "y z")], "source string, text string"
    )
    raw = spark.createDataFrame(
        [(1, "x y"), (2, "z z")], "doc_id long, text string"
    )
    tgt = spark.createDataFrame([("x y x",)], "text string")
    kl_hinted = sorted(
        token_kl_divergence(df, "source", "text").collect()
    )
    w_hinted = sorted(dsir_importance_weights(raw, tgt).collect())
    base = spark.conf.get(VOCAB_BROADCAST_CAP_CONF, None)
    try:
        spark.conf.set(VOCAB_BROADCAST_CAP_CONF, "0")
        assert sorted(
            token_kl_divergence(df, "source", "text").collect()
        ) == kl_hinted
        assert sorted(dsir_importance_weights(raw, tgt).collect()) == w_hinted
    finally:
        if base is None:
            spark.conf.unset(VOCAB_BROADCAST_CAP_CONF)
        else:
            spark.conf.set(VOCAB_BROADCAST_CAP_CONF, base)
