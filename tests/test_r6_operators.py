"""Round-6 operator tests: conditional vocab broadcasts, lakehouse
dialects, streaming state bounds."""

from __future__ import annotations

import pytest


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
