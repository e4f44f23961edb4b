"""Unit tests for the round-8 operator heads (q187+)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_margin_mine_demotes_hubs(spark):
    """The ratio margin must rank a tight MUTUAL pair above a hub pair
    with nearly the same raw cosine — the whole point of the criterion."""
    from pyveb_spark.operators.similarity import margin_bitext_mine

    rows = [
        ("s1", "t1", 0.90),
        ("s1", "thub", 0.85),
        ("s2", "thub", 0.85),
        ("s3", "thub", 0.85),
        ("s2", "t1", 0.10),
        ("s3", "t1", 0.10),
    ]
    pairs = spark.createDataFrame(
        rows, "src_id string, tgt_id string, cosine_sim double"
    )
    out = {
        (r.src_id, r.tgt_id): r.margin
        for r in margin_bitext_mine(pairs, k=2).collect()
    }
    # avg_2(s1)=.875 avg_2(t1)=.5 avg_2(thub)=.85
    assert abs(out[("s1", "t1")] - round(0.90 / 0.6875, 6)) < 1e-9
    assert abs(out[("s1", "thub")] - round(0.85 / 0.8625, 6)) < 1e-9
    assert out[("s1", "t1")] > out[("s1", "thub")]


def test_margin_mine_candidate_set_is_topk_union(spark):
    """Only pairs where an endpoint ranks the other in its top-k
    survive; everything else is dropped before margin scoring."""
    from pyveb_spark.operators.similarity import margin_bitext_mine

    rows = [
        ("s%d" % i, "t%d" % j, 0.5 + 0.01 * i - 0.001 * j)
        for i in range(3)
        for j in range(5)
    ]
    pairs = spark.createDataFrame(
        rows, "src_id string, tgt_id string, cosine_sim double"
    )
    out = margin_bitext_mine(pairs, k=1)
    kept = {(r.src_id, r.tgt_id) for r in out.collect()}
    # each src keeps its single best tgt (t0 — highest score), and each
    # tgt keeps its single best src (s2)
    assert kept == {
        ("s0", "t0"), ("s1", "t0"), ("s2", "t0"),
        ("s2", "t1"), ("s2", "t2"), ("s2", "t3"), ("s2", "t4"),
    }
