"""Merge-sink tests: append/overwrite/upsert semantics + idempotence
(FIXTURES.md fixture 6; rs_client.py:103-125,242-337 parity)."""

from __future__ import annotations

import os
import tempfile

import pytest

from pyveb_spark.sinks.merge import ParquetMergeSink, merge_frames, upsert_frames


@pytest.fixture()
def frames(spark):
    target = spark.createDataFrame(
        [(1, "a", 1.0), (2, "a", 2.0), (2, "b", 3.0), (3, "c", 4.0)],
        "k1 int, k2 string, v double",
    )
    stage = spark.createDataFrame(
        [(2, "a", 20.0), (4, "d", 40.0)], "k1 int, k2 string, v double"
    )
    return target, stage


def test_upsert_composite_key(spark, frames):
    target, stage = frames
    out = upsert_frames(target, stage, keys=["k1", "k2"])
    rows = {(r.k1, r.k2): r.v for r in out.collect()}
    # (2,'a') replaced; (2,'b') survives (composite key semantics,
    # rs_client.py:115-117); (4,'d') inserted
    assert rows == {
        (1, "a"): 1.0, (2, "a"): 20.0, (2, "b"): 3.0, (3, "c"): 4.0, (4, "d"): 40.0,
    }


def test_upsert_single_key_removes_all_matches(spark, frames):
    target, stage = frames
    rows = {(r.k1, r.k2) for r in upsert_frames(target, stage, keys=["k1"]).collect()}
    # single-key upsert: BOTH (2,a) and (2,b) deleted, stage's (2,a) in
    assert rows == {(1, "a"), (2, "a"), (3, "c"), (4, "d")}


def test_merge_dispatcher_modes(spark, frames):
    target, stage = frames
    assert merge_frames(target, stage, "append").count() == 6
    assert merge_frames(target, stage, "overwrite").count() == 2
    assert merge_frames(target, stage, "upsert", keys=["k1", "k2"]).count() == 5
    with pytest.raises(ValueError):
        merge_frames(target, stage, "upsert")
    with pytest.raises(ValueError):
        merge_frames(target, stage, "nope")


def test_sink_upsert_idempotent(spark, frames):
    target, stage = frames
    with tempfile.TemporaryDirectory() as tmp:
        sink = ParquetMergeSink(spark, os.path.join(tmp, "tbl"))
        sink.overwrite(target)
        sink.upsert(stage, keys=["k1", "k2"])
        once = sorted((r.k1, r.k2, r.v) for r in sink.read().collect())
        sink.upsert(stage, keys=["k1", "k2"])  # idempotence (SURVEY §5.3)
        twice = sorted((r.k1, r.k2, r.v) for r in sink.read().collect())
        assert once == twice and len(once) == 5


def test_sink_upsert_creates_table(spark, frames):
    target, _ = frames
    with tempfile.TemporaryDirectory() as tmp:
        sink = ParquetMergeSink(spark, os.path.join(tmp, "new_tbl"))
        assert not sink.exists()
        sink.upsert(target, keys=["k1"])
        assert sink.exists() and sink.read().count() == 4


def test_partitioned_upsert_touches_only_stage_partitions(spark):
    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, "ptbl")
        sink = ParquetMergeSink(spark, path)
        base = spark.createDataFrame(
            [(1, "2024-01-01", 1.0), (2, "2024-01-01", 2.0), (3, "2024-01-02", 3.0)],
            "k int, day string, v double",
        )
        sink.upsert_partitioned(base, keys=["k"], partition_cols=["day"])
        stage = spark.createDataFrame(
            [(1, "2024-01-01", 10.0), (4, "2024-01-01", 40.0)],
            "k int, day string, v double",
        )
        sink.upsert_partitioned(stage, keys=["k"], partition_cols=["day"])
        rows = {r.k: (r.day, r.v) for r in sink.read().collect()}
        assert rows == {
            1: ("2024-01-01", 10.0),
            2: ("2024-01-01", 2.0),
            3: ("2024-01-02", 3.0),  # untouched partition intact
            4: ("2024-01-01", 40.0),
        }


def test_upsert_if_changed_skips_noop_updates(spark):
    from pyveb_spark.sinks.merge import upsert_if_changed

    target = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, None, 30)], "k int, v string, w int"
    )
    stage = spark.createDataFrame(
        [(1, "a", 10),      # identical -> target version survives untouched
         (2, "B", 20),      # changed v -> replaced
         (3, None, 30),     # identical incl. NULL (null-safe) -> untouched
         (4, "d", 40)],     # new key -> inserted
        "k int, v string, w int",
    )
    out = {r["k"]: (r["v"], r["w"]) for r in upsert_if_changed(target, stage, ["k"]).collect()}
    assert out == {1: ("a", 10), 2: ("B", 20), 3: (None, 30), 4: ("d", 40)}
    # compare_cols narrows the change predicate: w-only change is a no-op
    stage2 = spark.createDataFrame([(1, "a", 99)], "k int, v string, w int")
    out2 = {r["k"]: (r["v"], r["w"]) for r in upsert_if_changed(target, stage2, ["k"], compare_cols=["v"]).collect()}
    assert out2[1] == ("a", 10)


def test_apply_changelog_latest_wins_and_deletes(spark):
    from pyveb_spark.sinks.merge import apply_changelog

    target = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k int, v string"
    )
    # key 1: U then D (seq 2 latest) -> deleted despite the earlier update
    # key 2: D then U (seq 2 latest) -> update wins, row replaced
    # key 4: I -> inserted; key 3 untouched -> survives
    log = spark.createDataFrame(
        [(1, "a2", "U", 1), (1, None, "D", 2),
         (2, None, "D", 1), (2, "b2", "U", 2),
         (4, "d", "I", 1)],
        "k int, v string, op string, seq int",
    )
    out = {r.k: r.v for r in
           apply_changelog(target, log, ["k"], ["seq"]).collect()}
    assert out == {2: "b2", 3: "c", 4: "d"}
    # idempotent: re-applying the same changelog changes nothing
    once = apply_changelog(target, log, ["k"], ["seq"])
    twice = apply_changelog(once, log, ["k"], ["seq"])
    assert sorted(once.collect()) == sorted(twice.collect())


def test_history_from_events_and_snapshot_asof(spark):
    from pyspark.sql import functions as F
    from pyveb_spark.sinks.merge import history_from_events, snapshot_asof

    ev = spark.createDataFrame(
        [(1, "v1", "2020-01-01"), (1, "v2", "2020-03-01"),
         (2, "w1", "2020-02-01"),
         # equal-timestamp pair: tiebreak makes n=3 a zero-width version
         (3, "x1", "2020-01-01"), (3, "x2", "2020-01-01")],
        "k int, v string, d string",
    ).select("k", "v", F.col("d").cast("timestamp").alias("ts"))
    hist = history_from_events(ev, ["k"], "ts", tiebreak_cols=["v"])
    assert hist.count() == 5
    assert hist.where("is_current").count() == 3  # one open version per key

    snap = {r.k: r.v for r in snapshot_asof(hist, "2020-02-15").collect()}
    assert snap == {1: "v1", 2: "w1", 3: "x2"}  # x1 zero-width: excluded
    later = {r.k: r.v for r in snapshot_asof(hist, "2020-03-01").collect()}
    assert later[1] == "v2"  # boundary: valid_from <= ts is inclusive
    before = snapshot_asof(hist, "2019-12-31")
    assert before.count() == 0


def test_snapshot_diff_roundtrip_law(spark):
    """apply_changelog(old, snapshot_diff(old, new)) == new — diff and
    apply are exact inverses, so recovered CDC is lossless."""
    from pyspark.sql import functions as F
    from pyveb_spark.sinks.merge import apply_changelog, snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", None)],
        "k int, v string, w double",
    )
    new = spark.createDataFrame(
        [(2, "B", 20.0),          # changed v -> U
         (3, "c", None),          # identical incl. NULL -> no row
         (4, "d", 40.0)],         # new key -> I; key 1 gone -> D
        "k int, v string, w double",
    )
    diff = snapshot_diff(old, new, ["k"])
    ops = {r.k: r.op for r in diff.collect()}
    assert ops == {1: "D", 2: "U", 4: "I"}
    d2 = {r.k: (r.v, r.w) for r in diff.collect()}
    assert d2[1] == ("a", 10.0)   # D carries the OLD payload
    assert d2[2] == ("B", 20.0)   # U carries the NEW payload

    applied = apply_changelog(
        old, diff.withColumn("seq", F.lit(1)), ["k"], ["seq"]
    )
    assert sorted(map(tuple, applied.collect())) == sorted(
        map(tuple, new.collect())
    )
