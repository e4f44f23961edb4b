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
