"""Regression tests for the round-1 code-review findings: NULL handling,
duplicate-value collapse, typed partitions, parameter validation."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from pyveb_spark.operators.joins import asof_join, fuzzy_top1_join
from pyveb_spark.operators.nested import argmax_in_array
from pyveb_spark.sinks.merge import ParquetMergeSink


def test_asof_join_carries_whole_right_rows_with_null_fields(spark):
    """A NULL field in the nearest right row must NOT be backfilled from an
    older right row (per-column carry would stitch a row that never
    existed)."""
    left = spark.createDataFrame([(1, 10)], "k int, lt int")
    right = spark.createDataFrame(
        [(1, 0, 1, 7), (1, 5, 5, None)],
        "k int, rt int, x int, y int",
    )
    row = asof_join(
        left, right, on="k", left_ts="lt", right_ts="rt"
    ).first()
    # nearest right row is (rt=5, x=5, y=NULL) — y must be NULL, not 7
    assert row.x == 5 and row.y is None and row.rt == 5


def test_asof_join_no_match_is_all_null(spark):
    left = spark.createDataFrame([(1, 10)], "k int, lt int")
    right = spark.createDataFrame([(1, 20, 9)], "k int, rt int, x int")
    row = asof_join(
        left, right, on="k", left_ts="lt", right_ts="rt"
    ).first()
    assert row.x is None and row.rt is None


def test_fuzzy_top1_keeps_duplicate_left_rows(spark):
    left = spark.createDataFrame(
        [(1, "report.pdf"), (2, "report.pdf"), (3, "summary.doc")],
        "id int, name string",
    )
    right = spark.createDataFrame(
        [("report_v2.pdf",), ("summary.docx",)], "fname string"
    )
    out = fuzzy_top1_join(left, right, "name", "fname").collect()
    assert len(out) == 3  # both 'report.pdf' rows survive
    by_id = {r.id: r.fname for r in out}
    assert by_id[1] == by_id[2] == "report_v2.pdf"
    assert by_id[3] == "summary.docx"


def test_argmax_skips_null_sort_fields(spark):
    df = spark.createDataFrame(
        [(1, [(None, "a"), (5, "b"), (3, "c")])],
        "id int, arr array<struct<score:int,v:string>>",
    )
    row = argmax_in_array(df, "arr", "score").first()
    assert row.arr.v == "b"  # not the NULL-scored first element
    # all-NULL keys: falls back to the first element instead of vanishing
    df2 = spark.createDataFrame(
        [(1, [(None, "a"), (None, "b")])],
        "id int, arr array<struct<score:int,v:string>>",
    )
    assert argmax_in_array(df2, "arr", "score").first().arr.v == "a"


def test_upsert_partitioned_with_int_partition_column(spark):
    tmp = tempfile.mkdtemp(prefix="updint_")
    sink = ParquetMergeSink(spark, os.path.join(tmp, "t"))
    day1 = spark.createDataFrame(
        [(1, 20240101, "a"), (2, 20240101, "b"), (3, 20240102, "c")],
        "id int, day int, v string",
    )
    sink.upsert_partitioned(day1, keys=["id"], partition_cols=["day"])
    # second batch touches day 20240101 only; row 1 updates, row 4 inserts
    batch = spark.createDataFrame(
        [(1, 20240101, "a2"), (4, 20240101, "d")],
        "id int, day int, v string",
    )
    sink.upsert_partitioned(batch, keys=["id"], partition_cols=["day"])
    rows = {r.id: (r.v,) for r in sink.read().collect()}
    assert rows == {1: ("a2",), 2: ("b",), 3: ("c",), 4: ("d",)}


def test_chunk_stats_null_text_is_empty_doc(spark):
    from pyveb_spark.operators.dedup import chunk_stats

    df = spark.createDataFrame(
        [(1, None), (2, None), (3, "x y")],
        "doc_id bigint, text string",
    )
    rows = {
        r.doc_id: r
        for r in chunk_stats(df, "doc_id", "text", chunk_tokens=2).collect()
    }
    assert set(rows) == {1, 2, 3}  # NULL docs don't vanish
    assert rows[1].n_chunks == 1 and rows[3].n_dup_chunks == 0


def test_lsh_banding_validation(spark):
    from pyveb_spark.operators.dedup import minhash_lsh_pairs

    df = spark.createDataFrame([(1, "a b c")], "doc_id bigint, text string")
    with pytest.raises(ValueError, match="divide"):
        minhash_lsh_pairs(df, "doc_id", "text", num_hashes=8, bands=16)
    with pytest.raises(ValueError, match="divide"):
        minhash_lsh_pairs(df, "doc_id", "text", num_hashes=32, bands=12)


def test_knn_join_cross_table_keeps_equal_ids(spark):
    from pyveb_spark.operators.similarity import knn_join

    vecs = [(i, [float(i == j) for j in range(4)]) for i in range(4)]
    left = spark.createDataFrame(vecs, "vec_id bigint, embedding array<float>")
    right = spark.createDataFrame(vecs, "vec_id bigint, embedding array<float>")
    incl = knn_join(left, right, k=1, exclude_same_id=False)
    # with self-matches allowed, every vector's top-1 is itself (cos=1)
    assert all(r.vec_id == r.nn_id for r in incl.collect())
    excl = knn_join(left, right, k=1)
    assert all(r.vec_id != r.nn_id for r in excl.collect())


def test_redact_pii_international_phone_prefix(spark):
    from pyveb_spark.operators.cleaning import redact_pii

    df = spark.createDataFrame(
        [(1, "call +123-456-7890 now")], "id int, note string"
    )
    row = redact_pii(df, ["note"]).first()
    assert "+" not in row.note  # the '+' is part of the redacted span
    assert "[PII]" in row.note and row.note_pii_count == 1
