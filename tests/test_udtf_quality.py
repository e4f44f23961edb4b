"""Tests: ChunkText UDTF (API + SQL + native equivalence), observed metrics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pyveb_spark.functions.udtfs import ChunkText, register_udtfs
from pyveb_spark.plans.quality import (
    bounds_metrics,
    null_metrics,
    observed_metrics,
)


def test_chunk_text_udtf_dataframe_api(spark):
    out = ChunkText(F.lit("a b c d e"), F.lit(2)).collect()
    assert [(r.chunk_id, r.chunk) for r in out] == [
        (0, "a b"), (1, "c d"), (2, "e"),
    ]


def test_chunk_text_udtf_sql_lateral(spark, sf_dir):
    register_udtfs(spark)
    spark.read.parquet(f"{sf_dir}/documents.parquet").where(
        F.col("doc_id") < 20
    ).createOrReplaceTempView("docs_head")
    rows = spark.sql(
        """
        SELECT d.doc_id, c.chunk_id, c.chunk
        FROM docs_head d, LATERAL chunk_text(d.text, 12) c
        """
    )
    # equivalence with the native chunker used by chunk_stats/q55
    from pyveb_spark.operators.dedup import chunk_stats

    native = chunk_stats(
        spark.read.parquet(f"{sf_dir}/documents.parquet").where(
            F.col("doc_id") < 20
        ),
        "doc_id",
        "text",
        chunk_tokens=12,
    )
    per_doc_udtf = {
        r.doc_id: r.n
        for r in rows.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    per_doc_native = {r.doc_id: r.n_chunks for r in native.collect()}
    assert per_doc_udtf == per_doc_native and len(per_doc_udtf) == 20


def test_chunk_text_handles_null_and_empty(spark):
    df = spark.createDataFrame([(1, None), (2, "")], "id int, t string")
    df.createOrReplaceTempView("null_docs")
    register_udtfs(spark)
    rows = spark.sql(
        "SELECT id, c.chunk_id, c.chunk "
        "FROM null_docs, LATERAL chunk_text(t, 3) c"
    ).collect()
    assert {(r.id, r.chunk_id, r.chunk) for r in rows} == {
        (1, 0, ""), (2, 0, ""),
    }


def test_observed_metrics_collect_during_action(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, 30.0), (4, None)],
        "id int, v double",
    )
    metrics = {**null_metrics(["v"]), **bounds_metrics("id")}
    out, obs = observed_metrics(df, metrics)
    assert out.count() == 4  # the action we were running anyway
    got = obs.get
    assert got["n_rows"] == 4
    assert got["n_null_v"] == 2
    assert got["min_id"] == 1 and got["max_id"] == 4
    assert got["mean_id"] == pytest.approx(2.5)


def test_observed_metrics_see_exactly_the_written_rows(spark, tmp_path):
    df = spark.range(100).withColumn(
        "flag", (F.col("id") % 2 == 0).cast("int")
    )
    filtered = df.where(F.col("flag") == 1)
    out, obs = observed_metrics(filtered, {"n_rows": F.count(F.lit(1))})
    out.write.mode("overwrite").parquet(str(tmp_path / "t"))
    assert obs.get["n_rows"] == 50
