"""Spark 4 API surface: custom Python DataSource, cogrouped pandas map."""

from __future__ import annotations

import json
import os
import tempfile

import pandas as pd
import pytest
from pyspark.sql import functions as F

from pyveb_spark.operators.parallel import cogroup_apply
from pyveb_spark.sources.pyds import register_paged_json


@pytest.fixture(scope="module")
def pages_dir():
    tmp = tempfile.mkdtemp(prefix="pages_")
    pages = [
        [{"id": 1, "name": "a"}, {"id": 2, "name": "b"}],
        [{"id": 3, "name": "c"}],
        [{"id": 4}],  # missing key → NULL, lenient-API behavior
    ]
    for i, page in enumerate(pages):
        with open(os.path.join(tmp, f"page_{i}.json"), "w") as fh:
            json.dump(page, fh)
    return tmp


def test_paged_json_datasource_reads_all_pages(spark, pages_dir):
    register_paged_json(spark)
    df = (
        spark.read.format("paged_json")
        .schema("id bigint, name string")
        .option("path", pages_dir)
        .load()
    )
    rows = {(r.id, r.name) for r in df.collect()}
    assert rows == {(1, "a"), (2, "b"), (3, "c"), (4, None)}


def test_paged_json_one_partition_per_page(spark, pages_dir):
    register_paged_json(spark)
    df = (
        spark.read.format("paged_json")
        .schema("id bigint, name string")
        .option("path", pages_dir)
        .load()
    )
    # the planner schedules one task per page — the parallel-extract shape
    assert df.rdd.getNumPartitions() == 3


def test_paged_json_requires_schema(spark, pages_dir):
    register_paged_json(spark)
    with pytest.raises(Exception, match="schema"):
        spark.read.format("paged_json").option("path", pages_dir).load()


def test_cogroup_apply_full_outer_groups(spark):
    left = spark.createDataFrame(
        [(1, 10.0), (1, 5.0), (2, 7.0)], "k int, x double"
    )
    right = spark.createDataFrame(
        [(1, 2.0), (3, 9.0)], "k int, y double"
    )

    def reconcile(l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        key = int(l["k"].iloc[0]) if len(l) else int(r["k"].iloc[0])
        return pd.DataFrame(
            {
                "k": [key],
                "sum_x": [float(l["x"].sum()) if len(l) else 0.0],
                "sum_y": [float(r["y"].sum()) if len(r) else 0.0],
            }
        )

    out = {
        r.k: (r.sum_x, r.sum_y)
        for r in cogroup_apply(
            left, right, ["k"], reconcile,
            "k int, sum_x double, sum_y double",
        ).collect()
    }
    # both-sides, left-only, and right-only groups all surface
    assert out == {1: (15.0, 2.0), 2: (7.0, 0.0), 3: (0.0, 9.0)}


def test_cogroup_apply_matches_native_join(spark, sf_dir):
    """Sanity at fixture scale: per-user event/order value totals via
    cogroup equal the native outer-join aggregation."""
    from pyveb_spark.sources.readers import read_table

    ev = read_table(spark, sf_dir, "events").select("user_id", "value")
    od = (
        read_table(spark, sf_dir, "orders")
        .select(F.col("o_custkey").alias("user_id"), "o_totalprice")
        .where(F.col("user_id") < 200)
    )

    def totals(l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        key = int(l["user_id"].iloc[0]) if len(l) else int(r["user_id"].iloc[0])
        return pd.DataFrame(
            {
                "user_id": [key],
                "n_events": [len(l)],
                "n_orders": [len(r)],
            }
        )

    got = {
        r.user_id: (r.n_events, r.n_orders)
        for r in cogroup_apply(
            ev, od, ["user_id"], totals,
            "user_id bigint, n_events long, n_orders long",
        ).collect()
    }
    e_cnt = {r.user_id: r.n for r in ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()}
    o_cnt = {r.user_id: r.n for r in od.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()}
    expected = {
        u: (e_cnt.get(u, 0), o_cnt.get(u, 0))
        for u in set(e_cnt) | set(o_cnt)
    }
    assert got == expected
