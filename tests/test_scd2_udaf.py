"""Tests: SCD2 history merge, grouped-agg pandas UDAFs."""

from __future__ import annotations

import datetime
import math

import pytest
from pyspark.sql import functions as F

from pyveb_spark.functions.udafs import geometric_mean, weighted_mean
from pyveb_spark.sinks.merge import scd2_apply


def _ts(s: str):
    return datetime.datetime.fromisoformat(s)


@pytest.fixture()
def day1(spark):
    return spark.createDataFrame(
        [(1, "alice", "gold", _ts("2024-01-01")),
         (2, "bob", "silver", _ts("2024-01-01"))],
        "id bigint, name string, tier string, snap_ts timestamp",
    )


def test_scd2_initial_load_opens_current_versions(spark, day1):
    h = scd2_apply(None, day1, ["id"], "snap_ts")
    rows = {r.id: r for r in h.collect()}
    assert len(rows) == 2
    for r in rows.values():
        assert r.is_current and r.valid_to is None
        assert r.valid_from == _ts("2024-01-01")


def test_scd2_change_closes_and_opens(spark, day1):
    h1 = scd2_apply(None, day1, ["id"], "snap_ts")
    day2 = spark.createDataFrame(
        [(1, "alice", "platinum", _ts("2024-02-01")),  # tier changed
         (2, "bob", "silver", _ts("2024-02-01")),      # unchanged
         (3, "carol", "gold", _ts("2024-02-01"))],     # new key
        "id bigint, name string, tier string, snap_ts timestamp",
    )
    h2 = scd2_apply(h1, day2, ["id"], "snap_ts")
    rows = sorted(h2.collect(), key=lambda r: (r.id, r.valid_from))
    by_id = {}
    for r in rows:
        by_id.setdefault(r.id, []).append(r)
    # id 1: closed old version + open new one
    old, new = by_id[1]
    assert not old.is_current and old.valid_to == _ts("2024-02-01")
    assert old.tier == "gold" and new.tier == "platinum"
    assert new.is_current and new.valid_from == _ts("2024-02-01")
    # id 2: untouched single current version from day 1
    (bob,) = by_id[2]
    assert bob.is_current and bob.valid_from == _ts("2024-01-01")
    # id 3: new key opens first version
    (carol,) = by_id[3]
    assert carol.is_current and carol.valid_from == _ts("2024-02-01")


def test_scd2_idempotent_on_unchanged_snapshot(spark, day1):
    h1 = scd2_apply(None, day1, ["id"], "snap_ts")
    again = scd2_apply(h1, day1, ["id"], "snap_ts")
    assert again.count() == h1.count()
    assert (
        again.where(~F.col("is_current")).count() == 0
    )  # nothing was closed


def test_scd2_as_of_query(spark, day1):
    """The point of SCD2: reconstruct the state as of any date."""
    h1 = scd2_apply(None, day1, ["id"], "snap_ts")
    day2 = spark.createDataFrame(
        [(1, "alice", "platinum", _ts("2024-02-01"))],
        "id bigint, name string, tier string, snap_ts timestamp",
    )
    h2 = scd2_apply(h1, day2, ["id"], "snap_ts")
    as_of = _ts("2024-01-15")
    state = h2.where(
        (F.col("valid_from") <= F.lit(as_of))
        & (F.col("valid_to").isNull() | (F.col("valid_to") > F.lit(as_of)))
    )
    tiers = {r.id: r.tier for r in state.collect()}
    assert tiers[1] == "gold"  # the pre-change version
    now_state = h2.where(F.col("is_current"))
    assert {r.id: r.tier for r in now_state.collect()}[1] == "platinum"


def test_weighted_mean_matches_native(spark, sf_dir):
    from pyveb_spark.sources.readers import read_table

    l = read_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice", "l_quantity"
    )
    got = {
        r.l_returnflag: r.wm
        for r in l.groupBy("l_returnflag")
        .agg(weighted_mean("l_extendedprice", "l_quantity").alias("wm"))
        .collect()
    }
    native = {
        r.l_returnflag: r.wm
        for r in l.groupBy("l_returnflag")
        .agg(
            (
                F.sum(F.col("l_extendedprice") * F.col("l_quantity"))
                / F.sum("l_quantity")
            ).alias("wm")
        )
        .collect()
    }
    assert set(got) == set(native)
    for k in got:
        assert got[k] == pytest.approx(native[k], rel=1e-9)


def test_geometric_mean_basics(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 100.0), ("b", -5.0), ("b", None)],
        "k string, v double",
    )
    rows = {
        r.k: r.gm
        for r in df.groupBy("k").agg(geometric_mean("v").alias("gm")).collect()
    }
    assert rows["a"] == pytest.approx(10.0)
    # empty reduction: NaN from the udf arrives as NULL through Arrow
    assert rows["b"] is None or math.isnan(rows["b"])
