"""Round-7-head operator tests: temperature-scaled mixing and
leakage-free group-keyed splitting."""

from __future__ import annotations

from pyspark.sql import functions as F


def _grouped_fixture(spark, sizes):
    rows = []
    i = 0
    for lang, n in sizes.items():
        for _ in range(n):
            rows.append((i, lang, f"doc {i} text body"))
            i += 1
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


def test_temperature_rates_alpha_half_exact(spark):
    """For alpha=0.5 the keep-rate is sqrt(n_min/n_g): a 4x-larger group
    gets rate 0.5 exactly (t_int = 2048 on the 4096 grid), and the
    smallest group is pinned to full rate (t_int = grid)."""
    from pyveb_spark.operators.sampling import temperature_rates

    df = _grouped_fixture(spark, {"en": 400, "nl": 100})
    rates = {
        r["lang"]: r
        for r in temperature_rates(df, "lang", alpha=0.5).collect()
    }
    assert rates["nl"]["t_int"] == 4096  # smallest group: keep-all
    assert rates["en"]["t_int"] == 2048  # sqrt(100/400) = 0.5 exactly
    # target shares: n^0.5 -> 20:10 -> 2/3 : 1/3
    assert abs(rates["en"]["target_share"] - 2 / 3) < 1e-12
    assert abs(rates["nl"]["target_share"] - 1 / 3) < 1e-12


def test_temperature_mix_keeps_smallest_group_whole(spark):
    """The smallest group's threshold is the keep-all sentinel 'g', so
    every one of its rows survives; larger groups are down-sampled to
    roughly their sqrt ratio (binomial tolerance)."""
    from pyveb_spark.operators.sampling import temperature_mix

    df = _grouped_fixture(spark, {"en": 1600, "nl": 100})
    kept = (
        temperature_mix(df, "lang", key_cols=["doc_id"], alpha=0.5, seed="t")
        .groupBy("lang")
        .count()
        .collect()
    )
    counts = {r["lang"]: r["count"] for r in kept}
    assert counts["nl"] == 100
    # expected en keep-rate sqrt(100/1600) = 0.25 -> 400 +- 4 sigma
    # (sigma = sqrt(1600 * .25 * .75) ~ 17.3)
    assert 330 <= counts["en"] <= 470, counts


def test_temperature_mix_alpha_one_is_identity(spark):
    """alpha=1 means proportional sampling = keep everything (rate
    (n_min/n_g)^0 = 1 for every group)."""
    from pyveb_spark.operators.sampling import temperature_mix

    df = _grouped_fixture(spark, {"en": 50, "nl": 10, "fr": 25})
    out = temperature_mix(df, "lang", key_cols=["doc_id"], alpha=1.0)
    assert out.count() == 85
    assert out.columns == df.columns  # helper columns dropped


def test_normalized_text_shared_with_fingerprint(spark):
    """doc_fingerprint keys on exactly normalized_text: hashing the
    exposed Column reproduces the fingerprint, and whitespace/case
    variants collapse to one normal form."""
    from pyveb_spark.operators.text import doc_fingerprint, normalized_text

    df = spark.createDataFrame(
        [(1, "Hello   World\tfoo"), (2, "hello world FOO")],
        "doc_id long, text string",
    )
    out = (
        doc_fingerprint(df)
        .withColumn("manual", F.xxhash64(normalized_text("text")))
        .collect()
    )
    for r in out:
        assert r["fingerprint"] == r["manual"]
    assert out[0]["fingerprint"] == out[1]["fingerprint"]


def test_group_keyed_split_has_zero_leakage(spark):
    """Property behind q174: splitting on the content-group key pins
    every member of a duplicate group to a single split, while doc-keyed
    splitting scatters at least one group (this fixture plants exact
    near-duplicate prefixes across many doc_ids)."""
    from pyveb_spark.operators.sampling import hash_split
    from pyveb_spark.operators.text import normalized_text

    rows = [
        (i, f"template header {i % 7} shared boilerplate text here")
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string").withColumn(
        "nt", normalized_text("text", prefix_tokens=12)
    )
    ratios = {"train": 0.8, "valid": 0.1, "test": 0.1}

    grouped = hash_split(df, ratios, ["nt"], seed="s")
    spans_g = (
        grouped.groupBy("nt")
        .agg(F.count_distinct("split").alias("k"))
        .where(F.col("k") > 1)
        .count()
    )
    assert spans_g == 0

    doc_keyed = hash_split(df, ratios, ["doc_id"], seed="s")
    spans_d = (
        doc_keyed.groupBy("nt")
        .agg(F.count_distinct("split").alias("k"))
        .where(F.col("k") > 1)
        .count()
    )
    assert spans_d > 0  # 7 groups x ~43 docs each: certain to scatter
