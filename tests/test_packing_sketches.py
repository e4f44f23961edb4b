"""Unit tests: sequence packing, chunk-level dedup, count-min sketch."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pyveb_spark.operators.dedup import chunk_stats
from pyveb_spark.operators.packing import (
    pack_contiguous,
    pack_spans,
    with_token_offsets,
)
from pyveb_spark.operators.sketches import cms_build, cms_estimate


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, 1 + (i * 7) % 40) for i in range(50)] + [(100, 0)]
    return spark.createDataFrame(rows, "doc_id bigint, n_tokens int")


def test_offsets_are_exclusive_prefix_sums(spark, docs):
    out = with_token_offsets(docs, "n_tokens", "doc_id").orderBy("doc_id")
    rows = out.collect()
    run = 0
    for r in rows:
        assert r.start_tok == run
        run += r.n_tokens
        assert r.end_tok == run - 1


def test_pack_spans_invariants(spark, docs):
    budget = 64
    spans = pack_spans(docs, "n_tokens", "doc_id", budget)
    per_pack = (
        spans.groupBy("pack_id")
        .agg(F.sum("span_tokens").alias("tok"))
        .orderBy("pack_id")
        .collect()
    )
    # every pack but the last holds exactly `budget` tokens
    assert all(r.tok == budget for r in per_pack[:-1])
    assert 0 < per_pack[-1].tok <= budget
    # pack ids are contiguous from 0
    assert [r.pack_id for r in per_pack] == list(range(len(per_pack)))
    # each document's spans reassemble exactly its token range
    per_doc = (
        spans.groupBy("doc_id")
        .agg(
            F.sum("span_tokens").alias("tok"),
            F.min("span_start").alias("lo"),
            F.max("span_end").alias("hi"),
        )
        .collect()
    )
    n_by_id = {r.doc_id: r.n_tokens for r in docs.collect()}
    for r in per_doc:
        assert r.tok == n_by_id[r.doc_id]
        assert r.hi - r.lo + 1 == r.tok
    # zero-token documents contribute no span
    assert spans.where(F.col("doc_id") == 100).count() == 0


def test_pack_contiguous_each_doc_one_bin(spark, docs):
    budget = 64
    out = pack_contiguous(docs, "n_tokens", "doc_id", budget)
    assert out.count() == docs.count()  # no fan-out
    bins = (
        out.where(F.col("n_tokens") > 0)
        .groupBy("bin_id")
        .agg(F.sum("n_tokens").alias("tok"), F.max("n_tokens").alias("big"))
        .collect()
    )
    for r in bins:
        # a bin overflows by at most one document's tail
        assert r.tok < budget + r.big


def test_chunk_stats_marks_repeats(spark):
    df = spark.createDataFrame(
        [
            (1, "a b c d"),  # chunks: "a b", "c d"
            (2, "a b a b"),  # "a b" dup of doc1, second "a b" dup too
            (3, "x y"),  # unique
        ],
        "doc_id bigint, text string",
    )
    rows = {
        r.doc_id: r
        for r in chunk_stats(df, "doc_id", "text", chunk_tokens=2).collect()
    }
    assert rows[1].n_chunks == 2 and rows[1].n_dup_chunks == 0
    assert rows[2].n_chunks == 2 and rows[2].n_dup_chunks == 2
    assert rows[2].dup_frac == 1.0
    assert rows[3].n_dup_chunks == 0


def test_chunk_stats_intra_doc_repeat_and_short_doc(spark):
    df = spark.createDataFrame(
        [(1, "a b a b a"), (2, "z")],
        "doc_id bigint, text string",
    )
    rows = {
        r.doc_id: r
        for r in chunk_stats(df, "doc_id", "text", chunk_tokens=2).collect()
    }
    # chunks of doc1: "a b", "a b", "a" → one intra-doc dup
    assert rows[1].n_chunks == 3 and rows[1].n_dup_chunks == 1
    # one-token doc → a single (short) chunk
    assert rows[2].n_chunks == 1 and rows[2].n_dup_chunks == 0


@pytest.fixture(scope="module")
def tokens(spark):
    rows = [("tok_%d" % (i % 97),) for i in range(3000)]
    return spark.createDataFrame(rows, "token string")


def test_cms_never_underestimates(spark, tokens):
    sketch = cms_build(tokens, "token", depth=4, width=256)
    exact = tokens.groupBy("token").agg(F.count(F.lit(1)).alias("n"))
    est = cms_estimate(
        sketch, exact.select("token"), "token", depth=4, width=256
    )
    joined = exact.join(est, "token").collect()
    assert len(joined) == 97
    assert all(r.cms_count >= r.n for r in joined)
    # ε = e/width error bound over total mass N, per standard CMS analysis;
    # with width 256 and N=3000 the slack is ~32 — generous but pinned
    n_total = 3000
    assert all(r.cms_count <= r.n + (2.72 * n_total) / 256 for r in joined)


def test_cms_merge_equals_single_build(spark, tokens):
    half1 = tokens.limit(1500)
    # deterministic complement via row id is overkill; rebuild from ranges
    rows = [("tok_%d" % (i % 97),) for i in range(1500, 3000)]
    half2 = spark.createDataFrame(rows, "token string")
    s1 = cms_build(half1, "token", depth=2, width=128)
    s2 = cms_build(half2, "token", depth=2, width=128)
    merged = (
        s1.unionByName(s2)
        .groupBy("depth_idx", "bucket")
        .agg(F.sum("n").alias("n"))
    )
    full = cms_build(tokens, "token", depth=2, width=128)
    diff = (
        merged.withColumnRenamed("n", "nm")
        .join(full, ["depth_idx", "bucket"], "full")
        .where(
            F.coalesce(F.col("nm"), F.lit(0))
            != F.coalesce(F.col("n"), F.lit(0))
        )
    )
    assert diff.count() == 0


def test_epoch_repeat_counts_and_determinism(spark):
    from pyveb_spark.operators.sampling import epoch_repeat

    df = spark.createDataFrame(
        [(i, 2.0 if i < 10 else (0.5 if i < 30 else 1.0)) for i in range(50)],
        "doc_id bigint, wt double",
    )
    rep = epoch_repeat(df, "wt", ["doc_id"])
    per_doc = {
        r.doc_id: r.n
        for r in rep.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    # integer weights are exact: every 2.0-doc twice, every 1.0-doc once
    assert all(per_doc[i] == 2 for i in range(10))
    assert all(per_doc.get(i) == 1 for i in range(30, 50))
    # fractional weights: 0/1 copies, roughly half kept, epoch ids 0..k-1
    half = [per_doc.get(i, 0) for i in range(10, 30)]
    assert set(half) <= {0, 1} and 3 <= sum(half) <= 17
    epochs = {
        (r.doc_id, r.epoch) for r in rep.select("doc_id", "epoch").collect()
    }
    assert (0, 0) in epochs and (0, 1) in epochs
    # deterministic across partitionings
    again = {
        r.doc_id: r.n
        for r in epoch_repeat(df.repartition(7), "wt", ["doc_id"])
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert again == {k: v for k, v in per_doc.items() if v > 0}


def test_ranked_quota_sample_exact_and_nested(spark):
    from pyveb_spark.operators.sampling import ranked_quota_sample

    df = spark.createDataFrame(
        [(i, "s%d" % (i % 3)) for i in range(90)], "doc_id bigint, src string"
    )
    q1 = spark.createDataFrame(
        [("s0", 5), ("s1", 10), ("s2", 30)], "src string, quota long"
    )
    kept1 = ranked_quota_sample(df, "src", ["doc_id"], q1)
    sizes = {
        r.src: r.n
        for r in kept1.groupBy("src").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert sizes == {"s0": 5, "s1": 10, "s2": 30}  # exact-k per group
    # nestedness: raising quotas only ADDS rows
    q2 = spark.createDataFrame(
        [("s0", 8), ("s1", 10), ("s2", 30)], "src string, quota long"
    )
    ids1 = {r.doc_id for r in kept1.collect()}
    ids2 = {r.doc_id for r in ranked_quota_sample(df, "src", ["doc_id"], q2).collect()}
    assert ids1 < ids2 and len(ids2 - ids1) == 3
    # determinism across invocations and partitioning
    ids1b = {
        r.doc_id
        for r in ranked_quota_sample(
            df.repartition(7), "src", ["doc_id"], q1
        ).collect()
    }
    assert ids1 == ids1b


def test_hashed_linear_score_bounds_and_determinism(spark):
    from pyveb_spark.operators.text import hashed_linear_score

    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, ""), (3, "alpha alpha alpha")],
        "doc_id bigint, text string",
    )
    rows = {
        r.doc_id: r.clf_score
        for r in hashed_linear_score(df, "text").collect()
    }
    assert all(0.0 <= v <= 1.0 for v in rows.values())
    # single-token doc: score is a pure function of that token's bucket
    again = {
        r.doc_id: r.clf_score
        for r in hashed_linear_score(df, "text").collect()
    }
    assert rows == again
    # repeating one token doesn't change the mean-weight score
    one = spark.createDataFrame(
        [(1, "alpha"), (2, "alpha alpha")], "doc_id bigint, text string"
    )
    s = {r.doc_id: r.clf_score for r in hashed_linear_score(one, "text").collect()}
    assert s[1] == s[2]


def test_cms_weighted_counts(spark):
    df = spark.createDataFrame(
        [("a", 5), ("b", 3), ("a", 2)], "token string, w int"
    )
    sketch = cms_build(df, "token", depth=4, width=64, weight_col="w")
    est = cms_estimate(
        sketch, df.select("token").distinct(), "token", depth=4, width=64
    )
    rows = {r.token: r.cms_count for r in est.collect()}
    assert rows["a"] >= 7 and rows["b"] >= 3


def test_merge_additive_equals_full_recompute(spark):
    from pyspark.sql import functions as F
    from pyveb_spark.operators.sketches import merge_additive

    rows = [("a", 1, 10.00), ("a", 1, 2.50), ("a", 2, 1.00), ("b", 1, 7.25)]
    df = spark.createDataFrame(rows, "k string, d int, v double")

    def roll(frame):
        return frame.groupBy("k", "d").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("v").cast("decimal(12,2)")).alias("s"),
        )

    # split WITHIN key (a,1) so the merge must actually add partials
    merged = merge_additive(
        [roll(df.where("v > 5")), roll(df.where("v <= 5"))],
        ["k", "d"], ["n", "s"],
    )
    full = roll(df)
    m = {(r.k, r.d): (r.n, float(r.s)) for r in merged.collect()}
    f = {(r.k, r.d): (r.n, float(r.s)) for r in full.collect()}
    assert m == f
    assert m[("a", 1)] == (2, 12.5)  # the split key really merged
    # three-way merge associativity
    merged3 = merge_additive(
        [roll(df.where("v > 5")), roll(df.where("v <= 5 and v > 2")),
         roll(df.where("v <= 2"))],
        ["k", "d"], ["n", "s"],
    )
    assert {(r.k, r.d): (r.n, float(r.s))
            for r in merged3.collect()} == f


def test_kmv_sketch_merge_and_exact_below_k(spark):
    from pyspark.sql import functions as F
    from pyveb_spark.operators.sketches import KMV_M, kmv_sketch

    rows = [("A", i) for i in range(400)] + [("B", i) for i in range(200, 600)]
    df = spark.createDataFrame(rows, "grp string, key int")

    # exact below k: a sketch with k >= n retains every distinct hash
    small = kmv_sketch(df.where("grp = 'A' AND key < 50"), ["grp"], "key", k=128)
    assert small.count() == 50

    k = 64
    sk = kmv_sketch(df, ["grp"], "key", k=k)
    per_grp = {r.grp: r.n for r in sk.groupBy("grp").count().withColumnRenamed("count", "n").collect()}
    assert per_grp == {"A": k, "B": k}

    # merge property: k smallest of (sketch_A ∪ sketch_B) == the sketch
    # of the raw union — the identity every set-algebra estimate rests on
    union_of_sketches = (
        sk.select("h").distinct().orderBy("h").limit(k).collect()
    )
    raw_union = kmv_sketch(
        df.select(F.lit("u").alias("grp"), "key"), ["grp"], "key", k=k
    ).orderBy("h").collect()
    assert [r.h for r in union_of_sketches] == [r.h for r in raw_union]

    # estimator sanity: (k-1)*M/theta within 4 RSE of the true 600
    theta = raw_union[-1].h
    est = (k - 1) * KMV_M / theta
    assert abs(est - 600) / 600 < 4 / (k ** 0.5)


def test_distributed_ntile_matches_window_ntile_exactly(spark):
    """distributed_ntile must be BIT-IDENTICAL to F.ntile over the same
    total order — even split, remainder to the leading buckets — for
    bucket counts that divide evenly, leave remainders, and exceed the
    row count (singleton buckets)."""
    from pyspark.sql import Window

    from pyveb_spark.operators.packing import distributed_ntile

    rows = [(i, (i * 37) % 101) for i in range(97)]  # 97 rows, shuffled vals
    df = spark.createDataFrame(rows, "id int, v int")
    for n in (1, 4, 10, 96, 97, 150):
        got = {
            r.id: r.bin
            for r in distributed_ntile(df, n, ["v", "id"]).collect()
        }
        w = Window.orderBy("v", "id")
        want = {
            r.id: r.bin
            for r in df.withColumn("bin", F.ntile(n).over(w)).collect()
        }
        assert got == want, f"n_bins={n}"


def test_distributed_ntile_empty_input(spark):
    from pyveb_spark.operators.packing import distributed_ntile

    df = spark.createDataFrame([], "id int, v int")
    assert distributed_ntile(df, 5, ["v", "id"]).count() == 0
