"""Unit tests for the round-9 heads built in round 8: Bradley-Terry
source strength (q201), preference length-bias audit (q202), GRPO-style
group advantage (q203), KMV quantile sketch audit (q204), and the
LSH-tier bitext miner's operators (q200's pieces are covered in
test_r8_operators)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


def test_bradley_terry_dominant_side_ranks_first():
    from pyveb_spark.operators.text import bradley_terry

    # a beats everyone, c loses to everyone
    p = bradley_terry({("a", "b"): 8, ("a", "c"): 8, ("b", "c"): 5,
                       ("b", "a"): 2, ("c", "b"): 1})
    assert p["a"] > p["b"] > p["c"]
    # renormalized to mean 1 each iteration
    assert math.isclose(sum(p.values()) / 3, 1.0, rel_tol=1e-6)


def test_bradley_terry_symmetric_wins_are_even():
    from pyveb_spark.operators.text import bradley_terry

    p = bradley_terry({("a", "b"): 5, ("b", "a"): 5})
    assert p["a"] == p["b"] == pytest.approx(1.0)


def test_preference_matches_drops_ties_and_same_side(spark):
    from pyveb_spark.operators.text import preference_matches

    df = spark.createDataFrame(
        [
            # block 1: (1,2) same side -> dropped; (2,3) tie -> dropped;
            # (3,4) valid, 4 wins
            (1, "en", "s1", 0.5),
            (2, "en", "s1", 0.7),
            (3, "en", "s2", 0.7),
            (4, "en", "s3", 0.9),
        ],
        "doc_id int, lang string, source string, score double",
    )
    out = preference_matches(df, "lang", "doc_id", "score", "source").collect()
    assert len(out) == 1
    m = out[0]
    assert (m.winner_id, m.loser_id) == (4, 3)
    assert (m.winner_side, m.loser_side) == ("s3", "s2")
    assert m.winner_score > m.loser_score


def test_group_advantage_stats_match_hand_calc(spark, tmp_path):
    from pyveb_spark.queries.profile import q203_group_advantage

    # n=7 so the outlier's advantage can exceed 2 (the max possible
    # advantage is (n-1)/sqrt(n), only 1.79 at n=5)
    vals = [1.0, 2.0, 3.0, 4.0, 1.0, 2.0, 100.0]
    rows = [(i, "2024-01-01 00:00:00", 7, "view", v, "{}")
            for i, v in enumerate(vals)]
    df = spark.createDataFrame(
        rows,
        "event_id bigint, ts string, user_id bigint, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = q203_group_advantage(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    n = len(vals)
    mean = sum(vals) / n
    var = sum((v - mean) ** 2 for v in vals) / (n - 1)
    std = math.sqrt(var)
    assert r.n_rollouts == n
    # stats are emitted UNROUNDED since round 10 (the q01 averages
    # contract — the doubles are engine-identical by construction)
    assert r.mean_reward == pytest.approx(mean)
    assert r.std_reward == pytest.approx(std)
    assert r.max_advantage == pytest.approx((100.0 - mean) / std)
    # only the 100.0 outlier crosses |adv| > 2
    assert r.n_clipped == 1


def test_kmv_quantiles_exact_when_sample_covers_source(spark, tmp_path):
    from pyveb_spark.queries.sketches import _Q204_K, q204_kmv_quantiles

    # 20 docs per source (< k=32): the KMV sample IS the population, so
    # estimated percentiles must equal the exact ones with zero error
    rows = []
    for s in ("alpha", "beta"):
        for i in range(20):
            did = i if s == "alpha" else 100 + i
            rows.append((did, "x", "en", s, (i + 1) * 10))
    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint",
    )
    assert df.count() < 2 * _Q204_K
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {r.source: r for r in q204_kmv_quantiles(spark, str(tmp_path)).collect()}
    for s in ("alpha", "beta"):
        r = out[s]
        assert r.err_p50 == 0 and r.err_p90 == 0
        assert r.exact_p50 == 100  # ceil(0.5*20)=10th value = 100
        assert r.exact_p90 == 180  # ceil(0.9*20)=18th value = 180


def test_lsh_tier_sweep_is_subset_of_exact(spark, sf_dir):
    """q205 (LSH candidate tier) vs q186 (exact prefix-join kernel, its
    recall yardstick): per threshold, the LSH tier can only LOSE pairs
    (single-pass banding recall), never invent them — so every impact
    figure is bounded by the exact sweep's."""
    from pyveb_spark.queries.dedup import (
        q186_dedup_threshold_sweep,
        q205_threshold_sweep_lsh,
    )

    exact = {r.threshold: r for r in
             q186_dedup_threshold_sweep(spark, sf_dir).collect()}
    lsh = {r.threshold: r for r in
           q205_threshold_sweep_lsh(spark, sf_dir).collect()}
    assert set(lsh) == set(exact) == {0.6, 0.7, 0.8, 0.9}
    for t, r in lsh.items():
        e = exact[t]
        assert r.n_pairs <= e.n_pairs
        assert r.n_docs_flagged <= e.n_docs_flagged
        assert (r.tokens_flagged or 0) <= (e.tokens_flagged or 0)
    # and on the planted-dup fixture the 0.9 tier must actually find dups
    assert lsh[0.9].n_pairs > 0


def test_lsh_cross_pairs_caps_hot_buckets_and_keeps_sides(spark):
    from pyveb_spark.operators.similarity import lsh_cosine_cross_pairs

    # two tight clusters; ids 0-9 on the a side, 100-109 on the b side.
    # cluster A vectors collide in one bucket; with a cap below the
    # bucket's union size the A-A' pairs vanish, with a high cap they
    # survive — the hub-region semantics the docstring promises.
    rows = []
    for i in range(10):
        rows.append((i, [1.0, 0.01 * i, 0.0, 0.0]))
        rows.append((100 + i, [1.0, 0.01 * i + 0.005, 0.0, 0.0]))
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    a = df.where("vec_id < 100")
    b = df.where("vec_id >= 100")

    wide = lsh_cosine_cross_pairs(
        a, b, threshold=0.9, n_planes=4, max_bucket_size=1000
    ).collect()
    assert wide, "high cap must keep the cluster's cross pairs"
    for r in wide:
        assert r.vec_id_a < 100 <= r.vec_id_b  # sides preserved
        assert r.cosine_sim >= 0.9

    capped = lsh_cosine_cross_pairs(
        a, b, threshold=0.9, n_planes=4, max_bucket_size=5
    ).collect()
    # the single 20-member bucket exceeds the cap of 5 -> dropped
    assert len(capped) < len(wide)


def test_bradley_terry_empty_and_zero_variance_guards(spark, tmp_path):
    from pyveb_spark.operators.text import bradley_terry
    from pyveb_spark.queries.profile import q203_group_advantage

    # no matches -> empty model, not ZeroDivisionError
    assert bradley_terry({}) == {}

    # a zero-variance reward group (all identical) has no defined
    # advantage: NULL stats, zero clipped, sorted NULLS LAST
    rows = [(i, "2024-01-01 00:00:00", u, "view", v, "{}")
            for i, (u, v) in enumerate(
                [(1, 5.0)] * 6 + [(2, 1.0), (2, 2.0), (2, 3.0),
                                  (2, 4.0), (2, 5.0), (2, 60.0)])]
    df = spark.createDataFrame(
        rows,
        "event_id bigint, ts string, user_id bigint, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = q203_group_advantage(spark, str(tmp_path)).collect()
    assert [r.user_id for r in out] == [2, 1]  # NULL max_advantage last
    flat = {r.user_id: r for r in out}
    assert flat[1].std_reward is None and flat[1].max_advantage is None
    assert flat[1].n_clipped == 0
    assert flat[2].max_advantage is not None


def test_kmv_quantile_sample_is_mergeable():
    """k-minimum-values is associative state: the k smallest hashes of
    A∪B equal the k smallest of (top-k(A) ∪ top-k(B)). This is what
    makes q204's per-source sample a SKETCH (partial-combinable, the
    window computes what a partial-combine would) rather than a sort —
    the same md5-prefix construction as operators.dedup.portable_hash48
    with q204's 'kmvq|' salt."""
    import hashlib

    k = 8

    def h(i):
        return int(hashlib.md5(f"kmvq|{i}".encode()).hexdigest()[:12], 16)

    ids = list(range(100))
    full = sorted(ids, key=h)[:k]
    a, b = ids[::2], ids[1::2]
    sa, sb = sorted(a, key=h)[:k], sorted(b, key=h)[:k]
    merged = sorted(sa + sb, key=h)[:k]
    assert merged == full
    # and a three-way split merges the same way (associativity)
    parts = [ids[0::3], ids[1::3], ids[2::3]]
    samples = [x for p in parts for x in sorted(p, key=h)[:k]]
    assert sorted(samples, key=h)[:k] == full


def test_suggest_lsh_planes_reproduces_measured_points():
    """The fit behind suggest_lsh_planes must reproduce the four measured
    BASELINE.md operator probes within ±10%, and its integer picks must
    match the recorded production choices (10 planes at the 50 k twin,
    12 at the 150 k twin, target 200 candidates/vector)."""
    import math

    from pyveb_spark.operators.similarity import (
        _LSH_FIT_ALPHA,
        _LSH_FIT_C0,
        _LSH_FIT_R,
        suggest_lsh_planes,
    )

    measured = [  # (n_vectors, n_planes, candidates_per_vector)
        (50_000, 6, 19.0e6 / 50_000),
        (50_000, 10, 10.3e6 / 50_000),
        (150_000, 10, 38.8e6 / 150_000),
        (150_000, 12, 24.2e6 / 150_000),
    ]
    for n, planes, cpv in measured:
        pred = _LSH_FIT_C0 * n**_LSH_FIT_ALPHA * _LSH_FIT_R**planes
        assert abs(pred / cpv - 1.0) < 0.10, (n, planes, pred, cpv)

    assert suggest_lsh_planes(50_000, 200.0) == 10
    assert suggest_lsh_planes(150_000, 200.0) == 12
    # monotone in corpus size, clamped at the extrapolation bounds
    picks = [suggest_lsh_planes(n) for n in
             (1, 3_000, 50_000, 150_000, 10**7, 10**12)]
    assert picks == sorted(picks)
    assert picks[0] >= 4 and picks[-1] <= 24
    assert suggest_lsh_planes(3_000, 200.0) <= 8  # the sf0.01 fixture zone
