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


def test_score_tiers_distinct_scores_share_tier(spark):
    """Nearest-rank tiering over the DISTINCT-score table: rows sharing a
    rounded score always share a tier, tiers are per-group, and tier 1
    holds the HIGHEST scores."""
    from pyveb_spark.operators.sampling import score_tiers

    rows = [("en", i, float(s)) for i, s in enumerate([9, 9, 7, 5, 3, 1])]
    rows += [("nl", 100 + i, float(s)) for i, s in enumerate([2, 2, 2])]
    df = spark.createDataFrame(rows, "lang string, doc_id long, s double")
    out = score_tiers(df, "s", n_tiers=3, group_cols=["lang"]).collect()
    by_doc = {r["doc_id"]: r["tier"] for r in out}
    assert by_doc[0] == by_doc[1] == 1       # the two 9.0s share tier 1
    assert by_doc[4] == by_doc[5] == 3       # lowest scores -> tail
    # nl has ONE distinct score: its cumulative mass is 100%, so the
    # nearest-rank endpoint puts the whole group in the LAST tier —
    # same convention as curriculum_phases (ceil(cum·n/N) with cum=N).
    assert {by_doc[100], by_doc[101], by_doc[102]} == {3}


def test_score_tiers_single_tier_is_identity(spark):
    from pyveb_spark.operators.sampling import score_tiers

    df = spark.createDataFrame(
        [(1, 0.5), (2, 0.9)], "doc_id long, s double"
    )
    out = score_tiers(df, "s", n_tiers=1).collect()
    assert {r["tier"] for r in out} == {1}


def test_apportion_budget_exact_and_fair(spark):
    """Largest-remainder invariants: allocations sum to the budget
    EXACTLY, and every group is within 1 token of its ideal share."""
    from pyveb_spark.operators.sampling import apportion_budget

    counts = spark.createDataFrame(
        [("a", 7), ("b", 11), ("c", 3), ("d", 19)],
        "source string, w long",
    )
    out = apportion_budget(counts, "source", "w", budget=100).collect()
    total_w = 40
    assert sum(r["alloc"] for r in out) == 100
    for r in out:
        ideal = 100 * {"a": 7, "b": 11, "c": 3, "d": 19}[r["source"]] / total_w
        assert abs(r["alloc"] - ideal) < 1.0, (r, ideal)
    # bonus flags mark exactly the leftover count
    assert sum(r["bonus"] for r in out) == 100 - sum(
        (100 * w) // total_w for w in (7, 11, 3, 19)
    )


def test_apportion_budget_exact_division_no_bonus(spark):
    from pyveb_spark.operators.sampling import apportion_budget

    counts = spark.createDataFrame(
        [("a", 1), ("b", 3)], "source string, w long"
    )
    out = {r["source"]: r for r in
           apportion_budget(counts, "source", "w", budget=8).collect()}
    assert out["a"]["alloc"] == 2 and out["b"]["alloc"] == 6
    assert out["a"]["bonus"] == 0 and out["b"]["bonus"] == 0


def test_pack_cut_stats_hand_checked(spark):
    """Docs of 3/4/5 tokens, budget 4: stream layout [0-2][3-6][7-11] ->
    doc1 uncut in pack 0, doc2 spans packs 0-1, doc3 spans packs 1-2."""
    from pyveb_spark.operators.packing import pack_cut_stats

    df = spark.createDataFrame(
        [(1, 3), (2, 4), (3, 5)], "doc_id long, n long"
    )
    out = {r["budget"]: r
           for r in pack_cut_stats(df, "n", "doc_id", [4, 100]).collect()}
    r4 = out[4]
    assert r4["n_docs"] == 3 and r4["total_tokens"] == 12
    assert r4["n_packs"] == 3 and r4["docs_cut"] == 2
    assert r4["n_spans"] == 5  # 1 + 2 + 2
    r100 = out[100]
    assert r100["n_packs"] == 1 and r100["docs_cut"] == 0


def test_pack_cut_stats_rejects_bad_budgets(spark):
    from pyveb_spark.operators.packing import pack_cut_stats
    import pytest as _pytest

    df = spark.createDataFrame([(1, 3)], "doc_id long, n long")
    with _pytest.raises(ValueError):
        pack_cut_stats(df, "n", "doc_id", [])
    with _pytest.raises(ValueError):
        pack_cut_stats(df, "n", "doc_id", [0])


def _reassemble_t5(inp: str, tgt: str) -> str:
    """Splice the target's spans back into the input's sentinel holes."""
    import re

    spans = {}
    parts = re.split(r"<extra_id_(\d+)>", tgt)
    # parts = ['', id0, span0, id1, span1, ..., idK, '']
    for i in range(1, len(parts) - 1, 2):
        spans[int(parts[i])] = parts[i + 1].strip()
    out = inp
    for j, span in spans.items():
        if span:
            out = out.replace(f"<extra_id_{j}>", span)
    return out


def test_t5_span_corrupt_reconstructs_original(spark):
    """Round-trip property: input with target spans spliced back into the
    sentinel holes equals the original text, for every corrupted doc."""
    from pyveb_spark.operators.text import t5_span_corrupt

    rows = [
        (i, " ".join(f"w{i}t{j}" for j in range(20 + 7 * i)))
        for i in range(12)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = t5_span_corrupt(df).collect()
    for r in out:
        assert r["corrupted"]
        assert r["n_spans"] == len(r["text"].split()) // 20
        assert _reassemble_t5(r["t5_input"], r["t5_target"]) == r["text"]
        # ~15% corruption: k spans x 3 tokens dropped
        n = len(r["text"].split())
        kept = len([t for t in r["t5_input"].split()
                    if not t.startswith("<extra_id_")])
        assert kept == n - 3 * r["n_spans"]


def test_t5_span_corrupt_short_doc_passthrough(spark):
    from pyveb_spark.operators.text import t5_span_corrupt

    df = spark.createDataFrame(
        [(1, "too short to corrupt")], "doc_id long, text string"
    )
    r = t5_span_corrupt(df).collect()[0]
    assert not r["corrupted"] and r["n_spans"] == 0
    assert r["t5_input"] == r["text"] and r["t5_target"] == ""


def test_t5_span_corrupt_rejects_bad_params(spark):
    from pyveb_spark.operators.text import t5_span_corrupt
    import pytest as _pytest

    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with _pytest.raises(ValueError):
        t5_span_corrupt(df, span_len=0)
    with _pytest.raises(ValueError):
        t5_span_corrupt(df, tokens_per_span=3, span_len=3)
    with _pytest.raises(ValueError):
        t5_span_corrupt(df, min_tokens=10, tokens_per_span=20)


def test_preference_pairs_selection_and_margin_gate(spark):
    """DPO pair selection: argmax/argmin per group with lowest-id tie
    break on both sides; groups below the margin or candidate floor are
    dropped."""
    from pyveb_spark.operators.text import preference_pairs

    df = spark.createDataFrame(
        [
            # group a: clear winner/loser + a tie at the top (ids 3, 1)
            ("a", 1, 0.9), ("a", 3, 0.9), ("a", 2, 0.1),
            # group b: margin 0.01 < 0.05 -> dropped
            ("b", 4, 0.50), ("b", 5, 0.51),
            # group c: single candidate -> dropped
            ("c", 6, 0.8),
        ],
        "g string, doc_id long, s double",
    )
    rows = preference_pairs(df, ["g"], "doc_id", "s").collect()
    assert len(rows) == 1 and rows[0]["g"] == "a"
    r = rows[0]
    assert r["chosen_id"] == 1          # tie at 0.9 -> lowest id
    assert r["rejected_id"] == 2
    assert r["n_candidates"] == 3
    assert abs(r["margin"] - 0.8) < 1e-9


def test_preference_pairs_rejected_tie_breaks_low_id(spark):
    from pyveb_spark.operators.text import preference_pairs

    df = spark.createDataFrame(
        [("g", 10, 0.2), ("g", 7, 0.2), ("g", 1, 0.9)],
        "g string, doc_id long, s double",
    )
    r = preference_pairs(df, ["g"], "doc_id", "s").first()
    assert r["rejected_id"] == 7        # tie at 0.2 -> lowest id
    assert r["chosen_id"] == 1


def test_ul2_mix_budget_math(spark, sf_dir):
    """q182's corrupted-token budgets re-derived independently per
    denoiser: R = max(1, n // 20) * 3, X = max(1, n // 24) * 12,
    S = n - cut (cut in [1, n-1]); rates land near the UL2 paper's
    targets (R ~15%, X ~50%)."""
    from pyveb_spark.queries import q182_ul2_denoiser_mix

    rows = {r["denoiser"]: r for r in
            q182_ul2_denoiser_mix(spark, sf_dir).collect()}
    assert set(rows) <= {"R", "S", "X", "none"}
    if "R" in rows:
        assert 0.10 <= rows["R"]["corruption_rate"] <= 0.16
    if "X" in rows:
        assert 0.40 <= rows["X"]["corruption_rate"] <= 0.62
    if "S" in rows:
        assert 0.0 < rows["S"]["corruption_rate"] < 1.0
    if "none" in rows:
        assert rows["none"]["n_corrupted"] == 0


def test_mmr_select_prefers_diverse_over_redundant():
    """Two near-identical high-relevance candidates: after the first is
    picked, the redundancy penalty must push the second below a less
    relevant but orthogonal candidate."""
    from pyveb_spark.operators.similarity import mmr_select

    cands = [
        (1, 0, 0.99, [1.0, 0.0, 0.0]),   # picked first (top relevance)
        (2, 0, 0.98, [1.0, 0.01, 0.0]),  # near-duplicate of 1
        (3, 1, 0.80, [0.0, 1.0, 0.0]),   # orthogonal, lower relevance
    ]
    picks = mmr_select(cands, k=2, lam=0.7, mu=0.3)
    assert [p[1] for p in picks] == [1, 3]
    # rank-1 score is pure relevance (no selected set yet)
    assert picks[0][4] == 0.7 * 0.99


def test_mmr_select_tie_breaks_lowest_id():
    from pyveb_spark.operators.similarity import mmr_select

    cands = [
        (9, 0, 0.5, [1.0, 0.0]),
        (2, 0, 0.5, [0.0, 1.0]),
    ]
    picks = mmr_select(cands, k=1)
    assert picks[0][1] == 2


def test_mmr_select_k_capped_by_candidates():
    from pyveb_spark.operators.similarity import mmr_select

    cands = [(1, 0, 0.9, [1.0, 0.0]), (2, 0, 0.1, [0.0, 1.0])]
    assert len(mmr_select(cands, k=10)) == 2
