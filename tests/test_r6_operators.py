"""Round-6 operator tests: conditional vocab broadcasts, lakehouse
dialects, streaming state bounds."""

from __future__ import annotations

import json
import os
import tempfile

import pytest
from pyspark.sql import functions as F


def test_stream_state_stays_bounded_across_many_batches(spark):
    """The watermark-bounded-state claim, MEASURED (VERDICT r5 item 6):
    replay the events table as 20+ time-ordered micro-batches
    (maxFilesPerTrigger=1) through dropDuplicatesWithinWatermark and
    assert from the per-batch stateOperators metrics that state rows
    PLATEAU at ≈ one watermark horizon instead of tracking cumulative
    input — an unbounded dedup would end holding every key it ever saw."""
    import sys

    sys.path.insert(0, "/root/repo/tools")
    from stream_state_probe import run_probe, stage_time_ordered_drops

    drops = tempfile.mkdtemp(prefix="state_drops_")
    schema, n_events = stage_time_ordered_drops(
        spark, "/root/testdata/sf0.001", drops, 20
    )
    rows = run_probe(spark, drops, schema, "dedup", "2 hours")
    assert len(rows) >= 20, "expected one stateful progress row per drop"
    assert sum(r["input_rows"] for r in rows) == n_events
    peak = max(r["state_rows"] for r in rows)
    # bounded: the peak is a small fraction of total keys processed
    # (every event_id is unique, so unbounded state would reach n_events)
    assert peak < 0.25 * n_events, (peak, n_events)
    # ...and eviction actually runs: by the last batches, removals keep
    # pace with ingestion instead of state accreting monotonically
    assert sum(r["evicted"] or 0 for r in rows) > 0.5 * n_events
    final = rows[-1]["state_rows"]
    assert final <= peak


def _analyzed_plan(df) -> str:
    # hints on a standalone frame live in the analyzed plan (the
    # optimizer prunes hints not attached to a join)
    return df._jdf.queryExecution().analyzed().toString()


def test_broadcast_if_bounded_gates_on_cap(spark):
    """joins.broadcast_if_bounded: hint under the cap, plain frame above
    it or with the cap disabled — the web-scale OOM guard for
    vocabulary-sized side tables (VERDICT r5 'What's wrong' #1)."""
    from pyveb_spark.operators.joins import (
        VOCAB_BROADCAST_CAP_CONF,
        broadcast_if_bounded,
    )

    vocab = spark.createDataFrame(
        [("x", 1), ("y", 2)], "token string, token_id int"
    )
    base = spark.conf.get(VOCAB_BROADCAST_CAP_CONF, None)
    try:
        # under the default cap: hinted
        assert "broadcast" in _analyzed_plan(
            broadcast_if_bounded(vocab, n_rows=2)
        ).lower()
        # known cardinality above the cap: NO hint
        spark.conf.set(VOCAB_BROADCAST_CAP_CONF, "1000")
        assert "broadcast" not in _analyzed_plan(
            broadcast_if_bounded(vocab, n_rows=10_000_000)
        ).lower()
        # cap <= 0 disables hints even for unknown cardinality
        spark.conf.set(VOCAB_BROADCAST_CAP_CONF, "0")
        assert "broadcast" not in _analyzed_plan(
            broadcast_if_bounded(vocab)
        ).lower()
    finally:
        if base is None:
            spark.conf.unset(VOCAB_BROADCAST_CAP_CONF)
        else:
            spark.conf.set(VOCAB_BROADCAST_CAP_CONF, base)


def test_token_kl_above_cap_still_correct(spark):
    """The above-cap (shuffle-join) branch of token_kl_divergence and
    dsir_importance_weights returns identical values to the hinted
    branch — the gate changes the physical strategy only."""
    from pyveb_spark.operators.joins import VOCAB_BROADCAST_CAP_CONF
    from pyveb_spark.operators.text import (
        dsir_importance_weights,
        token_kl_divergence,
    )

    df = spark.createDataFrame(
        [("a", "x x y"), ("b", "y z")], "source string, text string"
    )
    raw = spark.createDataFrame(
        [(1, "x y"), (2, "z z")], "doc_id long, text string"
    )
    tgt = spark.createDataFrame([("x y x",)], "text string")
    kl_hinted = sorted(
        token_kl_divergence(df, "source", "text").collect()
    )
    w_hinted = sorted(dsir_importance_weights(raw, tgt).collect())
    base = spark.conf.get(VOCAB_BROADCAST_CAP_CONF, None)
    try:
        spark.conf.set(VOCAB_BROADCAST_CAP_CONF, "0")
        assert sorted(
            token_kl_divergence(df, "source", "text").collect()
        ) == kl_hinted
        assert sorted(dsir_importance_weights(raw, tgt).collect()) == w_hinted
    finally:
        if base is None:
            spark.conf.unset(VOCAB_BROADCAST_CAP_CONF)
        else:
            spark.conf.set(VOCAB_BROADCAST_CAP_CONF, base)


def test_repeat_weighted_dedup_weights(spark):
    """n_copies^alpha weighting with min-id representatives; alpha=0
    recovers hard dedup (weight 1), alpha=1 recovers keep-all mass."""
    from pyveb_spark.operators.dedup import repeat_weighted_dedup

    df = spark.createDataFrame(
        [(1, "aa"), (5, "aa"), (3, "aa"), (2, "bb"), (9, "aa"), (7, "bb")],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_copies, r.weight)
        for r in repeat_weighted_dedup(df, "doc_id", "text").collect()
    }
    assert got == {1: (4, 2.0), 2: (2, round(2 ** 0.5, 4))}
    hard = repeat_weighted_dedup(df, "doc_id", "text", alpha=0.0)
    assert {r.weight for r in hard.collect()} == {1.0}
    keep_all = repeat_weighted_dedup(df, "doc_id", "text", alpha=1.0)
    assert sum(r.weight for r in keep_all.collect()) == 6.0


def test_rrf_fuse_orders_and_counts(spark):
    """RRF: a doc ranked well in BOTH lists outranks a doc that tops only
    one (1/61 + 1/62 > 1/61); ties break on id; n_lists counts votes."""
    from pyveb_spark.operators.retrieval import rrf_fuse

    a = spark.createDataFrame(
        [(10, 1), (20, 2), (30, 3)], "doc_id long, rank int"
    )
    b = spark.createDataFrame(
        [(20, 1), (10, 2), (40, 3)], "doc_id long, rank int"
    )
    rows = rrf_fuse([a, b], k=4).collect()
    ids = [r.doc_id for r in rows]
    # 10 and 20 are symmetric (ranks {1,2}) -> tie broken by id
    assert ids == [10, 20, 30, 40]
    by_id = {r.doc_id: r for r in rows}
    assert by_id[10].n_lists == 2 and by_id[30].n_lists == 1
    assert by_id[10].rrf_score == by_id[20].rrf_score
    assert by_id[10].rrf_score == round(1 / 61 + 1 / 62, 6)
    with pytest.raises(ValueError, match="at least one"):
        rrf_fuse([])


def test_fim_transform_properties(spark):
    """FIM invariants: deterministic across runs, PSM pieces reassemble
    to the original token multiset, short docs and the AR complement pass
    through, cut points in range."""
    from pyveb_spark.operators.text import fim_transform

    df = spark.createDataFrame(
        [(i, " ".join(f"t{j}" for j in range(5 + i))) for i in range(40)]
        + [(100, "a b c"), (101, "only")],
        "doc_id long, text string",
    )
    out = fim_transform(df, "doc_id", "text", min_tokens=4, fim_rate=0.5)
    rows = out.collect()
    again = {r.doc_id: r.fim_text for r in out.collect()}
    fim_rows = [r for r in rows if r.fim]
    ar_rows = [r for r in rows if not r.fim]
    assert fim_rows and ar_rows                      # both views present
    for r in rows:
        assert again[r.doc_id] == r.fim_text         # retry-deterministic
    for r in rows:
        if r.doc_id in (100, 101):
            assert not r.fim and r.fim_text == r.text and r.c1 is None
    for r in fim_rows:
        n = len(r.text.split(" "))
        assert 1 <= r.c1 <= r.c2 <= n - 1
        body = r.fim_text
        assert body.startswith("<PRE>")
        pre, rest = body[5:].split("<SUF>", 1)
        suf, mid = rest.split("<MID>", 1)
        toks = r.text.split(" ")
        assert pre.split(" ") == toks[: r.c1]
        assert suf.split(" ") == toks[r.c2 :]
        expect_mid = toks[r.c1 : r.c2]
        assert (mid.split(" ") if mid else []) == expect_mid


def test_tar_shard_write_read_roundtrip(spark, tmp_path):
    """WebDataset EXPORT half: write_tar_shards packs (member, content)
    rows into tar archives that read_tar_members round-trips exactly;
    shard bytes are BIT-reproducible across a full re-write (normalized
    tar headers — the deterministic-output rule), rolling at
    max_members, manifest counts consistent."""
    import hashlib
    import os

    from pyveb_spark.sinks.writers import write_tar_shards
    from pyveb_spark.sources.readers import read_tar_members

    df = spark.createDataFrame(
        [(f"{i:04d}.txt", bytearray(f"payload-{i}".encode())) for i in range(57)],
        "member string, content binary",
    )
    out1 = str(tmp_path / "shards1")
    manifest = write_tar_shards(
        df, out1, max_members=10, n_shards=3
    ).collect()
    assert sum(m.n_members for m in manifest) == 57
    assert all(m.n_members <= 10 for m in manifest)
    assert sorted(m.shard for m in manifest) == sorted(os.listdir(out1))

    back = read_tar_members(spark, out1, glob="*.tar").collect()
    got = {r.member: bytes(r.content) for r in back}
    assert got == {f"{i:04d}.txt": f"payload-{i}".encode() for i in range(57)}

    # byte-reproducibility: a second independent write emits identical
    # shard files (same names, same md5s)
    out2 = str(tmp_path / "shards2")
    write_tar_shards(df, out2, max_members=10, n_shards=3).collect()

    def digests(d):
        return {
            f: hashlib.md5(open(os.path.join(d, f), "rb").read()).hexdigest()
            for f in sorted(os.listdir(d))
        }

    assert digests(out1) == digests(out2)


def test_k_core_known_graph(spark):
    """Hand-checkable peeling: a 4-clique with pendant chains — the
    2-core is exactly the clique (chains peel away in cascade); the
    5-core is empty; core degrees are measured INSIDE the core."""
    from pyveb_spark.operators.graph import k_core

    clique = [(a, b) for a in range(4) for b in range(4) if a < b]
    chains = [(3, 10), (10, 11), (11, 12), (0, 20)]
    df = spark.createDataFrame(clique + chains, "src long, dst long")
    core2 = {r.node: r.core_degree for r in k_core(df, 2).collect()}
    assert core2 == {0: 3, 1: 3, 2: 3, 3: 3}
    assert k_core(df, 5).count() == 0
    # duplicate + reversed + self-loop edges are tolerated
    noisy = spark.createDataFrame(
        clique + [(b, a) for a, b in clique] + [(7, 7)],
        "src long, dst long",
    )
    assert {r.node for r in k_core(noisy, 3).collect()} == {0, 1, 2, 3}
    with pytest.raises(ValueError, match="converge"):
        k_core(df, 2, max_rounds=0)


def test_fuzzy_decontamination_catches_paraphrase(spark):
    """A lightly reworded eval item shares no 8-gram run with the
    training doc (exact contamination_check misses it) but sits well
    above bigram-Jaccard 0.7 — exactly the leakage fuzzy_decontaminate
    exists to catch; an unrelated doc stays unflagged."""
    from pyveb_spark.operators.dedup import (
        contamination_check,
        fuzzy_decontaminate,
    )

    base = ("the quick brown fox jumps over the lazy dog while rain "
            "falls on the quiet green hill near the old stone bridge "
            "as evening light settles slowly across the wide silent valley "
            "and distant birds return home to rest before the long night")
    # reword every 7th token: every 8-gram run is broken (the exact
    # check's unit), but ~5/6 of the bigram set survives
    toks = base.split()
    for pos in range(6, len(toks), 7):
        toks[pos] = toks[pos] + "x"
    paraphrase = " ".join(toks)
    eval_docs = spark.createDataFrame(
        [(1000, base)], "doc_id long, text string"
    )
    corpus = spark.createDataFrame(
        [(1, paraphrase), (2, "completely unrelated text about spark sql")],
        "doc_id long, text string",
    )
    flagged = {r.doc_id: r for r in fuzzy_decontaminate(
        corpus, eval_docs, "doc_id", "text", threshold=0.5
    ).collect()}
    assert set(flagged) == {1}
    assert flagged[1].n_eval_matches == 1
    assert flagged[1].max_jaccard >= 0.5
    exact = contamination_check(
        corpus,
        eval_docs.select(
            F.col("doc_id").alias("bench_id"), F.col("text").alias("btext")
        ),
        "doc_id", "text", "bench_id", "btext", n=8,
    )
    assert exact.count() == 0  # the paraphrase evades the exact check


def test_stream_state_bounded_under_zipf_hot_key_skew(spark):
    """The r6 probe measured UNIFORM key rates; a real 100 TB/day feed is
    Zipf-distributed with a hot key (bot user / default tenant). Re-key
    the replay with Zipf(1) + a 30% hot key and assert the same bounds:
    state plateaus at ≈ one watermark horizon of DISTINCT keys (far below
    input — duplicates collapse), eviction keeps pace with ingestion, and
    the run survives the hammered state partition (VERDICT r6 item 7)."""
    import sys

    sys.path.insert(0, "/root/repo/tools")
    from stream_state_probe import run_probe, stage_time_ordered_drops

    drops = tempfile.mkdtemp(prefix="skew_drops_")
    schema, n_events = stage_time_ordered_drops(
        spark, "/root/testdata/sf0.001", drops, 20, skew=0.3
    )
    assert "skew_key" in schema.fieldNames()
    staged = spark.read.parquet(os.path.join(drops, "*.parquet"))
    hot_share = staged.agg(
        F.sum((F.col("skew_key") == 0).cast("long")) / F.count(F.lit(1))
    ).first()[0]
    assert hot_share >= 0.25, hot_share  # the hot key really is hot

    rows = run_probe(
        spark, drops, schema, "dedup", "2 hours", key_cols=["skew_key"]
    )
    assert len(rows) >= 20
    assert sum(r["input_rows"] for r in rows) == n_events
    peak = max(r["state_rows"] for r in rows)
    # bounded DESPITE the hot key: dedup state holds distinct keys in the
    # horizon, so skew shrinks it (duplicate keys collapse) rather than
    # growing it — peak must stay a small fraction of input
    assert peak < 0.15 * n_events, (peak, n_events)
    # eviction runs: watermark removals happen across the replay
    assert sum(r["evicted"] or 0 for r in rows) > 0
    assert rows[-1]["state_rows"] <= peak
