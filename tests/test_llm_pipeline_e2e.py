"""End-to-end LLM training-data pipeline through the declarative spec:

    read → quality filter → boilerplate (chunk-dup) drop → decontaminate
    → temperature mix → pack → merge-sink write

One lazy Spark plan start-to-finish (the engine's whole point vs the
reference's staged processes), exercising the operator families together
rather than in isolation."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from pyveb_spark.operators.dedup import chunk_stats, contamination_check
from pyveb_spark.operators.packing import pack_spans
from pyveb_spark.operators.sampling import ranked_quota_sample
from pyveb_spark.operators.text import quality_score
from pyveb_spark.plans.pipeline import Pipeline, PipelineStep
from pyveb_spark.sinks.merge import ParquetMergeSink
from pyveb_spark.sources.readers import read_table


def test_llm_pipeline_end_to_end(spark, sf_dir):
    bench = (
        read_table(spark, sf_dir, "documents")
        .where(F.col("doc_id") < 20)
        .select(F.col("doc_id").alias("bench_id"), F.col("text").alias("btext"))
    )

    def src(s):
        return read_table(s, sf_dir, "documents").where(F.col("doc_id") >= 20)

    def drop_low_quality(df):
        return (
            quality_score(df, "text")
            .where(F.col("quality_score") > 0.2)
            .select(*df.columns)
        )

    def drop_boilerplate(df):
        stats = chunk_stats(df, "doc_id", "text", chunk_tokens=12)
        bad = stats.where(F.col("dup_frac") > 0.5).select("doc_id")
        return df.join(bad, "doc_id", "left_anti")

    def decontaminate(df):
        dirty = contamination_check(
            df, bench, "doc_id", "text", "bench_id", "btext", n=5
        ).select("doc_id").distinct()
        return df.join(dirty, "doc_id", "left_anti")

    def rebalance(df):
        counts = df.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
        mn = counts.agg(F.min("n").alias("mn"))
        # τ=0.5: every source shrinks to the geometric mean of its size
        # and the smallest source's (rates ∝ n^-1/2)
        quotas = counts.crossJoin(F.broadcast(mn)).select(
            "source",
            F.floor(F.sqrt((F.col("n") * F.col("mn")).cast("double"))).alias(
                "quota"
            ),
        )
        return ranked_quota_sample(df, "source", ["doc_id"], quotas)

    tmp = tempfile.mkdtemp(prefix="llm_e2e_")
    sink = ParquetMergeSink(spark, os.path.join(tmp, "clean_docs"))
    pipe = Pipeline(
        name="llm-clean",
        source=src,
        steps=[
            PipelineStep("quality", drop_low_quality),
            PipelineStep("boilerplate", drop_boilerplate),
            PipelineStep("decontaminate", decontaminate),
            PipelineStep("rebalance", rebalance),
        ],
        sink=lambda df: sink.overwrite(df),
    )
    out = pipe.run(spark)

    n_in = src(spark).count()
    n_out = sink.read().count()
    assert 0 < n_out <= n_in
    assert n_out == out.count()

    # decontamination actually held: no surviving doc shares a 5-gram
    survivors = sink.read()
    assert (
        contamination_check(
            survivors, bench, "doc_id", "text", "bench_id", "btext", n=5
        ).count()
        == 0
    )

    # rebalance held: each source's output is within its sqrt-quota
    per_src = {
        r.source: r.n
        for r in survivors.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert len(per_src) >= 2  # rare sources survive temperature mixing
    # and the dominant source was actually downsampled (τ=0.5 is not a
    # no-op): its surviving count is strictly below its pre-rebalance size
    pre = decontaminate(drop_boilerplate(drop_low_quality(src(spark))))
    pre_src = {
        r.source: r.n
        for r in pre.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    big = max(pre_src, key=pre_src.get)
    assert per_src[big] < pre_src[big]

    # the cleaned corpus packs into exact 512-token windows
    packed = pack_spans(
        survivors.select(
            "doc_id", F.size(F.split("text", " ")).alias("n_tokens")
        ),
        "n_tokens",
        "doc_id",
        budget=512,
    )
    per_pack = (
        packed.groupBy("pack_id")
        .agg(F.sum("span_tokens").alias("t"))
        .orderBy("pack_id")
        .collect()
    )
    assert all(r.t == 512 for r in per_pack[:-1]) and len(per_pack) > 1

    # idempotent re-run: same pipeline, same output set (materialize the
    # first run's ids BEFORE the re-run swaps the files out)
    first_ids = {r.doc_id for r in survivors.select("doc_id").collect()}
    pipe.run(spark)
    again = {r.doc_id for r in sink.read().select("doc_id").collect()}
    assert again == first_ids


def test_tar_to_image_dedup_e2e(spark, tmp_path):
    """WebDataset path end-to-end: synth BMPs packed into tar shards ->
    read_tar_members -> real-byte dHash kernel -> banded Hamming pairs.
    Members that carried the same seed must pair at distance 0."""
    import io
    import tarfile

    from pyspark.sql import functions as F

    from pyveb_spark.operators.dedup import hamming_pairs
    from pyveb_spark.operators.multimodal import (
        dhash_images,
        synth_bmp_pixels,
    )
    from pyveb_spark.sources.readers import read_tar_members

    # 12 images, seeds repeat every 4 -> 3 copies of each of 4 images
    src = spark.createDataFrame(
        [(i, i % 4) for i in range(12)], "img_id long, seed int"
    ).select("img_id", synth_bmp_pixels(F.col("seed")).alias("payload"))
    rows = src.collect()
    for shard in range(2):
        with tarfile.open(tmp_path / f"shard-{shard}.tar", "w") as tf:
            for r in rows[shard * 6:(shard + 1) * 6]:
                info = tarfile.TarInfo(f"{r.img_id}.bmp")
                data = bytes(r.payload)
                info.size = len(data)
                tf.addfile(info, io.BytesIO(data))

    members = read_tar_members(spark, str(tmp_path), glob="*.tar")
    assert members.count() == 12
    imgs = members.select(
        F.replace(F.col("member"), F.lit(".bmp"), F.lit(""))
        .cast("long")
        .alias("img_id"),
        F.col("content").alias("payload"),
    )
    fp = dhash_images(imgs, "img_id", "payload")
    pairs = hamming_pairs(fp, "img_id", "dhash", max_hamming=2, bands=4,
                          bits=60)
    got = {(r.img_id_a, r.img_id_b) for r in
           pairs.where("hamming = 0").collect()}
    expect = {
        (a, b)
        for a in range(12)
        for b in range(12)
        if a < b and a % 4 == b % 4
    }
    assert got >= expect  # every same-seed pair found (banding lossless)


def test_ingest_recipe_e2e_conservation_and_sink(spark, sf_dir):
    """q180 composed ingest: every batch doc gets exactly one terminal
    status (conservation), the pack count obeys the pack_spans invariant
    (ceil(tokens/512)), and re-admitting the same batch through the merge
    sink is idempotent — the property a daily 100 TB ingest run relies on."""
    from pyveb_spark.operators.dedup import (
        fuzzy_decontaminate,
        minhash_lsh_index,
        minhash_lsh_lookup,
    )
    from pyveb_spark.operators.text import gopher_quality_filter
    from pyveb_spark.queries import q180_ingest_recipe

    rows = {r["status"]: r for r in q180_ingest_recipe(spark, sf_dir).collect()}
    assert set(rows) == {"admitted", "contaminated", "duplicate", "quarantined"}

    d = read_table(spark, sf_dir, "documents")
    is_eval = F.col("doc_id") % 10 == 0
    batch = d.where((F.col("doc_id") < 100) & ~is_eval)
    n_batch = batch.count()
    assert sum(r["n_docs"] for r in rows.values()) == n_batch

    adm = rows["admitted"]
    expected_packs = (adm["n_tokens"] + 511) // 512 if adm["n_docs"] else 0
    assert adm["n_packs"] == expected_packs

    # replay the stages to recover the admitted doc ids, then sink them
    gated = gopher_quality_filter(batch, text_col="text", min_words=30)
    pass1 = gated.where(F.col("keep")).select("doc_id", "text")
    corpus = d.where((F.col("doc_id") >= 100) & ~is_eval).select("doc_id", "text")
    index = minhash_lsh_index(corpus, "doc_id", "text")
    dup_ids = (
        minhash_lsh_lookup(pass1, index, "doc_id", "text", threshold=0.8)
        .select(F.col("doc_id_new").alias("doc_id")).distinct()
    )
    pass2 = pass1.join(dup_ids, "doc_id", "left_anti")
    eval_docs = d.where(is_eval).select("doc_id", "text")
    contam = fuzzy_decontaminate(
        pass2, eval_docs, "doc_id", "text", threshold=0.7
    ).select("doc_id")
    admitted = pass2.join(contam, "doc_id", "left_anti")
    assert admitted.count() == adm["n_docs"]

    path = tempfile.mkdtemp(prefix="ingest_recipe_")
    try:
        sink = ParquetMergeSink(spark, path)
        sink.overwrite(admitted)
        n1 = sink.read().count()
        sink.upsert(admitted, keys=["doc_id"])  # same batch: must not grow
        assert sink.read().count() == n1 == adm["n_docs"]
    finally:
        import shutil

        shutil.rmtree(path, ignore_errors=True)
