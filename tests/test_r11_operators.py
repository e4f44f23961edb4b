"""Round-11 tranche: crash-safe MinHash index compaction (stage commits
before any destructive step; documented + detected recovery state),
loud failures replacing silent defaults (bucket count, LSH manifest
reads, local_df without Arrow)."""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import functions as F

from pyveb_spark.sources.readers import read_table

SF = "/root/testdata/sf0.001"


def _build_index(spark, tmp_path, table):
    from pyveb_spark.operators.dedup import minhash_lsh_index
    from pyveb_spark.sinks.index_store import (
        append_minhash_index,
        save_minhash_index,
    )

    d = read_table(spark, SF, "documents")
    save_minhash_index(
        minhash_lsh_index(d.where("doc_id >= 200"), "doc_id", "text"),
        table,
        str(tmp_path / "hot"),
        path=str(tmp_path / "postings"),
    )
    append_minhash_index(
        minhash_lsh_index(
            d.where("doc_id >= 100 AND doc_id < 200"), "doc_id", "text"
        ),
        table,
    )
    return d.where(F.col("doc_id") < 50)


def _lookup(spark, tmp_path, table, batch):
    from pyveb_spark.operators.dedup import minhash_lsh_lookup
    from pyveb_spark.sinks.index_store import load_minhash_index

    idx, hot = load_minhash_index(spark, table, str(tmp_path / "hot"))
    return sorted(
        (r.doc_id_new, r.doc_id_corpus, round(r.jaccard, 9))
        for r in minhash_lsh_lookup(
            batch, idx, "doc_id", "text", threshold=0.8, hot_buckets=hot
        ).collect()
    )


def test_compact_minhash_failed_stage_write_loses_nothing(
    spark, tmp_path, monkeypatch
):
    """The ADVICE-r10 data-loss window: a failure during the expensive
    replacement write must leave the ORIGINAL table live and serving
    (previously the original was dropped first and the stage dropped in
    a finally — a mid-compaction crash lost both)."""
    from pyveb_spark.sinks import writers
    from pyveb_spark.sinks.index_store import compact_minhash_index

    table = f"t_crash_{uuid.uuid4().hex[:8]}"
    try:
        batch = _build_index(spark, tmp_path, table)
        before = _lookup(spark, tmp_path, table, batch)

        real = writers.write_bucketed_table

        def boom(*a, **kw):
            raise RuntimeError("injected mid-compaction failure")

        monkeypatch.setattr(writers, "write_bucketed_table", boom)
        with pytest.raises(RuntimeError, match="injected"):
            compact_minhash_index(
                spark, table, hot_path=str(tmp_path / "hot")
            )
        monkeypatch.setattr(writers, "write_bucketed_table", real)

        # original intact, stage gone, lookup identical
        assert spark.catalog.tableExists(table)
        assert not spark.catalog.tableExists(f"{table}__compact_stage")
        assert _lookup(spark, tmp_path, table, batch) == before
        # and a subsequent (un-sabotaged) compaction succeeds normally
        compact_minhash_index(spark, table, hot_path=str(tmp_path / "hot"))
        assert _lookup(spark, tmp_path, table, batch) == before
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        spark.sql(f"DROP TABLE IF EXISTS {table}__compact_stage")


def test_compact_minhash_crashed_swap_is_detected_and_recoverable(spark):
    """Simulate dying INSIDE the metadata swap (table dropped, stage
    committed): both compact_minhash_index and load_minhash_index must
    refuse with the recovery instruction, and the documented recovery
    (rename the stage back) must restore service."""
    from pyveb_spark.session import local_df
    from pyveb_spark.sinks.index_store import (
        compact_minhash_index,
        load_minhash_index,
    )
    from pyveb_spark.sinks.writers import write_bucketed_table

    table = f"t_swapcrash_{uuid.uuid4().hex[:8]}"
    stage = f"{table}__compact_stage"
    try:
        write_bucketed_table(
            local_df(
                spark,
                [(0, 7, "a"), (1, 9, "b")],
                "__band int, __h bigint, doc_id string",
            ),
            stage,
            ["__band", "__h"],
            num_buckets=4,
        )
        with pytest.raises(RuntimeError, match="RENAME TO"):
            compact_minhash_index(spark, table)
        with pytest.raises(RuntimeError, match="RENAME TO"):
            load_minhash_index(spark, table, "/nonexistent")
        # the documented one-line recovery
        spark.sql(f"ALTER TABLE {stage} RENAME TO {table}")
        assert spark.table(table).count() == 2
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        spark.sql(f"DROP TABLE IF EXISTS {stage}")


def test_compact_minhash_raises_on_unbucketed_table(spark):
    """'Num Buckets' is load-bearing for the zero-shuffle join property;
    a missing row must raise, never silently default to 8."""
    from pyveb_spark.session import local_df
    from pyveb_spark.sinks.index_store import compact_minhash_index

    table = f"t_nobuckets_{uuid.uuid4().hex[:8]}"
    try:
        local_df(
            spark, [(0, 1, "x")], "__band int, __h bigint, doc_id string"
        ).write.saveAsTable(table)
        with pytest.raises(ValueError, match="Num Buckets"):
            compact_minhash_index(spark, table)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_compact_minhash_missing_table_raises(spark):
    from pyveb_spark.sinks.index_store import compact_minhash_index

    with pytest.raises(ValueError, match="does not exist"):
        compact_minhash_index(spark, f"t_missing_{uuid.uuid4().hex[:8]}")


def test_load_lsh_index_corrupt_manifest_propagates(spark, tmp_path):
    """A manifest dir that EXISTS but fails to read must raise (the old
    bare-except mapped it to meta={}, indistinguishable from a
    pre-manifest artifact → silent wrong-plane hashing downstream)."""
    from pyveb_spark.session import local_df
    from pyveb_spark.sinks.index_store import load_lsh_index

    path = str(tmp_path / "lshidx")
    local_df(
        spark, [(0, [0.1, 0.2], 3)], "id int, vec array<double>, __b long"
    ).write.partitionBy("__b").parquet(path)
    meta_dir = tmp_path / "lshidx_meta"
    meta_dir.mkdir()
    (meta_dir / "garbage.parquet").write_text("this is not parquet")
    with pytest.raises(Exception):
        load_lsh_index(spark, path, with_meta=True)
    # absent manifest still reads as a pre-manifest artifact
    import shutil

    shutil.rmtree(meta_dir)
    df, meta = load_lsh_index(spark, path, with_meta=True)
    assert meta == {} and df.count() == 1


def test_local_df_raises_without_arrow(spark):
    """local_df's whole point is the LocalRelation; with Arrow disabled
    createDataFrame(pandas) silently degrades to the pickled-RDD path,
    so the helper must refuse instead."""
    from pyveb_spark.session import local_df

    key = "spark.sql.execution.arrow.pyspark.enabled"
    old = spark.conf.get(key)
    try:
        spark.conf.set(key, "false")
        with pytest.raises(ValueError, match="arrow"):
            local_df(spark, [(1,)], "x int")
    finally:
        spark.conf.set(key, old)
    assert local_df(spark, [(1,)], "x int").count() == 1
