"""Tests: config-driven pipeline spec, driver-side connectors, DDL extras
(Flyway migrations, COPY CSV) — the SURVEY §2.13 / §2.1-§2.2 driver-side
parity surface."""

from __future__ import annotations

import os
import tempfile
from datetime import datetime, timezone

import pytest

from pyveb_spark.plans.config import (
    PipelineConfig,
    find_config_file,
    parse_cli,
    partition_key,
    partition_values,
)
from pyveb_spark.plans.ddl import (
    warehouse_copy_csv,
    write_migration,
)
from pyveb_spark.sources.connectors import (
    ftp_upload,
    match_filename,
    sharepoint_download,
    webdriver_download,
)

DT = datetime(2020, 1, 5, 7, 8, 9, tzinfo=timezone.utc)


def test_partition_key_granularities():
    # config.py:77-106 semantics: zero-padded, nested down to granularity
    assert partition_key(DT, "day") == "year=2020/month=01/day=05"
    assert partition_key(DT, "second") == (
        "year=2020/month=01/day=05/hour=07/minute=08/second=09"
    )
    assert partition_values(DT, "month") == {"year": "2020", "month": "01"}
    with pytest.raises(ValueError):
        partition_key(DT, "week")


def test_parse_cli_contract():
    args = parse_cli(
        [
            "--env", "prd", "--type", "incremental",
            "-d", "2020-01-05T07:08:09+00:00", "--task", "load_x",
        ]
    )
    assert args.env == "prd" and args.pipeline_type == "incremental"
    assert args.execution_datetime == DT
    with pytest.raises(SystemExit):
        parse_cli(["--env", "prod", "--type", "incremental", "-d", "2020-01-01"])
    with pytest.raises(SystemExit):
        parse_cli(["--env", "prd", "--type", "incremental", "-d", "not-a-date"])


def test_config_resolution_and_required_keys(tmp_path):
    cfg_yaml = tmp_path / "config.yml"
    cfg_yaml.write_text(
        """
general:
  required_source_keys: [path]
source:
  load_x:
    local: {path: /tmp/in, fmt: parquet}
    prd:   {path: s3://bucket/in}
target:
  load_x:
    local: {table: sch.t}
"""
    )
    cfg = PipelineConfig.from_yaml("local", task="load_x", path=str(cfg_yaml))
    assert cfg.resolve("source")["path"] == "/tmp/in"
    prd = PipelineConfig.from_yaml("prd", task="load_x", path=str(cfg_yaml))
    assert prd.resolve("source") == {"path": "s3://bucket/in"}
    with pytest.raises(KeyError):
        PipelineConfig(
            env="local", task="load_x",
            raw={"source": {"load_x": {"local": {"fmt": "csv"}}},
                 "general": {"required_source_keys": ["path"]}},
        ).resolve("source")
    # upward search (config.py:37-62)
    sub = tmp_path / "a" / "b"
    sub.mkdir(parents=True)
    assert find_config_file(str(sub)) == str(cfg_yaml)


def test_match_filename_fuzzy():
    files = ["Sales Report 2024-01.xlsx", "HR данные.xlsx", "notes.txt"]
    assert match_filename("sales report 2024_01.xlsx", files) == files[0]
    assert match_filename("zzzz", files, cutoff=0.9) is None


def test_ftp_upload_fake_transport(tmp_path):
    sent = {}

    class FakeConn:
        def storbinary(self, cmd, fh):
            sent[cmd] = fh.read()

        def quit(self):
            sent["closed"] = True

    src = tmp_path / "f.csv"
    src.write_bytes(b"a;b\n1;2\n")
    name = ftp_upload(
        str(src), "f.csv", "h", "u", "p", env_prefix="prd",
        make_conn=lambda: FakeConn(),
    )
    assert name == "prd_f.csv"
    assert sent["STOR prd_f.csv"] == b"a;b\n1;2\n" and sent["closed"]


def test_sharepoint_download_fake_client(tmp_path):
    class FakeClient:
        def list_files(self, folder):
            return ["Monthly Export v2.csv", "other.bin"]

        def download(self, folder, name):
            return b"payload"

    dest = sharepoint_download(
        "https://sp", "Shared", "monthly export.csv", str(tmp_path),
        client=FakeClient(),
    )
    assert dest.endswith("Monthly Export v2.csv")
    assert open(dest, "rb").read() == b"payload"
    with pytest.raises(NotImplementedError):
        sharepoint_download("https://sp", "Shared", "x", str(tmp_path))


def test_sharepoint_upload_fake_client(tmp_path):
    from pyveb_spark.sources.connectors import sharepoint_upload

    uploaded = {}

    class FakeClient:
        def upload(self, folder, name, data):
            uploaded[(folder, name)] = data

    src = tmp_path / "report.csv"
    src.write_bytes(b"a;b\n1;2\n")
    name = sharepoint_upload(
        str(src), "Shared", client=FakeClient(), name_suffix="2024-01-01"
    )
    assert name == "report_2024-01-01.csv"
    assert uploaded[("Shared", name)] == b"a;b\n1;2\n"
    with pytest.raises(NotImplementedError):
        sharepoint_upload(str(src), "Shared")


def test_webdriver_requires_driver():
    # implemented with an injectable driver (see tests/test_harvest.py for
    # the behavioral suite); calling without one is a signature error
    with pytest.raises(TypeError):
        webdriver_download("https://x", "/tmp")


def test_write_migration_versioning(tmp_path):
    p1 = write_migration("CREATE TABLE a(i INT);", str(tmp_path), "create a")
    p2 = write_migration("ALTER TABLE a ADD j INT;", str(tmp_path), "add j!")
    assert os.path.basename(p1) == "V1__create_a.sql"
    assert os.path.basename(p2) == "V2__add_j.sql"
    p9 = write_migration("X;", str(tmp_path), "pin", version=9)
    p10 = write_migration("Y;", str(tmp_path), "next")
    assert os.path.basename(p9) == "V9__pin.sql"
    assert os.path.basename(p10) == "V10__next.sql"
    assert open(p1).read().endswith(";\n")


def test_warehouse_copy_csv_statement():
    sql = warehouse_copy_csv(
        "sch.t", ["a", "b (EUR)"], "s3://b/stage/f.csv", "arn:role"
    )
    assert 'COPY sch.t ("a", "b_EUR")' in sql
    assert "CSV DELIMITER ';'" in sql and "EMPTYASNULL" in sql
    assert "TIMEFORMAT" in sql and sql.rstrip().endswith(";")


def test_pipeline_from_config_runs(spark, tmp_path):
    """Config → Pipeline → one Spark job (SURVEY §3.1 new-engine shape)."""
    from pyspark.sql import functions as F

    from pyveb_spark.operators.cleaning import add_metadata
    from pyveb_spark.plans.pipeline import Pipeline, PipelineStep

    cfg = PipelineConfig(
        env="local",
        task="t",
        raw={"source": {"t": {"local": {"path": "/root/testdata/sf0.001/region.parquet"}}}},
    )
    src = cfg.resolve("source")
    out = str(tmp_path / "out")
    pipe = Pipeline(
        name="t",
        source=lambda s: s.read.parquet(src["path"]),
        steps=[PipelineStep("meta", add_metadata)],
        sink=lambda df: df.write.mode("overwrite").parquet(out),
    )
    res = pipe.run(spark)
    assert res.count() == 5
    back = spark.read.parquet(out)
    assert "META_processing_date_utc" in back.columns


def test_schema_evolution_sql_add_alter_drop():
    from pyspark.sql.types import (
        DoubleType,
        FloatType,
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from pyveb_spark.plans.ddl import schema_evolution_sql

    old = StructType(
        [
            StructField("id", IntegerType()),
            StructField("Name", StringType()),
            StructField("amount", FloatType()),
            StructField("legacy_flag", IntegerType()),
        ]
    )
    new = StructType(
        [
            StructField("id", LongType()),       # int already widens to
            StructField("name", StringType()),   # BIGINT -> no-op; name
            StructField("amount", DoubleType()),  # match case-insensitive
            StructField("score", DoubleType()),  # added
        ]
    )
    stmts = schema_evolution_sql(old, new, "wh.t")
    assert set(stmts) == {
        'ALTER TABLE wh.t ALTER COLUMN "amount" TYPE DOUBLE PRECISION;',
        'ALTER TABLE wh.t ADD COLUMN "score" DOUBLE PRECISION;',
    }
    # drops are opt-in and come last
    with_drops = schema_evolution_sql(old, new, "wh.t", allow_drops=True)
    assert with_drops[-1] == 'ALTER TABLE wh.t DROP COLUMN "legacy_flag";'
    assert len(with_drops) == 3
    # fixpoint: identical schemas emit nothing
    assert schema_evolution_sql(new, new, "wh.t") == []
