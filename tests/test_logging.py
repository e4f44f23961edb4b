"""Triple-sink pipeline logger (reference logger.py parity)."""

from __future__ import annotations

import logging

import pytest

from pyveb_spark.plans.logging import (
    ColorFormatter,
    ObjectStoreLogShipper,
    PipelineLogger,
)


def _make(tmp_path, **kw):
    return PipelineLogger("etl_job.py", log_dir=str(tmp_path), **kw)


def test_triple_sink_levels_and_content(tmp_path, capsys):
    pl = _make(tmp_path, console_level="warning", file_level="debug",
               console_color=False)
    log = pl.get_logger()
    log.debug("dbg-line")
    log.warning("warn-line")
    pl.close()

    # console: warning only (level filter)
    out = capsys.readouterr().out
    assert "warn-line" in out and "dbg-line" not in out
    # file: both, no ANSI codes
    text = (tmp_path / "etl_job.log").read_text()
    assert "dbg-line" in text and "warn-line" in text and "\033[" not in text
    # buffer mirrors the file sink
    buf = pl.buffer.getvalue()
    assert "dbg-line" in buf and "warn-line" in buf


def test_console_color_codes_only_on_console(tmp_path, capsys):
    pl = _make(tmp_path, console_level="info", console_color=True)
    pl.get_logger().error("boom")
    pl.close()
    assert "\033[1;31m" in capsys.readouterr().out  # bold red for ERROR
    assert "\033[" not in pl.buffer.getvalue()


def test_named_logger_no_root_leak(tmp_path):
    pl = _make(tmp_path)
    log = pl.get_logger()
    assert log.name == "pyveb_spark.pipeline.etl_job"
    assert log.propagate is False  # records never reach the root logger
    assert logging.getLogger().handlers == logging.getLogger().handlers
    pl.close()


def test_reinit_does_not_stack_handlers(tmp_path):
    _make(tmp_path).close()
    pl = _make(tmp_path)
    assert len(pl.get_logger().handlers) == 3
    pl.close()


def test_invalid_inputs_raise(tmp_path):
    with pytest.raises(ValueError, match="console_output"):
        _make(tmp_path, console_output="pipe")
    with pytest.raises(ValueError, match="invalid log level"):
        _make(tmp_path, console_level="loud")


def test_env_keyed_format(tmp_path, monkeypatch, capsys):
    monkeypatch.setenv("PYVEB_LOG_FORMAT",
                       "%(color_on)sXX %(message)s%(color_off)s")
    pl = _make(tmp_path, console_color=False)
    pl.get_logger().info("fmt-check")
    pl.close()
    assert "XX fmt-check" in capsys.readouterr().out


def test_object_store_shipper_uses_injected_put(tmp_path):
    pl = _make(tmp_path, console_level="critical")
    pl.get_logger().info("ship-me")
    calls = []
    shipper = ObjectStoreLogShipper(
        pl, "logs-bucket", "runs/etl_job.log",
        put=lambda body, bucket, key: calls.append((body, bucket, key)),
    )
    n = shipper.send_logs()
    pl.close()
    assert n > 0 and len(calls) == 1
    body, bucket, key = calls[0]
    assert "ship-me" in body
    assert (bucket, key) == ("logs-bucket", "runs/etl_job.log")


def test_color_formatter_noncolor_has_empty_fields():
    rec = logging.LogRecord("n", logging.INFO, "p", 1, "m", (), None)
    line = ColorFormatter(False, fmt="%(color_on)s%(message)s%(color_off)s").format(rec)
    assert line == "m"


def test_pipeline_run_emits_step_records_and_ships(tmp_path, spark):
    """Pipeline.run wired to the triple-sink logger: every stage
    transition (source, step begin/end, sink begin/end, outcome) lands in
    the shippable buffer and the shipper uploads it at run end — the
    reference logged each stage this way (logger.py:33-135)."""
    from pyspark.sql import functions as F

    from pyveb_spark.plans.pipeline import Pipeline, PipelineStep

    pl = _make(tmp_path, console_level="critical")
    shipped = []
    shipper = ObjectStoreLogShipper(
        pl, "logs", "runs/p.log",
        put=lambda body, bucket, key: shipped.append(body),
    )
    sunk = []
    pipe = Pipeline(
        name="demo",
        source=lambda s: s.range(10),
        steps=[
            PipelineStep("double", lambda df: df.select((F.col("id") * 2).alias("id"))),
            PipelineStep("filter_small", lambda df, lo: df.where(F.col("id") >= lo), {"lo": 6}),
        ],
        sink=lambda df: sunk.append(df.count()),
        logger=pl,
        shipper=shipper,
    )
    out = pipe.run(spark)
    pl.close()
    assert sunk == [7] and out.count() == 7
    assert len(shipped) == 1
    body = shipped[0]
    for needle in (
        "run begin", "source loaded",
        "step double begin", "step double end",
        "step filter_small begin", "step filter_small end",
        "sink begin", "sink end", "run end status=ok",
    ):
        assert needle in body, f"missing record: {needle}"


def test_pipeline_run_failure_still_ships(tmp_path, spark):
    from pyveb_spark.plans.pipeline import Pipeline, PipelineStep

    pl = _make(tmp_path, console_level="critical")
    shipped = []
    shipper = ObjectStoreLogShipper(
        pl, "logs", "runs/f.log",
        put=lambda body, bucket, key: shipped.append(body),
    )

    def explode(df):
        raise RuntimeError("bad transform")

    pipe = Pipeline(
        name="boom",
        source=lambda s: s.range(3),
        steps=[PipelineStep("explode", explode)],
        logger=pl,
        shipper=shipper,
    )
    with pytest.raises(RuntimeError, match="bad transform"):
        pipe.run(spark)
    pl.close()
    assert len(shipped) == 1 and "run FAILED" in shipped[0]
