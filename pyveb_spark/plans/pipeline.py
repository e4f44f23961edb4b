"""Declarative pipeline spec: source → transforms → sink as one Spark job.

↔ the reference's config-driven driver (``config.py:111-259`` resolves a
``config.yml`` into general/source/transform/target sections;
``common.py:249-288`` is the CLI contract). The reference executed the three
stages as separate processes glued by S3 staging files; here a pipeline is
ONE lazy Spark plan — extract, transform and merge fuse into a single DAG,
so Catalyst pushes filters into the source scan and nothing is staged to
disk between stages.
"""

from __future__ import annotations

import logging
import time
from collections.abc import Callable, Sequence
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

__all__ = ["PipelineStep", "Pipeline"]


@dataclass
class PipelineStep:
    """One named transform: a pure ``DataFrame -> DataFrame`` callable plus
    kwargs, mirroring a ``transforms:`` list entry in the reference's
    config.yml."""

    name: str
    fn: Callable[..., DataFrame]
    kwargs: dict = field(default_factory=dict)

    def apply(self, df: DataFrame) -> DataFrame:
        return self.fn(df, **self.kwargs)


@dataclass
class Pipeline:
    """source → transforms → sink.

    ``source``: ``(spark) -> DataFrame``; ``sink``: ``(DataFrame) -> None``
    (e.g. a ``ParquetMergeSink`` method or ``write_parquet`` partial);
    ``steps``: ordered transform list. ``run`` returns the final DataFrame
    (pre-sink) so callers can test pipelines without writing.

    ``logger`` (a :class:`plans.logging.PipelineLogger` or a plain
    ``logging.Logger``) turns on per-stage transition records — source
    loaded, each step begin/end, sink begin/end, run outcome — the
    reference logged every stage this way (``logger.py:33-135``). Step
    timings are PLAN-construction times (stages fuse into one lazy DAG;
    execution happens at the sink), which the records say explicitly.
    ``shipper`` (an :class:`ObjectStoreLogShipper`) uploads the buffered
    records when the run ends, success or failure.
    """

    name: str
    source: Callable[[SparkSession], DataFrame]
    steps: Sequence[PipelineStep] = ()
    sink: Callable[[DataFrame], None] | None = None
    logger: object | None = None
    shipper: object | None = None

    def _log(self) -> logging.Logger | None:
        if self.logger is None:
            return None
        get = getattr(self.logger, "get_logger", None)
        return get() if callable(get) else self.logger

    def build(self, spark: SparkSession) -> DataFrame:
        log = self._log()
        df = self.source(spark)
        if log:
            log.info("pipeline %s: source loaded", self.name)
        for step in self.steps:
            if log:
                log.info("pipeline %s: step %s begin", self.name, step.name)
            t0 = time.perf_counter()
            df = step.apply(df)
            if log:
                log.info(
                    "pipeline %s: step %s end (%.1f ms plan time)",
                    self.name, step.name, (time.perf_counter() - t0) * 1e3,
                )
        return df

    def run(self, spark: SparkSession) -> DataFrame:
        log = self._log()
        if log:
            log.info("pipeline %s: run begin", self.name)
        try:
            df = self.build(spark)
            if self.sink is not None:
                if log:
                    log.info("pipeline %s: sink begin", self.name)
                t0 = time.perf_counter()
                self.sink(df)
                if log:
                    log.info(
                        "pipeline %s: sink end (%.1f ms)",
                        self.name, (time.perf_counter() - t0) * 1e3,
                    )
            if log:
                log.info("pipeline %s: run end status=ok", self.name)
            return df
        except Exception:
            if log:
                log.exception("pipeline %s: run FAILED", self.name)
            raise
        finally:
            if self.shipper is not None:
                # never let a log-upload failure mask the pipeline's own
                # outcome (shipping trouble is often correlated with the
                # failure being reported)
                try:
                    self.shipper.send_logs()
                except Exception:
                    if log:
                        log.exception(
                            "pipeline %s: log shipping failed", self.name
                        )
