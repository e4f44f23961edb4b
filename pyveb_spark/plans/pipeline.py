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
    """

    name: str
    source: Callable[[SparkSession], DataFrame]
    steps: Sequence[PipelineStep] = ()
    sink: Callable[[DataFrame], None] | None = None

    def build(self, spark: SparkSession) -> DataFrame:
        df = self.source(spark)
        for step in self.steps:
            df = step.apply(df)
        return df

    def run(self, spark: SparkSession) -> DataFrame:
        df = self.build(spark)
        if self.sink is not None:
            self.sink(df)
        return df
