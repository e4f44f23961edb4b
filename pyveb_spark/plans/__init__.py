from pyveb_spark.plans.config import (
    PipelineConfig,
    find_config_file,
    parse_cli,
    partition_key,
    partition_values,
)
from pyveb_spark.plans.pipeline import Pipeline, PipelineStep

__all__ = [
    "Pipeline",
    "PipelineStep",
    "PipelineConfig",
    "find_config_file",
    "parse_cli",
    "partition_key",
    "partition_values",
]
