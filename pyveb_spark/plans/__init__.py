from pyveb_spark.plans.pipeline import Pipeline, PipelineStep

__all__ = ["Pipeline", "PipelineStep"]
