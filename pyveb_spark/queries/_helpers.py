"""Shared helpers for the query-suite package."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pyveb_spark.operators.cleaning import clean_old_dates
from pyveb_spark.operators.joins import asof_join
from pyveb_spark.sources.readers import read_table


def _dec(col: str, prec: int = 12, scale: int = 2):
    return F.col(col).cast(f"decimal({prec},{scale})")


def _query_vec(e: DataFrame, vec_id: int = 0) -> list[float]:
    """Driver-side query vector for the ANN queries (one tiny lookup —
    the query point is model input, not data)."""
    row = e.where(F.col("vec_id") == vec_id).select("embedding").first()
    if row is None:
        raise ValueError(f"no embedding row with vec_id={vec_id}")
    return [float(x) for x in row[0]]
