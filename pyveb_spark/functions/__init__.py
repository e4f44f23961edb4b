"""Scalar-function surface.

The engine exposes the full ``pyspark.sql.functions`` namespace — the
reference's observed scalar usage (SURVEY.md §2.10: trim/lower/isin,
regexp_replace/extract, split, when/otherwise, isnan, to_json/from_json,
input_file_name, casts) is all built-in. This module adds only the
reference-semantic helpers that compose several builtins.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["null_if_blank", "clamp", "safe_div", "epoch_us"]


def null_if_blank(col: Column) -> Column:
    """'' / whitespace-only → NULL (the reference's nan_to_null string case,
    ``spark_client.py:463-481``, as a scalar)."""
    return F.when(F.length(F.trim(col)) == 0, F.lit(None)).otherwise(col)


def clamp(col: Column, lo, hi) -> Column:
    return F.least(F.greatest(col, F.lit(lo)), F.lit(hi))


def safe_div(num: Column, den: Column) -> Column:
    """NULL-on-zero division (Redshift-style NULLIF(den,0) divide)."""
    return num / F.nullif(den, F.lit(0))


def epoch_us(col: Column) -> Column:
    """Timestamp → exact integer microseconds (deterministic cross-engine
    representation used throughout the oracle-checked queries)."""
    return F.unix_micros(col)
