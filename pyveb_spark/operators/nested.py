"""Nested / array / struct operators.

Reference parity (SURVEY.md §2.9): flatten_struct (``spark_client.py:483-491``),
explode_column incl. the stringified-list branch (``spark_client.py:505-540``),
higher-order array filter (``spark_client.py:493-503``), argmax-in-array
(``spark_client.py:321-328,385-395`` — a JSON-round-trip UDF there, a single
``max_by``-style expression here), JSON encode/decode (``spark_client.py:390-393``
— which re-inferred schema via an RDD pass; we use ``schema_of_json`` or a
caller-supplied schema, no RDD round-trip).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DataType, StructType

__all__ = [
    "flatten_struct",
    "explode_column",
    "filter_array",
    "argmax_in_array",
    "to_json_column",
    "from_json_column",
]


def flatten_struct(df: DataFrame, col: str) -> DataFrame:
    """Promote a struct column's fields to top level
    ↔ ``flatten_struct`` (``spark_client.py:483-491``)."""
    others = [c for c in df.columns if c != col]
    return df.select(*others, f"{col}.*")


def explode_column(df: DataFrame, col: str, keep_null_rows: bool = True) -> DataFrame:
    """Explode an ArrayType column, or a *stringified* list like
    ``"['a', 'b']"`` ↔ ``explode_column`` (``spark_client.py:505-540``).

    The reference strips ALL whitespace before splitting (documented quirk,
    ``spark_client.py:533`` — including whitespace inside tokens); we
    deliberately do NOT replicate that bug: tokens are trimmed individually.
    NULL/empty arrays keep their row via ``explode_outer`` (reference
    behavior documented at ``:508-527``).
    """
    dtype = df.schema[col].dataType
    if isinstance(dtype, ArrayType):
        arr = F.col(col)
    else:
        # "['a','b']" → strip brackets/quotes → split on commas → trim each;
        # "[]" / "" / NULL → NULL array (row kept by explode_outer)
        cleaned = F.trim(F.regexp_replace(F.col(col), r"[\[\]'\"]", ""))
        arr = F.transform(F.split(cleaned, ","), lambda x: F.trim(x))
        arr = F.when(F.length(cleaned) > 0, arr)
    fn = F.explode_outer if keep_null_rows else F.explode
    return df.withColumn(col, fn(arr))


def filter_array(df: DataFrame, col: str, predicate: Callable[[Column], Column]) -> DataFrame:
    """Higher-order array filter ↔ ``filter_empty_from_array``
    (``spark_client.py:493-503``: ``filter(arr, x -> size(x.field) > 0)``)."""
    return df.withColumn(col, F.filter(F.col(col), predicate))


def argmax_in_array(df: DataFrame, col: str, sort_field: str) -> DataFrame:
    """Pick the array element with the max ``sort_field``
    ↔ ``udf_filter_max_from_array`` (``spark_client.py:321-328,385-395``).

    The reference serialized the array to JSON, ran a Python UDF doing
    ``max(data, key=itemgetter(sort_field))``, then re-inferred the schema
    with an RDD pass. Here it's one Catalyst higher-order ``reduce`` —
    no UDF, no RDD, codegen-friendly, NULL-safe (empty array → NULL).
    """
    arr = F.col(col)
    return df.withColumn(
        col,
        F.reduce(
            arr,
            F.lit(None).cast(df.schema[col].dataType.elementType),
            # NULL-keyed elements never beat a comparable one: without the
            # middle clause a NULL-keyed accumulator absorbs (NULL > x is
            # NULL, so larger later elements could never replace it)
            lambda acc, x: F.when(
                acc.isNull()
                | (acc[sort_field].isNull() & x[sort_field].isNotNull())
                | (x[sort_field] > acc[sort_field]),
                x,
            ).otherwise(acc),
        ),
    )


def to_json_column(df: DataFrame, col: str) -> DataFrame:
    """Struct/array → JSON string ↔ ``F.to_json`` use at
    ``spark_client.py:390``."""
    return df.withColumn(col, F.to_json(F.col(col)))


def from_json_column(
    df: DataFrame, col: str, schema: DataType | str | None = None
) -> DataFrame:
    """JSON string → typed column ↔ ``spark_client.py:390-393``.

    The reference inferred the schema with ``spark.read.json(df.rdd...)`` —
    a full extra pass through the RDD API. If no schema is given we sample
    ONE value and use ``schema_of_json`` (constant-foldable), which covers
    the reference's use case (homogeneous API payloads) without the pass.
    """
    if schema is None:
        sample = (
            df.where(F.col(col).isNotNull()).select(col).limit(1).collect()
        )
        if not sample:
            return df
        schema = F.schema_of_json(F.lit(sample[0][0]))
    return df.withColumn(col, F.from_json(F.col(col), schema))
