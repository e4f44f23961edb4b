"""Schema enforcement / projection operators.

Reference parity (SURVEY.md §2.3): the reference repairs schema drift from
streamed extracts (all-NULL columns flip Parquet physical types,
``spark_client.py:108-113``) with strict casts (``enforce_schema``,
``spark_client.py:418-428``), lenient reorder+try_cast (``apply_schema``,
``spark_client.py:236-264``) and five row-level Python UDF repairs
(``spark_client.py:269-319``). Here every repair is a native Catalyst
expression — ``cast`` / ``try_cast`` — so reads stay inside whole-stage
codegen and columns still prune at the scan.
"""

from __future__ import annotations

import re
from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DataType, StructType

__all__ = [
    "enforce_schema",
    "apply_schema",
    "reindex_cols",
    "rename_columns",
    "drop_cols",
    "sanitize_column_names",
]

# Types where the reference used lenient casts (invalid → NULL) in
# apply_schema (spark_client.py:247-262): timestamp, boolean, integer, double.
_LENIENT_KINDS = ("timestamp", "boolean", "integer", "long", "double", "date")


def _try_cast(col: Column, dtype: DataType) -> Column:
    return col.try_cast(dtype)


def enforce_schema(df: DataFrame, schema: StructType) -> DataFrame:
    """Strict cast-project: every schema field cast to its type, in schema
    order. ↔ ``spark_client.py:418-428``. Missing columns raise (same as the
    reference's ``df[col]`` access)."""
    return df.select(
        *[F.col(f.name).cast(f.dataType).alias(f.name) for f in schema.fields]
    )


def apply_schema(df: DataFrame, schema: StructType, strict_strings: bool = True) -> DataFrame:
    """Lenient reorder + cast: columns projected in schema order; lenient
    kinds use ``try_cast`` (invalid values → NULL, matching the reference's
    UDF semantics at ``spark_client.py:247-262``); other types cast strictly.

    Columns present in the schema but absent from ``df`` are added as typed
    NULLs (the drift case ``unionByName(allowMissingColumns=True)`` produced
    in the reference's multi-file reads).
    """
    existing = set(df.columns)
    cols = []
    for f in schema.fields:
        if f.name not in existing:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
            continue
        src = F.col(f.name)
        if f.dataType.typeName() in _LENIENT_KINDS:
            cols.append(_try_cast(src, f.dataType).alias(f.name))
        elif not strict_strings:
            cols.append(_try_cast(src, f.dataType).alias(f.name))
        else:
            cols.append(src.cast(f.dataType).alias(f.name))
    return df.select(*cols)


def reindex_cols(df: DataFrame, order: Sequence[str]) -> DataFrame:
    """Reorder columns ↔ ``spark_client.py:434-443``."""
    return df.select(*order)


def rename_columns(df: DataFrame, mapping: Mapping[str, str]) -> DataFrame:
    """Bulk rename ↔ ``spark_client.py:552-561`` (aliased select there);
    ``withColumnsRenamed`` is a single plan node."""
    return df.withColumnsRenamed(dict(mapping))


def drop_cols(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Drop columns ↔ ``spark_client.py:542-549`` (loop there; one node here)."""
    return df.drop(*cols)


_SANITIZE_RE = re.compile(r"[()/,;{}\n\t=]")


def sanitize_column_names(df: DataFrame) -> DataFrame:
    """Strip ``()/,;{}\\n\\t=`` and map spaces→``_`` in column names
    ↔ ``parser.py:78,103``."""
    mapping = {}
    for c in df.columns:
        clean = _SANITIZE_RE.sub("", c).strip().replace(" ", "_")
        if clean != c:
            mapping[c] = clean
    return df.withColumnsRenamed(mapping) if mapping else df
