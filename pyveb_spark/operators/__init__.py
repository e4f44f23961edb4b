"""Operator library — pure ``DataFrame → DataFrame`` functions.

Every operator is usable with ``df.transform(op, ...)`` and is designed
partition-wise: no ``collect()``, no driver-side loops, shuffles only where
semantics require one. See per-module docstrings for reference citations.
"""

from pyveb_spark.operators.schema import (
    apply_schema,
    drop_cols,
    enforce_schema,
    reindex_cols,
    rename_columns,
    sanitize_column_names,
)
from pyveb_spark.operators.cleaning import (
    add_metadata,
    ascii_sanitize,
    clean_old_dates,
    nan_to_null,
    parse_timestamp,
)
from pyveb_spark.operators.nested import (
    argmax_in_array,
    explode_column,
    filter_array,
    flatten_struct,
    from_json_column,
    to_json_column,
)
from pyveb_spark.operators.sets import unite_by_name

__all__ = [
    "apply_schema",
    "drop_cols",
    "enforce_schema",
    "reindex_cols",
    "rename_columns",
    "sanitize_column_names",
    "add_metadata",
    "ascii_sanitize",
    "clean_old_dates",
    "nan_to_null",
    "parse_timestamp",
    "argmax_in_array",
    "explode_column",
    "filter_array",
    "flatten_struct",
    "from_json_column",
    "to_json_column",
    "unite_by_name",
]
