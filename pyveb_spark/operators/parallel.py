"""Partition-parallel map with per-item error capture.

Reference parity: ``common.multithreading_list`` / ``common.multiprocessing``
(``common.py:137-208``) fan a Python function over a list on ONE machine,
returning ``{'results': [...], 'errors': [...]}`` dicts per item (with
``chunker`` ``common.py:126-135`` sizing the batches). That pattern caps out
at one node; here the same contract is a ``mapInPandas`` stage: the function
runs once per row *on executors*, failures don't kill the job — they land in
an ``error`` column for quarantine/retry — and parallelism is the number of
partitions, not a thread-pool size.

Scale notes: use ``repartition(n)`` before calling to set the fan-out width
(↔ the reference's pool size); keep ``fn`` free of driver state (it is
pickled to executors). For HTTP fan-out specifically, prefer
``sources.rest.rest_fanout`` which adds retry/backoff and param echo.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import StringType, StructField, StructType

__all__ = ["distributed_map"]


def distributed_map(
    df: DataFrame,
    fn: Callable[[dict], str | None],
    result_col: str = "result",
    error_col: str = "error",
) -> DataFrame:
    """Apply ``fn(row_dict) -> str`` to every row, capturing exceptions.

    Output = input columns + ``result`` (fn's return, stringified) +
    ``error`` (NULL on success, ``repr(exc)`` on failure) — the Spark form
    of the reference's results/errors dicts. Rows never disappear: callers
    split successes from failures with a filter, exactly like the reference
    consumed its two dicts.
    """
    out_schema = StructType(
        df.schema.fields
        + [
            StructField(result_col, StringType()),
            StructField(error_col, StringType()),
        ]
    )

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            results, errors = [], []
            for rec in pdf.to_dict("records"):
                try:
                    v = fn(rec)
                    results.append(None if v is None else str(v))
                    errors.append(None)
                except Exception as exc:  # per-item capture, job survives
                    results.append(None)
                    errors.append(repr(exc))
            pdf = pdf.copy()
            pdf[result_col] = results
            pdf[error_col] = errors
            yield pdf

    return df.mapInPandas(_run, schema=out_schema)
