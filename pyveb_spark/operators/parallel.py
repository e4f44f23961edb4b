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

__all__ = ["distributed_map", "cogroup_apply"]


def cogroup_apply(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    fn: Callable[[pd.DataFrame, pd.DataFrame], pd.DataFrame],
    schema: StructType | str,
) -> DataFrame:
    """Grouped two-table pandas transform: for every key group, ``fn``
    receives the left and right rows of that group as pandas DataFrames
    (either may be empty — full-outer grouping) and returns the output
    rows. This is the ``applyInPandas`` cogroup — the escape hatch for
    per-key logic that genuinely needs both sides materialized together
    (custom reconciliation, per-entity model scoring against history,
    irregular as-of logic the native ``asof_join`` can't express).

    Completes the §2.12 Arrow-UDF matrix: mapInPandas (stream-through),
    applyInPandas (one-table groups), cogroup (two-table groups). Both
    inputs shuffle once on ``keys``; each group must fit one executor's
    memory — the same contract (and the same reason to prefer native
    joins when they suffice) as every grouped-pandas op.
    """
    return (
        left.groupBy(*keys)
        .cogroup(right.groupBy(*keys))
        .applyInPandas(fn, schema=schema)
    )


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
