"""Set operations.

Reference parity (SURVEY.md §2.8): ``_unite_dfs``
(``spark_client.py:430-432``) folds ``unionByName(allowMissingColumns=True)``
over a file list; except/intersect existed only as generated merge SQL.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame

__all__ = ["unite_by_name"]


def unite_by_name(dfs: Sequence[DataFrame], allow_missing: bool = True) -> DataFrame:
    """Union any number of frames by column name, tolerating schema drift
    ↔ ``spark_client.py:430-432``. Missing columns become NULL.

    Scale note: Spark unions are plan-level (no shuffle); N inputs produce
    one N-child Union node, and AQE coalesces small partitions afterwards.
    """
    if not dfs:
        raise ValueError("unite_by_name requires at least one DataFrame")
    out = dfs[0]
    for df in dfs[1:]:
        out = out.unionByName(df, allowMissingColumns=allow_missing)
    return out
