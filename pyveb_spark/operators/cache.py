"""Bounded plan-keyed cache slots for operators that read an expensive
intermediate more than once inside ONE lazy plan.

Several operators are algebraically forced to scan the same derived frame
multiple times — PageRank reads the edge list once per iteration, triangle
counting reads the canonical edge set for degrees AND the closing join,
TF-IDF reads postings for norms AND scores, association rules read the
(basket, item) pairs for marginals AND the pair join. Without a cache,
Spark's lazy evaluation recomputes the full upstream pipeline per read.

``cached_once(df, slot)`` keeps AT MOST ONE persisted frame per named
slot per process: a new call whose analyzed plan ``sameResult``s the
cached one reuses it (so repeated invocations — bench warm runs,
successive admission batches — hit the cache instead of re-persisting),
and a genuinely new plan evicts the old frame first (bounded memory, the
``minhash_lsh_lookup`` lesson: eager eviction on every call silently
doubles the work of plan-identical reruns).

At 100 TB the cached frames here are the SMALL deriveds (edge lists,
postings, dictionaries) — never raw fact tables; `StorageLevel` stays the
default MEMORY_AND_DESK-spillable so an oversized cache degrades to disk,
not OOM.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["cached_once", "clear_slot"]

_SLOTS: dict[str, DataFrame] = {}


def _same_plan(a: DataFrame, b: DataFrame) -> bool:
    return bool(
        a._jdf.queryExecution()
        .analyzed()
        .sameResult(b._jdf.queryExecution().analyzed())
    )


def cached_once(df: DataFrame, slot: str) -> DataFrame:
    """Persist ``df`` under ``slot``, reusing the existing cache when the
    analyzed plan is semantically identical and evicting it otherwise."""
    old = _SLOTS.get(slot)
    if old is not None:
        if _same_plan(old, df):
            return old
        old.unpersist()
    df = df.persist()
    _SLOTS[slot] = df
    return df


def clear_slot(slot: str) -> None:
    """Drop and unpersist a slot (tests / explicit lifecycle control)."""
    old = _SLOTS.pop(slot, None)
    if old is not None:
        old.unpersist()
