"""Mergeable-sketch aggregations (north-star scale extension).

The reference computes distinct counts either exactly in Redshift SQL or
driver-side over collected lists (``common.py:290-303``) — both shapes that
die at 100 TB. Sketches fix the architecture, not just the constant: a
DataSketches HLL sketch is a small, *mergeable* state, so distinct-count
rollups become two map-side-combinable aggregations with no giant exact
shuffle, and pre-aggregated sketch tables (per day / per partition) can be
re-rolled to any coarser grain later without touching raw data — the
pattern every large-scale metrics pipeline uses.

All functions are thin compositions of Spark 3.5+/4.x built-ins
(``hll_sketch_agg`` / ``hll_union_agg`` / ``hll_sketch_estimate``,
``percentile_approx``) — JVM-side, no Python in the hot path. Estimates are
deterministic for a given input multiset (DataSketches is seed-fixed) but
not reproducible by other engines' HLL implementations, so queries built on
these are rows-only under the oracle gate; the error-bound contract is
pinned in unit tests instead.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "hll_distinct",
    "hll_partial",
    "hll_merge",
    "hll_rollup",
    "approx_quantiles",
]

# lgConfigK=12 → 4 KB sketches with ~1.6% relative standard error — the
# DataSketches default trade-off; raise for tighter bounds.
DEFAULT_LG_K = 12


def hll_distinct(col: str, lg_k: int = DEFAULT_LG_K) -> Column:
    """Approximate COUNT(DISTINCT col) as a single aggregate expression."""
    return F.hll_sketch_estimate(F.hll_sketch_agg(col, F.lit(lg_k)))


def hll_partial(
    df: DataFrame,
    keys: Sequence[str],
    col: str,
    lg_k: int = DEFAULT_LG_K,
    sketch_col: str = "sketch",
) -> DataFrame:
    """Pre-aggregate: one binary HLL sketch per ``keys`` group. Persist this
    table at the finest grain you'll ever query (e.g. per source×day); it
    is the only pass over the raw data."""
    return df.groupBy(*keys).agg(
        F.hll_sketch_agg(col, F.lit(lg_k)).alias(sketch_col)
    )


def hll_merge(
    partial: DataFrame,
    keys: Sequence[str],
    sketch_col: str = "sketch",
) -> DataFrame:
    """Union pre-aggregated sketches up to coarser ``keys``, keeping the
    result as a sketch (for further rollup or storage). Estimates are
    path-dependent only within the sketch's error bounds: DataSketches
    unions promote between sparse/dense modes as they grow, so different
    rollup paths (and union vs single-pass) may differ by ~RSE but all
    honor the configured accuracy — the contract pinned in tests."""
    return partial.groupBy(*keys).agg(
        F.hll_union_agg(sketch_col).alias(sketch_col)
    )


def hll_rollup(
    partial: DataFrame,
    keys: Sequence[str],
    sketch_col: str = "sketch",
    out_col: str = "approx_distinct",
) -> DataFrame:
    """Roll pre-aggregated sketches up to coarser ``keys`` by set-union and
    estimate — no raw-data access, no exact-distinct shuffle."""
    return partial.groupBy(*keys).agg(
        F.hll_sketch_estimate(F.hll_union_agg(sketch_col)).alias(out_col)
    )


def approx_quantiles(
    df: DataFrame,
    keys: Sequence[str],
    col: str,
    probabilities: Sequence[float] = (0.5, 0.95, 0.99),
    accuracy: int = 10000,
) -> DataFrame:
    """Per-group approximate quantiles (``percentile_approx`` — a mergeable
    KLL-style summary under the hood, same partial-aggregation scale shape
    as the HLL path). Exact percentiles (q34) sort each group; this doesn't,
    which is the difference at billion-row groups."""
    return df.groupBy(*keys).agg(
        F.percentile_approx(
            col, F.array(*[F.lit(p) for p in probabilities]), F.lit(accuracy)
        ).alias("approx_quantiles")
    )
