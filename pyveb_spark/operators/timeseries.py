"""Time-series densification: spine generation and gap filling.

The reference's pipelines emit partitioned period aggregates and leave
missing periods implicit (a day with no rows simply has no partition —
``common.py:47-61``); every downstream consumer then re-discovers the
gaps. These operators make the dense grid explicit: a spine of every
step-aligned slot per key, and a left-join fill that materializes the
zeros. Dashboards, window functions over time (lag/moving averages), and
training-data per-period quotas all need the dense form.

100 TB design: the spine is generated from per-key bounds — one small
groupBy (two timestamps per key) and a scan-stage ``sequence`` explode;
slot count = span/step per key, independent of fact-row count. The fill
join shuffles on (key, slot), both sides already slot-grained (i.e. the
small side), never the raw facts.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["time_spine", "fill_time_gaps"]


def time_spine(
    df: DataFrame,
    ts_col: str,
    step: str = "1 hour",
    keys: Sequence[str] = (),
) -> DataFrame:
    """Dense (keys..., ts) grid from each key's observed min to max slot.

    ``ts_col`` must already be truncated to the grain (``date_trunc``) —
    the spine steps from the per-key minimum, so an untruncated minimum
    would produce off-grid slots.
    """
    keys = list(keys)
    bounds = df.groupBy(*keys).agg(
        F.min(ts_col).alias("__lo"), F.max(ts_col).alias("__hi")
    )
    return bounds.select(
        *keys,
        F.explode(
            F.sequence(F.col("__lo"), F.col("__hi"), F.expr(f"interval {step}"))
        ).alias(ts_col),
    )


def fill_time_gaps(
    agg_df: DataFrame,
    ts_col: str,
    step: str = "1 hour",
    keys: Sequence[str] = (),
    fill: dict | None = None,
) -> DataFrame:
    """Left-join an aggregated frame onto its dense spine, filling missing
    slots. ``fill`` maps measure column → fill value; numeric measures
    default to 0, non-numeric measures (strings, timestamps, …) pass
    through un-filled (NULL on spine-only slots) unless ``fill`` names
    them explicitly. Slots outside a key's observed [min, max] range are
    NOT invented — densification, not extrapolation.
    """
    import pyspark.sql.types as T

    keys = list(keys)
    measures = [c for c in agg_df.columns if c not in keys and c != ts_col]
    fill = dict(fill or {})
    numeric = {
        f.name
        for f in agg_df.schema.fields
        if isinstance(f.dataType, (T.NumericType,))
    }
    spine = time_spine(agg_df, ts_col, step, keys)
    joined = spine.join(agg_df, [*keys, ts_col], "left")

    def _out(c):
        if c in fill:
            return F.coalesce(F.col(c), F.lit(fill[c])).alias(c)
        if c in numeric:
            return F.coalesce(F.col(c), F.lit(0)).alias(c)
        return F.col(c)

    out_cols = [*keys, ts_col] + [_out(c) for c in measures]
    return joined.select(*out_cols)
