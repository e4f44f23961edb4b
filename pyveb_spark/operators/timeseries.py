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

__all__ = ["time_spine", "fill_time_gaps", "rolling_stats", "ohlc_bars", "ewma_level", "trend_fit"]


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


def rolling_stats(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    keys: Sequence[str] = (),
    window: int = 7,
) -> DataFrame:
    """Trailing ``window``-slot moving aggregate per key over a DENSE
    series (run :func:`fill_time_gaps` first — on a gappy series a
    row-frame window silently spans missing slots and the "7-slot"
    average becomes a 7-*observations* average). Adds ``mov_sum``,
    ``mov_avg``, ``mov_n`` (slots actually in frame — fewer at the series
    head, so the early averages are honest, not zero-padded).

    Engine-portable: the frame is ROWS-based over a total order
    (key, ts), ``mov_sum`` is an exact integer/decimal sum when the input
    is, and ``mov_avg`` is the single final double division.

    100 TB design: ONE window shuffle on the key (the upstream fill join
    partitions on (key, slot) — a DIFFERENT expression, so that exchange
    is not reusable; the window's own key-only shuffle is the real cost
    and it moves slot-grained rows, never raw facts). State per row is
    the ``window``-row frame, independent of series length.
    """
    from pyspark.sql import Window

    w = (
        Window.partitionBy(*keys)
        .orderBy(ts_col)
        .rowsBetween(-(window - 1), 0)
    )
    return (
        df.withColumn("mov_sum", F.sum(value_col).over(w))
        .withColumn("mov_n", F.count(F.lit(1)).over(w))
        .withColumn(
            "mov_avg",
            F.col("mov_sum").cast("double") / F.col("mov_n"),
        )
    )


def ohlc_bars(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    step: str = "1 day",
    keys: Sequence[str] = (),
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Downsample an event stream into open/high/low/close bars per
    ``step`` bucket (finance candles, sensor downsampling, metric
    rollups): ``open``/``close`` are the values at the bucket's first/
    last event, ``high``/``low`` the extremes, ``n`` the event count.
    Returns ``(keys..., bucket_start, open, high, low, close, n)``.

    open/close use ``min_by``/``max_by`` on the (ts, tiebreaks...) struct
    — single-pass order statistics, no window, no self-join; ties at
    equal timestamps are resolved by ``tiebreak_cols`` so the bars are
    deterministic. All values pass through unchanged (no float
    arithmetic), so results are engine-exact.

    100 TB design: ONE groupBy on (keys, bucket) with map-side partial
    min_by/max_by/min/max/count — the same shuffle any rollup pays, and
    orders of magnitude less than the window-rank formulation (which
    sorts every group's full event list).
    """
    keys = list(keys)
    ordkey = F.struct(
        F.col(ts_col), *[F.col(c) for c in tiebreak_cols]
    )
    bucket = F.window(F.col(ts_col), step)["start"].alias("bucket_start")
    v = F.col(value_col)
    return df.groupBy(*keys, bucket).agg(
        F.min_by(v, ordkey).alias("open"),
        F.max(v).alias("high"),
        F.min(v).alias("low"),
        F.max_by(v, ordkey).alias("close"),
        F.count(F.lit(1)).alias("n"),
    )


def ewma_level(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    value_col: str,
    alpha: float,
) -> DataFrame:
    """Exponentially-weighted moving average per key: the current
    smoothed level after folding the key's full (ts-ordered) series
    through ``level = α·x + (1-α)·level`` (seeded with the first value) —
    the standard anomaly-baseline / trend-level primitive. Returns
    ``(keys..., ewma, n_points, last_ts)``.

    EWMA is inherently a sequential recurrence, so it cannot be a window
    aggregate; the distributed form is the ordered-fold pattern (q103):
    ``array_sort(collect_list(struct(ts, value)))`` then one ``aggregate``
    fold — sort order comes from the DATA, the fold order is total, and
    the float sequence is identical on every engine (the DuckDB oracle
    replays it with ``list_reduce``). Feed PRE-AGGREGATED series (daily
    rollups, OHLC closes): the per-key array must fit an executor, which
    thousands-of-slots grains trivially do. For raw-event grains,
    aggregate to a grain first — smoothing raw ticks is noise anyway.

    One shuffle on ``keys``; nothing driver-side.
    """
    keys = list(keys)
    pair = F.struct(F.col(ts_col).alias("t"), F.col(value_col).alias("x"))
    series = df.groupBy(*keys).agg(
        F.array_sort(F.collect_list(pair)).alias("__s"),
        F.count(F.lit(1)).alias("n_points"),
        F.max(ts_col).alias("last_ts"),
    )
    a = F.lit(float(alpha))
    fold = F.aggregate(
        F.slice(F.col("__s"), 2, F.size(F.col("__s"))),
        F.element_at(F.col("__s"), 1)["x"].cast("double"),
        lambda acc, p: a * p["x"].cast("double") + (F.lit(1.0) - a) * acc,
    )
    return series.select(
        *keys, fold.alias("ewma"), "n_points", "last_ts"
    )


def trend_fit(
    df: DataFrame,
    keys: Sequence[str],
    x_col: str,
    y_col: str,
    y_precision: str = "decimal(18,2)",
) -> DataFrame:
    """Per-key ordinary-least-squares trend line ``y = slope·x +
    intercept`` (plus r²) — the "is this metric growing" primitive over
    per-period aggregates (daily volumes, error counts, queue depths).
    ``x_col`` must be numeric (day index, epoch days); pass
    pre-aggregated series, one row per (key, x).

    Engine-portable by the q106 recipe: all five moments (n, Σx, Σy,
    Σxy, Σx²,  Σy²) are EXACT decimal sums — order-independent under any
    aggregation layout — and slope/intercept/r² derive in fixed-order
    double expressions. One groupBy with map-side partials; zero joins.
    """
    keys = list(keys)
    x = F.col(x_col).cast("decimal(18,2)")
    y = F.col(y_col).cast(y_precision)
    agg = df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).cast("double").alias("__sx"),
        F.sum(y).cast("double").alias("__sy"),
        F.sum(x * y).cast("double").alias("__sxy"),
        F.sum(x * x).cast("double").alias("__sxx"),
        F.sum(y * y).cast("double").alias("__syy"),
    )
    n = F.col("n").cast("double")
    cov = n * F.col("__sxy") - F.col("__sx") * F.col("__sy")
    varx = n * F.col("__sxx") - F.col("__sx") * F.col("__sx")
    vary = n * F.col("__syy") - F.col("__sy") * F.col("__sy")
    slope = cov / varx
    intercept = (F.col("__sy") - slope * F.col("__sx")) / n
    r2 = (cov * cov) / (varx * vary)
    return agg.select(
        *keys,
        "n",
        slope.alias("slope"),
        intercept.alias("intercept"),
        r2.alias("r2"),
    )
