"""Time series: gap fill, rolling stats, OHLC, EWMA, trend.

Split from the round-4 queries.py monolith; float determinism contract
in ``pyveb_spark.queries.__doc__``. Registry/gate-window order lives in
``pyveb_spark/queries/__init__.py`` only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pyveb_spark.operators.cleaning import clean_old_dates
from pyveb_spark.operators.joins import asof_join
from pyveb_spark.queries._helpers import _dec, _query_vec
from pyveb_spark.sources.readers import read_table



def q76_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: the what-if revenue delta from discounted,
    small-quantity lines in one year — the purest scan-bound query (every
    predicate pushes to the Parquet scan, one global decimal sum, no
    join, no group). The floor every engine should hit scan throughput
    on."""
    l = read_table(spark, sf_dir, "lineitem")
    return (
        l.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(_dec("l_extendedprice") * _dec("l_discount", 3, 2))
            .cast("double")
            .alias("revenue")
        )
    )


_Q76_SQL = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                * CAST(l_discount AS DECIMAL(3,2))) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


def q96_hourly_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense hourly activity series per event type (high-value events,
    value > 150, chosen so every SF has real gaps to fill — probed 2346 /
    3097 / 944 missing hour slots at sf0.001/0.01/0.1): truncate to the
    hour, count, then left-join onto the per-type min→max hour spine with
    zero fill. Densification, not extrapolation — no slots outside a
    type's observed range. Timestamps emitted as unix micros (the
    engine-portable timestamp contract)."""
    from pyveb_spark.operators.timeseries import fill_time_gaps

    e = read_table(spark, sf_dir, "events")
    agg = (
        e.where(F.col("value") > 150)
        .select("event_type", F.date_trunc("hour", F.col("ts")).alias("h"))
        .groupBy("event_type", "h")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    dense = fill_time_gaps(agg, "h", step="1 hour", keys=["event_type"])
    return dense.select(
        "event_type", F.unix_micros(F.col("h")).alias("hour_us"), "n"
    ).orderBy("event_type", "hour_us")


_Q96_SQL = """
WITH e AS (SELECT event_type, date_trunc('hour', ts) AS h
           FROM events WHERE value > 150),
agg AS (SELECT event_type, h, COUNT(*) AS n FROM e GROUP BY 1, 2),
b AS (SELECT event_type, MIN(h) AS lo, MAX(h) AS hi FROM e GROUP BY 1),
spine AS (SELECT event_type,
                 unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h
          FROM b)
SELECT s.event_type AS event_type, epoch_us(s.h) AS hour_us,
       COALESCE(a.n, 0) AS n
FROM spine s LEFT JOIN agg a ON a.event_type = s.event_type AND a.h = s.h
ORDER BY s.event_type, hour_us
"""


def q101_rolling_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-hour moving average over the q96 DENSE hourly series
    (gap fill first, so the row frame means 7 clock hours, not 7
    observations — the composition the two operators exist for). mov_sum
    is an exact bigint window sum; mov_avg is the single final double
    division, engine-portable."""
    from pyveb_spark.operators.timeseries import fill_time_gaps, rolling_stats

    e = read_table(spark, sf_dir, "events")
    agg = (
        e.where(F.col("value") > 150)
        .select("event_type", F.date_trunc("hour", F.col("ts")).alias("h"))
        .groupBy("event_type", "h")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    dense = fill_time_gaps(agg, "h", step="1 hour", keys=["event_type"])
    rolled = rolling_stats(dense, "h", "n", keys=["event_type"], window=7)
    return rolled.select(
        "event_type",
        F.unix_micros(F.col("h")).alias("hour_us"),
        "n",
        "mov_sum",
        "mov_n",
        "mov_avg",
    ).orderBy("event_type", "hour_us")


_Q101_SQL = """
WITH e AS (SELECT event_type, date_trunc('hour', ts) AS h
           FROM events WHERE value > 150),
agg AS (SELECT event_type, h, COUNT(*) AS n FROM e GROUP BY 1, 2),
b AS (SELECT event_type, MIN(h) AS lo, MAX(h) AS hi FROM e GROUP BY 1),
spine AS (SELECT event_type,
                 unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h
          FROM b),
dense AS (SELECT s.event_type, s.h, COALESCE(a.n, 0) AS n
          FROM spine s LEFT JOIN agg a
            ON a.event_type = s.event_type AND a.h = s.h)
SELECT event_type, epoch_us(h) AS hour_us, n,
       (SUM(n) OVER w)::BIGINT AS mov_sum,
       COUNT(*) OVER w AS mov_n,
       CAST(SUM(n) OVER w AS DOUBLE) / (COUNT(*) OVER w) AS mov_avg
FROM dense
WINDOW w AS (PARTITION BY event_type ORDER BY h
             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
ORDER BY event_type, hour_us
"""


def q114_daily_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily open/high/low/close bars of event values per event type
    (``operators/timeseries.py::ohlc_bars``): single-pass min_by/max_by
    order statistics on the (ts, event_id) struct — no window sort, one
    rollup-shaped shuffle. Values pass through unchanged, so the result
    is engine-exact with zero float contract."""
    from pyveb_spark.operators.timeseries import ohlc_bars

    e = read_table(spark, sf_dir, "events")
    bars = ohlc_bars(
        e, "ts", "value", "1 day", keys=["event_type"],
        tiebreak_cols=["event_id"],
    )
    return bars.select(
        "event_type",
        F.unix_micros("bucket_start").alias("day_us"),
        "open", "high", "low", "close", "n",
    ).orderBy("event_type", "day_us")


_Q114_SQL = """
WITH ranked AS (
    SELECT event_type,
           time_bucket(INTERVAL '1 day', ts) AS day,
           value,
           ROW_NUMBER() OVER (
               PARTITION BY event_type, time_bucket(INTERVAL '1 day', ts)
               ORDER BY ts, event_id) AS rf,
           ROW_NUMBER() OVER (
               PARTITION BY event_type, time_bucket(INTERVAL '1 day', ts)
               ORDER BY ts DESC, event_id DESC) AS rl
    FROM events)
SELECT event_type,
       epoch_us(day) AS day_us,
       MIN(CASE WHEN rf = 1 THEN value END) AS open,
       MAX(value) AS high,
       MIN(value) AS low,
       MIN(CASE WHEN rl = 1 THEN value END) AS close,
       COUNT(*) AS n
FROM ranked
GROUP BY event_type, day
ORDER BY event_type, day_us
"""


def q118_ewma_baseline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EWMA trend level (α=0.3) of DAILY event-value sums per event type
    (``operators/timeseries.py::ewma_level``): exact-decimal daily
    rollup first, then the ordered-fold recurrence — array_sort +
    ``F.aggregate``, replayed by the oracle with ``list_reduce``, the
    q103 portability pattern. ``1-α`` is written as the expression
    ``1.0 - 0.3`` in BOTH engines (the two IEEE doubles differ!), so the
    fold sequence is bit-identical; level compared at round(6)."""
    from pyveb_spark.operators.timeseries import ewma_level

    e = read_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.sum(_dec("value")).cast("double").alias("v"))
    lvl = ewma_level(daily, ["event_type"], "day", "v", alpha=0.3)
    return lvl.select(
        "event_type",
        F.round("ewma", 6).alias("ewma"),
        "n_points",
        F.unix_micros("last_ts").alias("last_day_us"),
    ).orderBy("event_type")


_Q118_SQL = """
WITH daily AS (
    SELECT event_type, date_trunc('day', ts) AS day,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS v
    FROM events GROUP BY 1, 2),
folded AS (
    SELECT event_type,
           list_reduce(list(v ORDER BY day),
                       (acc, x) -> 0.3 * x + (1.0 - 0.3) * acc) AS ewma,
           COUNT(*) AS n_points,
           epoch_us(MAX(day)) AS last_day_us
    FROM daily GROUP BY 1)
SELECT event_type, ROUND(ewma, 6) AS ewma, n_points, last_day_us
FROM folded ORDER BY event_type
"""


def q129_daily_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type OLS trend of daily event value (``operators/timeseries.py
    ::trend_fit``): slope/intercept/r² from exact decimal moments (the
    q106 recipe) over the daily rollup — "is this metric growing", one
    groupBy, zero joins, engine-exact."""
    from pyveb_spark.operators.timeseries import trend_fit

    e = read_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.sum(_dec("value")).cast("double").alias("v"))
    xi = daily.withColumn(
        "xi", F.datediff(F.col("day"), F.lit("1970-01-01").cast("date"))
    )
    t = trend_fit(xi, ["event_type"], "xi", "v")
    return t.select(
        "event_type", "n",
        F.round("slope", 6).alias("slope"),
        F.round("intercept", 6).alias("intercept"),
        F.round("r2", 6).alias("r2"),
    ).orderBy("event_type")


_Q129_SQL = """
WITH daily AS (
  SELECT event_type, date_trunc('day', ts) AS day,
         CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS v
  FROM events GROUP BY 1, 2),
xi AS (SELECT event_type,
              date_diff('day', DATE '1970-01-01', day) AS xi, v
       FROM daily),
m AS (SELECT event_type,
             COUNT(*) AS n,
             CAST(SUM(CAST(xi AS DECIMAL(18,2))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(v AS DECIMAL(18,2))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(xi AS DECIMAL(18,2))
                      * CAST(v AS DECIMAL(18,2))) AS DOUBLE) AS sxy,
             CAST(SUM(CAST(xi AS DECIMAL(18,2))
                      * CAST(xi AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(v AS DECIMAL(18,2))
                      * CAST(v AS DECIMAL(18,2))) AS DOUBLE) AS syy
      FROM xi GROUP BY event_type)
SELECT event_type, n,
       ROUND((CAST(n AS DOUBLE) * sxy - sx * sy)
             / (CAST(n AS DOUBLE) * sxx - sx * sx), 6) AS slope,
       ROUND((sy - ((CAST(n AS DOUBLE) * sxy - sx * sy)
                    / (CAST(n AS DOUBLE) * sxx - sx * sx)) * sx)
             / CAST(n AS DOUBLE), 6) AS intercept,
       ROUND(((CAST(n AS DOUBLE) * sxy - sx * sy)
              * (CAST(n AS DOUBLE) * sxy - sx * sy))
             / ((CAST(n AS DOUBLE) * sxx - sx * sx)
                * (CAST(n AS DOUBLE) * syy - sy * sy)), 6) AS r2
FROM m ORDER BY event_type
"""
