"""Data-layout queries: Z-order pruning audit, compaction planning.

The layout operators (``operators/layout.py``) have been unit-tested since
round 4; these queries certify the *decision tables* a 100 TB operator
reads before rewriting a table — how many files a box query scans under a
linear vs Z-order layout, and what a compaction pass would do — with the
same DuckDB-oracle discipline as every other family. Float determinism
contract in ``pyveb_spark.queries.__doc__``. Registry/gate-window order
lives in ``pyveb_spark/queries/__init__.py`` only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pyveb_spark.operators.layout import zorder_rank_key
from pyveb_spark.sources.readers import read_table


# ---------------------------------------------------------------------------
# LLM ops / lakehouse: Z-order file-skipping audit (round-8 head)
# ---------------------------------------------------------------------------

_Q187_BITS = 8
_Q187_FILES = 64


def q187_zorder_pruning_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-skipping audit for a two-dimensional box query under two
    physical layouts — the table an operator reads before paying for an
    ``OPTIMIZE ZORDER`` rewrite of a 100 TB fact table.

    Models the two candidate layouts in ONE plan: every row is assigned a
    file id by ``ntile(64)`` over (a) the linear sort key ``user_id`` and
    (b) the equi-depth Morton/Z-order key of (``user_id``, ``value``)
    from ``operators/layout.zorder_rank_key`` (8 bits/dim; rank
    bucketing, the same design as Delta's range-partition-id
    interleaving — an equi-width grid collapses under the skewed money
    column). Per-file min/max stats of BOTH raw columns — what parquet
    footers would store — then decide which files a box predicate (25%
    of the ``user_id`` range x 25% of the ``value`` range) must scan.
    Output per layout: file count, files scanned, rows scanned, and the
    rows actually matching (identical across layouts by construction — the
    audit's built-in sanity row). At sf0.01 the Z-order layout scans 12
    files / 1,872 rows vs linear's 18 / 2,812 — and the gap widens with
    file count (each quadrupling of the file count halves the Z-scanned
    fraction of a fixed box, while linear's stays pinned at the single
    dimension's selectivity).

    Scale: the audit is one scan + one explode (2x) + one window sort per
    layout + two grouped aggregations; the production rewrite itself is
    ``zorder_layout``'s single ``repartitionByRange`` — the same global
    sort any layout rewrite pays. ``ntile`` stands in for the range
    partitioner here so DuckDB can replay file assignment exactly.
    Deterministic: rank bucketing + integer bit interleaving; the only
    doubles are the box-literal IEEE arithmetic replayed verbatim by the
    oracle.
    """
    ev = read_table(spark, sf_dir, "events")
    row = ev.agg(
        F.min(F.col("user_id").cast("double")).alias("mnx"),
        F.max(F.col("user_id").cast("double")).alias("mxx"),
        F.min(F.col("value").cast("double")).alias("mny"),
        F.max(F.col("value").cast("double")).alias("mxy"),
    ).first()
    lox = row["mnx"] + 0.2 * (row["mxx"] - row["mnx"])
    hix = row["mnx"] + 0.45 * (row["mxx"] - row["mnx"])
    loy = row["mny"] + 0.1 * (row["mxy"] - row["mny"])
    hiy = row["mny"] + 0.35 * (row["mxy"] - row["mny"])

    keyed = zorder_rank_key(
        ev.select("event_id", "user_id", "value"),
        ["user_id", "value"],
        bits=_Q187_BITS,
        tiebreak="event_id",
    )
    laid = (
        keyed
        .select(
            "event_id",
            "user_id",
            "value",
            F.explode(
                F.array(
                    F.struct(
                        F.lit("linear").alias("layout"),
                        F.col("user_id").cast("bigint").alias("key"),
                    ),
                    F.struct(
                        F.lit("zorder").alias("layout"),
                        F.col("zkey").alias("key"),
                    ),
                )
            ).alias("lk"),
        )
        .select("event_id", "user_id", "value", "lk.layout", "lk.key")
    )
    w = Window.partitionBy("layout").orderBy("key", "event_id")
    in_box = (
        (F.col("user_id") >= F.lit(lox))
        & (F.col("user_id") <= F.lit(hix))
        & (F.col("value") >= F.lit(loy))
        & (F.col("value") <= F.lit(hiy))
    )
    files = (
        laid.withColumn("file_id", F.ntile(_Q187_FILES).over(w))
        .groupBy("layout", "file_id")
        .agg(
            F.min("user_id").alias("mn_u"),
            F.max("user_id").alias("mx_u"),
            F.min("value").alias("mn_v"),
            F.max("value").alias("mx_v"),
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.when(in_box, 1).otherwise(0)).alias("n_match"),
        )
    )
    scanned = (
        (F.col("mn_u") <= F.lit(hix))
        & (F.col("mx_u") >= F.lit(lox))
        & (F.col("mn_v") <= F.lit(hiy))
        & (F.col("mx_v") >= F.lit(loy))
    )
    return (
        files.groupBy("layout")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_files"),
            F.sum(F.when(scanned, 1).otherwise(0))
            .cast("bigint")
            .alias("files_scanned"),
            F.sum(F.when(scanned, F.col("n_rows")).otherwise(0))
            .cast("bigint")
            .alias("rows_scanned"),
            F.sum("n_match").cast("bigint").alias("rows_matching"),
        )
        .orderBy("layout")
    )


_Q187_SQL = f"""
WITH b AS (SELECT MIN(user_id)::DOUBLE AS mnx, MAX(user_id)::DOUBLE AS mxx,
                  MIN(value)::DOUBLE  AS mny, MAX(value)::DOUBLE  AS mxy
           FROM events),
s AS (SELECT event_id, user_id, value,
        (NTILE({1 << _Q187_BITS}) OVER (ORDER BY user_id, event_id)
           - 1)::BIGINT AS ux,
        (NTILE({1 << _Q187_BITS}) OVER (ORDER BY value, event_id)
           - 1)::BIGINT AS uy
      FROM events),
z AS (SELECT event_id, user_id, value,
        (SELECT SUM(((ux >> g.b) & 1) * (1::BIGINT << (2 * g.b))
                  + ((uy >> g.b) & 1) * (1::BIGINT << (2 * g.b + 1)))
         FROM (SELECT unnest(generate_series(0, {_Q187_BITS - 1})) AS b) g
        ) AS zkey
      FROM s),
laid AS (
    SELECT event_id, user_id, value, 'linear' AS layout, user_id AS key
    FROM z
    UNION ALL
    SELECT event_id, user_id, value, 'zorder', zkey FROM z),
box AS (SELECT mnx + 0.2 * (mxx - mnx) AS lox,
               mnx + 0.45 * (mxx - mnx) AS hix,
               mny + 0.1 * (mxy - mny) AS loy,
               mny + 0.35 * (mxy - mny) AS hiy
        FROM b),
fa AS (SELECT *,
              NTILE({_Q187_FILES}) OVER (PARTITION BY layout
                                         ORDER BY key, event_id) AS file_id
       FROM laid),
fs AS (SELECT layout, file_id,
              MIN(user_id) AS mn_u, MAX(user_id) AS mx_u,
              MIN(value) AS mn_v, MAX(value) AS mx_v,
              COUNT(*) AS n_rows,
              SUM(CASE WHEN user_id >= lox AND user_id <= hix
                        AND value >= loy AND value <= hiy
                       THEN 1 ELSE 0 END) AS n_match
       FROM fa, box
       GROUP BY 1, 2)
SELECT layout,
       COUNT(*)::BIGINT AS n_files,
       SUM(CASE WHEN mn_u <= hix AND mx_u >= lox
                 AND mn_v <= hiy AND mx_v >= loy THEN 1 ELSE 0 END)::BIGINT
         AS files_scanned,
       SUM(CASE WHEN mn_u <= hix AND mx_u >= lox
                 AND mn_v <= hiy AND mx_v >= loy THEN n_rows ELSE 0 END)::BIGINT
         AS rows_scanned,
       SUM(n_match)::BIGINT AS rows_matching
FROM fs, box
GROUP BY layout
ORDER BY layout
"""


# ---------------------------------------------------------------------------
# Lakehouse ops: small-files compaction planner (round-8 head)
# ---------------------------------------------------------------------------

_Q191_TARGET = 2000


def q191_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-files compaction plan summary
    (``operators/layout.py::compaction_plan``): model the events table
    as one file per (day, hour) — the listing a streaming ingest leaves
    behind — with a deterministic byte size (payload octet length + row
    overhead), pack hour-files into ~2 KB merge groups WITHOUT crossing
    day partition boundaries, and report the per-day before/after file
    counts and group-size spread. The plan is the decision artifact; the
    rewrite executes group-by-group via ``compact_files``.

    Scale: the planner touches only the file LISTING (metadata — here a
    (day, hour) aggregate standing in for it): one groupBy + one keyed
    prefix-sum window + integer division. A 10⁸-file table plans in a
    metadata scan; no data moves until a group is actually rewritten."""
    from pyveb_spark.operators.layout import compaction_plan

    ev = read_table(spark, sf_dir, "events")
    listing = (
        ev.groupBy(
            F.date_trunc("day", F.col("ts")).alias("day"),
            F.hour("ts").alias("hour"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            (
                F.sum(F.octet_length("props")) + 24 * F.count(F.lit(1))
            ).cast("bigint").alias("bytes"),
        )
    )
    planned = compaction_plan(
        listing, ["day"], ["hour"], "bytes", _Q191_TARGET
    )
    grouped = planned.groupBy("day", "compaction_group").agg(
        F.count(F.lit(1)).alias("files_in_group"),
        F.sum("bytes").alias("group_bytes"),
    )
    return (
        grouped.groupBy("day")
        .agg(
            F.sum("files_in_group").cast("bigint").alias("n_files_before"),
            F.count(F.lit(1)).cast("bigint").alias("n_files_after"),
            F.sum("group_bytes").cast("bigint").alias("bytes_total"),
            F.max("group_bytes").cast("bigint").alias("largest_group_bytes"),
            F.sum(F.when(F.col("files_in_group") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("groups_unmerged"),
        )
        .select(
            F.unix_micros("day").alias("day_us"),
            "n_files_before",
            "n_files_after",
            "bytes_total",
            "largest_group_bytes",
            "groups_unmerged",
        )
        .orderBy("day_us")
    )


_Q191_SQL = f"""
WITH listing AS (
  SELECT date_trunc('day', ts) AS day, hour(ts) AS hour,
         COUNT(*) AS n_rows,
         (SUM(strlen(props)) + 24 * COUNT(*))::BIGINT AS bytes
  FROM events GROUP BY 1, 2),
planned AS (
  SELECT *,
         (SUM(bytes) OVER (PARTITION BY day ORDER BY hour) - bytes)
           // {_Q191_TARGET} AS compaction_group
  FROM listing),
grouped AS (
  SELECT day, compaction_group,
         COUNT(*) AS files_in_group, SUM(bytes) AS group_bytes
  FROM planned GROUP BY 1, 2)
SELECT epoch_us(day) AS day_us,
       SUM(files_in_group)::BIGINT AS n_files_before,
       COUNT(*)::BIGINT AS n_files_after,
       SUM(group_bytes)::BIGINT AS bytes_total,
       MAX(group_bytes)::BIGINT AS largest_group_bytes,
       SUM(CASE WHEN files_in_group = 1 THEN 1 ELSE 0 END)::BIGINT
         AS groups_unmerged
FROM grouped
GROUP BY day
ORDER BY day_us
"""
