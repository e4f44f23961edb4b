"""Event funnels, transitions, retention, association rules.

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



def q98_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel view → click → purchase with a 3-day
    per-transition window and a value>100 purchase filter (probed
    non-trivial narrowing at every SF: 15/10/2, 150/115/20, 1500/1087/177
    users). Stage k is an aggregation of stage-k events joined to the
    stage-k-1 cohort on ``user_id`` — no per-user event lists, one
    shrinking timestamp per survivor (see ``operators/funnel.py``). Lags
    are exact summed micros; divide by n_users at the edge."""
    from pyveb_spark.operators.funnel import funnel_summary

    e = read_table(spark, sf_dir, "events")
    return funnel_summary(
        e,
        ["view", "click", "purchase"],
        within="3 days",
        filters={"purchase": F.col("value") > 100},
    )


_Q98_SQL = """
WITH s1 AS (SELECT user_id, MIN(ts) AS t1 FROM events
            WHERE event_type = 'view' GROUP BY user_id),
s2 AS (SELECT e.user_id, MIN(e.ts) AS t2 FROM events e JOIN s1 USING (user_id)
       WHERE e.event_type = 'click' AND e.ts > s1.t1
         AND e.ts <= s1.t1 + INTERVAL 3 DAY GROUP BY e.user_id),
s3 AS (SELECT e.user_id, MIN(e.ts) AS t3 FROM events e JOIN s2 USING (user_id)
       WHERE e.event_type = 'purchase' AND e.ts > s2.t2
         AND e.ts <= s2.t2 + INTERVAL 3 DAY AND e.value > 100
       GROUP BY e.user_id)
SELECT 1 AS stage, 'view' AS event_type, COUNT(*) AS n_users,
       CAST(0 AS BIGINT) AS total_lag_us FROM s1
UNION ALL
SELECT 2, 'click', COUNT(*),
       COALESCE(SUM(epoch_us(t2) - epoch_us(t1)), 0)::BIGINT
FROM s2 JOIN s1 USING (user_id)
UNION ALL
SELECT 3, 'purchase', COUNT(*),
       COALESCE(SUM(epoch_us(t3) - epoch_us(t2)), 0)::BIGINT
FROM s3 JOIN s2 USING (user_id)
ORDER BY stage
"""


def q120_brand_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules over order baskets of part BRANDS
    (``operators/rules.py::association_rules``): support / confidence /
    lift per unordered brand pair, top 20 by lift. Pair generation is the
    basket-keyed self-join with the apriori item prune; all ratios are
    fixed-order double expressions over exact integer counts. Ordered on
    the ROUNDED lift (+ pair tiebreak) — the cross-engine rank contract."""
    from pyveb_spark.operators.rules import association_rules

    l = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    p = read_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    baskets = l.join(F.broadcast(p), l["l_partkey"] == p["p_partkey"]).select(
        "l_orderkey", "p_brand"
    )
    rules = association_rules(
        baskets, "l_orderkey", "p_brand", min_item_count=2, min_pair_count=2
    )
    return (
        rules.select(
            "item_a", "item_b", "n_pairs", "n_a", "n_b",
            F.round("support", 6).alias("support"),
            F.round("conf_a_to_b", 6).alias("conf_a_to_b"),
            F.round("lift", 6).alias("lift"),
        )
        .orderBy(F.col("lift").desc(), "item_a", "item_b")
        .limit(20)
    )


_Q120_SQL = """
WITH bi AS (SELECT DISTINCT l.l_orderkey AS b, p.p_brand AS it
            FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
n AS (SELECT COUNT(DISTINCT b) AS n FROM bi),
items AS (SELECT it, COUNT(*) AS c FROM bi GROUP BY it HAVING COUNT(*) >= 2),
pruned AS (SELECT bi.b, bi.it FROM bi JOIN items ON bi.it = items.it),
pairs AS (SELECT x.it AS item_a, y.it AS item_b, COUNT(*) AS n_pairs
          FROM pruned x JOIN pruned y ON x.b = y.b AND x.it < y.it
          GROUP BY 1, 2 HAVING COUNT(*) >= 2)
SELECT item_a, item_b, n_pairs,
       ca.c AS n_a, cb.c AS n_b,
       ROUND(CAST(n_pairs AS DOUBLE) / CAST(n.n AS DOUBLE), 6) AS support,
       ROUND(CAST(n_pairs AS DOUBLE) / CAST(ca.c AS DOUBLE), 6)
         AS conf_a_to_b,
       ROUND(CAST(n_pairs AS DOUBLE) * CAST(n.n AS DOUBLE)
             / (CAST(ca.c AS DOUBLE) * CAST(cb.c AS DOUBLE)), 6) AS lift
FROM pairs
JOIN items ca ON pairs.item_a = ca.it
JOIN items cb ON pairs.item_b = cb.it
CROSS JOIN n
ORDER BY lift DESC, item_a, item_b
LIMIT 20
"""


def q121_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of event types per user
    (``operators/funnel.py::transition_matrix``): one lead-window shuffle
    on user, (from, to)-keyed aggregation, row-normalized probabilities
    as single integer divisions. The behavioral baseline the funnel
    (q98) summarizes one path of."""
    from pyveb_spark.operators.funnel import transition_matrix

    e = read_table(spark, sf_dir, "events")
    return transition_matrix(
        e, ["user_id"], "ts", "event_type", tiebreak_cols=["event_id"]
    ).orderBy("from_state", "to_state")


_Q121_SQL = """
WITH steps AS (
    SELECT event_type AS from_state,
           LEAD(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS to_state
    FROM events),
c AS (SELECT from_state, to_state, COUNT(*) AS n
      FROM steps WHERE to_state IS NOT NULL GROUP BY 1, 2)
SELECT from_state, to_state, n,
       CAST(n AS DOUBLE)
         / CAST(SUM(n) OVER (PARTITION BY from_state) AS DOUBLE) AS p
FROM c
ORDER BY from_state, to_state
"""


def q126_weekly_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention over the events stream
    (``operators/funnel.py::cohort_retention``): users bucketed by
    first-activity week, distinct-active counts per week offset,
    retention as a single integer division. Cohort-size cells, never
    event rows."""
    from pyveb_spark.operators.funnel import cohort_retention

    e = read_table(spark, sf_dir, "events")
    r = cohort_retention(e, "user_id", "ts", "week")
    return r.select(
        F.unix_micros("cohort").alias("cohort_us"),
        "period_offset",
        "n_active",
        "cohort_size",
        "retention",
    ).orderBy("cohort_us", "period_offset")


_Q126_SQL = """
WITH first AS (
  SELECT user_id, MIN(date_trunc('week', ts)) AS cohort
  FROM events GROUP BY user_id),
sizes AS (SELECT cohort, COUNT(*) AS cohort_size FROM first GROUP BY cohort),
active AS (
  SELECT f.cohort,
         CAST(date_diff('day', f.cohort, date_trunc('week', e.ts)) / 7
              AS INTEGER) AS period_offset,
         COUNT(DISTINCT e.user_id) AS n_active
  FROM events e JOIN first f ON e.user_id = f.user_id
  GROUP BY 1, 2)
SELECT epoch_us(a.cohort) AS cohort_us,
       a.period_offset,
       a.n_active,
       s.cohort_size,
       CAST(a.n_active AS DOUBLE) / CAST(s.cohort_size AS DOUBLE)
         AS retention
FROM active a JOIN sizes s ON a.cohort = s.cohort
ORDER BY cohort_us, period_offset
"""


def q161_chat_sft_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SFT conversation rendering with loss-mask offsets
    (``chat.py::render_chat_turns``): events become synthetic
    conversations (user_id = conversation; turns ordered by (ts,
    event_id); odd turns 'user', even turns 'assistant'; content =
    event_type), rendered as ``<|role|>content\\n`` with per-turn
    half-open character spans and the assistant-only trainable mask —
    the instruction-tuning prep shape. ONE window shuffle computes turn
    index and offsets together; the oracle replays the identical window
    arithmetic. First 8 turns of the first 20 conversations."""
    from pyveb_spark.operators.chat import render_chat_turns

    e = read_table(spark, sf_dir, "events")
    turns = e.select(
        "user_id",
        "ts",
        "event_id",
        F.col("event_type").alias("content"),
    ).withColumn(
        "role",
        F.when(
            F.row_number().over(
                Window.partitionBy("user_id").orderBy("ts", "event_id")
            )
            % 2
            == 1,
            F.lit("user"),
        ).otherwise(F.lit("assistant")),
    )
    out = render_chat_turns(
        turns,
        conv_col="user_id",
        order_cols=["ts", "event_id"],
        role_col="role",
        content_col="content",
    )
    return (
        out.where((F.col("user_id") < 20) & (F.col("turn_idx") <= 8))
        .orderBy("user_id", "turn_idx")
    )


_Q161_SQL = """
WITH turns AS (
  SELECT user_id, ts, event_id, event_type AS content,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS rn
  FROM events
),
roled AS (
  SELECT user_id, ts, event_id, content, rn,
         CASE WHEN rn % 2 = 1 THEN 'user' ELSE 'assistant' END AS role
  FROM turns
),
spans AS (
  SELECT user_id, rn AS turn_idx, role,
         COALESCE(SUM(length(role) + length(content) + 5)
                  OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  0) AS start_char,
         length(role) + length(content) + 5 AS turn_len,
         CASE WHEN role = 'assistant' THEN 1 ELSE 0 END AS is_trainable
  FROM roled
)
SELECT user_id, turn_idx, role,
       start_char::BIGINT AS start_char,
       (start_char + turn_len)::BIGINT AS end_char,
       is_trainable
FROM spans
WHERE user_id < 20 AND turn_idx <= 8
ORDER BY user_id, turn_idx
"""
