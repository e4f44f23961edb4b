"""Relational core: TPC-H-shaped scans, joins (asof/range/fuzzy/salted), aggregations, windows, sets, nested data, strings.

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



# ---------------------------------------------------------------------------
# §2.5 aggregation: TPC-H Q1-style pricing summary (scan→filter→hash agg)
# ---------------------------------------------------------------------------

def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: full-scan filter + hash aggregation with exact decimal math.

    Scale notes: filter and 8-column projection push to the Parquet scan;
    partial aggregation is map-side (4 groups → tiny shuffle); AQE coalesces
    the post-shuffle stage. At 100 TB this is scan-bound, the ideal shape.
    """
    l = read_table(spark, sf_dir, "lineitem")
    one = F.lit(1).cast("decimal(3,2)")
    disc_price = _dec("l_extendedprice") * (one - _dec("l_discount", 3, 2))
    charge = disc_price * (one + _dec("l_tax", 3, 2))
    n = F.count(F.lit(1))
    return (
        l.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(_dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            (F.sum(_dec("l_quantity")).cast("double") / n).alias("avg_qty"),
            (F.sum(_dec("l_extendedprice")).cast("double") / n).alias("avg_price"),
            (F.sum(_dec("l_discount", 3, 2)).cast("double") / n).alias("avg_disc"),
            n.alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


_Q01_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS sum_disc_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2))) * (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(3,2)))) AS DOUBLE) AS sum_charge,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price,
       CAST(SUM(CAST(l_discount AS DECIMAL(3,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# ---------------------------------------------------------------------------
# §2.4 joins: 3-way join + agg + top-k (TPC-H Q3 shape)
# ---------------------------------------------------------------------------

def q02_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer ⋈ orders ⋈ lineitem, revenue agg, deterministic top-10.

    Scale notes: the two big tables shuffle on their join keys once; the
    filtered customer side is small enough for AQE to broadcast at low SF
    and shuffle-hash at 100 TB. Revenue is exact decimal; top-k is a
    TakeOrdered (no global sort materialization).
    """
    cutoff = F.lit("1998-03-15").cast("timestamp")
    c = read_table(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = read_table(spark, sf_dir, "orders").where(F.col("o_orderdate") < cutoff)
    l = read_table(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > cutoff)
    one = F.lit(1).cast("decimal(3,2)")
    revenue = _dec("l_extendedprice") * (one - _dec("l_discount", 3, 2))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, o.o_orderkey == l.l_orderkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .select(
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_orderpriority",
            "revenue",
        )
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


_Q02_SQL = """
SELECT o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       o_orderpriority,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15'
  AND l_shipdate > TIMESTAMP '1998-03-15'
GROUP BY o_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderkey ASC
LIMIT 10
"""


# ---------------------------------------------------------------------------
# §2.4 joins: 6-way star join with broadcast dims (TPC-H Q5 shape)
# ---------------------------------------------------------------------------

def q03_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full FK chain region→nation→{customer,supplier}→orders→lineitem.

    Scale notes: region/nation/supplier are explicitly ``broadcast()`` —
    they stay small at every SF (the classic star-schema dims), so the only
    shuffles are lineitem⋈orders and ⋈customer on their keys.
    """
    region = F.broadcast(
        read_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    )
    nation = F.broadcast(read_table(spark, sf_dir, "nation"))
    supplier = F.broadcast(read_table(spark, sf_dir, "supplier"))
    customer = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    lineitem = read_table(spark, sf_dir, "lineitem")
    one = F.lit(1).cast("decimal(3,2)")
    revenue = _dec("l_extendedprice") * (one - _dec("l_discount", 3, 2))
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey)
        .join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .join(supplier, lineitem.l_suppkey == supplier.s_suppkey)
        .where(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(nation, F.col("s_nationkey") == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


_Q03_SQL = """
SELECT n_name,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY n_name
ORDER BY revenue DESC, n_name ASC
"""


# ---------------------------------------------------------------------------
# §2.4 anti-join (upsert's DELETE-matching shape, rs_client.py:250-266)
# ---------------------------------------------------------------------------

def q04_customers_without_urgent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """left_anti on the composite-key shape the reference's upsert DELETE
    used (``rs_client.py:250-266``). Scale: anti-join shuffles once on the
    key; the build side (filtered orders keys, deduped) is broadcast-able.
    """
    c = read_table(spark, sf_dir, "customer")
    urgent = read_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return (
        c.join(urgent, c.c_custkey == urgent.o_custkey, "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    )


_Q04_SQL = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer c
WHERE NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
ORDER BY c_custkey
"""


# ---------------------------------------------------------------------------
# §2.4 semi-join (INSERT ... WHERE NOT EXISTS complement, rs_client.py:189-198)
# ---------------------------------------------------------------------------

def q05_segments_with_urgent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = read_table(spark, sf_dir, "customer")
    urgent = read_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return (
        c.join(urgent, c.c_custkey == urgent.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(_dec("c_acctbal")).cast("double").alias("sum_acctbal"),
        )
        .orderBy("c_mktsegment")
    )


_Q05_SQL = """
SELECT c_mktsegment,
       COUNT(*) AS n_customers,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS sum_acctbal
FROM customer c
WHERE EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


# ---------------------------------------------------------------------------
# §2.6 window: top-N per group (keep-first dedup generalization,
# common.py:294-303 ≙ row_number()==1)
# ---------------------------------------------------------------------------

def q06_top3_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rk")
        .orderBy("o_custkey", "rk")
    )


_Q06_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice, rk
FROM (
    SELECT o_custkey, o_orderkey, o_totalprice,
           ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
    FROM orders) t
WHERE rk <= 3
ORDER BY o_custkey, rk
"""


# ---------------------------------------------------------------------------
# §2.6 window: running aggregation + lag over event streams
# ---------------------------------------------------------------------------

def q07_running_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running sum + lag per user over time. Exact decimal prefix sums keep
    the running total order-independent of float accumulation quirks; final
    cast to double. One shuffle on user_id serves both window functions."""
    e = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = (
        F.sum(_dec("value"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("double")
    )
    return (
        e.select(
            "event_id",
            "user_id",
            F.unix_micros("ts").alias("ts_us"),
            run.alias("running_value"),
            F.lag("event_type", 1).over(w).alias("prev_event_type"),
        )
        .orderBy("user_id", "ts_us")
    )


_Q07_SQL = """
SELECT event_id, user_id,
       epoch_us(ts) AS ts_us,
       CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value,
       LAG(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_event_type
FROM events
ORDER BY user_id, ts_us
"""


# ---------------------------------------------------------------------------
# §2.5 grouping sets: rollup over the region→nation hierarchy
# ---------------------------------------------------------------------------

def q08_acctbal_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = read_table(spark, sf_dir, "customer")
    n = F.broadcast(read_table(spark, sf_dir, "nation"))
    r = F.broadcast(read_table(spark, sf_dir, "region"))
    joined = c.join(n, c.c_nationkey == n.n_nationkey).join(
        r, n.n_regionkey == r.r_regionkey
    )
    return (
        joined.rollup("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(_dec("c_acctbal")).cast("double").alias("sum_acctbal"),
        )
        .orderBy(F.asc_nulls_first("r_name"), F.asc_nulls_first("n_name"))
    )


_Q08_SQL = """
SELECT r_name, n_name,
       COUNT(*) AS n_customers,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS sum_acctbal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST
"""


# ---------------------------------------------------------------------------
# §2.7 sort / top-k
# ---------------------------------------------------------------------------

def q09_top10_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic top-k: orderBy+limit compiles to TakeOrderedAndProject
    — per-partition heaps, no global sort shuffle."""
    p = read_table(spark, sf_dir, "part")
    return (
        p.select("p_partkey", "p_name", "p_brand", "p_retailprice")
        .orderBy(F.desc("p_retailprice"), F.asc("p_partkey"))
        .limit(10)
    )


_Q09_SQL = """
SELECT p_partkey, p_name, p_brand, p_retailprice
FROM part
ORDER BY p_retailprice DESC, p_partkey ASC
LIMIT 10
"""


# ---------------------------------------------------------------------------
# §2.8 set ops
# ---------------------------------------------------------------------------

def q10_status_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT/INTERSECT between order-status slices (FIXTURES.md): customers
    with open ('O') orders but no finished ('F') orders, plus the intersect
    count folded in as a second row discriminator column."""
    o = read_table(spark, sf_dir, "orders")
    open_c = o.where(F.col("o_orderstatus") == "O").select("o_custkey").distinct()
    fin_c = o.where(F.col("o_orderstatus") == "F").select("o_custkey").distinct()
    except_df = open_c.exceptAll(fin_c).select(
        F.lit("open_not_finished").alias("set_op"), "o_custkey"
    )
    intersect_df = open_c.intersectAll(fin_c).select(
        F.lit("open_and_finished").alias("set_op"), "o_custkey"
    )
    return except_df.unionByName(intersect_df).orderBy("set_op", "o_custkey")


_Q10_SQL = """
WITH open_c AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O'),
     fin_c  AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F')
SELECT 'open_not_finished' AS set_op, o_custkey FROM (SELECT o_custkey FROM open_c EXCEPT SELECT o_custkey FROM fin_c)
UNION ALL
SELECT 'open_and_finished' AS set_op, o_custkey FROM (SELECT o_custkey FROM open_c INTERSECT SELECT o_custkey FROM fin_c)
ORDER BY set_op, o_custkey
"""


# ---------------------------------------------------------------------------
# §2.5 distinct aggregation
# ---------------------------------------------------------------------------

def q11_event_type_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_table(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum(_dec("value")).cast("double").alias("sum_value"),
            F.unix_micros(F.min("ts")).alias("first_ts_us"),
            F.unix_micros(F.max("ts")).alias("last_ts_us"),
        )
        .orderBy("event_type")
    )


_Q11_SQL = """
SELECT event_type,
       COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS n_users,
       CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value,
       epoch_us(MIN(ts)) AS first_ts_us,
       epoch_us(MAX(ts)) AS last_ts_us
FROM events
GROUP BY event_type
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# §2.9 nested: JSON props parse + aggregate (from_json, no RDD round-trip)
# ---------------------------------------------------------------------------

def q12_props_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``from_json`` on the events ``props`` payload ↔ the reference's
    to_json/from_json round-trip (``spark_client.py:390-393``) — here with a
    declared schema so the parse stays inside codegen. Oracle extracts the
    same field via regexp (DuckDB-side equivalence, not implementation)."""
    e = read_table(spark, sf_dir, "events")
    parsed = e.withColumn("props_k", F.from_json("props", "k INT").getField("k"))
    return (
        parsed.groupBy("event_type")
        .agg(
            F.count("props_k").alias("n_with_k"),
            F.sum("props_k").alias("sum_k"),
            F.min("props_k").alias("min_k"),
            F.max("props_k").alias("max_k"),
        )
        .orderBy("event_type")
    )


_Q12_SQL = """
SELECT event_type,
       COUNT(k) AS n_with_k,
       CAST(SUM(k) AS BIGINT) AS sum_k,
       MIN(k) AS min_k,
       MAX(k) AS max_k
FROM (SELECT event_type, CAST(regexp_extract(props, '"k":\\s*(-?\\d+)', 1) AS INT) AS k FROM events) t
GROUP BY event_type
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# §2.5 argmax / max_by (udf_filter_max_from_array parity, spark_client.py:321-328)
# ---------------------------------------------------------------------------

def q13_best_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``max_by`` replaces the reference's JSON-round-trip argmax UDF
    (``spark_client.py:321-328,385-395``) with a single partial-aggregable
    expression — map-side combine works, so the shuffle carries one row per
    (customer) not the full order list."""
    o = read_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(
            F.max_by("o_orderkey", "o_totalprice").alias("best_orderkey"),
            F.max("o_totalprice").alias("best_totalprice"),
        )
        .orderBy("o_custkey")
    )


_Q13_SQL = """
SELECT o_custkey,
       arg_max(o_orderkey, o_totalprice) AS best_orderkey,
       MAX(o_totalprice) AS best_totalprice
FROM orders
GROUP BY o_custkey
ORDER BY o_custkey
"""


# ---------------------------------------------------------------------------
# §2.4 as-of join (events time-series; DuckDB ASOF JOIN as oracle)
# ---------------------------------------------------------------------------

def q14_purchase_after_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each purchase event, the most recent prior (or same-instant) view
    by the same user — the canonical as-of join. Implementation:
    ``pyveb_spark.operators.joins.asof_join`` (single shuffle union+window;
    see its docstring for why this beats join+rank at scale)."""
    e = read_table(spark, sf_dir, "events")
    purchases = e.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = e.where(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_event_id"), "user_id", F.col("ts").alias("view_ts")
    )
    joined = asof_join(
        purchases, views, on="user_id", left_ts="ts", right_ts="view_ts",
        direction="backward",
    )
    return joined.select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        "view_event_id",
        F.unix_micros("view_ts").alias("view_ts_us"),
    ).orderBy("event_id")


_Q14_SQL = """
SELECT p.event_id,
       p.user_id,
       epoch_us(p.ts) AS ts_us,
       v.event_id AS view_event_id,
       epoch_us(v.ts) AS view_ts_us
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
  ON p.user_id = v.user_id AND v.ts <= p.ts
ORDER BY p.event_id
"""


# ---------------------------------------------------------------------------
# §2.3 cleaning: clamp-old-dates (spark_client.py:445-461) as a query
# ---------------------------------------------------------------------------

def q20_orders_clamped_years(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders")
    clamped = clean_old_dates(o, ["o_orderdate"], floor="1996-01-01")
    return (
        clamped.groupBy(F.year("o_orderdate").alias("order_year"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(_dec("o_totalprice")).cast("double").alias("sum_totalprice"),
        )
        .orderBy("order_year")
    )


_Q20_SQL = """
SELECT EXTRACT(year FROM CASE WHEN o_orderdate < TIMESTAMP '1996-01-01'
                              THEN TIMESTAMP '1996-01-01' ELSE o_orderdate END)::INT AS order_year,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_totalprice
FROM orders
GROUP BY 1
ORDER BY order_year
"""


# ---------------------------------------------------------------------------
# §2.5 cube over (l_returnflag, l_linestatus) (FIXTURES.md)
# ---------------------------------------------------------------------------

def q22_lineitem_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = read_table(spark, sf_dir, "lineitem")
    return (
        l.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
        )
        .orderBy(
            F.asc_nulls_first("l_returnflag"), F.asc_nulls_first("l_linestatus")
        )
    )


_Q22_SQL = """
SELECT l_returnflag, l_linestatus,
       COUNT(*) AS n_items,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST
"""


# ---------------------------------------------------------------------------
# §2.5 grouping sets via the SQL surface (spark.sql works over temp views)
# ---------------------------------------------------------------------------

def q23_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    read_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_totalprice
        FROM orders_v
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
        """
    )


_Q23_SQL = """
SELECT o_orderstatus, o_orderpriority,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_totalprice
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
"""


# ---------------------------------------------------------------------------
# §2.10 scalar string/date function surface
# ---------------------------------------------------------------------------

def q24_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = read_table(spark, sf_dir, "part")
    return (
        p.select(
            "p_partkey",
            F.upper("p_name").alias("name_upper"),
            F.length("p_name").alias("name_len"),
            F.substring("p_brand", 1, 5).alias("brand_prefix"),
            F.regexp_extract("p_brand", r"(\d+)", 1).alias("brand_num"),
            F.concat_ws("/", "p_brand", "p_type").alias("brand_type"),
            F.regexp_replace("p_type", " ", "_").alias("type_snake"),
            F.trim(F.lower("p_type")).alias("type_norm"),
        )
        .orderBy("p_partkey")
        .limit(500)
    )


_Q24_SQL = """
SELECT p_partkey,
       upper(p_name) AS name_upper,
       length(p_name) AS name_len,
       substr(p_brand, 1, 5) AS brand_prefix,
       regexp_extract(p_brand, '(\\d+)', 1) AS brand_num,
       concat_ws('/', p_brand, p_type) AS brand_type,
       regexp_replace(p_type, ' ', '_', 'g') AS type_snake,
       trim(lower(p_type)) AS type_norm
FROM part
ORDER BY p_partkey
LIMIT 500
"""


# ---------------------------------------------------------------------------
# §2.5 relational surface: pivot (wide conditional aggregation)
# ---------------------------------------------------------------------------

def q33_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order totals pivoted by status — ``groupBy().pivot()`` compiles to
    one hash aggregate with conditional sums (single shuffle, no joins)."""
    o = read_table(spark, sf_dir, "orders")
    p = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.sum(_dec("o_totalprice")).cast("double"))
    )
    return (
        p.withColumnsRenamed(
            {"F": "total_f", "O": "total_o", "P": "total_p"}
        ).orderBy("o_orderpriority")
    )


_Q33_SQL = """
SELECT o_orderpriority,
       CAST(SUM(CASE WHEN o_orderstatus = 'F'
                     THEN CAST(o_totalprice AS DECIMAL(12,2)) END) AS DOUBLE) AS total_f,
       CAST(SUM(CASE WHEN o_orderstatus = 'O'
                     THEN CAST(o_totalprice AS DECIMAL(12,2)) END) AS DOUBLE) AS total_o,
       CAST(SUM(CASE WHEN o_orderstatus = 'P'
                     THEN CAST(o_totalprice AS DECIMAL(12,2)) END) AS DOUBLE) AS total_p
FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# §2.5 relational surface: exact percentiles (R-7 interpolation both engines;
# l_quantity is integer-valued so every interpolated value is binary-exact)
# ---------------------------------------------------------------------------

def q75_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = read_table(spark, sf_dir, "lineitem")
    return (
        l.groupBy("l_returnflag")
        .agg(
            F.expr("percentile(l_quantity, 0.25D)").alias("p25"),
            F.expr("percentile(l_quantity, 0.5D)").alias("p50"),
            F.expr("percentile(l_quantity, 0.75D)").alias("p75"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .orderBy("l_returnflag")
    )


_Q75_SQL = """
SELECT l_returnflag,
       quantile_cont(l_quantity, 0.25) AS p25,
       quantile_cont(l_quantity, 0.5)  AS p50,
       quantile_cont(l_quantity, 0.75) AS p75,
       COUNT(*) AS n_rows
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


# ---------------------------------------------------------------------------
# §2.4 joins: time-range join on the events stream (views in the hour
# before each purchase — the interval-predicate join family)
# ---------------------------------------------------------------------------

def q35_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-key (user) + time-range join: shuffles on user_id, the range
    predicate is evaluated inside the sort-merge join — no cross product.
    At skewed-user scale: AQE skew-join split or pre-bucketing by user."""
    e = read_table(spark, sf_dir, "events")
    p = e.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.col("ts").alias("p_ts")
    )
    v = e.where(F.col("event_type") == "view").select(
        F.col("user_id"), F.col("ts").alias("v_ts")
    )
    cond = (
        (p["user_id"] == v["user_id"])
        & (v["v_ts"] >= p["p_ts"] - F.expr("INTERVAL 1 HOUR"))
        & (v["v_ts"] < p["p_ts"])
    )
    return (
        p.join(v, cond, "left")
        .groupBy("event_id")
        .agg(F.count("v_ts").alias("n_prior_views"))
        .orderBy("event_id")
    )


_Q35_SQL = """
SELECT p.event_id, COUNT(v.ts) AS n_prior_views
FROM events p
LEFT JOIN events v
  ON v.user_id = p.user_id AND v.event_type = 'view'
 AND v.ts >= p.ts - INTERVAL 1 HOUR AND v.ts < p.ts
WHERE p.event_type = 'purchase'
GROUP BY p.event_id ORDER BY p.event_id
"""


# ---------------------------------------------------------------------------
# §2.8 relational surface: unpivot / melt (wide → long)
# ---------------------------------------------------------------------------

def q39_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = read_table(spark, sf_dir, "lineitem")
    measures = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    long = l.unpivot(
        ids=["l_orderkey"],
        values=measures,
        variableColumnName="measure",
        valueColumnName="value",
    )
    return (
        long.groupBy("measure")
        .agg(
            F.sum(_dec("value", 18, 2)).cast("double").alias("total"),
            F.count(F.lit(1)).alias("n_values"),
        )
        .orderBy("measure")
    )


_Q39_SQL = """
WITH long AS (
    SELECT 'l_quantity' AS measure, l_quantity AS value FROM lineitem
    UNION ALL SELECT 'l_extendedprice', l_extendedprice FROM lineitem
    UNION ALL SELECT 'l_discount', l_discount FROM lineitem
    UNION ALL SELECT 'l_tax', l_tax FROM lineitem)
SELECT measure,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total,
       COUNT(*) AS n_values
FROM long GROUP BY measure ORDER BY measure
"""


# ---------------------------------------------------------------------------
# Relational depth: correlated subqueries (TPC-H Q17 / Q21 shapes)
# ---------------------------------------------------------------------------

def q83_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue from small-quantity orders of one brand,
    where "small" is a correlated per-part threshold (20% of that part's
    average quantity). Written in the decorrelated form Catalyst would
    rewrite the subquery into anyway: pre-aggregate the per-part average,
    join back on l_partkey. Both the aggregation and the join shuffle on
    the same key, so the exchange is reused; the brand filter is a
    broadcast semi-join that prunes before the expensive join. Quantity
    sums are exact (integer-valued doubles < 2^53), so the 0.2·avg
    threshold is bit-identical across engines.
    """
    l = read_table(spark, sf_dir, "lineitem")
    p = read_table(spark, sf_dir, "part")
    thresh = l.groupBy("l_partkey").agg(
        (
            F.lit(0.2) * (F.sum("l_quantity") / F.count(F.lit(1)))
        ).alias("__t")
    )
    brand = p.where(F.col("p_brand") == "Brand#1").select("p_partkey")
    return (
        l.join(
            F.broadcast(brand), l.l_partkey == brand.p_partkey, "left_semi"
        )
        .join(thresh, "l_partkey")
        .where(F.col("l_quantity") < F.col("__t"))
        .agg(
            (F.sum(_dec("l_extendedprice")).cast("double") / F.lit(7.0)).alias(
                "avg_yearly"
            )
        )
    )


_Q83_SQL = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0
           AS avg_yearly
FROM lineitem l
JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#1'
  AND l_quantity < (SELECT 0.2 * (SUM(l2.l_quantity) / COUNT(*))
                    FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
"""


def q48_last_shipper(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (adapted to the fixture's columns): for finalized
    orders with lines from multiple suppliers, count per supplier how
    often they were the strictly-last to ship. EXISTS → left-semi join,
    NOT EXISTS → left-anti join with a non-equi conjunct; all three
    lineitem roles shuffle on l_orderkey so AQE plans one co-partitioned
    exchange chain, and the supplier-name join broadcasts.
    """
    l = read_table(spark, sf_dir, "lineitem")
    o = read_table(spark, sf_dir, "orders")
    s = read_table(spark, sf_dir, "supplier")
    l1 = l.select("l_orderkey", "l_suppkey", "l_shipdate")
    f_orders = o.where(F.col("o_orderstatus") == "F").select("o_orderkey")
    l2 = l.select(
        F.col("l_orderkey").alias("__ok"), F.col("l_suppkey").alias("__sk")
    )
    l3 = l.select(
        F.col("l_orderkey").alias("__ok3"),
        F.col("l_suppkey").alias("__sk3"),
        F.col("l_shipdate").alias("__sd3"),
    )
    base = (
        l1.join(f_orders, l1.l_orderkey == f_orders.o_orderkey, "left_semi")
        .join(
            l2,
            (F.col("l_orderkey") == F.col("__ok"))
            & (F.col("l_suppkey") != F.col("__sk")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l_orderkey") == F.col("__ok3"))
            & (F.col("l_suppkey") != F.col("__sk3"))
            & (F.col("__sd3") > F.col("l_shipdate")),
            "left_anti",
        )
    )
    return (
        base.join(F.broadcast(s), base.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


_Q48_SQL = """
SELECT s_name, COUNT(*) AS numwait
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders ON o_orderkey = l1.l_orderkey
WHERE o_orderstatus = 'F'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > l1.l_shipdate)
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 20
"""


# ---------------------------------------------------------------------------
# Relational depth: scalar-aggregate subqueries (TPC-H Q11 / Q15 / Q22 shapes)
# ---------------------------------------------------------------------------

def q51_part_value_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-part revenue from one nation's suppliers,
    keeping parts whose value exceeds a fraction of the nation's total —
    a HAVING against an uncorrelated scalar aggregate. The scalar is the
    re-aggregation of the grouped result itself (no second scan of
    lineitem) and reaches the filter as a 1-row broadcast cross join.
    Value sums are exact decimal; the threshold compare casts both sides
    to double for one identical IEEE multiply per engine."""
    l = read_table(spark, sf_dir, "lineitem")
    s = read_table(spark, sf_dir, "supplier")
    n = read_table(spark, sf_dir, "nation")
    one = F.lit(1).cast("decimal(3,2)")
    value = _dec("l_extendedprice") * (one - _dec("l_discount", 3, 2))
    supp = s.join(
        F.broadcast(n.where(F.col("n_name") == "NATION_3")),
        s.s_nationkey == n.n_nationkey,
        "left_semi",
    ).select("s_suppkey")
    grouped = (
        l.join(F.broadcast(supp), l.l_suppkey == supp.s_suppkey, "left_semi")
        .groupBy("l_partkey")
        .agg(F.sum(value).alias("__v"))
    )
    total = grouped.agg(
        (F.sum("__v").cast("double") * F.lit(0.001)).alias("__t")
    )
    return (
        grouped.crossJoin(F.broadcast(total))
        .where(F.col("__v").cast("double") > F.col("__t"))
        .select("l_partkey", F.col("__v").cast("double").alias("value"))
        .orderBy(F.desc("value"), "l_partkey")
    )


_Q51_SQL = """
WITH grouped AS (
  SELECT l_partkey,
         SUM(CAST(l_extendedprice AS DECIMAL(12,2))
             * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS v
  FROM lineitem
  WHERE l_suppkey IN (SELECT s_suppkey FROM supplier
                      JOIN nation ON s_nationkey = n_nationkey
                      WHERE n_name = 'NATION_3')
  GROUP BY l_partkey
)
SELECT l_partkey, CAST(v AS DOUBLE) AS value
FROM grouped
WHERE CAST(v AS DOUBLE) > (SELECT CAST(SUM(v) AS DOUBLE) * 0.001 FROM grouped)
ORDER BY value DESC, l_partkey
"""


def q52_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) with the maximum quarterly revenue,
    ties kept — equality against a scalar MAX of a grouped aggregate. The
    revenue stays DECIMAL end-to-end so the tie compare is exact (the
    whole point of the Q15 shape); only the output casts to double. The
    grouped result is computed once and reused for both the max and the
    filter (Spark reuses the shuffle; no second lineitem scan), and the
    name lookup broadcasts."""
    l = read_table(spark, sf_dir, "lineitem")
    s = read_table(spark, sf_dir, "supplier")
    one = F.lit(1).cast("decimal(3,2)")
    revenue = _dec("l_extendedprice") * (one - _dec("l_discount", 3, 2))
    rev = (
        l.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(F.sum(revenue).alias("__rev"))
    )
    top = rev.agg(F.max("__rev").alias("__max"))
    return (
        rev.crossJoin(F.broadcast(top))
        .where(F.col("__rev") == F.col("__max"))
        .join(F.broadcast(s), rev.l_suppkey == s.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.col("__rev").cast("double").alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


_Q52_SQL = """
WITH rev AS (
  SELECT l_suppkey,
         SUM(CAST(l_extendedprice AS DECIMAL(12,2))
             * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS r
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, CAST(r AS DOUBLE) AS total_revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE r = (SELECT MAX(r) FROM rev)
ORDER BY s_suppkey
"""


def q53_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: customers with above-average positive balance and
    no *recent* orders (none since 1999 — the fixture gives every customer
    at least one lifetime order, so the idle test is date-bounded exactly
    like Q22's 7-year window), summarized per market segment — a scalar
    AVG subquery plus a NOT EXISTS anti-join. The scalar broadcasts; the
    anti-join shuffles customer against the pre-filtered orders key
    projection (at 100 TB AQE converts it to broadcast if the
    distinct-custkey side compresses enough). The average is
    exact-decimal-sum / count — one IEEE division per engine."""
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp")
    )
    avg_pos = c.where(F.col("c_acctbal") > 0).agg(
        (
            F.sum(_dec("c_acctbal")).cast("double") / F.count(F.lit(1))
        ).alias("__avg")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .crossJoin(F.broadcast(avg_pos))
        .where(F.col("c_acctbal") > F.col("__avg"))
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(_dec("c_acctbal")).cast("double").alias("totacctbal"),
        )
        .orderBy("c_mktsegment")
    )


_Q53_SQL = """
SELECT c_mktsegment, COUNT(*) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
FROM customer
WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
                          / COUNT(*)
                   FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '1999-01-01')
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


# ---------------------------------------------------------------------------
# Relational depth: outer-join distribution / disjunctive pushdown / HAVING-IN
# (TPC-H Q13 / Q19 / Q18 shapes)
# ---------------------------------------------------------------------------

def q58_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: distribution of customers by order count,
    including zero-order customers — a LEFT OUTER join whose NULLs are
    the point, then two stacked aggregations (per-customer count, then
    histogram). The filtered-orders side shuffles once on o_custkey; the
    second agg's input is one row per customer, so its shuffle is tiny.
    COUNT(col) (not COUNT(*)) makes unmatched customers count 0."""
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


_Q58_SQL = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
) c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


def q59_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue under an OR of conjunctive brand/size/
    quantity clauses. The shared conjuncts (join key equality) stay in
    the join condition; the disjunction is a single post-join filter that
    Catalyst partially pushes: the quantity/size bounds common to all
    branches reach both scans (CNF extraction), the rest evaluates once
    per joined row. Part is a broadcast dimension."""
    l = read_table(spark, sf_dir, "lineitem")
    p = read_table(spark, sf_dir, "part")
    one = F.lit(1).cast("decimal(3,2)")
    revenue = _dec("l_extendedprice") * (one - _dec("l_discount", 3, 2))
    joined = l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
    branch1 = (
        (F.col("p_brand") == "Brand#1")
        & (F.col("p_size").between(1, 15))
        & (F.col("l_quantity").between(1, 11))
    )
    branch2 = (
        (F.col("p_brand") == "Brand#2")
        & (F.col("p_size").between(1, 25))
        & (F.col("l_quantity").between(10, 20))
    )
    branch3 = (
        (F.col("p_brand") == "Brand#3")
        & (F.col("p_size").between(1, 35))
        & (F.col("l_quantity").between(20, 30))
    )
    return joined.where(branch1 | branch2 | branch3).agg(
        F.sum(revenue).cast("double").alias("revenue")
    )


_Q59_SQL = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
             * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2))))
        AS DOUBLE) AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
       AND l_quantity BETWEEN 20 AND 30)
"""


def q60_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose total quantity exceeds a threshold
    (HAVING over a grouped sum), joined back to customer/order detail.
    The big-quantity key set comes from one lineitem aggregation and
    semi-joins lineitem again on the SAME key — Spark reuses the
    l_orderkey exchange for both; order/customer lookups broadcast after
    the filter collapses cardinality. Top-k is a heap, not a sort."""
    l = read_table(spark, sf_dir, "lineitem")
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum(_dec("l_quantity")).alias("__q"))
        .where(F.col("__q") > F.lit(150))
    )
    return (
        o.join(big, o.o_orderkey == big.l_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_totalprice",
            F.col("__q").cast("double").alias("total_qty"),
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(50)
    )


_Q60_SQL = """
SELECT c_name, c_custkey, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       o_totalprice,
       CAST(q AS DOUBLE) AS total_qty
FROM orders
JOIN (SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(12,2))) AS q
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 150) big
  ON o_orderkey = big.l_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 50
"""


# ---------------------------------------------------------------------------
# Relational depth: conditional-aggregate ratio / NOT-IN distinct / bilateral
# volume (TPC-H Q14 / Q16 / Q7 shapes)
# ---------------------------------------------------------------------------

def q68_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo revenue as a percentage of total revenue in
    one month — two conditional aggregates over a single scan (the
    CASE-inside-SUM pattern; no second pass, no join for the ratio).
    Decimal-exact numerator/denominator, one IEEE division."""
    l = read_table(spark, sf_dir, "lineitem")
    p = read_table(spark, sf_dir, "part")
    one = F.lit(1).cast("decimal(3,2)")
    rev = _dec("l_extendedprice") * (one - _dec("l_discount", 3, 2))
    promo = F.when(
        F.col("p_type") == "PROMO", rev
    ).otherwise(F.lit(0).cast("decimal(14,4)"))
    return (
        l.where(
            (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .agg(
            (
                F.lit(100.0)
                * F.sum(promo).cast("double")
                / F.sum(rev).cast("double")
            ).alias("promo_revenue_pct")
        )
    )


_Q68_SQL = """
SELECT 100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
             THEN CAST(l_extendedprice AS DECIMAL(12,2))
                  * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))
             ELSE CAST(0 AS DECIMAL(14,4)) END) AS DOUBLE)
       / CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                  * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2))))
              AS DOUBLE) AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-03-01'
  AND l_shipdate < TIMESTAMP '1996-04-01'
"""


def q69_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct supplier count per part attribute, with a
    NOT-IN exclusion list (suppliers from one nation) compiled to an
    anti-join. The count-distinct aggregates after the join; the
    exclusion list broadcasts."""
    l = read_table(spark, sf_dir, "lineitem")
    p = read_table(spark, sf_dir, "part")
    s = read_table(spark, sf_dir, "supplier")
    n = read_table(spark, sf_dir, "nation")
    excluded = s.join(
        F.broadcast(n.where(F.col("n_name") == "NATION_7")),
        s.s_nationkey == n.n_nationkey,
        "left_semi",
    ).select("s_suppkey")
    return (
        l.join(F.broadcast(excluded), l.l_suppkey == excluded.s_suppkey, "left_anti")
        .join(F.broadcast(p.where(F.col("p_size").isin(1, 5, 9))), l.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_size")
    )


_Q69_SQL = """
SELECT p_brand, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_size IN (1, 5, 9)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                        JOIN nation ON s_nationkey = n_nationkey
                        WHERE n_name = 'NATION_7')
GROUP BY p_brand, p_size
ORDER BY supplier_cnt DESC, p_brand, p_size
"""


def q70_bilateral_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: shipping volume between two nations per year — a
    supplier-nation × customer-nation cross condition with the
    symmetric OR, grouped by year. Both nation filters broadcast before
    the big fact joins; the year extraction stays a scan-stage
    expression."""
    l = read_table(spark, sf_dir, "lineitem")
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    s = read_table(spark, sf_dir, "supplier")
    n = read_table(spark, sf_dir, "nation")
    one = F.lit(1).cast("decimal(3,2)")
    rev = _dec("l_extendedprice") * (one - _dec("l_discount", 3, 2))
    n1 = n.where(F.col("n_name").isin("NATION_1", "NATION_2"))
    sn = s.join(F.broadcast(n1), s.s_nationkey == n1.n_nationkey).select(
        "s_suppkey", F.col("n_name").alias("supp_nation")
    )
    cn = c.join(
        F.broadcast(n1.select(F.col("n_nationkey").alias("cnk"), F.col("n_name").alias("cust_nation"))),
        c.c_nationkey == F.col("cnk"),
    ).select("c_custkey", "cust_nation")
    return (
        l.join(F.broadcast(sn), l.l_suppkey == sn.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(cn, o.o_custkey == cn.c_custkey)
        .where(
            (
                (F.col("supp_nation") == "NATION_1")
                & (F.col("cust_nation") == "NATION_2")
            )
            | (
                (F.col("supp_nation") == "NATION_2")
                & (F.col("cust_nation") == "NATION_1")
            )
        )
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


_Q70_SQL = """
SELECT supp_nation, cust_nation, l_year,
       CAST(SUM(vol) AS DOUBLE) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         EXTRACT(year FROM l_shipdate) AS l_year,
         CAST(l_extendedprice AS DECIMAL(12,2))
           * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2))) AS vol
  FROM lineitem
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
     OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
) shipping
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


def q77_cheapest_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (adapted: unit price from lineitem stands in for
    ps_supplycost): for each small part, the supplier(s) offering the
    minimum unit price — a correlated MIN subquery decorrelated into a
    per-part aggregate joined back on (part, price), ties kept exactly
    (decimal compare). Both the per-pair aggregation and the min-join
    shuffle on l_partkey so the exchange is reused."""
    l = read_table(spark, sf_dir, "lineitem")
    p = read_table(spark, sf_dir, "part")
    s = read_table(spark, sf_dir, "supplier")
    # plain double division: both inputs are bit-identical 2-decimal
    # doubles in every engine, so one IEEE divide gives bit-identical
    # units — decimal division would round through engine-specific
    # intermediate scales instead
    unit = F.col("l_extendedprice") / F.col("l_quantity")
    small = p.where(F.col("p_size") <= 3).select("p_partkey", "p_name")
    offers = (
        l.join(F.broadcast(small), l.l_partkey == small.p_partkey, "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(unit).alias("__unit"))
    )
    best = offers.groupBy("l_partkey").agg(F.min("__unit").alias("__best"))
    return (
        offers.join(
            best,
            (offers.l_partkey == best.l_partkey)
            & (offers.__unit == best.__best),
        )
        .drop(best.l_partkey)
        .join(F.broadcast(small), F.col("l_partkey") == small.p_partkey)
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .select(
            "p_name",
            "l_partkey",
            "s_name",
            F.col("__unit").alias("min_unit_price"),
        )
        .orderBy("l_partkey", "s_name")
    )


_Q77_SQL = """
WITH offers AS (
  SELECT l_partkey, l_suppkey,
         MIN(l_extendedprice / l_quantity) AS unit
  FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size <= 3)
  GROUP BY l_partkey, l_suppkey
)
SELECT p_name, l_partkey, s_name, unit AS min_unit_price
FROM offers
JOIN part ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
WHERE unit = (SELECT MIN(o2.unit) FROM offers o2
              WHERE o2.l_partkey = offers.l_partkey)
ORDER BY l_partkey, s_name
"""


def q79_excess_stock_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (the last of the 22 expressible on this fixture —
    Q4's commit/receipt dates don't exist here): suppliers whose recent
    shipments of small parts exceed half their all-time volume of those
    parts — a semi-join chain (part filter → lineitem) into a correlated
    half-of-total threshold, then a star join out to supplier/nation.

    Scale shape: the part filter broadcasts as a semi-join that prunes
    lineitem BEFORE its single shuffle on l_suppkey; the conditional sum
    rides the same aggregation as the total (one pass, no second scan —
    the decorrelated form of Q20's nested subquery); supplier and nation
    are broadcast. Quantities are integer-valued doubles, so the 0.5·total
    threshold is exact in every engine."""
    l = read_table(spark, sf_dir, "lineitem")
    p = read_table(spark, sf_dir, "part")
    s = read_table(spark, sf_dir, "supplier")
    n = read_table(spark, sf_dir, "nation")
    small = p.where(F.col("p_size") <= 10).select("p_partkey")
    per_supp = (
        l.join(F.broadcast(small), l.l_partkey == small.p_partkey, "left_semi")
        .groupBy("l_suppkey")
        .agg(
            F.sum("l_quantity").cast("bigint").alias("total_qty"),
            F.sum(
                F.when(F.year("l_shipdate") >= 1995, F.col("l_quantity"))
                .otherwise(F.lit(0.0))
            ).cast("bigint").alias("recent_qty"),
        )
        .where(F.col("recent_qty") * 2 > F.col("total_qty"))
    )
    return (
        per_supp.join(F.broadcast(s), per_supp.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select(
            "s_name",
            F.col("n_name").alias("nation"),
            "recent_qty",
            "total_qty",
        )
        .orderBy("s_name")
    )


_Q79_SQL = """
WITH small AS (SELECT p_partkey FROM part WHERE p_size <= 10),
per_supp AS (
  SELECT l_suppkey,
         CAST(SUM(l_quantity) AS BIGINT) AS total_qty,
         CAST(SUM(CASE WHEN EXTRACT(year FROM l_shipdate) >= 1995
                       THEN l_quantity ELSE 0 END) AS BIGINT) AS recent_qty
  FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM small)
  GROUP BY l_suppkey
  HAVING CAST(SUM(CASE WHEN EXTRACT(year FROM l_shipdate) >= 1995
                       THEN l_quantity ELSE 0 END) AS BIGINT) * 2
         > CAST(SUM(l_quantity) AS BIGINT)
)
SELECT s.s_name, n.n_name AS nation, ps.recent_qty, ps.total_qty
FROM per_supp ps
JOIN supplier s ON s.s_suppkey = ps.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
ORDER BY s.s_name
"""


def q74_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of a region's order revenue per
    year — a conditional-sum / total-sum ratio over the full star join.
    The numerator condition rides the supplier-nation column through the
    aggregation (no second scan); both sums stay exact decimal and the
    share is one IEEE division per year."""
    l = read_table(spark, sf_dir, "lineitem")
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    s = read_table(spark, sf_dir, "supplier")
    n = read_table(spark, sf_dir, "nation")
    r = read_table(spark, sf_dir, "region")
    one = F.lit(1).cast("decimal(3,2)")
    rev = _dec("l_extendedprice") * (one - _dec("l_discount", 3, 2))
    cust_in_region = c.join(
        F.broadcast(
            n.join(
                F.broadcast(r.where(F.col("r_name") == "EUROPE")),
                n.n_regionkey == r.r_regionkey,
            ).select("n_nationkey")
        ),
        c.c_nationkey == F.col("n_nationkey"),
        "left_semi",
    ).select("c_custkey")
    supp_nation = s.join(
        F.broadcast(n.select(F.col("n_nationkey").alias("snk"), F.col("n_name"))),
        s.s_nationkey == F.col("snk"),
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    target = F.when(F.col("supp_nation") == "NATION_5", rev).otherwise(
        F.lit(0).cast("decimal(14,4)")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(cust_in_region, o.o_custkey == cust_in_region.c_custkey, "left_semi")
        .join(F.broadcast(supp_nation), l.l_suppkey == supp_nation.s_suppkey)
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (
                F.sum(target).cast("double") / F.sum(rev).cast("double")
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


_Q74_SQL = """
SELECT EXTRACT(year FROM o_orderdate) AS o_year,
       CAST(SUM(CASE WHEN n1.n_name = 'NATION_5'
                THEN CAST(l_extendedprice AS DECIMAL(12,2))
                     * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))
                ELSE CAST(0 AS DECIMAL(14,4)) END) AS DOUBLE)
       / CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                  * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2))))
              AS DOUBLE) AS mkt_share
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
JOIN region ON n2.n_regionkey = r_regionkey
WHERE r_name = 'EUROPE'
GROUP BY o_year
ORDER BY o_year
"""


def q34_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (cost adapted: the fixture has no ps_supplycost, so
    the part's retail price stands in): profit per supplier nation per
    year for one part-name family. Amounts stay decimal through the
    aggregation; the part filter is a broadcast semi-prune before the
    fact joins."""
    l = read_table(spark, sf_dir, "lineitem")
    o = read_table(spark, sf_dir, "orders")
    s = read_table(spark, sf_dir, "supplier")
    n = read_table(spark, sf_dir, "nation")
    p = read_table(spark, sf_dir, "part")
    one = F.lit(1).cast("decimal(3,2)")
    amount = _dec("l_extendedprice") * (one - _dec("l_discount", 3, 2)) - _dec(
        "p_retailprice"
    ) * _dec("l_quantity")
    green = p.where(F.col("p_name").like("%bolt%")).select(
        "p_partkey", "p_retailprice"
    )
    return (
        l.join(F.broadcast(green), l.l_partkey == green.p_partkey)
        .join(o.select("o_orderkey", "o_orderdate"), l.l_orderkey == F.col("o_orderkey"))
        .join(F.broadcast(s.select("s_suppkey", "s_nationkey")), l.l_suppkey == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(F.sum(amount).cast("double").alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


_Q34_SQL = """
SELECT n_name AS nation, EXTRACT(year FROM o_orderdate) AS o_year,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))
                - CAST(p_retailprice AS DECIMAL(12,2))
                  * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
           AS sum_profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_name LIKE '%bolt%'
GROUP BY n_name, o_year
ORDER BY n_name, o_year DESC
"""


def q71_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (adapted: the fixture has no l_shipmode, so the
    return flag plays the grouping role): per flag, how many high- vs
    low-priority orders shipped in a year — paired conditional COUNT
    aggregates after one fact-dimension join."""
    l = read_table(spark, sf_dir, "lineitem")
    o = read_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


_Q71_SQL = """
SELECT l_returnflag,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


def q72_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: revenue per nation from orders where customer and
    supplier share the nation, within one region — the 6-way star join
    whose selectivity comes from an equality BETWEEN two fact-side
    foreign keys (c_nationkey = s_nationkey). All dimension sides
    broadcast; the customer-supplier nation equality evaluates post-join
    on the co-shuffled fact rows."""
    l = read_table(spark, sf_dir, "lineitem")
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    s = read_table(spark, sf_dir, "supplier")
    n = read_table(spark, sf_dir, "nation")
    r = read_table(spark, sf_dir, "region")
    one = F.lit(1).cast("decimal(3,2)")
    rev = _dec("l_extendedprice") * (one - _dec("l_discount", 3, 2))
    asia_nations = n.join(
        F.broadcast(r.where(F.col("r_name") == "ASIA")),
        n.n_regionkey == r.r_regionkey,
    ).select("n_nationkey", "n_name")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .where(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(
            F.broadcast(asia_nations),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("n_name")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


_Q72_SQL = """
SELECT n_name,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2))))
            AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE c_nationkey = s_nationkey AND r_name = 'ASIA'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


def q73_returned_item_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top customers by revenue lost to returns in a
    quarter — fact filter (return flag) → join up the customer/nation
    star → top-20 heap. The canonical 'who do we call' report."""
    l = read_table(spark, sf_dir, "lineitem")
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    n = read_table(spark, sf_dir, "nation")
    one = F.lit(1).cast("decimal(3,2)")
    rev = _dec("l_extendedprice") * (one - _dec("l_discount", 3, 2))
    return (
        l.where(F.col("l_returnflag") == "R")
        .join(
            o.where(
                (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
            ),
            l.l_orderkey == o.o_orderkey,
        )
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


_Q73_SQL = """
SELECT c_custkey, c_name, c_acctbal, n_name,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2))))
            AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1996-04-01'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


# ---------------------------------------------------------------------------
# §2.9 semi-structured: VARIANT-typed JSON (Spark 4 open JSON type)
# ---------------------------------------------------------------------------

def q63_variant_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The q12 props extraction on Spark 4's VARIANT type: ``parse_json``
    once into the binary variant encoding, ``variant_get`` typed paths out
    — no per-query schema declaration, no re-parse per field, and the
    shredded encoding scans faster than JSON strings at 100 TB. Aggregates
    the extracted value per event type; oracle does the same with ANSI
    json_extract."""
    e = read_table(spark, sf_dir, "events")
    k = F.variant_get(F.parse_json(F.col("props")), "$.k", "int")
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("sum_k"),
            F.min("k").cast("long").alias("min_k"),
            F.max("k").cast("long").alias("max_k"),
        )
        .orderBy("event_type")
    )


_Q63_SQL = """
SELECT event_type, COUNT(*) AS n,
       CAST(SUM(k) AS BIGINT) AS sum_k,
       MIN(k) AS min_k, MAX(k) AS max_k
FROM (SELECT event_type,
             CAST(json_extract(props, '$.k') AS BIGINT) AS k
      FROM events)
GROUP BY event_type
ORDER BY event_type
"""


def q108_join_size_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-flight join sizing: the EXACT output cardinality of
    lineitem ⋈ orders on orderkey from the two per-key count tables —
    no fact-row join materializes (Σ c_A(k)·c_B(k)). With q104's skew
    profile, these are the two numbers that size every shuffle join
    before it runs."""
    from pyveb_spark.operators.joins import join_size_estimate

    l = read_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("okey")
    )
    o = read_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("okey")
    )
    return join_size_estimate(l, o, ["okey"])


_Q108_SQL = """
WITH ca AS (SELECT l_orderkey AS okey, COUNT(*) AS ca FROM lineitem GROUP BY 1),
cb AS (SELECT o_orderkey AS okey, COUNT(*) AS cb FROM orders GROUP BY 1),
m AS (SELECT COUNT(*) AS n_join_keys,
             COALESCE(SUM(ca * cb), 0)::BIGINT AS est_rows
      FROM ca JOIN cb USING (okey))
SELECT (SELECT COUNT(*) FROM lineitem) AS left_rows,
       (SELECT COUNT(*) FROM orders) AS right_rows,
       n_join_keys, est_rows
FROM m
"""


def q115_fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-resolution candidate pairs over the part-name dictionary:
    distinct names blocked by their noun (second token), verified at
    edit distance ≤ 4 (``operators/joins.py::fuzzy_pairs_blocked``).
    Dictionary-first is the scale design — the pair join runs on the
    DISTINCT names (dictionary-sized), never the fact rows, and the
    block key bounds the quadratic term to the largest block."""
    from pyveb_spark.operators.joins import fuzzy_pairs_blocked

    names = (
        read_table(spark, sf_dir, "part").select("p_name").distinct()
    )
    pairs = fuzzy_pairs_blocked(
        names,
        "p_name",
        [F.element_at(F.split(F.col("p_name"), " "), 2).alias("noun")],
        max_distance=4,
    )
    return pairs.select(
        F.col("__b0").alias("noun"), "a_p_name", "b_p_name", "dist"
    ).orderBy("noun", "a_p_name", "b_p_name")


_Q115_SQL = """
WITH n AS (SELECT DISTINCT p_name FROM part),
b AS (SELECT p_name, split_part(p_name, ' ', 2) AS noun FROM n)
SELECT x.noun AS noun,
       x.p_name AS a_p_name,
       y.p_name AS b_p_name,
       levenshtein(x.p_name, y.p_name) AS dist
FROM b x
JOIN b y ON x.noun = y.noun AND x.p_name < y.p_name
WHERE levenshtein(x.p_name, y.p_name) <= 4
ORDER BY noun, a_p_name, b_p_name
"""


def q132_salted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The salted skew join end-to-end under the value-hash oracle
    (``operators/joins.py::salted_join``): lineitem ⋈ orders on orderkey
    with 8 salt buckets, revenue per order priority. The oracle runs the
    PLAIN join — hash equality certifies that salting is semantically
    invisible (salt columns never escape), the property that lets a
    hot-key job switch to the salted form without revalidating results."""
    from pyveb_spark.operators.joins import salted_join

    l = read_table(spark, sf_dir, "lineitem")
    o = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    one = F.lit(1).cast("decimal(3,2)")
    joined = salted_join(
        l.withColumnRenamed("l_orderkey", "okey"),
        o.withColumnRenamed("o_orderkey", "okey"),
        on="okey",
        how="inner",
        salt_buckets=8,
    )
    return (
        joined.groupBy("o_orderpriority")
        .agg(
            F.sum(
                _dec("l_extendedprice") * (one - _dec("l_discount", 3, 2))
            )
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .orderBy("o_orderpriority")
    )


_Q132_SQL = """
SELECT o_orderpriority,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                * (CAST(1 AS DECIMAL(3,2))
                   - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE)
         AS revenue,
       COUNT(*) AS n_lines
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""
