"""Data profiling and statistics: histograms, outliers, correlations, PCA, AUC/PR, MI, expectations, k-anonymity.

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

_PCA_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]




def q93_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """20-bin equi-width histogram of ``events.value`` over its observed
    range. Bin assignment and edge arithmetic are the identical double
    expressions in both engines ((x-lo)/width, floor, clamp), so the bins
    are bit-reproducible; the bounds pass is a scalar aggregate (Spark
    collects two doubles; the oracle computes the same two exactly)."""
    from pyveb_spark.operators.profile import column_histogram

    e = read_table(spark, sf_dir, "events")
    return column_histogram(e, "value", n_bins=20).orderBy("bin")


_Q93_SQL = """
WITH b AS (SELECT MIN(value) AS lo, MAX(value) AS hi,
                  (MAX(value) - MIN(value)) / 20 AS w
           FROM events),
binned AS (SELECT LEAST(GREATEST(CAST(FLOOR((e.value - b.lo) / b.w) AS INT), 0), 19) AS bin,
                  b.lo, b.w
           FROM events e, b
           WHERE e.value IS NOT NULL AND e.value >= b.lo AND e.value <= b.hi)
SELECT bin,
       MIN(lo) + bin * MIN(w) AS lo_edge,
       MIN(lo) + (bin + 1) * MIN(w) AS hi_edge,
       COUNT(*) AS n
FROM binned
GROUP BY bin
ORDER BY bin
"""


def q95_value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type z-score outlier screen (|z| > 3) over
    ``events.value`` — the pre-training anomaly drop. Moments are exact
    decimal sums (order-independent), z derived in one fixed double
    expression order, so the boundary decision is engine-portable; the
    fixture's closest |z| to 3 is ≥ 3e-4 away (probed at every SF), far
    above double noise."""
    from pyveb_spark.operators.profile import zscore_outliers

    e = read_table(spark, sf_dir, "events")
    return (
        zscore_outliers(
            e.select("event_id", "event_type", "value"),
            "value", ["event_type"], z_threshold=3.0,
        )
        .select("event_id", "event_type", F.round("z", 4).alias("z"))
        .orderBy("event_id")
    )


_Q95_SQL = """
WITH g AS (SELECT event_type, COUNT(value) AS n,
                  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS s,
                  CAST(SUM(CAST(value AS DECIMAL(12,2))
                           * CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sq
           FROM events GROUP BY event_type)
SELECT e.event_id, e.event_type,
       ROUND((e.value - s / n)
             / sqrt(GREATEST(sq / n - (s / n) * (s / n), 1e-300)), 4) AS z
FROM events e JOIN g USING (event_type)
WHERE abs((e.value - s / n)
          / sqrt(GREATEST(sq / n - (s / n) * (s / n), 1e-300))) > 3
ORDER BY e.event_id
"""


def q92_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column profile of ``orders`` — row/null/distinct counts and
    min/max — produced by ONE aggregation over ONE scan (all measures are
    parallel agg expressions with map-side partials; see
    ``operators.profile``). Exact distincts here for the oracle; the
    ``exact=False`` HLL path is the 100 TB default. Column set excludes
    the double column because engines disagree on double→string rendering
    (the operator itself profiles every type; unit-tested)."""
    from pyveb_spark.operators.profile import profile_table

    o = read_table(spark, sf_dir, "orders")
    return profile_table(
        o,
        columns=["o_orderkey", "o_custkey", "o_orderstatus",
                 "o_orderdate", "o_orderpriority"],
    ).orderBy("col_name")


_Q92_SQL = """
SELECT 'o_orderkey' AS col_name, 'bigint' AS data_type,
       COUNT(*) AS n_rows, COUNT(o_orderkey) AS n_nonnull,
       COUNT(*) - COUNT(o_orderkey) AS n_nulls,
       COUNT(DISTINCT o_orderkey) AS n_distinct,
       CAST(MIN(o_orderkey) AS VARCHAR) AS min_value,
       CAST(MAX(o_orderkey) AS VARCHAR) AS max_value
FROM orders
UNION ALL
SELECT 'o_custkey', 'bigint', COUNT(*), COUNT(o_custkey),
       COUNT(*) - COUNT(o_custkey), COUNT(DISTINCT o_custkey),
       CAST(MIN(o_custkey) AS VARCHAR), CAST(MAX(o_custkey) AS VARCHAR)
FROM orders
UNION ALL
SELECT 'o_orderstatus', 'string', COUNT(*), COUNT(o_orderstatus),
       COUNT(*) - COUNT(o_orderstatus), COUNT(DISTINCT o_orderstatus),
       MIN(o_orderstatus), MAX(o_orderstatus)
FROM orders
UNION ALL
SELECT 'o_orderdate', 'timestamp', COUNT(*), COUNT(o_orderdate),
       COUNT(*) - COUNT(o_orderdate), COUNT(DISTINCT o_orderdate),
       strftime(MIN(o_orderdate), '%Y-%m-%d %H:%M:%S'),
       strftime(MAX(o_orderdate), '%Y-%m-%d %H:%M:%S')
FROM orders
UNION ALL
SELECT 'o_orderpriority', 'string', COUNT(*), COUNT(o_orderpriority),
       COUNT(*) - COUNT(o_orderpriority), COUNT(DISTINCT o_orderpriority),
       MIN(o_orderpriority), MAX(o_orderpriority)
FROM orders
ORDER BY col_name
"""


def q100_iqr_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type Tukey-fence (IQR) outlier screen over
    ``events.value`` — the robust counterpart of q95's z-score (fences
    are order statistics, so they don't chase the outliers they screen).
    Quartiles are DISCRETE (actual values at ceil(n/4)/ceil(3n/4) rank),
    the engine-portable choice; fence arithmetic shares one double
    expression order with the oracle. Probed fence margin ≥ 0.18 at
    sf0.01 — far above double noise."""
    from pyveb_spark.operators.profile import iqr_outliers

    e = read_table(spark, sf_dir, "events")
    return (
        iqr_outliers(
            e.select("event_id", "event_type", "value"),
            "value",
            ["event_type"],
            k=1.5,
        )
        .select("event_id", "event_type", "value", "fence_lo", "fence_hi")
        .orderBy("event_id")
    )


_Q100_SQL = """
WITH ranked AS (
  SELECT event_type, value,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM events WHERE value IS NOT NULL),
quarts AS (
  SELECT event_type,
         MIN(CASE WHEN rn = CEIL(0.25 * n) THEN value END) AS q1,
         MIN(CASE WHEN rn = CEIL(0.75 * n) THEN value END) AS q3
  FROM ranked WHERE rn = CEIL(0.25 * n) OR rn = CEIL(0.75 * n)
  GROUP BY event_type)
SELECT e.event_id, e.event_type, e.value,
       q1 - 1.5 * (q3 - q1) AS fence_lo,
       q3 + 1.5 * (q3 - q1) AS fence_hi
FROM events e JOIN quarts USING (event_type)
WHERE e.value IS NOT NULL
  AND (e.value < q1 - 1.5 * (q3 - q1) OR e.value > q3 + 1.5 * (q3 - q1))
ORDER BY e.event_id
"""


def q104_join_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew diagnostic for the lineitem→supplier join key: per-key count
    distribution of ``l_suppkey`` (cardinality, max, discrete p50/p90/p99,
    Gini) — the pre-flight numbers that decide between a plain shuffle
    join, salting, or a bucket cap. Exact integer sums end-to-end; gini
    is one fixed-order double expression."""
    from pyveb_spark.operators.profile import key_skew_profile

    l = read_table(spark, sf_dir, "lineitem")
    return key_skew_profile(l.select("l_suppkey"), ["l_suppkey"])


_Q104_SQL = """
WITH counts AS (SELECT l_suppkey, COUNT(*) AS c FROM lineitem GROUP BY l_suppkey),
ranked AS (SELECT c,
                  ROW_NUMBER() OVER (ORDER BY c, l_suppkey) AS i,
                  COUNT(*) OVER () AS n
           FROM counts),
agg AS (SELECT COUNT(*) AS n_keys,
               SUM(c)::BIGINT AS n_rows,
               MAX(c) AS max_n,
               MIN(CASE WHEN i = CEIL(0.5 * n) THEN c END) AS p50_n,
               MIN(CASE WHEN i = CEIL(0.9 * n) THEN c END) AS p90_n,
               MIN(CASE WHEN i = CEIL(0.99 * n) THEN c END) AS p99_n,
               SUM(i * c)::BIGINT AS ic
        FROM ranked)
SELECT n_keys, n_rows, max_n, p50_n, p90_n, p99_n,
       (2.0 * ic) / (n_keys * n_rows) - (n_keys + 1.0) / n_keys AS gini
FROM agg
"""


def q105_price_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-frequency decile binning of ``l_extendedprice`` (total order
    with (orderkey, linenumber) tiebreak) rolled up to per-decile stats —
    the feature-discretization primitive. ``ntile`` splits identically on
    both engines given a total order (even split, remainder to leading
    buckets), so bucket membership is engine-portable."""
    from pyveb_spark.operators.profile import quantile_bins

    l = read_table(spark, sf_dir, "lineitem")
    binned = quantile_bins(
        l.select("l_orderkey", "l_linenumber", "l_extendedprice"),
        "l_extendedprice",
        n_bins=10,
        tiebreak_cols=["l_orderkey", "l_linenumber"],
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("l_extendedprice").alias("lo"),
            F.max("l_extendedprice").alias("hi"),
            F.sum(_dec("l_extendedprice", 18, 2)).cast("double").alias("total"),
        )
        .orderBy("bin")
    )


_Q105_SQL = """
WITH binned AS (
  SELECT l_extendedprice,
         NTILE(10) OVER (ORDER BY l_extendedprice, l_orderkey, l_linenumber)
           AS bin
  FROM lineitem)
SELECT bin, COUNT(*) AS n,
       MIN(l_extendedprice) AS lo, MAX(l_extendedprice) AS hi,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total
FROM binned GROUP BY bin ORDER BY bin
"""


def q106_measure_correlations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation matrix of the four lineitem measures in ONE
    aggregation pass (exact decimal moments — order-independent — then a
    single fixed-order double formula per pair; see
    ``profile.pairwise_correlations``). The profiling companion to q92:
    which measures move together decides feature pruning and stratifier
    choice."""
    from pyveb_spark.operators.profile import pairwise_correlations

    l = read_table(spark, sf_dir, "lineitem")
    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    return (
        pairwise_correlations(l, cols)
        .select("col_a", "col_b", F.round("corr", 6).alias("corr"))
        .orderBy("col_a", "col_b")
    )


_Q106_SQL = """
WITH m AS (
  SELECT COUNT(*) AS n,
         {sums}
  FROM lineitem)
SELECT col_a, col_b,
       ROUND((n * p - sa * sb)
             / (sqrt(n * qa - sa * sa) * sqrt(n * qb - sb * sb)), 6) AS corr
FROM (
  {pairs}
)
ORDER BY col_a, col_b
"""


def _q106_sql() -> str:
    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    sums = ",\n         ".join(
        f"CAST(SUM(CAST({c} AS DECIMAL(18,2))) AS DOUBLE) AS s_{c},\n"
        f"         CAST(SUM(CAST({c} AS DECIMAL(18,2))"
        f" * CAST({c} AS DECIMAL(18,2))) AS DOUBLE) AS q_{c}"
        for c in cols
    )
    xsums = ",\n         ".join(
        f"CAST(SUM(CAST({a} AS DECIMAL(18,2))"
        f" * CAST({b} AS DECIMAL(18,2))) AS DOUBLE) AS p_{a}_{b}"
        for i, a in enumerate(cols)
        for b in cols[i + 1:]
    )
    pairs = "\n  UNION ALL\n  ".join(
        f"SELECT '{a}' AS col_a, '{b}' AS col_b, n,"
        f" s_{a} AS sa, s_{b} AS sb, q_{a} AS qa, q_{b} AS qb,"
        f" p_{a}_{b} AS p FROM m"
        for i, a in enumerate(cols)
        for b in cols[i + 1:]
    )
    return _Q106_SQL.format(sums=sums + ",\n         " + xsums, pairs=pairs)


def q111_quality_score_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source ROC-AUC of document length (``n_chars``) as a predictor
    of ``lang = 'en'`` — the evaluate-before-you-threshold step every
    admission-pipeline classifier needs (``operators/profile.py::
    binary_auc``). Histogram Mann-Whitney: integer tie-corrected numerator,
    one final double division, so the value is bit-identical across
    engines."""
    from pyveb_spark.operators.profile import binary_auc

    d = read_table(spark, sf_dir, "documents")
    return binary_auc(
        d, "n_chars", F.col("lang") == F.lit("en"), ["source"]
    ).orderBy("source")


_Q111_SQL = """
WITH h AS (SELECT source, n_chars AS s,
                  COUNT(CASE WHEN lang = 'en' THEN 1 END) AS pos,
                  COUNT(CASE WHEN lang <> 'en' THEN 1 END) AS neg
           FROM documents GROUP BY 1, 2),
c AS (SELECT source, pos, neg,
             pos * COALESCE(SUM(neg) OVER (
                 PARTITION BY source ORDER BY s
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS below,
             pos * neg AS tie
      FROM h),
a AS (SELECT source,
             CAST(SUM(pos) AS BIGINT) AS n_pos,
             CAST(SUM(neg) AS BIGINT) AS n_neg,
             CAST(SUM(below) AS BIGINT) AS b,
             CAST(SUM(tie) AS BIGINT) AS t
      FROM c GROUP BY 1)
SELECT source, n_pos, n_neg,
       CASE WHEN n_pos > 0 AND n_neg > 0
            THEN (CAST(b AS DOUBLE) + CAST(t AS DOUBLE) / 2)
                   / CAST(n_pos * n_neg AS DOUBLE)
       END AS auc
FROM a ORDER BY source
"""


def q122_fk_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit over the star schema
    (``operators/profile.py::fk_orphan_stats``): one anti-join per FK
    relationship, checks-sized output. Four healthy edges (orphans = 0
    IS the assertion) plus a deliberately restricted nation parent
    (n_regionkey < 2) that must surface real orphans — proving the
    detector detects."""
    from pyveb_spark.operators.profile import fk_orphan_stats

    l = read_table(spark, sf_dir, "lineitem")
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    p = read_table(spark, sf_dir, "part")
    s = read_table(spark, sf_dir, "supplier")
    n = read_table(spark, sf_dir, "nation")
    checks = [
        ("lineitem_orders", l, ["l_orderkey"], o, ["o_orderkey"]),
        ("orders_customer", o, ["o_custkey"], c, ["c_custkey"]),
        ("lineitem_part", l, ["l_partkey"], p, ["p_partkey"]),
        ("lineitem_supplier", l, ["l_suppkey"], s, ["s_suppkey"]),
        (
            "customer_nation_restricted",
            c,
            ["c_nationkey"],
            n.where(F.col("n_regionkey") < 2),
            ["n_nationkey"],
        ),
    ]
    return fk_orphan_stats(checks).orderBy("check_name")


_Q122_SQL = """
WITH k AS (
  SELECT 'lineitem_orders' AS check_name,
         (SELECT COUNT(*) FROM lineitem) AS n_child,
         (SELECT COUNT(*) FROM lineitem WHERE l_orderkey IS NULL)
           AS n_null_fk,
         (SELECT COUNT(*) FROM lineitem
          WHERE l_orderkey IS NOT NULL
            AND l_orderkey NOT IN (SELECT o_orderkey FROM orders
                                   WHERE o_orderkey IS NOT NULL))
           AS n_orphans
  UNION ALL
  SELECT 'orders_customer',
         (SELECT COUNT(*) FROM orders),
         (SELECT COUNT(*) FROM orders WHERE o_custkey IS NULL),
         (SELECT COUNT(*) FROM orders
          WHERE o_custkey IS NOT NULL
            AND o_custkey NOT IN (SELECT c_custkey FROM customer
                                  WHERE c_custkey IS NOT NULL))
  UNION ALL
  SELECT 'lineitem_part',
         (SELECT COUNT(*) FROM lineitem),
         (SELECT COUNT(*) FROM lineitem WHERE l_partkey IS NULL),
         (SELECT COUNT(*) FROM lineitem
          WHERE l_partkey IS NOT NULL
            AND l_partkey NOT IN (SELECT p_partkey FROM part
                                  WHERE p_partkey IS NOT NULL))
  UNION ALL
  SELECT 'lineitem_supplier',
         (SELECT COUNT(*) FROM lineitem),
         (SELECT COUNT(*) FROM lineitem WHERE l_suppkey IS NULL),
         (SELECT COUNT(*) FROM lineitem
          WHERE l_suppkey IS NOT NULL
            AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                                  WHERE s_suppkey IS NOT NULL))
  UNION ALL
  SELECT 'customer_nation_restricted',
         (SELECT COUNT(*) FROM customer),
         (SELECT COUNT(*) FROM customer WHERE c_nationkey IS NULL),
         (SELECT COUNT(*) FROM customer
          WHERE c_nationkey IS NOT NULL
            AND c_nationkey NOT IN (SELECT n_nationkey FROM nation
                                    WHERE n_regionkey < 2
                                      AND n_nationkey IS NOT NULL)))
SELECT check_name, n_child, n_null_fk,
       n_child - n_null_fk AS n_checked,
       n_orphans,
       CAST(n_orphans AS DOUBLE)
         / GREATEST(CAST(n_child - n_null_fk AS DOUBLE), 1.0) AS orphan_rate
FROM k
ORDER BY check_name
"""


def q124_length_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram of document length as an English-language
    predictor (``operators/profile.py::calibration_curve``): decile
    score bins (ntile over the (n_chars, doc_id) total order), each
    bin's size, mean score, and observed positive rate. AUC (q111) said
    whether the score ranks; this says whether its values calibrate."""
    from pyveb_spark.operators.profile import calibration_curve

    d = read_table(spark, sf_dir, "documents")
    return calibration_curve(
        d, "n_chars", F.col("lang") == F.lit("en"),
        n_bins=10, tiebreak_cols=["doc_id"],
    ).orderBy("bin")


_Q124_SQL = """
WITH binned AS (
  SELECT n_chars, lang,
         NTILE(10) OVER (ORDER BY n_chars, doc_id) AS bin
  FROM documents WHERE n_chars IS NOT NULL)
SELECT bin, COUNT(*) AS n,
       CAST(SUM(CAST(n_chars AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
         AS mean_score,
       CAST(COUNT(CASE WHEN lang = 'en' THEN 1 END) AS BIGINT) AS n_pos,
       CAST(COUNT(CASE WHEN lang = 'en' THEN 1 END) AS DOUBLE) / COUNT(*)
         AS pos_rate
FROM binned GROUP BY bin ORDER BY bin
"""


def q127_type_weekday_mi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information between event type and weekday
    (``operators/profile.py::mutual_information``): exact joint/marginal
    counts, fixed-order per-cell contributions, and the ONE
    order-sensitive reduction (the cross-cell sum) as an ordered fold
    over the (x,y)-sorted cell array — the q103/q118 portability
    pattern. Weekday is the locale-stable 'EEE' label so both engines
    bucket identically."""
    from pyveb_spark.operators.profile import mutual_information

    e = read_table(spark, sf_dir, "events").select(
        "event_type", F.date_format("ts", "EEE").alias("dow")
    )
    mi = mutual_information(e, "event_type", "dow")
    return mi.select(
        "n", "n_x", "n_y", "n_cells", F.round("mi", 6).alias("mi")
    )


_Q127_SQL = """
WITH joint AS (
  SELECT event_type AS x, strftime(ts, '%a') AS y, COUNT(*) AS c
  FROM events GROUP BY 1, 2),
mx AS (SELECT x, SUM(c) AS cx FROM joint GROUP BY x),
my AS (SELECT y, SUM(c) AS cy FROM joint GROUP BY y),
n AS (SELECT SUM(c) AS n FROM joint),
cells AS (
  SELECT j.x, j.y,
         (CAST(j.c AS DOUBLE) / n.n)
           * ln(CAST(j.c AS DOUBLE) * CAST(n.n AS DOUBLE)
                / (CAST(mx.cx AS DOUBLE) * CAST(my.cy AS DOUBLE))) AS mi
  FROM joint j JOIN mx USING (x) JOIN my USING (y) CROSS JOIN n)
SELECT (SELECT CAST(n AS BIGINT) FROM n) AS n,
       (SELECT COUNT(*) FROM mx) AS n_x,
       (SELECT COUNT(*) FROM my) AS n_y,
       COUNT(*) AS n_cells,
       ROUND(list_reduce(
           list_prepend(CAST(0 AS DOUBLE),
                        list(mi ORDER BY x, y)),
           (acc, v) -> acc + v), 6) AS mi
FROM cells
"""


def q130_measure_pca(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First principal component of the four standardized lineitem
    measures (``operators/profile.py::correlation_pca``): ONE
    exact-decimal moment pass over the data, then power iteration on the
    4×4 correlation matrix as a fixed left-associated expression chain —
    no collect, no second scan, bit-reproducible (only +,*,/,√ — all
    correctly-rounded IEEE ops), oracle replays it CTE-for-CTE."""
    from pyveb_spark.operators.profile import correlation_pca

    l = read_table(spark, sf_dir, "lineitem")
    return correlation_pca(l, _PCA_COLS, iters=3)


def _q130_sql() -> str:
    cols = _PCA_COLS
    k = len(cols)
    dec = lambda c: f"CAST({c} AS DECIMAL(18,2))"  # noqa: E731
    moments = [
        "COUNT(*) AS n",
        *[f"CAST(SUM({dec(c)}) AS DOUBLE) AS s_{c}" for c in cols],
        *[f"CAST(SUM({dec(c)} * {dec(c)}) AS DOUBLE) AS q_{c}" for c in cols],
    ]
    for i, a in enumerate(cols):
        for b in cols[i + 1:]:
            moments.append(
                f"CAST(SUM({dec(a)} * {dec(b)}) AS DOUBLE) AS p_{a}_{b}"
            )

    def corr(i: int, j: int) -> str:
        if i == j:
            return "1.0"
        a, b = (cols[i], cols[j]) if i < j else (cols[j], cols[i])
        num = f"(CAST(n AS DOUBLE) * p_{a}_{b} - s_{a} * s_{b})"
        va = f"(CAST(n AS DOUBLE) * q_{a} - s_{a} * s_{a})"
        vb = f"(CAST(n AS DOUBLE) * q_{b} - s_{b} * s_{b})"
        return f"({num} / (sqrt({va}) * sqrt({vb})))"

    m_alias = ", ".join(
        f"{corr(i, j)} AS m_{i}_{j}" for i in range(k) for j in range(k)
    )
    v0 = repr(1.0 / k**0.5)
    v_init = ", ".join(f"{v0} AS v_{i}" for i in range(k))
    m_pass = ", ".join(f"m_{i}_{j}" for i in range(k) for j in range(k))

    def matvec() -> str:
        return ", ".join(
            " + ".join(f"m_{i}_{j} * v_{j}" for j in range(k)) + f" AS w_{i}"
            for i in range(k)
        )

    norm2 = " + ".join(f"w_{i} * w_{i}" for i in range(k))
    w_pass = ", ".join(f"w_{i}" for i in range(k))
    v_norm = ", ".join(f"w_{i} / nrm AS v_{i}" for i in range(k))

    ctes = [f"m0 AS (SELECT {', '.join(moments)} FROM lineitem)",
            f"mat AS (SELECT n, {m_alias}, {v_init} FROM m0)"]
    prev = "mat"
    for t in range(3):
        ctes.append(
            f"i{t}w AS (SELECT n, {m_pass}, {matvec()} FROM {prev})"
        )
        ctes.append(
            f"i{t}n AS (SELECT n, {m_pass}, sqrt({norm2}) AS nrm, {w_pass} "
            f"FROM i{t}w)"
        )
        ctes.append(
            f"i{t} AS (SELECT n, {m_pass}, {v_norm} FROM i{t}n)"
        )
        prev = f"i{t}"
    v_pass = ", ".join(f"v_{i}" for i in range(k))
    ctes.append(f"fin AS (SELECT n, {v_pass}, {matvec()} FROM {prev})")
    lam = " + ".join(f"v_{i} * w_{i}" for i in range(k))
    sign = "CASE WHEN v_0 < 0 THEN -1.0 ELSE 1.0 END"
    loadings = ", ".join(
        f"{sign} * v_{i} AS loading_{c}" for i, c in enumerate(cols)
    )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT n, {lam} AS eigenvalue, {loadings} FROM fin"
    )


def q134_length_pr_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full precision/recall curve of document length as an English
    predictor (``operators/profile.py::pr_curve``): one row per distinct
    length threshold, cumulative window DOWN the histogram — exact
    integer counts, single divisions, fixed-order f1. With AUC (q111)
    and calibration (q124) this completes the classifier-eval family."""
    from pyveb_spark.operators.profile import pr_curve

    d = read_table(spark, sf_dir, "documents")
    return pr_curve(d, "n_chars", F.col("lang") == F.lit("en")).orderBy(
        F.col("threshold").desc()
    )


_Q134_SQL = """
WITH hist AS (
  SELECT n_chars AS threshold,
         CAST(COUNT(CASE WHEN lang = 'en' THEN 1 END) AS BIGINT) AS pos,
         COUNT(*) AS n
  FROM documents GROUP BY n_chars),
cum AS (
  SELECT threshold,
         CAST(SUM(n) OVER (ORDER BY threshold DESC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS n_pred,
         CAST(SUM(pos) OVER (ORDER BY threshold DESC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS tp,
         CAST(SUM(pos) OVER () AS BIGINT) AS p
  FROM hist)
SELECT threshold, n_pred, tp,
       CAST(tp AS DOUBLE) / CAST(n_pred AS DOUBLE) AS precision,
       CAST(tp AS DOUBLE) / CAST(p AS DOUBLE) AS recall,
       2.0 * ((CAST(tp AS DOUBLE) / CAST(n_pred AS DOUBLE))
              * (CAST(tp AS DOUBLE) / CAST(p AS DOUBLE)))
           / ((CAST(tp AS DOUBLE) / CAST(n_pred AS DOUBLE))
              + (CAST(tp AS DOUBLE) / CAST(p AS DOUBLE)) + 1e-300) AS f1
FROM cum
ORDER BY threshold DESC
"""


def q136_system_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level reconciliation between 'two systems'
    (``operators/profile.py::reconcile_tables``): the orders table vs a
    perturbed replica — rows before mid-1995 missing, 'P'-status prices
    shifted by +1 — must report exactly which column diverges on how
    many rows and the left/right-only counts. ONE full-outer join + one
    aggregation; column-count output. The sign-off report for every
    migration/dual-write."""
    from pyveb_spark.operators.profile import reconcile_tables

    o = read_table(spark, sf_dir, "orders")
    left = o.select("o_orderkey", "o_totalprice", "o_orderpriority")
    right = o.where(
        F.col("o_orderdate") >= F.lit("1995-06-01").cast("timestamp")
    ).select(
        "o_orderkey",
        F.when(
            F.col("o_orderstatus") == "P", F.col("o_totalprice") + 1.0
        )
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
        "o_orderpriority",
    )
    return reconcile_tables(
        left, right, ["o_orderkey"]
    ).orderBy("col_name")


_Q136_SQL = """
WITH l AS (SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders),
r AS (SELECT o_orderkey,
             CASE WHEN o_orderstatus = 'P' THEN o_totalprice + 1.0
                  ELSE o_totalprice END AS o_totalprice,
             o_orderpriority
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1995-06-01'),
j AS (SELECT l.o_orderkey AS lk, r.o_orderkey AS rk,
             l.o_totalprice AS lp, r.o_totalprice AS rp,
             l.o_orderpriority AS lo, r.o_orderpriority AS ro
      FROM l FULL OUTER JOIN r ON l.o_orderkey = r.o_orderkey),
a AS (SELECT
        COUNT(lk) AS nl, COUNT(rk) AS nr,
        COUNT(CASE WHEN lk IS NOT NULL AND rk IS NOT NULL THEN 1 END) AS nb,
        COUNT(CASE WHEN lk IS NOT NULL AND rk IS NOT NULL
                    AND lp IS NOT DISTINCT FROM rp THEN 1 END) AS eq_p,
        COUNT(CASE WHEN lk IS NOT NULL AND rk IS NOT NULL
                    AND lo IS NOT DISTINCT FROM ro THEN 1 END) AS eq_o
      FROM j)
SELECT 'o_orderpriority' AS col_name, nl AS n_left, nr AS n_right,
       nb AS n_both, nl - nb AS n_only_left, nr - nb AS n_only_right,
       eq_o AS n_equal, nb - eq_o AS n_diff,
       CAST(eq_o AS DOUBLE) / GREATEST(CAST(nb AS DOUBLE), 1.0)
         AS match_rate
FROM a
UNION ALL
SELECT 'o_totalprice', nl, nr, nb, nl - nb, nr - nb,
       eq_p, nb - eq_p,
       CAST(eq_p AS DOUBLE) / GREATEST(CAST(nb AS DOUBLE), 1.0)
FROM a
ORDER BY col_name
"""


def q137_ab_conversion_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B conversion readout (``operators/profile.py::
    ab_proportion_test``): users split 50/50 by the content-keyed hash
    (``hash_split`` — the experiment-assignment primitive, q128), a user
    converts if they made ≥ 14 purchases (the fixture's median
    engagement — "any purchase" is degenerate here: everyone buys,
    pooled p = 1, se = 0), and the two-proportion
    pooled z-test says whether the variants differ. Unit of analysis is
    the USER (assignment and outcome both per user — the correct A/B
    grain); exact counts, fixed-order z. Null-true by construction
    (the hash is independent of behavior), so |z| small — the value is
    the engine-exact pipeline, certified by the oracle replaying the
    same thresholds."""
    from pyveb_spark.operators.profile import ab_proportion_test
    from pyveb_spark.operators.sampling import hash_split

    e = read_table(spark, sf_dir, "events")
    users = e.groupBy("user_id").agg(
        (
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            )
            >= 14
        )
        .cast("int")
        .alias("converted")
    )
    assigned = hash_split(
        users, {"a": 0.5, "b": 0.5}, ["user_id"], seed="exp1",
        out_col="variant",
    )
    return ab_proportion_test(
        assigned, "variant", F.col("converted") == 1
    ).select(
        "n_a", "x_a", "n_b", "x_b",
        F.round("rate_a", 6).alias("rate_a"),
        F.round("rate_b", 6).alias("rate_b"),
        F.round("diff", 6).alias("diff"),
        F.round("z", 6).alias("z"),
    )


def _q137_sql() -> str:
    from pyveb_spark.operators.sampling import threshold_hex

    t_a = threshold_hex(0.5)
    return f"""
WITH users AS (
  SELECT user_id,
         CASE WHEN SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   >= 14 THEN 1 ELSE 0 END AS converted
  FROM events GROUP BY user_id),
assigned AS (
  SELECT converted,
         CASE WHEN substr(md5('exp1|' || user_id), 1, 12) < '{t_a}'
              THEN 'a' ELSE 'b' END AS variant
  FROM users),
a AS (SELECT
        CAST(SUM(CASE WHEN variant = 'a' THEN 1 ELSE 0 END) AS BIGINT)
          AS n_a,
        CAST(SUM(CASE WHEN variant = 'a' THEN converted ELSE 0 END)
             AS BIGINT) AS x_a,
        CAST(SUM(CASE WHEN variant = 'b' THEN 1 ELSE 0 END) AS BIGINT)
          AS n_b,
        CAST(SUM(CASE WHEN variant = 'b' THEN converted ELSE 0 END)
             AS BIGINT) AS x_b
      FROM assigned)
SELECT n_a, x_a, n_b, x_b,
       CASE WHEN n_a > 0
            THEN ROUND(CAST(x_a AS DOUBLE) / CAST(n_a AS DOUBLE), 6)
       END AS rate_a,
       CASE WHEN n_b > 0
            THEN ROUND(CAST(x_b AS DOUBLE) / CAST(n_b AS DOUBLE), 6)
       END AS rate_b,
       CASE WHEN n_a > 0 AND n_b > 0
            THEN ROUND(CAST(x_b AS DOUBLE) / CAST(n_b AS DOUBLE)
                       - CAST(x_a AS DOUBLE) / CAST(n_a AS DOUBLE), 6)
       END AS diff,
       CASE WHEN n_a > 0 AND n_b > 0
                 AND x_a + x_b > 0 AND x_a + x_b < n_a + n_b
            THEN ROUND((CAST(x_b AS DOUBLE) / CAST(n_b AS DOUBLE)
              - CAST(x_a AS DOUBLE) / CAST(n_a AS DOUBLE))
             / sqrt((CAST(x_a AS DOUBLE) + CAST(x_b AS DOUBLE))
                    / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))
                    * (1.0 - (CAST(x_a AS DOUBLE) + CAST(x_b AS DOUBLE))
                             / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)))
                    * (1.0 / CAST(n_a AS DOUBLE)
                       + 1.0 / CAST(n_b AS DOUBLE))), 6)
       END AS z
FROM a
"""


def q142_winsorized_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentile winsorization (``profile.py::winsorize``): clip
    o_totalprice per order priority at the [5, 95] NEAREST-RANK
    quantiles — bounds picked by pure integer rank arithmetic
    (``(n·p+99) div 100``), so they are exact data values and the whole
    operator replays bit-for-bit in any engine (no interpolation-formula
    float drift). Output: per-priority clip counts, the bounds, and the
    exact-decimal means before/after — the heavy-tail treatment applied
    ahead of averages or features."""
    from pyveb_spark.operators.profile import winsorize

    o = read_table(spark, sf_dir, "orders")
    w = winsorize(
        o, "o_totalprice", ["o_orderpriority"], lo_pct=5, hi_pct=95
    )
    v = F.col("o_totalprice")
    n = F.count(F.lit(1))
    return (
        w.groupBy("o_orderpriority")
        .agg(
            n.alias("n_orders"),
            F.sum(F.when(v < F.col("__lo"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_clipped_lo"),
            F.sum(F.when(v > F.col("__hi"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_clipped_hi"),
            F.min("__lo").alias("lo_bound"),
            F.min("__hi").alias("hi_bound"),
            (
                F.sum(_dec("o_totalprice", 14)).cast("double") / n
            ).alias("mean_before"),
            (
                F.sum(
                    F.col("o_totalprice_winsorized").cast(
                        "decimal(14,2)"
                    )
                ).cast("double")
                / n
            ).alias("mean_after"),
        )
        .orderBy("o_orderpriority")
    )


_Q142_SQL = """
WITH ranked AS (
  SELECT o_orderpriority, o_totalprice AS v,
         ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice) AS rn,
         COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
  FROM orders WHERE o_totalprice IS NOT NULL),
bounds AS (
  SELECT o_orderpriority, MIN(v) AS lo, MAX(v) AS hi
  FROM ranked
  WHERE rn = (n * 5 + 99) // 100 OR rn = (n * 95 + 99) // 100
  GROUP BY 1),
clipped AS (
  SELECT o.o_orderpriority, o.o_totalprice AS v, b.lo, b.hi,
         CASE WHEN o.o_totalprice < b.lo THEN b.lo
              WHEN o.o_totalprice > b.hi THEN b.hi
              ELSE o.o_totalprice END AS w
  FROM orders o JOIN bounds b USING (o_orderpriority))
SELECT o_orderpriority,
       COUNT(*)::BIGINT AS n_orders,
       SUM(CASE WHEN v < lo THEN 1 ELSE 0 END)::BIGINT AS n_clipped_lo,
       SUM(CASE WHEN v > hi THEN 1 ELSE 0 END)::BIGINT AS n_clipped_hi,
       MIN(lo) AS lo_bound,
       MIN(hi) AS hi_bound,
       CAST(SUM(CAST(v AS DECIMAL(14,2))) AS DOUBLE) / COUNT(*)
         AS mean_before,
       CAST(SUM(CAST(w AS DECIMAL(14,2))) AS DOUBLE) / COUNT(*)
         AS mean_after
FROM clipped
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def q143_order_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality expectation suite
    (``profile.py::validate_expectations``, the Great Expectations /
    dbt-test shape in-engine): five rules — key not-null, key
    uniqueness, status domain, a price range sized to FAIL (the suite
    must prove it can catch violations, not just bless clean data), and
    table-size bounds — all evaluated in ONE aggregation pass over ONE
    scan, then unpivoted to a (rule, column, n_violations, passed)
    report."""
    from pyveb_spark.operators.profile import validate_expectations

    o = read_table(spark, sf_dir, "orders")
    out = validate_expectations(
        o,
        [
            ("not_null", "o_orderkey"),
            ("unique", "o_orderkey"),
            ("accepted_values", "o_orderstatus", ["F", "O", "P"]),
            ("between", "o_totalprice", 0.0, 300000.0),
            ("row_count_between", 1000, 1_000_000_000),
        ],
    )
    return out.orderBy("rule", "column")


_Q143_SQL = """
WITH a AS (
  SELECT
    SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS e_notnull,
    COUNT(o_orderkey) - COUNT(DISTINCT o_orderkey) AS e_unique,
    SUM(CASE WHEN o_orderstatus IS NOT NULL
              AND o_orderstatus NOT IN ('F', 'O', 'P')
             THEN 1 ELSE 0 END) AS e_domain,
    SUM(CASE WHEN o_totalprice IS NOT NULL
              AND (o_totalprice < 0.0 OR o_totalprice > 300000.0)
             THEN 1 ELSE 0 END) AS e_range,
    CASE WHEN COUNT(*) BETWEEN 1000 AND 1000000000
         THEN 0 ELSE 1 END AS e_rows
  FROM orders)
SELECT rule, "column", n_violations, n_violations = 0 AS passed FROM (
  SELECT 'not_null' AS rule, 'o_orderkey' AS "column",
         e_notnull::BIGINT AS n_violations FROM a
  UNION ALL
  SELECT 'unique', 'o_orderkey', e_unique::BIGINT FROM a
  UNION ALL
  SELECT 'accepted_values', 'o_orderstatus', e_domain::BIGINT FROM a
  UNION ALL
  SELECT 'between', 'o_totalprice', e_range::BIGINT FROM a
  UNION ALL
  SELECT 'row_count_between', '*', e_rows::BIGINT FROM a)
ORDER BY rule, "column"
"""


def q152_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity release gate (``profile.py::k_anonymity``, Sweeney
    2002): equivalence classes over the quasi-identifiers (nation,
    market segment, account-balance bucket) with the k=5 re-identifiability
    audit — class counts, at-risk classes/rows, and the risk fraction a
    privacy review signs off on. One groupBy on the quasi-key; the
    summary is class-count sized. The other half of the privacy story
    beside q82's PII redaction."""
    from pyveb_spark.operators.profile import k_anonymity

    c = read_table(spark, sf_dir, "customer").select(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 1000)
        .cast("int")
        .alias("bal_bucket"),
    )
    cls = k_anonymity(
        c, ["c_nationkey", "c_mktsegment", "bal_bucket"], k=5
    )
    at_risk_rows = F.sum(
        F.when(F.col("at_risk"), F.col("class_size")).otherwise(0)
    )
    return cls.agg(
        F.count(F.lit(1)).alias("n_classes"),
        F.sum(F.col("at_risk").cast("int"))
        .cast("bigint")
        .alias("n_at_risk_classes"),
        F.sum("class_size").cast("bigint").alias("n_rows"),
        at_risk_rows.cast("bigint").alias("n_at_risk_rows"),
        F.min("class_size").alias("min_class_size"),
        F.max("class_size").alias("max_class_size"),
        F.round(
            at_risk_rows.cast("double")
            / F.sum("class_size").cast("double"),
            6,
        ).alias("risk_frac"),
    )


_Q152_SQL = """
WITH cls AS (
  SELECT c_nationkey, c_mktsegment,
         CAST(FLOOR(c_acctbal / 1000) AS INT) AS bal_bucket,
         COUNT(*)::BIGINT AS n
  FROM customer GROUP BY 1, 2, 3)
SELECT COUNT(*)::BIGINT AS n_classes,
       SUM(CASE WHEN n < 5 THEN 1 ELSE 0 END)::BIGINT
         AS n_at_risk_classes,
       SUM(n)::BIGINT AS n_rows,
       SUM(CASE WHEN n < 5 THEN n ELSE 0 END)::BIGINT AS n_at_risk_rows,
       MIN(n)::BIGINT AS min_class_size,
       MAX(n)::BIGINT AS max_class_size,
       ROUND(CAST(SUM(CASE WHEN n < 5 THEN n ELSE 0 END) AS DOUBLE)
             / CAST(SUM(n) AS DOUBLE), 6) AS risk_frac
FROM cls
"""


def q157_dp_release(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially-private count release
    (``profile.py::dp_noisy_counts``, Dwork 2006 Laplace mechanism) over
    order priorities at ε=0.5: exact count per group plus a
    deterministic seeded Laplace draw — a pure function of the group key
    via the portable md5 construction, so the release is retry-safe,
    budget-accountable, and the oracle replays the identical inverse-CDF
    arithmetic bit-for-bit. Complements q152 k-anonymity as the
    privacy-release half of the privacy family."""
    from pyveb_spark.operators.profile import dp_noisy_counts

    o = read_table(spark, sf_dir, "orders")
    return dp_noisy_counts(
        o, ["o_orderpriority"], epsilon=0.5, seed="r5"
    ).orderBy("o_orderpriority")


_Q157_SQL = """
WITH counts AS (
  SELECT o_orderpriority, COUNT(*) AS exact_count
  FROM orders GROUP BY 1
),
noise AS (
  SELECT o_orderpriority, exact_count,
         ('0x' || substr(md5('r5' || '|' || o_orderpriority), 1, 12))::BIGINT
           / POWER(16, 12) - 0.5 AS t
  FROM counts
)
SELECT o_orderpriority, exact_count,
       ROUND(exact_count
             + (-1.0 / 0.5) * sign(t) * ln(1.0 - 2.0 * abs(t)), 4)
         AS noisy_count
FROM noise
ORDER BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# Embedding-space drift monitor (round-8 head)
# ---------------------------------------------------------------------------

def q192_embedding_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-to-snapshot embedding drift
    (``operators/profile.py::embedding_drift``): hash-split the corpus
    into a reference and a current snapshot (md5-keyed 50/50, so the
    oracle replays membership), then per label report population shares
    and the cosine between the snapshot centroids. On an honest split of
    one corpus every centroid_cos sits near 1.0 — the monitor's null
    case, which is exactly what makes it certifiable; a swapped encoder
    or domain shift drives it down, and share deltas expose mix drift.

    Scale: one posexplode pass, per-(label,dim) conditional means
    (map-side combinable), per-label fold — linear in corpus x dim with
    no pairwise stage and no driver collect."""
    from pyveb_spark.operators.profile import embedding_drift
    from pyveb_spark.operators.sampling import sample_predicate

    e = read_table(spark, sf_dir, "embeddings").withColumn(
        "snap",
        F.when(
            sample_predicate(0.5, ["vec_id"], seed="drift"), F.lit("ref")
        ).otherwise(F.lit("cur")),
    )
    return embedding_drift(e, "snap").orderBy("label")


_Q192_SQL = """
WITH e AS (
  SELECT label, embedding::DOUBLE[] AS v,
         CASE WHEN substr(md5('drift|' || vec_id), 1, 12) < '800000000000'
              THEN 'ref' ELSE 'cur' END AS snap
  FROM embeddings),
ex AS (
  SELECT label, snap, i - 1 AS pos, v[i] AS val
  FROM e, LATERAL (SELECT unnest(generate_series(1, len(v))) AS i) s),
dims AS (
  SELECT label, pos,
         AVG(CASE WHEN snap = 'ref' THEN val END) AS mr,
         AVG(CASE WHEN snap = 'cur' THEN val END) AS mc
  FROM ex GROUP BY 1, 2),
cent AS (
  SELECT label,
         ROUND(SUM(mr * mc) / (sqrt(SUM(mr * mr)) * sqrt(SUM(mc * mc))), 4)
           AS centroid_cos
  FROM dims GROUP BY label),
counts AS (
  SELECT label,
         SUM(CASE WHEN snap = 'ref' THEN 1 ELSE 0 END)::BIGINT AS n_ref,
         SUM(CASE WHEN snap = 'cur' THEN 1 ELSE 0 END)::BIGINT AS n_cur
  FROM e GROUP BY label),
shares AS (
  SELECT label, n_ref, n_cur,
         ROUND(CAST(n_ref AS DOUBLE)
               / CAST(SUM(n_ref) OVER () AS DOUBLE), 6) AS share_ref,
         ROUND(CAST(n_cur AS DOUBLE)
               / CAST(SUM(n_cur) OVER () AS DOUBLE), 6) AS share_cur
  FROM counts)
SELECT s.label, s.n_ref, s.n_cur, s.share_ref, s.share_cur, c.centroid_cos
FROM shares s JOIN cent c USING (label)
ORDER BY s.label
"""


# ---------------------------------------------------------------------------
# Group-relative reward normalization (round-9 head)
# ---------------------------------------------------------------------------

def q203_group_advantage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-relative advantage normalization — the GRPO-style batch
    statistic (Shao et al. 2024's group-normalized advantage
    ``(r - mean_group) / std_group``, the critic-free baseline every
    group-sampled RL recipe computes per prompt group): events are the
    rollout stream, ``user_id`` the prompt group, ``value`` the scalar
    reward. Per group: rollout count, mean/std of reward, the group's
    max advantage, and how many rollouts a ±2 clip would touch — the
    monitoring table that catches degenerate groups (zero variance =
    no learning signal) and reward-scale drift before a training run.
    Emits the 25 groups with the highest max advantage among groups of
    ≥ 5 rollouts.

    Scale: ONE groupBy with decimal-exact sum/sum-of-squares (map-side
    combinable) + a same-key window to count clipped rollouts — no
    self-join, cost linear in rollouts; the per-group state is two
    numbers. Determinism: rewards are 2-decimal money-like → DECIMAL
    sums are exact and order-free; mean/std/advantage are single double
    expressions over those exact sums, so both engines compare the
    identical clip threshold bit-for-bit — and the stats are emitted
    UNROUNDED (the q01 averages contract): the doubles are already
    engine-identical, while a round(4) re-introduced a grid-boundary
    class — Spark rounds the exact binary expansion, DuckDB rounds
    after a float multiply, and a 2-decimal reward mean CAN land
    exactly on the x.xxxx5 grid (found by the 0.12× round-10 stress
    twin: 191.10875 rounded 1088 vs 1087)."""
    e = read_table(spark, sf_dir, "events")
    dec = F.col("value").cast("decimal(14,2)")
    dec2 = (dec * dec).cast("decimal(28,4)")
    w = Window.partitionBy("user_id")
    enriched = (
        e.select("user_id", "value")
        .withColumn("__n", F.count(F.lit(1)).over(w))
        .withColumn("__s", F.sum(dec).over(w).cast("double"))
        .withColumn("__ss", F.sum(dec2).over(w).cast("double"))
        .where(F.col("__n") >= 5)
    )
    n = F.col("__n").cast("double")
    mean = F.col("__s") / n
    var = (F.col("__ss") - F.col("__s") * F.col("__s") / n) / (n - 1)
    # zero-variance groups (all rewards identical — no learning signal)
    # have no defined advantage: NULL, never a divide-by-zero or a
    # sqrt(-epsilon) NaN from float cancellation (the q111/q137 ANSI
    # guard class; mirrored as CASE WHEN var > 0 in the oracle)
    std = F.when(var > 0, F.sqrt(var))
    adv = (F.col("value") - mean) / std
    return (
        enriched.withColumn("__adv", adv)
        .groupBy("user_id")
        .agg(
            F.max("__n").cast("bigint").alias("n_rollouts"),
            F.max(mean).alias("mean_reward"),
            F.max(std).alias("std_reward"),
            F.max("__adv").alias("max_advantage"),
            F.sum(
                F.when(F.abs(F.col("__adv")) > 2.0, 1).otherwise(0)
            ).cast("bigint").alias("n_clipped"),
        )
        .orderBy(F.desc_nulls_last("max_advantage"), "user_id")
        .limit(25)
    )


_Q203_SQL = """
WITH g AS (
    SELECT user_id,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS s,
           CAST(SUM(CAST(CAST(value AS DECIMAL(14,2))
                         * CAST(value AS DECIMAL(14,2))
                         AS DECIMAL(28,4))) AS DOUBLE) AS ss
    FROM events GROUP BY user_id HAVING COUNT(*) >= 5),
scored AS (
    SELECT e.user_id, g.n,
           g.s / g.n AS mean,
           CASE WHEN (g.ss - g.s * g.s / g.n) / (g.n - 1) > 0
                THEN sqrt((g.ss - g.s * g.s / g.n) / (g.n - 1))
           END AS std,
           (e.value - g.s / g.n)
             / (CASE WHEN (g.ss - g.s * g.s / g.n) / (g.n - 1) > 0
                     THEN sqrt((g.ss - g.s * g.s / g.n) / (g.n - 1))
                END) AS adv
    FROM events e JOIN g USING (user_id))
SELECT user_id,
       CAST(MAX(n) AS BIGINT) AS n_rollouts,
       MAX(mean) AS mean_reward,
       MAX(std) AS std_reward,
       MAX(adv) AS max_advantage,
       SUM(CASE WHEN ABS(adv) > 2.0 THEN 1 ELSE 0 END)::BIGINT AS n_clipped
FROM scored
GROUP BY user_id
ORDER BY max_advantage DESC NULLS LAST, user_id
LIMIT 25
"""


# ---------------------------------------------------------------------------
# Dataset datasheet: the one-table corpus release summary — round-10 head
# ---------------------------------------------------------------------------

def q212_dataset_datasheet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The per-source "datasheet for datasets" summary table (Gebru et
    al. 2021's documentation practice, as a query): every corpus release
    ships one — document and token volumes, language spread, the modal
    language, and the Gopher quality pass rate, per source, in ONE scan
    plus two keyed aggregations. Composes the certified q164 gate battery
    (same ``gopher_quality_filter(min_words=30)``, whose SQL replay is
    q164's oracle CTE) with the certified grouping surface; the modal
    language ties break lexicographically (deterministic, both engines).

    100 TB design: the datasheet is a scan-stage expression battery +
    a (source)-keyed and a (source, lang)-keyed aggregation — no joins
    beyond the broadcast-sized per-source tables, no window over
    corpus-sized input (the lang-mode window ranks the (source, lang)
    AGGREGATE, bounded by #sources × #langs)."""
    from pyveb_spark.operators.text import gopher_quality_filter

    d = read_table(spark, sf_dir, "documents")
    gated = gopher_quality_filter(d, min_words=30)
    per = gated.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_words").cast("bigint").alias("n_tokens"),
        F.countDistinct("lang").cast("bigint").alias("n_langs"),
        F.sum(F.col("keep").cast("bigint")).alias("n_pass"),
    )
    lc = d.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("__c")
    )
    # NULLS LAST pinned on BOTH engines: Spark's asc sorts NULL first
    # while DuckDB's ORDER BY defaults to NULLS LAST, so a source whose
    # modal-count tie includes NULL lang would pick different top_langs
    # (ADVICE r9) — the explicit pin makes the tiebreak engine-identical
    w = Window.partitionBy("source").orderBy(
        F.desc("__c"), F.asc_nulls_last("lang")
    )
    top = (
        lc.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select("source", F.col("lang").alias("top_lang"))
    )
    return (
        per.join(top, "source")
        .select(
            "source",
            "n_docs",
            "n_tokens",
            # UNROUNDED (the r10 float-contract rule): both engines
            # perform the identical integer-to-double division, and a
            # round() would reintroduce the grid-boundary class when
            # n_docs is a 2^a·5^b count (terminating expansion)
            (
                F.col("n_tokens").cast("double")
                / F.col("n_docs").cast("double")
            ).alias("mean_tokens"),
            "n_langs",
            "top_lang",
            (
                F.col("n_pass").cast("double")
                / F.col("n_docs").cast("double")
            ).alias("gopher_pass_rate"),
        )
        .orderBy("source")
    )


_Q212_SQL = """
WITH t AS (
  SELECT source, lang,
         list_filter(string_split(text, ' '), w -> w <> '') AS toks
  FROM documents),
s AS (
  SELECT source, lang,
         len(toks) AS n_words,
         CAST(list_sum(list_transform(toks, w -> length(w))) AS DOUBLE)
           / len(toks) AS mean_len,
         CAST(len(list_filter(toks, w -> regexp_matches(w, '[A-Za-z]')))
              AS DOUBLE) / len(toks) AS alpha_frac,
         len(list_filter(toks, w -> list_contains(
             ['the','a','of','and','to','in','is','it'], lower(w))))
           AS n_stop
  FROM t),
gated AS (
  SELECT source, lang, n_words,
         ((n_words >= 30 AND n_words <= 100000)
          AND (mean_len >= 3.0 AND mean_len <= 10.0)
          AND (alpha_frac >= 0.8) AND (n_stop >= 2)) AS keep
  FROM s),
per AS (
  SELECT source,
         COUNT(*)::BIGINT AS n_docs,
         SUM(n_words)::BIGINT AS n_tokens,
         COUNT(DISTINCT lang)::BIGINT AS n_langs,
         SUM(CASE WHEN keep THEN 1 ELSE 0 END)::BIGINT AS n_pass
  FROM gated GROUP BY source),
lc AS (SELECT source, lang, COUNT(*) AS c FROM documents GROUP BY 1, 2),
top AS (SELECT source, lang AS top_lang FROM lc
        QUALIFY ROW_NUMBER() OVER (PARTITION BY source
                                   ORDER BY c DESC, lang NULLS LAST) = 1)
SELECT per.source, n_docs, n_tokens,
       CAST(n_tokens AS DOUBLE) / CAST(n_docs AS DOUBLE) AS mean_tokens,
       n_langs, top.top_lang,
       CAST(n_pass AS DOUBLE) / CAST(n_docs AS DOUBLE) AS gopher_pass_rate
FROM per JOIN top ON top.source = per.source
ORDER BY per.source
"""
