"""Sketches: HLL, CMS, Bloom filters, additive rollups, Bloom-pruned joins.

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
# Sketch aggregation: HLL distinct-user rollup.
# DataSketches estimates aren't reproducible by other engines' HLL
# implementations, so the query emits the deterministically checkable form:
# exact counts + a boolean asserting the sketch estimate landed within its
# error bound (±5% ≈ 3·RSE at lgK=12). The oracle expects TRUE everywhere —
# a broken sketch path flips the flag and fails the value-hash.
# ---------------------------------------------------------------------------

def q50_hll_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per event type via mergeable HLL sketches: one pass
    builds per-(type, day) partial sketches, a second unions them to the
    type grain — the pre-aggregated-sketch-table pattern that replaces
    exact count-distinct shuffles at 100 TB. Exact counts alongside; the
    sketch estimate is reported as a within-bounds boolean (engine-portable
    where the raw estimate is not)."""
    from pyveb_spark.operators.sketches import hll_partial, hll_rollup

    e = read_table(spark, sf_dir, "events").withColumn(
        "day", F.to_date("ts")
    )
    part = hll_partial(e, ["event_type", "day"], "user_id")
    approx = hll_rollup(part, ["event_type"], out_col="approx_users")
    exact = e.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("exact_users")
    )
    return (
        approx.join(exact, "event_type")
        .select(
            "event_type",
            "exact_users",
            (
                F.abs(F.col("approx_users") - F.col("exact_users"))
                <= 0.05 * F.col("exact_users")
            ).alias("hll_within_bounds"),
        )
        .orderBy("event_type")
    )


_Q50_SQL = """
SELECT event_type,
       COUNT(DISTINCT user_id) AS exact_users,
       TRUE AS hll_within_bounds
FROM events
GROUP BY event_type
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# Sketches: count-min heavy hitters (portable-hash CMS, oracle-checked)
# ---------------------------------------------------------------------------

def q56_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token frequencies two ways: exact top-20 (one groupBy) vs a
    count-min sketch estimate (depth 4 × width 1024, md5-bucketed so the
    whole sketch is reproducible in ANSI SQL). CMS estimates are
    guaranteed ≥ exact; on this vocabulary the widths are collision-free
    enough that the oracle checks exact equality of the full table."""
    from pyveb_spark.operators.sketches import cms_build, cms_estimate

    toks = (
        read_table(spark, sf_dir, "documents")
        .select(F.explode(F.split("text", " ")).alias("token"))
    )
    sketch = cms_build(toks, "token", depth=4, width=1024)
    exact = (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("exact_n"))
        .orderBy(F.desc("exact_n"), "token")
        .limit(20)
    )
    est = cms_estimate(
        sketch, exact.select("token"), "token", depth=4, width=1024,
        out_col="cms_n",
    )
    return (
        exact.join(est, "token")
        .select("token", "exact_n", "cms_n")
        .orderBy(F.desc("exact_n"), "token")
    )


_Q56_SQL = """
WITH toks AS (
  SELECT unnest(string_split(text, ' ')) AS token FROM documents
),
seeds AS (SELECT unnest(generate_series(0, 3)) AS depth_idx),
sketch AS (
  SELECT depth_idx,
         (('0x' || substr(md5('cms|' || depth_idx || '|' || token), 1, 12))::BIGINT)
             % 1024 AS bucket,
         COUNT(*) AS n
  FROM toks, seeds
  GROUP BY 1, 2
),
exact AS (
  SELECT token, COUNT(*) AS exact_n
  FROM toks GROUP BY token
  ORDER BY exact_n DESC, token
  LIMIT 20
),
probes AS (
  SELECT token, exact_n, depth_idx,
         (('0x' || substr(md5('cms|' || depth_idx || '|' || token), 1, 12))::BIGINT)
             % 1024 AS bucket
  FROM exact, seeds
)
SELECT p.token, CAST(MAX(p.exact_n) AS BIGINT) AS exact_n,
       CAST(MIN(s.n) AS BIGINT) AS cms_n
FROM probes p JOIN sketch s USING (depth_idx, bucket)
GROUP BY p.token
ORDER BY exact_n DESC, token
"""


def q131_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance (``operators/sketches.py::
    merge_additive``): the daily (type, day) rollup computed as TWO
    loads split MID-DAY (Jan 15 noon) — the boundary day exists in both partials with
    partial sums — then additively merged. Measures stay exact decimals
    until after the merge, so the result equals the full recompute the
    oracle runs, independent of load order. The pattern that replaces
    full-history rescans with per-load increments."""
    from pyveb_spark.operators.sketches import merge_additive

    e = read_table(spark, sf_dir, "events")
    cut = F.lit("2024-01-15 12:00:00").cast("timestamp")

    def rollup(df: DataFrame) -> DataFrame:
        return df.groupBy(
            "event_type", F.date_trunc("day", F.col("ts")).alias("day")
        ).agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(_dec("value")).alias("sum_value_dec"),
        )

    merged = merge_additive(
        [rollup(e.where(F.col("ts") <= cut)), rollup(e.where(F.col("ts") > cut))],
        ["event_type", "day"],
        ["n_events", "sum_value_dec"],
    )
    return merged.select(
        "event_type",
        F.unix_micros("day").alias("day_us"),
        "n_events",
        F.col("sum_value_dec").cast("double").alias("sum_value"),
    ).orderBy("event_type", "day_us")


_Q131_SQL = """
SELECT event_type,
       epoch_us(date_trunc('day', ts)) AS day_us,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1, 2
ORDER BY event_type, day_us
"""


def q141_bloom_admission(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter membership screen (``sketches.py::bloom_build`` /
    ``bloom_probe``, Bloom 1970): build a fixed 2048-bit filter (3
    md5-derived hashes, 63-bit word packing) over the BUILDING-segment
    customer names, probe EVERY customer, and report the confusion
    counts. The oracle replays the exact bit arithmetic, certifying the
    two properties that matter: ZERO false negatives (the Bloom
    guarantee) and the designed-rate false positives — the admission /
    join-pruning sidecar at its real contract."""
    from pyveb_spark.operators.sketches import bloom_build, bloom_probe

    c = read_table(spark, sf_dir, "customer").select(
        "c_name",
        (F.col("c_mktsegment") == "BUILDING").cast("int").alias(
            "is_member"
        ),
    )
    bloom = bloom_build(
        c.where(F.col("is_member") == 1), "c_name", 2048, 3
    )
    probed = bloom_probe(c, bloom, "c_name", 2048, 3)
    return probed.agg(
        F.count(F.lit(1)).alias("n_probes"),
        F.sum("is_member").cast("bigint").alias("n_members"),
        F.sum("bloom_hit").cast("bigint").alias("n_bloom_hits"),
        F.sum(
            F.when(
                (F.col("bloom_hit") == 1) & (F.col("is_member") == 0), 1
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_false_positives"),
        F.sum(
            F.when(
                (F.col("bloom_hit") == 0) & (F.col("is_member") == 1), 1
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_false_negatives"),
    )


_Q141_SQL = """
WITH keys AS (SELECT c_name,
                     CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END
                       AS is_member
              FROM customer),
mpos AS (SELECT DISTINCT p FROM (
    SELECT ('0x' || substr(md5('bf0|' || c_name), 1, 12))::BIGINT % 2048
      AS p FROM keys WHERE is_member = 1
    UNION ALL
    SELECT ('0x' || substr(md5('bf1|' || c_name), 1, 12))::BIGINT % 2048
      FROM keys WHERE is_member = 1
    UNION ALL
    SELECT ('0x' || substr(md5('bf2|' || c_name), 1, 12))::BIGINT % 2048
      FROM keys WHERE is_member = 1)),
words AS (SELECT p // 63 AS word_idx,
                 bit_or(1::BIGINT << CAST(p % 63 AS INT)) AS word
          FROM mpos GROUP BY 1),
probe AS (
    SELECT c_name, is_member, unnest([
      ('0x' || substr(md5('bf0|' || c_name), 1, 12))::BIGINT % 2048,
      ('0x' || substr(md5('bf1|' || c_name), 1, 12))::BIGINT % 2048,
      ('0x' || substr(md5('bf2|' || c_name), 1, 12))::BIGINT % 2048]) AS p
    FROM keys),
bits AS (SELECT c_name, is_member,
                CASE WHEN w.word IS NOT NULL
                      AND ((w.word >> CAST(pr.p % 63 AS INT)) & 1) = 1
                     THEN 1 ELSE 0 END AS bit_set
         FROM probe pr LEFT JOIN words w ON w.word_idx = pr.p // 63),
hits AS (SELECT c_name, MIN(is_member) AS is_member,
                MIN(bit_set) AS bloom_hit
         FROM bits GROUP BY c_name)
SELECT COUNT(*)::BIGINT AS n_probes,
       SUM(is_member)::BIGINT AS n_members,
       SUM(bloom_hit)::BIGINT AS n_bloom_hits,
       SUM(CASE WHEN bloom_hit = 1 AND is_member = 0 THEN 1 ELSE 0
           END)::BIGINT AS n_false_positives,
       SUM(CASE WHEN bloom_hit = 0 AND is_member = 1 THEN 1 ELSE 0
           END)::BIGINT AS n_false_negatives
FROM hits
"""


def q151_bloom_pruned_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A Bloom-filter-pruned join certified SEMANTICALLY INVISIBLE (the
    q132 salted-join discipline): revenue of lineitems whose order is
    URGENT-priority, computed by first screening the 600k-row lineitem
    scan through a 16384-bit Bloom filter built on the qualifying order
    keys (``sketches.py::bloom_build``), then joining only survivors.
    Zero false negatives means the result is hash-identical to the plain
    join — which is exactly what the oracle computes, so the certificate
    is the equality itself. At 100 TB this is the pattern that cuts a
    fact-scan's join input by the filter's selectivity for the cost of a
    broadcast bitset (runtime row-group skipping, portable across
    engines — `layout.py` has the Spark-native twin)."""
    from pyveb_spark.operators.sketches import bloom_build, bloom_probe

    o = read_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") == "1-URGENT"
    )
    l = read_table(spark, sf_dir, "lineitem")
    bloom = bloom_build(o, "o_orderkey", num_bits=16384, num_hashes=3)
    survivors = bloom_probe(
        l.withColumnRenamed("l_orderkey", "o_orderkey"),
        bloom,
        "o_orderkey",
        num_bits=16384,
        num_hashes=3,
    ).where(F.col("bloom_hit") == 1)
    joined = survivors.join(o.select("o_orderkey"), "o_orderkey")
    return joined.groupBy(F.col("o_orderkey") % 7).agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(_dec("l_extendedprice", 14))
        .cast("double")
        .alias("revenue"),
    ).select(
        F.col("(o_orderkey % 7)").cast("bigint").alias("key_bucket"),
        "n_lines",
        "revenue",
    ).orderBy("key_bucket")


_Q151_SQL = """
SELECT l_orderkey % 7 AS key_bucket,
       COUNT(*)::BIGINT AS n_lines,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2))) AS DOUBLE)
         AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE o_orderpriority = '1-URGENT'
GROUP BY 1 ORDER BY key_bucket
"""


# ---------------------------------------------------------------------------
# KMV / theta sketch set algebra (round-8 head)
# ---------------------------------------------------------------------------

_Q188_K = 256


def q188_kmv_set_algebra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-count SET ALGEBRA from mergeable KMV (theta) sketches —
    |A|, |A∪B|, |A∩B| for every pair of order-priority customer sets,
    estimated from k=256-row sketches and audited against the exact
    counts in the same result row. The sketch answers the question HLL
    cannot: intersections (how many customers do two segments SHARE)
    without ever joining the raw sets — at 100 TB the five per-priority
    sketches are 256 rows each, built in one pass, and every pairwise
    (or n-way) overlap comes from sketch-on-sketch arithmetic.

    Estimators (Bar-Yossef 2002 / theta-sketch framework): union via the
    k smallest of the combined hash sets with theta = the k-th smallest,
    est = (k-1)·M/theta; intersection via |{h < theta retained by BOTH}|
    ·M/theta; degenerate small unions (< k hashes) are exact by
    construction. Every value is md5-rank arithmetic — the oracle
    replays the sketches hash-for-hash, so the ESTIMATES themselves are
    value-hash-checked, not just bounded.

    Scale: sketch build = one distinct + one per-group top-k window over
    (priority, hash); the pair stage touches only 5 x 256 sketch rows
    (broadcast). The exact columns are the audit — the one full
    self-join a production run would skip."""
    from pyveb_spark.operators.sketches import KMV_M, kmv_sketch

    o = read_table(spark, sf_dir, "orders")
    d = o.select(
        F.col("o_orderpriority").alias("prio"),
        F.col("o_custkey").alias("ck"),
    ).distinct()
    sk = kmv_sketch(d, ["prio"], "ck", k=_Q188_K)

    prios = d.select("prio").distinct()
    pairs = (
        prios.select(F.col("prio").alias("pa"))
        .join(
            prios.select(F.col("prio").alias("pb")),
            F.col("pa") < F.col("pb"),
        )
    )
    side_a = pairs.join(
        F.broadcast(sk.withColumnRenamed("prio", "pa")), "pa"
    ).select("pa", "pb", "h", F.lit(1).alias("ina"), F.lit(0).alias("inb"))
    side_b = pairs.join(
        F.broadcast(sk.withColumnRenamed("prio", "pb")), "pb"
    ).select("pa", "pb", "h", F.lit(0).alias("ina"), F.lit(1).alias("inb"))
    ph = (
        side_a.unionByName(side_b)
        .groupBy("pa", "pb", "h")
        .agg(F.max("ina").alias("ina"), F.max("inb").alias("inb"))
    )
    wp = Window.partitionBy("pa", "pb").orderBy("h")
    ranked = ph.withColumn("rn", F.row_number().over(wp)).where(
        F.col("rn") <= _Q188_K
    )
    both = (F.col("ina") == 1) & (F.col("inb") == 1)
    est = ranked.groupBy("pa", "pb").agg(
        F.count(F.lit(1)).alias("t"),
        F.max("h").alias("theta"),
        F.sum(F.when(both, 1).otherwise(0)).alias("both_all"),
        F.sum(F.when(both & (F.col("rn") < _Q188_K), 1).otherwise(0)).alias(
            "both_lt"
        ),
    )
    full = F.col("t") >= F.lit(_Q188_K)
    est = est.select(
        "pa",
        "pb",
        F.when(
            full,
            F.round(
                F.lit(float(_Q188_K - 1))
                * F.lit(KMV_M)
                / F.col("theta").cast("double"),
                1,
            ),
        )
        .otherwise(F.col("t").cast("double"))
        .alias("est_union"),
        F.when(
            full,
            F.round(
                F.col("both_lt").cast("double")
                * F.lit(KMV_M)
                / F.col("theta").cast("double"),
                1,
            ),
        )
        .otherwise(F.col("both_all").cast("double"))
        .alias("est_intersect"),
    )

    sizes = d.groupBy("prio").agg(F.count(F.lit(1)).alias("n"))
    ex_int = (
        d.select(F.col("prio").alias("pa"), "ck")
        .join(d.select(F.col("prio").alias("pb"), "ck"), "ck")
        .where(F.col("pa") < F.col("pb"))
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("exact_intersect"))
    )
    return (
        est.join(sizes.withColumnRenamed("prio", "pa"), "pa")
        .withColumnRenamed("n", "exact_a")
        .join(sizes.withColumnRenamed("prio", "pb"), "pb")
        .withColumnRenamed("n", "exact_b")
        .join(ex_int, ["pa", "pb"], "left")
        .select(
            "pa",
            "pb",
            F.col("exact_a").cast("bigint").alias("exact_a"),
            F.col("exact_b").cast("bigint").alias("exact_b"),
            F.coalesce(F.col("exact_intersect"), F.lit(0))
            .cast("bigint")
            .alias("exact_intersect"),
            (
                F.col("exact_a")
                + F.col("exact_b")
                - F.coalesce(F.col("exact_intersect"), F.lit(0))
            )
            .cast("bigint")
            .alias("exact_union"),
            "est_union",
            "est_intersect",
        )
        .orderBy("pa", "pb")
    )


_Q188_SQL = """
WITH d AS (SELECT DISTINCT o_orderpriority AS prio, o_custkey AS ck
           FROM orders),
h AS (SELECT DISTINCT prio,
             ('0x' || substr(md5('kmv|' || ck), 1, 12))::BIGINT AS h
      FROM d),
sk AS (SELECT prio, h
       FROM (SELECT prio, h,
                    ROW_NUMBER() OVER (PARTITION BY prio ORDER BY h) AS rn
             FROM h)
       WHERE rn <= 256),
prios AS (SELECT DISTINCT prio FROM d),
pairs AS (SELECT a.prio AS pa, b.prio AS pb
          FROM prios a JOIN prios b ON a.prio < b.prio),
ph AS (SELECT pa, pb, h,
              MAX(CASE WHEN s.prio = pa THEN 1 ELSE 0 END) AS ina,
              MAX(CASE WHEN s.prio = pb THEN 1 ELSE 0 END) AS inb
       FROM pairs JOIN sk s ON s.prio = pa OR s.prio = pb
       GROUP BY pa, pb, h),
ranked AS (SELECT *,
                  ROW_NUMBER() OVER (PARTITION BY pa, pb ORDER BY h) AS rn
           FROM ph),
est0 AS (SELECT pa, pb, COUNT(*) AS t, MAX(h) AS theta,
                SUM(CASE WHEN ina = 1 AND inb = 1 THEN 1 ELSE 0 END)
                  AS both_all,
                SUM(CASE WHEN ina = 1 AND inb = 1 AND rn < 256
                         THEN 1 ELSE 0 END) AS both_lt
         FROM ranked WHERE rn <= 256 GROUP BY pa, pb),
est AS (SELECT pa, pb,
               CASE WHEN t >= 256
                    THEN ROUND(CAST(255 AS DOUBLE)
                               * CAST(281474976710656 AS DOUBLE)
                               / CAST(theta AS DOUBLE), 1)
                    ELSE CAST(t AS DOUBLE) END AS est_union,
               CASE WHEN t >= 256
                    THEN ROUND(CAST(both_lt AS DOUBLE)
                               * CAST(281474976710656 AS DOUBLE)
                               / CAST(theta AS DOUBLE), 1)
                    ELSE CAST(both_all AS DOUBLE) END AS est_intersect
        FROM est0),
sizes AS (SELECT prio, COUNT(*) AS n FROM d GROUP BY prio),
ex AS (SELECT a.prio AS pa, b.prio AS pb, COUNT(*) AS exact_intersect
       FROM d a JOIN d b ON a.ck = b.ck AND a.prio < b.prio
       GROUP BY 1, 2)
SELECT e.pa, e.pb,
       sa.n::BIGINT AS exact_a,
       sb.n::BIGINT AS exact_b,
       COALESCE(ex.exact_intersect, 0)::BIGINT AS exact_intersect,
       (sa.n + sb.n - COALESCE(ex.exact_intersect, 0))::BIGINT AS exact_union,
       e.est_union, e.est_intersect
FROM est e
JOIN sizes sa ON sa.prio = e.pa
JOIN sizes sb ON sb.prio = e.pb
LEFT JOIN ex ON ex.pa = e.pa AND ex.pb = e.pb
ORDER BY e.pa, e.pb
"""


# ---------------------------------------------------------------------------
# KMV quantile sketch + self-audit (round-9 head)
# ---------------------------------------------------------------------------

_Q204_K = 32


def q204_kmv_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable KMV quantile estimation with a built-in accuracy audit
    (Bar-Yossef 2002's k-minimum-values as a UNIFORM SAMPLER: the rows
    holding the k smallest md5 hashes of their key are a uniform random
    subset, so order statistics over their values estimate the
    population quantiles — the same hash-sample duality DataSketches'
    sampling sketches exploit, here fully engine-replayable): per
    source, estimate the p50/p90 of document length from the k=32
    smallest-hash sample AND compute the exact percentiles next to them
    with the absolute error — the sketch that audits itself, the table
    a 100 TB profiler consults before trusting sampled statistics.

    Scale: the sample set is associative/mergeable state (k smallest
    hashes — the window computes the same result one partial-combine
    would); exact percentiles here are the AUDIT column — at 100 TB you
    keep only the sketch path (k rows per group, broadcastable).
    Determinism: 48-bit md5 hash order (ties impossible after distinct
    ids), integer values, rank = ceil(p·n) over (value, doc_id) order —
    every output cell is an exact integer in both engines."""
    from pyveb_spark.operators.dedup import portable_hash48

    d = read_table(spark, sf_dir, "documents")
    base = d.select(
        "source",
        "doc_id",
        "n_chars",
        portable_hash48(
            F.concat(F.lit("kmvq|"), F.col("doc_id").cast("string"))
        ).alias("h"),
    )

    def quantile_cols(df: DataFrame, prefix: str) -> DataFrame:
        wv = Window.partitionBy("source").orderBy("n_chars", "doc_id")
        wn = Window.partitionBy("source")
        ranked = df.withColumn("__vr", F.row_number().over(wv)).withColumn(
            "__n", F.count(F.lit(1)).over(wn)
        )
        pick = lambda p: F.max(  # noqa: E731
            F.when(
                F.col("__vr")
                == F.ceil(F.lit(p) * F.col("__n")).cast("bigint"),
                F.col("n_chars"),
            )
        ).cast("bigint")
        return ranked.groupBy("source").agg(
            F.max("__n").cast("bigint").alias(f"{prefix}_n"),
            pick(0.5).alias(f"{prefix}_p50"),
            pick(0.9).alias(f"{prefix}_p90"),
        )

    wH = Window.partitionBy("source").orderBy("h")
    sample = (
        base.withColumn("__hr", F.row_number().over(wH))
        .where(F.col("__hr") <= _Q204_K)
        .drop("__hr")
    )
    est = quantile_cols(sample, "est")
    exact = quantile_cols(base, "exact")
    return (
        est.join(exact, "source")
        .select(
            "source",
            F.col("exact_n").alias("n_docs"),
            F.col("est_p50"),
            F.col("exact_p50"),
            F.abs(F.col("est_p50") - F.col("exact_p50"))
            .cast("bigint")
            .alias("err_p50"),
            F.col("est_p90"),
            F.col("exact_p90"),
            F.abs(F.col("est_p90") - F.col("exact_p90"))
            .cast("bigint")
            .alias("err_p90"),
        )
        .orderBy("source")
    )


_Q204_SQL = f"""
WITH base AS (
    SELECT source, doc_id, n_chars,
           ('0x' || substr(md5('kmvq|' || doc_id), 1, 12))::BIGINT AS h
    FROM documents),
samp AS (
    SELECT * FROM (
        SELECT source, doc_id, n_chars,
               ROW_NUMBER() OVER (PARTITION BY source ORDER BY h) AS hr
        FROM base)
    WHERE hr <= {_Q204_K}),
est_r AS (
    SELECT source, n_chars,
           ROW_NUMBER() OVER (PARTITION BY source
                              ORDER BY n_chars, doc_id) AS vr,
           COUNT(*) OVER (PARTITION BY source) AS n
    FROM samp),
est AS (
    SELECT source,
           CAST(MAX(CASE WHEN vr = CAST(CEIL(0.5 * n) AS BIGINT)
                         THEN n_chars END) AS BIGINT) AS est_p50,
           CAST(MAX(CASE WHEN vr = CAST(CEIL(0.9 * n) AS BIGINT)
                         THEN n_chars END) AS BIGINT) AS est_p90
    FROM est_r GROUP BY source),
ex_r AS (
    SELECT source, n_chars,
           ROW_NUMBER() OVER (PARTITION BY source
                              ORDER BY n_chars, doc_id) AS vr,
           COUNT(*) OVER (PARTITION BY source) AS n
    FROM base),
ex AS (
    SELECT source,
           CAST(MAX(n) AS BIGINT) AS n_docs,
           CAST(MAX(CASE WHEN vr = CAST(CEIL(0.5 * n) AS BIGINT)
                         THEN n_chars END) AS BIGINT) AS exact_p50,
           CAST(MAX(CASE WHEN vr = CAST(CEIL(0.9 * n) AS BIGINT)
                         THEN n_chars END) AS BIGINT) AS exact_p90
    FROM ex_r GROUP BY source)
SELECT e.source, x.n_docs,
       e.est_p50, x.exact_p50,
       CAST(ABS(e.est_p50 - x.exact_p50) AS BIGINT) AS err_p50,
       e.est_p90, x.exact_p90,
       CAST(ABS(e.est_p90 - x.exact_p90) AS BIGINT) AS err_p90
FROM est e JOIN ex x USING (source)
ORDER BY e.source
"""
