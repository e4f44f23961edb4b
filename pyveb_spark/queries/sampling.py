"""Sampling and packing: hash splits, source mixing, weighted sampling, sequence packing, shard assignment.

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
# LLM ops: deterministic content-keyed sampling (reproducible subsets)
# ---------------------------------------------------------------------------

def q42_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """25% deterministic sample of documents keyed on doc_id.

    The predicate is a stateless scan-stage filter (no shuffle, no RNG
    state) and is portable verbatim to the oracle — see
    ``operators/sampling.py`` for the md5-hex design rationale.
    """
    from pyveb_spark.operators.sampling import hash_sample

    d = read_table(spark, sf_dir, "documents")
    return (
        hash_sample(d, fraction=0.25, key_cols=["doc_id"], seed="split1")
        .select("doc_id", "lang", "source", "n_chars")
        .orderBy("doc_id")
    )


_Q42_SQL = """
SELECT doc_id, lang, source, n_chars
FROM documents
WHERE substr(md5(concat_ws('|', 'split1', doc_id)), 1, 12) < '400000000000'
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# LLM ops: weighted source mixing (corpus re-weighting)
# ---------------------------------------------------------------------------

def q43_source_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-weighted corpus mix: keep 100% of en, 50% of de/zh, 25% of
    fr/es — the deterministic re-weighting step of a training-data pipeline.
    Per-group thresholds ride the same md5 uniform value as q42, so group
    membership composes with sampling (a doc keeps the same hash across
    both)."""
    from pyveb_spark.operators.sampling import source_mix

    d = read_table(spark, sf_dir, "documents")
    return (
        source_mix(
            d,
            rates={"en": 1.0, "de": 0.5, "zh": 0.5, "fr": 0.25, "es": 0.25},
            group_col="lang",
            key_cols=["doc_id"],
            seed="mix1",
        )
        .groupBy("lang", "source")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("n_chars").alias("sum_chars"))
        .orderBy("lang", "source")
    )


_Q43_SQL = """
SELECT lang, source, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM documents
WHERE substr(md5(concat_ws('|', 'mix1', doc_id)), 1, 12) <
      CASE lang
           WHEN 'en' THEN 'g'
           WHEN 'de' THEN '800000000000'
           WHEN 'zh' THEN '800000000000'
           WHEN 'fr' THEN '400000000000'
           WHEN 'es' THEN '400000000000'
           ELSE '000000000000' END
GROUP BY lang, source
ORDER BY lang, source
"""


# ---------------------------------------------------------------------------
# LLM ops: GPT-style sequence packing (token stream → fixed windows)
# ---------------------------------------------------------------------------

def q54_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack the document corpus into 512-token training windows
    (documents span window boundaries — the standard pretraining layout)
    and summarize each pack: contributing docs, token count, doc-id range.
    Every pack except the last must hold exactly 512 tokens — the
    invariant the oracle re-derives independently via window prefix sums."""
    from pyveb_spark.operators.packing import pack_spans

    d = read_table(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split("text", " ")).alias("n_tokens")
    )
    spans = pack_spans(d, "n_tokens", "doc_id", budget=512)
    return (
        spans.groupBy("pack_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("span_tokens").alias("pack_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .orderBy("pack_id")
    )


_Q54_SQL = """
WITH d AS (
  SELECT doc_id, len(string_split(text, ' ')) AS n FROM documents
),
offs AS (
  SELECT doc_id, n,
         SUM(n) OVER (ORDER BY doc_id) - n AS start_tok,
         SUM(n) OVER (ORDER BY doc_id) - 1 AS end_tok
  FROM d
),
spans AS (
  SELECT doc_id,
         unnest(generate_series(CAST(start_tok // 512 AS BIGINT),
                                CAST(end_tok // 512 AS BIGINT))) AS pack_id,
         start_tok, end_tok
  FROM offs WHERE n > 0
)
SELECT pack_id,
       COUNT(*) AS n_docs,
       CAST(SUM(LEAST(end_tok, pack_id * 512 + 511)
                - GREATEST(start_tok, pack_id * 512) + 1) AS BIGINT)
           AS pack_tokens,
       MIN(doc_id) AS first_doc,
       MAX(doc_id) AS last_doc
FROM spans
GROUP BY pack_id
ORDER BY pack_id
"""


def q78_epoch_weighting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fractional epoch up-weighting of the corpus by language (de×2.5,
    fr×2.0, es×1.25, en×1.0, zh×0.5): each doc repeats ⌊w⌋ times plus a
    content-hash coin for the fraction — the true up-sampling half of
    corpus mixing (down-sampling is q43/q66). Per-language realized rows
    vs distinct docs make the weighting auditable; determinism of the
    per-doc coin is what the oracle reproduces."""
    from pyveb_spark.operators.sampling import epoch_repeat

    d = read_table(spark, sf_dir, "documents").select("doc_id", "lang")
    wt = (
        F.when(F.col("lang") == "en", 1.0)
        .when(F.col("lang") == "de", 2.5)
        .when(F.col("lang") == "zh", 0.5)
        .when(F.col("lang") == "fr", 2.0)
        .otherwise(1.25)
    )
    rep = epoch_repeat(
        d.withColumn("wt", wt), "wt", ["doc_id"], seed="epoch1"
    )
    return (
        rep.groupBy("lang")
        .agg(
            F.count_distinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .orderBy("lang")
    )


_Q78_SQL = """
WITH w AS (
  SELECT doc_id, lang,
         CASE lang WHEN 'en' THEN 1.0 WHEN 'de' THEN 2.5 WHEN 'zh' THEN 0.5
                   WHEN 'fr' THEN 2.0 ELSE 1.25 END AS wt,
         CAST(('0x' || substr(md5(concat_ws('|', 'epoch1', doc_id)), 1, 12))
                  ::BIGINT AS DOUBLE) AS h
  FROM documents
),
n AS (
  SELECT doc_id, lang,
         CAST(FLOOR(wt) AS INT)
         + CASE WHEN h < (wt - FLOOR(wt)) * 281474976710656.0
                THEN 1 ELSE 0 END AS k
  FROM w
),
r AS (
  SELECT doc_id, lang, unnest(generate_series(0, k - 1)) AS epoch
  FROM n WHERE k > 0
)
SELECT lang, COUNT(DISTINCT doc_id) AS n_docs, COUNT(*) AS n_rows
FROM r GROUP BY lang ORDER BY lang
"""


def q123_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-weighted document sampling, exact 10 per language
    (``operators/sampling.py::weighted_sample``): Efraimidis-Spirakis
    A-ES keys ``ln(u)/w`` over the shared content-hash uniform, ranked
    per group — deterministic weighted sampling without replacement,
    the curation pattern for "prefer longer docs but keep variety".
    Membership-boundary float margins are probed in
    ``test_float_margin.py``."""
    from pyveb_spark.operators.sampling import weighted_sample

    d = read_table(spark, sf_dir, "documents")
    kept = weighted_sample(
        d, k=10, weight_col="n_chars", key_cols=["doc_id"],
        group_cols=["lang"], seed="ws",
    )
    return kept.select("doc_id", "lang", "n_chars").orderBy("doc_id")


_Q123_SQL = """
WITH keyed AS (
    SELECT doc_id, lang, n_chars,
           ln(CAST((('0x' || substr(
                  md5('ws|' || doc_id), 1, 12))::BIGINT + 1) AS DOUBLE)
              / 281474976710656.0)
             / CAST(n_chars AS DOUBLE) AS es
    FROM documents
    WHERE n_chars IS NOT NULL AND n_chars > 0),
ranked AS (
    SELECT doc_id, lang, n_chars,
           ROW_NUMBER() OVER (PARTITION BY lang
                              ORDER BY es DESC, doc_id) AS rk
    FROM keyed)
SELECT doc_id, lang, n_chars
FROM ranked WHERE rk <= 10
ORDER BY doc_id
"""


def q128_split_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/valid/test assignment audit (``operators/sampling.py::
    hash_split``): the 80/10/10 content-keyed split of the documents
    corpus, counted per (split, lang). Disjoint-and-exhaustive is by
    construction (cumulative hash thresholds); this survey is the
    recurring sanity readout that the language mix is preserved across
    splits — the leakage/imbalance check every training run should log."""
    from pyveb_spark.operators.sampling import hash_split

    d = read_table(spark, sf_dir, "documents")
    s = hash_split(
        d, {"train": 0.8, "valid": 0.1, "test": 0.1}, ["doc_id"],
        seed="split",
    )
    return (
        s.groupBy("split", "lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("split", "lang")
    )


def _q128_sql() -> str:
    from pyveb_spark.operators.sampling import threshold_hex

    t_train = threshold_hex(0.8)
    t_valid = threshold_hex(0.8 + 0.1)
    return f"""
WITH assigned AS (
  SELECT lang,
         CASE WHEN substr(md5('split|' || doc_id), 1, 12) < '{t_train}'
                THEN 'train'
              WHEN substr(md5('split|' || doc_id), 1, 12) < '{t_valid}'
                THEN 'valid'
              ELSE 'test' END AS split
  FROM documents)
SELECT split, lang, COUNT(*) AS n
FROM assigned GROUP BY split, lang
ORDER BY split, lang
"""


def q148_training_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-set sharding
    (``sampling.py::shard_assign``): every document lands in
    ``hash48(seed|doc_id) mod 8`` — a pure function of the key, so
    retries and re-runs rebuild byte-identical shards (round-robin
    ``repartition`` cannot promise that) — plus the balance audit: per
    shard doc/token counts and the doc fraction. Write-side pairing is
    ``partitionBy('shard')`` (``sinks/writers.py``)."""
    from pyveb_spark.operators.sampling import shard_assign

    d = read_table(spark, sf_dir, "documents")
    s = shard_assign(d, 8, ["doc_id"], seed="train-v1")
    n = F.count(F.lit(1))
    w = Window.partitionBy()
    return (
        s.groupBy("shard")
        .agg(
            n.alias("n_docs"),
            F.sum(F.size(F.split(F.col("text"), " ")))
            .cast("bigint")
            .alias("n_tokens"),
        )
        .withColumn(
            "doc_frac",
            F.round(
                F.col("n_docs").cast("double")
                / F.sum("n_docs").over(w).cast("double"),
                6,
            ),
        )
        .orderBy("shard")
    )


_Q148_SQL = """
WITH s AS (
  SELECT ('0x' || substr(md5('train-v1|' || doc_id), 1, 12))::BIGINT % 8
           AS shard,
         len(string_split(text, ' ')) AS nt
  FROM documents)
SELECT shard::INT AS shard,
       COUNT(*)::BIGINT AS n_docs,
       SUM(nt)::BIGINT AS n_tokens,
       ROUND(CAST(COUNT(*) AS DOUBLE)
             / CAST(SUM(COUNT(*)) OVER () AS DOUBLE), 6) AS doc_frac
FROM s GROUP BY shard ORDER BY shard
"""


def q163_curriculum_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum schedule assembly (``sampling.py::curriculum_phases``):
    quality-score the corpus (the q27 linear blend), bucket into 4
    nearest-rank quality tiers over the DISTINCT-score table (no global
    sort, no data-sized window — docs sharing a rounded score share a
    phase), and emit the training-order schedule with cumulative token
    counts. The oracle replays the scoring, the descending cumulative
    rank, and the phase aggregation."""
    from pyveb_spark.operators.sampling import curriculum_phases
    from pyveb_spark.operators.text import quality_score

    d = read_table(spark, sf_dir, "documents")
    scored = quality_score(d, "text").select(
        "doc_id", "n_tokens", "quality_score"
    )
    return curriculum_phases(
        scored, "quality_score", "n_tokens", n_phases=4
    ).orderBy("phase")


_Q163_SQL = """
WITH stats AS (
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_tokens,
           len(list_filter(string_split(text, ' '),
               x -> x IN ('the','a','of','and','to','in','is','it'))) AS n_stopwords,
           len(list_distinct(string_split(text, ' '))) AS n_unique
    FROM documents),
scored AS (
  SELECT doc_id, n_tokens,
         ROUND(
           least(n_tokens / 50.0, 1.0) * 0.4
           + (CAST(n_unique AS DOUBLE) / n_tokens) * 0.4
           + least((CAST(n_stopwords AS DOUBLE) / n_tokens) * 5.0, 1.0) * 0.2,
         6) AS s
  FROM stats),
per_score AS (
  SELECT s AS __s, COUNT(*) AS __n, SUM(n_tokens) AS __toks
  FROM scored GROUP BY s),
consts AS (SELECT SUM(__n) AS N FROM per_score),
phased AS (
  SELECT __s, __n, __toks,
         LEAST(4, CEIL(SUM(__n) OVER (ORDER BY __s DESC
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND CURRENT ROW)
                       * 4 / (SELECT N * 1.0 FROM consts))::INT) AS phase
  FROM per_score),
sched AS (
  SELECT phase, SUM(__n)::BIGINT AS n_docs, SUM(__toks)::BIGINT AS n_tokens,
         MIN(__s) AS score_lo, MAX(__s) AS score_hi
  FROM phased GROUP BY phase)
SELECT phase, n_docs, n_tokens,
       SUM(n_tokens) OVER (ORDER BY phase
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW)::BIGINT AS cum_tokens,
       score_lo, score_hi
FROM sched
ORDER BY phase
"""


# ---------------------------------------------------------------------------
# LLM ops: temperature-scaled language mixing (multilingual corpus balance)
# ---------------------------------------------------------------------------

def q173_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled language re-balancing (α = 0.5), the
    multilingual-LM mixing recipe (Conneau 2020 §3.1: sample languages
    ∝ n^α to lift low-resource languages): per-lang keep-rates
    ``(n_min/n_lang)^(1-α)`` computed FROM the data in-plan, quantized to
    a 4096-grid hex threshold, applied as a stateless md5 filter.
    Reports, per language: corpus count, quantized rate, surviving
    count, the α-target share, and the achieved share.

    Contrast with q43 (fixed operator-supplied rates): here the rates
    are a function of observed group sizes — the form that survives
    corpus drift without re-tuning. α = 0.5 pins the rate path to
    ``sqrt`` (IEEE correctly-rounded → bit-identical in the oracle; see
    ``operators/sampling.py::temperature_rates``).

    Scale: two scans of documents (count pass + filter pass), one ≤5-row
    rate table broadcast back, both aggregations tiny. The 100 TB cost
    is the two scans — same as any count-then-sample recipe.
    """
    from pyveb_spark.operators.sampling import temperature_mix, temperature_rates

    d = read_table(spark, sf_dir, "documents")
    rates = temperature_rates(d, "lang", alpha=0.5)
    kept = (
        temperature_mix(d, "lang", key_cols=["doc_id"], alpha=0.5, seed="tmix1")
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_after"))
    )
    w = Window.partitionBy()
    return (
        rates.join(kept, "lang", "left")
        .withColumn("n_after", F.coalesce(F.col("n_after"), F.lit(0)))
        .select(
            "lang",
            F.col("n_g").alias("n_before"),
            F.round(F.col("t_int") / F.lit(4096.0), 6).alias("rate_q"),
            "n_after",
            F.round("target_share", 4).alias("target_share"),
            F.round(
                F.col("n_after")
                / F.sum("n_after").over(w).cast("double"),
                6,
            ).alias("achieved_share"),
        )
        .orderBy("lang")
    )


_Q173_SQL = """
WITH counts AS (SELECT lang, COUNT(*) AS n_g FROM documents GROUP BY lang),
stats AS (
  SELECT lang, n_g,
         MIN(n_g) OVER () AS n_min,
         sqrt(CAST(n_g AS DOUBLE)) / SUM(sqrt(CAST(n_g AS DOUBLE))) OVER ()
           AS target_share,
         CAST(FLOOR(4096.0 * sqrt(CAST(MIN(n_g) OVER () AS DOUBLE)
                                  / CAST(n_g AS DOUBLE))) AS INT) AS t_int
  FROM counts),
kept AS (
  SELECT d.lang, COUNT(*) AS n_after
  FROM documents d JOIN stats s ON d.lang = s.lang
  WHERE substr(md5(concat_ws('|', 'tmix1', d.doc_id)), 1, 3) <
        CASE WHEN s.t_int >= 4096 THEN 'g' ELSE printf('%03x', s.t_int) END
  GROUP BY d.lang)
SELECT s.lang,
       s.n_g::BIGINT AS n_before,
       ROUND(s.t_int / 4096.0, 6) AS rate_q,
       COALESCE(k.n_after, 0)::BIGINT AS n_after,
       ROUND(s.target_share, 4) AS target_share,
       ROUND(COALESCE(k.n_after, 0)
             / CAST(SUM(COALESCE(k.n_after, 0)) OVER () AS DOUBLE), 6)
         AS achieved_share
FROM stats s LEFT JOIN kept k ON s.lang = k.lang
ORDER BY s.lang
"""


# ---------------------------------------------------------------------------
# LLM ops: leakage-free train/valid/test split (group-keyed assignment)
# ---------------------------------------------------------------------------

def q174_leakage_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contamination-safe splitting: the doc_id-keyed 80/10/10 split
    (q128's committed assignment) scatters near-duplicate documents
    across train and test — exactly the train/test leakage Lee 2022 §6.2
    measures. Keying the SAME hash split on the prefix-12 content
    fingerprint instead pins every member of a duplicate group to one
    split, eliminating the leak by construction.

    Output: one row per (scheme, split) — docs assigned, distinct
    fingerprint groups touched, and ``leaked_docs``: members of groups
    that span >1 split under that scheme. The doc-keyed rows quantify
    the leak; the group-keyed rows certify 0.

    Scale: fingerprint + split assignment are scan-stage expressions;
    the leak audit is one groupBy(fingerprint-string) plus a re-join on
    it — two shuffles on a well-distributed key. (Spark hashes the
    normalized-prefix STRING, not the xxhash64 fingerprint, because the
    md5 split uniform must hash a value the oracle renders identically.)
    """
    from pyveb_spark.operators.sampling import hash_split
    from pyveb_spark.operators.text import normalized_text

    d = (
        read_table(spark, sf_dir, "documents")
        .withColumn("nt", normalized_text("text", prefix_tokens=12))
    )
    out = []
    for scheme, keys in (("doc_keyed", ["doc_id"]), ("group_keyed", ["nt"])):
        s = hash_split(
            d, {"train": 0.8, "valid": 0.1, "test": 0.1}, keys, seed="split"
        )
        spans = s.groupBy("nt").agg(
            F.count_distinct("split").alias("n_splits")
        )
        out.append(
            s.join(spans, "nt")
            .groupBy("split")
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.count_distinct("nt").alias("n_groups"),
                F.sum((F.col("n_splits") > 1).cast("long")).alias(
                    "leaked_docs"
                ),
            )
            .withColumn("scheme", F.lit(scheme))
        )
    return (
        out[0]
        .unionByName(out[1])
        .select("scheme", "split", "n_docs", "n_groups", "leaked_docs")
        .orderBy("scheme", "split")
    )


def _q174_sql() -> str:
    from pyveb_spark.operators.sampling import threshold_hex

    t_train = threshold_hex(0.8)
    t_valid = threshold_hex(0.8 + 0.1)
    return rf"""
WITH d AS (
  SELECT doc_id,
         array_to_string(
           (string_split(
              trim(lower(regexp_replace(text, '\s+', ' ', 'g'))), ' '))[1:12],
           ' ') AS nt
  FROM documents),
assigned AS (
  SELECT scheme, nt,
         CASE WHEN u < '{t_train}' THEN 'train'
              WHEN u < '{t_valid}' THEN 'valid'
              ELSE 'test' END AS split
  FROM (
    SELECT 'doc_keyed' AS scheme, nt,
           substr(md5(concat_ws('|', 'split', doc_id)), 1, 12) AS u
    FROM d
    UNION ALL
    SELECT 'group_keyed' AS scheme, nt,
           substr(md5(concat_ws('|', 'split', nt)), 1, 12) AS u
    FROM d) t),
spans AS (
  SELECT scheme, nt, COUNT(DISTINCT split) AS n_splits
  FROM assigned GROUP BY scheme, nt)
SELECT a.scheme, a.split,
       COUNT(*)::BIGINT AS n_docs,
       COUNT(DISTINCT a.nt)::BIGINT AS n_groups,
       SUM(CASE WHEN s.n_splits > 1 THEN 1 ELSE 0 END)::BIGINT AS leaked_docs
FROM assigned a JOIN spans s ON a.scheme = s.scheme AND a.nt = s.nt
GROUP BY a.scheme, a.split
ORDER BY a.scheme, a.split
"""


_Q174_SQL = _q174_sql()


# ---------------------------------------------------------------------------
# LLM ops: integer token-budget apportionment across sources
# ---------------------------------------------------------------------------

def q176_token_budget_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest-remainder apportionment of a 1M-token training budget
    across sources proportional to each source's token count
    (``sampling.py::apportion_budget``) — the exact integer allocation a
    mix config hands the sampler: Σ alloc == budget to the token, no
    source off its ideal share by ≥ 1. The whole path is int64
    ``div``/``%`` arithmetic — no float shares anywhere, so the oracle
    match is definitionally bit-exact (contrast q173, whose α-shares
    need the sqrt correct-rounding argument).

    Scale: one scan to count tokens per source (map-side combined), then
    windows over the ≤ #sources-row weight table. The allocation itself
    never touches data.
    """
    from pyveb_spark.operators.sampling import apportion_budget

    d = read_table(spark, sf_dir, "documents").select(
        "source", F.size(F.split("text", " ")).alias("n")
    )
    counts = d.groupBy("source").agg(
        F.sum("n").cast("long").alias("n_tokens")
    )
    return apportion_budget(
        counts, "source", "n_tokens", budget=1_000_000
    ).orderBy("source")


_Q176_SQL = """
WITH d AS (SELECT source, len(string_split(text, ' ')) AS n FROM documents),
c AS (SELECT source, SUM(n)::BIGINT AS n_tokens FROM d GROUP BY source),
f AS (SELECT source, n_tokens,
             (1000000 * n_tokens) // (SELECT SUM(n_tokens) FROM c) AS fl,
             (1000000 * n_tokens) % (SELECT SUM(n_tokens) FROM c) AS rem
      FROM c),
r AS (SELECT source, n_tokens, fl,
             ROW_NUMBER() OVER (ORDER BY rem DESC, source ASC) AS rk,
             1000000 - (SELECT SUM(fl) FROM f) AS leftover
      FROM f)
SELECT source, n_tokens,
       (fl + CASE WHEN rk <= leftover THEN 1 ELSE 0 END)::BIGINT AS alloc,
       CASE WHEN rk <= leftover THEN 1 ELSE 0 END::INT AS bonus
FROM r ORDER BY source
"""


# ---------------------------------------------------------------------------
# LLM ops: sequence-length sweep — packing cut-rate audit
# ---------------------------------------------------------------------------

def q177_packing_budget_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The choose-your-max_seq_len table: for budgets 128/256/512/1024,
    how many GPT-style training windows the corpus packs into and what
    fraction of documents a window boundary CUTS
    (``packing.py::pack_cut_stats``). Larger windows cut fewer docs but
    yield fewer samples — this audit is how a pipeline picks the
    trade-off before committing a layout (q54 then materializes the
    chosen one).

    The token-offset prefix sum runs ONCE; each budget's window ids are
    integer division over the same offsets, swept in a single plan via
    one explode — adding budgets costs nothing but agg rows. The oracle
    re-derives the offsets with a window cumsum and replays the integer
    division per budget.
    """
    from pyveb_spark.operators.packing import pack_cut_stats

    d = read_table(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split("text", " ")).alias("n_tokens")
    )
    return pack_cut_stats(
        d, "n_tokens", "doc_id", budgets=[128, 256, 512, 1024]
    ).orderBy("budget")


_Q177_SQL = """
WITH d AS (SELECT doc_id, len(string_split(text, ' ')) AS n FROM documents),
offs AS (SELECT doc_id, n,
                SUM(n) OVER (ORDER BY doc_id) - n AS start_tok,
                SUM(n) OVER (ORDER BY doc_id) - 1 AS end_tok
         FROM d),
b AS (SELECT unnest([128, 256, 512, 1024]) AS budget),
sw AS (SELECT budget, n,
              start_tok // budget AS fp,
              end_tok // budget AS lp
       FROM offs, b WHERE n > 0)
SELECT budget::BIGINT AS budget,
       COUNT(*)::BIGINT AS n_docs,
       (MAX(lp) + 1)::BIGINT AS n_packs,
       SUM(CASE WHEN lp > fp THEN 1 ELSE 0 END)::BIGINT AS docs_cut,
       ROUND(SUM(CASE WHEN lp > fp THEN 1 ELSE 0 END)
             / (COUNT(*) * 1.0), 6) AS cut_rate,
       SUM(lp - fp + 1)::BIGINT AS n_spans,
       SUM(n)::BIGINT AS total_tokens
FROM sw GROUP BY budget ORDER BY budget
"""


# ---------------------------------------------------------------------------
# Dynamic-batching padding-waste audit (round-8 head)
# ---------------------------------------------------------------------------

_Q194_BATCH = 8
_Q194_BUDGET = 512


def q194_padding_waste_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dynamic-batching decision table: tokens padded under three
    batching strategies over the SAME corpus — (a) ``naive`` arrival-order
    batches of 8 padded to the batch max, (b) ``bucketed``
    length-sorted batches of 8 (the standard bucketing trick — sorting
    by length makes batch members near-equal so padding collapses), and
    (c) ``packed`` the sequence-packing floor ceil(total/512) from the
    q54 machinery. Per strategy: batch count, real tokens, padded
    tokens, waste fraction. The table every training pipeline reads
    before choosing its collator; on this corpus bucketing removes most
    of naive's padding and packing removes the rest.

    Scale: two DISTRIBUTED row numberings (one per ordering) + two
    grouped aggregations + integer arithmetic; token counting is
    scan-stage. Row numbers come from ``with_token_offsets`` over a
    literal-1 column — the range-partition + per-partition-offset prefix
    sum (``operators/packing.py``), NOT a global ``Window.orderBy``
    row_number that would pull every document through one task at 10⁹
    docs (SCALE.md's no-unpartitioned-window rule; plan-gated). The
    length sort is the same single range exchange the bucketed collator
    pays in production. Fully integer — the only doubles are the final
    waste ratios (single division, round 6)."""
    from pyveb_spark.operators.packing import with_token_offsets

    d = read_table(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split("text", " ")).cast("bigint").alias("n")
    )

    def batch_stats(order_cols, strategy):
        # end_tok of a 1-token stream == the 0-based row index under the
        # ordering, so batch = end_tok // BATCH without any global window
        batched = with_token_offsets(
            d.withColumn("__one", F.lit(1)), "__one", order_cols
        ).withColumn(
            "batch",
            (F.col("end_tok") / F.lit(_Q194_BATCH)).cast("bigint"),
        )
        per = batched.groupBy("batch").agg(
            F.count(F.lit(1)).alias("cnt"),
            F.max("n").alias("mx"),
            F.sum("n").alias("s"),
        )
        return per.agg(
            F.lit(strategy).alias("strategy"),
            F.count(F.lit(1)).cast("bigint").alias("n_batches"),
            F.sum("s").cast("bigint").alias("tokens_real"),
            F.sum(F.col("cnt") * F.col("mx") - F.col("s"))
            .cast("bigint")
            .alias("tokens_padded"),
        )

    naive = batch_stats(["doc_id"], "naive")
    bucketed = batch_stats(["n", "doc_id"], "bucketed")
    packed = d.agg(
        F.lit("packed").alias("strategy"),
        F.ceil(F.sum("n") / F.lit(_Q194_BUDGET)).cast("bigint").alias(
            "n_batches"
        ),
        F.sum("n").cast("bigint").alias("tokens_real"),
        (
            F.ceil(F.sum("n") / F.lit(_Q194_BUDGET)) * _Q194_BUDGET
            - F.sum("n")
        )
        .cast("bigint")
        .alias("tokens_padded"),
    )
    out = naive.unionByName(bucketed).unionByName(packed)
    return out.select(
        "strategy",
        "n_batches",
        "tokens_real",
        "tokens_padded",
        F.round(
            F.col("tokens_padded").cast("double")
            / (F.col("tokens_real") + F.col("tokens_padded")).cast("double"),
            6,
        ).alias("waste_frac"),
    ).orderBy("strategy")


_Q194_SQL = f"""
WITH d AS (SELECT doc_id, len(string_split(text, ' '))::BIGINT AS n
           FROM documents),
nb AS (SELECT n, (ROW_NUMBER() OVER (ORDER BY doc_id) - 1)
                 // {_Q194_BATCH} AS batch FROM d),
bb AS (SELECT n, (ROW_NUMBER() OVER (ORDER BY n, doc_id) - 1)
                 // {_Q194_BATCH} AS batch FROM d),
na AS (SELECT 'naive' AS strategy, COUNT(*)::BIGINT AS n_batches,
              SUM(s)::BIGINT AS tokens_real,
              SUM(cnt * mx - s)::BIGINT AS tokens_padded
       FROM (SELECT batch, COUNT(*) cnt, MAX(n) mx, SUM(n) s
             FROM nb GROUP BY batch)),
bu AS (SELECT 'bucketed', COUNT(*)::BIGINT, SUM(s)::BIGINT,
              SUM(cnt * mx - s)::BIGINT
       FROM (SELECT batch, COUNT(*) cnt, MAX(n) mx, SUM(n) s
             FROM bb GROUP BY batch)),
pk AS (SELECT 'packed',
              CAST(ceil(SUM(n) / CAST({_Q194_BUDGET} AS DOUBLE)) AS BIGINT),
              SUM(n)::BIGINT,
              (CAST(ceil(SUM(n) / CAST({_Q194_BUDGET} AS DOUBLE)) AS BIGINT)
               * {_Q194_BUDGET} - SUM(n))::BIGINT
       FROM d),
u AS (SELECT * FROM na UNION ALL SELECT * FROM bu UNION ALL
      SELECT * FROM pk)
SELECT strategy, n_batches, tokens_real, tokens_padded,
       ROUND(CAST(tokens_padded AS DOUBLE)
             / CAST(tokens_real + tokens_padded AS DOUBLE), 6) AS waste_frac
FROM u ORDER BY strategy
"""
