"""Text-analysis operators for LLM-data pipelines (north star, BASELINE.json).

All features are native Catalyst expressions (split/filter/aggregate HOFs,
regexp counts) — no Python in the hot path, so a 100 TB corpus scan stays
inside whole-stage codegen. Language-ID uses an n-gram/stopword marker
heuristic; real corpora would swap in a fastText-style model via a
``mapInPandas`` batch scorer (see ``pyveb_spark.operators.multimodal`` for
the batching pattern).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "tokenize",
    "text_stats",
    "quality_score",
    "language_id",
    "doc_fingerprint",
]

# tiny built-in stopword marker sets per language for the heuristic lang-id;
# the corpus convention (FIXTURES.md documents table) is space-separated text
_LANG_MARKERS = {
    "en": ("the", "a", "of", "and"),
    "es": ("el", "la", "de", "los"),
    "de": ("der", "die", "das", "und"),
    "fr": ("le", "la", "les", "et"),
    "zh": ("de5", "shi4", "le5", "he2"),
}

_EN_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")


def tokenize(text_col) -> Column:
    """Whitespace tokenizer (single-space corpus convention). For messier
    text use a BPE-ish regexp split: ``F.split(col, r"\\s+|(?=[^\\w\\s])")``."""
    return F.split(text_col, " ")


def text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document token/char statistics — the quality-feature base.

    Adds: n_tokens, n_unique_tokens, n_chars_text, sum_token_len,
    avg_token_len, unique_ratio, stopword_ratio.
    All ratios are single IEEE double divisions of exact integer counts
    (oracle-reproducible bit-for-bit).
    """
    toks = tokenize(F.col(text_col))
    n_tokens = F.size(toks)
    n_unique = F.size(F.array_distinct(toks))
    sum_len = F.aggregate(
        F.transform(toks, lambda t: F.length(t)), F.lit(0), lambda acc, x: acc + x
    )
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*_EN_STOPWORDS)))
    return (
        df.withColumn("n_tokens", n_tokens)
        .withColumn("n_unique_tokens", n_unique)
        .withColumn("n_chars_text", F.length(F.col(text_col)))
        .withColumn("sum_token_len", sum_len)
        .withColumn(
            "avg_token_len",
            F.col("sum_token_len").cast("double") / F.col("n_tokens"),
        )
        .withColumn(
            "unique_ratio",
            F.col("n_unique_tokens").cast("double") / F.col("n_tokens"),
        )
        .withColumn("n_stopwords", n_stop)
        .withColumn(
            "stopword_ratio",
            F.col("n_stopwords").cast("double") / F.col("n_tokens"),
        )
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Composite 0..1 quality score from length / repetition / stopword
    signals (the C4/Gopher-style filter family, here as a cheap linear
    blend). Thresholds are corpus knobs, not learned weights."""
    base = text_stats(df, text_col)
    len_score = F.least(F.col("n_tokens") / F.lit(50.0), F.lit(1.0))
    rep_score = F.col("unique_ratio")
    stop_score = F.least(F.col("stopword_ratio") * 5.0, F.lit(1.0))
    return base.withColumn(
        "quality_score",
        (len_score * 0.4 + rep_score * 0.4 + stop_score * 0.2),
    )


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic language ID: count marker-stopword hits per language, pick
    the argmax (ties → 'und'). One pass, pure expressions; the per-language
    counts stay as columns for downstream routing."""
    toks = tokenize(F.col(text_col))
    out = df
    for lang, markers in _LANG_MARKERS.items():
        out = out.withColumn(
            f"__hits_{lang}", F.size(F.filter(toks, lambda t: t.isin(*markers)))
        )
    hit_structs = F.array(
        *[
            F.struct(F.col(f"__hits_{lang}").alias("hits"), F.lit(lang).alias("lang"))
            for lang in _LANG_MARKERS
        ]
    )
    best = F.reduce(
        hit_structs,
        F.struct(F.lit(-1).alias("hits"), F.lit("und").alias("lang")),
        lambda acc, x: F.when(x["hits"] > acc["hits"], x).otherwise(acc),
    )
    out = out.withColumn(
        "lang_pred",
        F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und")),
    )
    return out.drop(*[f"__hits_{lang}" for lang in _LANG_MARKERS])


def doc_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic 64-bit content fingerprint (normalized text →
    xxhash64) ↔ the reference's dataclass content hashes
    (``dbt_client.py:45-58``). Exact-dup detection = groupBy fingerprint."""
    normalized = F.lower(F.regexp_replace(F.col(text_col), r"\s+", " "))
    return df.withColumn("fingerprint", F.xxhash64(F.trim(normalized)))
