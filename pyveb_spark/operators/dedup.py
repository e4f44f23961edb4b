"""Deduplication operators — exact, keep-first, n-gram Jaccard, MinHash-LSH,
SimHash.

Reference parity: the reference dedups list-of-dicts on the driver — full
record via ``set(tuple(d.items()))`` (``common.py:290-292``), by-key
keep-first (``common.py:294-303``), and dataclass content hashes
(``dbt_client.py:45-58,649-658``). Those collapse at scale; everything here
is shuffle-on-key distributed with no driver materialization.

The near-dup family is the north-star LLM-pipeline surface (BASELINE.json):
``ngram_jaccard_pairs`` is the exact algorithm (shared-shingle blocking —
lossless for threshold > 0), ``minhash_lsh_pairs`` is the sub-quadratic
scale path (candidate recall < 1 by design), ``simhash`` a 64-bit
fingerprint for Hamming-distance bucketing.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "exact_dedup",
    "keep_first",
    "shingles",
    "ngram_jaccard_pairs",
    "minhash_signatures",
    "minhash_lsh_pairs",
    "simhash",
]


def exact_dedup(df: DataFrame, cols: Sequence[str] | None = None) -> DataFrame:
    """Full-record (or by-column) exact dedup ↔ ``common.py:290-303`` /
    dataclass-hash dedup. ``dropDuplicates`` does partial map-side dedup
    before the shuffle — the 100 TB-safe version of the driver-side set."""
    return df.dropDuplicates(list(cols)) if cols else df.distinct()


def keep_first(
    df: DataFrame, keys: Sequence[str], order_by: Sequence[str]
) -> DataFrame:
    """Keep the first row per key group by a deterministic order
    ↔ ``common.py:294-303`` (which kept Python-iteration order — here the
    order is explicit, as iteration order doesn't exist on a cluster)."""
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") == 1)
        .drop("__rk")
    )


def shingles(text_col, n: int = 2):
    """Distinct word n-gram shingle array for a text column (Column expr).

    Tokenizes on single spaces (the corpus convention); swap the delimiter
    for ``\\s+`` splitting on messier corpora.
    """
    toks = F.split(text_col, " ")
    if n == 1:
        return F.array_distinct(toks)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )
    return F.array_distinct(grams)


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 2,
    threshold: float = 0.8,
) -> DataFrame:
    """Exact near-duplicate pairs by word n-gram Jaccard similarity.

    Algorithm: distinct shingles per doc → explode → self-join on the
    shingle (blocking: any pair with Jaccard ≥ t > 0 shares ≥ 1 shingle, so
    this is *lossless* vs the O(n²) cross join) → per-pair intersection
    count → Jaccard = |∩| / (|A| + |B| − |∩|).

    Output: ``(<id>_a, <id>_b, jaccard)`` with ``id_a < id_b``.

    Scale notes: cost is Σ df(g)² over shingle document frequencies df(g) —
    fine while no shingle is corpus-frequent. At web scale, drop
    stop-shingles above a document-frequency cap first, or use
    ``minhash_lsh_pairs`` (approximate) and verify candidates with this
    exact Jaccard. No driver collect anywhere.
    """
    a, b = f"{id_col}_a", f"{id_col}_b"
    grams = df.select(
        F.col(id_col), F.explode(shingles(F.col(text_col), n)).alias("__g")
    )
    sizes = grams.groupBy(id_col).agg(F.count(F.lit(1)).alias("__n"))
    ga = grams.select(F.col(id_col).alias(a), F.col("__g"))
    gb = grams.select(F.col(id_col).alias(b), F.col("__g"))
    pairs = (
        ga.join(gb, "__g")
        .where(F.col(a) < F.col(b))
        .groupBy(a, b)
        .agg(F.count(F.lit(1)).alias("intersection"))
    )
    sa = sizes.select(F.col(id_col).alias(a), F.col("__n").alias("__na"))
    sb = sizes.select(F.col(id_col).alias(b), F.col("__n").alias("__nb"))
    return (
        pairs.join(sa, a)
        .join(sb, b)
        .withColumn(
            "jaccard",
            F.col("intersection").cast("double")
            / (F.col("__na") + F.col("__nb") - F.col("intersection")),
        )
        .where(F.col("jaccard") >= threshold)
        .select(a, b, "jaccard")
    )


def _seeded_hash(col, seed: int):
    # xxhash64 with a per-seed salt — deterministic across runs/executors.
    return F.xxhash64(F.lit(seed), col)


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 2,
    num_hashes: int = 32,
) -> DataFrame:
    """MinHash signature per document: for each of ``num_hashes`` seeded
    hash functions, the min hash over the doc's shingle set. One explode +
    one groupBy — signature computation is a single shuffle on the id."""
    grams = df.select(
        F.col(id_col), F.explode(shingles(F.col(text_col), n)).alias("__g")
    )
    aggs = [
        F.min(_seeded_hash(F.col("__g"), s)).alias(f"mh_{s}")
        for s in range(num_hashes)
    ]
    return grams.groupBy(id_col).agg(*aggs)


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 2,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.8,
) -> DataFrame:
    """Approximate near-dup pairs via MinHash + banded LSH, candidates
    verified with exact Jaccard.

    ``num_hashes`` minhashes split into ``bands`` bands of r = n/b rows;
    docs colliding on any full band become candidates (collision prob
    1-(1-s^r)^b for true Jaccard s). Candidates are then *exactly* verified,
    so precision is 1.0; recall < 1 is the scale trade-off vs
    ``ngram_jaccard_pairs``. At 100 TB this is the only viable plan: cost is
    bands × (hash-join on band signature), never O(n²).
    """
    r = num_hashes // bands
    sig = minhash_signatures(df, id_col, text_col, n=n, num_hashes=num_hashes)
    band_cols = [
        F.xxhash64(*[F.col(f"mh_{b * r + i}") for i in range(r)]).alias(f"band_{b}")
        for b in range(bands)
    ]
    banded = sig.select(F.col(id_col), *band_cols)
    # candidates: union of per-band self-joins, deduped
    cand = None
    a, b_ = f"{id_col}_a", f"{id_col}_b"
    for bi in range(bands):
        left = banded.select(F.col(id_col).alias(a), F.col(f"band_{bi}").alias("__b"))
        right = banded.select(F.col(id_col).alias(b_), F.col(f"band_{bi}").alias("__b"))
        p = left.join(right, "__b").where(F.col(a) < F.col(b_)).select(a, b_)
        cand = p if cand is None else cand.unionByName(p)
    cand = cand.distinct()
    exact = ngram_jaccard_pairs(df, id_col, text_col, n=n, threshold=threshold)
    return cand.join(exact, [a, b_]).select(a, b_, "jaccard")


def simhash(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """64-bit SimHash fingerprint per document (token-level).

    Each token hashes to 64 bits; per bit position the doc sums ±1 over
    tokens; the sign vector packs into a BIGINT fingerprint. Near-dups are
    then found by Hamming-distance bucketing on fingerprint chunks — all
    expressible as joins on ``simhash_band`` columns. Pure Catalyst
    expressions (explode + groupBy), no UDF.
    """
    toks = df.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("__t")
    )
    hashed = toks.withColumn("__h", F.xxhash64("__t"))
    bits = hashed.select(
        id_col,
        F.explode(F.sequence(F.lit(0), F.lit(63))).alias("__bit"),
        F.col("__h"),
    ).withColumn(
        "__sign",
        F.when(F.expr("(__h >> __bit) & 1") == 1, F.lit(1)).otherwise(F.lit(-1)),
    )
    return (
        bits.groupBy(id_col, "__bit")
        .agg(F.sum("__sign").alias("__s"))
        .groupBy(id_col)
        .agg(
            F.sum(
                F.when(F.col("__s") > 0, F.expr("shiftleft(1L, CAST(__bit AS INT))"))
                .otherwise(F.lit(0).cast("long"))
            ).alias("simhash")
        )
    )
