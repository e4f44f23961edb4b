"""Mergeable-sketch aggregations (north-star scale extension).

The reference computes distinct counts either exactly in Redshift SQL or
driver-side over collected lists (``common.py:290-303``) — both shapes that
die at 100 TB. Sketches fix the architecture, not just the constant: a
DataSketches HLL sketch is a small, *mergeable* state, so distinct-count
rollups become two map-side-combinable aggregations with no giant exact
shuffle, and pre-aggregated sketch tables (per day / per partition) can be
re-rolled to any coarser grain later without touching raw data — the
pattern every large-scale metrics pipeline uses.

All functions are thin compositions of Spark 3.5+/4.x built-ins
(``hll_sketch_agg`` / ``hll_union_agg`` / ``hll_sketch_estimate``,
``percentile_approx``) — JVM-side, no Python in the hot path. Estimates are
deterministic for a given input multiset (DataSketches is seed-fixed) but
not reproducible by other engines' HLL implementations, so queries built on
these are rows-only under the oracle gate; the error-bound contract is
pinned in unit tests instead.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "hll_distinct",
    "hll_partial",
    "hll_merge",
    "hll_rollup",
    "approx_quantiles",
    "cms_bucket",
    "cms_build",
    "cms_estimate",
    "merge_additive",
    "bloom_positions",
    "bloom_build",
    "bloom_probe",
    "bloom_gated_anti_join",
    "kmv_sketch",
    "KMV_M",
]

# KMV hash domain: 48-bit md5 prefix (``portable_hash48``), uniform on
# [0, 2^48) — the same engine-portable hash the Bloom/MinHash stacks use.
KMV_M = float(1 << 48)

# lgConfigK=12 → 4 KB sketches with ~1.6% relative standard error — the
# DataSketches default trade-off; raise for tighter bounds.
DEFAULT_LG_K = 12


def hll_distinct(col: str, lg_k: int = DEFAULT_LG_K) -> Column:
    """Approximate COUNT(DISTINCT col) as a single aggregate expression."""
    return F.hll_sketch_estimate(F.hll_sketch_agg(col, F.lit(lg_k)))


def hll_partial(
    df: DataFrame,
    keys: Sequence[str],
    col: str,
    lg_k: int = DEFAULT_LG_K,
    sketch_col: str = "sketch",
) -> DataFrame:
    """Pre-aggregate: one binary HLL sketch per ``keys`` group. Persist this
    table at the finest grain you'll ever query (e.g. per source×day); it
    is the only pass over the raw data."""
    return df.groupBy(*keys).agg(
        F.hll_sketch_agg(col, F.lit(lg_k)).alias(sketch_col)
    )


def hll_merge(
    partial: DataFrame,
    keys: Sequence[str],
    sketch_col: str = "sketch",
) -> DataFrame:
    """Union pre-aggregated sketches up to coarser ``keys``, keeping the
    result as a sketch (for further rollup or storage). Estimates are
    path-dependent only within the sketch's error bounds: DataSketches
    unions promote between sparse/dense modes as they grow, so different
    rollup paths (and union vs single-pass) may differ by ~RSE but all
    honor the configured accuracy — the contract pinned in tests."""
    return partial.groupBy(*keys).agg(
        F.hll_union_agg(sketch_col).alias(sketch_col)
    )


def hll_rollup(
    partial: DataFrame,
    keys: Sequence[str],
    sketch_col: str = "sketch",
    out_col: str = "approx_distinct",
) -> DataFrame:
    """Roll pre-aggregated sketches up to coarser ``keys`` by set-union and
    estimate — no raw-data access, no exact-distinct shuffle."""
    return partial.groupBy(*keys).agg(
        F.hll_sketch_estimate(F.hll_union_agg(sketch_col)).alias(out_col)
    )


def approx_quantiles(
    df: DataFrame,
    keys: Sequence[str],
    col: str,
    probabilities: Sequence[float] = (0.5, 0.95, 0.99),
    accuracy: int = 10000,
) -> DataFrame:
    """Per-group approximate quantiles (``percentile_approx`` — a mergeable
    KLL-style summary under the hood, same partial-aggregation scale shape
    as the HLL path). Exact percentiles (q75) sort each group; this doesn't,
    which is the difference at billion-row groups."""
    return df.groupBy(*keys).agg(
        F.percentile_approx(
            col, F.array(*[F.lit(p) for p in probabilities]), F.lit(accuracy)
        ).alias("approx_quantiles")
    )


# ---------------------------------------------------------------------------
# Count-min sketch (portable): heavy-hitter frequency estimation
# ---------------------------------------------------------------------------
#
# A CMS is depth-many rows of width-many counters; item frequency is
# estimated as min over rows of counter[hash_row(item)]. The sketch table
# here is literally a DataFrame of (depth, bucket, n) — built by one
# groupBy, mergeable by summing counters (counts are additive), and
# re-rollable to coarser grains like the HLL path. Unlike
# ``df.stat.countMinSketch`` (driver-side, whole-column, opaque bytes),
# this stays distributed and — because the row hashes are md5-prefix
# based, the same portable-hex trick as operators/sampling.py — the whole
# construction is reproducible verbatim in ANSI SQL, so CMS queries can be
# oracle-checked, not just bound-tested.
#
# Error contract (standard CMS): estimate ≥ true count always, and
# P[estimate > true + εN] ≤ δ with ε = e/width, δ = exp(-depth).

# 48-bit md5 prefix → bucket; uniform, portable. NOTE: the portable-hex
# scheme (width, separator, lowercase md5) must stay in lockstep with
# operators/sampling.py::uniform_hex and text.py::hashed_linear_score —
# every oracle SQL string reproduces it verbatim.
_CMS_HEX = 12


def cms_bucket(col, depth_idx, width: int) -> Column:
    """Bucket index in [0, width) for sketch row ``depth_idx``: the 48-bit
    md5 prefix of 'cms|<row>|<value>' mod width. String-rendered exactly
    like the sampling module so oracles reproduce it verbatim."""
    key = F.concat_ws(
        "|",
        F.lit("cms"),
        depth_idx.cast("string"),
        col.cast("string"),
    )
    return (
        F.conv(F.substring(F.md5(key.cast("binary")), 1, _CMS_HEX), 16, 10)
        .cast("bigint")
        % F.lit(int(width))
    )


def cms_build(
    df: DataFrame,
    col: str,
    depth: int = 4,
    width: int = 1024,
    weight_col: str | None = None,
) -> DataFrame:
    """One pass → sketch table ``(depth_idx, bucket, n)``. Each input row
    contributes to ``depth`` counters via an inline (depth_idx) explode;
    the single groupBy does map-side partial aggregation, so the shuffle
    carries at most depth×width rows per task regardless of input size.
    Merging sketch tables = unionAll + re-groupBy-sum (counts are
    additive); build at the finest grain once, roll up later."""
    w = F.lit(1).cast("bigint") if weight_col is None else F.col(
        weight_col
    ).cast("bigint")
    rows = df.select(
        F.col(col).alias("__v"),
        w.alias("__w"),
        F.explode(
            F.sequence(F.lit(0), F.lit(int(depth) - 1))
        ).alias("depth_idx"),
    )
    return (
        rows.withColumn(
            "bucket", cms_bucket(F.col("__v"), F.col("depth_idx"), width)
        )
        .groupBy("depth_idx", "bucket")
        .agg(F.sum("__w").alias("n"))
    )


def cms_estimate(
    sketch: DataFrame,
    items: DataFrame,
    col: str,
    depth: int = 4,
    width: int = 1024,
    out_col: str = "cms_count",
) -> DataFrame:
    """Point-query a sketch table for every row of ``items``: estimate =
    min over depth rows of the matching counter. The probe fans each item
    to its depth buckets and joins the (small, ≤ depth×width-row) sketch —
    broadcastable, so probing N items is shuffle-free on the item side.
    Absent buckets count 0 (possible when the sketch was built from data
    not containing the item)."""
    probes = items.select(
        F.col(col),
        F.explode(
            F.sequence(F.lit(0), F.lit(int(depth) - 1))
        ).alias("depth_idx"),
    ).withColumn("bucket", cms_bucket(F.col(col), F.col("depth_idx"), width))
    joined = probes.join(
        F.broadcast(sketch), ["depth_idx", "bucket"], "left"
    ).withColumn("n", F.coalesce(F.col("n"), F.lit(0)))
    return joined.groupBy(col).agg(F.min("n").alias(out_col))


def merge_additive(
    frames: Sequence[DataFrame],
    keys: Sequence[str],
    sum_cols: Sequence[str],
) -> DataFrame:
    """Merge pre-aggregated rollups by summing their additive measures —
    the incremental-view-maintenance primitive: yesterday's persisted
    rollup + today's partial (keys may OVERLAP, e.g. a day split across
    two loads) == the full recompute, without rescanning history.
    ``frames`` is a list of DataFrames with identical schemas; ``keys``
    the grouping columns; ``sum_cols`` the additive measure columns
    (counts, decimal sums, HLL/CMS partials merge with their own
    operators — see :func:`hll_merge`).

    Keep measures in their EXACT form (counts, decimals) until after the
    final merge and cast at presentation — double partials would make
    the merged result depend on load order.

    100 TB design: inputs are rollup-sized, not fact-sized; one shuffle
    on ``keys`` over rollup rows. This plus partitioned upsert
    (`ParquetMergeSink.upsert_partitioned`) is the pattern that replaces
    full-history recomputes with per-load increments.
    """
    from functools import reduce

    keys = list(keys)
    sum_cols = list(sum_cols)
    unioned = reduce(lambda a, b: a.unionByName(b), frames)
    return unioned.groupBy(*keys).agg(
        *[F.sum(c).alias(c) for c in sum_cols]
    )


# ---------------------------------------------------------------------------
# Bloom filter — engine-portable membership sketch (Bloom 1970)
# ---------------------------------------------------------------------------

def bloom_positions(col, num_bits: int, num_hashes: int) -> Column:
    """The ``num_hashes`` bit positions a key sets, as an array —
    md5-derived (``portable_hash48``-style), so any engine can replay
    them: position_i = hash48('bf{i}|' || key) % num_bits."""
    from pyveb_spark.operators.dedup import portable_hash48

    return F.array(
        *[
            portable_hash48(
                F.concat(F.lit(f"bf{i}|"), col.cast("string"))
            )
            % F.lit(int(num_bits))
            for i in range(num_hashes)
        ]
    )


def bloom_build(
    df: DataFrame,
    key_col: str,
    num_bits: int = 2048,
    num_hashes: int = 3,
) -> DataFrame:
    """Build an ``num_bits``-bit Bloom filter over ``key_col`` as a packed
    word table ``(word_idx, word)`` — 63 bits per BIGINT word (bit 63
    stays clear so no engine hits signed-shift overflow). The build is
    one explode + distinct + bit_or aggregation, all map-side
    combinable; the result is ≤ ``num_bits/63`` rows — broadcastable
    state, the classic join-pruning / admission-screen sidecar.

    Scale: the filter size is FIXED (bits), independent of corpus size;
    false-positive rate ≈ (1 - e^(-kn/m))^k. Size ``num_bits`` ≈ 10 bits
    per expected member for ~1% FP at ``num_hashes``=3."""
    pos = (
        df.select(
            F.explode(
                bloom_positions(F.col(key_col), num_bits, num_hashes)
            ).alias("pos")
        )
        .distinct()
    )
    return (
        pos.select(
            (F.col("pos") / F.lit(63)).cast("bigint").alias("word_idx"),
            (F.col("pos") % F.lit(63)).cast("int").alias("bit"),
        )
        .groupBy("word_idx")
        .agg(
            F.bit_or(
                F.expr("shiftleft(CAST(1 AS BIGINT), bit)")
            ).alias("word")
        )
    )


def bloom_probe(
    df: DataFrame,
    bloom: DataFrame,
    key_col: str,
    num_bits: int = 2048,
    num_hashes: int = 3,
    out_col: str = "bloom_hit",
) -> DataFrame:
    """Probe a Bloom filter: a key hits iff ALL its positions are set.
    Explode each probe key's positions, broadcast-join the word table
    (left join — an absent word is an unset bit), and AND the bit tests
    back per key. Original columns pass through; ``out_col`` is 1/0.

    NO false negatives ever (certified under the oracle in q141); false
    positives at the designed rate. At scale the word table rides along
    as a broadcast — probing is a scan-stage filter, the same shape as
    the Bloom-join pruning in ``operators/layout.py``."""
    probes = df.select(
        F.col(key_col).alias("__key"),
        F.posexplode(
            bloom_positions(F.col(key_col), num_bits, num_hashes)
        ).alias("__i", "pos"),
    ).select(
        "__key",
        "__i",
        (F.col("pos") / F.lit(63)).cast("bigint").alias("word_idx"),
        (F.col("pos") % F.lit(63)).cast("int").alias("bit"),
    )
    hit = (
        probes.join(F.broadcast(bloom), "word_idx", "left")
        .select(
            "__key",
            F.when(
                F.expr("(shiftright(word, bit) & 1) = 1"), F.lit(1)
            )
            .otherwise(F.lit(0))
            .alias("__set"),
        )
        .groupBy("__key")
        .agg(F.min("__set").alias(out_col))
    )
    # LEFT join back so NULL-key rows (which produce no probe positions,
    # and would never equi-join anyway) pass through with bloom_hit=0
    # instead of silently dropping.
    return df.join(
        hit.withColumnRenamed("__key", key_col), key_col, "left"
    ).withColumn(out_col, F.coalesce(F.col(out_col), F.lit(0)))


def bloom_gated_anti_join(
    df: DataFrame,
    bloom: DataFrame,
    exact_ids,
    key_col: str,
    num_bits: int = 2048,
    num_hashes: int = 3,
) -> DataFrame:
    """Anti-join with a Bloom prefilter — the streaming-admission
    idempotence check at corpus scale: rows whose keys the filter
    definitely hasn't seen (Bloom has NO false negatives) are new by
    construction and skip the exact side entirely; only possible-hits
    (true members + the designed false-positive rate) pay the exact
    anti-join. ``exact_ids`` is the seen-keys frame OR a zero-arg
    callable returning it — the callable is invoked ONLY when the
    filter reports possible hits, so a no-overlap batch (the common
    case in append-mostly ingest) never constructs the corpus-id scan
    at all. That flips the per-batch cost from O(corpus ids) to
    O(batch × filter), with the filter a fixed-size broadcast word
    table.

    Semantics are EXACTLY ``df.join(seen, key, "left_anti")``
    (equivalence pinned by test): over-approximation by the filter only
    routes more rows through the exact check, never changes the result.
    The possible-hit emptiness probe and the union branches each
    re-evaluate the batch-sized bloom_probe plan — batch-scale work by
    definition, the price of never touching corpus-scale state."""
    probed = bloom_probe(
        df, bloom, key_col, num_bits, num_hashes, out_col="__bloom_hit"
    )
    maybe = probed.where(F.col("__bloom_hit") == 1).drop("__bloom_hit")
    definite_new = probed.where(F.col("__bloom_hit") == 0).drop(
        "__bloom_hit"
    )
    if maybe.isEmpty():
        return definite_new
    ids = exact_ids() if callable(exact_ids) else exact_ids
    return definite_new.unionByName(
        maybe.join(ids, key_col, "left_anti")
    )


# ---------------------------------------------------------------------------
# KMV / theta sketch — engine-portable distinct-count SET ALGEBRA
# (Bar-Yossef 2002; Dasgupta et al. 2016 "theta sketch framework")
# ---------------------------------------------------------------------------

def kmv_sketch(
    df: DataFrame,
    group_cols: Sequence[str],
    key_col: str,
    k: int = 128,
    salt: str = "kmv",
) -> DataFrame:
    """Per-group KMV (k-minimum-values) sketch of ``key_col``'s distinct
    count: the ``k`` smallest 48-bit md5 hashes of the key, one row per
    retained hash. Mergeable set-algebra state: the union sketch of two
    groups is the k smallest of their combined hash sets, and the k-th
    smallest (theta) turns retained-hash counts into cardinality
    estimates — |S| ≈ (k-1)·M/theta, intersections via
    |{h < theta present in both}|·M/theta. Unlike the DataSketches HLL
    wrappers above, every value here is REPLAYABLE BY ANY ENGINE
    (md5 arithmetic + rank), so KMV queries run under the full value-hash
    oracle gate, not rows-only.

    Scale: one distinct-by-(group, hash) aggregation (map-side
    combinable) + one per-group top-k window; the sketch is k rows per
    group — broadcastable state, ~9% RSE at k=128, tighten with k.
    Hash ties are impossible after the distinct (48-bit domain), so the
    rank — and the sketch — is fully deterministic."""
    from pyspark.sql import Window

    from pyveb_spark.operators.dedup import portable_hash48

    gcols = list(group_cols)
    h = (
        df.select(
            *gcols,
            portable_hash48(
                F.concat(F.lit(f"{salt}|"), F.col(key_col).cast("string"))
            ).alias("h"),
        )
        .distinct()
    )
    w = Window.partitionBy(*gcols).orderBy("h")
    return (
        h.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= int(k))
        .drop("__rn")
    )
