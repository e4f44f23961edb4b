"""Deterministic hash-based sampling, splitting, and source mixing.

Training-data pipelines need *reproducible* sampling: the same document must
land in the same split on every run, on every cluster size, with no RNG
state. Spark's ``df.sample``/``sampleBy`` are seeded per-partition — results
change when partitioning changes, which at 100 TB it always does. Everything
here instead derives a uniform value from a *content key*: the first 48 bits
of ``md5(seed | key)`` compared against a hex threshold string.

Why string-compare hex instead of int arithmetic: both Spark and ANSI
engines (DuckDB, Trino, ...) render md5 as lowercase hex, so the predicate
``substr(md5(k),1,12) < '<threshold>'`` is portable verbatim into oracle
SQL — no engine-specific hex→int casts. Lexicographic order on fixed-width
lowercase-hex strings equals numeric order, and md5's avalanche makes the
prefix uniform. Resolution is 16⁻¹² ≈ 3.6e-15 — far below any meaningful
sampling rate.

Scale notes: every operator is a stateless per-row filter — no shuffle, no
driver state, trivially parallel, and pushed into the scan stage by
Catalyst. The reference has no sampling surface (its driver-side
list-of-dicts could afford ``random.sample``); this module is part of the
north-star LLM-pipeline extension (BASELINE.json).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "uniform_hex",
    "threshold_hex",
    "sample_predicate",
    "hash_sample",
    "hash_split",
    "source_mix",
    "temperature_rates",
    "temperature_mix",
    "ranked_quota_sample",
    "epoch_repeat",
    "weighted_sample",
    "shard_assign",
    "score_tiers",
    "apportion_budget",
]

_HEX_DIGITS = 12  # 48-bit prefix of the md5


def uniform_hex(key_cols: Sequence[str], seed: str = "") -> Column:
    """12-hex-char uniform value in [0, 16¹²) derived from the row's key.

    The key is ``concat_ws('|', seed, *cols)`` — identical string rendering
    in Spark and DuckDB for ints/strings, so oracles can reproduce it.
    """
    key = F.concat_ws(
        "|", F.lit(str(seed)), *[F.col(c).cast("string") for c in key_cols]
    )
    return F.substring(F.md5(key.cast("binary")), 1, _HEX_DIGITS)


def threshold_hex(fraction: float) -> str:
    """The sampling predicate's right-hand side: ``fraction`` scaled to a
    zero-padded 12-digit hex string (clamped to [0, 1]). Fractions that
    round up to 1 return ``"g"``, which sorts after every lowercase-hex
    string — "keep everything" without a 13-digit wraparound."""
    f = min(max(float(fraction), 0.0), 1.0)
    v = int(round(f * 16**_HEX_DIGITS))
    if v >= 16**_HEX_DIGITS:
        return "g"
    return format(v, "012x")


def sample_predicate(
    fraction: float, key_cols: Sequence[str], seed: str = ""
) -> Column:
    """Boolean Column: row is in the ``fraction``-sample keyed by
    ``key_cols``. Nested samples: for f1 ≤ f2 (same key+seed), the
    f1-sample is a subset of the f2-sample — shrinking a corpus never
    *introduces* documents downstream."""
    if fraction >= 1.0:
        return F.lit(True)
    if fraction <= 0.0:
        return F.lit(False)
    return uniform_hex(key_cols, seed) < F.lit(threshold_hex(fraction))


def hash_sample(
    df: DataFrame,
    fraction: float,
    key_cols: Sequence[str],
    seed: str = "",
) -> DataFrame:
    """Deterministic content-keyed sample — ``df.sample`` without the
    partition-dependence. Same rows selected on every run/cluster."""
    return df.where(sample_predicate(fraction, key_cols, seed))


def hash_split(
    df: DataFrame,
    splits: Mapping[str, float],
    key_cols: Sequence[str],
    seed: str = "",
    out_col: str = "split",
) -> DataFrame:
    """Assign every row to exactly one named split (train/valid/test, ...)
    by cumulative hash-threshold buckets. ``splits`` maps name → fraction;
    fractions must sum to 1 (±1e-9). Disjoint and exhaustive by
    construction — the property ``randomSplit`` only gives you per-run.
    """
    total = sum(splits.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split fractions must sum to 1, got {total}")
    hexv = uniform_hex(key_cols, seed)
    expr = None
    cum = 0.0
    names = list(splits)
    for name in names[:-1]:
        cum += splits[name]
        cond = hexv < F.lit(threshold_hex(cum))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = F.lit(names[-1])
    out = last if expr is None else expr.otherwise(last)
    return df.withColumn(out_col, out)


def source_mix(
    df: DataFrame,
    rates: Mapping[str, float],
    group_col: str,
    key_cols: Sequence[str],
    seed: str = "",
    default_rate: float = 0.0,
) -> DataFrame:
    """Weighted mix over a group column (source, language, domain): keep a
    per-group deterministic fraction of rows — the standard way to re-weight
    a training corpus (e.g. up-weight books, down-weight common-crawl).

    Groups absent from ``rates`` get ``default_rate`` (0.0 = drop). One
    stateless filter, no shuffle; group skew is irrelevant because nothing
    aggregates. Rates > 1 mean "keep all" (sampling cannot up-sample;
    pair with an explode-based repeat if true epoch weighting is needed).
    """
    hexv = uniform_hex(key_cols, seed)
    thr = None
    for name, rate in rates.items():
        cond = F.col(group_col) == F.lit(name)
        t = F.lit(threshold_hex(rate))
        thr = F.when(cond, t) if thr is None else thr.when(cond, t)
    thr = (
        F.lit(threshold_hex(default_rate))
        if thr is None
        else thr.otherwise(F.lit(threshold_hex(default_rate)))
    )
    return df.where(hexv < thr)


_TEMP_GRID = 4096  # 3 hex digits: rate resolution 1/4096 ≈ 0.02 %


def temperature_rates(
    df: DataFrame,
    group_col: str,
    alpha: float = 0.5,
    grid: int = _TEMP_GRID,
) -> DataFrame:
    """Per-group keep-rate table for temperature-scaled corpus mixing
    (multilingual-LM sampling à la mBERT/XLM-R: sample groups with
    probability ∝ n_g^α, α<1 flattening the head so low-resource
    languages aren't drowned; Conneau 2020 §3.1 uses α∈[0.3, 0.7]).

    Realized as per-group *down-sampling* rates normalized so the
    smallest group keeps everything: rate_g = (n_min/n_g)^(1-α). The
    rate is quantized to a ``1/grid`` lattice (``t_int = ⌊grid·rate⌋``)
    so the sampling threshold is a short hex literal computable IN-PLAN
    (``format_string('%03x', t_int)``) — the thresholds depend on data
    (group counts), so they cannot be Python-side ``threshold_hex``
    literals like ``source_mix``'s.

    Float-determinism note: for α = 0.5 the rate path is
    ``sqrt(n_min / n_g)`` — one exact integer ratio through IEEE-754
    sqrt, which the standard requires to be *correctly rounded*, so
    Spark and any ANSI oracle produce bit-identical rates and therefore
    identical quantized thresholds. Other α go through ``pow`` (only
    1-ulp-accurate in most libms); they are fine for production but the
    oracle-checked query pins α = 0.5.

    Returns one row per group: ``(group_col, n_g, t_int, target_share)``
    where ``target_share = n_g^α / Σ n^α`` (the mix the α-scaling aims
    for; reporting only — not in the membership path).

    Scale notes: one tiny groupBy (≤ #groups rows) plus unpartitioned
    windows over that tiny frame — the single-partition window is over
    #groups rows (languages/domains: bounded small), never over data.
    """
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("n_g"))
    w = Window.partitionBy()
    weight = (
        F.sqrt(F.col("n_g").cast("double"))
        if alpha == 0.5
        else F.pow(F.col("n_g").cast("double"), F.lit(float(alpha)))
    )
    ratio = F.col("n_min").cast("double") / F.col("n_g").cast("double")
    rate = (
        F.sqrt(ratio)
        if alpha == 0.5
        else F.pow(ratio, F.lit(1.0 - float(alpha)))
    )
    return (
        counts.withColumn("n_min", F.min("n_g").over(w))
        .withColumn("__w", weight)
        .withColumn("target_share", F.col("__w") / F.sum("__w").over(w))
        .withColumn(
            "t_int", F.floor(F.lit(float(grid)) * rate).cast("int")
        )
        .select(group_col, "n_g", "t_int", "target_share")
    )


def temperature_mix(
    df: DataFrame,
    group_col: str,
    key_cols: Sequence[str],
    alpha: float = 0.5,
    seed: str = "",
    grid: int = _TEMP_GRID,
) -> DataFrame:
    """Apply ``temperature_rates``: keep each row iff its content-hash
    uniform falls under its group's quantized threshold. The rate table
    is broadcast (≤ #groups rows); the predicate is a stateless
    scan-stage filter exactly like ``source_mix`` — same md5-hex
    uniform, so temperature mixing composes with splits and samples.

    A group at full rate (``t_int ≥ grid``) gets threshold ``'g'``,
    which sorts after every lowercase-hex string — keep-all without a
    hex-width wraparound (same convention as ``threshold_hex``).
    """
    rates = temperature_rates(df, group_col, alpha=alpha, grid=grid)
    hex_digits = len(format(grid - 1, "x"))
    thr = F.when(F.col("t_int") >= F.lit(int(grid)), F.lit("g")).otherwise(
        F.format_string(f"%0{hex_digits}x", F.col("t_int"))
    )
    uni = F.substring(uniform_hex(key_cols, seed), 1, hex_digits)
    return (
        df.join(F.broadcast(rates), group_col)
        .where(uni < thr)
        .select(*df.columns)
    )


def epoch_repeat(
    df: DataFrame,
    weight_col,
    key_cols: Sequence[str],
    seed: str = "",
    out_col: str = "epoch",
) -> DataFrame:
    """True up-sampling for epoch weighting: repeat each row
    ``floor(w)`` times plus one more with probability ``frac(w)`` —
    decided by the row's content hash, so the realized corpus is
    deterministic and partitioning-independent (the other half of the
    mixing story: ``source_mix``/``ranked_quota_sample`` can only keep
    ≤ 1 copy; training recipes up-weight high-quality sources with
    weights like 2.7 epochs). ``weight_col`` is a Column or column name;
    ``out_col`` numbers the copies 0..k-1 so downstream shuffles (e.g.
    packing order keyed on (key, epoch)) spread repeats apart.

    Scale notes: one ``explode(sequence(...))`` — a stateless scan-stage
    fan-out, no shuffle, output size = Σ⌈wᵢ⌉ rows exactly as intended.
    The fractional coin reuses ``uniform_hex``, so it composes with the
    sampling/split operators (a doc's extra copy is as stable as its
    split assignment).
    """
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    w = w.cast("double")
    base = F.floor(w).cast("int")
    frac = w - F.floor(w)
    # extra copy iff hash-uniform < frac. The threshold is per-ROW (frac
    # comes from a column), so compare numerically instead of via the
    # threshold_hex string form (which needs a Python float): the 48-bit
    # uniform parsed to double is exact (< 2^53)
    hex_as_int = F.conv(
        uniform_hex(key_cols, seed), 16, 10
    ).cast("double")
    extra = hex_as_int < frac * F.lit(float(16**_HEX_DIGITS))
    n_copies = base + F.when(extra, 1).otherwise(0)
    return (
        df.withColumn("__n", n_copies)
        .where(F.col("__n") > 0)
        .withColumn(
            out_col,
            F.explode(F.sequence(F.lit(0), F.col("__n") - F.lit(1))),
        )
        .drop("__n")
    )


def ranked_quota_sample(
    df: DataFrame,
    group_col: str,
    key_cols: Sequence[str],
    quotas: DataFrame,
    quota_col: str = "quota",
    seed: str = "",
) -> DataFrame:
    """Exact-k stratified sampling: keep each group's ``quota`` rows with
    the smallest content-hash rank — deterministic (same keep-set on any
    cluster/partitioning), nested (raising a group's quota only *adds*
    rows, the hash order is fixed), and composable with the other hash
    operators through the shared ``uniform_hex`` value.

    ``quotas`` is a (group, quota) table — computed however the mix policy
    dictates (temperature re-weighting, per-language caps, eval-set
    sizes).

    Scale notes: exact-k needs each group's hash order, i.e. one shuffle
    on ``group_col`` and a per-group ranking window — fine for bounded
    strata (languages, sources, eval shards), skew-bound if one group is
    the whole corpus. For rate-shaped mixes over huge groups use
    ``source_mix`` (stateless filter, no shuffle); the two agree in
    expectation with quota = rate × group size.
    """
    w = Window.partitionBy(group_col).orderBy(
        uniform_hex(key_cols, seed), *[F.col(c) for c in key_cols]
    )
    return (
        df.join(
            quotas.select(group_col, quota_col), group_col
        )
        .withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= F.col(quota_col))
        .drop("__rk", quota_col)
    )


def weighted_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    key_cols: Sequence[str],
    group_cols: Sequence[str] = (),
    seed: str = "",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (exact k per
    group): the Efraimidis-Spirakis A-ES scheme — each row draws the
    content-keyed uniform ``u`` (same ``uniform_hex`` value as every
    other hash operator) and the k rows with the largest ``u^(1/w)``
    win, computed in the numerically-stable form ``ln(u)/w`` (monotone
    equivalent). Inclusion probability is proportional to weight, the
    keep-set is identical on any cluster layout, and the same
    seed+keys compose with :func:`hash_sample` nesting.

    Rows with ``weight <= 0`` or NULL are never sampled (dropped before
    ranking). Ties are broken by ``key_cols``, making membership total.

    100 TB design: one shuffle on ``group_cols`` + a per-group top-k
    rank — the `ranked_quota_sample` shape; the ln/division are
    scan-stage expressions. Float caveat: membership only flips if the
    rank-k/k+1 gap is inside cross-engine libm noise (~1e-15 relative);
    the q123 margin test probes the fixture's boundary gaps ≥ 1e-9.
    """
    groups = list(group_cols)
    h = F.conv(uniform_hex(key_cols, seed), 16, 10).cast("bigint")
    u = (h + F.lit(1)).cast("double") / F.lit(float(16**_HEX_DIGITS))
    es_key = F.log(u) / F.col(weight_col).cast("double")
    w = Window.partitionBy(*groups).orderBy(
        F.col("__es").desc(), *[F.col(c) for c in key_cols]
    )
    return (
        df.where(
            F.col(weight_col).isNotNull() & (F.col(weight_col) > 0)
        )
        .withColumn("__es", es_key)
        .withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= k)
        .drop("__es", "__rk")
    )


def shard_assign(
    df: DataFrame,
    n_shards: int,
    key_cols: Sequence[str],
    seed: str = "",
    out_col: str = "shard",
) -> DataFrame:
    """Deterministic shard assignment for materializing a training set:
    ``shard = hash48(seed | key) mod n_shards`` — a pure function of the
    row key, so re-runs and retries place every document in the same
    shard (the idempotent-build property; ``repartition`` round-robin
    does NOT have it). Write with ``partitionBy(out_col)`` to get one
    directory per shard; the md5 arithmetic is the same as the sampling
    primitives, so an oracle can replay assignments exactly.

    100 TB design: a stateless scan-stage expression; balance follows
    from the hash (expected skew ~ 1/sqrt(docs per shard)) — audit it
    with a shard-count aggregation (q148) rather than trusting it."""
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    h = (
        F.conv(uniform_hex(key_cols, seed), 16, 10).cast("bigint")
        % F.lit(int(n_shards))
    )
    return df.withColumn(out_col, h.cast("int"))


def curriculum_phases(
    df: DataFrame,
    score_col: str,
    token_col: str,
    n_phases: int = 4,
) -> DataFrame:
    """Curriculum schedule assembly: bucket the corpus into ``n_phases``
    quality tiers (phase 1 = highest scores, trained first — the
    data-curriculum recipe of filtering-then-annealing pipelines) and
    emit the per-phase schedule ``(phase, n_docs, n_tokens, cum_tokens,
    score_lo, score_hi)`` with cumulative token counts in training
    order. Phase assignment is by NEAREST-RANK quantile of the score
    distribution: docs sharing a (6-decimal-rounded) score always share
    a phase, so the split is deterministic and engine-replayable — no
    tie-splitting by row position.

    100 TB design: one map-side-combined groupBy collapses the corpus
    to its DISTINCT-SCORE table (bounded cardinality — scores are
    rounded); the cumulative rank runs over that tiny table and
    broadcast-joins back as a scan-stage phase stamp. No global sort of
    the corpus, no single-partition window over data-sized input — the
    classic NTILE formulation (global ordered window) is exactly what
    this avoids.
    """
    if n_phases < 1:
        raise ValueError("n_phases must be >= 1")
    s = F.round(F.col(score_col), 6)
    per_score = df.groupBy(s.alias("__s")).agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(F.col(token_col)).alias("__toks"),
    )
    w = Window.orderBy(F.desc("__s")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    total = per_score.agg(F.sum("__n").alias("__N")).first()["__N"]
    if total is None:  # empty input -> empty schedule, not a crash
        return df.sparkSession.createDataFrame(
            [],
            "phase int, n_docs bigint, n_tokens bigint, "
            "cum_tokens bigint, score_lo double, score_hi double",
        )
    phased = per_score.withColumn(
        "phase",
        F.least(
            F.lit(int(n_phases)),
            F.ceil(
                F.sum("__n").over(w)
                * F.lit(int(n_phases))
                / F.lit(float(total))
            ).cast("int"),
        ),
    )
    sched = (
        phased.groupBy("phase")
        .agg(
            F.sum("__n").alias("n_docs"),
            F.sum("__toks").alias("n_tokens"),
            F.min("__s").alias("score_lo"),
            F.max("__s").alias("score_hi"),
        )
    )
    wp = Window.orderBy("phase").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return sched.select(
        "phase",
        "n_docs",
        "n_tokens",
        F.sum("n_tokens").over(wp).alias("cum_tokens"),
        "score_lo",
        "score_hi",
    )


def score_tiers(
    df: DataFrame,
    score_col: str,
    n_tiers: int = 3,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Stamp every row with its nearest-rank score tier (1 = highest
    scores) computed *within each group* — the per-language head/middle/
    tail split of CCNet's perplexity bucketing (Wenzek 2020 §3.3) when
    called with ``n_tiers=3, group_cols=("lang",)``.

    Same determinism discipline as ``curriculum_phases``: tiering runs
    over each group's DISTINCT 6-decimal-rounded score table, so docs
    sharing a rounded score always share a tier — no row-position
    tie-splitting, and the cumulative-rank arithmetic
    (``ceil(cum·n/N)`` with one exact-integer product and one double
    division) replays bit-identically in any ANSI engine.

    100 TB design: one map-side-combined groupBy collapses data to the
    per-group distinct-score table (bounded: scores are rounded), the
    rank windows run over that tiny table only, and the tier stamp
    broadcast-joins back into the scan stage. No global sort, no
    data-sized window — NTILE's classic formulation is what this avoids.
    """
    if n_tiers < 1:
        raise ValueError("n_tiers must be >= 1")
    gcols = list(group_cols)
    s = F.round(F.col(score_col), 6)
    per_score = df.groupBy(*gcols, s.alias("__s")).agg(
        F.count(F.lit(1)).alias("__n")
    )
    w_cum = (
        Window.partitionBy(*gcols)
        .orderBy(F.desc("__s"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(*gcols)
    tiers = per_score.select(
        *gcols,
        "__s",
        F.least(
            F.lit(int(n_tiers)),
            F.ceil(
                F.sum("__n").over(w_cum)
                * F.lit(int(n_tiers))
                / F.sum("__n").over(w_all).cast("double")
            ).cast("int"),
        ).alias("tier"),
    )
    return (
        df.withColumn("__s", s)
        .join(F.broadcast(tiers), [*gcols, "__s"])
        .drop("__s")
    )


def apportion_budget(
    counts: DataFrame,
    group_col: str,
    weight_col: str,
    budget: int,
) -> DataFrame:
    """Largest-remainder (Hamilton) apportionment of an integer token
    budget across groups proportional to integer weights: the exact
    "how many tokens does each source contribute to this training run"
    allocation. Every group gets ``floor(budget·w/T)``; the
    ``budget − Σfloor`` leftover units go one each to the groups with
    the largest remainders (``(budget·w) mod T``, ties to the smaller
    group key), so ``Σ alloc == budget`` exactly and no group deviates
    from its ideal share by ≥ 1 token.

    Everything is INTEGER arithmetic (``div``/``%`` on BIGINT) — no
    float shares, so Spark and any ANSI oracle agree bit-for-bit with
    no rounding contract. Overflow bound: ``budget · max(w)`` must fit
    in int64 (switch to DECIMAL(38,0) beyond ~9.2e18 — at a 1e12-token
    corpus that caps budget around 9e6 × mean weight, plenty for share
    tables).

    Scale notes: ``counts`` is the per-group weight table (≤ #groups
    rows — languages/sources/domains: bounded small); every window here
    runs single-partition over that tiny frame, never over data.
    """
    b = F.lit(int(budget)).cast("long")
    w_all = Window.partitionBy()
    total = F.sum(F.col(weight_col).cast("long")).over(w_all)
    prod = b * F.col(weight_col).cast("long")
    with_floor = counts.select(
        group_col,
        weight_col,
        F.when(total > 0, prod).alias("__num"),
        F.when(total > 0, prod % total).alias("__rem"),
        total.alias("__tot"),
    ).withColumn(
        # integral `div`, not double `/`: exact over the full int64 range
        "__floor",
        F.expr("__num div __tot"),
    )
    w_rank = Window.partitionBy().orderBy(
        F.desc("__rem"), F.asc(group_col)
    )
    leftover = b - F.sum("__floor").over(w_all)
    return (
        with_floor.withColumn("__rk", F.row_number().over(w_rank))
        .select(
            group_col,
            weight_col,
            (
                F.col("__floor")
                + (F.col("__rk") <= leftover).cast("long")
            ).alias("alloc"),
            (F.col("__rk") <= leftover).cast("int").alias("bonus"),
        )
    )
