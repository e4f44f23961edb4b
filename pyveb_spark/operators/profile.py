"""Single-pass table profiling — per-column stats for data-quality gates.

The reference has no profiling analogue (its closest habit is ad-hoc
``printSchema``/``show`` in notebooks, ``local.ipynb``); every production
ETL needs the numbers before a load: row count, null counts, cardinality,
value ranges. One Spark job produces them for every column at once.

100 TB design: the whole profile is ONE aggregation over ONE scan — all
per-column measures are parallel agg expressions with map-side partials,
so cost is a single pass regardless of column count. Exact distinct counts
use Spark's multi-distinct Expand (rows × #distinct-aggs intermediate); at
warehouse scale flip ``exact=False`` for HLL ``approx_count_distinct``
(±2.3% default rsd, no Expand) — the same mergeable-sketch pattern as
``operators.sketches``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "profile_table",
    "column_histogram",
    "zscore_outliers",
    "iqr_outliers",
    "key_skew_profile",
    "quantile_bins",
    "pairwise_correlations",
    "binary_auc",
    "fk_orphan_stats",
    "calibration_curve",
    "mutual_information",
    "correlation_pca",
    "pr_curve",
    "reconcile_tables",
    "ab_proportion_test",
    "winsorize",
    "validate_expectations",
    "k_anonymity",
    "embedding_drift",
]


def profile_table(
    df: DataFrame,
    columns: Sequence[str] | None = None,
    exact: bool = True,
) -> DataFrame:
    """Profile ``columns`` (default: all) in one aggregation pass.

    Returns one row per column: ``(col_name, data_type, n_rows,
    n_nonnull, n_nulls, n_distinct, min_value, max_value)`` with min/max
    rendered as strings so the schema is uniform across column types.
    ``n_distinct`` counts distinct non-null values — exact by default,
    HLL-approximate with ``exact=False``.
    """
    cols = list(columns) if columns is not None else list(df.columns)
    dtypes = dict(df.dtypes)
    missing = [c for c in cols if c not in dtypes]
    if missing:
        raise ValueError(f"columns not in DataFrame: {missing}")

    distinct_of = (
        (lambda c: F.count_distinct(F.col(c)))
        if exact
        else (lambda c: F.approx_count_distinct(F.col(c)))
    )
    aggs = [F.count(F.lit(1)).alias("__n_rows")]
    for c in cols:
        aggs += [
            F.count(F.col(c)).alias(f"__nn__{c}"),
            distinct_of(c).alias(f"__nd__{c}"),
            F.min(F.col(c)).cast("string").alias(f"__min__{c}"),
            F.max(F.col(c)).cast("string").alias(f"__max__{c}"),
        ]
    row = df.agg(*aggs)
    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.lit(dtypes[c]).alias("data_type"),
                F.col("__n_rows").alias("n_rows"),
                F.col(f"__nn__{c}").alias("n_nonnull"),
                (F.col("__n_rows") - F.col(f"__nn__{c}")).alias("n_nulls"),
                F.col(f"__nd__{c}").alias("n_distinct"),
                F.col(f"__min__{c}").alias("min_value"),
                F.col(f"__max__{c}").alias("max_value"),
            )
            for c in cols
        ]
    )
    return row.select(F.explode(per_col).alias("p")).select("p.*")


def column_histogram(
    df: DataFrame,
    col: str,
    n_bins: int = 20,
    lo: float | None = None,
    hi: float | None = None,
) -> DataFrame:
    """Equi-width histogram of a numeric column: ``(bin, lo_edge, hi_edge,
    n)``, bins clamped to ``[0, n_bins-1]`` so the max value lands in the
    last bin. Bounds default to the observed min/max (one extra scalar
    aggregation pass); pass them explicitly to histogram a 100 TB column
    in a single scan — binning itself is a stateless scan expression plus
    one k-row shuffle (map-side partial counts), the same shape as any
    groupBy on a low-cardinality derived key. Empty bins are absent from
    the output (join a ``sequence`` spine if you need zeros).

    All edge arithmetic is double and identical in expression order to the
    DuckDB oracle's, so bin assignment is bit-reproducible across engines
    (IEEE ops are deterministic given identical inputs and order).
    """
    if n_bins < 1:
        raise ValueError("n_bins must be >= 1")
    if lo is None or hi is None:
        row = df.agg(
            F.min(F.col(col).cast("double")).alias("lo"),
            F.max(F.col(col).cast("double")).alias("hi"),
        ).first()
        lo = row["lo"] if lo is None else lo
        hi = row["hi"] if hi is None else hi
    if lo is None or hi is None or not hi > lo:
        raise ValueError(f"degenerate histogram bounds [{lo}, {hi}]")
    width = (hi - lo) / n_bins
    x = F.col(col).cast("double")
    bin_expr = F.least(
        F.greatest(
            F.floor((x - F.lit(lo)) / F.lit(width)).cast("int"), F.lit(0)
        ),
        F.lit(n_bins - 1),
    )
    return (
        df.where(x.isNotNull() & (x >= lo) & (x <= hi))
        .groupBy(bin_expr.alias("bin"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "bin",
            (F.lit(lo) + F.col("bin") * F.lit(width)).alias("lo_edge"),
            (F.lit(lo) + (F.col("bin") + 1) * F.lit(width)).alias("hi_edge"),
            "n",
        )
    )


def zscore_outliers(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str] | None = None,
    z_threshold: float = 3.0,
    precision: str = "decimal(12,2)",
) -> DataFrame:
    """Per-group z-score outlier screen: rows whose value deviates more
    than ``z_threshold`` standard deviations from their group's mean.
    Adds a ``z`` column (signed) to the surviving rows.

    Engine-portable float contract: first and second moments are EXACT
    decimal sums (order-independent, so hash-aggregation order can't
    perturb them); mean/variance/z are then derived in double with one
    fixed expression order — identical inputs + identical IEEE op order =
    identical z on every engine and cluster layout. Variance is clamped
    at a tiny epsilon so constant groups yield z=0-ish instead of NaN.

    100 TB design: one groupBy shuffle of 3 mergeable partials per group,
    then the per-group stats broadcast back over the scan — the second
    pass is shuffle-free. Same shape as any two-pass normalization.
    """
    keys = list(group_cols) if group_cols else []
    dec = F.col(value_col).cast(precision)
    # __n counts NON-NULL values (F.count(dec), not count(*)): F.sum
    # skips NULLs, so a row count would bias the mean toward 0 and could
    # drive sq/n - mean^2 negative for null-bearing columns. The oracle
    # mirrors this with COUNT(value).
    stats = df.groupBy(*keys).agg(
        F.count(dec).alias("__n"),
        F.sum(dec).cast("double").alias("__s"),
        F.sum(dec * dec).cast("double").alias("__sq"),
    )
    joined = (
        df.join(F.broadcast(stats), keys)
        if keys
        else df.crossJoin(F.broadcast(stats))
    )
    mean = F.col("__s") / F.col("__n")
    var = F.greatest(
        F.col("__sq") / F.col("__n") - mean * mean, F.lit(1e-300)
    )
    z = (F.col(value_col) - mean) / F.sqrt(var)
    return (
        joined.withColumn("z", z)
        .where(F.abs(F.col("z")) > z_threshold)
        .drop("__n", "__s", "__sq")
    )


def iqr_outliers(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str] | None = None,
    k: float = 1.5,
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Per-group Tukey-fence outlier screen: rows outside
    ``[q1 - k*IQR, q3 + k*IQR]`` where q1/q3 are DISCRETE quartiles —
    actual data values at sorted positions ``ceil(0.25*n)`` /
    ``ceil(0.75*n)`` — not interpolated. Discrete quantiles are the
    engine-portable choice: every engine sorting the same totally-ordered
    key picks the same element, where interpolation formulas differ.
    ``tiebreak_cols`` extend the sort key to make it total under value
    ties. Robust counterpart of :func:`zscore_outliers` for heavy-tailed
    columns where mean/stddev are themselves dragged by the outliers.

    100 TB design: one window sort per group to rank values, a tiny
    per-group quantile extraction, then the fences broadcast back over
    the scan (second pass shuffle-free — the zscore shape). The full
    per-group sort is the price of EXACT discrete quantiles; at warehouse
    scale substitute approx_percentile partials for the rank pass and
    keep the fence join unchanged.
    """
    from pyspark.sql import Window

    keys = list(group_cols) if group_cols else []
    val = F.col(value_col)
    order = [val.asc(), *[F.col(c).asc() for c in tiebreak_cols]]
    w = Window.partitionBy(*keys).orderBy(*order) if keys else (
        Window.partitionBy().orderBy(*order)
    )
    ranked = df.where(val.isNotNull()).select(
        *keys,
        val.alias("__v"),
        F.row_number().over(w).alias("__rn"),
        F.count(F.lit(1)).over(Window.partitionBy(*keys)).alias("__n"),
    )
    quarts = (
        ranked.where(
            (F.col("__rn") == F.ceil(F.lit(0.25) * F.col("__n")))
            | (F.col("__rn") == F.ceil(F.lit(0.75) * F.col("__n")))
        )
        .groupBy(*keys)
        .agg(
            F.min(F.when(
                F.col("__rn") == F.ceil(F.lit(0.25) * F.col("__n")), F.col("__v")
            )).alias("__q1"),
            F.min(F.when(
                F.col("__rn") == F.ceil(F.lit(0.75) * F.col("__n")), F.col("__v")
            )).alias("__q3"),
        )
    )
    joined = (
        df.join(F.broadcast(quarts), keys)
        if keys
        else df.crossJoin(F.broadcast(quarts))
    )
    iqr = F.col("__q3") - F.col("__q1")
    lo = F.col("__q1") - F.lit(k) * iqr
    hi = F.col("__q3") + F.lit(k) * iqr
    return (
        joined.where(val.isNotNull() & ((val < lo) | (val > hi)))
        .withColumn("fence_lo", lo)
        .withColumn("fence_hi", hi)
        .drop("__q1", "__q3")
    )


def key_skew_profile(
    df: DataFrame,
    keys: Sequence[str],
    percentiles: Sequence[float] = (0.5, 0.9, 0.99),
) -> DataFrame:
    """One-row skew diagnostic for a prospective shuffle/join key: key
    cardinality, row count, max and discrete-percentile per-key counts,
    and the Gini coefficient of the count distribution — the numbers that
    say "salt this join" or "cap that bucket" BEFORE the job falls over.
    Returns ``(n_keys, n_rows, max_n, p50_n, p90_n, p99_n, gini)``.

    Engine-portable: percentiles are DISCRETE order statistics over the
    totally-ordered (count, keys...) sort; the Gini numerator
    ``Σ rank·count`` is an EXACT integer sum, with one fixed-order double
    expression at the end (``2·Σ/(n·S) − (n+1)/n``).

    100 TB design: the groupBy shuffles (key, partial count) rows only;
    the global rank then sorts the COUNTS TABLE, which is key-cardinality
    sized, not row sized — cheap for any key worth joining on (≤ tens of
    millions). For monster cardinalities sample keys or swap the rank
    pass for approx_percentile and skip gini; the alert thresholds don't
    need 3 significant digits."""
    from pyspark.sql import Window

    keys = list(keys)
    counts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("__c"))
    order = [F.col("__c").asc(), *[F.col(k).asc() for k in keys]]
    ranked = counts.select(
        "__c",
        F.row_number().over(Window.partitionBy().orderBy(*order)).alias("__i"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("__n"),
    )
    pct_aggs = [
        F.min(
            F.when(
                F.col("__i") == F.ceil(F.lit(float(p)) * F.col("__n")),
                F.col("__c"),
            )
        ).alias(f"p{int(p * 100)}_n")
        for p in percentiles
    ]
    row = ranked.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("__c").alias("n_rows"),
        F.max("__c").alias("max_n"),
        *pct_aggs,
        F.sum(F.col("__i") * F.col("__c")).alias("__ic"),
    )
    n = F.col("n_keys")
    s = F.col("n_rows")
    gini = (F.lit(2.0) * F.col("__ic")) / (n * s) - (n + F.lit(1.0)) / n
    return row.withColumn("gini", gini).drop("__ic")


def quantile_bins(
    df: DataFrame,
    value_col: str,
    n_bins: int = 10,
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Equal-frequency (quantile) binning: assign each row its
    ``1..n_bins`` bucket by rank over the totally-ordered
    ``(value, tiebreaks...)`` sort — the feature-discretization primitive
    (decile scoring, equal-population histograms, monotonic binning for
    calibration). ``ntile`` semantics are identical across engines on a
    total order (even split, remainder to the leading buckets), so the
    assignment is engine-portable.

    100 TB design: the assignment is ``packing.distributed_ntile`` — a
    range-partitioned prefix count + the closed-form ntile bucket, NOT a
    global ``Window.orderBy`` ntile (a single-task sort at any scale;
    SCALE.md's no-unpartitioned-window rule). Bit-identical buckets to
    the window form on the same total order. For approximate bins at
    extreme scale, bucket by `approx_percentile` edges with
    :func:`column_histogram`-style scan expressions instead.
    """
    from pyveb_spark.operators.packing import distributed_ntile

    return distributed_ntile(
        df.where(F.col(value_col).isNotNull()),
        n_bins,
        [value_col, *tiebreak_cols],
        out_col="bin",
    )


def pairwise_correlations(
    df: DataFrame,
    cols: Sequence[str],
    precision: str = "decimal(18,2)",
) -> DataFrame:
    """Pearson correlation matrix over numeric columns in ONE aggregation
    pass: every moment (n, Σx, Σx², Σxy per pair) is an EXACT decimal sum
    — order-independent, so hash-aggregation layout can't perturb them —
    and each correlation derives in one fixed-order double expression
    ``(nΣxy − ΣxΣy) / (√(nΣx²−(Σx)²) · √(nΣy²−(Σy)²))``. Returns the
    upper triangle as ``(col_a, col_b, corr)`` rows.

    100 TB design: a single scan with map-side partial moments —
    O(k²) agg expressions for k columns, zero extra shuffles. Decimal
    sums bound the row count (Σxy at decimal(38,4) overflows ~1e33);
    beyond that, drop precision or pre-aggregate per partition.
    """
    cols = list(cols)
    if len(cols) < 2:
        raise ValueError("need at least two columns")
    d = {c: F.col(c).cast(precision) for c in cols}
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.append(F.sum(d[c]).cast("double").alias(f"__s_{c}"))
        aggs.append(F.sum(d[c] * d[c]).cast("double").alias(f"__q_{c}"))
    pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i + 1:]]
    for a, b in pairs:
        aggs.append(F.sum(d[a] * d[b]).cast("double").alias(f"__p_{a}_{b}"))
    row = df.agg(*aggs)
    n = F.col("__n").cast("double")

    def corr(a, b):
        num = n * F.col(f"__p_{a}_{b}") - F.col(f"__s_{a}") * F.col(f"__s_{b}")
        va = n * F.col(f"__q_{a}") - F.col(f"__s_{a}") * F.col(f"__s_{a}")
        vb = n * F.col(f"__q_{b}") - F.col(f"__s_{b}") * F.col(f"__s_{b}")
        return num / (F.sqrt(va) * F.sqrt(vb))

    out = F.array(
        *[
            F.struct(
                F.lit(a).alias("col_a"),
                F.lit(b).alias("col_b"),
                corr(a, b).alias("corr"),
            )
            for a, b in pairs
        ]
    )
    return row.select(F.explode(out).alias("r")).select("r.*")


def binary_auc(
    df: DataFrame,
    score_col: str,
    label_col,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """ROC-AUC of a score against a binary label, optionally per group —
    the evaluation primitive for every admission-pipeline classifier
    (quality scorer q27/q103, hashed linear model q61, language-id q85):
    before a threshold goes into the pipeline, this says whether the
    score RANKS good above bad at all. ``label_col`` may be a column name
    or a boolean Column expression. Returns
    ``(group_cols..., n_pos, n_neg, auc)``.

    Computed by the tie-corrected Mann-Whitney U identity on the SCORE
    HISTOGRAM, not on ranked rows: aggregate (pos, neg) counts per
    distinct score, order by score, then
    ``AUC = Σ_s [pos_s · cum_neg_<s + pos_s·neg_s/2] / (P·N)``.
    Integer counts make the numerator exact in every engine; the single
    final division is the only float op.

    100 TB design: one groupBy on (group, score) with map-side partials,
    then a window over the DISTINCT-SCORE table — which is histogram
    sized, not row sized. Row-rank formulations sort the full fact table;
    this sorts only the per-group score dictionary. For continuous scores
    at extreme cardinality, quantize the score first (e.g. round to 1e-4
    — AUC over 10k bins is within ±1e-4 of exact).
    """
    from pyspark.sql import Window

    groups = list(group_cols)
    lab = F.col(label_col) if isinstance(label_col, str) else label_col
    pos = F.when(lab.cast("boolean"), 1).otherwise(0)
    hist = df.groupBy(*groups, F.col(score_col).alias("__s")).agg(
        F.sum(pos).alias("__pos"),
        F.sum(1 - pos).alias("__neg"),
    )
    w = (
        Window.partitionBy(*groups)
        .orderBy("__s")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    contrib = hist.select(
        *groups,
        "__pos",
        "__neg",
        (
            F.col("__pos") * F.coalesce(F.sum("__neg").over(w), F.lit(0))
        ).alias("__below"),
        (F.col("__pos") * F.col("__neg")).alias("__tie"),
    )
    agg = contrib.groupBy(*groups).agg(
        F.sum("__pos").alias("n_pos"),
        F.sum("__neg").alias("n_neg"),
        F.sum("__below").alias("__b"),
        F.sum("__tie").alias("__t"),
    )
    # AUC is undefined for a single-class group (n_pos or n_neg = 0):
    # emit NULL instead of dividing by zero (ANSI mode raises; found by
    # the half-size seed twin, where a small source can be all-English)
    auc = F.when(
        (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
        (F.col("__b").cast("double") + F.col("__t").cast("double") / 2)
        / (F.col("n_pos") * F.col("n_neg")).cast("double"),
    )
    return agg.select(*groups, "n_pos", "n_neg", auc.alias("auc"))


def fk_orphan_stats(checks) -> DataFrame:
    """Referential-integrity audit: for each named foreign-key
    relationship, the row counts that answer "can I join these safely" —
    ``(check_name, n_child, n_null_fk, n_checked, n_orphans,
    orphan_rate)``. ``checks`` is a list of
    ``(name, child_df, child_keys, parent_df, parent_keys)`` tuples.
    NULL foreign keys are counted separately, not as orphans (the SQL
    convention); ``orphan_rate`` = orphans / non-null-FK rows.

    The pre-flight audit for every warehouse load: the reference's
    pipelines assumed upstream integrity and discovered violations as
    silently-shrinking inner joins — this makes the orphan count a
    number a gate can threshold on.

    100 TB design: each check is ONE anti-join on the FK (the upsert
    shuffle shape; AQE broadcasts dimension parents) plus one scalar
    aggregation per side — no row-level output, so the result is
    checks-sized. Orphan SAMPLES for debugging are the same anti-join
    without the count, bounded by a limit.
    """
    frames = []
    for name, child, child_keys, parent, parent_keys in checks:
        child_keys = list(child_keys)
        parent_keys = list(parent_keys)
        nn_pred = F.lit(True)
        for c in child_keys:
            nn_pred = nn_pred & F.col(c).isNotNull()
        nn = child.where(nn_pred)
        pk = parent.select(
            *[
                F.col(p).alias(c)
                for c, p in zip(child_keys, parent_keys)
            ]
        ).distinct()
        orphan_cnt = nn.join(pk, child_keys, "left_anti").agg(
            F.count(F.lit(1)).alias("n_orphans")
        )
        base = child.agg(
            F.count(F.lit(1)).alias("n_child"),
            F.sum(F.when(~nn_pred, 1).otherwise(0)).alias("n_null_fk"),
        )
        frames.append(
            base.crossJoin(F.broadcast(orphan_cnt)).select(
                F.lit(name).alias("check_name"),
                "n_child",
                F.coalesce(F.col("n_null_fk"), F.lit(0)).alias("n_null_fk"),
                (F.col("n_child") - F.coalesce(F.col("n_null_fk"), F.lit(0)))
                .alias("n_checked"),
                "n_orphans",
                (
                    F.col("n_orphans").cast("double")
                    / F.greatest(
                        (
                            F.col("n_child")
                            - F.coalesce(F.col("n_null_fk"), F.lit(0))
                        ).cast("double"),
                        F.lit(1.0),
                    )
                ).alias("orphan_rate"),
            )
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


def calibration_curve(
    df: DataFrame,
    score_col: str,
    label_col,
    n_bins: int = 10,
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Reliability diagram data for a score against a binary outcome:
    equal-population score bins (:func:`quantile_bins` — ntile over a
    total order, engine-portable) with each bin's size, mean score, and
    observed positive rate. AUC (:func:`binary_auc`) says the score
    RANKS; this says whether its VALUES mean what they claim — the
    second half of classifier evaluation before thresholding an
    admission pipeline on it.

    Means/rates are single divisions over exact integer sums (int
    scores) or decimal sums; with genuinely-float scores pass a decimal
    cast upstream. Cost: the quantile_bins global sort (the honest price
    of exact equal-population bins) + one n_bins-sized aggregation.
    """
    lab = F.col(label_col) if isinstance(label_col, str) else label_col
    pos = F.when(lab.cast("boolean"), 1).otherwise(0)
    binned = quantile_bins(df, score_col, n_bins, tiebreak_cols)
    return (
        binned.groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col(score_col).cast("decimal(18,2)"))
            .cast("double")
            .alias("__s"),
            F.sum(pos).alias("n_pos"),
        )
        .select(
            "bin",
            "n",
            (F.col("__s") / F.col("n")).alias("mean_score"),
            "n_pos",
            (F.col("n_pos").cast("double") / F.col("n")).alias("pos_rate"),
        )
    )


def mutual_information(
    df: DataFrame,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Mutual information (nats) between two categorical columns —
    ``MI = Σ_xy p(x,y)·ln(p(x,y)/(p(x)p(y)))`` — the dependence measure
    that catches what Pearson correlation (q106) can't: non-linear and
    non-ordinal association (is `source` informative about `lang`? does
    event type depend on weekday?). Returns one row:
    ``(n, n_x, n_y, n_cells, mi)``.

    Portability: every count is exact; each cell's contribution is one
    fixed-order double expression; and the cross-cell sum — the one
    order-sensitive float reduction — is an ORDERED fold over the
    (x, y)-sorted cell array (the q103/q118 pattern), so the float
    sequence is identical on every engine and layout.

    100 TB design: one (x,y) groupBy of the scan (map-side partials);
    marginals are aggregations of the CELL table. The fold collects
    |X|·|Y| cells into one row — categorical cardinalities only; for
    high-cardinality pairs, bucket first (MI is estimated on bins
    anyway).
    """
    joint = df.groupBy(
        F.col(x_col).alias("__x"), F.col(y_col).alias("__y")
    ).agg(F.count(F.lit(1)).alias("__c"))
    mx = joint.groupBy("__x").agg(F.sum("__c").alias("__cx"))
    my = joint.groupBy("__y").agg(F.sum("__c").alias("__cy"))
    n = joint.agg(F.sum("__c").alias("__n"))
    cells = (
        joint.join(F.broadcast(mx), "__x")
        .join(F.broadcast(my), "__y")
        .crossJoin(F.broadcast(n))
        .select(
            "__x",
            "__y",
            "__n",
            (
                (F.col("__c").cast("double") / F.col("__n"))
                * F.log(
                    F.col("__c").cast("double")
                    * F.col("__n").cast("double")
                    / (
                        F.col("__cx").cast("double")
                        * F.col("__cy").cast("double")
                    )
                )
            ).alias("__mi"),
        )
    )
    folded = cells.groupBy("__n").agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.count_distinct("__x").alias("n_x"),
        F.count_distinct("__y").alias("n_y"),
        F.aggregate(
            F.array_sort(
                F.collect_list(F.struct("__x", "__y", "__mi"))
            ),
            F.lit(0.0),
            lambda acc, s: acc + s["__mi"],
        ).alias("mi"),
    )
    return folded.select(
        F.col("__n").alias("n"), "n_x", "n_y", "n_cells", "mi"
    )


def correlation_pca(
    df: DataFrame,
    cols: Sequence[str],
    iters: int = 3,
    precision: str = "decimal(18,2)",
) -> DataFrame:
    """First principal component of the STANDARDIZED columns — power
    iteration on the correlation matrix. Returns one row:
    ``(n, eigenvalue, loading_<col>...)``; the eigenvalue (of k total)
    is the variance share the component explains, the loadings are the
    axis every "which measures move together" question projects onto.

    The 100 TB architecture point: the DATA sees exactly ONE pass — the
    same exact-decimal moment aggregation as :func:`pairwise_correlations`
    — and the eigen-solve runs on the k×k MODEL as a fixed chain of
    column expressions (no collect, no second scan, k ≤ dozens). Power
    iteration and the Rayleigh quotient are built with explicit
    left-to-right association, every moment is an order-independent
    decimal sum, so the whole result is bit-reproducible and the DuckDB
    oracle replays it CTE-for-CTE. Sign convention: the first loading is
    made non-negative (eigenvectors are sign-ambiguous).
    """
    cols = list(cols)
    k = len(cols)
    if k < 2:
        raise ValueError("need at least two columns")
    d = {c: F.col(c).cast(precision) for c in cols}
    aggs = [F.count(F.lit(1)).alias("n")]
    for c in cols:
        aggs.append(F.sum(d[c]).cast("double").alias(f"s_{c}"))
        aggs.append(F.sum(d[c] * d[c]).cast("double").alias(f"q_{c}"))
    for i, a in enumerate(cols):
        for b in cols[i + 1:]:
            aggs.append(F.sum(d[a] * d[b]).cast("double").alias(f"p_{a}_{b}"))
    row = df.agg(*aggs)

    n = F.col("n").cast("double")

    def corr(a: str, b: str):
        if a == b:
            return F.lit(1.0)
        lo, hi = (a, b) if cols.index(a) < cols.index(b) else (b, a)
        num = n * F.col(f"p_{lo}_{hi}") - F.col(f"s_{lo}") * F.col(f"s_{hi}")
        va = n * F.col(f"q_{lo}") - F.col(f"s_{lo}") * F.col(f"s_{lo}")
        vb = n * F.col(f"q_{hi}") - F.col(f"s_{hi}") * F.col(f"s_{hi}")
        return num / (F.sqrt(va) * F.sqrt(vb))

    # materialize the k×k matrix once, then iterate on aliased columns so
    # the expression tree stays linear in iters (not exponential)
    m_cols = [
        corr(a, b).alias(f"m_{i}_{j}")
        for i, a in enumerate(cols)
        for j, b in enumerate(cols)
    ]
    import math

    cur = row.select(
        "n", *m_cols,
        *[F.lit(1.0 / math.sqrt(k)).alias(f"v_{i}") for i in range(k)],
    )

    def matvec(prefix: str):
        out = []
        for i in range(k):
            e = F.col(f"m_{i}_0") * F.col(f"{prefix}_0")
            for j in range(1, k):
                e = e + F.col(f"m_{i}_{j}") * F.col(f"{prefix}_{j}")
            out.append(e.alias(f"w_{i}"))
        return out

    passthru = ["n", *[f"m_{i}_{j}" for i in range(k) for j in range(k)]]
    for _ in range(iters):
        cur = cur.select(*passthru, *matvec("v"))
        norm2 = F.col("w_0") * F.col("w_0")
        for i in range(1, k):
            norm2 = norm2 + F.col(f"w_{i}") * F.col(f"w_{i}")
        cur = cur.select(
            *passthru,
            F.sqrt(norm2).alias("nrm"),
            *[F.col(f"w_{i}") for i in range(k)],
        ).select(
            *passthru,
            *[
                (F.col(f"w_{i}") / F.col("nrm")).alias(f"v_{i}")
                for i in range(k)
            ],
        )
    # Rayleigh quotient λ = vᵀ(Mv), then the sign convention
    cur = cur.select(*passthru, *[F.col(f"v_{i}") for i in range(k)])
    cur = cur.select(
        "n", *[F.col(f"v_{i}") for i in range(k)], *matvec("v")
    )
    lam = F.col("v_0") * F.col("w_0")
    for i in range(1, k):
        lam = lam + F.col(f"v_{i}") * F.col(f"w_{i}")
    sign = F.when(F.col("v_0") < 0, F.lit(-1.0)).otherwise(F.lit(1.0))
    return cur.select(
        "n",
        lam.alias("eigenvalue"),
        *[
            (sign * F.col(f"v_{i}")).alias(f"loading_{c}")
            for i, c in enumerate(cols)
        ],
    )


def pr_curve(
    df: DataFrame,
    score_col: str,
    label_col,
) -> DataFrame:
    """Full precision/recall curve of a score against a binary label —
    one row per DISTINCT score value, treating it as the admission
    threshold (``score >= t`` predicts positive): ``(threshold, n_pred,
    tp, precision, recall, f1)``. The threshold-picking table that
    completes the eval family: AUC (:func:`binary_auc`) ranks,
    calibration (:func:`calibration_curve`) checks values, this says
    what each cut actually costs.

    Same scale shape as AUC: one (score) groupBy of the scan with
    map-side partials, then a cumulative window DOWN the distinct-score
    table (histogram-sized, never row-sized). Counts are exact integers;
    precision/recall are single divisions; f1 is one fixed-order
    expression over them. Quantize continuous scores first at extreme
    cardinality (the binary_auc note).
    """
    from pyspark.sql import Window

    lab = F.col(label_col) if isinstance(label_col, str) else label_col
    pos = F.when(lab.cast("boolean"), 1).otherwise(0)
    hist = df.groupBy(F.col(score_col).alias("threshold")).agg(
        F.sum(pos).alias("__pos"),
        F.count(F.lit(1)).alias("__n"),
    )
    w = (
        Window.partitionBy()
        .orderBy(F.col("threshold").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    total_pos = Window.partitionBy()
    cum = hist.select(
        "threshold",
        F.sum("__n").over(w).alias("n_pred"),
        F.sum("__pos").over(w).alias("tp"),
        F.sum("__pos").over(total_pos).alias("__p"),
    )
    precision = F.col("tp").cast("double") / F.col("n_pred").cast("double")
    recall = F.col("tp").cast("double") / F.col("__p").cast("double")
    return cum.select(
        "threshold",
        "n_pred",
        "tp",
        precision.alias("precision"),
        recall.alias("recall"),
        (
            F.lit(2.0)
            * (precision * recall)
            / (precision + recall + F.lit(1e-300))
        ).alias("f1"),
    )


def reconcile_tables(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Column-level reconciliation of two keyed tables — the daily
    "do the two systems agree" report that :func:`~pyveb_spark.sinks.
    merge.snapshot_diff` summarizes at row level, broken down per
    column: ``(column, n_left, n_right, n_both, n_only_left,
    n_only_right, n_equal, n_diff, match_rate)``. Equality is
    NULL-safe; ``match_rate`` = equal / both (single integer division).

    The reconciliation every migration/dual-write/backfill signs off
    on: "99.98% of rows match except `status`, which diverges on 4k
    rows" is this output verbatim.

    100 TB design: ONE full-outer join on the keys, then a single
    aggregation with one (equal, diff) expression pair per column —
    map-side partials, column-count output rows, no per-column joins.
    """
    keys = list(keys)
    compare = list(compare_cols) if compare_cols else [
        c for c in left.columns if c not in keys and c in right.columns
    ]
    l = left.select(
        *keys,
        F.lit(True).alias("__l"),
        *[F.col(c).alias(f"__l_{c}") for c in compare],
    )
    r = right.select(
        *keys,
        F.lit(True).alias("__r"),
        *[F.col(c).alias(f"__r_{c}") for c in compare],
    )
    j = l.join(r, keys, "full_outer")
    both = F.col("__l").isNotNull() & F.col("__r").isNotNull()
    aggs = [
        F.sum(F.when(F.col("__l").isNotNull(), 1).otherwise(0)).alias("nl"),
        F.sum(F.when(F.col("__r").isNotNull(), 1).otherwise(0)).alias("nr"),
        F.sum(F.when(both, 1).otherwise(0)).alias("nb"),
    ]
    for c in compare:
        eq = F.col(f"__l_{c}").eqNullSafe(F.col(f"__r_{c}"))
        aggs.append(
            F.sum(F.when(both & eq, 1).otherwise(0)).alias(f"eq_{c}")
        )
    row = j.agg(*aggs)
    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col("nl").alias("n_left"),
                F.col("nr").alias("n_right"),
                F.col("nb").alias("n_both"),
                (F.col("nl") - F.col("nb")).alias("n_only_left"),
                (F.col("nr") - F.col("nb")).alias("n_only_right"),
                F.col(f"eq_{c}").alias("n_equal"),
                (F.col("nb") - F.col(f"eq_{c}")).alias("n_diff"),
                (
                    F.col(f"eq_{c}").cast("double")
                    / F.greatest(F.col("nb").cast("double"), F.lit(1.0))
                ).alias("match_rate"),
            )
            for c in compare
        ]
    )
    return row.select(F.explode(per_col).alias("p")).select("p.*")


def ab_proportion_test(
    df: DataFrame,
    variant_col: str,
    success_col,
    group_cols: Sequence[str] = (),
    variant_a: str = "a",
    variant_b: str = "b",
) -> DataFrame:
    """Two-proportion z-test between two experiment variants — the A/B
    readout: per group, each variant's trials and successes, the rate
    difference, the pooled-variance z statistic
    ``(p_b - p_a) / √(p̂(1-p̂)(1/n_a + 1/n_b))`` and |z| (compare to
    1.96 for 95%). ``success_col`` may be a column name or boolean
    Column. Returns ``(group_cols..., n_a, x_a, n_b, x_b, rate_a,
    rate_b, diff, z)``.

    Counts are exact integers; rates/z derive in one fixed expression
    order, so the statistic is engine-identical. One aggregation over
    the scan (conditional partials per variant) — no joins, no window;
    output is group-count rows.
    """
    suc = (
        F.col(success_col) if isinstance(success_col, str) else success_col
    )
    s = F.when(suc.cast("boolean"), 1).otherwise(0)
    is_a = F.col(variant_col) == variant_a
    is_b = F.col(variant_col) == variant_b
    groups = list(group_cols)
    agg = df.where(is_a | is_b).groupBy(*groups).agg(
        F.sum(F.when(is_a, 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(is_a, s).otherwise(0)).alias("x_a"),
        F.sum(F.when(is_b, 1).otherwise(0)).alias("n_b"),
        F.sum(F.when(is_b, s).otherwise(0)).alias("x_b"),
    )
    na, xa = F.col("n_a").cast("double"), F.col("x_a").cast("double")
    nb, xb = F.col("n_b").cast("double"), F.col("x_b").cast("double")
    # guarded: an empty variant makes the rate undefined, and a pooled
    # rate of exactly 0 or 1 makes se = 0 — both are NULL, not a
    # divide-by-zero (ANSI mode raises; found by the half-size seed
    # twin, where nobody reaches the conversion threshold)
    pa = F.when(F.col("n_a") > 0, xa / na)
    pb = F.when(F.col("n_b") > 0, xb / nb)
    both = (F.col("n_a") > 0) & (F.col("n_b") > 0)
    informative = both & (
        F.col("x_a") + F.col("x_b") > 0
    ) & (F.col("x_a") + F.col("x_b") < F.col("n_a") + F.col("n_b"))
    pooled = (xa + xb) / (na + nb)
    se = F.sqrt(
        pooled * (F.lit(1.0) - pooled) * (F.lit(1.0) / na + F.lit(1.0) / nb)
    )
    z = F.when(informative, (pb - pa) / se)
    return agg.select(
        *groups, "n_a", "x_a", "n_b", "x_b",
        pa.alias("rate_a"), pb.alias("rate_b"),
        F.when(both, pb - pa).alias("diff"), z.alias("z"),
    )


def winsorize(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str] = (),
    lo_pct: int = 5,
    hi_pct: int = 95,
    out_col: str | None = None,
) -> DataFrame:
    """Winsorize (percentile-clip) ``value_col`` at per-group NEAREST-RANK
    (type-1) quantiles — the robust-statistics treatment for heavy-tailed
    measures before averaging or model features. The p-th bound is the
    ``ceil(n·p/100)``-th smallest non-null value, computed with INTEGER
    arithmetic (``(n·p + 99) div 100``), so the bounds are exact data
    values and the whole operator is engine-replayable bit-for-bit — no
    interpolation formula whose float evaluation order could differ
    between engines. NULLs pass through unclipped (and are excluded from
    the ranks). Adds ``out_col`` (default ``{value_col}_winsorized``)
    plus the group's ``__lo``/``__hi`` bounds for auditability.

    100 TB design: bounds need a per-group sort — one row_number window
    keyed on the group (the q06 top-n shape, spill-safe), filtered to
    exactly two ranks per group, re-aggregated to a group-count-sized
    bounds table that broadcast-joins back onto a scan-stage clip. No
    driver-side state; swap in ``approx_percentile`` when rank exactness
    stops being worth the sort."""
    from pyspark.sql import Window

    out_col = out_col or f"{value_col}_winsorized"
    v = F.col(value_col).cast("double")
    gcols = [F.col(c) for c in group_cols]
    w_rank = Window.partitionBy(*gcols).orderBy(v)
    w_all = (
        Window.partitionBy(*gcols)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    ranked = df.where(v.isNotNull()).select(
        *gcols,
        v.alias("__v"),
        F.row_number().over(w_rank).alias("__rn"),
        F.count(F.lit(1)).over(w_all).alias("__n"),
    )
    k_lo = ((F.col("__n") * lo_pct + 99) / 100).cast("bigint")
    k_hi = ((F.col("__n") * hi_pct + 99) / 100).cast("bigint")
    bounds = (
        ranked.where((F.col("__rn") == k_lo) | (F.col("__rn") == k_hi))
        .groupBy(*gcols)
        .agg(
            F.min("__v").alias("__lo"),
            F.max("__v").alias("__hi"),
        )
    )
    # LEFT join: a group whose values are all NULL has no bounds row —
    # its rows must pass through unclipped, not silently drop. The
    # ungrouped path joins on a constant key for the same reason: a
    # crossJoin against an EMPTY bounds table would drop every row.
    if group_cols:
        joined = df.join(F.broadcast(bounds), list(group_cols), "left")
    else:
        joined = df.withColumn("__k", F.lit(1)).join(
            F.broadcast(bounds.withColumn("__k", F.lit(1))), "__k", "left"
        ).drop("__k")
    return joined.withColumn(
        out_col,
        F.when(v < F.col("__lo"), F.col("__lo"))
        .when(v > F.col("__hi"), F.col("__hi"))
        .otherwise(v),
    )


def validate_expectations(
    df: DataFrame,
    expectations: Sequence[tuple],
) -> DataFrame:
    """Declarative data-quality expectation suite evaluated in ONE
    aggregation pass (the Great Expectations / dbt-test shape, in-engine).
    ``expectations`` is a list of rules:

    - ``("not_null", col)`` — no NULLs in ``col``
    - ``("unique", col)`` — no duplicate non-null values in ``col``
    - ``("accepted_values", col, [v, …])`` — every non-null value ∈ set
    - ``("between", col, lo, hi)`` — every non-null value in [lo, hi]
    - ``("row_count_between", lo, hi)`` — table size bounds

    Returns one row per rule: ``(rule, column, n_violations, passed)``.

    100 TB design: every rule compiles to a conditional-count agg
    expression over the SAME single scan (uniqueness adds a distinct
    count — Spark's multi-distinct Expand; the profiler's ``exact=False``
    HLL trade applies). No per-rule jobs, no driver loops — adding a
    50th rule costs one more agg expression."""
    aggs = []
    meta: list[tuple[str, str]] = []
    n_rows = F.count(F.lit(1))
    for idx, rule in enumerate(expectations):
        kind = rule[0]
        a = f"__e{idx}"
        if kind == "not_null":
            _, col = rule
            aggs.append(
                F.coalesce(
                    F.sum(F.when(F.col(col).isNull(), 1).otherwise(0)),
                    F.lit(0),
                ).alias(a)
            )
            meta.append((kind, col))
        elif kind == "unique":
            _, col = rule
            aggs.append(
                (
                    F.count(F.col(col)) - F.count_distinct(F.col(col))
                ).alias(a)
            )
            meta.append((kind, col))
        elif kind == "accepted_values":
            _, col, vals = rule
            aggs.append(
                F.coalesce(
                    F.sum(
                        F.when(
                            F.col(col).isNotNull()
                            & ~F.col(col).isin(*list(vals)),
                            1,
                        ).otherwise(0)
                    ),
                    F.lit(0),
                ).alias(a)
            )
            meta.append((kind, col))
        elif kind == "between":
            _, col, lo, hi = rule
            aggs.append(
                F.coalesce(
                    F.sum(
                        F.when(
                            F.col(col).isNotNull()
                            & (
                                (F.col(col) < F.lit(lo))
                                | (F.col(col) > F.lit(hi))
                            ),
                            1,
                        ).otherwise(0)
                    ),
                    F.lit(0),
                ).alias(a)
            )
            meta.append((kind, col))
        elif kind == "row_count_between":
            _, lo, hi = rule
            aggs.append(
                F.when(
                    (n_rows >= F.lit(int(lo))) & (n_rows <= F.lit(int(hi))),
                    F.lit(0),
                )
                .otherwise(F.lit(1))
                .alias(a)
            )
            meta.append((kind, "*"))
        else:
            raise ValueError(f"unknown expectation kind: {kind!r}")
    wide = df.agg(*aggs)
    rows = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(kind).alias("rule"),
                    F.lit(col).alias("column"),
                    F.col(f"__e{idx}")
                    .cast("bigint")
                    .alias("n_violations"),
                )
                for idx, (kind, col) in enumerate(meta)
            ]
        )
    ).alias("r")
    return wide.select(rows).select(
        "r.rule",
        "r.column",
        "r.n_violations",
        (F.col("r.n_violations") == 0).alias("passed"),
    )


def k_anonymity(
    df: DataFrame,
    quasi_cols: Sequence[str],
    k: int = 5,
) -> DataFrame:
    """k-anonymity audit (Sweeney 2002): group rows into equivalence
    classes over the quasi-identifier columns and flag classes smaller
    than ``k`` — rows in those classes are re-identifiable by joining
    the quasi-identifiers against an external dataset. Returns the class
    table ``(quasi_cols…, class_size, at_risk)``; aggregate it for the
    release-gate summary, anti-join it against the data to SUPPRESS the
    at-risk rows before publishing.

    NULL quasi-values form their own class (groupBy semantics) — NULL is
    itself an identifying signal, so this is the conservative choice.

    100 TB design: one groupBy shuffle on the quasi-identifier key —
    class count, not row count, bounds the output; the suppression
    anti-join broadcasts the (usually small) at-risk class list back
    over the scan."""
    if k < 1:
        raise ValueError("k must be >= 1")
    return (
        df.groupBy(*[F.col(c) for c in quasi_cols])
        .agg(F.count(F.lit(1)).alias("class_size"))
        .withColumn("at_risk", F.col("class_size") < F.lit(int(k)))
    )


def dp_noisy_counts(
    df: DataFrame,
    group_cols: Sequence[str],
    epsilon: float = 1.0,
    seed: str = "dp",
) -> DataFrame:
    """Differentially-private group-count release (Dwork et al. 2006, the
    Laplace mechanism): per group, the exact count plus Laplace(1/ε)
    noise — sensitivity 1 for counting queries — released as
    ``noisy_count``. The noise draw is DETERMINISTIC per (group, seed):
    a 48-bit md5-derived uniform ``u`` mapped through the Laplace
    inverse CDF ``-(1/ε)·sign(u-½)·ln(1-2|u-½|)``, so releases are
    reproducible, engine-replayable (the q-level oracle replays the
    identical arithmetic in DuckDB), and fresh seeds give fresh draws.
    Returns ``(group_cols…, exact_count, noisy_count)`` with the noisy
    value rounded to 4 decimals (float ln — module contract).

    Production note: reproducibility makes repeated releases of the SAME
    seed cost ONE epsilon budget (re-publishing an identical draw leaks
    nothing new); changing the seed is what spends budget again.

    100 TB design: one hash aggregation with map-side partials; the
    noise is a scalar expression on the group-count table (group-sized,
    not data-sized). No RNG state crosses executors — the draw is a pure
    function of the group key, which is the only way to do DP noise in a
    distributed, retry-safe job (a task retry with driver-side RNG would
    silently release two different values for one group).
    """
    if not group_cols:
        raise ValueError("dp_noisy_counts requires at least one group col")
    key = F.concat_ws(
        "|",
        F.lit(str(seed)),
        *[F.col(c).cast("string") for c in group_cols],
    )
    u = (
        F.conv(F.substring(F.md5(key.cast("binary")), 1, 12), 16, 10)
        .cast("double")
        / F.lit(float(16**12))
    )
    t = u - F.lit(0.5)
    lap = (
        -F.lit(1.0 / float(epsilon))
        * F.signum(t)
        * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(t))
    )
    return (
        df.groupBy(*[F.col(c) for c in group_cols])
        .agg(F.count(F.lit(1)).alias("exact_count"))
        .select(
            *group_cols,
            "exact_count",
            F.round(F.col("exact_count") + lap, 4).alias("noisy_count"),
        )
    )


def embedding_drift(
    df: DataFrame,
    snapshot_col: str,
    label_col: str = "label",
    vec_col: str = "embedding",
    ref_value: str = "ref",
    cur_value: str = "cur",
) -> DataFrame:
    """Embedding-space drift monitor between two corpus snapshots: per
    label (cluster / domain / class), the population share in each
    snapshot and the COSINE between the two snapshot centroids — the
    table that catches a silently-swapped encoder version or a domain
    mix shift before it poisons retrieval and dedup thresholds
    downstream. Centroid cosine near 1.0 = the region is stable; share
    deltas = the mix moved.

    Scale: one ``posexplode`` pass → per-(label, dim) conditional means
    (map-side combinable, output = labels x dims rows) → per-label
    fold to a cosine. No pairwise anything, no driver collect; cost is
    linear in corpus x dim. Float accumulation differences are buried
    by round(4) per the suite's determinism contract."""
    ex = df.select(
        F.col(label_col).alias("label"),
        F.col(snapshot_col).alias("snap"),
        F.posexplode(F.col(vec_col)).alias("pos", "v"),
    ).withColumn("v", F.col("v").cast("double"))
    is_ref = F.col("snap") == ref_value
    is_cur = F.col("snap") == cur_value
    dims = ex.groupBy("label", "pos").agg(
        F.avg(F.when(is_ref, F.col("v"))).alias("mr"),
        F.avg(F.when(is_cur, F.col("v"))).alias("mc"),
    )
    cent = dims.groupBy("label").agg(
        F.round(
            F.sum(F.col("mr") * F.col("mc"))
            / (
                F.sqrt(F.sum(F.col("mr") * F.col("mr")))
                * F.sqrt(F.sum(F.col("mc") * F.col("mc")))
            ),
            4,
        ).alias("centroid_cos")
    )
    counts = df.groupBy(F.col(label_col).alias("label")).agg(
        F.sum(F.when(F.col(snapshot_col) == ref_value, 1).otherwise(0))
        .cast("bigint")
        .alias("n_ref"),
        F.sum(F.when(F.col(snapshot_col) == cur_value, 1).otherwise(0))
        .cast("bigint")
        .alias("n_cur"),
    )
    from pyspark.sql import Window

    wall = Window.partitionBy()
    shares = counts.select(
        "label",
        "n_ref",
        "n_cur",
        F.round(
            F.col("n_ref").cast("double")
            / F.sum("n_ref").over(wall).cast("double"),
            6,
        ).alias("share_ref"),
        F.round(
            F.col("n_cur").cast("double")
            / F.sum("n_cur").over(wall).cast("double"),
            6,
        ).alias("share_cur"),
    )
    return shares.join(cent, "label")
