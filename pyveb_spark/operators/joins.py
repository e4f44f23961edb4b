"""Join operators beyond the built-in matrix.

Reference parity (SURVEY.md §2.4): the reference's join semantics live in
generated SQL (upsert anti-joins, ``rs_client.py:242-283``), driver-side dict
merges (``common.py:326-354``) and a difflib fuzzy match
(``sharepoint_client.py:121-127``). Here they are first-class distributed
joins. The standard matrix (inner/left/right/full/semi/anti/cross, broadcast
hints) is plain ``df.join`` — exercised in tests and __spark_entry__ queries.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "merge_join",
    "asof_join",
    "range_join",
    "fuzzy_top1_join",
    "fuzzy_pairs_blocked",
    "salted_join",
    "join_size_estimate",
    "broadcast_if_bounded",
    "VOCAB_BROADCAST_CAP_CONF",
    "DEFAULT_VOCAB_BROADCAST_CAP",
]

VOCAB_BROADCAST_CAP_CONF = "spark.pyveb.vocab.broadcastCap"
# ~4M (token, stat) rows ≈ 120 MB hashed relation — comfortably inside a
# normal executor's broadcast budget, far below the 10⁸-10⁹-row unigram
# vocabularies a raw web crawl produces.
DEFAULT_VOCAB_BROADCAST_CAP = 4_000_000


def broadcast_if_bounded(df: DataFrame, n_rows: int | None = None) -> DataFrame:
    """Broadcast hint gated on the configured vocabulary cap
    (``spark.pyveb.vocab.broadcastCap``, default 4M rows): returns
    ``F.broadcast(df)`` only when the table is known to fit, else ``df``
    unchanged so AQE picks the strategy from real runtime sizes.

    On this fixture every token-keyed side table (KL corpus counts, DSIR
    log-ratios, encode vocabularies) is tiny and the hint wins; on a
    100 TB web corpus a whitespace-unigram vocabulary runs 10⁸-10⁹ rows
    and a forced broadcast is a guaranteed driver/executor OOM — the
    classic fixture-tuned-hint failure. Pass ``n_rows`` when the caller
    already knows the table's cardinality (KL and DSIR both compute the
    vocab size ``v`` as a driver constant anyway, so the gate costs no
    extra job): the hint applies iff ``n_rows <= cap``. Without
    ``n_rows`` the hint applies unless the cap is set ``<= 0`` (the
    web-scale deployment switch: disable hints, let AQE decide).

    The complementary mitigation when a vocab-keyed join must stay
    broadcast at scale: prune hapax/low-frequency tokens first (a
    ``HAVING count >= f`` on the vocab aggregation) — Zipf's law puts
    40-60%% of a web vocabulary at frequency 1, so a small floor shrinks
    the table an order of magnitude while barely moving KL/DSIR scores.
    """
    cap = int(
        df.sparkSession.conf.get(
            VOCAB_BROADCAST_CAP_CONF, str(DEFAULT_VOCAB_BROADCAST_CAP)
        )
    )
    if cap <= 0 or (n_rows is not None and int(n_rows) > cap):
        return df
    return F.broadcast(df)


def merge_join(
    left: DataFrame,
    right: DataFrame,
    key: str | Sequence[str],
    how: str = "inner",
    broadcast_right: bool = False,
) -> DataFrame:
    """Enrich ``left`` with ``right``'s columns ↔ ``merge_dicts``
    (``common.py:326-354``) which inner-joined two lists of dicts on the
    driver. ``broadcast_right=True`` for small dimension sides — at 100 TB
    a driver-side dict merge is impossible but a broadcast hash join is free.
    """
    r = F.broadcast(right) if broadcast_right else right
    return left.join(r, on=list([key] if isinstance(key, str) else key), how=how)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str,
    right_ts: str,
    direction: str = "backward",
    suffix: str = "_right",
) -> DataFrame:
    """As-of join: for each left row, the single right row with the greatest
    ``right_ts <= left_ts`` (backward) / smallest ``right_ts >= left_ts``
    (forward) within the same key group.

    No reference implementation exists (SURVEY §2.4 lists it as a required
    extension for the ``events`` fixture); this is the Spark-native design:
    union both sides tagged, single window pass per key ordered by time,
    ``last(right_payload, ignorenulls=True)`` carries the most recent right
    row forward onto left rows.

    Scale notes: ONE shuffle on the key columns (same as any sort-merge
    join), no range-explosion, no per-key collect; skewed keys are handled
    by AQE. This beats the naive join+filter+window-rank plan, which
    shuffles the (much larger) cross-matched intermediate.
    """
    from pyspark.sql.types import StructField, StructType

    keys = [on] if isinstance(on, str) else list(on)
    lpay = [c for c in left.columns if c not in keys and c != left_ts]
    rpay = [c for c in right.columns if c not in keys and c != right_ts]

    rpay_out = [c + suffix if c in set(left.columns) else c for c in rpay]

    # The right payload travels as ONE struct so the window carries whole
    # right ROWS: per-column last(ignorenulls) would stitch fields from
    # different right rows whenever a payload column holds NULLs (the
    # nearest row's NULL y must win over an older row's non-NULL y).
    rstruct_type = StructType(
        [StructField(c, right.schema[c].dataType, True) for c in rpay]
        + [StructField("__rts", right.schema[right_ts].dataType, True)]
    )
    l_tagged = left.select(
        *keys,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        *[F.col(c) for c in lpay],
        F.lit(None).cast(rstruct_type).alias("__r"),
    )
    r_tagged = right.select(
        *keys,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lpay],
        F.struct(
            *[F.col(c).alias(c) for c in rpay],
            F.col(right_ts).alias("__rts"),
        ).alias("__r"),
    )
    unioned = l_tagged.unionByName(r_tagged)

    if direction == "backward":
        # right rows sort before left rows at equal ts so right_ts == left_ts matches
        w = (
            Window.partitionBy(*keys)
            .orderBy(F.col("__ts").asc(), F.col("__is_left").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
    elif direction == "forward":
        w = (
            Window.partitionBy(*keys)
            .orderBy(F.col("__ts").desc(), F.col("__is_left").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
    else:
        raise ValueError(f"unknown direction {direction!r}")

    carried = unioned.select(
        *keys,
        "__ts",
        "__is_left",
        *[F.col(c) for c in lpay],
        F.last(F.col("__r"), ignorenulls=True).over(w).alias("__rc"),
    )
    rts_out = right_ts + suffix if right_ts in set(left.columns) else right_ts
    return (
        carried.where(F.col("__is_left") == 1)
        .select(
            *keys,
            F.col("__ts").alias(left_ts),
            *[F.col(c) for c in lpay],
            *[
                F.col("__rc").getField(c).alias(out)
                for c, out in zip(rpay, rpay_out)
            ],
            F.col("__rc").getField("__rts").alias(rts_out),
        )
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str,
    right_start: str,
    right_end: str,
) -> DataFrame:
    """Interval containment join: left rows matched to right intervals
    ``[right_start, right_end)`` per key. Expressed declaratively so
    Catalyst can choose a broadcast-nested-loop (small right) or AQE plan;
    at scale pre-bucket both sides on the key to avoid the cross blow-up."""
    keys = [on] if isinstance(on, str) else list(on)
    # rename EVERY right column: gives the join condition unambiguous
    # attributes (self-joins included) and collision-free output names
    r = right.withColumnsRenamed({c: f"__r_{c}" for c in right.columns})
    cond = [left[k] == r[f"__r_{k}"] for k in keys] + [
        left[left_ts] >= r[f"__r_{right_start}"],
        left[left_ts] < r[f"__r_{right_end}"],
    ]
    cond_expr = cond[0]
    for c in cond[1:]:
        cond_expr = cond_expr & c
    out = left.join(r, cond_expr, "left").drop(*[f"__r_{k}" for k in keys])
    left_names = set(left.columns)
    return out.withColumnsRenamed(
        {
            f"__r_{c}": (c if c not in left_names else f"{c}_right")
            for c in right.columns
            if c not in keys
        }
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    how: str = "inner",
    salt_buckets: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Skew-resistant equi-join: salt the (large, skewed) left side into
    ``salt_buckets`` sub-keys and replicate the right side once per bucket,
    so one hot key spreads over ``salt_buckets`` shuffle partitions instead
    of melting a single reducer.

    AQE's skew-join split (on by default in ``session.get_spark``) handles
    most skew at runtime; explicit salting remains the tool when a single
    key exceeds what one task can hold even after AQE splitting, or for
    deterministic partition sizing in SLA-bound jobs. Result is exactly the
    plain ``left.join(right, on, how)`` — salt columns never escape.

    ``how`` supports inner/left (the shapes where the left side is the big
    one); right/full would need the salting mirrored.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports how in {'inner','left'}")
    keys = [on] if isinstance(on, str) else list(on)
    salted_l = left.withColumn(
        "__salt", (F.rand(seed) * salt_buckets).cast("int")
    )
    salted_r = right.withColumn(
        "__salt",
        F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1))),
    )
    return salted_l.join(salted_r, [*keys, "__salt"], how).drop("__salt")


def fuzzy_top1_join(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    max_distance: int | None = None,
) -> DataFrame:
    """Best-string-match join (k=1 by edit distance)
    ↔ ``match_filename`` (``sharepoint_client.py:121-127``:
    ``difflib.get_close_matches(name, files, 1)`` on the driver).

    Distributed form: broadcast the (small) right side, cross-join,
    ``levenshtein`` natively, keep rank-1 per left row. For large×large use
    the LSH similarity operators in ``pyveb_spark.operators.similarity``.
    """
    # rank per left ROW, not per left match-value: two left rows sharing a
    # name must both survive with their own best match. The id is stable
    # within a job given deterministic input partitioning (file scans are).
    keyed = left.withColumn("__rid", F.monotonically_increasing_id())
    scored = keyed.join(F.broadcast(right)).withColumn(
        "__dist", F.levenshtein(F.col(left_col), F.col(right_col))
    )
    if max_distance is not None:
        scored = scored.where(F.col("__dist") <= max_distance)
    w = Window.partitionBy("__rid").orderBy(
        F.col("__dist").asc(), F.col(right_col).asc()
    )
    return (
        scored.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") == 1)
        .drop("__rk", "__rid")
    )


def join_size_estimate(
    left: DataFrame,
    right: DataFrame,
    keys,
) -> DataFrame:
    """EXACT inner-equi-join output size without running the join:
    ``|A ⋈ B| = Σ_k c_A(k)·c_B(k)`` over the two per-key count tables.
    Returns one row ``(left_rows, right_rows, n_join_keys, est_rows)`` —
    the pre-flight check that catches a fan-out join (est_rows ≫
    max(left, right)) BEFORE it materializes 10¹² rows. Pair with
    ``profile.key_skew_profile`` to decide salting.

    100 TB design: two (key, partial count) groupBys and a count-table
    join — shuffle volume is key-cardinality-sized on both sides, never
    the fact rows. The estimate is exact for inner equi-joins; for outer
    joins add the unmatched side counts."""
    from pyspark.sql import functions as F

    keys = list(keys) if not isinstance(keys, str) else [keys]
    ca = left.groupBy(*keys).agg(F.count(F.lit(1)).alias("__ca"))
    cb = right.groupBy(*keys).agg(F.count(F.lit(1)).alias("__cb"))
    matched = ca.join(cb, keys)
    est = matched.agg(
        F.count(F.lit(1)).alias("n_join_keys"),
        F.sum(F.col("__ca") * F.col("__cb")).alias("est_rows"),
    )
    lr = left.agg(F.count(F.lit(1)).alias("left_rows"))
    rr = right.agg(F.count(F.lit(1)).alias("right_rows"))
    return (
        lr.crossJoin(rr)
        .crossJoin(est)
        .select(
            "left_rows", "right_rows", "n_join_keys",
            F.coalesce(F.col("est_rows"), F.lit(0)).alias("est_rows"),
        )
    )


def fuzzy_pairs_blocked(
    df: DataFrame,
    name_col: str,
    block_cols,
    max_distance: int,
    id_cols=(),
) -> DataFrame:
    """Entity-resolution candidate pairs: all record pairs that share a
    BLOCK key and sit within ``max_distance`` edit distance — the
    blocking + verification pattern (Fellegi-Sunter style pipelines) that
    makes large×large fuzzy matching tractable where
    :func:`fuzzy_top1_join`'s broadcast cross-join cannot. ``block_cols``
    may be column names or Column expressions (phonetic code, first
    token, sorted-token prefix, length band...). Returns one row per
    unordered pair ``(block, a_<name>, b_<name>, ids..., dist)`` with
    ``a < b`` on (name, ids) so no pair appears twice.

    100 TB design: the self-join is keyed on the block — ONE shuffle,
    candidate count Σ_b n_b² bounded by the largest block instead of n².
    Pick blocks with :func:`~pyveb_spark.operators.profile.key_skew_profile`
    (a hot block is a hot join key); multi-pass blocking (union of pairs
    from several cheap keys) raises recall without unblocking the join.
    The edit-distance verify is a scan-stage native expression
    (``levenshtein``), never a Python UDF.
    """
    ids = list(id_cols)
    blocks = [
        F.col(b).alias(f"__b{i}") if isinstance(b, str) else b.alias(f"__b{i}")
        for i, b in enumerate(block_cols)
    ]
    base = df.select(
        *blocks, F.col(name_col).alias("__name"),
        *[F.col(c) for c in ids],
    )
    bkeys = [f"__b{i}" for i in range(len(blocks))]
    left = base.select(
        *bkeys,
        F.col("__name").alias(f"a_{name_col}"),
        *[F.col(c).alias(f"a_{c}") for c in ids],
    )
    right = base.select(
        *bkeys,
        F.col("__name").alias(f"b_{name_col}"),
        *[F.col(c).alias(f"b_{c}") for c in ids],
    )
    a_key = F.struct(F.col(f"a_{name_col}"), *[F.col(f"a_{c}") for c in ids])
    b_key = F.struct(F.col(f"b_{name_col}"), *[F.col(f"b_{c}") for c in ids])
    return (
        left.join(right, bkeys)
        .where(a_key < b_key)
        .withColumn(
            "dist",
            F.levenshtein(F.col(f"a_{name_col}"), F.col(f"b_{name_col}")),
        )
        .where(F.col("dist") <= max_distance)
    )
