"""Sequence packing for training-data pipelines (north-star extension).

Pretraining consumes fixed-length token windows, not documents; the step
between "deduped corpus" and "training batches" is *packing*: lay the
corpus out as one long token stream and cut it every ``budget`` tokens
(documents span window boundaries — the GPT-style packing every large
pretraining pipeline uses), or assign whole documents to contiguous bins
(inference/eval batching). The reference has no analogue (its unit of work
is a whole staged file); this is part of the BASELINE.json LLM-pipeline
surface.

Both layouts here are *deterministic and partitioning-independent*: the
stream order is a total order on an explicit key column, and every
assignment is a closed-form function of the running token count — a single
window ``SUM`` — so the same corpus packs identically on 1 or 1000
executors. No driver state, no sequential loop.

Scale notes: the only shuffle is the global sort implied by the ordering
window (range-partitioned by Spark's window exchange). At 100 TB you'd
pre-sort the corpus once (or order by a bucketed content hash) and reuse
that layout for every epoch; the window itself is a prefix sum — one pass,
map-side-light. ``pack_spans`` emits one row per (document × window)
overlap via ``sequence``+``explode``; a document adds
``ceil(n_tokens/budget)+1`` rows at most, so output is O(corpus/budget)
— no blow-up.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "with_token_offsets",
    "distributed_ntile",
    "pack_spans",
    "pack_contiguous",
    "pack_cut_stats",
]


def with_token_offsets(
    df: DataFrame,
    n_tokens_col: str,
    order_col: str | Sequence[str],
    start_col: str = "start_tok",
    end_col: str = "end_tok",
) -> DataFrame:
    """Add ``start_col`` (exclusive prefix sum) and ``end_col`` (inclusive,
    = start + n - 1) giving each document its half-open slice
    [start_tok, end_tok] of the concatenated corpus token stream, ordered
    by ``order_col`` (a column name or a sequence of names forming a
    composite ordering; must be a total order — use a unique id or a
    content hash for a reproducible shuffle-once layout).

    With ``n_tokens_col`` a literal-1 column this IS a distributed
    ``row_number`` (``end_tok + 1`` = the 1-based rank under the
    ordering) — the replacement for any corpus-sized global
    ``Window.orderBy`` row numbering (SCALE.md's no-unpartitioned-window
    rule; q194 uses exactly this form).

    Distributed prefix sum, NOT a global single-partition window: the data
    is range-partitioned on ``order_col``, each partition computes its
    local running sum, and the per-partition totals (one row per
    partition) are folded on the driver into exclusive partition offsets
    that join back as a broadcast. Wall-clock is one range exchange + one
    tiny aggregate — the same result as ``Window.orderBy(order_col)`` but
    without the every-row-through-one-task bottleneck that kills the
    global window at 100 TB.

    The range-partitioned frame is materialized with an eager
    ``localCheckpoint`` (not a cache entry): partition ids must be
    identical between the totals pass and the output plan, and a cached
    entry can be evicted (or unpersisted by a later call) and recomputed
    through a fresh range sampling — a silent-corruption hazard, not a
    perf detail. Checkpoint blocks are owned by the returned plan's
    lineage and garbage-collect with it. On a multi-node cluster swap for
    a reliable ``checkpoint`` dir if executor loss matters.

    Output/temp columns never silently clobber input: the call fails
    loudly if ``df`` already carries ``start_col``/``end_col`` (pass
    explicit alternative names — e.g. ``distributed_ntile`` uses
    collision-proof ``__dnt_``-prefixed names so an input that already
    went through a packing pipeline keeps its ``start_tok``/``end_tok``)
    or any of the ``__wto_*`` internals.
    """
    spark = df.sparkSession
    order_cols = (
        [order_col] if isinstance(order_col, str) else list(order_col)
    )
    reserved = {start_col, end_col, "__wto_pid", "__wto_cum", "__wto_off"}
    clash = reserved.intersection(df.columns)
    if clash:
        raise ValueError(
            f"with_token_offsets would overwrite existing column(s) "
            f"{sorted(clash)}; pass start_col/end_col overrides or "
            f"rename the input columns"
        )
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    parted = (
        df.repartitionByRange(n_parts, *[F.col(c) for c in order_cols])
        .withColumn("__wto_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    totals = sorted(
        parted.groupBy("__wto_pid").agg(
            F.sum(n_tokens_col).alias("__t")
        ).collect(),
        key=lambda r: r["__wto_pid"],
    )
    offsets, run = [], 0
    for r in totals:
        offsets.append((r["__wto_pid"], run))
        run += int(r["__t"] or 0)
    # LocalRelation, not a Python-RDD frame: the offsets join-back runs
    # once per caller, and the pickled-RDD form paid ~32 Python-worker
    # roundtrips per scan on local[32] — most of the "fixed ~0.5-1 s
    # per call" overhead the r9 BASELINE re-record attributed to this
    # helper (session.local_df docstring has the measurement)
    from pyveb_spark.session import local_df

    off_df = local_df(
        spark, offsets or [(0, 0)], "__wto_pid int, __wto_off bigint"
    )
    w = (
        Window.partitionBy("__wto_pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local_cum = F.sum(n_tokens_col).over(w)
    return (
        parted.join(F.broadcast(off_df), "__wto_pid")
        .withColumn("__wto_cum", local_cum + F.col("__wto_off"))
        .withColumn(start_col, (F.col("__wto_cum") - F.col(n_tokens_col)))
        .withColumn(end_col, F.col("__wto_cum") - F.lit(1))
        .drop("__wto_cum", "__wto_off", "__wto_pid")
    )


def distributed_ntile(
    df: DataFrame,
    n_bins: int,
    order_cols: Sequence[str],
    out_col: str = "bin",
) -> DataFrame:
    """Exact ``ntile(n_bins)`` over the total order ``order_cols`` —
    bit-identical bucket assignment to ``F.ntile(n).over(Window.orderBy(
    ...))`` (even split, remainder to the leading buckets; ANSI/DuckDB
    semantics) — WITHOUT the unpartitioned window that pulls every row
    through one task. The 0-based global rank comes from
    :func:`with_token_offsets` over a literal-1 column (range-partitioned
    prefix count), the total row count is one scalar aggregate, and the
    bucket is the closed form

      ``rank // (q+1)           if rank < r*(q+1)   (the r big buckets)``
      ``r + (rank - r*(q+1))//q otherwise``          (q = n//bins floor)

    Cost: one range exchange + a tiny per-partition-totals aggregate +
    one scalar count — the same exchange a partitioned window pays, with
    no single-task stage at any scale (SCALE.md's no-unpartitioned-window
    rule). Oracle-replayable: DuckDB's ``NTILE`` reproduces it exactly on
    the same total order.

    Temp columns are collision-proof (``__dnt_``-prefixed, passed to
    ``with_token_offsets`` as explicit out names): an input that already
    carries ``start_tok``/``end_tok`` — a normal output of the packing
    pipeline — passes through untouched (ADVICE r9)."""
    numbered = with_token_offsets(
        df.withColumn("__dnt_one", F.lit(1)),
        "__dnt_one",
        order_cols,
        start_col="__dnt_start",
        end_col="__dnt_end",
    )
    total_row = numbered.agg(F.max("__dnt_end").alias("m")).first()
    total = int(total_row["m"]) + 1 if total_row["m"] is not None else 0
    q, r = divmod(total, int(n_bins))
    cut = r * (q + 1)
    bucket = (
        F.when(
            F.col("__dnt_end") < F.lit(cut),
            F.expr(f"__dnt_end div {q + 1}"),
        )
        # the otherwise branch is unreachable when q == 0 (every row sits
        # in the first r singleton buckets); max(q,1) keeps the unused
        # expression well-defined under ANSI
        .otherwise(
            F.lit(r) + F.expr(f"(__dnt_end - {cut}) div {max(q, 1)}")
        )
        + F.lit(1)
    )
    return numbered.withColumn(out_col, bucket.cast("int")).drop(
        "__dnt_one", "__dnt_start", "__dnt_end"
    )


def pack_spans(
    df: DataFrame,
    n_tokens_col: str,
    order_col: str,
    budget: int,
) -> DataFrame:
    """GPT-style packing: cut the concatenated token stream every
    ``budget`` tokens; documents span cuts. Returns one row per
    (document, pack) overlap with the token sub-range the document
    contributes:

      ``order_col, pack_id, span_start, span_end, span_tokens``

    where span_* are positions in the corpus stream. Every pack except the
    last holds exactly ``budget`` tokens — the invariant tests pin.
    Documents with 0 tokens are dropped (they contribute no span)."""
    b = F.lit(int(budget))
    offs = with_token_offsets(df, n_tokens_col, order_col).where(
        F.col(n_tokens_col) > 0
    )
    first_pack = (F.col("start_tok") / b).cast("bigint")
    last_pack = (F.col("end_tok") / b).cast("bigint")
    packs = offs.withColumn(
        "pack_id", F.explode(F.sequence(first_pack, last_pack))
    )
    pack_lo = F.col("pack_id") * b
    pack_hi = pack_lo + b - F.lit(1)
    return packs.select(
        order_col,
        "pack_id",
        F.greatest(F.col("start_tok"), pack_lo).alias("span_start"),
        F.least(F.col("end_tok"), pack_hi).alias("span_end"),
        (
            F.least(F.col("end_tok"), pack_hi)
            - F.greatest(F.col("start_tok"), pack_lo)
            + F.lit(1)
        ).alias("span_tokens"),
    )


def pack_contiguous(
    df: DataFrame,
    n_tokens_col: str,
    order_col: str,
    budget: int,
) -> DataFrame:
    """Whole-document contiguous binning: documents (in ``order_col``
    order) go into bin ``floor(start_tok / budget)`` — each document lands
    in exactly one bin, bins hold ≈``budget`` tokens (a bin may overflow by
    up to one document; none underflows except the last). The eval-batch /
    shard-layout shape; use ``pack_spans`` for training windows."""
    offs = with_token_offsets(df, n_tokens_col, order_col)
    return offs.withColumn(
        "bin_id", (F.col("start_tok") / F.lit(int(budget))).cast("bigint")
    )


def pack_cut_stats(
    df: DataFrame,
    n_tokens_col: str,
    order_col: str,
    budgets: Sequence[int],
) -> DataFrame:
    """Window-budget sweep for GPT-style span packing: for each candidate
    ``budget`` (max_seq_len), how many training windows the corpus yields
    and how many documents get CUT by a window boundary — the
    sample-quality cost of span packing that whole-doc binning avoids.
    The choose-your-sequence-length table: larger budgets cut fewer docs
    but yield fewer (longer) samples.

    One row per budget: ``(budget, n_docs, n_packs, docs_cut, cut_rate,
    n_spans, total_tokens)`` where ``docs_cut`` counts documents spanning
    >1 window and ``n_spans`` is the total (document × window) overlap
    count (what ``pack_spans`` would materialize).

    100 TB design: the token-offset prefix sum runs ONCE
    (budget-independent); each budget's first/last window ids are pure
    integer division on the offsets, swept via one ``explode`` over the
    (tiny) budget array, folded by a single map-side-combinable
    aggregation. Cost = one range exchange + one agg, regardless of how
    many budgets are swept.
    """
    if not budgets or any(int(b) < 1 for b in budgets):
        raise ValueError("budgets must be non-empty positive ints")
    offs = with_token_offsets(df, n_tokens_col, order_col).where(
        F.col(n_tokens_col) > 0
    )
    swept = offs.select(
        F.col(n_tokens_col).alias("__n"),
        F.explode(
            F.array(*[F.lit(int(x)).cast("long") for x in budgets])
        ).alias("budget"),
        "start_tok",
        "end_tok",
    ).select(
        "budget",
        "__n",
        # integral `div`, not double `/`: exact over the full int64 range
        F.expr("start_tok div budget").alias("__fp"),
        F.expr("end_tok div budget").alias("__lp"),
    )
    return swept.groupBy("budget").agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.max("__lp") + F.lit(1)).alias("n_packs"),
        F.sum((F.col("__lp") > F.col("__fp")).cast("long")).alias(
            "docs_cut"
        ),
        F.round(
            F.sum((F.col("__lp") > F.col("__fp")).cast("long"))
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("cut_rate"),
        F.sum(F.col("__lp") - F.col("__fp") + F.lit(1)).alias("n_spans"),
        F.sum("__n").alias("total_tokens"),
    )
