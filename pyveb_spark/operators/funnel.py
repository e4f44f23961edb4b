"""Ordered-funnel analysis over event streams.

The classic product question — how many users progressed view → click →
purchase, in order — which the reference's consumers answered by exporting
events to a BI tool. Expressed relationally: stage k's cohort is an
aggregation of stage-k events restricted (join) to users who reached stage
k-1, with each event required to be strictly AFTER that user's stage-k-1
timestamp. No per-user event lists are materialized.

100 TB design: one pass per stage, every pass a groupBy on ``user`` plus a
join on the same key — co-partitioned after the first shuffle, so AQE/sort
-merge reuses the partitioning; per-stage state is ONE timestamp per
surviving user. Cohorts only shrink, so later stages cost less. This beats
the collect-per-user-sequence formulation (unbounded per-key state) and
stays exact, unlike sampled funnels.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["funnel_stages", "funnel_summary", "transition_matrix", "cohort_retention"]


def funnel_stages(
    events: DataFrame,
    stages: Sequence[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    within: str | None = None,
    filters: dict | None = None,
) -> DataFrame:
    """Per-user funnel reach: one row per user who completed stage 1, with
    each completed stage's FIRST qualifying timestamp (``t1..tN``, NULL
    once the user drops out). Stage k qualifies only strictly after the
    user's stage k-1 time — the ordered-funnel semantics. ``within``
    (an interval literal, e.g. ``"3 days"``) additionally bounds each
    transition: stage k must land ≤ within of stage k-1's timestamp —
    the conversion-window form every product funnel uses. ``filters``
    maps a stage name to an extra Column predicate on its events (e.g.
    purchases over a value threshold)."""
    if len(stages) < 2:
        raise ValueError("a funnel needs at least two stages")
    filters = dict(filters or {})

    def stage_events(stage):
        ev = events.where(F.col(type_col) == stage)
        return ev.where(filters[stage]) if stage in filters else ev

    cur = (
        stage_events(stages[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("t1"))
    )
    out = cur
    for k, stage in enumerate(stages[1:], start=2):
        prev_t = F.col(f"t{k-1}")
        cond = F.col(ts_col) > prev_t
        if within is not None:
            cond = cond & (
                F.col(ts_col) <= prev_t + F.expr(f"INTERVAL {within}")
            )
        nxt = (
            stage_events(stage)
            .join(cur.select(user_col, prev_t), user_col)
            .where(cond)
            .groupBy(user_col)
            .agg(F.min(ts_col).alias(f"t{k}"))
        )
        out = out.join(nxt.select(user_col, f"t{k}"), user_col, "left")
        cur = nxt.select(user_col, f"t{k}")
    return out


def funnel_summary(
    events: DataFrame,
    stages: Sequence[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    within: str | None = None,
    filters: dict | None = None,
) -> DataFrame:
    """Funnel rollup: per stage, how many users reached it and the EXACT
    total lag from the previous stage (``total_lag_us``, summed unix
    micros — integer-exact and order-independent; divide by ``n_users``
    at the edge for the average). Stage 1's lag is 0 by definition.

    All stages aggregate in ONE pass over the reach frame (parallel agg
    expressions, then an explode to rows — the ``profile_table`` shape);
    a per-stage union of separate ``reach.agg`` calls would re-execute
    the whole multi-join funnel DAG once per stage."""
    reach = funnel_stages(
        events, stages, user_col, type_col, ts_col, within, filters
    )
    aggs = []
    for k in range(1, len(stages) + 1):
        t = F.col(f"t{k}")
        aggs.append(F.count(t).alias(f"__n{k}"))
        if k > 1:
            prev = F.col(f"t{k-1}")
            aggs.append(
                F.sum(
                    F.when(
                        t.isNotNull(),
                        F.unix_micros(t) - F.unix_micros(prev),
                    ).otherwise(F.lit(0))
                ).alias(f"__lag{k}")
            )
    row = reach.agg(*aggs)
    per_stage = F.array(
        *[
            F.struct(
                F.lit(k).alias("stage"),
                F.lit(stage).alias("event_type"),
                F.col(f"__n{k}").alias("n_users"),
                (
                    F.coalesce(F.col(f"__lag{k}"), F.lit(0)).cast("bigint")
                    if k > 1
                    else F.lit(0).cast("bigint")
                ).alias("total_lag_us"),
            )
            for k, stage in enumerate(stages, start=1)
        ]
    )
    return (
        row.select(F.explode(per_stage).alias("s"))
        .select("s.*")
        .orderBy("stage")
    )


def transition_matrix(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    state_col: str,
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """First-order Markov transition statistics over per-key event
    sequences: for every consecutive (state → next_state) step in each
    key's ts-ordered stream, the count and the row-normalized probability
    ``p = n / Σ_next n``. Returns ``(from_state, to_state, n, p)`` —
    the behavioral model funnels summarize one path of; also the
    session-level anomaly baseline (improbable transition = bot/fraud
    signal).

    Same-timestamp events are ordered by ``tiebreak_cols`` so the chain
    is deterministic. ``p`` is a single integer division per row
    (engine-exact given the same counts).

    100 TB design: ONE window shuffle on ``keys`` (lead), then a
    (from, to)-keyed aggregation of the transition pairs — state² output,
    independent of event count. Per-row window state is one element; no
    per-key sequence is ever collected.
    """
    from pyspark.sql import Window

    keys = list(keys)
    order = [F.col(ts_col).asc(), *[F.col(c).asc() for c in tiebreak_cols]]
    w = Window.partitionBy(*keys).orderBy(*order)
    steps = (
        df.select(
            F.col(state_col).alias("from_state"),
            F.lead(state_col).over(w).alias("to_state"),
        )
        .where(F.col("to_state").isNotNull())
        .groupBy("from_state", "to_state")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = Window.partitionBy("from_state")
    return steps.select(
        "from_state",
        "to_state",
        "n",
        (F.col("n").cast("double") / F.sum("n").over(tot)).alias("p"),
    )


def cohort_retention(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    period: str = "week",
) -> DataFrame:
    """Cohort retention table: users grouped by their FIRST-activity
    period (the cohort), tracked by how many are still active N periods
    later — ``(cohort, period_offset, n_active, cohort_size,
    retention)``. The standing growth/engagement readout next to the
    funnel (one path) and the transition matrix (one step).

    ``retention`` is a single integer division (active/size) — engine-
    exact. Offsets are exact integer day-diffs divided by the period
    length, so period boundaries can't drift between engines.

    100 TB design: first-activity is one groupBy on user; the join back
    to events is keyed on the SAME column (co-partitioned, AQE reuses
    the exchange); the retention aggregation counts DISTINCT users per
    (cohort, offset) — cohorts² cells, not event rows. No per-user
    sequences, no windows over raw events.
    """
    days = {"week": 7, "day": 1}[period]
    bucket = F.date_trunc(period, F.col(ts_col))
    first = df.groupBy(F.col(user_col).alias("__u")).agg(
        F.min(bucket).alias("cohort")
    )
    sizes = first.groupBy("cohort").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    joined = df.select(
        F.col(user_col).alias("__u"), bucket.alias("__p")
    ).join(first, "__u")
    active = (
        joined.select(
            "__u",
            "cohort",
            (F.datediff(F.col("__p"), F.col("cohort")) / days)
            .cast("int")
            .alias("period_offset"),
        )
        .groupBy("cohort", "period_offset")
        .agg(F.count_distinct(F.col("__u")).alias("n_active"))
    )
    return active.join(sizes, "cohort").select(
        "cohort",
        "period_offset",
        "n_active",
        "cohort_size",
        (
            F.col("n_active").cast("double")
            / F.col("cohort_size").cast("double")
        ).alias("retention"),
    )
