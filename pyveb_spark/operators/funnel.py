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

__all__ = ["funnel_stages", "funnel_summary"]


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
    at the edge for the average). Stage 1's lag is 0 by definition."""
    reach = funnel_stages(
        events, stages, user_col, type_col, ts_col, within, filters
    )
    per_stage = []
    for k, stage in enumerate(stages, start=1):
        t = F.col(f"t{k}")
        prev = F.col(f"t{k-1}") if k > 1 else None
        lag = (
            F.sum(
                F.when(
                    t.isNotNull(),
                    F.unix_micros(t) - F.unix_micros(prev),
                ).otherwise(F.lit(0))
            )
            if prev is not None
            else F.lit(0).cast("bigint")
        )
        per_stage.append(
            reach.agg(
                F.lit(k).alias("stage"),
                F.lit(stage).alias("event_type"),
                F.count(t).alias("n_users"),
                lag.alias("total_lag_us"),
            )
        )
    out = per_stage[0]
    for frame in per_stage[1:]:
        out = out.unionByName(frame)
    return out.orderBy("stage")
