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
