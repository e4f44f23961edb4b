"""In-job data-quality metrics via ``DataFrame.observe``.

Reference parity: the reference's data-quality story is inline runtime
assertions — ``check_duplicates`` raising on hash collisions
(``dbt_client.py:649-658``) and config required-key asserts
(``config.py:164-174``) — each costing a separate driver-side pass. Spark's
``Observation`` attaches aggregate metrics to a plan and collects them as a
side effect of the job that was already running (the write, the merge), so
quality numbers are free: zero extra scans, exact, per-action.

Scale: observed metrics are computed as accumulator-style partial
aggregates inside the existing tasks — no extra shuffle, no second job.
Distinct-style checks aren't expressible as observations (no distinct
aggregates allowed); for those, use ``sketches.hll_distinct`` in the same
single pass and compare estimates, or an explicit keyed count.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F

__all__ = ["observed_metrics", "null_metrics", "bounds_metrics"]


def observed_metrics(
    df: DataFrame, metrics: dict[str, Column], name: str = "quality"
) -> tuple[DataFrame, Observation]:
    """Attach aggregate ``metrics`` to ``df``'s plan. Run ANY action on the
    returned frame (the write you were doing anyway), then read
    ``observation.get`` — a dict of metric name → value for exactly the
    rows that action processed."""
    obs = Observation(name)
    out = df.observe(obs, *[c.alias(n) for n, c in metrics.items()])
    return out, obs


def null_metrics(cols: Sequence[str]) -> dict[str, Column]:
    """Row count + per-column null counts — the load-time completeness
    check (the reference's NaN/'null' normalization implies exactly this
    question: how many slipped through)."""
    out: dict[str, Column] = {"n_rows": F.count(F.lit(1))}
    for c in cols:
        out[f"n_null_{c}"] = F.sum(
            F.when(F.col(c).isNull(), 1).otherwise(0)
        )
    return out


def bounds_metrics(col: str) -> dict[str, Column]:
    """Min/max/mean for a numeric column — the range sanity check that
    catches unit mixups and sentinel leakage (e.g. the reference's
    pre-1900 dates, ``spark_client.py:445-461``) in the same job as the
    write."""
    return {
        f"min_{col}": F.min(col),
        f"max_{col}": F.max(col),
        f"mean_{col}": F.avg(col),
    }
