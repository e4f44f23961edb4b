"""Arrow-batched grouped aggregate UDFs (pandas GROUPED_AGG).

The last row of the §2.12 UDF matrix: scalar exprs (native), batch maps
(mapInPandas), grouped/cogrouped maps (applyInPandas), table functions
(UDTF) — and here custom *aggregates*, for reductions Spark has no builtin
for. Each group's columns arrive as pandas Series via Arrow, the return is
one scalar; usable in ``groupBy().agg`` and as window aggregates.

Same engine rule as everywhere: prefer the native aggregate when one
exists (weighted mean IS expressible as sum(v*w)/sum(w) — these serve as
the tested template for genuinely-custom reductions, and the test pins the
UDAF == native equivalence). Partial aggregation note: GROUPED_AGG udfs do
NOT map-side combine (each group's full data reaches one task), so at
100 TB favor algebraic rewrites or two-stage sketch aggregation
(operators/sketches.py) for high-cardinality groups; per-entity groups of
bounded size are the intended use.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType

__all__ = ["weighted_mean", "geometric_mean"]


# NOTE: return types are DataType objects, not DDL strings — string forms
# are parsed against the active SparkSession, which would make importing
# this module require one.
@pandas_udf(DoubleType())
def weighted_mean(v: pd.Series, w: pd.Series) -> float:
    """Σ(v·w)/Σ(w) over the group; NULL pairs dropped, zero total weight
    → NaN (the float contract for empty reductions)."""
    mask = v.notna() & w.notna()
    tw = float(w[mask].sum())
    if tw == 0.0:
        return float("nan")
    return float((v[mask] * w[mask]).sum() / tw)


@pandas_udf(DoubleType())
def geometric_mean(v: pd.Series) -> float:
    """exp(mean(ln v)) over the group's positive values — the classic
    no-builtin aggregate (rates, ratios, benchmark summaries)."""
    pos = v[v.notna() & (v > 0)]
    if len(pos) == 0:
        return float("nan")
    return float(np.exp(np.log(pos.astype("float64")).mean()))
