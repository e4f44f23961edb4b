"""Market-basket association rules — pairwise support / confidence / lift.

The co-occurrence statistic behind "frequently bought together", feature
cross-correlation screens, and tag-affinity curation. No reference
analogue (pyveb's transforms stop at row-level cleaning); this is the
Agrawal-Srikant frequent-itemset shape restricted to pairs, which is the
part that matters at warehouse scale — higher-order itemsets explode
combinatorially and are mined on the pruned pair graph downstream.

100 TB design: the pair generator is a self-join keyed on the BASKET id —
fan-out is Σ_b k_b² over per-basket item counts k_b, bounded by the
``min_item_count`` prune (the apriori monotonicity argument: an item
below support can't be in a frequent pair) and by basket size, never n².
Counts/supports are one (a, b)-keyed aggregation with map-side partials;
the item-count table is item-cardinality-sized and broadcasts back onto
the pair table. All ratios are fixed-order double expressions over exact
integer counts, so results hash-match any engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["association_rules"]


def association_rules(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_item_count: int = 1,
    min_pair_count: int = 1,
) -> DataFrame:
    """Pairwise rules over (basket, item) rows (duplicates tolerated —
    presence is what counts). Returns one row per unordered pair
    ``a < b``: ``(item_a, item_b, n_pairs, n_a, n_b, support,
    conf_a_to_b, conf_b_to_a, lift)`` where support = P(a,b),
    confidence = P(b|a) (and the reverse), lift = P(a,b)/(P(a)·P(b)) —
    lift > 1 means the pair co-occurs more than independence predicts.
    """
    from pyveb_spark.operators.cache import cached_once

    # bi feeds the basket count, the item marginals AND both sides of
    # the pair join — cache it or the distinct recomputes four times
    bi = cached_once(
        df.select(
            F.col(basket_col).alias("__b"), F.col(item_col).alias("__it")
        ).distinct(),
        "rules.association.bi",
    )
    n_baskets = bi.select("__b").distinct().agg(
        F.count(F.lit(1)).alias("__n")
    )
    items = bi.groupBy("__it").agg(F.count(F.lit(1)).alias("__c"))
    if min_item_count > 1:
        items = items.where(F.col("__c") >= min_item_count)
    # apriori prune BEFORE pairing: items below support can't form a pair
    pruned = bi.join(items.select("__it"), "__it")
    left = pruned.select("__b", F.col("__it").alias("item_a"))
    right = pruned.select("__b", F.col("__it").alias("item_b"))
    pairs = (
        left.join(right, "__b")
        .where(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .where(F.col("n_pairs") >= min_pair_count)
    )
    ca = items.select(
        F.col("__it").alias("item_a"), F.col("__c").alias("n_a")
    )
    cb = items.select(
        F.col("__it").alias("item_b"), F.col("__c").alias("n_b")
    )
    joined = (
        pairs.join(F.broadcast(ca), "item_a")
        .join(F.broadcast(cb), "item_b")
        .crossJoin(F.broadcast(n_baskets))
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    return joined.select(
        "item_a",
        "item_b",
        "n_pairs",
        "n_a",
        "n_b",
        (d("n_pairs") / d("__n")).alias("support"),
        (d("n_pairs") / d("n_a")).alias("conf_a_to_b"),
        (d("n_pairs") / d("n_b")).alias("conf_b_to_a"),
        (d("n_pairs") * d("__n") / (d("n_a") * d("n_b"))).alias("lift"),
    )
