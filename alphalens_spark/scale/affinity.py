"""Market-basket affinity analytics: co-occurrence and association rules.

The classic support/confidence/lift frequent-pair mining (Agrawal &
Srikant's Apriori framing, restricted to the pair level that powers
"bought together" features and co-occurrence embeddings). Baskets are
any grouping key — an order, a session, a user-day — and items any
categorical column.

Scale posture: the only super-linear stage is the within-basket pair
join, which is quadratic in BASKET SIZE, not corpus size — bounded for
real baskets and explicitly guarded by ``max_basket`` (oversized
baskets are dropped with an observable count, the max_df pattern).
Everything else is linear groupBys plus 1-row / item-dim broadcasts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _basket_items(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    max_basket: int | None,
) -> DataFrame:
    """Distinct (basket, item) rows, oversized baskets dropped."""
    bi = df.select(
        F.col(basket_col).alias("basket"), F.col(item_col).alias("item")
    ).distinct()
    if max_basket is not None:
        big = (
            bi.groupBy("basket")
            .agg(F.count(F.lit(1)).alias("_sz"))
            .where(F.col("_sz") > max_basket)
            .select("basket")
        )
        bi = bi.join(big, "basket", "left_anti")
    return bi


def cooccurrence_pairs(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_count: int = 1,
    max_basket: int | None = None,
) -> DataFrame:
    """Item-pair co-occurrence counts: one row per unordered item pair
    with the number of distinct baskets containing both.

    Output: (item_a, item_b, n_baskets) with item_a < item_b.

    Scale shape: distinct (basket, item) reduction first (so multi-line
    baskets — e.g. several lineitems of the same part — count once),
    then a self-equi-join on the basket key whose fan-out is bounded by
    basket size (``max_basket``-guarded), then one pair groupBy.
    """
    bi = _basket_items(df, basket_col, item_col, max_basket)
    a = bi.select("basket", F.col("item").alias("item_a"))
    b = bi.select("basket", F.col("item").alias("item_b"))
    pairs = (
        a.join(b, "basket")
        .where(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("n_baskets"))
    )
    if min_count > 1:
        pairs = pairs.where(F.col("n_baskets") >= min_count)
    return pairs


def association_rules(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: float = 0.0,
    min_confidence: float = 0.0,
    min_pair_count: int = 1,
    max_basket: int | None = None,
) -> DataFrame:
    """Pair-level association rules with support / confidence / lift.

    For each directed rule a→b over co-occurring items:
    ``support = P(a,b)``, ``confidence = P(a,b)/P(a)``,
    ``lift = confidence / P(b)`` — probabilities over distinct baskets.
    Both directions of every unordered pair are emitted (their
    confidences differ), filtered by the three thresholds.

    Output: (antecedent, consequent, pair_baskets, support, confidence,
    lift), rounded to 6 dp.

    Scale shape: :func:`cooccurrence_pairs` for the joint counts, one
    item-level groupBy for the marginals (item-dimension sized, joined
    back on the item key), and the total basket count as a 1-row
    broadcast — the same bounded-scalar contract as cm_estimate.
    """
    bi = _basket_items(df, basket_col, item_col, max_basket)
    bi = bi.localCheckpoint(eager=True)
    pairs = (
        bi.select("basket", F.col("item").alias("item_a"))
        .join(bi.select("basket", F.col("item").alias("item_b")), "basket")
        .where(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("pair_baskets"))
        .where(F.col("pair_baskets") >= min_pair_count)
    )
    marg = bi.groupBy("item").agg(F.count(F.lit(1)).alias("item_baskets"))
    total = bi.agg(F.count_distinct("basket").alias("_n"))
    directed = pairs.select(
        F.col("item_a").alias("antecedent"),
        F.col("item_b").alias("consequent"),
        "pair_baskets",
    ).union(
        pairs.select(
            F.col("item_b").alias("antecedent"),
            F.col("item_a").alias("consequent"),
            "pair_baskets",
        )
    )
    ma = marg.select(
        F.col("item").alias("antecedent"), F.col("item_baskets").alias("_na")
    )
    mc = marg.select(
        F.col("item").alias("consequent"), F.col("item_baskets").alias("_nc")
    )
    out = (
        directed.join(ma, "antecedent")
        .join(mc, "consequent")
        .crossJoin(F.broadcast(total))
        .select(
            "antecedent",
            "consequent",
            "pair_baskets",
            "_n",
            F.round(F.col("pair_baskets") / F.col("_n"), 6).alias("support"),
            F.round(F.col("pair_baskets") / F.col("_na"), 6).alias("confidence"),
            F.round(
                (F.col("pair_baskets") / F.col("_na"))
                / (F.col("_nc") / F.col("_n")),
                6,
            ).alias("lift"),
        )
    )
    if min_support > 0.0:
        out = out.where(F.col("pair_baskets") / F.col("_n") >= min_support)
    if min_confidence > 0.0:
        out = out.where(F.col("confidence") >= min_confidence)
    return out.drop("_n")


def item_similarity(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_pair_count: int = 1,
    max_basket: int | None = None,
) -> DataFrame:
    """Symmetric item-item similarity from basket co-occurrence — the
    counting form of collaborative filtering's item-item step and the
    edge weighting for co-occurrence embeddings:

    - ``cosine = c_ab / sqrt(c_a·c_b)`` (Ochiai over basket sets),
    - ``jaccard = c_ab / (c_a + c_b − c_ab)``,
    - ``pmi = ln(c_ab·N / (c_a·c_b))`` over distinct baskets.

    One unordered row per co-occurring pair (item_a < item_b; all three
    measures are symmetric). Scale shape is association_rules' exactly:
    within-basket pair join (``max_basket``-guarded), item-key marginal
    joins, 1-row total broadcast.
    """
    bi = _basket_items(df, basket_col, item_col, max_basket)
    bi = bi.localCheckpoint(eager=True)
    pairs = (
        bi.select("basket", F.col("item").alias("item_a"))
        .join(bi.select("basket", F.col("item").alias("item_b")), "basket")
        .where(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("pair_baskets"))
        .where(F.col("pair_baskets") >= min_pair_count)
    )
    marg = bi.groupBy("item").agg(F.count(F.lit(1)).alias("item_baskets"))
    total = bi.agg(F.count_distinct("basket").alias("_n"))
    ma = marg.select(F.col("item").alias("item_a"), F.col("item_baskets").alias("_ca"))
    mb = marg.select(F.col("item").alias("item_b"), F.col("item_baskets").alias("_cb"))
    j = pairs.join(ma, "item_a").join(mb, "item_b").crossJoin(F.broadcast(total))
    c = F.col("pair_baskets")
    return j.select(
        "item_a",
        "item_b",
        "pair_baskets",
        F.round(c / F.sqrt(F.col("_ca") * F.col("_cb")), 6).alias("cosine"),
        F.round(c / (F.col("_ca") + F.col("_cb") - c), 6).alias("jaccard"),
        F.round(
            F.log(c * F.col("_n") / (F.col("_ca") * F.col("_cb"))), 6
        ).alias("pmi"),
    )
