"""Recommendation operators: frequent-itemset association rules and
collaborative filtering.

The reference IS a recommender ETL — its guid_coinstallation.json artifact
(taar_etl/taar_lite_guid_guid.py via README.md:101-106) serves "users who
installed X also installed Y" from raw co-install counts, and the
taar_similarity job feeds a donor-based collaborative model
(README.md:96-100). These operators are the model-quality upgrades of
those contracts, built on Spark ML so the heavy lifting stays
distributed:

  - `basket_rules` mines association rules with FP-Growth — the
    confidence/lift-scored generalization of the co-install ratio table
    (a raw count table recommends popular items; lift corrects for
    popularity).
  - `als_recommend` factorizes the user×item interaction matrix (seeded
    implicit-feedback ALS) and emits top-k per user — the collaborative
    recommender the donor-clustering job approximates with cluster
    means.

Scale notes: FP-Growth is the distributed PFP algorithm (per-item
conditional trees, shuffle keyed on item suffix) — minSupport is the cost
dial; ALS shuffles rating blocks between user/item factor solves, cost ∝
nonzeros × rank per iteration. Both are MLlib-native: no driver-side
materialization beyond the models' factor/itemset summaries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def basket_rules(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: float,
    min_confidence: float,
    pairs_only: bool = True,
) -> DataFrame:
    """Association rules over (basket, item) rows. Baskets are assembled
    with collect_set (FP-Growth requires unique items per basket — a
    duplicate line item is a quantity fact, not a second co-occurrence).

    With `pairs_only=True` (default) the output keeps 1-item → 1-item
    rules: (antecedent, consequent, support_pair, confidence, lift) —
    exactly the co-install contract, and EXACTLY reproducible in SQL
    (pair frequency / item frequency over distinct pairs), which is what
    the oracle pairing checks. `pairs_only=False` returns the full rule
    set (array antecedents) for consumers that want larger itemsets.

    Values are rounded to 6 decimals for engine portability; rule order
    is unspecified (consumers sort or hash order-insensitively)."""
    from pyspark.ml.fpm import FPGrowth

    baskets = df.groupBy(F.col(basket_col).alias("_b")).agg(
        F.collect_set(F.col(item_col)).alias("items")
    )
    model = FPGrowth(
        itemsCol="items",
        minSupport=min_support,
        minConfidence=min_confidence,
    ).fit(baskets)
    rules = model.associationRules
    if not pairs_only:
        return rules
    return (
        rules.filter(
            (F.size("antecedent") == 1) & (F.size("consequent") == 1)
        )
        .select(
            F.col("antecedent")[0].alias("antecedent"),
            F.col("consequent")[0].alias("consequent"),
            F.round("support", 6).alias("support_pair"),
            F.round("confidence", 6).alias("confidence"),
            F.round("lift", 6).alias("lift"),
        )
    )


def als_fit(
    ratings: DataFrame,
    user_col: str,
    item_col: str,
    rating_col: str,
    rank: int = 8,
    reg: float = 0.1,
    seed: int = 42,
    implicit: bool = True,
    max_iter: int = 5,
):
    """Seeded ALS factorization of the user×item matrix; returns the
    fitted model (callers derive user recommendations OR item-item
    neighbors from the one fit — see als_recommendations /
    als_item_neighbors).

    Implicit-feedback mode by default (interaction counts are confidence,
    not preference — the Hu/Koren/Volinsky formulation), which is the
    honest setting for install/purchase logs. Deterministic for a fixed
    seed + input; iterative ML → rows-only correctness (same contract as
    donor_clusters)."""
    from pyspark.ml.recommendation import ALS

    # MLlib ALS ids are int32. Under ANSI-off a long→int cast WRAPS
    # (the int8-quantization bug class, docs/NEXT.md), which would merge
    # distinct users into collided ids with zero errors — so the id
    # domain is validated first. One partial-aggregated scan of the
    # ratings, noise next to the factorization it guards.
    mx = ratings.agg(
        F.max(F.abs(F.col(user_col).cast("long"))).alias("u"),
        F.max(F.abs(F.col(item_col).cast("long"))).alias("i"),
    ).collect()[0]
    if max(mx["u"] or 0, mx["i"] or 0) > 2**31 - 1:
        raise ValueError(
            "ALS ids must fit int32; dense-rank or StringIndexer the "
            f"{user_col}/{item_col} ids first (max seen: user "
            f"{mx['u']}, item {mx['i']})"
        )
    prepared = ratings.select(
        F.col(user_col).cast("int").alias("_user"),
        F.col(item_col).cast("int").alias("_item"),
        F.col(rating_col).cast("float").alias("_rating"),
    )
    return ALS(
        userCol="_user",
        itemCol="_item",
        ratingCol="_rating",
        rank=rank,
        regParam=reg,
        seed=seed,
        implicitPrefs=implicit,
        coldStartStrategy="drop",
        maxIter=max_iter,
    ).fit(prepared)


def als_recommendations(
    model, user_col: str, item_col: str, k: int = 3
) -> DataFrame:
    """Top-k recommendations per user from a fitted ALS model, as
    (user, item, rec_rank) — rank, not raw score, because factor scores
    are only meaningful ordinally and float tails differ across BLAS
    implementations. Items the user already interacted with are NOT
    excluded (the caller anti-joins if the product surface wants only
    novel items — that is a business rule, not a model property)."""
    recs = model.recommendForAllUsers(k)
    return recs.select(
        F.col("_user").alias(user_col),
        F.posexplode("recommendations").alias("_pos", "_rec"),
    ).select(
        user_col,
        F.col("_rec._item").alias(item_col),
        (F.col("_pos") + 1).alias("rec_rank"),
    )


def als_recommend(
    ratings: DataFrame,
    user_col: str,
    item_col: str,
    rating_col: str,
    k: int = 3,
    rank: int = 8,
    reg: float = 0.1,
    seed: int = 42,
    implicit: bool = True,
    max_iter: int = 5,
) -> DataFrame:
    """Fit + recommend in one call (see als_fit / als_recommendations);
    kept as the single-shot convenience API."""
    model = als_fit(
        ratings,
        user_col,
        item_col,
        rating_col,
        rank=rank,
        reg=reg,
        seed=seed,
        implicit=implicit,
        max_iter=max_iter,
    )
    return als_recommendations(model, user_col, item_col, k)


def als_item_neighbors(
    model, item_col: str, k: int = 3, items: DataFrame | None = None
) -> DataFrame:
    """Item-item "related items" from the LEARNED item factors: cosine
    top-k over the factor vectors, served through the SAME search
    operator as the raw-embedding ANN family
    (similarity.cosine_topk_bruteforce — and at catalog scale the
    factors drop into ann_bucketed/ann_ivf unchanged: a factor matrix is
    just another embedding table). Returns (item, neighbor, cos, rnk).

    `items` (a one-column DataFrame of item ids) bounds WHICH items get
    neighbors — the brute-force path broadcasts the query side, so "all
    items" is only sane for bounded catalogs; a full-catalog sweep
    should go through the bucketed/IVF operators instead.

    Factor-space neighbors capture behavioral similarity (co-interaction
    patterns) rather than content similarity — the classic "users who
    liked X liked Y" surface, derived from the one ALS fit."""
    from taar_gcp_etl_spark.operators.similarity import (
        cosine_topk_bruteforce,
    )

    factors = model.itemFactors.select(
        F.col("id").alias("vec_id"), F.col("features").alias("embedding")
    )
    queries = factors
    if items is not None:
        ids = items.select(
            F.col(items.columns[0]).cast("int").alias("vec_id")
        )
        queries = factors.join(ids, "vec_id", "left_semi")
    out = cosine_topk_bruteforce(factors, queries, k=k)
    return out.select(
        F.col("query_id").alias(item_col),
        F.col("neighbor_id").alias("neighbor"),
        "cos",
        "rnk",
    )
