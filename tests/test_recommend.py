"""Recommendation operators: FP-Growth rule statistics against
hand-computed values, ALS determinism and output contract."""

from __future__ import annotations

from pyspark.sql import functions as F

from taar_gcp_etl_spark.operators.recommend import als_recommend, basket_rules


class TestBasketRules:
    def test_pair_statistics_match_hand_computation(self, spark):
        """Baskets: {a,b}, {a,b}, {a,c}, {b}. With minSupport=0.5 the only
        frequent pair is {a,b} (2/4). Rules at minConfidence=0.5:
        a→b conf = 2/3, lift = (2/3)/(3/4) = 8/9; b→a conf = 2/3,
        lift = (2/3)/(3/4) = 8/9."""
        rows = [
            (1, "a"), (1, "b"),
            (2, "a"), (2, "b"),
            (3, "a"), (3, "c"),
            (4, "b"),
        ]
        df = spark.createDataFrame(rows, "basket long, item string")
        out = {
            (r.antecedent, r.consequent): (
                r.support_pair,
                r.confidence,
                r.lift,
            )
            for r in basket_rules(
                df, "basket", "item", min_support=0.5, min_confidence=0.5
            ).collect()
        }
        assert set(out) == {("a", "b"), ("b", "a")}
        assert out[("a", "b")] == (0.5, round(2 / 3, 6), round(8 / 9, 6))
        assert out[("b", "a")] == (0.5, round(2 / 3, 6), round(8 / 9, 6))

    def test_duplicate_line_items_are_one_cooccurrence(self, spark):
        """A basket listing the same item twice (quantity fact) must not
        double-count support — collect_set, not collect_list."""
        rows = [(1, "a"), (1, "a"), (1, "b"), (2, "a"), (2, "b")]
        df = spark.createDataFrame(rows, "basket long, item string")
        out = basket_rules(
            df, "basket", "item", min_support=0.5, min_confidence=0.1
        ).collect()
        sup = {(r.antecedent, r.consequent): r.support_pair for r in out}
        assert sup[("a", "b")] == 1.0  # both baskets, not 1.5 of 2

    def test_full_rule_set_exposes_larger_antecedents(self, spark):
        rows = [
            (b, i) for b in range(1, 5) for i in ("a", "b", "c")
        ]  # every basket = {a,b,c}
        df = spark.createDataFrame(rows, "basket long, item string")
        full = basket_rules(
            df, "basket", "item", 0.5, 0.5, pairs_only=False
        )
        assert any(
            len(r.antecedent) == 2 for r in full.collect()
        )  # {a,b} -> c present


class TestAlsRecommend:
    def _ratings(self, spark):
        # two user blocks with disjoint strong preferences
        rows = [(u, i, 5) for u in (1, 2, 3) for i in (10, 11)]
        rows += [(u, i, 5) for u in (4, 5, 6) for i in (20, 21)]
        rows += [(1, 20, 1)]  # weak cross signal
        return spark.createDataFrame(rows, "user long, item long, n long")

    def test_contract_k_rows_per_user_ranked(self, spark):
        recs = als_recommend(
            self._ratings(spark), "user", "item", "n", k=2, rank=4, seed=7
        )
        rows = recs.collect()
        by_user = {}
        for r in rows:
            by_user.setdefault(r.user, []).append(r.rec_rank)
        assert set(by_user) == {1, 2, 3, 4, 5, 6}
        assert all(sorted(v) == [1, 2] for v in by_user.values())

    def test_seeded_fit_is_deterministic(self, spark):
        a = als_recommend(
            self._ratings(spark), "user", "item", "n", k=2, rank=4, seed=7
        ).collect()
        b = als_recommend(
            self._ratings(spark), "user", "item", "n", k=2, rank=4, seed=7
        ).collect()
        key = lambda r: (r.user, r.rec_rank)  # noqa: E731
        assert sorted(a, key=key) == sorted(b, key=key)

    def test_item_neighbors_recover_coliked_block(self, spark):
        """In factor space, 10's nearest neighbor is its co-liked twin 11
        (both consumed by the same user block), not the other block's
        items — behavioral similarity from the one fit. The `items`
        subset bounds which queries run (broadcast-side control)."""
        from taar_gcp_etl_spark.operators.recommend import (
            als_fit,
            als_item_neighbors,
        )

        model = als_fit(
            self._ratings(spark), "user", "item", "n", rank=4, seed=7
        )
        items = spark.createDataFrame([(10,)], "item long")
        out = als_item_neighbors(model, "item", k=1, items=items).collect()
        assert len(out) == 1
        assert out[0].item == 10 and out[0].neighbor == 11

    def test_block_preferences_recovered(self, spark):
        """Users in the 10/11 block should rank their own block's items
        first — the minimal sanity bar for the factorization."""
        recs = als_recommend(
            self._ratings(spark), "user", "item", "n", k=1, rank=4, seed=7
        )
        top = {r.user: r.item for r in recs.collect()}
        assert top[2] in (10, 11)
        assert top[5] in (20, 21)
