"""Invariants binding consolidated registry entries to the operators they
fold in (r2 registry budget: VERDICT r1 next-1), plus recall measurement for
the IVF ANN path.

The folded operators (fingerprint, coinstall_pairs, cube/rollup,
date_parts) remain implemented; these tests pin the containment relations
so the consolidation can't silently drift from the standalone semantics.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from taar_gcp_etl_spark.io import read_table
from tests.conftest import SF_SMOKE


class TestFoldedOperators:
    def test_fingerprint_is_min_winnow_hash(self, spark):
        """fingerprint(doc) == min(winnow hashes of doc): the global min
        4-gram hash is the min of its own window, so it survives winnowing,
        and every window min bounds it from above."""
        from taar_gcp_etl_spark.operators.text import (
            fingerprint,
            winnow_fingerprints,
        )

        docs = read_table(spark, SF_SMOKE, "documents")
        fp = {r.doc_id: r.fingerprint for r in fingerprint(docs).collect()}
        wmin = {
            r.doc_id: r.m
            for r in winnow_fingerprints(docs)
            .groupBy("doc_id")
            .agg(F.min("winnow_hash").alias("m"))
            .collect()
        }
        assert wmin  # non-trivial corpus
        for doc_id, m in wmin.items():
            assert fp[doc_id] == m

    def test_coinstall_pairs_is_projection_of_rates(self, spark):
        """coinstall_pairs == the a<b projection of coinstall_rates'
        pair_count column (the rates query carries both contracts)."""
        from taar_gcp_etl_spark.operators.ranking import (
            coinstall_pairs,
            coinstall_rates,
        )

        ev = read_table(spark, SF_SMOKE, "events")
        pairs = {
            (r.item_a, r.item_b): r.pair_count
            for r in coinstall_pairs(ev, "user_id", "event_type").collect()
        }
        from_rates = {
            (r.item_a, r.item_b): r.pair_count
            for r in coinstall_rates(ev, "user_id", "event_type")
            .filter(F.col("item_a") < F.col("item_b"))
            .collect()
        }
        assert pairs and pairs == from_rates

    def test_cube_rollup_contained_in_grouping_sets(self, spark):
        """The grouping_sets query's CUBE set list contains the ROLLUP sets
        and the plain GROUP BY — df.cube output must equal the registry
        query's rows."""
        from taar_gcp_etl_spark.queries import SPARK_QUERIES

        li = read_table(spark, SF_SMOKE, "lineitem")
        via_cube = {
            (r.l_returnflag, r.l_linestatus, r.n, r.sum_qty)
            for r in li.cube("l_returnflag", "l_linestatus")
            .agg(
                F.count("*").alias("n"),
                F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            )
            .collect()
        }
        via_registry = {
            (r.l_returnflag, r.l_linestatus, r.n, r.sum_qty)
            for r in SPARK_QUERIES["grouping_sets"](spark, SF_SMOKE).collect()
        }
        assert via_cube == via_registry


    def test_text_profile_folds_stats_and_language_id(self, spark):
        """text_profile == text_stats ⨝ language_id column-for-column (the
        r3b fold that freed two registry slots), and its plan must stay a
        single scan — no join operator anywhere."""
        from taar_gcp_etl_spark.operators.text import (
            language_id,
            text_profile,
            text_stats,
        )

        docs = read_table(spark, SF_SMOKE, "documents")
        prof = {r.doc_id: r.asDict() for r in text_profile(docs).collect()}
        stats = {r.doc_id: r.asDict() for r in text_stats(docs).collect()}
        lang = {r.doc_id: r.asDict() for r in language_id(docs).collect()}
        assert set(prof) == set(stats) == set(lang) and prof
        for doc_id, row in prof.items():
            assert row == {**stats[doc_id], **lang[doc_id]}
        plan = text_profile(docs)._jdf.queryExecution().executedPlan().toString()
        assert "Join" not in plan


class TestRegistryBudget:
    def test_first_50_entries_are_oracle_checkable(self):
        """Driver-contract invariant: the correctness artifact records the
        first 50 registry entries, so every one of the first 50 slots must
        be oracle-checkable (VERDICT r1 next-1). Overflow entries (51+) may
        be oracle-paired too — locally verified by test_oracle — but must
        be ordered oracle-paired first, rows-only last, so a larger driver
        budget covers the strongest checks first."""
        from taar_gcp_etl_spark.queries import ORACLE_SQL, SPARK_QUERIES

        names = list(SPARK_QUERIES)
        assert all(n in ORACLE_SQL for n in names[:50]), [
            n for n in names[:50] if n not in ORACLE_SQL
        ]
        tail_flags = [n in ORACLE_SQL for n in names[50:]]
        assert tail_flags == sorted(tail_flags, reverse=True), names[50:]
        assert not set(ORACLE_SQL) - set(names)


class TestIvf:
    def test_ivf_recall_vs_bruteforce(self, spark):
        """IVF with learned centroids (nprobe=2/8) must recover a meaningful
        fraction of the exact top-3 — and be deterministic across runs."""
        from taar_gcp_etl_spark.operators.similarity import (
            cosine_topk_bruteforce,
            donor_index,
            ivf_topk,
        )

        emb = read_table(spark, SF_SMOKE, "embeddings")
        queries = emb.filter(F.col("vec_id") < 20)
        exact = {
            (r.query_id, r.neighbor_id)
            for r in cosine_topk_bruteforce(emb, queries, k=3).collect()
        }
        assignments, centroids = donor_index(emb, k=8)
        got1 = {
            (r.query_id, r.neighbor_id)
            for r in ivf_topk(
                emb, assignments, centroids, queries, k=3, nprobe=2
            ).collect()
        }
        got2 = {
            (r.query_id, r.neighbor_id)
            for r in ivf_topk(
                emb, assignments, centroids, queries, k=3, nprobe=2
            ).collect()
        }
        assert got1 == got2  # deterministic
        recall = len(got1 & exact) / len(exact)
        assert recall >= 0.5, f"IVF recall {recall:.2f} below floor"

    def test_ivf_beats_sign_buckets_at_same_cost(self, spark):
        """The learned quantizer must not be WORSE than the axis-aligned
        sign buckets it replaces (VERDICT r1 next-9: 'raise recall at the
        same probe cost') — compare recall@3 against the exact top-3."""
        from taar_gcp_etl_spark.operators.similarity import (
            cosine_topk_bruteforce,
            cosine_topk_bucketed,
            donor_index,
            ivf_topk,
        )

        emb = read_table(spark, SF_SMOKE, "embeddings")
        queries = emb.filter(F.col("vec_id") < 20)
        exact = {
            (r.query_id, r.neighbor_id)
            for r in cosine_topk_bruteforce(emb, queries, k=3).collect()
        }
        assignments, centroids = donor_index(emb, k=8)
        ivf = {
            (r.query_id, r.neighbor_id)
            for r in ivf_topk(
                emb, assignments, centroids, queries, k=3, nprobe=2
            ).collect()
        }
        # sign buckets: 16 cells probed 1 deep ≈ comparable scored fraction
        sign = {
            (r.query_id, r.neighbor_id)
            for r in cosine_topk_bucketed(emb, queries, k=3).collect()
        }
        r_ivf = len(ivf & exact) / len(exact)
        r_sign = len(sign & exact) / len(exact)
        assert r_ivf >= r_sign, f"IVF {r_ivf:.2f} < sign-bucket {r_sign:.2f}"


class TestConnectedComponents:
    """dedup_clusters (r3): min-label propagation + pointer doubling over a
    near-dup edge list. The registry query folds the old ngram_jaccard
    entry — its all-pairs Jaccard stage is the edge source, pinned below."""

    def _labels(self, spark, edges, **kw):
        from taar_gcp_etl_spark.operators.dedup import connected_components

        df = spark.createDataFrame(edges, "doc_a long, doc_b long")
        return {
            r.doc_id: r.cluster_id
            for r in connected_components(df, **kw).collect()
        }

    def test_chain_clique_and_disjoint(self, spark):
        """A transitive chain, a separate clique, and a disjoint pair must
        each collapse to their min id."""
        got = self._labels(
            spark,
            [
                (1, 2), (2, 3), (3, 4),          # chain 1-2-3-4
                (10, 11), (10, 12), (11, 12),    # clique {10,11,12}
                (20, 21),                        # pair
            ],
        )
        assert got == {
            1: 1, 2: 1, 3: 1, 4: 1,
            10: 10, 11: 10, 12: 10,
            20: 20, 21: 20,
        }

    def test_long_chain_converges(self, spark):
        """Pointer doubling must close a 64-node chain well inside the
        iteration cap (O(log n) rounds, not O(n))."""
        edges = [(i, i + 1) for i in range(64)]
        got = self._labels(spark, edges, max_iter=10)
        assert set(got.values()) == {0}
        assert len(got) == 65

    def test_edges_are_ngram_jaccard_pairs(self, spark):
        """Containment (ngram_jaccard fold): the cluster query's edge set
        is exactly ngram_jaccard_pairs >= 0.5 — every edge's endpoints
        share a cluster, and docs in distinct clusters share no edge."""
        from taar_gcp_etl_spark.operators.dedup import ngram_jaccard_pairs
        from taar_gcp_etl_spark.queries import SPARK_QUERIES

        docs = read_table(spark, SF_SMOKE, "documents").filter(
            F.col("doc_id") < 256
        )
        edges = {
            (r.doc_a, r.doc_b)
            for r in ngram_jaccard_pairs(docs)
            .filter(F.col("jaccard") >= 0.5)
            .collect()
        }
        labels = {
            r.doc_id: r.cluster_id
            for r in SPARK_QUERIES["dedup_clusters"](
                spark, SF_SMOKE
            ).collect()
        }
        assert edges, "fixture should contain near-dup edges"
        for a, b in edges:
            assert labels[a] == labels[b]
        # a canonical doc is its own cluster id
        for doc, lbl in labels.items():
            assert labels[lbl] == lbl


class TestSemanticDedup:
    """SemDeDup-style embedding dedup (rows-only registry entry): cluster →
    within-cluster pair join → connected components → one canonical doc."""

    def test_exact_copies_collapse(self, spark):
        """Planted exact duplicates must land in one dup_group whose
        canonical is the minimum id; unique vectors stay singletons."""
        import numpy as np

        from taar_gcp_etl_spark.operators.similarity import semantic_dedup

        rng = np.random.default_rng(7)
        base = rng.normal(size=(20, 8))
        rows = [(i, [float(x) for x in base[i]]) for i in range(20)]
        # ids 100..104 are exact copies of ids 0..4
        rows += [(100 + i, [float(x) for x in base[i]]) for i in range(5)]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        got = {
            r.vec_id: (r.dup_group, r.is_canonical)
            for r in semantic_dedup(df, k=4, threshold=0.999).collect()
        }
        assert len(got) == 25
        for i in range(5):
            assert got[i] == (i, True)
            assert got[100 + i] == (i, False)
        for i in range(5, 20):
            assert got[i] == (i, True)

    def test_registry_query_invariants(self, spark):
        """Fixture-corpus run: deterministic across invocations; dup_group
        is always a member's min id; exactly one canonical per group;
        canonical iff dup_group == own id."""
        from taar_gcp_etl_spark.queries import SPARK_QUERIES

        q = SPARK_QUERIES["semantic_dedup"]
        rows1 = {tuple(r) for r in q(spark, SF_SMOKE).collect()}
        rows2 = {tuple(r) for r in q(spark, SF_SMOKE).collect()}
        assert rows1 == rows2 and rows1
        by_group: dict[int, list[tuple]] = {}
        for vec_id, _cluster, grp, canon in rows1:
            assert canon == (grp == vec_id)
            by_group.setdefault(grp, []).append(vec_id)
        for grp, members in by_group.items():
            assert grp == min(members)


class TestVocab:
    def test_vocab_counts_match_manual(self, spark):
        """Two-level aggregate == direct count/count-distinct on a toy
        corpus with repeats within and across documents."""
        from taar_gcp_etl_spark.operators.text import vocab_top_tokens

        df = spark.createDataFrame(
            [
                (1, "the cat the cat sat"),
                (2, "the dog sat"),
                (3, "  The CAT  "),
            ],
            "doc_id long, text string",
        )
        got = {
            r.token: (r.n_occurrences, r.n_docs)
            for r in vocab_top_tokens(df).collect()
        }
        assert got == {
            "the": (4, 3),
            "cat": (3, 2),
            "sat": (2, 2),
            "dog": (1, 1),
        }

    def test_top_n_is_deterministic_total_order(self, spark):
        """top_n truncation keys on (n_occurrences DESC, token): the
        selected set equals the manual sort's prefix."""
        from taar_gcp_etl_spark.operators.text import vocab_top_tokens

        docs = read_table(spark, SF_SMOKE, "documents")
        full = [
            (r.token, r.n_occurrences)
            for r in vocab_top_tokens(docs, top_n=100_000).collect()
        ]
        expect = sorted(full, key=lambda t: (-t[1], t[0]))[:50]
        got = [
            (r.token, r.n_occurrences)
            for r in vocab_top_tokens(docs, top_n=50).collect()
        ]
        assert sorted(got, key=lambda t: (-t[1], t[0])) == expect


class TestUnigramLmScore:
    def test_scores_match_manual_model(self, spark):
        """Hand-computed unigram model on a 2-doc corpus with a forced OOV:
        vocab_size=2 keeps {a, b} (tie b/c broken by token asc), total=5,
        so logprob(a)=ln(3/5), logprob(b)=ln(1/5), OOV floor ln(1/5)."""
        import math

        from taar_gcp_etl_spark.operators.text import unigram_lm_score

        df = spark.createDataFrame(
            [(1, "a a b"), (2, "a c")], "doc_id long, text string"
        )
        got = {
            r.doc_id: (r.n_tokens, r.nll)
            for r in unigram_lm_score(df, vocab_size=2).collect()
        }
        ln = math.log
        assert got == {
            1: (3, round(-(2 * ln(3 / 5) + ln(1 / 5)) / 3, 6)),
            2: (2, round(-(ln(3 / 5) + ln(1 / 5)) / 2, 6)),
        }

    def test_oov_scores_above_common_prose(self, spark):
        """A doc of corpus-frequent tokens must score lower (more natural)
        than a doc of out-of-vocab junk; whitespace-only docs emit no row."""
        from taar_gcp_etl_spark.operators.text import unigram_lm_score

        df = spark.createDataFrame(
            [
                (1, "the cat sat on the mat"),
                (2, "the the the cat cat sat"),
                (3, "zxqv jkwp qqzz"),
                (4, "   "),
            ],
            "doc_id long, text string",
        )
        got = {r.doc_id: r.nll for r in unigram_lm_score(df, vocab_size=4).collect()}
        assert set(got) == {1, 2, 3}  # doc 4 has no tokens -> no row
        assert got[2] < got[1] < got[3]


class TestSourceMix:
    def test_weights_normalize_and_upweight_tail(self, spark):
        """Mix weights must sum to 1; with alpha=0.5 every below-average
        source gets weight > its proportional share (the upsample-the-tail
        property), every above-average source gets less."""
        from taar_gcp_etl_spark.operators.text import source_mix

        docs = read_table(spark, SF_SMOKE, "documents")
        rows = source_mix(docs).collect()
        assert abs(sum(r.mix_weight for r in rows) - 1.0) < 1e-4
        assert abs(sum(r.token_share for r in rows) - 1.0) < 1e-4
        for r in rows:
            if r.token_share < 1.0 / len(rows):
                assert r.mix_weight > r.token_share
            elif r.token_share > 1.0 / len(rows):
                assert r.mix_weight < r.token_share

    def test_alpha_one_is_proportional(self, spark):
        """alpha=1 degenerates to proportional sampling: weight == share."""
        from taar_gcp_etl_spark.operators.text import source_mix

        docs = read_table(spark, SF_SMOKE, "documents")
        for r in source_mix(docs, alpha=1.0).collect():
            assert abs(r.mix_weight - r.token_share) <= 2e-6


class TestTokenizeIds:
    def test_roundtrip_in_vocab_tokens(self, spark):
        """Decoding token_ids through the vocabulary must reconstruct the
        original token stream wherever the token is in-vocab."""
        from taar_gcp_etl_spark.functions import tokens
        from taar_gcp_etl_spark.operators.text import (
            tokenize_to_ids,
            vocab_with_ids,
        )
        from taar_gcp_etl_spark.io import read_table
        from tests.conftest import SF_SMOKE

        docs = read_table(spark, SF_SMOKE, "documents").limit(50)
        vocab = vocab_with_ids(docs, vocab_size=30)
        id2tok = {r.id: r.token for r in vocab.collect()}
        encoded = {
            r.doc_id: r.token_ids
            for r in tokenize_to_ids(docs, vocab).collect()
        }
        originals = {
            r.doc_id: r.toks
            for r in docs.select(
                "doc_id", F.expr("split(trim(lower(text)), '\\\\s+')").alias("toks")
            ).collect()
        }
        assert set(encoded) == set(originals)
        n_invocab = 0
        for doc_id, ids in encoded.items():
            toks = originals[doc_id]
            assert len(ids) == len(toks)
            for tid, tok in zip(ids, toks):
                if tid != -1:
                    assert id2tok[tid] == tok
                    n_invocab += 1
        assert n_invocab > 0


class TestLshRecall:
    def test_precision_exact_and_recall_bounded(self, spark):
        """LSH near-dup vs the exact all-pairs baseline on a corpus with
        planted near-duplicates: every LSH pair must appear in the exact
        high-Jaccard set with the identical verified Jaccard (precision 1
        by construction — candidates are verified with the same shingle
        Jaccard), and banding must catch most true pairs (4 bands of one
        8-hex signature each: P(candidate) = 1-(1-j)^4 ≥ 0.94 at j = 0.5,
        so ≥ 70% recall on a small planted set is a loose floor)."""
        from pyspark.sql import functions as F

        from taar_gcp_etl_spark.operators.dedup import (
            lsh_near_dup_pairs,
            minhash_signatures,
            ngram_jaccard_pairs,
        )

        base = (
            read_table(spark, SF_SMOKE, "documents")
            .filter(F.length("text") > 50)
            .limit(15)
            .select("doc_id", "text")
        )
        # planted near-dups: same text + one appended token, offset ids
        perturbed = base.select(
            (F.col("doc_id") + 10_000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" appended")).alias("text"),
        )
        corpus = base.unionByName(perturbed)

        exact = {
            (r.doc_a, r.doc_b): r.jaccard
            for r in ngram_jaccard_pairs(corpus).collect()
            if r.jaccard >= 0.5
        }
        lsh = {
            (r.doc_a, r.doc_b): r.jaccard
            for r in lsh_near_dup_pairs(
                minhash_signatures(corpus), jaccard_threshold=0.5
            ).collect()
        }
        assert len(exact) >= 15  # every planted pair is a true near-dup
        for pair, j in lsh.items():
            assert pair in exact and exact[pair] == j  # precision 1, same j
        recall = len(lsh) / len(exact)
        assert recall >= 0.7, f"LSH recall {recall} on planted near-dups"


class TestPcaAnn:
    def test_variance_ordered_and_recall_above_chance(self, spark):
        """Explained variance must be non-increasing (components come
        out in eigenvalue order), and 16-dim PCA cosine top-3 must
        recall far more of the exact 64-dim top-3 than chance — the
        measured justification for running probes in the subspace."""
        from taar_gcp_etl_spark.io import read_table
        from taar_gcp_etl_spark.operators.similarity import (
            cosine_topk_bruteforce,
            pca_project,
        )

        emb = read_table(spark, "/root/testdata/sf0.001", "embeddings")
        projected, explained = pca_project(emb, k=16)
        assert explained == sorted(explained, reverse=True)
        assert sum(explained) > 0.2  # 16 of 64 dims keep real variance

        queries = emb.filter(F.col("vec_id") < 20)
        exact = {
            (r["query_id"], r["neighbor_id"])
            for r in cosine_topk_bruteforce(emb, queries, k=3).collect()
        }
        pq = projected.filter(F.col("vec_id") < 20)
        got = {
            (r["query_id"], r["neighbor_id"])
            for r in cosine_topk_bruteforce(projected, pq, k=3).collect()
        }
        recall = len(exact & got) / len(exact)
        # iid-random embeddings are PCA's worst case (flat spectrum, cf.
        # the PQ note in docs/NEXT.md) — assert far-above-chance, not
        # absolute: chance recall of 3 of 499 ≈ 0.006
        assert recall > 0.05

    def test_projection_shape_and_determinism(self, spark):
        from taar_gcp_etl_spark.io import read_table
        from taar_gcp_etl_spark.operators.similarity import pca_project

        emb = read_table(spark, "/root/testdata/sf0.001", "embeddings")
        p1, e1 = pca_project(emb, k=8)
        p2, e2 = pca_project(emb, k=8)
        assert e1 == e2
        r1 = sorted(map(tuple, p1.collect()))
        r2 = sorted(map(tuple, p2.collect()))
        assert r1 == r2
        assert all(len(r[1]) == 8 for r in r1)


class TestContainment:
    def test_quote_scores_high_where_jaccard_scores_low(self, spark):
        """The asymmetric case the operator exists for: a short doc
        quoted inside a much longer one — containment ≈ 1, Jaccard low."""
        from taar_gcp_etl_spark.operators.dedup import (
            containment_pairs,
            ngram_jaccard_pairs,
        )

        short = "alpha beta gamma delta epsilon zeta"
        filler = " ".join(f"word{i}" for i in range(60))
        rows = [(1, short), (2, filler + " " + short + " " + filler)]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        cont = {
            (r["doc_a"], r["doc_b"]): r["containment"]
            for r in containment_pairs(df, min_containment=0.8).collect()
        }
        assert cont.get((1, 2), 0) >= 0.99
        jac = {
            (r["doc_a"], r["doc_b"]): r["jaccard"]
            for r in ngram_jaccard_pairs(df).collect()
        }
        assert jac[(1, 2)] < 0.1


class TestRemoveRepeatedSpans:
    """Exact-substring dedup (Lee et al. ExactSubstr): corpus-repeated
    n-token spans are cut from every occurrence; unique text and short
    docs pass through."""

    SPAN = "one two three four five six seven eight"  # 8 tokens

    def test_repeated_span_cut_everywhere_unique_kept(self, spark):
        from taar_gcp_etl_spark.operators.dedup import (
            remove_repeated_spans,
        )

        rows = [
            (1, f"alpha beta {self.SPAN} gamma delta epsilon zeta"),
            (2, f"different head words {self.SPAN} and a unique tail"),
            (3, "totally unique document with enough tokens to gram"),
            (4, "short doc"),  # < n tokens: passes through
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {
            r.doc_id: r
            for r in remove_repeated_spans(df, n=8, min_count=2).collect()
        }
        # the shared span is gone from BOTH docs; their unique words stay
        for d in (1, 2):
            for w in self.SPAN.split():
                assert w not in out[d].text.split(), (d, w)
        assert out[1].text == "alpha beta gamma delta epsilon zeta"
        assert out[2].text == "different head words and a unique tail"
        assert out[1].n_removed == 8 and out[2].n_removed == 8
        assert out[3].text == rows[2][1] and out[3].n_removed == 0
        assert out[4].text == "short doc" and out[4].n_removed == 0

    def test_intra_document_repeat_counts(self, spark):
        """min_count applies to TOTAL occurrences — a span repeated
        twice inside one doc is removed too (both copies)."""
        from taar_gcp_etl_spark.operators.dedup import (
            remove_repeated_spans,
        )

        text = f"start {self.SPAN} middle words here {self.SPAN} end"
        df = spark.createDataFrame([(1, text)], "doc_id long, text string")
        out = remove_repeated_spans(df, n=8, min_count=2).collect()[0]
        assert out.text == "start middle words here end"
        assert out.n_removed == 16

    def test_overlapping_repeats_merge_coverage(self, spark):
        """Two docs sharing a 9-token run: both constituent 8-grams are
        repeated; covered positions overlap and the whole run is cut
        once (no double-removal, no stray survivors)."""
        from taar_gcp_etl_spark.operators.dedup import (
            remove_repeated_spans,
        )

        run = self.SPAN + " nine"
        rows = [(1, f"a b c {run} tail1"), (2, f"x y {run} tail2 z")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {
            r.doc_id: r
            for r in remove_repeated_spans(df, n=8, min_count=2).collect()
        }
        assert out[1].text == "a b c tail1"
        assert out[2].text == "x y tail2 z"
        assert out[1].n_removed == 9 and out[2].n_removed == 9

    def test_keep_first_preserves_one_canonical_copy(self, spark):
        """keep='first': the occurrence with the smallest (doc_id, pos)
        survives; every other occurrence of the repeated span is cut
        (NEXT.md r6 #5). Symmetric removal stays the default."""
        import pytest as _pytest

        from taar_gcp_etl_spark.operators.dedup import (
            remove_repeated_spans,
        )

        rows = [
            (1, f"alpha beta {self.SPAN} gamma delta epsilon zeta"),
            (2, f"different head words {self.SPAN} and a unique tail"),
            (3, f"third copy here {self.SPAN} trailing words too"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {
            r.doc_id: r
            for r in remove_repeated_spans(
                df, n=8, min_count=2, keep="first"
            ).collect()
        }
        # doc 1 holds the first occurrence: untouched
        assert out[1].text == rows[0][1]
        assert out[1].n_removed == 0
        # later occurrences are cut
        assert out[2].text == "different head words and a unique tail"
        assert out[3].text == "third copy here trailing words too"
        assert out[2].n_removed == 8 and out[3].n_removed == 8
        with _pytest.raises(ValueError, match="keep"):
            remove_repeated_spans(df, keep="last")

    def test_no_cached_relation_leaks_across_invocations(self, spark):
        """ADVICE r5: the corpus-gram relation is the operator's
        heaviest intermediate; it must be unpersisted before return —
        looped corpora / streaming foreachBatch would otherwise
        accumulate MEMORY_AND_DISK relations for the session lifetime."""
        from taar_gcp_etl_spark.operators.dedup import (
            remove_repeated_spans,
        )

        jsc = spark.sparkContext._jsc.sc()
        before = jsc.getPersistentRDDs().size()
        rows = [
            (1, f"alpha beta {self.SPAN} gamma"),
            (2, f"head {self.SPAN} tail"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        for _ in range(3):  # the leak was per-invocation
            remove_repeated_spans(df, n=8, min_count=2).collect()
        assert jsc.getPersistentRDDs().size() == before
