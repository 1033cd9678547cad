"""Adaptive-boundary segment-join soak: candidate-volume complexity
curves, even splits vs entropy-quantile boundaries (r6).

The corpus shape is the one even splits cannot survive: every string
is 12 random chars + a 16-char corpus-constant interior run + 12
random chars (40 chars, realistic entity-string entropy). The constant
run is NOT a global affix (random chars flank it), so affix trimming
can't remove it; the even-split middle piece for 40-char strings lies
WHOLLY inside the constant run — one corpus-wide hot key, quadratic
candidates. Entropy-quantile boundaries give every piece ~8 variable
chars, so candidate volume tracks the planted twins (~n/500) plus a
vanishing random-collision floor. (A first cut of this soak used
4-char flanks and measured BOTH paths quadratic — 8 variable chars
cannot discriminate 100k strings for ANY exact pigeonhole method;
candidate density is a property of corpus entropy, not just of the
boundary scheme. The 12-char version is the honest test of the
boundary placement itself.)

Measured: candidate counts and wall-clock at n = {1k, 2k, 4k} for the
even path (enough to expose the n^2 curve without melting local[32])
and n = {25k, 50k, 100k} for the adaptive path, plus recall (every
planted twin found) at the largest adaptive point.

Usage: python scripts/soak_adaptive_join.py  (one JSON line, writes
docs/bench_soak_adaptive_join.json)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from taar_gcp_etl_spark.operators import joins as J  # noqa: E402
from taar_gcp_etl_spark.session import get_spark  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
D = 2
NSEG = D + 1
CONST = "Z" * 16
FLANK = 12


def corpus(spark, n: int):
    """Deterministic interior-hot corpus: md5-derived FLANK-char
    flanks around the constant run; every 500th string gets a twin
    with the last char changed (the planted true pairs)."""
    base = spark.range(n).select(
        F.col("id"),
        F.concat(
            F.translate(
                F.substring(
                    F.md5(F.col("id").cast("string")), 1, FLANK
                ),
                "0123456789abcdef",
                "abcdefghijklmnop",
            ),
            F.lit(CONST),
            F.translate(
                F.substring(
                    F.md5(F.col("id").cast("string")), FLANK + 1, FLANK
                ),
                "0123456789abcdef",
                "abcdefghijklmnop",
            ),
        ).alias("t"),
    )
    total_len = 2 * FLANK + len(CONST)
    twins = base.filter(F.col("id") % 500 == 0).select(
        (F.col("id") + 10_000_000).alias("id"),
        F.concat(
            F.substring(F.col("t"), 1, total_len - 1), F.lit("q")
        ).alias("t"),
    )
    return base.unionByName(twins), (n + 499) // 500


def candidates(base_df, adaptive: bool):
    """Candidate stage only (ids), mirroring fuzzy_self_join_segments'
    internals so the soak measures the generator, not the verify."""
    piece = (
        "substring(_t, cast(floor({i} * {L} / %(nseg)d) as int) + 1 "
        "+ {s}, cast(floor(({i} + 1) * {L} / %(nseg)d) "
        "- floor({i} * {L} / %(nseg)d) as int))" % {"nseg": NSEG}
    )
    idx_keys = (
        "transform(sequence(0, %(d)d), i -> "
        "named_struct('seg', i, 'piece', %(p)s))"
        % {"d": D, "p": piece.format(i="i", L="_len", s="0")}
    )
    probe_piece = piece.format(i="i", L="L", s="s")
    probe_keys = (
        "array_distinct(filter(flatten(flatten("
        "transform(sequence(0, %(d)d), i -> "
        "transform(sequence(greatest(_len - %(d)d, 1), _len + %(d)d), "
        "L -> transform(sequence(-%(d)d, %(d)d), s -> "
        "CASE WHEN cast(floor(i * L / %(n)d) as int) + 1 + s >= 1 "
        "AND cast(floor(i * L / %(n)d) as int) + s "
        "+ cast(floor((i + 1) * L / %(n)d) - floor(i * L / %(n)d) "
        "as int) <= _len "
        "THEN named_struct('seg', i, 'piece', %(p)s) END))))), "
        "x -> x IS NOT NULL))" % {"d": D, "n": NSEG, "p": probe_piece}
    )
    if adaptive:
        bmap = J._entropy_boundaries(base_df, D, None, 512)
        return J._adaptive_candidates(base_df, D, bmap, [])
    return J._even_candidates(base_df, idx_keys, probe_keys, [])


def main() -> None:
    spark = get_spark(app_name="taar-spark-soak-adaptive", cpus="32")
    points = {"even": [1_000, 2_000, 4_000],
              "adaptive": [25_000, 50_000, 100_000]}
    out: dict = {"metric": "adaptive segment-join soak", "d": D,
                 "curves": {}}
    for mode, ns in points.items():
        curve = []
        for n in ns:
            df, _ = corpus(spark, n)
            base = df.select(
                F.col("id").alias("_id"),
                F.col("t").alias("_orig"),
                F.col("t").alias("_t"),
                F.length("t").alias("_len"),
            )
            t0 = time.perf_counter()
            n_cand = candidates(base, mode == "adaptive").count()
            dt = round(time.perf_counter() - t0, 2)
            curve.append({"n": n, "candidates": n_cand, "sec": dt})
        out["curves"][mode] = curve

    # recall at the largest adaptive point: every planted twin found
    n = points["adaptive"][-1]
    df, n_true = corpus(spark, n)
    t0 = time.perf_counter()
    pairs = J.fuzzy_self_join_segments(
        df, "t", "id", max_distance=D, adaptive_boundaries=True
    )
    found = pairs.filter(
        (F.col("id_b") - F.col("id_a")) == 10_000_000
    ).count()
    out["adaptive_end_to_end"] = {
        "n": n,
        "planted_pairs": n_true,
        "planted_found": found,
        "total_pairs": pairs.count(),
        "sec": round(time.perf_counter() - t0, 2),
    }
    # ---- per-BLOCK constant runs (r7): block-keyed boundaries ----
    # Each block's strings share a 16-char run of the block's letter;
    # the letter differs across blocks, so corpus-wide per-position
    # diversity sees >=n_blocks distinct chars everywhere and the
    # block-blind boundaries degrade to ~even splits — one hot key PER
    # BLOCK, quadratic again. Keying the boundary map by block
    # (block_cols in _entropy_boundaries) restores the cut.
    def corpus_blocked(n: int, n_blocks: int = 4):
        letters = "ZYXW"[:n_blocks]
        base = spark.range(n).select(
            F.col("id"),
            F.substring(
                F.lit(letters),
                (F.col("id") % n_blocks + 1).cast("int"), 1,
            ).alias("blk"),
        ).select(
            "id", "blk",
            F.concat(
                F.translate(
                    F.substring(
                        F.md5(F.col("id").cast("string")), 1, FLANK
                    ),
                    "0123456789abcdef", "abcdefghijklmnop",
                ),
                F.repeat(F.col("blk"), len(CONST)),
                F.translate(
                    F.substring(
                        F.md5(F.col("id").cast("string")),
                        FLANK + 1, FLANK,
                    ),
                    "0123456789abcdef", "abcdefghijklmnop",
                ),
            ).alias("t"),
        )
        total_len = 2 * FLANK + len(CONST)
        twins = base.filter(F.col("id") % 500 == 0).select(
            (F.col("id") + 10_000_000).alias("id"),
            F.col("blk"),
            F.concat(
                F.substring(F.col("t"), 1, total_len - 1), F.lit("q")
            ).alias("t"),
        )
        return base.unionByName(twins), (n + 499) // 500

    # block_blind      = LEGACY corpus-wide entropy (blind_clusters off)
    #                    — the measured quadratic failure mode
    # blind_hybrid (r8) = no block column, frequent-gram template
    #                    clusters → conditional entropy; must track the
    #                    block_keyed linear curve
    # block_keyed      = explicit block_cols in the boundary aggregate
    blk_points = {"block_blind": [2_000, 4_000, 8_000],
                  "blind_hybrid": [25_000, 50_000, 100_000],
                  "block_keyed": [25_000, 50_000, 100_000]}
    for mode, ns in blk_points.items():
        curve = []
        for n in ns:
            df, _ = corpus_blocked(n)
            base = df.select(
                F.col("id").alias("_id"),
                F.col("t").alias("_orig"),
                F.col("t").alias("_t"),
                F.length("t").alias("_len"),
                "blk",
            )
            t0 = time.perf_counter()
            bmap = J._entropy_boundaries(
                base, D, None, 512,
                block_cols=["blk"] if mode == "block_keyed" else None,
                blind_clusters=(mode == "blind_hybrid"),
            )
            if mode != "block_keyed":
                # re-key the corpus-wide map to every block so the
                # block-scoped candidate join actually CONSULTS the
                # blind boundaries (review fix: keyed ('', L) entries
                # never matched _bbk in {Z,Y,X,W}, so the first cut of
                # this arm silently measured the even-split fallback)
                blks = [r.blk for r in base.select("blk")
                        .distinct().collect()]
                bmap = {(b, L): v for (_, L), v in bmap.items()
                        for b in blks}
            n_cand = J._adaptive_candidates(
                base, D, bmap, ["blk"]
            ).count()
            dt = round(time.perf_counter() - t0, 2)
            curve.append({"n": n, "candidates": n_cand, "sec": dt})
        out["curves"][mode] = curve

    # ---- SHORT entity strings (r8): length-adapted mining gram ----
    # 18-char strings, 20 latent blocks, each with a distinct 6-digit
    # run at positions 7-12. The run fits a whole piece (18/3) but not
    # the fixed 8-gram, so only the median_len/(d+1)-sized gram can
    # mine the template markers; corpus-wide boundaries leave the
    # middle piece inside the per-block run (hot key per block).
    def corpus_short(n: int, n_blocks: int = 20):
        base = spark.range(n).select(
            F.col("id"),
            F.concat(
                F.translate(
                    F.substring(F.md5(F.col("id").cast("string")), 1, 6),
                    "0123456789abcdef", "abcdefghabcdefgh",
                ),
                F.lpad(
                    ((F.col("id") % n_blocks) * 53421 + 123456)
                    .cast("string"), 6, "0",
                ),
                F.translate(
                    F.substring(F.md5(F.col("id").cast("string")), 7, 6),
                    "0123456789abcdef", "abcdefghabcdefgh",
                ),
            ).alias("t"),
        )
        twins = base.filter(F.col("id") % 500 == 0).select(
            (F.col("id") + 10_000_000).alias("id"),
            F.concat(F.substring(F.col("t"), 1, 17), F.lit("q")).alias("t"),
        )
        return base.unionByName(twins), (n + 499) // 500

    # BOTH arms at the same n: 18-char strings carry ~12 variable
    # chars over an 8-letter alphabet, so a ~4-char piece has only
    # 8^4 = 4096 values — at that entropy every exact pigeonhole
    # scheme rides a quadratic piece-collision floor (the r6
    # 4-char-flank ceiling), and with a FIXED block count the hot-key
    # term is quadratic too. The claim under test is the CONSTANT: the
    # adapted gram removes the per-block hot middle piece, cutting
    # candidates ~4.5x down to the floor itself (measured 399.7k ->
    # 87.2k at 4k).
    short_points = {"short_blind_legacy": [1_000, 2_000, 4_000],
                    "short_blind_hybrid": [1_000, 2_000, 4_000]}
    for mode, ns in short_points.items():
        curve = []
        for n in ns:
            df, _ = corpus_short(n)
            base = df.select(
                F.col("id").alias("_id"),
                F.col("t").alias("_orig"),
                F.col("t").alias("_t"),
                F.length("t").alias("_len"),
            )
            t0 = time.perf_counter()
            bmap = J._entropy_boundaries(
                base, D, None, 512,
                blind_clusters=(mode == "short_blind_hybrid"),
            )
            n_cand = J._adaptive_candidates(base, D, bmap, []).count()
            dt = round(time.perf_counter() - t0, 2)
            curve.append({"n": n, "candidates": n_cand, "sec": dt})
        out["curves"][mode] = curve

    # ---- candidate-volume guard (r9): the SCALE.md short-string
    # ceiling turned into a plan-time guard. At 100k strings (past
    # _GUARD_MIN_ROWS) the default candidate_budget="auto" estimates
    # expected cross-pair volume from a 50k-string sample; the short
    # 18-char/8-letter fixture rides the quadratic piece-collision
    # floor even under adaptive boundaries (they cut the constant ~4.5x,
    # not the exponent) so the guard MUST warn there, while the 40-char
    # long-string fixture's adaptive candidates track the planted twins
    # and the guard MUST stay silent. Construction only — the guard
    # runs eagerly, the join itself stays lazy, so this arm costs one
    # boundary pass + one sampled estimate per fixture.
    import warnings as _warnings

    from taar_gcp_etl_spark.operators.joins import (
        estimate_fuzzy_join_candidates,
    )

    guard_out = {}
    for gname, mk in {
        "short_fixture": lambda n: corpus_short(n)[0],
        "long_fixture": lambda n: corpus(spark, n)[0],
    }.items():
        gdf = mk(100_000)
        est = estimate_fuzzy_join_candidates(
            gdf, "t", "id", adaptive_boundaries=True
        )
        with _warnings.catch_warnings(record=True) as caught:
            _warnings.simplefilter("always")
            J.fuzzy_self_join_segments(
                gdf, "t", "id", adaptive_boundaries=True
            )
        fired = any(
            issubclass(w.category, RuntimeWarning)
            and "candidate volume" in str(w.message)
            for w in caught
        )
        guard_out[gname] = {
            "n": est["n"],
            "sample_frac": round(est["sample_frac"], 3),
            "estimate": round(est["estimate"]),
            "auto_limit": 64 * est["n"],
            "guard_fired": fired,
        }
    out["guard"] = guard_out

    # exactness at 8k: short-string blind hybrid == even path
    df, n_true = corpus_short(8_000)
    norm8 = lambda pairs: sorted(  # noqa: E731
        (r.id_a, r.id_b, r.dist) for r in pairs.collect()
    )
    even8 = norm8(J.fuzzy_self_join_segments(df, "t", "id", max_distance=D))
    adap8 = norm8(J.fuzzy_self_join_segments(
        df, "t", "id", max_distance=D, adaptive_boundaries=True,
    ))
    out["short_end_to_end"] = {
        "n": 8_000,
        "planted_pairs": n_true,
        "planted_found": sum(1 for a, b, _ in adap8
                             if b - a == 10_000_000),
        "total_pairs": len(adap8),
        "matches_even_path": adap8 == even8,
    }

    # exactness at 8k: block-keyed adaptive == even path (the all-pairs
    # oracle shape), with every planted within-block twin found
    df, n_true = corpus_blocked(8_000)
    norm = lambda pairs: sorted(  # noqa: E731
        (r.id_a, r.id_b, r.dist) for r in pairs.collect()
    )
    even = norm(J.fuzzy_self_join_segments(
        df, "t", "id", block_cols=["blk"], max_distance=D
    ))
    t0 = time.perf_counter()
    adap_df = J.fuzzy_self_join_segments(
        df, "t", "id", block_cols=["blk"], max_distance=D,
        adaptive_boundaries=True,
    )
    adap = norm(adap_df)
    out["blocked_end_to_end"] = {
        "n": 8_000,
        "planted_pairs": n_true,
        "planted_found": sum(
            1 for a, b, _ in adap if b - a == 10_000_000
        ),
        "total_pairs": len(adap),
        "matches_even_path": adap == even,
        "sec": round(time.perf_counter() - t0, 2),
    }

    line = json.dumps(out)
    print(line)
    with open(
        os.path.join(REPO, "docs", "bench_soak_adaptive_join.json"), "w"
    ) as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()
