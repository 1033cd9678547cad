"""Property-based tests (hypothesis): the composed Spark operators must
agree with straightforward single-node Python reference implementations on
randomized inputs — catching edge cases fixed fixtures miss (empty groups,
ties, all-null sides)."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from taar_gcp_etl_spark.operators.joins import asof_join_backward
from taar_gcp_etl_spark.operators.windows import sessionize_gaps_and_islands

TS0 = dt.datetime(2024, 1, 1)

events_strategy = st.lists(
    st.tuples(
        st.integers(0, 3),  # key
        st.integers(0, 10_000),  # seconds offset
    ),
    min_size=0,
    max_size=40,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(left=events_strategy, right=events_strategy)
def test_asof_join_matches_reference(spark, left, right):
    """asof_join_backward == per-row 'max right ts <= left ts' lookup."""
    lrows = [
        (i, k, TS0 + dt.timedelta(seconds=s)) for i, (k, s) in enumerate(left)
    ]
    # dedup right per (key, ts) as the operator contract requires
    rmap = {}
    for i, (k, s) in enumerate(right):
        rmap[(k, s)] = max(rmap.get((k, s), -1), i + 1000)
    rrows = [
        (k, TS0 + dt.timedelta(seconds=s), v) for (k, s), v in rmap.items()
    ]
    ldf = spark.createDataFrame(lrows, ["lid", "k", "ts"]) if lrows else None
    if ldf is None:
        return
    rdf = spark.createDataFrame(rrows, ["k", "rts", "rv"]) if rrows else (
        spark.createDataFrame([], "k int, rts timestamp, rv long")
    )
    got = {
        r.lid: r.rv
        for r in asof_join_backward(ldf, rdf, "k", "ts", "rts", "rv").collect()
    }
    for lid, k, ts in lrows:
        cands = [v for (rk, rts, v) in rrows if rk == k and rts <= ts]
        best = max(
            (v for (rk, rts, v) in rrows if rk == k and rts <= ts),
            key=lambda v: max(
                rts for (rk, rts, vv) in rrows if rk == k and vv == v
            ),
            default=None,
        )
        # reference: value of the LATEST right row at-or-before ts
        latest_ts = max(
            (rts for (rk, rts, v) in rrows if rk == k and rts <= ts),
            default=None,
        )
        want = None
        if latest_ts is not None:
            want = next(
                v
                for (rk, rts, v) in rrows
                if rk == k and rts == latest_ts
            )
        assert got[lid] == want, (lid, k, ts, got[lid], want, cands, best)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(events=events_strategy)
def test_sessionize_matches_reference(spark, events):
    """gaps-and-islands sessionization == linear scan reference."""
    rows = [
        (i, k, TS0 + dt.timedelta(seconds=s)) for i, (k, s) in enumerate(events)
    ]
    if not rows:
        return
    df = spark.createDataFrame(rows, ["eid", "k", "ts"])
    out = sessionize_gaps_and_islands(df, "k", "ts", gap_seconds=600)
    got = {
        (r.k, r.session_id): r.n
        for r in out.groupBy("k", "session_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    # reference: sort per key, break when gap > 600
    want: dict[tuple[int, int], int] = {}
    bykey: dict[int, list[dt.datetime]] = {}
    for _, k, ts in rows:
        bykey.setdefault(k, []).append(ts)
    for k, tss in bykey.items():
        tss.sort()
        sid = 0
        prev = None
        for ts in tss:
            if prev is not None and (ts - prev).total_seconds() > 600:
                sid += 1
            want[(k, sid)] = want.get((k, sid), 0) + 1
            prev = ts
    assert got == want


zvals = st.lists(
    st.tuples(st.integers(0, (1 << 16) - 1), st.integers(0, (1 << 16) - 1)),
    min_size=1,
    max_size=30,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(pts=zvals)
def test_zorder_key_matches_reference_and_is_injective(spark, pts):
    """Morton interleave == bit-twiddling reference; distinct (x, y) pairs
    must map to distinct keys (bijectivity of the interleave)."""
    from taar_gcp_etl_spark.operators.layout import zorder_key

    def morton2(x: int, y: int) -> int:
        out = 0
        for b in range(16):
            out |= ((x >> b) & 1) << (2 * b)
            out |= ((y >> b) & 1) << (2 * b + 1)
        return out

    df = spark.createDataFrame(pts, ["x", "y"])
    got = df.select("x", "y", zorder_key(["x", "y"]).alias("z")).collect()
    for r in got:
        assert r.z == morton2(r.x, r.y)
    uniq_pts = {(x, y) for x, y in pts}
    assert len({morton2(x, y) for x, y in uniq_pts}) == len(uniq_pts)


texts = st.lists(
    st.text(
        alphabet="abcdefg hij",
        min_size=0,
        max_size=60,
    ),
    min_size=1,
    max_size=12,
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(docs=texts)
def test_simhash64_identity_and_digest_range(spark, docs):
    """Identical texts get identical digests; each 32-bit word stays within
    unsigned-32 range (engine portability invariant); digest of a
    duplicated corpus equals digest of the original."""
    from taar_gcp_etl_spark.operators.dedup import simhash64

    rows = [(i, t) for i, t in enumerate(docs)] + [
        (i + 1000, t) for i, t in enumerate(docs)  # duplicate corpus
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r.doc_id: (r.simhash_hi, r.simhash_lo) for r in simhash64(df).collect()}
    for i, _t in enumerate(docs):
        assert got[i] == got[i + 1000]  # identity
    for hi, lo in got.values():
        assert 0 <= hi < (1 << 32) and 0 <= lo < (1 << 32)


class TestSampling:
    """Deterministic sampling operators (operators/sampling.py)."""

    def test_stratified_sample_deterministic_and_rate_shaped(self, spark):
        from taar_gcp_etl_spark.io import read_table
        from taar_gcp_etl_spark.operators.sampling import stratified_sample
        from tests.conftest import SF_SMOKE

        ev = read_table(spark, SF_SMOKE, "events")
        rates = spark.createDataFrame(
            [("click", 0.3), ("view", 0.0), ("purchase", 1.0)],
            "event_type string, rate double",
        )
        a = stratified_sample(ev, rates, "event_type", "event_id")
        b = stratified_sample(ev, rates, "event_type", "event_id")
        ids_a = sorted(r.event_id for r in a.collect())
        assert ids_a == sorted(r.event_id for r in b.collect())

        by_type = {
            r.event_type: r.n
            for r in a.groupBy("event_type").agg(
                F.count("*").alias("n")
            ).collect()
        }
        totals = {
            r.event_type: r.n
            for r in ev.groupBy("event_type").agg(
                F.count("*").alias("n")
            ).collect()
        }
        assert "view" not in by_type                 # rate 0.0
        assert by_type["purchase"] == totals["purchase"]  # rate 1.0
        frac = by_type["click"] / totals["click"]    # rate 0.3 ± noise
        assert 0.15 < frac < 0.45
        assert "error" not in by_type                # stratum absent → drop

    def test_take_n_exact_counts_and_determinism(self, spark):
        from taar_gcp_etl_spark.io import read_table
        from taar_gcp_etl_spark.operators.sampling import (
            deterministic_take_n,
        )
        from tests.conftest import SF_SMOKE

        ev = read_table(spark, SF_SMOKE, "events")
        take = deterministic_take_n(ev, "event_type", "event_id", 7)
        counts = {
            r.event_type: r.n
            for r in take.groupBy("event_type").agg(
                F.count("*").alias("n")
            ).collect()
        }
        totals = {
            r.event_type: r.n
            for r in ev.groupBy("event_type").agg(
                F.count("*").alias("n")
            ).collect()
        }
        for t, total in totals.items():
            assert counts.get(t, 0) == min(7, total)
        again = deterministic_take_n(ev, "event_type", "event_id", 7)
        assert sorted(r.event_id for r in take.collect()) == sorted(
            r.event_id for r in again.collect()
        )


texts_for_packing = st.lists(
    st.one_of(
        st.none(),  # NULL text must contribute 0 tokens, not poison the sum
        st.text(alphabet=st.sampled_from("ab \n\t"), min_size=0, max_size=60),
    ),
    min_size=1,
    max_size=25,
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=texts_for_packing, seq_len=st.integers(1, 17))
def test_pack_sequences_matches_reference(spark, docs, seq_len):
    """Distributed prefix-sum packing must agree with the obvious serial
    reference on arbitrary (including whitespace-only and empty) texts."""
    import re

    from taar_gcp_etl_spark.operators.packing import pack_sequences

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_tokens, r.tokens_before, r.seq_id, r.offset_in_seq)
        for r in pack_sequences(df, seq_len, num_partitions=3).collect()
    }
    running = 0
    for i, t in enumerate(docs):
        # tokens(): split(trim(lower(text)), '\s+') — note SQL trim strips
        # ONLY 0x20 spaces (Spark and DuckDB agree), unlike Python strip();
        # NULL text counts as 0 tokens by contract
        n = 0 if t is None else len(re.split(r"\s+", t.strip(" ").lower()))
        assert got[i] == (n, running, running // seq_len, running % seq_len)
        running += n


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    docs=st.lists(
        st.text(alphabet=st.sampled_from("xy z"), min_size=0, max_size=700),
        min_size=1,
        max_size=10,
    )
)
def test_chunk_docs_covers_text_exactly(spark, docs):
    """Chunking invariants over the PRODUCTION operator (same size/stride
    as q_chunk_docs): chunk 0 starts at position 0, consecutive chunks
    overlap by size-stride chars, concatenating each chunk's
    non-overlapping tail reconstructs the document."""
    from taar_gcp_etl_spark.operators.text import chunk_documents

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    )
    size, stride = 300, 250
    out = chunk_documents(df, size=size, stride=stride).collect()
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append((r.chunk_id, r.chunk_text))
    for i, t in enumerate(docs):
        chunks = [c for _, c in sorted(by_doc[i])]
        assert chunks[0] == t[:size]
        rebuilt = chunks[0]
        for c in chunks[1:]:
            assert rebuilt[-(size - stride):] == c[: size - stride] or len(
                rebuilt
            ) < size
            rebuilt += c[size - stride:] if len(c) > size - stride else ""
        assert rebuilt == t or (t == "" and rebuilt == "")


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(left=events_strategy, right=events_strategy)
def test_asof_forward_matches_reference(spark, left, right):
    """direction='forward' == per-row 'min right ts >= left ts' lookup —
    the mirror property of the backward test."""
    lrows = [
        (i, k, TS0 + dt.timedelta(seconds=s)) for i, (k, s) in enumerate(left)
    ]
    if not lrows:
        return
    rmap = {}
    for i, (k, s) in enumerate(right):
        rmap[(k, s)] = max(rmap.get((k, s), -1), i + 1000)
    rrows = [
        (k, TS0 + dt.timedelta(seconds=s), v) for (k, s), v in rmap.items()
    ]
    ldf = spark.createDataFrame(lrows, ["lid", "k", "ts"])
    rdf = spark.createDataFrame(rrows, ["k", "rts", "rv"]) if rrows else (
        spark.createDataFrame([], "k int, rts timestamp, rv long")
    )
    got = {
        r.lid: r.rv
        for r in asof_join_backward(
            ldf, rdf, "k", "ts", "rts", "rv", direction="forward"
        ).collect()
    }
    for lid, k, ts in lrows:
        earliest_ts = min(
            (rts for (rk, rts, v) in rrows if rk == k and rts >= ts),
            default=None,
        )
        want = None
        if earliest_ts is not None:
            want = next(
                v
                for (rk, rts, v) in rrows
                if rk == k and rts == earliest_ts
            )
        assert got[lid] == want, (lid, k, ts, got[lid], want)


funnel_events = st.lists(
    st.tuples(
        st.integers(0, 4),  # user
        st.integers(0, 2),  # step index into the type list
        st.integers(0, 5_000),  # seconds offset
    ),
    min_size=0,
    max_size=40,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(events=funnel_events)
def test_funnel_matches_reference(spark, events):
    """funnel_steps == the per-user sequential scan: step k's conversion
    time is the earliest step-k event strictly after step k-1's."""
    from taar_gcp_etl_spark.operators.analytics import funnel_steps

    steps = ["view", "click", "purchase"]
    rows = [
        (u, steps[si], TS0 + dt.timedelta(seconds=s))
        for (u, si, s) in events
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp"
    )
    got = {
        r.step: r.users
        for r in funnel_steps(df, steps).collect()
    }

    # driver-side reference
    want = {}
    frontier = {}
    for i, step in enumerate(steps):
        nxt = {}
        for u in {u for (u, _, _) in events}:
            times = [
                TS0 + dt.timedelta(seconds=s)
                for (uu, si, s) in events
                if uu == u and steps[si] == step
            ]
            if i == 0:
                cands = times
            elif u in frontier:
                cands = [t for t in times if t > frontier[u]]
            else:
                cands = []
            if cands:
                nxt[u] = min(cands)
        frontier = nxt
        want[step] = len(frontier)
    assert got == want


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    vals_a=st.lists(st.floats(-50, 150, allow_nan=False), min_size=1, max_size=30),
    vals_b=st.lists(st.floats(-50, 150, allow_nan=False), min_size=1, max_size=30),
)
def test_psi_symmetric_and_nonnegative(spark, vals_a, vals_b):
    """PSI properties: symmetric under side swap (the term is
    antisymmetric-in-sign twice over), non-negative, ~0 for identical
    inputs; out-of-range values clamp rather than vanish (bin shares
    always sum to 1)."""
    from taar_gcp_etl_spark.operators.analytics import distribution_psi

    a = spark.createDataFrame([(v,) for v in vals_a], "v double")
    b = spark.createDataFrame([(v,) for v in vals_b], "v double")
    psi_ab = distribution_psi(a, b, "v", 0.0, 100.0).agg(
        F.sum("psi_term")
    ).collect()[0][0]
    psi_ba = distribution_psi(b, a, "v", 0.0, 100.0).agg(
        F.sum("psi_term")
    ).collect()[0][0]
    assert abs(psi_ab - psi_ba) < 1e-9
    assert psi_ab > -1e-12
    psi_aa = distribution_psi(a, a, "v", 0.0, 100.0).agg(
        F.sum("psi_term")
    ).collect()[0][0]
    assert abs(psi_aa) < 1e-9


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    weights=st.lists(
        st.integers(-2, 10_000), min_size=1, max_size=40, unique=True
    ),
    n=st.integers(1, 10),
)
def test_weighted_sample_threshold_equals_exact(spark, weights, n):
    """The sketch-threshold physical plan must select the IDENTICAL row
    set as the TakeOrdered plan for any weights (incl. non-positive,
    which both exclude) and any n (incl. n > |eligible|)."""
    from taar_gcp_etl_spark.operators.sampling import (
        weighted_sample_n,
        weighted_sample_threshold,
    )

    df = spark.createDataFrame(
        [(i, w) for i, w in enumerate(weights)], "id long, w long"
    )
    exact = sorted(
        r.id for r in weighted_sample_n(df, n, "w", "id").collect()
    )
    thresh = sorted(
        r.id
        for r in weighted_sample_threshold(df, n, "w", "id").collect()
    )
    spark.catalog.clearCache()
    assert thresh == exact


kv_rows = st.lists(
    st.tuples(st.integers(0, 8), st.integers(-50, 50)),
    min_size=0,
    max_size=60,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(rows=kv_rows, k=st.integers(2, 6))
def test_heavy_hitters_matches_group_by_having(spark, rows, k):
    """heavy_hitters == GROUP BY key HAVING count > n/k on arbitrary
    data — including empty inputs, single-key inputs, and exact-boundary
    frequencies (strictly-greater must hold)."""
    from taar_gcp_etl_spark.operators.analytics import heavy_hitters

    df = spark.createDataFrame(
        [(str(a), b) for a, b in rows] or [("x", 0)],
        "key string, v long",
    )
    if not rows:
        df = df.limit(0)
    got = {
        (r["key"], r["freq"])
        for r in heavy_hitters(df, "key", k=k).collect()
    }
    n = len(rows)
    from collections import Counter

    cnt = Counter(str(a) for a, _ in rows)
    expect = {(key, c) for key, c in cnt.items() if c > n / k}
    assert got == expect


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(rows=kv_rows, split=st.integers(0, 4))
def test_refresh_aggregate_identity_on_random_splits(spark, rows, split):
    """agg(history ∪ delta) == merge(agg(history), agg(delta)) for any
    split point of any data — the maintenance identity as a property,
    covering empty history, empty delta, and delta-only keys."""
    from taar_gcp_etl_spark.operators.merge import refresh_aggregate

    history = [(a, float(b)) for a, b in rows if a % 5 >= split]
    delta = [(a, float(b)) for a, b in rows if a % 5 < split]
    hdf = spark.createDataFrame(history or [(0, 0.0)], "k long, v double")
    if not history:
        hdf = hdf.limit(0)
    ddf = spark.createDataFrame(delta or [(0, 0.0)], "k long, v double")
    if not delta:
        ddf = ddf.limit(0)
    measures = {
        "total": ("sum", "v"),
        "n": ("count", "v"),
        "mx": ("max", "v"),
        "mn": ("min", "v"),
    }
    store = hdf.groupBy("k").agg(
        F.sum("v").alias("total"),
        F.count("v").alias("n"),
        F.max("v").alias("mx"),
        F.min("v").alias("mn"),
    )
    got = {
        r["k"]: (r["total"], r["n"], r["mx"], r["mn"])
        for r in refresh_aggregate(store, ddf, ["k"], measures).collect()
    }
    from collections import defaultdict

    by_key = defaultdict(list)
    for a, b in history + delta:
        by_key[a].append(b)
    expect = {
        a: (sum(vs), len(vs), max(vs), min(vs)) for a, vs in by_key.items()
    }
    assert got == expect


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    pairs=st.lists(
        st.tuples(st.integers(0, 25), st.integers(0, 25)),
        min_size=0,
        max_size=60,
    )
)
def test_connected_components_match_union_find(spark, pairs):
    """Distributed min-label CC == single-node union-find on arbitrary
    graphs (self-loops, parallel edges, stars, chains)."""
    from taar_gcp_etl_spark.operators.dedup import connected_components

    edges = [(a, b) for a, b in pairs if a != b]
    if not edges:
        return
    df = spark.createDataFrame(edges, ["doc_a", "doc_b"])
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(df).collect()
    }

    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    expect = {x: find(x) for x in parent}
    assert got == expect


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    pairs=st.lists(
        st.tuples(st.integers(0, 25), st.integers(0, 25)),
        min_size=1,
        max_size=50,
    )
)
def test_alternating_cc_matches_propagation(spark, pairs):
    """The large-star/small-star variant and min-label propagation must
    produce identical labelings on arbitrary graphs."""
    from taar_gcp_etl_spark.operators.dedup import (
        connected_components,
        connected_components_alternating,
    )

    edges = [(a, b) for a, b in pairs if a != b]
    if not edges:
        return
    df = spark.createDataFrame(edges, ["doc_a", "doc_b"])
    prop = sorted(map(tuple, connected_components(df).collect()))
    alt = sorted(
        map(tuple, connected_components_alternating(df).collect())
    )
    assert prop == alt


@settings(
    max_examples=40,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    h=st.integers(min_value=1, max_value=24),
    w=st.integers(min_value=1, max_value=24),
    n_colors=st.integers(min_value=2, max_value=200),
    interlace=st.booleans(),
    clear_every=st.integers(min_value=1, max_value=64),
    use_lct=st.booleans(),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_gif_lzw_roundtrip_property(
    spark, h, w, n_colors, interlace, clear_every, use_lct, seed
):
    """GIF decode is the exact inverse of the spec-built test encoder
    for ANY size / palette cardinality / interlace flag / clear
    cadence — the property that pins the variable-width LZW bit
    unpacking, dictionary growth, and 4-pass de-interleave against
    off-by-one regressions (encoder and decoder share no code)."""
    import numpy as np

    from taar_gcp_etl_spark.operators.gif import decode_gif
    from tests.test_streaming_multimodal_sources import _gif_bytes

    rng = np.random.RandomState(seed)
    pal = rng.randint(0, 256, size=(n_colors, 3)).astype(np.uint8)
    idx = rng.randint(0, n_colors, size=(h, w)).astype(np.uint8)
    blob = _gif_bytes(
        idx, pal, interlace=interlace, use_lct=use_lct,
        clear_every=clear_every,
    )
    got = decode_gif(blob)
    assert got.shape == (h, w, 3)
    assert np.array_equal(got, pal[idx])


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    docs=st.lists(
        st.lists(
            st.sampled_from("aa bb cc dd ee ff".split()),
            min_size=0,
            max_size=12,
        ),
        min_size=1,
        max_size=6,
    ),
    n=st.integers(min_value=2, max_value=4),
    min_count=st.integers(min_value=2, max_value=3),
    keep=st.sampled_from(["all", "first"]),
)
def test_remove_repeated_spans_matches_pure_python(
    spark, docs, n, min_count, keep
):
    """remove_repeated_spans == an independent pure-Python reference
    over random tiny-vocabulary corpora (small vocab maximizes gram
    collisions — the interesting regime), for BOTH keep policies."""
    from collections import defaultdict

    from taar_gcp_etl_spark.operators.dedup import remove_repeated_spans

    # Spark's split("") (and DuckDB's string_split) yield [''] — an
    # empty doc is ONE empty token in the operator's tokenizer; mirror
    toks = {i: (d if d else [""]) for i, d in enumerate(docs)}
    occurrences = defaultdict(list)  # gram content -> [(doc, pos)]
    for i, d in toks.items():
        for p in range(len(d) - n + 1):
            occurrences[tuple(d[p : p + n])].append((i, p))
    covered = defaultdict(set)
    for occ in occurrences.values():
        if len(occ) < min_count:
            continue
        survivors = {min(occ)} if keep == "first" else set()
        for doc, pos in occ:
            if (doc, pos) in survivors:
                continue
            covered[doc].update(range(pos, pos + n))
    expect = {
        i: (
            " ".join(
                t for p, t in enumerate(d) if p not in covered[i]
            ),
            len(d),
            len(covered[i]),
        )
        for i, d in toks.items()
    }

    df = spark.createDataFrame(
        [(i, " ".join(d)) for i, d in toks.items()],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.text, r.n_tokens, r.n_removed)
        for r in remove_repeated_spans(
            df, n=n, min_count=min_count, keep=keep
        ).collect()
    }
    assert got == expect


@settings(
    max_examples=60,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    sizes=st.lists(st.integers(1, 200), min_size=1, max_size=40),
    chunk_seed=st.integers(0, 2**31 - 1),
    uniform=st.booleans(),
    wide=st.booleans(),
)
def test_mp4_sample_walk_recovers_exact_ranges(
    sizes, chunk_seed, uniform, wide
):
    """Property: for ANY sample-size list and ANY chunk grouping, the
    stsc/stco/stsz walk locates every sample's exact bytes — checked
    against a spec-built container whose samples are content-addressed
    (sample k's payload starts with k's big-endian index), so a
    misplaced offset or size cannot match. Exercises uniform-size stsz
    (const field) and co64 wide offsets alongside the common shapes."""
    import random
    import struct as st_

    from taar_gcp_etl_spark.operators.mp4 import (
        _boxes,
        _parse_track,
        _sample_ranges,
        parse_mp4,
    )
    from tests.test_streaming_multimodal_sources import _mp4_bytes

    rng = random.Random(chunk_seed)
    if uniform:
        sizes = [max(4, sizes[0])] * len(sizes)
    else:
        sizes = [max(4, s) for s in sizes]
    samples = [
        st_.pack(">I", k) + bytes(
            (k * 7 + j) % 256 for j in range(sz - 4)
        )
        for k, sz in enumerate(sizes)
    ]
    # random chunk grouping summing to len(samples)
    chunking, left = [], len(samples)
    while left:
        take = rng.randint(1, left)
        chunking.append(take)
        left -= take
    blob = _mp4_bytes(samples, 16, 16, chunking=chunking,
                      stsz_const=uniform)
    if wide:
        # co64 variant: rewrite the stco box as co64 with u64 offsets
        # (spec layout change only — same offsets)
        i = blob.find(b"stco")
        assert i > 0
        size = st_.unpack_from(">I", blob, i - 4)[0]
        body = blob[i + 4:i - 4 + size]
        n = st_.unpack_from(">I", body, 4)[0]
        offs = [
            st_.unpack_from(">I", body, 8 + 4 * k)[0] for k in range(n)
        ]
        new_body = body[:8] + b"".join(st_.pack(">Q", o) for o in offs)
        new_box = st_.pack(">I", len(new_body) + 8) + b"co64" + new_body
        grew = len(new_box) - size
        blob = blob[:i - 4] + new_box + blob[i - 4 + size:]
        # growing moov doesn't move mdat (moov is written LAST), but
        # every enclosing box size must grow too
        out = bytearray(blob)
        for t in (b"moov", b"trak", b"mdia", b"minf", b"stbl"):
            j = out.find(t)
            st_.pack_into(
                ">I", out, j - 4,
                st_.unpack_from(">I", out, j - 4)[0] + grew,
            )
        blob = bytes(out)
    info = parse_mp4(blob)
    assert info["tracks"][0]["n_samples"] == len(samples)
    top = list(_boxes(blob, 0, len(blob)))
    moov = next((p, e) for t, p, e in top if t == "moov")
    trak = next(
        (p, e) for t, p, e in _boxes(blob, moov[0], moov[1])
        if t == "trak"
    )
    trk = _parse_track(blob, *trak)
    ranges = _sample_ranges(blob, *trk["_stbl"])
    assert len(ranges) == len(samples)
    for k, (off, sz) in enumerate(ranges):
        assert blob[off:off + sz] == samples[k]


# --- merge_into vs a dict model ---------------------------------------

merge_steps = st.lists(  # each step: list of (key, val, is_del)
    st.lists(
        st.tuples(
            st.integers(0, 9),        # key (small domain forces collisions)
            st.integers(0, 99),       # payload value
            st.booleans(),            # delete flag
        ),
        min_size=0,
        max_size=8,
        unique_by=lambda r: r[0],     # MERGE cardinality: unique keys
    ),
    min_size=1,
    max_size=3,
)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(seed=st.lists(
    st.tuples(st.integers(0, 9), st.integers(0, 99)),
    min_size=0, max_size=6, unique_by=lambda r: r[0],
), steps=merge_steps)
def test_merge_into_matches_dict_model(spark, tmp_path_factory, seed, steps):
    """A random sequence of mixed-clause merges equals the obvious
    dict model: matched+flag deletes, matched updates, unmatched+!flag
    inserts, unmatched+flag drops."""
    from taar_gcp_etl_spark import txn

    t = str(tmp_path_factory.mktemp("minto") / "t")
    model: dict[int, int] = {}
    if seed:
        txn.apply_cdc_batch_bucketed(
            spark.createDataFrame(
                [(k, v, 1, "I") for k, v in seed],
                "id long, val long, seq long, op string",
            ),
            t, n_buckets=4,
        )
        model.update(dict(seed))
    for step in steps:
        src = spark.createDataFrame(
            step or [(None, None, None)],
            "id long, val long, is_del boolean",
        ).filter(F.col("id").isNotNull())
        txn.merge_into(
            spark, t, src,
            matched_delete_condition="is_del",
            not_matched_condition="NOT is_del",
        )
        for k, v, is_del in step:
            if k in model:
                if is_del:
                    model.pop(k)
                else:
                    model[k] = v
            elif not is_del:
                model[k] = v
    live = txn.read_cdc_table(spark, t)
    got = (
        {r.id: r.val for r in live.collect()} if live is not None else {}
    )
    assert got == model


# --- merge_into clause lists vs an interpreter model (r10) -------------

_M_COND = [
    ("flag", lambda v, tv, fl: fl),
    ("NOT flag", lambda v, tv, fl: not fl),
    ("val % 2 = 0", lambda v, tv, fl: v % 2 == 0),
    ("t_val > 50", lambda v, tv, fl: tv is not None and tv > 50),
]
_M_SET = [
    None,                                        # UPDATE SET * (source row)
    ({"val": "val + 100"}, lambda v, tv: v + 100),
    ({"val": "t_val + 1"}, lambda v, tv: tv + 1),
]

_matched_clause = st.tuples(
    st.sampled_from(["update", "delete"]),
    st.integers(0, len(_M_COND) - 1),
    st.integers(0, len(_M_SET) - 1),
)
# NBS clauses see the target only: conditions/sets over t_val
_N_COND = [
    (None, lambda tv: True),
    ("t_val > 50", lambda tv: tv > 50),
    ("t_val % 2 = 0", lambda tv: tv % 2 == 0),
]
_N_SET = [
    ({"val": "t_val + 1000"}, lambda tv: tv + 1000),
    ({"val": "t_val"}, lambda tv: tv),
]
_nbs_clause = st.tuples(
    st.sampled_from(["update", "delete"]),
    st.integers(0, len(_N_COND) - 1),
    st.integers(0, len(_N_SET) - 1),
)
_clause_lists = st.tuples(
    st.lists(_matched_clause, min_size=0, max_size=3),
    st.lists(st.one_of(st.none(), st.integers(0, len(_M_COND) - 1)),
             min_size=0, max_size=2),
    st.lists(_nbs_clause, min_size=0, max_size=2),
).filter(lambda t: len(t[0]) + len(t[1]) + len(t[2]) >= 1)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    seed=st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 99)),
        min_size=0, max_size=6, unique_by=lambda r: r[0],
    ),
    step=st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 99), st.booleans()),
        min_size=0, max_size=8, unique_by=lambda r: r[0],
    ),
    clauses=_clause_lists,
)
def test_merge_into_clause_list_matches_interpreter(
    spark, tmp_path_factory, seed, step, clauses
):
    """VERDICT r9 #2 (+ r10 NBS): a RANDOM ordered clause list (N
    matched update/delete clauses with per-clause conditions and SET
    maps, conditional inserts, and not-matched-by-source
    update/delete clauses) applied by merge_into(when=[...]) equals a
    pure-Python first-match-wins interpreter over a dict model —
    Delta's clause semantics, property-tested rather than example-
    tested."""
    from taar_gcp_etl_spark import txn

    m_raw, u_raw, n_raw = clauses
    when = []
    m_cls = []
    for i, (kind, ci, si) in enumerate(m_raw):
        # all but the LAST matched clause must carry a condition —
        # force one (deterministically from the drawn index)
        cond_sql, cond_fn = _M_COND[ci]
        cl = {"matched": kind, "condition": cond_sql}
        set_sql = set_fn = None
        if kind == "update" and si > 0:
            set_sql, set_fn = _M_SET[si]
            cl["set"] = set_sql
        when.append(cl)
        m_cls.append((kind, cond_fn, set_fn))
    # drop the condition on the last matched clause half the time
    # (hypothesis already varied ci; unconditional-last is the common
    # catch-all shape) — keep as-is: conditions are always present,
    # which is valid; add one unconditional catch-all variant via si
    u_cls = []
    for i, ci in enumerate(u_raw):
        last = i == len(u_raw) - 1
        if ci is None and not last:
            ci = 0  # non-last clauses need a condition
        if ci is None:
            when.append({"not_matched": "insert"})
            u_cls.append(lambda v, tv, fl: True)
        else:
            cond_sql, cond_fn = _M_COND[ci]
            when.append({"not_matched": "insert", "condition": cond_sql})
            u_cls.append(cond_fn)

    n_cls = []
    for i, (kind, ci, si) in enumerate(n_raw):
        last = i == len(n_raw) - 1
        if ci == 0 and not last:
            ci = 1  # non-last clauses need a condition
        cond_sql, cond_fn = _N_COND[ci]
        cl = {"not_matched_by_source": kind}
        if cond_sql is not None:
            cl["condition"] = cond_sql
        set_fn = None
        if kind == "update":
            set_sql, set_fn = _N_SET[si]
            cl["set"] = set_sql
        when.append(cl)
        n_cls.append((kind, cond_fn, set_fn))

    t = str(tmp_path_factory.mktemp("mclause") / "t")
    model: dict[int, int] = {}
    txn.apply_cdc_batch_bucketed(
        spark.createDataFrame(
            [(k, v, False, 1, "I") for k, v in seed]
            or [(999, 0, False, 1, "I")],
            "id long, val long, flag boolean, seq long, op string",
        ),
        t, n_buckets=4,
    )
    model.update(dict(seed) or {999: 0})

    src = spark.createDataFrame(
        step or [(None, None, None)],
        "id long, val long, flag boolean",
    ).filter(F.col("id").isNotNull())
    import warnings as _w

    with _w.catch_warnings():
        _w.simplefilter("ignore", RuntimeWarning)
        txn.merge_into(spark, t, src, when=when)

    src_keys = {k for k, _, _ in step}
    for k in list(model):
        if k in src_keys:
            continue
        tv = model[k]
        for kind, cond_fn, set_fn in n_cls:
            if cond_fn(tv):
                if kind == "delete":
                    model.pop(k)
                else:
                    model[k] = set_fn(tv)
                break
    for k, v, fl in step:
        tv = model.get(k)
        if k in model:
            for kind, cond_fn, set_fn in m_cls:
                if cond_fn(v, tv, fl):
                    if kind == "delete":
                        model.pop(k)
                    else:
                        model[k] = set_fn(v, tv) if set_fn else v
                    break
        else:
            for cond_fn in u_cls:
                if cond_fn(v, tv, fl):
                    model[k] = v
                    break
    live = txn.read_cdc_table(spark, t)
    got = {r.id: r.val for r in live.collect()} if live is not None else {}
    assert got == model
