"""Iterative graph operators (beyond the connected components in
operators/dedup.py): PageRank, multi-source BFS, and label-propagation
communities over an edge list.

Co-occurrence graphs fall out of this engine's own outputs — co-install
pairs (the reference's guid_coinstallation contract), co-purchase edges,
near-dup pair graphs — and "which nodes matter" is the standard next
question. PageRank is the canonical iterative Spark workload, and the
discipline it needs is exactly what the other iterative ops here
(connected_components, KMeans) established:

  - each iteration's rank relation is PERSISTED (consumed by the next
    iteration AND the dangling-mass aggregate);
  - lineage is CUT with localCheckpoint on a cadence — without it the
    plan doubles per iteration and Catalyst analysis time, not the data,
    becomes the bottleneck by iteration ~15;
  - the edge relation (with out-degrees) is persisted ONCE and reused
    every iteration — the join is re-keyed on src each round, so the
    shuffle cost is O(edges) per iteration, never O(edges × iters) of
    recompute.

Dangling nodes (no out-edges) redistribute their mass uniformly — the
standard correction; without it rank mass leaks and the vector no longer
sums to 1.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from taar_gcp_etl_spark.operators.checkpoint import (
    checkpoint_tracked,
    release_rdds,
)


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    damping: float = 0.85,
    iters: int = 10,
    checkpoint_every: int = 5,
) -> DataFrame:
    """PageRank over a directed edge list; returns (node, rank) with
    ranks summing to 1 (damping + uniform dangling redistribution).
    Deterministic: uniform initialization, fixed iteration count, and
    only shuffled aggregates — no sampling, no seed.

    Duplicate edges count once (distinct) so the result depends on the
    graph, not the multiplicity of its extraction."""
    # the edge relation is the EXPENSIVE upstream (callers feed self-joins
    # / sampled scans) and the prelude below consumes it five times
    # (nodes union ×2, deg, ed, dangling-via-deg) — persist it once so
    # the upstream lineage is evaluated exactly once (guide §5: cache
    # when reused AND recompute is expensive; measured r12: the
    # un-persisted prelude re-ran the co-purchase self-join ~5×)
    e = (
        edges.select(
            F.col(src_col).alias("_src"), F.col(dst_col).alias("_dst")
        )
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    nodes = (
        e.select(F.col("_src").alias("node"))
        .unionByName(e.select(F.col("_dst").alias("node")))
        .distinct()
        # pre-partition on the join key: every iteration's nodes⋈contribs
        # left join then reuses this cached partitioning instead of
        # re-exchanging nodes per round (guide §2.4 — two operations
        # keyed the same way share one exchange)
        .repartition("node")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    n = nodes.count()
    if n == 0:
        # checkpoint the (empty) result so BOTH function-local caches can
        # be released before return — the main path's discipline; the
        # bare `nodes.withColumn(...)` return leaked the nodes cache
        # entry across repeated calls (ADVICE r12).
        out = nodes.withColumn("rank", F.lit(0.0)).localCheckpoint(
            eager=True
        )
        e.unpersist()
        nodes.unpersist()
        return out

    deg = e.groupBy("_src").agg(F.count(F.lit(1)).alias("_deg"))
    ed = (
        e.join(deg, "_src")
        # pre-partition on _src: the per-iteration ed⋈ranks equi-join
        # streams the cached partitioning — the O(E) edge relation is
        # never re-shuffled inside the loop (guide §2.4)
        .repartition("_src")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    ed.count()  # materialize once; reused every iteration

    # the DANGLING SET is static (it's graph structure, only its mass
    # changes per iteration) — detect it once; symmetric graphs
    # (co-occurrence edges emitted both directions) have none, and then
    # every per-iteration driver aggregate below is skipped entirely
    dangling_nodes = nodes.join(
        deg.select(F.col("_src").alias("node")), "node", "left_anti"
    ).persist(StorageLevel.MEMORY_AND_DISK)
    has_dangling = dangling_nodes.limit(1).count() > 0

    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    base = (1.0 - damping) / n
    # prev-generation cache is released only AFTER the next generation
    # has materialized (collect or checkpoint) — unpersisting eagerly
    # would evict the relation the lazy next generation is built on and
    # make each materialization recompute the whole window since the
    # last checkpoint (quadratic work between checkpoints).
    retired: DataFrame | None = None
    spark = edges.sparkSession
    ckpt_ids: frozenset[int] = frozenset()
    for i in range(iters):
        # per-generation caching pays ONLY when something materializes
        # mid-loop (the dangling collect reads each generation); with no
        # dangling nodes the only materializations are the checkpoints,
        # each consuming its window exactly once — caching every
        # generation there is pure write overhead
        if has_dangling:
            ranks = ranks.persist(StorageLevel.MEMORY_AND_DISK)
        # mass of dangling nodes (no out-edges) — redistributed uniformly
        dangling = (
            (
                ranks.join(dangling_nodes, "node", "left_semi")
                .agg(F.sum("rank"))
                .collect()[0][0]
                or 0.0
            )
            if has_dangling
            else 0.0
        )
        if retired is not None:  # this generation just materialized
            retired.unpersist()
            retired = None
        contribs = (
            ed.join(ranks, ed["_src"] == ranks["node"])
            .select(
                F.col("_dst").alias("node"),
                (F.col("rank") / F.col("_deg")).alias("_c"),
            )
            .groupBy("node")
            .agg(F.sum("_c").alias("_in"))
        )
        prev = ranks
        ranks = nodes.join(contribs, "node", "left").select(
            "node",
            (
                F.lit(base)
                + F.lit(damping)
                * (F.coalesce(F.col("_in"), F.lit(0.0)) + F.lit(dangling / n))
            ).alias("rank"),
        )
        if (i + 1) % checkpoint_every == 0:
            ranks, new_ids = checkpoint_tracked(ranks)
            prev.unpersist()  # checkpoint cut the lineage; safe now
            # the PREVIOUS generation's checkpoint blocks are superseded
            # the moment this one materialized — release them explicitly
            # instead of waiting for a JVM GC cycle (r13, guide §5:
            # superseded localCheckpoints otherwise accumulate for the
            # session lifetime; see operators/checkpoint.py)
            release_rdds(spark, ckpt_ids)
            ckpt_ids = new_ids
        else:
            retired = prev
    # final eager checkpoint decouples the result from every cached
    # intermediate, so ALL of the operator's cache is released before
    # return — callers get a self-contained relation and no executor
    # memory leaks across repeated pagerank calls
    out, _ = checkpoint_tracked(ranks)
    for cached in (retired, nodes, ed, dangling_nodes, e):
        if cached is not None:
            cached.unpersist()
    release_rdds(spark, ckpt_ids)  # the last loop checkpoint, superseded
    return out


def bfs_distances(
    edges: DataFrame,
    sources: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    node_col: str = "node",
    max_hops: int = 4,
) -> DataFrame:
    """Multi-source BFS over a directed edge list → (node, hops), hops =
    minimum edge count from ANY source node, bounded by ``max_hops``.
    Unreached nodes are absent from the output (no sentinel rows).

    The standard "blast radius" question over the graphs this engine
    already produces — how far does a near-dup cluster / co-install
    neighborhood / recalled-addon set propagate (reference contract the
    coinstall graph feeds: taar_etl/taar_lite_guid_guid.py) — and the
    iterative twin of the recursive-CTE the SQL oracle runs.

    Scale shape: the frontier relation is the ONLY thing that grows, and
    it is capped at |V| rows of (long, int) per round by the min-hop
    dedup; each round is one equi-join frontier⋈edges (edge relation
    persisted once, re-shuffled on src per round — O(E) per round, same
    discipline as pagerank) plus one groupBy(node).min(hops) partial-agg.
    Visited-set subtraction is a broadcast-resistant left_anti on the
    accumulated distance relation, which is also ≤ |V| rows. Lineage is
    cut per round with an eager localCheckpoint — max_hops is small by
    contract (BFS depth, not diameter), so every round checkpoints; see
    connected_components' docstring for why persist() alone is not
    enough. On a real cluster swap localCheckpoint → checkpoint()."""
    e = (
        edges.select(
            F.col(src_col).cast("long").alias("_src"),
            F.col(dst_col).cast("long").alias("_dst"),
        )
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    dist = (
        sources.select(F.col(node_col).cast("long").alias("node"))
        .distinct()
        .withColumn("hops", F.lit(0))
        .localCheckpoint(eager=True)
    )
    frontier = dist
    for hop in range(1, max_hops + 1):
        nxt = (
            e.join(frontier, e["_src"] == frontier["node"])
            .select(F.col("_dst").alias("node"))
            # min-hop dedup: a node reached twice THIS round is one row
            .distinct()
            # ...and a node reached in ANY earlier round keeps its
            # earlier (smaller) hop count: drop it from the frontier
            .join(dist.select("node"), "node", "left_anti")
            .withColumn("hops", F.lit(hop))
            .localCheckpoint(eager=True)
        )
        if nxt.limit(1).count() == 0:
            break
        # r13: the accumulated distance relation stays a LAZY union of
        # the per-round frontier checkpoints — each node's blocks are
        # materialized exactly once (in its frontier), where the old
        # per-round `dist` re-checkpoint wrote the whole accumulated
        # relation again every round (O(V·hops) block volume, all of it
        # leaked until a JVM GC). The union's lineage is a bounded
        # max_hops-deep tree of Scan ExistingRDD leaves — no plan
        # growth hazard; the per-round left_anti and the returned
        # relation read the same bytes either way (guide §5).
        dist = dist.unionByName(nxt)
        frontier = nxt
    e.unpersist()
    return dist


def label_propagation(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    iters: int = 5,
) -> DataFrame:
    """Community detection by synchronous label propagation →
    (node, community). Each round every node adopts the label most
    frequent among its neighbors, ties broken by the SMALLEST label —
    with a fixed round count and uniform init (label = node id) the
    result is fully deterministic: no sampling, no visit order, no seed.

    Communities are the modularity-flavored sibling of
    connected_components (operators/dedup.py): CC answers "which nodes
    are linked at all", LPA answers "which nodes are linked densely" —
    on a co-install / co-purchase graph that distinction is the
    difference between one giant component and usable item groupings.

    Scale shape per round: one join frontier⋈edges keyed on src (edge
    relation persisted once, O(E) rows shuffled per round), one
    groupBy(node, lbl) count — partial-aggregated map-side, so the
    shuffle carries at most one row per (node, distinct neighbor label)
    — and one per-node argmax via max_by on the (count desc, label asc)
    ordering encoded as a single struct comparison. Labels are cut with
    eager localCheckpoint per round (see connected_components for why);
    round count is a fixed small constant by contract, not
    to-convergence — LPA oscillates on bipartite shapes, so a bounded
    synchronous schedule is both the deterministic and the robust
    choice."""
    e = edges.select(
        F.col(src_col).cast("long").alias("_src"),
        F.col(dst_col).cast("long").alias("_dst"),
    )
    # symmetrize in one pass over the upstream lineage (same trick as
    # connected_components: explode both directions, then distinct)
    sym = (
        e.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col("_src").alias("s"), F.col("_dst").alias("d")
                    ),
                    F.struct(
                        F.col("_dst").alias("s"), F.col("_src").alias("d")
                    ),
                )
            ).alias("p")
        )
        .select(F.col("p.s").alias("_src"), F.col("p.d").alias("_dst"))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    spark = edges.sparkSession
    labels, lbl_ids = checkpoint_tracked(
        sym.select(F.col("_src").alias("node"))
        .distinct()
        .withColumn("lbl", F.col("node"))
    )
    for _ in range(iters):
        nbr = (
            sym.join(labels, sym["_dst"] == labels["node"])
            .select(F.col("_src").alias("node"), "lbl")
            .groupBy("node", "lbl")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        # argmax by (count DESC, label ASC): max_by over a struct whose
        # natural ordering is (n, -lbl) — single reduce-side pass, no
        # window, no row_number. The superseded round's localCheckpoint
        # blocks are released EXPLICITLY the moment the new generation
        # has materialized (r13, operators/checkpoint.py — waiting for
        # the ContextCleaner meant waiting for a JVM GC that a large
        # heap may never run mid-session).
        labels, new_ids = checkpoint_tracked(
            nbr.groupBy("node").agg(
                F.max_by(
                    F.col("lbl"),
                    F.struct(F.col("n"), (-F.col("lbl")).alias("t")),
                ).alias("lbl")
            )
        )
        release_rdds(spark, lbl_ids)
        lbl_ids = new_ids
    sym.unpersist()
    return labels.select("node", F.col("lbl").alias("community"))


def graph_stats(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Per-node structural statistics over an undirected edge list:
    (node, degree, triangles, clustering) — triangle membership counts
    and the local clustering coefficient 2·t / (d·(d−1)), the standard
    "how clique-like is this node's neighborhood" signal (boilerplate
    mirror clusters in a near-dup graph score ~1; hub spam scores ~0).

    Triangle enumeration uses DEGREE ORIENTATION — each undirected edge
    is directed from its lower-(degree, id) endpoint to the higher one,
    wedges are built only between each node's out-neighbors, and a wedge
    closes iff its third edge exists in the same orientation. Every
    triangle is counted exactly once, and total wedge volume is bounded
    by O(E^1.5) REGARDLESS of skew (Schank-Wagner / Latapy bound: a
    hub's wedge count collapses because almost all its neighbors have
    lower degree, so the hub generates no out-wedges) — the id-ordered
    textbook variant is quadratic in the hottest node's degree, which at
    corpus scale is exactly the node that matters. The result is
    orientation-invariant, so the SQL oracle can verify with plain
    id-ordering.

    Shuffles: degree aggregate (narrow), two wedge joins keyed on node /
    edge pair, one membership explode + aggregate. No iteration, no
    driver loop."""
    e = edges.select(
        F.col(src_col).cast("long").alias("src"),
        F.col(dst_col).cast("long").alias("dst"),
    ).filter(F.col("src") != F.col("dst"))
    # canonical UNDIRECTED edge view: each edge once, ordered (u < v).
    # r13: the old symmetric 2·|E| view paid its distinct, the degree
    # aggregate and BOTH orientation joins at double width — every
    # undirected edge only needs orienting once, so build from the
    # half-width relation and derive degrees with a 2-way explode
    # (map-side combined; guide §2.3 shuffle fewer bytes)
    half = (
        e.select(
            F.least("src", "dst").alias("u"),
            F.greatest("src", "dst").alias("v"),
        )
        .distinct()
        .persist()
    )
    deg = (
        half.select(F.explode(F.array("u", "v")).alias("n"))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    # orient: u → v iff (deg(u), u) < (deg(v), v) — decided per edge,
    # swapping endpoints where the id order disagrees with degree order
    du = deg.select(F.col("n").alias("_n1"), F.col("degree").alias("_d1"))
    dv = deg.select(F.col("n").alias("_n2"), F.col("degree").alias("_d2"))
    fwd = (F.col("_d1") < F.col("_d2")) | (
        (F.col("_d1") == F.col("_d2")) & (F.col("u") < F.col("v"))
    )
    oriented = (
        half.join(du, half["u"] == du["_n1"])
        .join(dv, half["v"] == dv["_n2"])
        .select(
            F.when(fwd, F.col("u")).otherwise(F.col("v")).alias("u"),
            F.when(fwd, F.col("v")).otherwise(F.col("u")).alias("v"),
            # keep the out-neighbor's degree: the wedge build below uses
            # it to emit each wedge once, already in orientation order
            F.when(fwd, F.col("_d2")).otherwise(F.col("_d1")).alias("_dv"),
        )
        # pre-partition on the wedge-join key so the self-join streams
        # the cached partitioning on BOTH sides — zero Exchange into the
        # O(E^1.5) wedge stage (r13, guide §2.4)
        .repartition("u")
        .persist()
    )
    # wedges between out-neighbors of the same center, emitted ONCE per
    # unordered pair, directly in orientation order ((deg, id) of a <
    # (deg, id) of b — the out-edges carry their endpoint's degree, so
    # the ordering is decidable at build time): the closing edge a → b
    # can only exist in that orientation, so the old both-directions
    # emit + semi-join discard shipped 2× the wedge volume for the same
    # triangle set (r13, guide §2.3 — halve the dominant intermediate)
    w1 = oriented.select(
        F.col("u").alias("c"), F.col("v").alias("a"), F.col("_dv").alias("_da")
    )
    w2 = oriented.select(
        F.col("u").alias("c"), F.col("v").alias("b"), F.col("_dv").alias("_db")
    )
    wedges = (
        w1.join(w2, "c")
        .filter(
            (F.col("_da") < F.col("_db"))
            | ((F.col("_da") == F.col("_db")) & (F.col("a") < F.col("b")))
        )
        .select("c", "a", "b")
    )
    closer = oriented.select(F.col("u").alias("a"), F.col("v").alias("b"))
    tri = wedges.join(closer, ["a", "b"], "left_semi")
    members = tri.select(
        F.explode(F.array("c", "a", "b")).alias("node")
    )
    tri_n = members.groupBy("node").agg(
        F.count(F.lit(1)).alias("triangles")
    )
    out = (
        deg.select(F.col("n").alias("node"), "degree")
        .join(tri_n, "node", "left")
        .select(
            "node",
            "degree",
            F.coalesce("triangles", F.lit(0)).alias("triangles"),
            F.when(
                F.col("degree") >= 2,
                F.round(
                    2.0
                    * F.coalesce("triangles", F.lit(0))
                    / (F.col("degree") * (F.col("degree") - 1)),
                    6,
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("clustering"),
        )
    )
    # wedge dedup note: each unordered out-neighbor pair of a center is
    # emitted exactly once, in orientation order (the filter above is
    # the same total order the oriented edges use), so each triangle
    # closes exactly once per center and 3 times total, one per member
    # — which is exactly the per-node membership count.
    #
    # eager checkpoint decouples the result from the two persisted edge
    # relations so they can be released before return (the same
    # cache-lifecycle discipline as pagerank / the alternating CC —
    # function-local persists must not outlive the call)
    out = out.localCheckpoint(eager=True)
    half.unpersist()
    oriented.unpersist()
    return out
