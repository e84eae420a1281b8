"""Graph centrality over relational edge lists.

Not in the reference (its surface has no graph operators); the
LLM-data-pipeline motivation is link-style corpora: page/citation
graphs for crawl prioritization and quality priors (the original
PageRank use), co-occurrence graphs (parts bought together, entities
co-mentioned) for importance weighting, and near-dup cluster graphs
where a centrality score picks better canonical representatives than
min-id.

Everything here is plain DataFrame joins/aggregations over an
``(src, dst)`` edge list — the natural Spark representation. Iterative
algorithms follow the `dedup.connected_components` recipe: a bounded
number of synchronous rounds, each ONE edge-keyed join + ONE
destination-keyed aggregation, with ``localCheckpoint`` lineage cuts so
the plan stays linear in rounds (an un-cut iterative plan grows
exponentially and re-executes every prior round per action).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pagerank", "hits", "triangle_counts",
           "connected_components", "symmetrize_edges"]


def symmetrize_edges(pairs: DataFrame, a: str, b: str,
                     carry: tuple = ()) -> DataFrame:
    """Both directions of an undirected pair list in ONE pass — emits
    ``(src, dst, *carry)`` rows ``(a→b)`` and ``(b→a)`` per input pair
    via a single codegen ``explode(array(struct, struct))`` generator.

    The idiomatic alternative — ``pairs.select(a→src, b→dst)
    .unionByName(pairs.select(b→src, a→dst))`` — plants the WHOLE
    upstream subtree twice in the plan; when the pairs come from an
    expensive construction (a co-occurrence self-join + distinct, the
    copurchase-graph shape), only the part below the distinct's
    exchange is deduplicated by ReuseExchange, and the post-shuffle
    aggregate + projection still execute once per branch (r16, guide
    §2.4). Row multiset is identical to the union form."""
    fwd = F.struct(F.col(a).alias("src"), F.col(b).alias("dst"),
                   *[F.col(c).alias(c) for c in carry])
    rev = F.struct(F.col(b).alias("src"), F.col(a).alias("dst"),
                   *[F.col(c).alias(c) for c in carry])
    return (pairs.select(F.explode(F.array(fwd, rev)).alias("__e"))
            .select("__e.src", "__e.dst",
                    *[f"__e.{c}" for c in carry]))


def pagerank(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    iterations: int = 3,
    damping: float = 0.85,
    rank_digits: int = 9,
    seeds: DataFrame | None = None,
    seed_node: str = "node",
    seed_weight: str | None = None,
) -> DataFrame:
    """PageRank (Brin & Page 1998) over a directed edge list — returns
    ``(node, rank)`` with ``Σ rank = 1``. Deterministic by
    construction: fixed iteration count (synchronous power iteration
    from the uniform vector), no RNG, duplicate edges count as
    parallel edges (dedupe upstream if unwanted), and the output rank
    is rounded to ``rank_digits`` (float sums across engines agree to
    ~1e-15 relative; the rounding makes the result value-comparable —
    the lloyd_kmeans convention for iterative float algorithms).

    Per iteration: ``r'(v) = (1-d)/N + d·(Σ_{u→v} r(u)/outdeg(u)
    + dangling_mass/N)`` where dangling nodes (no out-edges) spread
    their rank uniformly — the standard correction that keeps the
    vector a distribution.

    ``weight`` names an optional positive edge-weight column: each
    source then distributes its rank proportionally to edge weight
    (``r(u)·w_e/Σ_out(u) w``) — the co-occurrence-count case where "bought
    together 50 times" should pull more rank than "once". Rows with
    NULL or non-positive weight raise (a silent drop would re-route
    rank mass). Unweighted is the weight≡1 special case.

    ``seeds`` makes this PERSONALIZED PageRank (the random-walk-with-
    restart centrality behind item-to-item recommendation and seeded
    retrieval expansion): restarts land on the seed distribution
    ``p(v)`` instead of uniformly — ``r'(v) = (1-d)·p(v) + d·(Σ
    contributions + dangling_mass·p(v))``, iterated from ``r0 = p``.
    ``seeds`` is a (node[, weight]) frame; ``seed_weight`` names an
    optional positive weight column (uniform over seeds otherwise).
    Duplicate seed rows SUM their weights (a node listed twice gets
    double restart mass — dedupe upstream if unwanted). Seeds are
    intersected with the graph's nodes FIRST and weights normalized
    over that intersection (an absent seed can't absorb restart
    mass); an empty intersection raises. Scores then rank
    nodes by proximity to the seed set — Σ rank = 1 still. The
    personalization term is one broadcast-sized left join; no extra
    per-iteration work. ``seeds=None`` (classic PageRank) keeps the
    exact uniform-restart expression tree, bit-for-bit.

    Scale shape: the EDGE LIST is localCheckpointed once up front —
    every structure (nodes, degrees) and every round's contribution
    join re-consumes it, and without the cut an expensive upstream
    edge construction (a co-occurrence self-join, say) re-executes
    once per consumer (measured 10.2 s → 3.9 s at sf0.1 on exactly
    that fixture; GraphX makes the same trade by caching the edge
    RDD). The (node, out-degree) table is ONE stacked union +
    map-side-combined groupBy (r16 — was nodes-distinct + degree agg +
    left join: three exchanges and an extra checkpoint), with n_nodes
    and the static dangling probe folded into one 1-row head job; each
    iteration is ONE src-keyed join of the rank vector onto the edge
    list + ONE dst-keyed sum (both map-side combined) + a 1-row
    dangling-mass fold; ``localCheckpoint`` cuts the rank vector's
    lineage per round. Nothing is ever nodes² — 100 TB of edges
    shuffles on (src|dst) keys only, the same shape as a groupBy-join
    pipeline. Skewed hubs behave like any skewed join key (AQE
    skew-join applies). ``iterations`` is a fixed small constant by
    contract: rank ordering stabilizes in a handful of rounds; full
    numeric convergence is not the use case.
    """
    if not 0.0 < damping < 1.0:
        raise ValueError("damping must be in (0, 1)")
    if iterations < 0:
        raise ValueError("iterations must be >= 0")
    wcol = (F.col(weight).cast("double") if weight is not None
            else F.lit(1.0))
    e = edges.select(F.col(src).alias("__src"), F.col(dst).alias("__dst"),
                     wcol.alias("__w"))
    e = e.localCheckpoint(eager=False)
    if weight is not None:
        bad = e.filter(F.col("__w").isNull()
                       | (F.col("__w") <= 0)).limit(1).count()
        if bad:
            raise ValueError(
                "pagerank: NULL or non-positive edge weight — a silent "
                "drop would re-route rank mass; clean the edge list")
    # (node, out-degree) in ONE stacked groupBy (r16, guide §2.4): the
    # former nodes-distinct ∪-exchange + src-keyed degree agg + node-keyed
    # left join (three exchanges, two checkpoints, and a separate
    # nodes.count() job) collapses to one union + one map-side-combined
    # aggregate — dst-only (dangling) nodes surface as NULL-weight rows
    # whose sum is NULL → coalesce 0, exactly the old left-join zero.
    # Degree VALUES are bit-identical: F.sum skips the NULL rows, and
    # the per-group float order was never pinned before either (integer
    # / 1.0 weights sum exactly regardless).
    stacked = (e.select(F.col("__src").alias("node"),
                        F.col("__w").alias("__wo"))
               .unionByName(e.select(F.col("__dst").alias("node"),
                                     F.lit(None).cast("double")
                                     .alias("__wo"))))
    nd = (stacked.groupBy("node")
          .agg(F.coalesce(F.sum("__wo"), F.lit(0.0)).alias("__deg"))
          .localCheckpoint(eager=False))
    # n_nodes + the dangling probe in ONE 1-row job (was: a count job on
    # nodes + a limit(1).count() probe on nd)
    head = nd.agg(F.count(F.lit(1)).alias("__n"),
                  F.max((F.col("__deg") == 0.0).cast("int"))
                  .alias("__dang")).first()
    n_nodes = head["__n"]
    if n_nodes == 0:
        raise ValueError("pagerank: empty edge list")
    nodes = nd.select("node")
    d = float(damping)
    base = (1.0 - d) / n_nodes
    personalized = seeds is not None
    if personalized:
        swc = (F.col(seed_weight).cast("double") if seed_weight
               else F.lit(1.0))
        sd = seeds.select(F.col(seed_node).alias("node"),
                          swc.alias("__sw"))
        if seed_weight is not None:
            bad = sd.filter(F.col("__sw").isNull()
                            | (F.col("__sw") <= 0)).limit(1).count()
            if bad:
                raise ValueError(
                    "pagerank: NULL or non-positive seed weight — a "
                    "silent drop would re-route restart mass")
        # duplicate seed rows SUM their weights (documented) — an
        # un-aggregated join would duplicate the node's rank rows and
        # double its outgoing mass every iteration
        sd = sd.groupBy("node").agg(F.sum("__sw").alias("__sw"))
        nd = nd.join(sd, "node", "left").select(
            "node", "__deg", F.coalesce("__sw", F.lit(0.0)).alias("__sw"))
        # normalize over the seed∩graph intersection (one 1-row fold,
        # like the n_nodes count above)
        st = nd.agg(F.sum("__sw")).first()[0] or 0.0
        if st <= 0:
            raise ValueError(
                "pagerank: no seed node is present in the edge list "
                "(restart mass has nowhere to land)")
        nd = (nd.select("node", "__deg",
                        (F.col("__sw") / F.lit(float(st))).alias("__p"))
              .localCheckpoint(eager=False))
    # the dangling SET is static (deg == 0); when it is empty the
    # per-round mass is identically 0 and the per-iteration 1-row
    # fold (a full pass over the rank vector) can be skipped — the
    # common case for symmetrized / co-occurrence graphs. The probe
    # rode along in the single head aggregate above (r16).
    has_dangling = bool(head["__dang"])
    if personalized:
        ranks = nd.select("node", "__deg", "__p",
                          F.col("__p").alias("__r"))
    else:
        ranks = nd.select("node", "__deg",
                          F.lit(1.0 / n_nodes).alias("__r"))
    # r16: the per-round lineage cut is only REQUIRED when the loop
    # runs a per-round driver action (the dangling fold) — each action
    # would otherwise re-execute every prior round (quadratic). With no
    # dangling nodes the rank chain is strictly linear (each round's
    # frame has exactly one consumer, the next round), so skipping the
    # cut fuses ALL rounds into the single final job instead of paying
    # an AQE stage-materialization + driver round trip per iteration —
    # the family's profile showed those sequential per-round jobs, not
    # task work, dominating the wall clock. Plan size stays linear in
    # iterations (e and nd are checkpointed above the loop).
    cut_per_round = has_dangling

    for _ in range(iterations):
        dangling = (ranks.filter(F.col("__deg") == 0)
                    .agg(F.coalesce(F.sum("__r"), F.lit(0.0))
                         .alias("__dm")).first()["__dm"]) \
            if has_dangling else 0.0
        contrib = (e.join(ranks, e["__src"] == ranks["node"])
                   .select(F.col("__dst").alias("node"),
                           (F.col("__r") * F.col("__w") / F.col("__deg"))
                           .alias("__c")))
        summed = contrib.groupBy("node").agg(F.sum("__c").alias("__s"))
        if personalized:
            ranks = (nd.join(summed, "node", "left")
                     .select("node", "__deg", "__p",
                             (F.lit(1.0 - d) * F.col("__p")
                              + F.lit(d) * (F.coalesce("__s", F.lit(0.0))
                                            + F.lit(dangling)
                                            * F.col("__p")))
                             .alias("__r")))
        else:
            ranks = (nd.join(summed, "node", "left")
                     .select("node", "__deg",
                             (F.lit(base)
                              + F.lit(d) * (F.coalesce("__s", F.lit(0.0))
                                            + F.lit(dangling / n_nodes)))
                             .alias("__r")))
        if cut_per_round:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks.select(
        "node",
        (F.round("__r", rank_digits) + F.lit(0.0)).alias("rank"))


def hits(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 2,
    score_digits: int = 9,
) -> DataFrame:
    """HITS hubs & authorities (Kleinberg 1999) over a directed edge
    list — returns ``(node, hub, authority)``. The two-sided
    centrality PageRank folds into one: an AUTHORITY is pointed at by
    good hubs, a HUB points at good authorities. On a bipartite
    interaction graph (customers → products, crawlers → pages,
    annotators → items) the two sides get separately meaningful
    scores where PageRank would just mix them.

    Per iteration: ``a(v) = Σ_{u→v} h(u)`` then ``h(u) = Σ_{u→v}
    a(v)``; both vectors are L1-normalized ONCE at the end (scores sum
    to 1). Normalization inside the power loop only rescales — every
    step is linear, so the fixed-point DIRECTION is unchanged whether
    you divide per round or once at the end — and deferring it removes
    the two 1-row driver folds the per-round convention paid each
    iteration (r11 verdict residual №3). Unnormalized magnitudes grow
    like λ_max^iterations, so every 10th round both vectors are
    rescaled by their current totals PLAN-SIDE (two 1-row aggregates
    cross-joined in — still zero driver actions): rescaling is the
    identity on the fixed-point direction, and float64 comfortably
    holds 10 rounds of growth on any real graph, so arbitrary
    iteration counts stay finite where a fully-deferred version would
    reach inf/NaN near ~80 rounds on dense graphs.
    Deterministic: fixed iteration count from the uniform vector, no
    RNG, ``score_digits`` rounding on output (the pagerank
    convention). Duplicate edges count as parallel edges. Nodes with
    no in-edges keep authority 0; no out-edges, hub 0.

    Scale shape: the edge list is localCheckpointed once up front
    (every round re-consumes it twice — see :func:`pagerank`); per
    iteration TWO edge-keyed joins + TWO keyed map-side-combined sums,
    with ``localCheckpoint`` lineage cuts per round — the pagerank
    shape run once in each direction, with ZERO driver actions inside
    the loop. The score vectors stay SPARSE inside the loop (only
    nodes a sum reached): a zero score contributes zero to the next
    round's edge-join sums, so re-densifying per round would be two
    extra node-keyed joins per iteration buying nothing (the r15
    cert-delta adjudication cut them); nodes the propagation never
    reaches take their 0 via ONE left-join densify at the output. The
    final normalization is two 1-row aggregates cross-joined into the
    output projection (broadcast by size), still no driver action.
    Nothing is nodes².
    """
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    e = (edges.select(F.col(src).alias("__src"), F.col(dst).alias("__dst"))
         .localCheckpoint(eager=False))
    nodes = (e.select(F.col("__src").alias("node"))
             .unionByName(e.select(F.col("__dst").alias("node")))
             .distinct()
             .localCheckpoint(eager=False))
    n_nodes = nodes.count()
    if n_nodes == 0:
        raise ValueError("hits: empty edge list")
    hubs = nodes.select("node", F.lit(1.0 / n_nodes).alias("__h"))
    auths = hubs.limit(0).select("node", F.col("__h").alias("__a"))

    def _rescale(frame: DataFrame, col: str) -> DataFrame:
        tot = frame.agg(F.sum(col).alias("__t"))
        return (frame.crossJoin(tot)
                .select("node",
                        (F.col(col)
                         / F.when(F.col("__t") != 0.0, F.col("__t"))
                         .otherwise(F.lit(1.0))).alias(col))
                .localCheckpoint(eager=False))

    # r16 note: the pagerank-style "skip the per-round cut" experiment
    # was tried here and REVERTED — hits' final assembly consumes both
    # vectors twice (totals + join) and each round's auths feeds the
    # same round's hubs, so deferring cuts re-executed chains
    # (measured 3.4 s → 5.8-21 s across cut placements); the per-round
    # checkpoint is the right shape for this two-sided loop.
    for it in range(iterations):
        # sparse: only nodes a sum reaches carry a row — zeros add
        # nothing to the next round's sums, so no per-round densify
        auths = (e.join(hubs, e["__src"] == hubs["node"])
                 .groupBy(F.col("__dst").alias("node"))
                 .agg(F.sum("__h").alias("__a"))
                 .localCheckpoint(eager=False))
        hubs = (e.join(auths, e["__dst"] == auths["node"])
                .groupBy(F.col("__src").alias("node"))
                .agg(F.sum("__a").alias("__h"))
                .localCheckpoint(eager=False))
        # magnitude control: λ_max^10 of growth fits float64 easily;
        # plan-side rescale (identity on the direction) every 10th
        # round keeps arbitrary iteration counts finite
        if (it + 1) % 10 == 0 and it + 1 < iterations:
            auths = _rescale(auths, "__a")
            hubs = _rescale(hubs, "__h")
    # deferred L1 normalization: two 1-row totals, cross-joined into
    # the projection (a broadcast nested-loop of one row — no driver
    # action, no shuffle). A zero total (possible only on degenerate
    # graphs where one side is empty after the first round) divides by
    # 1 instead, keeping the all-zero vector all-zero like the
    # per-round convention's `or 1.0` guard did.
    h_tot = hubs.agg(F.sum("__h").alias("__ht"))
    a_tot = auths.agg(F.sum("__a").alias("__at"))
    return (nodes.join(hubs, "node", "left").join(auths, "node", "left")
            .crossJoin(h_tot).crossJoin(a_tot)
            .select("node",
                    (F.round(F.coalesce("__h", F.lit(0.0))
                             / F.when(F.col("__ht").isNotNull()
                                      & (F.col("__ht") != 0.0),
                                      F.col("__ht"))
                             .otherwise(F.lit(1.0)),
                             score_digits) + F.lit(0.0))
                    .alias("hub"),
                    (F.round(F.coalesce("__a", F.lit(0.0))
                             / F.when(F.col("__at").isNotNull()
                                      & (F.col("__at") != 0.0),
                                      F.col("__at"))
                             .otherwise(F.lit(1.0)),
                             score_digits) + F.lit(0.0))
                    .alias("authority")))


def triangle_counts(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Per-node triangle counts + local clustering coefficient over an
    UNDIRECTED graph (edges in either direction, duplicates and
    self-loops dropped) — the structure gate for similarity/dedup
    graphs: near-dup pair lists that form dense triangles are
    transitive clusters (safe to collapse); triangle-free matches are
    chains that label propagation will over-merge. Returns
    ``(node, degree, triangles, clustering)`` with clustering =
    2T/(d(d−1)) (NULL for degree < 2).

    Scale shape: the compact-forward algorithm (Chiba-Nishizeki /
    Schank-Wagner — what every distributed triangle system uses):
    canonicalize to (lo, hi) distinct edges, then ORIENT each edge
    from the lower-(degree, id) endpoint to the higher. Every node's
    out-degree in that orientation is O(sqrt(m)), so expanding each
    node's sorted out-list into its in-list pairs (the posting-list
    two-Generate shape, r16 — one groupBy instead of the previous
    two-exchange wedge self-join) generates Σ outdeg² = O(m^1.5)
    candidate wedges instead of the Σ degree² blowup a naive wedge
    join pays on hub nodes; one semi-join against the canonical edges
    closes them. Each triangle materializes exactly once (at its
    lowest-order vertex) and explodes to its 3 member nodes for the
    per-node count. Counts are exact integers — bit-identical
    cross-engine.
    """
    e_raw = edges.select(F.col(src).alias("__a"), F.col(dst).alias("__b"))
    und = (e_raw.filter(F.col("__a") != F.col("__b"))
           .select(F.least("__a", "__b").alias("__lo"),
                   F.greatest("__a", "__b").alias("__hi"))
           .distinct()
           .localCheckpoint(eager=False))
    # one-pass endpoint explode (r16 — the CC-symmetrize precedent):
    # the unionByName form re-read the und subtree once per endpoint
    deg = (und.select(F.explode(F.array("__lo", "__hi")).alias("node"))
           .groupBy("node").agg(F.count(F.lit(1)).alias("degree"))
           .localCheckpoint(eager=False))
    dl = deg.select(F.col("node").alias("__lo"),
                    F.col("degree").alias("__dlo"))
    dh = deg.select(F.col("node").alias("__hi"),
                    F.col("degree").alias("__dhi"))
    # orient low-(degree, id) -> high-(degree, id). Degree-(<2) PRUNE
    # first (r17, guide §2/§3): an edge with a degree-1 endpoint can
    # close no wedge — every triangle vertex has degree >= 2 inside
    # its triangle — so those edges leave the orientation, the
    # adjacency build, the k² wedge expansion AND the closing
    # semi-join's probe stream entirely. Orientation order and the
    # output keep the ORIGINAL degrees (the order just needs to be
    # total; pruned nodes resurface with triangles = 0 through the
    # final left join), and the O(sqrt m) out-degree bound only
    # tightens on the subgraph.
    lo_first = ((F.col("__dlo") < F.col("__dhi"))
                | ((F.col("__dlo") == F.col("__dhi"))
                   & (F.col("__lo") < F.col("__hi"))))
    ori = (und.join(dl, "__lo").join(dh, "__hi")
           .filter((F.col("__dlo") >= 2) & (F.col("__dhi") >= 2))
           .select(F.when(lo_first, F.col("__lo"))
                   .otherwise(F.col("__hi")).alias("__u"),
                   F.when(lo_first, F.col("__hi"))
                   .otherwise(F.col("__lo")).alias("__v")))
    # wedges: key-carried posting-list expansion (r16 — the
    # posting_list_pairs shape with __u carried through). The old
    # w1×w2 self-join shuffled ori twice (the two projections hash to
    # DIFFERENT exchanges, so exchange reuse could not unify them) and
    # sort-merged k² candidates; ONE groupBy builds each node's sorted
    # out-list (O(sqrt m) long by the orientation bound — the same
    # bound that kept the join safe) and two chained codegen Generates
    # stream exactly the __x < __y pairs. Sorted ascending ==
    # the join's `<` for every orderable node type.
    # Spread the expansion to the session's shuffle parallelism: AQE
    # right-sizes plain groupBy exchanges by BYTES, but the Generate
    # below EXPANDS k² per row, so a byte-coalesced handful of
    # partitions serializes the O(m^1.5) wedge work (measured at
    # sf0.1: the expansion stage ran 11 cpu-s on 4 AQE-coalesced
    # tasks; paired A/B with the explicit spread: 5.42 → 4.81 s
    # min-of-4). r17: the spread moved BEFORE the groupBy — an
    # explicit repartition(n, __u) pins a user-specified partitioning
    # AQE will not coalesce, and the groupBy on the same key at the
    # same count reuses it, so the former groupBy-exchange +
    # repartition-exchange pair collapses to ONE exchange (guide
    # §2.4: two operations keyed the same way share one exchange).
    # collect_list has no map-side partial reduction to lose.
    _shuf = int(ori.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    adj = ori.repartition(_shuf, "__u").groupBy("__u").agg(
        F.sort_array(F.collect_list("__v")).alias("__vs"))
    wedges = (adj.select("__u", F.col("__vs"),
                         F.posexplode("__vs").alias("__i", "__x"))
              .select("__u", "__x",
                      F.explode(F.slice(F.col("__vs"), F.col("__i") + F.lit(2),
                                        F.size(F.col("__vs")))).alias("__y")))
    # close the wedge: the (x, y) edge exists in the canonical
    # undirected set (membership is orientation-free)
    tri = wedges.join(
        und.select(F.col("__lo").alias("__x"),
                   F.col("__hi").alias("__y")),
        ["__x", "__y"], "left_semi")
    members = tri.select(
        F.explode(F.array("__u", "__x", "__y")).alias("node"))
    per_node = members.groupBy("node").agg(
        F.count(F.lit(1)).alias("triangles"))
    dd = F.col("degree").cast("double")
    return (deg.join(per_node, "node", "left")
            .select("node", "degree",
                    F.coalesce("triangles", F.lit(0)).alias("triangles"),
                    F.when(F.col("degree") >= 2,
                           F.lit(2.0)
                           * F.coalesce("triangles", F.lit(0))
                           / (dd * (dd - 1.0))).alias("clustering")))


def connected_components(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 30,
) -> DataFrame:
    """Connected components via alternating large-star/small-star
    (Kiveris et al. 2014) — returns ``(node, component)`` with the
    component labeled by its MINIMUM node id (the same deterministic
    contract as ``dedup.connected_components``). The scale upgrade
    over that min-label propagation: label propagation needs
    O(diameter) rounds — a CHAIN of near-dups (doc A ~ B ~ C ~ ...,
    each pair similar but the ends unrelated) is its worst case —
    while star contraction provably converges in O(log² n) rounds
    regardless of diameter, each round re-pointing whole subtrees at
    their minimum instead of moving labels one hop.

    Per round: large-star (every node's LARGER neighbors re-point to
    its minimum neighbor-or-self) then small-star (every node's
    smaller-or-equal neighbors re-point to its minimum) — each phase
    ONE symmetric-view groupBy(min) + ONE edge-keyed join + distinct,
    with ``localCheckpoint`` lineage cuts. Convergence is an edge-set
    fingerprint (count + sum of xxhash64) — one 1-row driver action
    per round, the iterative-operator convention here. At the fixed
    point every edge points directly at its component minimum (a star),
    so labels read off the edge list with no extra pass. Self-loops
    and duplicate/bidirectional input edges are tolerated; isolated
    nodes never appear in an edge list, so callers wanting them must
    union ``(node, node)`` rows afterwards. Works for any orderable id
    type. Raises RuntimeError if ``max_rounds`` is hit unconverged
    (never observed below hundreds of millions of nodes at the
    default; the bound is a runaway guard, not a tuning knob).
    """
    if max_rounds < 1:
        raise ValueError("max_rounds must be >= 1")
    a, b = F.col(src), F.col(dst)
    # canonical (hi, lo) pairs: every stored edge points high -> low
    e = (edges.filter(a.isNotNull() & b.isNotNull() & (a != b))
         .select(F.greatest(a, b).alias("x"), F.least(a, b).alias("y"))
         .distinct()
         .localCheckpoint(eager=False))
    if e.limit(1).count() == 0:
        raise ValueError("connected_components: empty edge list")

    def fingerprint(frame: DataFrame):
        # sum hashes as decimal(38,0): a long sum overflows under ANSI
        # mode on a few hundred random 64-bit values
        r = frame.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.xxhash64("x", "y").cast("decimal(38,0)"))
            .alias("h")).first()
        return (r["n"], r["h"])

    prev = fingerprint(e)
    for _ in range(max_rounds):
        # large-star: symmetric neighbor view; each node u re-points
        # its strictly-larger neighbors at m(u) = min(N(u) ∪ {u})
        sym = e.select(F.col("x").alias("u"), F.col("y").alias("v")) \
            .unionByName(
                e.select(F.col("y").alias("u"), F.col("x").alias("v")))
        m = (sym.groupBy("u")
             .agg(F.least(F.min("v"), F.first("u")).alias("m")))
        e = (sym.join(m, "u")
             .filter(F.col("v") > F.col("u"))
             .select(F.col("v").alias("x"), F.col("m").alias("y"))
             .filter(F.col("x") != F.col("y"))
             .distinct()
             .localCheckpoint(eager=False))
        # small-star: edges already point high -> low; group on the
        # high endpoint, re-point it and all its smaller neighbors at
        # the group minimum
        mn = e.groupBy("x").agg(F.min("y").alias("m"))
        joined = e.join(mn, "x")
        e = (joined.select(F.col("x"), F.col("m").alias("y"))
             .unionByName(
                 joined.filter(F.col("y") != F.col("m"))
                 .select(F.col("y").alias("x"), F.col("m").alias("y")))
             .filter(F.col("x") != F.col("y"))
             .distinct()
             .localCheckpoint(eager=False))
        cur = fingerprint(e)
        if cur == prev:
            break
        prev = cur
    else:
        raise RuntimeError(
            f"connected_components: no convergence in {max_rounds} "
            f"rounds — raise max_rounds (edge fingerprint still "
            f"moving: {prev} -> {cur})")
    roots = e.select(F.col("y").alias("node")).distinct() \
        .withColumn("component", F.col("node"))
    return (e.select(F.col("x").alias("node"),
                     F.col("y").alias("component"))
            .unionByName(roots)
            .groupBy("node").agg(F.min("component").alias("component")))
