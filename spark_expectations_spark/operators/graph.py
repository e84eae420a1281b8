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

__all__ = ["pagerank", "hits"]


def pagerank(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    iterations: int = 3,
    damping: float = 0.85,
    rank_digits: int = 9,
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

    Scale shape: nodes/out-degrees computed once (two edge-keyed
    aggs); each iteration is ONE src-keyed join of the rank vector
    onto the edge list + ONE dst-keyed sum (both map-side combined) +
    a 1-row dangling-mass fold; ``localCheckpoint`` cuts lineage per
    round. Nothing is ever nodes² — 100 TB of edges shuffles on
    (src|dst) keys only, the same shape as a groupBy-join pipeline.
    Skewed hubs behave like any skewed join key (AQE skew-join
    applies). ``iterations`` is a fixed small constant by contract:
    rank ordering stabilizes in a handful of rounds; full numeric
    convergence is not the use case.
    """
    if not 0.0 < damping < 1.0:
        raise ValueError("damping must be in (0, 1)")
    if iterations < 0:
        raise ValueError("iterations must be >= 0")
    wcol = (F.col(weight).cast("double") if weight is not None
            else F.lit(1.0))
    e = edges.select(F.col(src).alias("__src"), F.col(dst).alias("__dst"),
                     wcol.alias("__w"))
    if weight is not None:
        bad = e.filter(F.col("__w").isNull()
                       | (F.col("__w") <= 0)).limit(1).count()
        if bad:
            raise ValueError(
                "pagerank: NULL or non-positive edge weight — a silent "
                "drop would re-route rank mass; clean the edge list")
    nodes = (e.select(F.col("__src").alias("node"))
             .unionByName(e.select(F.col("__dst").alias("node")))
             .distinct()
             .localCheckpoint(eager=False))
    n_nodes = nodes.count()
    if n_nodes == 0:
        raise ValueError("pagerank: empty edge list")
    outdeg = e.groupBy("__src").agg(F.sum("__w").alias("__deg"))
    # (node, deg) with 0 for dangling — left join once, reused per round
    nd = (nodes.join(outdeg, nodes["node"] == outdeg["__src"], "left")
          .select("node", F.coalesce("__deg", F.lit(0.0)).alias("__deg"))
          .localCheckpoint(eager=False))
    d = float(damping)
    base = (1.0 - d) / n_nodes
    ranks = nd.select("node", "__deg",
                      F.lit(1.0 / n_nodes).alias("__r"))
    for _ in range(iterations):
        dangling = (ranks.filter(F.col("__deg") == 0)
                    .agg(F.coalesce(F.sum("__r"), F.lit(0.0))
                         .alias("__dm")).first()["__dm"])
        contrib = (e.join(ranks, e["__src"] == ranks["node"])
                   .select(F.col("__dst").alias("node"),
                           (F.col("__r") * F.col("__w") / F.col("__deg"))
                           .alias("__c")))
        summed = contrib.groupBy("node").agg(F.sum("__c").alias("__s"))
        ranks = (nd.join(summed, "node", "left")
                 .select("node", "__deg",
                         (F.lit(base)
                          + F.lit(d) * (F.coalesce("__s", F.lit(0.0))
                                        + F.lit(dangling / n_nodes)))
                         .alias("__r"))
                 .localCheckpoint(eager=False))
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
    a(v)``, each L1-normalized (scores sum to 1 — the L2 convention
    differs only by a constant factor per round; L1 keeps every
    quantity a plain sum/division both engines reproduce exactly).
    Deterministic: fixed iteration count from the uniform vector, no
    RNG, ``score_digits`` rounding on output (the pagerank
    convention). Duplicate edges count as parallel edges. Nodes with
    no in-edges keep authority 0; no out-edges, hub 0.

    Scale shape: per iteration TWO edge-keyed joins + TWO keyed
    map-side-combined sums + two 1-row normalization folds, with
    ``localCheckpoint`` lineage cuts per round — the pagerank shape
    run once in each direction. Nothing is nodes².
    """
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    e = edges.select(F.col(src).alias("__src"), F.col(dst).alias("__dst"))
    nodes = (e.select(F.col("__src").alias("node"))
             .unionByName(e.select(F.col("__dst").alias("node")))
             .distinct()
             .localCheckpoint(eager=False))
    n_nodes = nodes.count()
    if n_nodes == 0:
        raise ValueError("hits: empty edge list")
    hubs = nodes.select("node", F.lit(1.0 / n_nodes).alias("__h"))
    auths = nodes.select("node", F.lit(0.0).alias("__a"))
    for _ in range(iterations):
        a_raw = (e.join(hubs, e["__src"] == hubs["node"])
                 .groupBy(F.col("__dst").alias("node"))
                 .agg(F.sum("__h").alias("__a")))
        a_tot = a_raw.agg(F.sum("__a")).first()[0] or 1.0
        auths = (nodes.join(a_raw, "node", "left")
                 .select("node",
                         (F.coalesce("__a", F.lit(0.0)) / F.lit(a_tot))
                         .alias("__a"))
                 .localCheckpoint(eager=False))
        h_raw = (e.join(auths, e["__dst"] == auths["node"])
                 .groupBy(F.col("__src").alias("node"))
                 .agg(F.sum("__a").alias("__h")))
        h_tot = h_raw.agg(F.sum("__h")).first()[0] or 1.0
        hubs = (nodes.join(h_raw, "node", "left")
                .select("node",
                        (F.coalesce("__h", F.lit(0.0)) / F.lit(h_tot))
                        .alias("__h"))
                .localCheckpoint(eager=False))
    return (hubs.join(auths, "node")
            .select("node",
                    (F.round("__h", score_digits) + F.lit(0.0))
                    .alias("hub"),
                    (F.round("__a", score_digits) + F.lit(0.0))
                    .alias("authority")))
