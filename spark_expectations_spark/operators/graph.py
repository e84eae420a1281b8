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

__all__ = ["pagerank"]


def pagerank(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
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
    e = edges.select(F.col(src).alias("__src"), F.col(dst).alias("__dst"))
    nodes = (e.select(F.col("__src").alias("node"))
             .unionByName(e.select(F.col("__dst").alias("node")))
             .distinct()
             .localCheckpoint(eager=False))
    n_nodes = nodes.count()
    if n_nodes == 0:
        raise ValueError("pagerank: empty edge list")
    outdeg = e.groupBy("__src").agg(F.count(F.lit(1)).alias("__deg"))
    # (node, deg) with 0 for dangling — left join once, reused per round
    nd = (nodes.join(outdeg, nodes["node"] == outdeg["__src"], "left")
          .select("node", F.coalesce("__deg", F.lit(0)).alias("__deg"))
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
                           (F.col("__r") / F.col("__deg"))
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
