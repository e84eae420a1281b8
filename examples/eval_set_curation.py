"""Retrieval eval-set curation, end to end, over the new analytics
operators: importance-weight a co-occurrence graph (PageRank + HITS),
calibrate per-source quality scores (within-source ECDF), pick a
DIVERSIFIED top-k per query (MMR over embeddings), screen candidate
answers against references for n-gram contamination (ROUGE-2), and
gate the multi-judge labels with Krippendorff's alpha (interval
metric). Every step is a declarative DataFrame transform; only
model-scale frames reach the driver.

    python examples/eval_set_curation.py [sf_dir]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from spark_expectations_spark.operators import graph, profiling, similarity
from spark_expectations_spark.operators import text as T


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (SparkSession.builder.master("local[4]")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    od = spark.read.parquet(f"{sf_dir}/orders.parquet")

    # 1. importance priors from graph structure: PageRank over the
    # part co-purchase graph, HITS over the bipartite customer->part
    # graph (two-sided scores a one-sided centrality would mix)
    lp = li.select(F.col("l_orderkey").alias("ok"),
                   F.col("l_partkey").alias("pk"))
    a, b = lp.alias("a"), lp.alias("b")
    pairs = (a.join(b, "ok").filter(F.col("a.pk") < F.col("b.pk"))
             .groupBy(F.col("a.pk").alias("pa"), F.col("b.pk").alias("pb"))
             .agg(F.count(F.lit(1)).alias("w")))
    edges = (pairs.selectExpr("pa as src", "pb as dst", "w")
             .unionByName(pairs.selectExpr("pb as src", "pa as dst", "w")))
    pr = graph.pagerank(edges, weight="w", iterations=3)
    top = pr.orderBy(F.desc("rank")).limit(3).collect()
    print("top co-purchase PageRank parts:",
          [(r["node"], r["rank"]) for r in top])

    bip = (li.join(od, li["l_orderkey"] == od["o_orderkey"])
           .select((F.col("o_custkey") + 100000000).alias("src"),
                   F.col("l_partkey").alias("dst")).distinct())
    h = graph.hits(bip, iterations=2)
    ha = h.orderBy(F.desc("authority")).first()
    print(f"top authority part: {ha['node']} ({ha['authority']:.6f})")

    # 2. cross-source score calibration: raw per-source 'quality'
    # (length here) -> within-source quantile, so sources mix fairly
    q = T.quantile_normalize_scores(
        docs.select("doc_id", "source",
                    F.col("n_chars").cast("double").alias("score")),
        "source", "score")
    kept = q.filter(F.col("qscore") >= 0.5)
    print(f"balanced keep: {kept.count()} docs "
          f"({q.count()} scored, top half of EACH source)")

    # 3. diversified retrieval: MMR top-3 per query over the pool of 8
    queries = emb.filter(F.col("vec_id") < 5)
    slate = similarity.mmr_topk(emb, queries, k=3, pool=8, lam=0.5)
    print("MMR slates:", slate.count(), "rows (3 per query)")

    # 4. contamination screen: candidate answers vs reference texts
    # (synth: truncated twins) — high ROUGE-2 recall = likely leaked
    words = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    cand = docs.select(
        "doc_id", "text",
        F.array_join(F.slice(words, 1, F.greatest(F.size(words) - 5,
                                                  F.lit(1))), " ")
        .alias("cand"))
    rouge = T.ngram_overlap(cand, "doc_id", "text", "cand", n=2)
    flagged = rouge.filter(F.col("recall") >= 0.8).count()
    print(f"contamination screen: {flagged} candidates with "
          f"ROUGE-2 recall >= 0.8")

    # 5. judge-ensemble QA: three synthesized 1-5 raters; interval
    # alpha tells us whether the panel agrees enough to trust
    base = (F.lit(1) + F.col("n_chars") % 5).cast("long")
    r1 = docs.select(F.col("doc_id").alias("unit"), base.alias("rating"))
    r2 = docs.select(F.col("doc_id").alias("unit"),
                     F.least(F.lit(5).cast("long"), base + 1)
                     .alias("rating"))
    r3 = docs.select(F.col("doc_id").alias("unit"),
                     F.greatest(F.lit(1).cast("long"), base - 1)
                     .alias("rating"))
    alpha = profiling.krippendorff_alpha(
        r1.unionByName(r2).unionByName(r3), "unit", "rating",
        metric="interval").first()
    print(f"judge-panel interval alpha: {alpha['alpha']:.4f} "
          f"over {alpha['n_units']} items")

    # 6. conformal acceptance gate: per-source threshold on a
    # nonconformity score (here: how far a doc's length sits from its
    # source norm) with a finite-sample ≥90% coverage guarantee —
    # the principled version of "cut at the 90th percentile"
    scores = docs.select(
        "source",
        F.abs(F.col("n_chars")
              - F.avg("n_chars").over(Window.partitionBy("source")))
        .cast("double").alias("nonconf"))
    thr = profiling.conformal_threshold(scores, "nonconf", alpha=0.1,
                                        group_cols=("source",))
    worst = thr.orderBy(F.col("threshold").desc()).first()
    print(f"conformal gates over {thr.count()} sources; loosest: "
          f"{worst['source']} at {worst['threshold']:.1f} "
          f"(n={worst['n']}, k={worst['k']})")

    spark.stop()


if __name__ == "__main__":
    main()
