"""Entity resolution over a dirty supplier-style feed: measure a
blocking configuration (reduction ratio vs pairs completeness), run the
blocked fuzzy join, build a standing blocking index and probe a "daily
batch" against it, self-pair a corpus for fuzzy dedup, and finish with
a PPJoin set-similarity join on name token sets — the full
`operators.linkage` surface on real parquet.

    python examples/entity_resolution.py [sf_dir]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from spark_expectations_spark.operators import linkage


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (SparkSession.builder.master("local[4]")
             .config("spark.sql.shuffle.partitions", "4")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    # master list: unique "name #id" entities; dirty feed: one-char
    # deletions of the same entities (what a typo-ridden upload looks
    # like)
    key = F.concat(F.col("p_name"), F.lit(" #"),
                   F.col("p_partkey").cast("string"))
    master = part.select(F.col("p_partkey").alias("mid"),
                         key.alias("mname"))
    pos = (F.col("p_partkey") % 7 + 1).cast("int")
    feed = part.select(
        (F.col("p_partkey") + 1000000).alias("fid"),
        F.concat(key.substr(F.lit(1), pos - 1),
                 key.substr(pos + 1, F.lit(100000))).alias("fname"))

    # 1. measure blocking BEFORE trusting it
    rep = linkage.blocking_quality_report(
        feed, master, "fid", "fname", "mid", "mname",
        max_distance=1, blockers=("ngram",), sample_fraction=0.5).first()
    print(f"blocking QA: reduction={rep['reduction_ratio']:.4f} "
          f"completeness={rep['pairs_completeness']}")

    # 2. the one-shot fuzzy join (rare-gram prefix filtering)
    matches = linkage.blocked_fuzzy_join(
        feed, master, "fid", "fname", "mid", "mname",
        max_distance=1, blockers=("ngram",), prefix_filter=True)
    print(f"one-shot matches: {matches.count()}")

    matches = matches  # reused by the FS stage below

    # 3. steady state: standing index + probe batch
    idx_dir = Path(sf_dir).name + "_linkage_index"
    idx_path = f"/tmp/er_demo_{idx_dir}"
    linkage.blocking_index(
        master, "mid", "mname",
        blockers=(("prefix", "length"),)).write.mode(
        "overwrite").parquet(idx_path)
    probe = feed.filter(F.col("fid") % 10 == 0)
    probed = linkage.probe_blocking_index(
        spark.read.parquet(idx_path), probe, "fid", "fname",
        max_distance=1, blockers=(("prefix", "length"),))
    print(f"probe batch matches: {probed.count()} (index at {idx_path})")

    # 4. fuzzy dedup within the feed itself
    pairs = linkage.fuzzy_self_pairs(
        feed.union(master.select(F.col("mid").alias("fid"),
                                 F.col("mname").alias("fname"))),
        "fid", "fname", max_distance=1, blockers=(("prefix", "length"),))
    print(f"within-corpus fuzzy pairs: {pairs.count()}")

    # 5. Fellegi-Sunter decisions: take LOOSE candidates (coarse
    # name-prefix blocking, no tight verify — a mixed pool of true and
    # false pairs, which is what EM needs), derive three field
    # agreements, learn (m, u) from the unlabeled pool, then score
    loose = linkage.blocked_fuzzy_join(
        feed, master, "fid", "fname", "mid", "mname",
        max_distance=30, blockers=("prefix",), prefix_len=3)
    fields = loose.join(
        part.select(F.col("p_partkey").alias("mid"), "p_brand",
                    "p_size"), "mid").join(
        part.select((F.col("p_partkey") + 1000000).alias("fid"),
                    F.col("p_brand").alias("f_brand"),
                    F.col("p_size").alias("f_size")), "fid").select(
        "fid", "mid",
        (F.col("distance") <= 1).alias("a_near"),
        (F.col("p_brand") == F.col("f_brand")).alias("a_brand"),
        (F.col("p_size") == F.col("f_size")).alias("a_size"))
    m, u, prior = linkage.fs_estimate_mu(
        fields, ["a_near", "a_brand", "a_size"])
    print("FS EM-recovered parameters: "
          + ", ".join(f"{c}: m={mi:.3f} u={ui:.3f}"
                      for c, mi, ui in zip(
                          ("a_near", "a_brand", "a_size"), m, u))
          + f"; match prior p={prior:.3f}")
    scored = linkage.fs_score_pairs(
        fields, ["a_near", "a_brand", "a_size"], m=m, u=u,
        lower=0.0, upper=4.0)
    dec = {r["decision"]: r["count"]
           for r in scored.groupBy("decision").count().collect()}
    print(f"FS decisions (fitted, not fixed, m/u): {dec}")

    # 6. set-similarity join on word-token sets
    toks = F.array_distinct(F.split(F.lower(F.col("fname")), r"[\s#]+"))
    mtoks = F.array_distinct(F.split(F.lower(F.col("mname")), r"[\s#]+"))
    sim = linkage.set_similarity_join(
        feed.select("fid", toks.alias("fset")),
        master.select("mid", mtoks.alias("mset")),
        "fid", "fset", "mid", "mset", threshold=0.5)
    print(f"token-set jaccard>=0.5 pairs: {sim.count()}")

    # 7. sorted-neighborhood pass: the key-agnostic blocker — its
    # candidate budget is exactly n*(window-1) whatever the key looks
    # like; union its pairs with a value-keyed blocker's for recall
    corpus = feed.union(master.select(F.col("mid").alias("fid"),
                                      F.col("mname").alias("fname")))
    snm = linkage.sorted_neighborhood_pairs(
        corpus, "fid", "fname", window=4, max_distance=1)
    both = (pairs.select("id_a", "id_b")
            .intersect(snm.select(F.col("left_id").alias("id_a"),
                                  F.col("right_id").alias("id_b"))))
    print(f"sorted-neighborhood pairs (w=4, d<=1): {snm.count()} "
          f"(overlap with blocked fuzzy pairs: {both.count()})")

    spark.stop()


if __name__ == "__main__":
    main()
