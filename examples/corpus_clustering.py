"""Embedding-corpus clustering end to end: train a codebook with
Lloyd's k-means (full corpus, then the 100 TB train-on-sample mode),
QA the clusters (cohesion / silhouette / label purity) before trusting
them, swap the trained codebook into the IVF search path, and compare
its recall@5 against the exhaustive top-k — the full
`similarity` clustering surface on real parquet.

    python examples/corpus_clustering.py [sf_dir]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from spark_expectations_spark.operators import similarity


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (SparkSession.builder.master("local[4]")
             .config("spark.sql.shuffle.partitions", "4")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    # 1. train: deterministic Lloyd's k-means (k=8, 3 updates)
    codebook = similarity.lloyd_kmeans(
        emb, id_col="vec_id", vec_col="embedding", k=8, iterations=3)
    wcss = (codebook.filter(F.col("pos") == 0)
            .agg(F.sum("wcss").alias("w")).first()["w"])
    print(f"k-means: total within-cluster SSE = {wcss:.1f}")

    # 2. the scale mode: same training on the md5-half sample, full
    #    corpus still measured
    sampled = similarity.lloyd_kmeans(
        emb, id_col="vec_id", vec_col="embedding", k=8, iterations=3,
        sample_fraction=0.5)
    w2 = (sampled.filter(F.col("pos") == 0)
          .agg(F.sum("wcss").alias("w")).first()["w"])
    print(f"k-means (trained on 50% sample): SSE = {w2:.1f} "
          f"({w2 / wcss:.2f}x of full-corpus training)")

    # 3. QA the clusters BEFORE trusting them for curriculum buckets /
    #    SemDeDup cells / IVF partitions
    qa = similarity.kmeans_cluster_qa(
        emb, codebook, id_col="vec_id", vec_col="embedding",
        label_col="label")
    print("cluster QA (size / cohesion / silhouette / purity):")
    for r in qa.orderBy("centroid_id").collect():
        print(f"  c{r['centroid_id']}: n={r['n']:4d} "
              f"intra={r['avg_intra']} sil={r['silhouette']} "
              f"purity={r['purity']}")

    # 4. swap the trained codebook into the IVF search path and
    #    measure recall@5 vs exhaustive search on a probe query set
    cents = similarity.centroids_from_long(codebook)
    assigned = similarity.assign_centroids(emb, cents,
                                           vec_col="embedding")
    queries = emb.filter(F.col("vec_id") < 10)
    exact = similarity.cosine_topk(emb, queries, id_col="vec_id",
                                   vec_col="embedding", k=5)
    approx = similarity.ivf_topk(assigned, cents, queries,
                                 id_col="vec_id", vec_col="embedding",
                                 k=5, nprobe=4)
    rec = similarity.recall_at_k(exact, approx)
    mean_rec = rec.agg(F.avg("recall").alias("r")).first()["r"]
    print(f"IVF(kmeans codebook, nprobe=4/8) recall@5 = {mean_rec:.3f}")

    # 5. compress ahead of quantization: PCA to the top 16 of 64 dims
    pca = similarity.pca_project(emb, n_components=16)
    kept = pca.select(F.explode("pca").alias("v")).agg(
        F.sum(F.col("v") * F.col("v")).alias("s")).first()["s"]
    print(f"PCA(16/64): kept centered energy = {kept:.1f}")

    spark.stop()


if __name__ == "__main__":
    main()
