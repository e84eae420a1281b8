"""Training-data prep over the documents corpus: quality profiling,
near-duplicate detection (MinHash LSH), deterministic splits.

    python examples/training_data_prep.py [sf_dir]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from spark_expectations_spark.operators import dedup, sampling, text


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (SparkSession.builder.master("local[4]")
             .config("spark.sql.shuffle.partitions", "4")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    profiled = text.profile(docs, "text")
    kept = profiled.filter((F.col("quality_score") >= 0.7)
                           & (F.col("lang_detected") == "en"))
    print(f"quality+lang gate: {docs.count()} -> {kept.count()} docs")

    pairs = dedup.minhash_dedup_pairs(kept, "doc_id", "text", threshold=0.5)
    drop_ids = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    deduped = kept.join(drop_ids, "doc_id", "left_anti")
    print(f"near-dup removal: {kept.count()} -> {deduped.count()} docs")

    split = sampling.with_split(deduped, "doc_id",
                                {"train": 0.8, "val": 0.1, "test": 0.1})
    split.groupBy("split").count().orderBy("split").show()
    spark.stop()


if __name__ == "__main__":
    main()
