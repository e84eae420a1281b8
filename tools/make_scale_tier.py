"""Synthesize a deterministic ~Nx data tier above sf0.1 (r12 verdict
task 3): the SCALE.md flatness sweep tops out at 17 MB, where fixed
overhead swamps the data term — this tool inflates the fact tables so
tools/bench_scale.py can MEASURE per-entry scaling instead of arguing
it from plan shape.

    python tools/make_scale_tier.py [src_sf_dir] [out_dir] [factor]

defaults: /root/testdata/sf0.1  /tmp/spark_graft_sf1  10

Design, so the measured ratios mean what they claim:

- Deterministic, no RNG / no wall clock: every replica k of a row is a
  pure function of (row keys, k). Rerunning the tool reproduces the
  tier byte-for-byte (modulo parquet row-group packing).
- FACT tables inflate, DIMENSIONS do not (region/nation/customer/
  supplier/part copy through) — that is what corpus growth looks like;
  joins against dims must stay broadcast at every tier.
- Replicas are made DISTINCT where identity would corrupt the
  workload's complexity class:
  * documents: replica k>0 suffixes every token with ``_k`` — the
    shingle/token universes of replicas are DISJOINT, so dedup /
    set-similarity pair structure replicates per-tier (10x pairs),
    instead of every doc gaining 9 exact twins (which would quadratize
    pair generation and measure an artifact, not scaling).
  * embeddings: replica vectors get a small deterministic arithmetic
    jitter per element, so near-dup/ANN neighborhoods replicate
    instead of collapsing onto exact duplicates.
  * ids shift by a constant stride per replica, keeping every
    downstream id-arithmetic entry (twin offsets, md5 coins) collision
    free and per-replica workloads statistically identical to sf0.1.
- user_id/orderkey strides keep per-key cardinalities FIXED while key
  counts grow 10x — the realistic growth mode (more users, not longer
  histories), so per-key windows/sessions stay constant-size and any
  super-linear growth a measurement finds is the operator's, not the
  generator's.
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

DOC_STRIDE = 10_000_000
VEC_STRIDE = 10_000_000
EVENT_STRIDE = 1_000_000_000
USER_STRIDE = 10_000_000
ORDER_STRIDE = 100_000_000

COPY_TABLES = ("region", "nation", "customer", "supplier", "part")


def _replicate(df, factor: int):
    """Cross join with the replica index k = 0..factor-1."""
    spark = df.sparkSession
    ks = spark.range(factor).select(F.col("id").cast("int").alias("_k"))
    return df.crossJoin(F.broadcast(ks))


def build_tier(spark: SparkSession, src: str, out: str,
               factor: int) -> None:
    docs = _replicate(spark.read.parquet(f"{src}/documents.parquet"),
                      factor)
    # token-disjoint replicas: suffix every whitespace-token of k>0
    docs.select(
        (F.col("doc_id") + F.col("_k").cast("long") * DOC_STRIDE)
        .alias("doc_id"),
        F.when(F.col("_k") == 0, F.col("text")).otherwise(
            F.expr(r"regexp_replace(text, '(\\S+)', concat('$1_', _k))")
        ).alias("text"),
        "lang", "source", "n_chars",
    ).write.mode("overwrite").parquet(f"{out}/documents.parquet")

    emb = _replicate(spark.read.parquet(f"{src}/embeddings.parquet"),
                     factor)
    # deterministic per-element jitter: +-1% of unit scale, pure
    # integer arithmetic — replicas are near but not exact neighbors
    emb.select(
        (F.col("vec_id") + F.col("_k").cast("long") * VEC_STRIDE)
        .alias("vec_id"),
        F.when(F.col("_k") == 0, F.col("embedding")).otherwise(
            F.transform(
                "embedding",
                lambda x, i: (x + (
                    (F.pmod(F.col("vec_id") * 31 + F.col("_k") * 17
                            + i * 7, F.lit(997)) / 997.0 - 0.5) * 0.02
                ).cast("float")))
        ).alias("embedding"),
        "label",
    ).write.mode("overwrite").parquet(f"{out}/embeddings.parquet")

    ev = _replicate(spark.read.parquet(f"{src}/events.parquet"), factor)
    ev.select(
        (F.col("event_id") + F.col("_k").cast("long") * EVENT_STRIDE)
        .alias("event_id"),
        "ts",
        (F.col("user_id") + F.col("_k").cast("long") * USER_STRIDE)
        .alias("user_id"),
        "event_type", "value", "props",
    ).write.mode("overwrite").parquet(f"{out}/events.parquet")

    li = _replicate(spark.read.parquet(f"{src}/lineitem.parquet"), factor)
    li.select(
        (F.col("l_orderkey") + F.col("_k").cast("long") * ORDER_STRIDE)
        .alias("l_orderkey"),
        "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
        "l_linestatus", "l_shipdate",
    ).write.mode("overwrite").parquet(f"{out}/lineitem.parquet")

    od = _replicate(spark.read.parquet(f"{src}/orders.parquet"), factor)
    od.select(
        (F.col("o_orderkey") + F.col("_k").cast("long") * ORDER_STRIDE)
        .alias("o_orderkey"),
        "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate",
        "o_orderpriority",
    ).write.mode("overwrite").parquet(f"{out}/orders.parquet")

    for t in COPY_TABLES:
        spark.read.parquet(f"{src}/{t}.parquet") \
            .write.mode("overwrite").parquet(f"{out}/{t}.parquet")


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/spark_graft_sf1"
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    spark = (SparkSession.builder.master("local[16]")
             .config("spark.ui.enabled", "false")
             .config("spark.sql.shuffle.partitions", "16")
             .config("spark.driver.memory", "16g")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    build_tier(spark, src, out, factor)
    for t in ("documents", "embeddings", "events", "lineitem", "orders"):
        n = spark.read.parquet(f"{out}/{t}.parquet").count()
        print(f"{t}: {n} rows")
    spark.stop()


if __name__ == "__main__":
    main()
