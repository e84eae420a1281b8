"""Sequence packing for LLM training pipelines (concat-and-chunk).

Training dataloaders concatenate documents into a token stream and cut it
into fixed-budget sequences. Doing that assignment IN the engine — instead
of at read time — lets a pipeline shuffle/shard packs as first-class rows.

The layout here is the distributed version of concat-and-chunk:

* each doc is hashed (md5 of its key — portable, partition-invariant, and
  byte-identical in DuckDB so the assignment is oracle-checkable) into one
  of ``n_streams`` independent streams;
* within a stream, docs are laid out in deterministic key order and the
  EXCLUSIVE running sum of their weights (tokens/chars) gives each doc its
  byte offset in the stream;
* ``pack_id = offset div budget`` — the sequence a doc's first token lands
  in; ``pack_offset = offset mod budget`` its position inside it.

Scale posture: ONE shuffle (hash-partition by stream) + one window per
stream. Streams are the parallelism unit — at 100 TB you raise
``n_streams`` to a multiple of the cluster's cores and every stream's
window is an independent, memory-bounded sort. No driver-side state, no
iterative passes; a doc's (stream, pack, offset) is a pure function of the
table's contents, so re-runs and backfills are stable.

Reference scope note: the reference engine (Nike-Inc/spark-expectations)
has no packing operator; this is a north-star training-data extension
(SURVEY.md §7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_for_training(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    *,
    budget: int,
    n_streams: int = 256,
    stream_out: str = "stream",
    pack_out: str = "pack_id",
    offset_out: str = "pack_offset",
) -> DataFrame:
    """Assign every row a (stream, pack_id, pack_offset) placement.

    ``weight_col`` is the row's length in whatever unit ``budget`` uses
    (tokens, chars, bytes). Rows may straddle pack boundaries — exactly
    like concat-and-chunk training data; ``pack_offset + weight - budget``
    tells a consumer how much carries into the next pack.
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    if n_streams <= 0:
        raise ValueError("n_streams must be positive")
    # first 4 md5 hex chars → 0..65535, then mod n_streams (same portable
    # hash family as operators/sampling.py so splits and packs compose)
    stream = F.pmod(
        F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 4), 16, 10)
        .cast("long"),
        F.lit(n_streams),
    )
    out = df.withColumn(stream_out, stream)
    w = (
        Window.partitionBy(stream_out)
        .orderBy(key_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offset = F.coalesce(F.sum(weight_col).over(w), F.lit(0)).cast("long")
    # exact long division — float floor(x/y) loses bits once stream
    # offsets pass 2^53 (reachable at the 100 TB design point)
    return (
        out.withColumn("_sg_off", offset)
        .withColumn(pack_out, F.expr(f"_sg_off div {int(budget)}"))
        .withColumn(offset_out, F.col("_sg_off") % budget)
        .drop("_sg_off")
    )


def length_bucket(
    weight_col,
    boundaries,
):
    """Bucket index for a length/token count against ascending
    ``boundaries``: ``bucket b`` holds weights in ``(boundaries[b-1],
    boundaries[b]]`` with bucket 0 = ``(-inf, boundaries[0]]`` and the
    last bucket open-ended — the assignment step of length-bucketed
    batching (batching similar-length sequences together so per-batch
    padding tracks the bucket spread, not the corpus max). Codegen
    comparison fold, zero shuffle; NULL weights → NULL bucket."""
    b = sorted(boundaries)
    if not b:
        raise ValueError("boundaries must be non-empty")
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    idx = None
    for t in b:
        term = (w > F.lit(t)).cast("int")
        idx = term if idx is None else idx + term
    return F.when(w.isNotNull(), idx)


def padding_waste_report(
    df: DataFrame,
    weight_col: str,
    boundaries,
    *,
    bucket_out: str = "bucket",
) -> DataFrame:
    """Quantify what length-bucketed batching buys BEFORE rewriting the
    loader: per :func:`length_bucket`, the docs/token totals and the
    tokens a pad-to-bucket-max batcher would burn —
    ``padded_tokens = n_docs · max_tokens − sum_tokens`` (padding to
    the CORPUS max instead is the no-bucketing baseline; compare
    ``Σ padded`` across one-bucket vs many-bucket runs to pick
    boundaries). Returns ``(bucket, lo, hi, n_docs, sum_tokens,
    max_tokens, padded_tokens, waste_frac)`` rows, boundaries-sized.

    ONE map-side-combined aggregate over the scan — the fold-bucket /
    histogram shape (drift.psi, ks_statistic); NULL weights drop with
    a count reported would be noise — filter upstream if they matter."""
    b = sorted(boundaries)
    d = (df.filter(F.col(weight_col).isNotNull())
         .withColumn(bucket_out, length_bucket(weight_col, b)))
    lo = F.element_at(
        F.array(*([F.lit(None).cast("long")] + [F.lit(x) for x in b])),
        F.col(bucket_out) + 1)
    hi = F.element_at(
        F.array(*([F.lit(x) for x in b] + [F.lit(None).cast("long")])),
        F.col(bucket_out) + 1)
    agg = (d.groupBy(bucket_out)
           .agg(F.count(F.lit(1)).alias("n_docs"),
                F.sum(weight_col).alias("sum_tokens"),
                F.max(weight_col).alias("max_tokens")))
    padded = (F.col("n_docs") * F.col("max_tokens")
              - F.col("sum_tokens"))
    return (agg
            .withColumn("lo", lo).withColumn("hi", hi)
            .withColumn("padded_tokens", padded)
            .withColumn("waste_frac",
                        F.round(padded / (F.col("n_docs")
                                          * F.col("max_tokens")), 6))
            .select(bucket_out, "lo", "hi", "n_docs", "sum_tokens",
                    "max_tokens", "padded_tokens", "waste_frac"))


def write_training_shards(
    df: DataFrame,
    path: str,
    *,
    n_shards: int,
    key_col: str,
    format: str = "parquet",
    mode: str = "overwrite",
) -> DataFrame:
    """Write a prepared corpus as exactly ``n_shards`` balanced files and
    return the shard manifest (shard_id, n_rows).

    Dataloaders want uniform shards they can assign to workers; a plain
    ``coalesce``/default write gives however many part-files the last
    stage had, sized however the data fell. Here each row's shard is
    md5(key) mod n_shards — deterministic (re-runs land rows in the SAME
    shard, so resumable downloads/caches stay valid), balanced by the
    hash, and written via partitionBy(shard_id) so shard N is a stable
    directory. One shuffle. The manifest is computed from the written
    data — it reports what's on disk, not what was intended.
    """
    if n_shards <= 0:
        raise ValueError("n_shards must be positive")
    shard = F.pmod(
        F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 8), 16, 10)
        .cast("long"),
        F.lit(n_shards),
    ).alias("shard_id")
    (df.select(shard, "*")
       .repartition("shard_id")
       .write.mode(mode).partitionBy("shard_id").format(format).save(path))
    spark = df.sparkSession
    return (
        spark.read.format(format).load(path)
        .groupBy("shard_id").agg(F.count(F.lit(1)).alias("n_rows"))
    )


def fold_pack(
    df: DataFrame,
    id_col: str,
    len_col: str,
    *,
    capacity: int,
    num_buckets: int = 256,
) -> DataFrame:
    """NO-SPLIT sequence pairing ("fold packing"): sort documents by
    length descending and pair rank r with rank n−1−r — the longest
    with the shortest — keeping a pair only when its combined length
    fits ``capacity``. The complement of :func:`pack_for_training`
    (concat-and-chunk, which SPLITS documents at chunk boundaries):
    fold packing never splits, so it suits SFT/eval sets where a
    document must stay intact, at the cost of residual padding that
    :func:`padding_waste_report` quantifies. Returns ``(id, length,
    pack_id, pack_len, pack_size, overflow)``: fitting pairs share a
    pack (id = the pair's lower rank), non-fitting pairs split into
    two singletons (id = n + r, disjoint from pair ids), the odd
    middle document is a singleton at its own rank, and documents
    LONGER than capacity get negative pack ids (they can never pack;
    flagging beats silently truncating). NULL lengths raise.

    Deterministic and fully value-oracle-checkable: the global rank
    comes from :func:`~.sampling.dense_global_index` (two-phase bucket
    ranking — no single-task global sort) over the unique
    (−length, id) key; everything after is integer arithmetic. Scale
    shape: the rank's one bucket-keyed shuffle + per-bucket sorts,
    then ONE pair-keyed groupBy and a broadcast-size count; nothing
    corpus².
    """
    if capacity < 1:
        raise ValueError("capacity must be >= 1")
    from .sampling import dense_global_index

    L = F.col(len_col).cast("long")
    base = df.select(F.col(id_col).alias("__id"), L.alias("__len"))
    # ONE pre-aggregation answers the NULL guard, the pairable count
    # (so no second count over the ranked frame), and whether an
    # overflow branch exists at all — separate jobs for each cost more
    # wall-clock than the packing itself at small SF (measured
    # 5.9 s → 4.6 s at sf0.1 when first folded; r16 then collapsed the
    # two subset rankings into one global ranking below)
    stats = base.agg(
        F.sum(F.col("__len").isNull().cast("int")).alias("__nulls"),
        F.sum((F.col("__len") > capacity).cast("int")).alias("__nover"),
        F.count(F.lit(1)).alias("__nall")).first()
    if stats["__nulls"]:
        raise ValueError(
            "fold_pack: NULL length — packing needs every document "
            "measured; filter or fix upstream")
    n_over = int(stats["__nover"] or 0)
    # ONE global ranking over the whole corpus (r16): every overflow
    # doc is strictly longer than every packable doc, so under the
    # (−len, id) key the overflow docs occupy global ranks
    # 0..n_over−1 and the packable docs n_over..n−1 — both branches'
    # dense subset ranks fall out by subtraction, which halves the
    # ranking passes (each dense_global_index costs a percentile job,
    # a bucket-count collect, and a bucket shuffle). Threshold
    # placement changes (full-corpus percentiles), but that only
    # affects bucket balance — the rank, and hence every pack id, is
    # exact and identical (dense_global_index's documented contract).
    ranked_all = dense_global_index(
        base.withColumn("__neg", -F.col("__len")),
        ["__neg", "__id"], out="__ra",
        num_buckets=num_buckets).drop("__neg")
    if n_over:
        # two consumers below — cut so the bucket shuffle + per-bucket
        # sorts run once (the r11 multi-consumer persist rule)
        ranked_all = ranked_all.localCheckpoint(eager=False)
    ranked = (ranked_all.filter(F.col("__len") <= capacity)
              .withColumn("__r", F.col("__ra") - F.lit(n_over))
              .drop("__ra"))
    n = int(stats["__nall"]) - n_over
    pk = F.least(F.col("__r"), F.lit(n - 1) - F.col("__r"))
    p = ranked.withColumn("__pk", pk)
    g = (p.groupBy("__pk")
         .agg(F.sum("__len").alias("__plen"),
              F.count(F.lit(1)).alias("__cnt")))
    fits = (F.col("__cnt") == 2) & (F.col("__plen") <= capacity)
    paired = (p.join(g, "__pk")
              .select(
                  F.col("__id").alias(id_col),
                  F.col("__len").alias("length"),
                  F.when(fits | (F.col("__cnt") == 1), F.col("__pk"))
                   .otherwise(F.lit(n) + F.col("__r"))
                   .cast("long").alias("pack_id"),
                  F.when(fits, F.col("__plen"))
                   .otherwise(F.col("__len")).alias("pack_len"),
                  F.when(fits, F.lit(2)).otherwise(F.lit(1))
                   .alias("pack_size"),
                  F.lit(False).alias("overflow")))
    if n_over == 0:
        return paired          # no overflow branch at all
    over_ranked = (ranked_all.filter(F.col("__len") > capacity)
                   .withColumn("__ro", F.col("__ra")))
    overflowed = over_ranked.select(
        F.col("__id").alias(id_col),
        F.col("__len").alias("length"),
        (-(F.col("__ro") + 1)).cast("long").alias("pack_id"),
        F.col("__len").alias("pack_len"),
        F.lit(1).alias("pack_size"),
        F.lit(True).alias("overflow"))
    return paired.unionByName(overflowed)


def nfd_pack(
    df: DataFrame,
    id_col: str,
    len_col: str,
    *,
    capacity: int,
    n_streams: int = 256,
    stream_out: str = "stream",
    pack_out: str = "pack_id",
    pos_out: str = "pack_pos",
) -> DataFrame:
    """NO-SPLIT capacity-filling packing — next-fit-decreasing (NFD)
    bin packing, the >2-docs-per-pack generalization of
    :func:`fold_pack` (r11 verdict task 3): SFT corpora are
    short-doc-heavy, so pairing longest-with-shortest leaves most of
    the budget on the table when 3+ short documents would fit. Docs
    are hashed into ``n_streams`` independent streams (the
    :func:`pack_for_training` layout — md5 of the key, so stream
    membership is portable, partition-invariant, and oracle-
    checkable); within a stream, docs are scanned in (length DESC, id
    ASC) order and NFD fills packs greedily: a doc joins the current
    pack if it fits in the remaining capacity, else it CLOSES that
    pack and opens the next — the classic one-pass discipline whose
    per-pack waste is bounded by the smallest item that failed to fit.
    Returns the input keyed columns plus ``(stream, pack_id,
    pack_pos, overflow)``: ``pack_id`` is the within-stream pack
    index (combine with ``stream`` for a global key), ``pack_pos``
    the doc's position inside its pack, and ``overflow`` flags docs
    LONGER than capacity (NFD seats them alone in a pack that exceeds
    the budget — flagging beats silently truncating). NULL lengths
    raise (inside the executor — no extra validation pass).

    Scale shape: ONE shuffle (hash-partition by stream), then a
    grouped ``applyInPandas`` whose per-stream state is two integers
    (current fill + pack index) over an Arrow batch — the sequential
    scan bin packing fundamentally requires, confined to one stream.
    Streams are the parallelism AND memory unit exactly as in
    pack_for_training: at 100 TB raise ``n_streams`` to a multiple of
    the cluster's cores and each group stays executor-memory-bounded.
    Assignment is a pure function of the table's contents — re-runs,
    backfills, and a DuckDB twin (recursive CTE stepping each
    stream's rank order) reproduce it bit for bit.

    Packing quality: NFD ≥ 50% fill on capacity-saturated streams
    (every closed pack + the item that closed it exceed capacity);
    compare against :func:`fold_pack` with
    :func:`padding_waste_report` — the examples do.
    """
    if capacity < 1:
        raise ValueError("capacity must be >= 1")
    if n_streams < 1:
        raise ValueError("n_streams must be >= 1")
    import pandas as pd  # noqa: F401  (worker-side dependency)
    from pyspark.sql import types as T

    cap = int(capacity)
    stream = F.pmod(
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 4),
               16, 10).cast("long"),
        F.lit(n_streams))
    base = df.select(
        F.col(id_col).alias("__id"),
        F.col(len_col).cast("long").alias("__len"),
        stream.alias(stream_out))
    id_type = df.schema[id_col].dataType
    schema = T.StructType([
        T.StructField(id_col, id_type),
        T.StructField("length", T.LongType()),
        T.StructField(stream_out, T.LongType()),
        T.StructField(pack_out, T.LongType()),
        T.StructField(pos_out, T.LongType()),
        T.StructField("overflow", T.BooleanType()),
    ])

    def _nfd(pdf):
        if pdf["__len"].isna().any():
            raise ValueError(
                "nfd_pack: NULL length — packing needs every document "
                "measured; filter or fix upstream")
        pdf = pdf.sort_values(["__len", "__id"],
                              ascending=[False, True])
        packs, poss = [], []
        pack, fill, pos = -1, 0, 0
        for ln in pdf["__len"].tolist():
            if pack < 0 or fill + ln > cap:
                pack += 1
                fill = ln
                pos = 0
            else:
                fill += ln
                pos += 1
            packs.append(pack)
            poss.append(pos)
        out = pd.DataFrame({
            id_col: pdf["__id"].values,
            "length": pdf["__len"].values,
            stream_out: pdf[stream_out].values,
            pack_out: packs,
            pos_out: poss,
        })
        out["overflow"] = out["length"] > cap
        return out

    return base.groupBy(stream_out).applyInPandas(_nfd, schema)
