"""Training-data prep over the documents corpus: quality profiling,
near-duplicate detection (MinHash LSH), deterministic splits, eval-set
decontamination, concat-and-chunk sequence packing, CCNet quantile
buckets, SemDeDup semantic dedup, vocab/token-id encoding, a
deterministic epoch shuffle, the Gopher composite gate, DSIR
target-domain reweighting, domain-mixture resampling, per-language
winsorization, n-gram novelty scoring, text canonicalization,
corpus-global paragraph dedup, and product-quantized embedding
storage.

    python examples/training_data_prep.py [sf_dir]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from spark_expectations_spark.operators import dedup, packing, sampling, text


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

    # dup-AWARE split: near-duplicates must land in the SAME split or
    # eval numbers inflate. Contrast on the pre-dedup frame: a naive
    # per-id split scatters dup pairs across the boundary, the
    # component-keyed split never does.
    fractions = {"train": 0.8, "val": 0.1, "test": 0.1}
    naive = sampling.with_split(kept, "doc_id", fractions)
    nl = sampling.split_leakage_report(naive, pairs, "doc_id").first()
    guarded = sampling.leakage_safe_split(kept, pairs, "doc_id",
                                          fractions)
    gl = sampling.split_leakage_report(guarded, pairs, "doc_id").first()
    print(f"dup-pair leakage: naive split {nl['n_leaked']}/"
          f"{nl['n_pairs']}, component split {gl['n_leaked']}/"
          f"{gl['n_pairs']}")
    split = sampling.leakage_safe_split(deduped, pairs, "doc_id",
                                        fractions)
    split.groupBy("split").count().orderBy("split").show()

    # decontaminate: drop train docs overlapping the held-out test set
    train = split.filter(F.col("split") == "train")
    test = split.filter(F.col("split") == "test")
    dirty = dedup.contamination(train, test, "doc_id", "text",
                                n=3, min_overlap=0.5)
    clean_train = train.join(dirty.select("doc_id"), "doc_id", "left_anti")
    print(f"decontamination: {train.count()} -> {clean_train.count()} train docs")

    # pack the clean train split into 16 KiB-char sequences
    packed = packing.pack_for_training(clean_train, "doc_id", "n_chars",
                                       budget=16384, n_streams=8)
    n_packs = packed.select("stream", "pack_id").distinct().count()
    print(f"packing: {clean_train.count()} docs -> {n_packs} packs")

    # NO-SPLIT packing shootout at the same capacity: fold_pack pairs
    # longest-with-shortest (max 2 docs/pack), nfd_pack fills packs
    # next-fit-decreasing (3+ short docs share one pack) — compare the
    # residual padding a pad-to-capacity loader would burn
    cap = 520
    fp = packing.fold_pack(clean_train, "doc_id", "n_chars",
                           capacity=cap)
    fp_packs = (fp.filter(~F.col("overflow"))
                .select("pack_id", "pack_len").distinct())
    fp_pad = fp_packs.agg(
        F.sum(F.lit(cap) - F.col("pack_len")).alias("pad"),
        F.count(F.lit(1)).alias("n")).first()
    nfd = packing.nfd_pack(clean_train, "doc_id", "n_chars",
                           capacity=cap, n_streams=8)
    nfd_packs = (nfd.filter(~F.col("overflow"))
                 .groupBy("stream", "pack_id")
                 .agg(F.sum("length").alias("pack_len")))
    nfd_pad = nfd_packs.agg(
        F.sum(F.lit(cap) - F.col("pack_len")).alias("pad"),
        F.count(F.lit(1)).alias("n")).first()
    print(f"no-split packing @cap={cap}: fold_pack {fp_pad['n']} packs "
          f"/ {fp_pad['pad']} padded chars; nfd_pack {nfd_pad['n']} "
          f"packs / {nfd_pad['pad']} padded chars")

    # balanced eval set: 5 docs per language, deterministic across runs
    eval_set = sampling.sample_per_group(
        split.filter(F.col("split") == "val"), ["lang"], "doc_id", 5)
    print(f"balanced eval set: {eval_set.count()} docs")

    # topic fingerprint of the kept corpus: top TF-IDF terms per doc
    terms = text.top_terms(clean_train, "doc_id", "text", top_k=3, min_df=2)
    terms.groupBy("term").count().orderBy(F.desc("count")).limit(5).show()

    # day-2 operation: append a new batch without rescanning the corpus
    index = clean_train.select(text.fingerprint(F.col("text"))
                               .alias("fingerprint")).distinct()
    batch = docs.limit(50).withColumn(
        "fingerprint", text.fingerprint(F.col("text")))
    admitted = dedup.incremental_dedup(batch, index, "doc_id")
    print(f"incremental append: {batch.count()} batch -> "
          f"{admitted.count()} admitted")

    # CCNet-style head/middle/tail buckets per language (LM-score quartiles)
    scored = (text.unigram_logprob(docs, "doc_id", "text")
              .join(docs.select("doc_id", "lang"), "doc_id")
              .withColumn("score",
                          F.round(F.col("avg_logprob") * 1e6).cast("long")))
    buckets = sampling.quantile_buckets(scored, "lang", "score")
    buckets.groupBy("lang", "bucket").count().orderBy("lang", "bucket").show(9)

    # semantic dedup over embeddings (SemDeDup: per-cluster near-dup drop)
    from spark_expectations_spark.operators import similarity
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    sem_kept = similarity.semdedup(emb, threshold=0.4, by_col="label")
    print(f"semdedup: {emb.count()} -> {sem_kept.count()} vectors")

    # tokenizer prep: frequency vocab + id-encoded corpus
    vocab = text.build_vocab(clean_train, "text", max_size=512)
    encoded = text.encode_tokens(clean_train, vocab, "doc_id", "text")
    print(f"vocab: {vocab.count()} entries; "
          f"encoded docs: {encoded.count()}")

    # deterministic epoch shuffle: (shard, pos) dataloader addresses
    addressed = sampling.epoch_shuffle(clean_train, "doc_id",
                                       seed=0, num_shards=8)
    addressed.groupBy("shard").count().orderBy("shard").show(8)

    # ---- round-5 additions ------------------------------------------------
    # Gopher composite gate: every sub-signal + verdict in one projection
    gate = text.gopher_quality_flags(docs, "doc_id", "text",
                                     min_words=20, min_stop_hits=1)
    n_pass = gate.filter("passes").count()
    print(f"gopher gate: {docs.count()} docs -> {n_pass} pass")

    # DSIR: reweight the crawl toward an English 'target domain'
    target = docs.filter(F.col("lang") == "en")
    dsir = text.dsir_log_weights(docs, "doc_id", "text", target)
    top = dsir.orderBy(F.desc("avg_logratio")).limit(3).collect()
    print("dsir most-target-like:", [r["doc_id"] for r in top])

    # domain mixture at 60/30/10 with two-phase quota selection
    mix = sampling.mixture_resample(
        docs, "doc_id", "source",
        {"src0": 600000, "src1": 300000, "src2": 100000})
    mix.groupBy("source").count().orderBy("source").show()

    # winsorize per-language document length before weighted sampling
    capped = sampling.winsorize(docs, "lang", "n_chars",
                                lower=0.05, upper=0.95)
    stats = capped.agg(F.max("n_chars"), F.max("n_chars_winsorized")).first()
    print(f"winsorize: raw max {stats[0]} -> capped max {stats[1]}")

    # novelty: how much fresh content does each doc contribute?
    nov = dedup.ngram_novelty(docs, "doc_id", "text")
    print("mean novelty:",
          round(nov.agg(F.avg("novelty")).first()[0], 3))

    # ---- round-6 additions ------------------------------------------------
    # robust outlier screen: median/MAD is immune to the outliers it
    # hunts (a mean/stddev screen lets extremes inflate sigma)
    flagged = sampling.mad_outliers(docs, "lang", "n_chars", k=1.5)
    print("mad outliers:", flagged.filter("is_outlier").count(),
          "of", docs.count())

    # Zipf health check: slope ~ -1 for natural language; flat slope
    # = templated/boilerplate corpus, steep = collapsed vocabulary
    zrow = text.zipf_fit(docs, "text", top_n=500).first()
    print(f"zipf: slope={zrow['slope']:.3f} r2={zrow['r2']:.3f} "
          f"vocab={zrow['n_vocab']}")

    # embedding outliers relative to per-dimension spread (diagonal
    # Mahalanobis via standardize — one moment pass, zero-shuffle score)
    rms = similarity.standardized_norm_outliers(emb, threshold=1.02)
    print("embedding rms-z outliers:", rms.filter("is_outlier").count())

    # token entropy + readability: repetitiveness and fluency priors
    ent = text.token_entropy(docs, "doc_id", "text")
    print("mean norm-entropy:",
          round(ent.agg(F.avg("norm_entropy")).first()[0], 3))
    fl = text.readability(docs, "doc_id", "text")
    print("mean flesch:", round(fl.agg(F.avg("flesch")).first()[0], 1))

    # KS drift between two halves of the corpus length distribution
    from spark_expectations_spark.operators import drift
    h1 = docs.filter(F.col("doc_id") % 2 == 0)
    h2 = docs.filter(F.col("doc_id") % 2 == 1)
    ks = drift.ks_statistic(h1, h2, "n_chars",
                            [200.0 * i for i in range(1, 10)]).first()
    print("corpus-half KS:", round(ks["ks"], 4))

    # ZCA-whiten embeddings before cosine near-dup screening
    wh = similarity.whiten(emb)
    print("whitened vectors:", wh.filter("whitened is not null").count())

    # ---- round-8 additions ------------------------------------------------
    # canonicalize text BEFORE fingerprinting so cosmetic whitespace /
    # case differences don't defeat the dedup passes above
    canon = docs.withColumn(
        "text", text.normalize_text(F.col("text"), lowercase=True))
    print("canonicalized docs:", canon.filter("text is not null").count())

    # paragraph-level dedup (word granularity on this single-line
    # corpus): keep only the globally-first copy of each paragraph
    pd_out = dedup.paragraph_dedup(canon, "doc_id", "text", sep=" ")
    shrunk = pd_out.filter(
        F.length("dedup_text") < F.length("text")).count()
    print(f"paragraph dedup trimmed {shrunk} docs")

    # product-quantize embeddings for compact ANN storage: codegen
    # path for the demo; product_quantize_arrow for bulk encode jobs
    books = similarity.pq_codebooks(dim=64, m=4, k=8, seed=7)
    enc = similarity.product_quantize(emb, codebooks=books,
                                      dist_out="pq_dists")
    mse = enc.select(similarity.pq_reconstruction_error(
        F.col("embedding"), F.col("pq_codes"), books).alias("e"))
    print("pq mean reconstruction mse:",
          round(mse.agg(F.avg("e")).first()[0], 4))

    # C4 line filter + document gate over the canonicalized corpus
    # (single-line docs: the gate mostly exercises the doc-level rules)
    c4 = text.c4_document_flags(canon, "doc_id", "text",
                                min_sentences=0,
                                require_terminal_punct=False)
    print("c4 gate pass rate:",
          round(c4.agg(F.avg(F.col("passes").cast("double")))
                .first()[0], 4))

    # exact-substring span REMOVAL (the coverage metric's twin): excise
    # every cross-doc duplicated 5-gram except its first occurrence
    sr = dedup.remove_dup_spans(canon, "doc_id", "text", n=5)
    print("span removal dropped tokens:",
          sr.agg(F.sum("removed_tokens")).first()[0])

    # IVF-PQ ANN search over the encoded table: probe 2 cells per
    # query, score candidates via the per-query LUT — codes only
    cents = similarity.train_centroids_df(emb, vec_col="embedding",
                                          by_col="label")
    hits = similarity.ivf_pq_topk(
        enc.withColumn("centroid_id", F.col("label")), cents,
        emb.filter("vec_id < 3"), codebooks=books, k=3, nprobe=2)
    print("ivf-pq neighbors:", hits.count())

    # real BPE: learn merges from the corpus, encode, compare against
    # whitespace tokens (subwords > words once merges fuse stems)
    bpe_merges = text.train_bpe_merges(docs, "text", num_merges=40,
                                       min_count=5, max_vocab=2000)
    bpe = text.apply_bpe(docs, "doc_id", "text", bpe_merges)
    print("bpe: {} merges, mean tokens/doc {:.1f}".format(
        len(bpe_merges),
        bpe.agg(F.avg("n_bpe_tokens")).first()[0]))

    # exact mergeable distinct docs per source via bitmaps
    from spark_expectations_spark.operators import sketches
    bm = sketches.bitmap_distinct_by_group(docs, ["source"], "doc_id")
    print("exact distinct docs per source:",
          sketches.bitmap_distinct_rollup(bm, ["source"]).count(),
          "sources")

    # loader addressing: dense global ids (no single-task sort),
    # curriculum stages, and the padding report that picks batch buckets
    idx = sampling.dense_global_index(docs, ["n_chars", "doc_id"],
                                      num_buckets=16)
    print("max global_id:",
          idx.agg(F.max("global_id")).first()[0])
    cur = sampling.curriculum_order(docs, "doc_id", "n_chars",
                                    num_shards=8)
    print("curriculum stage sizes:",
          sorted((r["stage"], r["n"]) for r in
                 cur.groupBy("stage").agg(F.count("*").alias("n"))
                 .collect()))
    toks = docs.select("doc_id",
                       text.token_count(F.col("text")).alias("w"))
    waste = packing.padding_waste_report(toks, "w", [20, 24, 28])
    print("padding waste frac by bucket:",
          sorted((r["bucket"], r["waste_frac"]) for r in
                 waste.collect()))

    # image-dedup plumbing: synthesize binaries, perceptual-hash them,
    # find Hamming-close pairs by banding (fake decode — the md5-pixel
    # fallback — so this runs codec-free; duplicate binaries collide)
    from spark_expectations_spark.operators import multimodal
    media = multimodal.synthesize_binary_column(
        docs.withColumn("dup_of", F.col("doc_id") % 250), "dup_of")
    ph = multimodal.perceptual_hash(media, id_col="doc_id",
                                    binary_col="media_bytes")
    pairs = multimodal.phash_near_dups(ph, "doc_id", max_hamming=0)
    print("exact phash dup pairs:", pairs.count())

    # ---- round-13 additions -----------------------------------------------
    # quality classifier trained IN-ENGINE, then the full filter chain:
    # train -> score -> isotonic-calibrate -> conformal gate. Labels
    # come from the Gopher heuristic gate (the FineWeb-Edu pattern:
    # bootstrap a cheap-heuristic label set, train the generalizing
    # classifier on it); scoring reuses hashed_linear_score, so the
    # trained weights drop into the existing inference path unchanged.
    from spark_expectations_spark.operators import profiling
    labeled = docs.join(gate.select("doc_id", "passes"), "doc_id") \
        .withColumn("label", F.col("passes").cast("double"))
    fit = text.logistic_train(labeled, "doc_id", "text", "label",
                              dim=1024, iterations=5, lr=2.0)
    frow = fit.first()
    print("classifier train: n={} bias={:.4f} loss {:.4f} -> {:.4f}".format(
        frow["n_train"], frow["bias"],
        frow["losses"][0], frow["losses"][-1]))
    qscored = text.hashed_linear_score(
        labeled, "doc_id", "text", fit.select("bucket", "weight"),
        dim=1024, bias=frow["bias"], out_col="clf_score")
    # isotonic: raw sigmoid scores -> calibrated P(passes gate)
    cal = text.isotonic_calibrate(
        qscored.withColumn("clf_score", F.round("clf_score", 4)),
        "clf_score", "label", out_col="clf_prob")
    # conformal gate on the calibration split: nonconformity = 1 - p,
    # keep future docs whose nonconformity clears the 90% threshold
    thr = profiling.conformal_threshold(
        cal.withColumn("nonconf", 1.0 - F.col("clf_prob")),
        "nonconf", alpha=0.1).first()
    kept_n = cal.filter(1.0 - F.col("clf_prob") <= thr["threshold"]).count()
    print("conformal quality gate: threshold {:.4f} keeps {} of {}".format(
        thr["threshold"], kept_n, cal.count()))

    # model selection: 3-fold CV with NEAR-DUP-SAFE folds (a near-dup
    # of a training doc in the val fold inflates val numbers exactly
    # like eval contamination — component-keyed folds prevent it)
    safe = sampling.leakage_safe_kfold(labeled, pairs, "doc_id", 3)
    cv = text.logistic_cv(labeled, "doc_id", "text", "label",
                          dim=1024, iterations=3, lr=2.0, k=3)
    for r in cv.orderBy("fold").collect():
        print("cv fold {}: train {:.4f}->{:.4f}, val {:.4f}".format(
            r["fold"], r["train_loss_start"], r["train_loss_end"],
            r["val_loss"]))
    print("dup-safe folds:",
          sorted((r["fold"], r["n"]) for r in safe.groupBy("fold")
                 .agg(F.count("*").alias("n")).collect()))

    # day-2: warm-start retraining from the persisted fit instead of
    # replaying history (exact continuation on the same corpus)
    fit2 = text.logistic_train(labeled, "doc_id", "text", "label",
                               dim=1024, iterations=2, lr=2.0,
                               init=fit)
    print("warm-start retrain: loss {:.4f} -> {:.4f}".format(
        fit2.first()["losses"][0], fit2.first()["losses"][-1]))
    spark.stop()


if __name__ == "__main__":
    main()
