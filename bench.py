"""Benchmark: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1) on
local[$SPARK_GRAFT_CPUS]. Prints a full-detail JSON line (all per-query
seconds) followed by ONE short summary JSON line LAST:
{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

TIMED ACTION (changed r16, guide §1.4): each query is materialized
through the NOOP SINK (`df.write.format("noop")`), which computes
every column of every row. Earlier rounds timed `df.count()`, which
lets Catalyst prune columns AND eliminate provably-redundant
subtrees — the r16 audit found 8 entries whose counted plan dropped
most of the algorithm (part_copurchase_triangles lost all 7 joins —
true cost ~14× the counted number; the pagerank family lost the whole
rank loop once r16's gated lineage cut made it fully lazy; see
OPTIMIZATION_r16.md "count() elimination"). Numbers before/after the
r16 protocol boundary are NOT directly comparable; the ledger carries
a dual capture of the boundary run.
The summary line stays under the driver's ~2000-char tail-capture window
(BENCH_r08 was unparseable because the 90-query single line overflowed it).
The COMPLETE per-query map is also persisted to BENCH_latest_full.json
next to this script (r15 verdict task 3) so cross-round aggregates are
reproducible from the committed artifact, not just the captured tail.

SELECTION POLICY (r10 verdict task 3 — what is benched and what is
deliberately not): BENCH_QUERIES carries every operator family's
REPRESENTATIVE under its production configuration — each distinct plan
shape appears at least once. Excluded, by rule:

- cheap tpch variants (q2/4/7/8/9/11/12/13/14/15/16/17/19/20/21/22ish):
  one representative per join/agg shape is benched (q1 agg, q3/q5ish
  joins, q6 filter-agg, q10ish outer+agg, q18ish semi+topk); the rest
  re-time the same exchanges on the same tables and would only add
  noise surface.
- rows-only twins and sibling configurations of a benched operator
  (simhash_md5 vs the benched minhash_md5 family, embed_whiten vs its
  benched _check, ann_ivf vs benched ann_ivf_recall/ann_ivf_kmeans,
  docs_label_alpha_ordinal vs the benched interval metric): the timed
  plan is identical up to one projection/metric table.
- sub-second composition wrappers whose constituent operators are
  already benched standalone (dedup_fingerprint/jaccard/clusters/
  canonical inside docs_dedup_pipeline; drift report/verdict pair is
  benched as the report + one verdict).

Everything else — every NEW operator family a round ships — gets a row
the same round it lands. The graded pair (dq_engine_full_run vs
dq_handwritten_run) is always measured, min-of-2.

CANARY PROTOCOL (r11 verdict task 4): CANARY_QUERIES (five entries
frozen since r8) are timed first and last each run; the summary line
carries `canary_ratio` (last/first — host drift within the run) and
`canary_total` (mean of the two passes — the cross-run normalizer).
Cross-round comparisons should divide per-query swings by the rounds'
canary_total ratio before calling anything a regression.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from pyspark.sql import SparkSession  # noqa: E402

from spark_expectations_spark.queries import QUERIES  # noqa: E402

BENCH_QUERIES = [
    "dq_row_errors", "dq_counts", "dq_agg_results",
    "tpch_q1", "tpch_q3", "tpch_q5ish", "tpch_q6", "tpch_q10ish",
    "tpch_q18ish",
    # r16: dedup_minhash (xxhash64 twin) retired from the catalog per
    # the r15 oracle-ability audit; the md5_48 twin is the benched
    # MinHash representative from r16 on (K=16/bands=4 vs the retired
    # entry's K=64/16 — cross-round comparisons for this row restart
    # at r16).
    "window_rank", "dedup_exact", "dedup_jaccard", "dedup_minhash_md5",
    "embed_near_dups", "ann_topk", "text_stats", "text_quality",
    "events_hourly", "events_sessions", "docs_clean_corpus",
    "docs_pack_streams", "users_scd2", "orders_snapshot_diff",
    "lineitem_price_drift",
    # round-3 operators (VERDICT r03 item 6)
    "docs_tfidf_terms", "docs_heavy_tokens", "docs_chunks",
    "docs_group_sample", "embed_near_dups_bcast",
    # round-4 operators
    "docs_strip_boilerplate", "docs_percentile_gate",
    "docs_classifier_score", "ann_ivf_recall",
    "dedup_containment", "docs_dup_shingles", "docs_token_budget",
    "docs_corpus_report", "embed_semdedup", "docs_ccnet_buckets",
    "docs_token_ids", "docs_source_dup_matrix", "docs_dedup_pipeline",
    "docs_epoch_shuffle", "dedup_lsh_quality", "events_window_topk",
    "docs_line_stats", "docs_collocations", "docs_bigram_lm",
    "orders_status_chi2", "lineitem_correlations", "events_time_split",
    "docs_temperature_resample",
    # round-5 operators
    "docs_mixture_resample", "docs_gopher_gate", "docs_ngram_novelty",
    "embed_standardize", "docs_dsir_weights", "docs_winsorize",
    # round-6 operators. NOTE (bench-noise discipline, r5 verdict item
    # 8): docs_token_budget/docs_mixture_resample deliberately pay a
    # fixed two-phase + persist overhead at sf0.1 that buys bounded
    # task sizes at 100 TB — do not read their absolute seconds as a
    # regression.
    "docs_mad_outliers", "docs_zipf", "embed_rms_outliers",
    "docs_dup_spans", "events_session_windows", "docs_kfold",
    "docs_token_entropy", "docs_readability", "lineitem_price_ks",
    "embed_whiten",
    # round-8 operators (normalize + paragraph dedup are corpus text
    # passes; embed_pq is a zero-shuffle codegen projection). NOTE:
    # embed_pq / embed_ivf_pq seconds here are dominated by inline
    # corpus ENCODING (m*k fold expressions -> long codegen compile +
    # per-row interpreted folds at this tiny scale); in production the
    # codes are encoded once at ingest (product_quantize_arrow) and
    # stored — the search side reads m ints per candidate.
    "docs_normalize", "docs_paragraph_dedup", "embed_pq",
    "embed_ivf_pq", "docs_c4_filter", "docs_span_removal",
    "events_bitmap_distinct", "docs_url_stats", "docs_global_index",
    "docs_padding_waste", "docs_curriculum", "docs_phash_dups",
    "lineitem_grouped_dq", "docs_strip_html", "lineitem_price_jsd",
    "lineitem_drift_report", "docs_bpe", "lineitem_drift_verdict",
    "docs_interleave",
    # round-9 operators (grouped_dq_target is a FULL engine run — its
    # seconds include the fused row path, not just the grouped agg)
    "lineitem_grouped_dq_target", "embed_whiten_check",
    # round-9/10: record linkage (blocked fuzzy join — prefix+length
    # blocking on the full part table; the qgram twin samples 10% of
    # partkeys because 3-gram blocks over the 92-word part-name vocab
    # are low-entropy: per-block candidate products, not n², but big
    # blocks at full corpus) + classifier calibration (fold-bucket
    # histogram + the scalar ECE re-aggregation)
    "part_fuzzy_matches", "part_fuzzy_qgram",
    "docs_calibration", "docs_calibration_ece",
    # PPJoin prefix-filter set-similarity join (shingle sets vs
    # truncated twins at jaccard >= 0.6). r11: the per-frame persist
    # A/B (SCALE.md) dropped the L/R set-frame persists — exchange
    # reuse covers their shared subtrees — keeping only the
    # dual-consumer vocab-sized gram-frequency table (6.75 -> 5.63s
    # under this clearCache protocol; was ~15.7s before the r10
    # spread guard + zip_with shingle builder).
    "docs_set_jaccard_join",
    # blocking QA (cross-join truth side runs on the documented 20%
    # deterministic sample only)
    "part_blocking_quality",
    # index/probe steady-state linkage (10% probe batch vs standing
    # key table)
    "part_fuzzy_probe",
    # Cohen's-kappa annotator agreement (confusion-key fold)
    "docs_label_agreement",
    # Fellegi-Sunter decision scoring (zero-shuffle projection)
    "part_fs_scores",
    # Bayardo weighted cosine set join (r11: ALL persists dropped —
    # its df table feeds only one rank window, so the A/B's no-persist
    # variant won outright, 5.99 -> 4.59s; SCALE.md)
    "docs_weighted_cosine",
    # label-masked top-k mining (query-broadcast scan, 1 rank window)
    "embed_hard_negatives",
    # association rules + user-journey paths (pure compositions)
    "orders_basket_lift", "events_top_paths",
    # kmeans-trained IVF search (2 Lloyd iterations + assignment +
    # probe/search — the composition entry; training shares no work
    # with embed_kmeans's own bench row by design, each run stands
    # alone under the per-run clearCache)
    "ann_ivf_kmeans",
    # Lloyd's k-means: 3 update iterations + final measurement = 4
    # broadcast-codebook assignment passes; cost is per-job overhead at
    # this SF, map-only at scale
    "embed_kmeans",
    # r10 gap-fill (verdict task 3): train-on-sample k-means, the
    # silhouette/purity cluster gate, the dup-aware split guard, and
    # multi-rater label agreement (nominal alpha)
    "embed_kmeans_sampled", "embed_cluster_qa", "docs_split_leakage",
    "docs_label_alpha",
    # round-11 operators: PCA invariants twin (two moments passes +
    # projection), interval-metric alpha (per-unit moments fold),
    # disjunctive two-blocker linkage (prefix OR ngram candidate union)
    "embed_pca_check", "docs_label_alpha_interval",
    "part_fuzzy_disjunctive",
    # round-11 new operator families: ROUGE-N multiset overlap
    # (relational intersection, id/gram-keyed), PageRank over the part
    # co-purchase graph (3 synchronous rounds, src/dst-keyed joins),
    # MMR-diversified retrieval (one corpus scan + pool-bounded greedy)
    "docs_rouge_overlap", "part_copurchase_rank", "embed_mmr_topk",
    # weighted-pagerank twin shares part_copurchase_rank's plan (one
    # extra per-edge multiply) and is deliberately unbenched per the
    # sibling-configuration rule; HITS and the per-source score ECDF
    # are new plan shapes and get rows
    "customer_part_hits", "docs_source_qnorm",
    # reciprocal rank fusion (one keyed sum + one rank window) and the
    # histogram-rank ROC-AUC sweep (no corpus sort by design)
    "part_rank_fusion", "docs_score_auc",
    # isotonic calibration invariants (histogram groupBy + driver PAV
    # + broadcast step-function join)
    "docs_isotonic_check",
    # compact-forward triangle counting (degree-ordered orientation
    # bounds the wedge join at O(m^1.5))
    "part_copurchase_triangles",
    # one-pass Poisson-bootstrap CI (one 82-accumulator agg job)
    "docs_bootstrap_ci",
    # no-split fold packing (two-phase dense rank + pair groupBy)
    "docs_fold_pack",
    # Count-Min sketch build + broadcast lookup (3x-exploded groupBy
    # into a depth x width cell table)
    "lineitem_cms_counts",
    # Markov transition matrix + per-state entropy (one user-partition
    # lead window + state-cardinality aggregates)
    "events_markov_transitions",
    # round-12 operators: bucketed-ECDF score normalization (histogram
    # aggs only — the 100 TB mode, a different plan shape from the
    # window-sort docs_source_qnorm above), capacity-filling NFD
    # packing (running-sum bin assignment over the length-ranked
    # stream), centrality canonical picking (within-cluster degree agg
    # on the existing pair frame), per-day CMS rollup (day-keyed sketch
    # build + merge-by-SUM + parity join), alpha bootstrap CI
    # (per-unit moments fold x B Poisson replicas in one agg)
    "docs_source_qnorm_bucketed", "docs_nfd_pack",
    "dedup_canonical_centrality", "events_cms_daily_rollup",
    "docs_label_alpha_ci",
    # Bloom build + probe (k-exploded bit-set groupBy into a word
    # table broadcast to the probe side's k equi-joins)
    "orders_bloom_probe",
    # A-ES exact-k weighted sampling (per-group rank window; ungrouped
    # mode is TakeOrderedAndProject and deliberately unbenched as the
    # same plan shape with less work)
    "docs_weighted_topk",
    # sorted-neighborhood blocking (two-phase global rank + window-1
    # explode into one rank-keyed equi-join + levenshtein verify)
    "part_sorted_neighborhood",
    # shuffle-key skew diagnosis (one combined key-count pass + one
    # aggregate with the entropy fold)
    "events_skew_report",
    # large-star/small-star connected components (O(log^2 n) rounds,
    # two groupBy+join phases per round over the jaccard pair graph)
    "docs_cc_largestar",
    # part_ppr_brand (personalized PageRank) is deliberately unbenched
    # per the sibling-configuration rule: same graph, same rounds as
    # part_copurchase_rank plus one broadcast-sized seed join
    # per-segment chi2 sweep + closed-form p-values + BH FDR (two
    # grouped passes + one hypotheses-scale window chain)
    "events_drift_fdr",
    # lineitem_ks_pvalue is deliberately unbenched per the sibling
    # rule: lineitem_price_ks's exact plan + one scalar projection
    # per-source split-conformal thresholds (one rank window per group)
    "docs_conformal_threshold",
    # zlib compression-ratio quality signal (Arrow mapInPandas pass)
    "docs_compression_ratio",
    # per-segment KS + Kolmogorov p-values + BH (the numeric fleet
    # chain; segment-partitioned cumulative windows)
    "lineitem_ks_by_flag_fdr",
    # budgeted frame-sampling plan (integer sequence/stride explode);
    # the overlapping audio-chunk plan shares the explode shape and is
    # deliberately unbenched per the sibling-configuration rule
    "docs_frame_plan",
    # per-source isotonic fits (one grouped histogram pass + driver
    # PAV per group + a composite-key broadcast lookup)
    "docs_isotonic_by_source",
    # Bloom sketch-then-confirm decontamination (map-only screen +
    # exact confirm on survivors; output-identical to the join form)
    "docs_decontaminate_screened",
    # span-level decontamination (posting-list excision vs the test
    # gram set + per-doc rebuild)
    "docs_decontaminate_spans",
    # round-13 operators: in-engine logistic-regression training (one
    # featurize pass + localCheckpoint, then per step ONE map-side-
    # combined sentinel-tagged groupBy collecting dim+2 rows)
    "docs_classifier_train",
    # mergeable quantile rollup (one map-side-combined bin groupBy per
    # side + bins-scale windows; events_quantile_merge_check is
    # deliberately unbenched per the sibling rule — same build plan
    # twice plus a KB-scale join; events_agg_rollup likewise — one
    # 5-accumulator groupBy, strictly less work than the histogram)
    "events_quantile_rollup",
    # per-pair MinHash estimate audit (exact jaccard posting-list plan
    # + the md5_48 16-hash signature groupBy + two signature joins)
    "docs_minhash_jaccard",
    # docs_classifier_cv is deliberately unbenched per the sibling
    # rule: k x docs_classifier_train's featurize+loop plan over
    # fold-filtered views of one checkpointed frame, no new shape;
    # docs_cv_leakage_safe likewise: docs_split_leakage's closure +
    # join shape with a kfold projection instead of a split one;
    # embed_matryoshka_check likewise: ann_topk's broadcast-query
    # corpus scan repeated per prefix width plus KB-scale recall joins
    #
    # token-level domain-shift report (two map-side-combined token
    # counts + a vocab-sized full-outer join + the 1-row KL fold)
    "docs_vocab_divergence",
    # DataFrame-model-state trainer (per step: margin join + doc
    # groupBy + gradient groupBy + weight-update join — the join-mode
    # cost profile vs docs_classifier_train's literal-array profile)
    "docs_classifier_train_dist",
    # Kaplan-Meier churn curves (distinct-acts scan + per-user
    # min/max groupBy + two time-cardinality cumulative windows)
    "events_survival",
    # docs_stratified_metrics is deliberately unbenched per the
    # sibling rule: docs_calibration's one stratum-keyed groupBy shape
    # with Wilson arithmetic on the 20-row output frame;
    # events_twa likewise: events_sliding's user-partitioned window +
    # one map-side-combined groupBy, no new shape;
    # customer_kanonymity likewise: dq_counts' one-groupBy-one-fold
    # shape over the QI tuple;
    # orders_schema_drift likewise: two whole-table null-count aggs
    # (dq_counts' one-pass shape per side) + a literal-array explode
    #
    # Heaps-law vocabulary growth (explode + first-occurrence min
    # groupBy + checkpoint folds + a 5-row cumulative window)
    "docs_vocab_growth",
    # per-segment CUSUM change-point scan (one (segment, day) groupBy
    # + segment-partitioned cumulative/argmax windows)
    "events_change_point",
    # orders_benford is deliberately unbenched per the sibling rule:
    # orders_status_chi2's fold-bucket + chi2-series shape with a
    # digit key instead of a status key;
    # docs_simhash_hamming likewise: dedup_simhash_md5's signature
    # build (benched via dedup_minhash family) + one id-keyed join;
    # docs_quantile_bin likewise: window_rank's group-partitioned
    # rank window + one groupBy, no new shape
    #
    # round-15 operators: the multimodal extraction path under a full
    # value oracle (Arrow-batched md5-pixel dHash mapInPandas + codegen
    # format sniffing + one id-keyed join of hash output to metadata)
    "docs_media_phash_exact",
    # events_cusum_merge_check is deliberately unbenched per the
    # sibling rule: events_change_point's bucket-collapse + scan plan
    # run twice (halved + direct) plus a group-cardinality join
    #
    # Mann-Whitney rank-sum (one (group, value) groupBy collapse +
    # group-partitioned cumulative rank window + one group fold)
    "docs_mannwhitney",
    # orders_theilsen is deliberately unbenched per the sibling rule:
    # the CUSUM per-day collapse + a KB-scale in-group pair self-join
    # and two bucket-cardinality median windows, no corpus-scale shape;
    # events_kendall_tau likewise: the same collapse + pair-join shape
    # with a sign fold instead of medians;
    # orders_ca_trend likewise: orders_status_chi2's count-collapse +
    # scalar fold with a score weighting;
    # events_spearman likewise: docs_mannwhitney's value-collapse rank
    # windows over a bucket-cardinality series + one Pearson fold;
    # docs_media_wav_info likewise: docs_media_phash_exact's synthetic-
    # bytes projection with a codegen header parse instead of the
    # Arrow dHash stage (strictly less work);
    # docs_media_png_info / docs_media_gif_info /
    # docs_media_jpeg_info / docs_media_mp4_info (r16) likewise: the
    # same synthetic-bytes projection + codegen parse shape as
    # wav_info (jpeg/mp4 add the aggregate fold, still one
    # shuffle-free projection);
    # docs_brier likewise: docs_calibration_ece's bin-fold + scalar
    # shape with three more fold terms;
    # docs_rank_merge_check (r16) likewise: docs_mannwhitney's
    # collapse+window+fold run twice (halved + direct) — the same
    # plan shape, no new exchange kind;
    # orders_priority_status_effects (r16) likewise:
    # orders_status_chi2's corpus collapse with margin windows over
    # the 15-cell frame instead of the chi2 series fold;
    # docs_media_bmp_phash (r16) likewise: docs_media_phash_exact's
    # synthetic-bytes projection + Arrow dHash stage with the real
    # numpy BMP decode swapped in for the md5 fake (same batch shape)
]

# Canary protocol (r11 verdict task 4): five entries whose code has
# been frozen since r8, timed FIRST and LAST every bench run with the
# same min-of-3 discipline. Their last/first ratio measures host-speed
# drift DURING the run, and their absolute total anchors cross-run
# comparisons: before reading a round-over-round swing on any entry as
# a regression, divide by the rounds' canary_total ratio. The r11
# dedup-family "+22-44%" swings on untouched code motivated this —
# slower-host attribution is now falsifiable.
CANARY_QUERIES = [
    "tpch_q1", "dq_row_errors", "docs_clean_corpus", "window_rank",
    "events_hourly",
]

# Stage-heavy anchor (r14, the cert-outlier adjudication): the five
# small canaries are few-stage queries, so they under-correct for
# background-load windows where SCHEDULING overhead inflates — tasks
# queue behind foreign load, and entries built from many tiny-frame
# stages (self-join chains, multi-aggregate report assembly) pay that
# per stage. The r13 "cert-bench outliers" (part_blocking_quality &
# co, 1.3-2.2× canary-NORMALIZED vs r12 on byte-identical code and
# row-count-identical data, while few-stage controls sat at
# 0.94-1.20×) were exactly this class; the same query swung 8.1s→2.1s
# between identical sessions minutes apart under load-average-4
# background load (SCALE.md, round-14 ledger). These two entries —
# code-frozen since r10/r12 — are summed from the regular BENCH
# timings (not re-timed) into `stageheavy_anchor`; normalize
# stage-heavy round-over-round comparisons by ITS ratio, not the
# small-canary total.
STAGEHEAVY_ANCHOR = ["part_blocking_quality", "dedup_jaccard"]


def _streaming_foreach_batch_run(spark, sf_dir: str) -> float:
    """Streaming representative (r17, r16 verdict task 7): the full DQ
    engine per micro-batch via streaming.foreach_batch_dq — row rules,
    fused agg/counts, drop filtering — over a 4-file parquet stream
    (maxFilesPerTrigger=1 -> 4 micro-batches, availableNow trigger),
    each batch's final frame materialized through the NOOP sink.

    Selection policy: the streaming/LLM-pipeline wrappers reuse the
    optimized batch operators per micro-batch, so ONE foreachBatch
    engine entry covers the family's plan shape (scheduler + engine
    per batch); the stateful monitors (drift_monitor, incremental_*
    state) run strictly smaller per-batch aggregations over the same
    machinery and stay unbenched per the sibling-configuration rule.

    Measurement honesty: the 4-chunk source split and a fresh
    checkpoint dir are rebuilt from the sf parquet INSIDE EVERY RUN
    (untimed setup before t0 — it times a parquet write, not the
    engine) so no intermediate survives across timed runs.
    """
    import shutil
    import tempfile

    from spark_expectations_spark import DQConfig, DQEngine, Rule, RuleSet  # noqa: F401
    from spark_expectations_spark.queries import lineitem_row_rules, load
    from spark_expectations_spark.streaming import foreach_batch_dq

    li = load(spark, sf_dir, "lineitem")
    base = tempfile.mkdtemp(prefix="bench_stream_")
    src, ckpt = os.path.join(base, "src"), os.path.join(base, "ckpt")
    li.repartition(4).write.mode("overwrite").parquet(src)
    rules = RuleSet(lineitem_row_rules())
    cfg = DQConfig(product_id="bench", table_name="lineitem",
                   write_error_table=False)
    outputs: list[int] = []

    def on_result(batch_id: int, res) -> None:
        res.final_df.write.format("noop").mode("overwrite").save()
        outputs.append(res.output_count)

    stream = (spark.readStream.schema(li.schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    t0 = time.time()
    q = foreach_batch_dq(stream, rules, cfg, on_result=on_result,
                         checkpoint_location=ckpt,
                         trigger={"availableNow": True})
    q.awaitTermination()
    dt = time.time() - t0
    shutil.rmtree(base, ignore_errors=True)
    if len(outputs) < 2:
        raise RuntimeError(f"expected multiple micro-batches, "
                           f"got {len(outputs)}")
    return dt


def _engine_full_run(spark, sf_dir: str) -> float:
    """Full 5-stage DQ run (row + agg + query rules, stats assembled)."""
    from spark_expectations_spark import DQConfig, DQEngine, Rule, RuleSet
    from spark_expectations_spark.operators import query_dq
    from spark_expectations_spark.queries import lineitem_row_rules, load

    li = load(spark, sf_dir, "lineitem")
    od = load(spark, sf_dir, "orders")
    query_dq.register_views(spark, {"lineitem": li, "orders": od})
    rules = RuleSet(lineitem_row_rules() + [
        Rule("bench", "lineitem", "agg_dq", "cnt", "", "count(*) > 0"),
        Rule("bench", "lineitem", "agg_dq", "avg_disc", "l_discount",
             "avg(l_discount) between 0 and 0.1"),
        Rule("bench", "lineitem", "query_dq", "cover", "",
             "(select count(*) from orders) >= "
             "(select count(distinct l_orderkey) from lineitem)"),
    ])
    cfg = DQConfig(product_id="bench", table_name="lineitem",
                   write_error_table=False)
    t0 = time.time()
    res = DQEngine(cfg).run(li, rules, spark)
    res.final_df.write.format("noop").mode("overwrite").save()
    res.stats_record()
    return time.time() - t0


def _handwritten_run(spark, sf_dir: str) -> float:
    """The same checks written directly against the DataFrame API —
    what a careful engineer would write without any framework."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F
    from spark_expectations_spark.queries import load

    li = load(spark, sf_dir, "lineitem")
    od = load(spark, sf_dir, "orders")
    t0 = time.time()
    w = Window.partitionBy("l_orderkey", "l_linenumber")
    flagged = li.select(
        "*",
        (~F.col("l_quantity").between(1, 50)).alias("f_qty"),
        (~F.col("l_discount").between(0, 0.05)).alias("f_disc"),
        (~(F.col("l_extendedprice") > 0)).alias("f_price"),
        F.col("l_shipdate").isNull().alias("f_ship"),
        (F.count(F.lit(1)).over(w) != 1).alias("f_uq"),
    )
    any_fail = (F.col("f_qty") | F.col("f_disc") | F.col("f_price")
                | F.col("f_ship") | F.col("f_uq"))
    counts = flagged.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(any_fail.cast("long")).alias("errors"),
        F.sum(F.col("f_disc").cast("long")).alias("drops"),
    ).first()
    agg_row = li.agg(
        (F.count(F.lit(1)) > 0).alias("cnt_ok"),
        F.avg("l_discount").between(0, 0.1).alias("avg_ok"),
        F.count(F.lit(1)).alias("cnt"), F.avg("l_discount").alias("avg_d"),
    ).first()
    q_ok = (od.count() >= li.select("l_orderkey").distinct().count())
    final = flagged.filter(~F.col("f_disc")).drop(
        "f_qty", "f_disc", "f_price", "f_ship", "f_uq")
    final.write.format("noop").mode("overwrite").save()
    _ = (counts["n"], counts["errors"], counts["drops"],
         agg_row["cnt_ok"], agg_row["avg_ok"], q_ok)
    return time.time() - t0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    from spark_expectations_spark.session import configure, scale_confs

    confs = scale_confs("local-dev", total_cores=int(cpus))
    # bench-specific extras on top of the shared profile: the headline
    # dedup/ANN queries hold pair frames + broadcast matrices at sf0.1
    confs.update({"spark.driver.memory": "24g",
                  "spark.sql.autoBroadcastJoinThreshold": "64m"})
    spark = configure(
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("spark_expectations_spark-bench"), confs).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM/codegen paths and the parquet readers (file listing,
    # footer decode, OS page cache) so per-query numbers measure the plan,
    # not session startup / first-touch I/O
    spark.range(1000).selectExpr("sum(id)").collect()
    from spark_expectations_spark.queries import load
    for t in ("lineitem", "orders", "customer", "documents", "embeddings",
              "events", "part", "supplier", "nation", "region"):
        load(spark, sf_dir, t).write.format("noop").mode("overwrite").save()
    # spin up the python worker pool (32 workers importing numpy/pandas
    # ~5s once per session) so Arrow-UDF queries measure compute
    spark.range(0, 32, 1, 32).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

    # three timed runs per query, report the warm (min) one: the first
    # run still pays per-plan JIT/codegen compilation, which at sf0.1 can
    # exceed the actual execution (e.g. minhash's wide agg compiles ~10s,
    # runs ~1.5s) and at real scale amortizes to nothing — steady-state
    # is what a 100 TB comparison should measure
    def _time_query(name: str) -> float:
        fn = QUERIES[name]
        best, runs = None, 0
        # min of 3 runs for EVERY query: the shared host shows ±50%
        # noise spikes, and round-over-round comparisons on sub-second
        # queries were dominated by that noise (three phantom
        # regressions flagged in round 4) — a third sample stabilizes
        # them for a few seconds of extra wall-clock
        while runs < 3:
            t0 = time.time()
            df = fn(spark, sf_dir)
            # r16 MEASUREMENT FIX (guide §1.4): the timed action is the
            # noop sink, NOT df.count(). count() lets Catalyst prune
            # whole subtrees behind provably-unique outer joins — the
            # r16 audit (OPTIMIZATION_r16.md "count() elimination")
            # found 8 entries whose counted plan dropped most of the
            # algorithm (part_copurchase_triangles: all 7 joins, true
            # cost ~14× the counted one; the pagerank family: the whole
            # rank loop once the r16 lineage-cut gating made it lazy).
            # Rounds ≤ r16-close numbers are count-based — compare
            # across the boundary only via the ledger's dual capture.
            df.write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
            runs += 1
            # each run is timed standalone: drop any intra-query persists
            # so one run's cache doesn't pressure the next one's memory
            spark.catalog.clearCache()
        print(f"# {name}: {round(best, 3)}s (noop sink, warm of {runs})",
              file=sys.stderr)
        return round(best, 3)

    # canary pass 1 (host-speed anchor, frozen-code entries)
    canary_first = {name: _time_query(name) for name in CANARY_QUERIES}

    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        timings[name] = _time_query(name)

    # canary pass 2: same five entries at the end of the run
    canary_last = {name: _time_query(name) for name in CANARY_QUERIES}
    canary = {
        "first": round(sum(canary_first.values()), 3),
        "last": round(sum(canary_last.values()), 3),
    }
    canary["ratio"] = round(canary["last"] / max(canary["first"], 1e-9), 3)
    canary["total"] = round((canary["first"] + canary["last"]) / 2, 3)
    print(f"# canary first={canary['first']}s last={canary['last']}s "
          f"drift ratio={canary['ratio']}x", file=sys.stderr)

    # BASELINE.md gate: full 5-stage engine run vs an equivalent
    # hand-written PySpark pipeline (same checks, no framework).
    # min-of-3 each (r17; was min-of-2): the RATIO is the graded
    # number, and the r16 "drift" to 1.13x dissolved under exclusive
    # min-of-5 alternating runs (1.038 / 0.977 across two sessions) —
    # the pair was the only min-of-2 measurement left in this file, so
    # it carried the most sampling noise of the lot. Same timed action,
    # one more sample; matches every other entry's min-of-3.
    timings["dq_engine_full_run"] = round(
        min(_engine_full_run(spark, sf_dir) for _ in range(3)), 3)
    timings["dq_handwritten_run"] = round(
        min(_handwritten_run(spark, sf_dir) for _ in range(3)), 3)
    # streaming representative (r17 — an ADDED entry, nothing removed):
    # full engine per micro-batch over a 4-batch file stream; see
    # _streaming_foreach_batch_run's selection-policy note
    timings["streaming_foreach_batch_dq"] = round(
        min(_streaming_foreach_batch_run(spark, sf_dir)
            for _ in range(3)), 3)
    print(f"# engine/hand-written ratio: "
          f"{timings['dq_engine_full_run'] / max(timings['dq_handwritten_run'], 1e-9):.2f}x",
          file=sys.stderr)

    total = round(sum(timings.values()), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    # The driver captures only the LAST ~2000 chars of output and parses
    # the final JSON line. With 90+ queries the full per-query map no
    # longer fits, so: full-detail line FIRST (for the artifact/humans),
    # then a short summary line LAST whose tail always survives capture.
    # The summary keeps the `queries` key contract with the graded pair
    # (engine vs hand-written) plus the slowest entries that fit.
    detail = {
        "metric": "headline_queries_detail",
        "unit": "sec",
        "queries": timings,
        "canary": canary,
        "canary_first": canary_first,
        "canary_last": canary_last,
        "stageheavy_anchor": round(
            sum(timings.get(n, 0.0) for n in STAGEHEAVY_ANCHOR), 3),
        "sf": sf_val,
    }
    print(json.dumps(detail, separators=(",", ":")))
    # r15 verdict task 3: the committed BENCH_r{N}.json artifacts were
    # truncated to the entries that fit the tail window, which made
    # cross-round aggregate claims unverifiable from the repo. Persist
    # the COMPLETE per-query map (plus canary/anchor blocks) as a
    # first-class file the judge can parse as one object; the round's
    # cert artifact (BENCH_r{N}_cert.json) is a copy of this file.
    full_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "BENCH_latest_full.json")
    try:
        with open(full_path, "w") as fh:
            json.dump(detail, fh, indent=1, sort_keys=True)
            fh.write("\n")
        print(f"# full per-query map -> {full_path}", file=sys.stderr)
    except OSError as exc:  # read-only checkout: the printed line remains
        print(f"# could not persist full map: {exc}", file=sys.stderr)
    summary_queries = {
        k: timings[k] for k in ("dq_engine_full_run", "dq_handwritten_run")
        if k in timings
    }
    for name, secs in sorted(timings.items(), key=lambda kv: -kv[1]):
        if name in summary_queries:
            continue
        candidate = dict(summary_queries)
        candidate[name] = secs
        line = json.dumps({
            "metric": "headline_queries_total", "value": total,
            "unit": "sec", "queries": candidate,
            "n_queries": len(timings), "canary_ratio": canary["ratio"],
            "canary_total": canary["total"], "sf": sf_val,
        }, separators=(",", ":"))
        if len(line) > 1500:
            break
        summary_queries = candidate
    print(json.dumps({
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": summary_queries,
        "n_queries": len(timings),
        "canary_ratio": canary["ratio"],
        "canary_total": canary["total"],
        "full_map": "BENCH_latest_full.json",
        "sf": sf_val,
    }, separators=(",", ":")))
    spark.stop()


if __name__ == "__main__":
    main()
