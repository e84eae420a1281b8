"""Plan-lint every catalog query: the fleet-wide scale audit.

Builds each queries() frame (some operators run small planning jobs —
sampler quotas, percentile thresholds — so this is minutes, not
seconds) and reports plan_lint findings. Error-tier findings are the
repo's zero-tolerance set (cartesian products, row-Python UDFs); the
warn tier is printed for review — deliberate broadcast cross joins
(queries × centroids, grid builds) appear there by design.

    python tools/lint_catalog.py [sf_dir] [query ...]

Exit code 1 when any ERROR-tier finding (or a query that fails to
build) is present. Last full run (end of r11): 189/189 queries 0
errors; 110 warns — 57 filter-not-pushed, 42 single-partition-exchange
(model-scale folds/collapses and value-predicate scans reviewed with
the round's entries — the r11 additions are the ordinal-alpha rank
marginals, the isotonic distinct-score window, and the graph/bootstrap
1-row folds), 11 cartesian-products, every one carrying a standing
adjudication below (dims-scale probe grids, the docs_curriculum
thresholds BNLJ the subtree prover can't certify, the sample-bounded
blocking-quality truth side, ordinal alpha's rank-cardinality² δ²
pairing).
Plan_lint demotes BroadcastNestedLoopJoins whose build side is a
provably 1-row aggregate to info (r8 verdict task 6); the demotion
requires an explicit BuildLeft/BuildRight token and keeps the warn
otherwise (ADVICE r9).
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from pyspark.sql import SparkSession  # noqa: E402

from spark_expectations_spark import plans  # noqa: E402
from spark_expectations_spark.queries import QUERIES  # noqa: E402

#: Standing adjudications for warn-tier findings the linter cannot
#: prove benign from the plan alone. Each remaining cartesian-product
#: warn is either here (with its reason) or a real finding to fix.
KNOWN_BENIGN: dict[tuple[str, str], str] = {
    ("ann_topk", "cartesian-product"):
        "query matrix broadcast BY CONTRACT (similarity.ann_topk: the "
        "query side is bounded, corpus streams map-only)",
    ("ann_ivf", "cartesian-product"):
        "queries x centroids probe grid — both sides dims-scale "
        "(n_queries*k), broadcast by contract; corpus never cross-joins",
    ("ann_ivf_recall", "cartesian-product"):
        "same probe grid as ann_ivf plus a sampled exact side — "
        "quadratic only on the documented sample",
    ("embed_ivf_pq", "cartesian-product"):
        "per-query LUT build (m*k distance table) against broadcast "
        "centroids — model-scale frames, not corpus",
    ("docs_curriculum", "cartesian-product"):
        "quantile_buckets thresholds join: the single-group (lit "
        "constant) case folds the eqNullSafe key so the join plans as "
        "BNLJ, but the build side is the explicitly-broadcast "
        "group-cardinality thresholds frame (1 row per group) — the "
        "grouped agg isn't keyless so plan_lint can't prove it 1-row",
    ("embed_hard_negatives", "cartesian-product"):
        "query matrix broadcast BY CONTRACT (ann_topk's shape with the "
        "label mask riding the map-side predicate; corpus streams once)",
    ("ann_ivf_kmeans", "cartesian-product"):
        "the ann_ivf probe grid (queries x centroids, dims-scale) plus "
        "the kmeans codebook collapse — every cross side is model-scale",
    ("part_blocking_quality", "cartesian-product"):
        "the report's TRUTH side is a cross join BY DESIGN and by "
        "documented contract runs only on the deterministic sample "
        "(sample_fraction); the blocking side never cross-joins",
    ("docs_label_alpha_ordinal", "cartesian-product"):
        "ordinal alpha's δ² table and D_e pairing are RANK-CARDINALITY "
        "self-joins on v_a < v_b (≤ distinct-rating-values² rows — 5 "
        "ratings → ≤ 10 pairs — broadcast); the corpus-scale ratings "
        "frame only ever meets itself on unit-keyed equi-joins, and "
        "the remaining crosses are 1-row aggregate folds",
    # --- r12 verdict №2: the 7 standing warn-tier findings, annotated
    # so the linter output reads zero unexplained findings ---
    ("docs_label_agreement", "single-partition-exchange"):
        "cohens_kappa's final fold: the exchange collapses the "
        "categories²-row confusion matrix (≤ label-cardinality², here "
        "~dozens) to the 1-row kappa — label-scale by construction, "
        "the corpus-scale groupBy before it is fully parallel",
    ("docs_label_agreement", "filter-not-pushed"):
        "the NULL-drop filter tests rater_b, a COMPUTED when-chain "
        "column (the deterministic disagreement/NULL injection) that "
        "does not exist in the parquet schema — unpushable by "
        "construction; the corpus is scanned exactly once",
    ("docs_weighted_cosine", "filter-not-pushed"):
        "Bayardo prefix/length/suffix-norm filters predicate on "
        "COMPUTED shingle arrays, window sums, and weight joins — "
        "none exist at the scan; the only scan-column filter "
        "(size(split(text)) >= 8) is over a derived split. Corpus "
        "read once, candidate space pruned by the prefix filter "
        "instead of the scan",
    ("lineitem_price_jsd", "single-partition-exchange"):
        "the JSD sum is a 1-row collapse of the (buckets)-cardinality "
        "joined histogram (~11 rows) — histogram-scale fold, the "
        "corpus-scale bucket groupBy is map-side combined and parallel",
    ("lineitem_price_jsd", "filter-not-pushed"):
        "the deterministic halves split (l_orderkey % 2 = 0/1) is a "
        "modulo EXPRESSION predicate — parquet pushdown only handles "
        "plain column comparisons, so the filter runs post-scan by "
        "format capability, not plan shape; one scan per side, "
        "column-pruned to the two read columns",
    ("lineitem_drift_report", "filter-not-pushed"):
        "same modulo-expression halves split as lineitem_price_jsd "
        "(unpushable by parquet capability); all downstream frames are "
        "(columns × buckets)-cardinality",
    ("lineitem_drift_verdict", "filter-not-pushed"):
        "same modulo-expression halves split as lineitem_price_jsd; "
        "the verdict layer only ever touches the columns-cardinality "
        "report frame",
    ("events_quantile_rollup", "single-partition-exchange"):
        "the GLOBAL quantile read-off's ungrouped cumulative window "
        "runs on the merged sketch — a bins-cardinality frame "
        "(len(edges)+1 rows, KB-scale); the corpus-scale cell build "
        "before it is a fully parallel map-side-combined groupBy",
    ("events_quantile_rollup", "filter-not-pushed"):
        "the read-off's candidate filter (cum >= q*N) predicates on "
        "window outputs over the bins-scale cell table — no scan "
        "column exists to push to; the one corpus scan filters only "
        "value IS NOT NULL, which does push",
    ("events_agg_rollup", "single-partition-exchange"):
        "the global moments-merge row is an UNGROUPED agg over the "
        "days-cardinality daily cell table (KB-scale — one row per "
        "day); the corpus-scale per-day build before it is a fully "
        "parallel map-side-combined groupBy",
    ("docs_minhash_jaccard", "filter-not-pushed"):
        "the Jaccard threshold filter predicates on the COMPUTED "
        "intersection/size counts of the posting-list join — no scan "
        "column exists to push to (dedup_jaccard's own adjudicated "
        "shape); the signature joins are id-keyed equi-joins",
    ("docs_vocab_divergence", "single-partition-exchange"):
        "the final KL fold is ONE row grouped on the broadcast 1-row "
        "totals keys over the vocab-sized joined count table — "
        "vocab-scale, never corpus; both token counts before it are "
        "fully parallel map-side-combined groupBys",
    ("docs_vocab_divergence", "filter-not-pushed"):
        "the doc_id % 2 halves split is a modulo EXPRESSION predicate "
        "(parquet pushes only plain comparisons — the "
        "lineitem_price_jsd adjudication); the empty-token filter "
        "tests the computed split array",
    # --- r13 verdict №2: the 9 warns the linter grew this round ---
    ("docs_phash_dups", "filter-not-pushed"):
        "the Hamming verify (bit_count(xor) <= radius) and band keys "
        "predicate on the COMPUTED md5-derived phash columns — no "
        "scan column exists to push to; the corpus is scanned once, "
        "column-pruned to (doc_id, text)",
    ("part_fuzzy_disjunctive", "filter-not-pushed"):
        "the p_partkey % 20 slice is a modulo EXPRESSION predicate "
        "(unpushable by parquet capability — the lineitem_price_jsd "
        "adjudication) and the distance <= 1 verify tests COMPUTED "
        "levenshtein over concatenated keys; one scan per side",
    ("docs_calibration", "filter-not-pushed"):
        "the drop rule (score NOT NULL, 0 <= score <= 1) tests the "
        "COMPUTED when-chain fixture column that does not exist in "
        "the parquet schema (docs_label_agreement's shape); the "
        "corpus is scanned exactly once into a 10-key groupBy",
    ("docs_calibration_ece", "filter-not-pushed"):
        "same computed-fixture drop rule as docs_calibration — the "
        "score column is a when-chain over doc_id, not a scan column",
    ("docs_calibration_ece", "single-partition-exchange"):
        "the ECE/MCE fold collapses the 10-row (n_bins-cardinality) "
        "bin table to the 1-row metrics frame — bins-scale by "
        "construction; the corpus-scale bin groupBy and the Brier "
        "scan agg are both fully parallel map-side-combined",
    ("docs_set_jaccard_join", "filter-not-pushed"):
        "prefix-rank bounds, positional/suffix filters, and the "
        "jaccard >= t verify all predicate on COMPUTED shingle "
        "arrays, df ranks, and join counts (docs_weighted_cosine's "
        "adjudicated shape); the only scan-side filter "
        "(size(split(text)) >= 8) is over a derived split. Corpus "
        "read once, candidate space pruned by the prefix filter",
    ("part_blocking_quality", "filter-not-pushed"):
        "the deterministic 20% sample gate is an md5-hex-prefix "
        "EXPRESSION over the cast key (unpushable by parquet "
        "capability) and the truth verify tests computed "
        "levenshtein; both inputs are scanned once each",
    ("part_blocking_quality", "single-partition-exchange"):
        "the report's final frame assembles SEVEN scalar counters "
        "(n_left/n_right/candidates/truth/caught + two ratios) into "
        "one row — 1-row folds of sample-scale counts; the "
        "candidate/truth counts themselves aggregate in parallel",
    ("part_fuzzy_probe", "filter-not-pushed"):
        "the probe sample (p_partkey % 10 = 0) is a modulo "
        "EXPRESSION predicate (lineitem_price_jsd adjudication) and "
        "the distance verify tests computed levenshtein; the index "
        "and probe sides are each scanned once",
}


def main() -> int:
    args = sys.argv[1:]
    sf = args[0] if args else "/root/testdata/sf0.001"
    names = args[1:] or list(QUERIES)
    spark = (SparkSession.builder.master("local[8]")
             .config("spark.ui.enabled", "false")
             .config("spark.sql.shuffle.partitions", "8")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    n_err = 0
    for name in names:
        try:
            findings = plans.plan_lint(QUERIES[name](spark, sf))
        except Exception as exc:  # noqa: BLE001 - report, keep sweeping
            print(f"BUILD-FAIL {name}: {exc}")
            n_err += 1
            continue
        for f in findings:
            if f["severity"] == "error":
                n_err += 1
                print(f"ERROR {name}: {f['rule']}: {f['detail']}")
            elif f["severity"] == "warn":
                note = KNOWN_BENIGN.get((name, f["rule"]))
                if note:
                    print(f"warn  {name}: {f['rule']} [adjudicated: "
                          f"{note}]")
                else:
                    print(f"warn  {name}: {f['rule']}")
    print(f"{len(names)} queries linted, {n_err} errors")
    return 1 if n_err else 0


if __name__ == "__main__":
    raise SystemExit(main())
