"""Day-2 operations monitoring, end to end, over the round-14
analytics operators: detect producer schema changes between snapshots
(schema_drift_report), locate WHEN a metric shifted (CUSUM change
point), measure engagement with time-weighted averages and
Kaplan-Meier churn curves, audit numeric plausibility (Benford first
digits) and re-identification risk (k-anonymity / l-diversity), and
watch whether more data still buys vocabulary (Heaps-law growth).
Every step is a declarative DataFrame transform; only
group/bucket-cardinality frames reach the driver.

    python examples/ops_monitoring.py [sf_dir]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from spark_expectations_spark.operators import asof, drift, profiling
from spark_expectations_spark.operators import text as T

_NS_PER_DAY = 86_400_000_000_000


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (SparkSession.builder.master("local[4]")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    od = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cu = spark.read.parquet(f"{sf_dir}/customer.parquet")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").withColumn(
        "ts", F.unix_micros(F.col("ts").cast("timestamp")) * 1000)

    # 1. producer watch: did the upstream schema or null profile move?
    v2 = od.drop("o_custkey").withColumn(
        "o_totalprice", F.col("o_totalprice").cast("string"))
    sd = profiling.schema_drift_report(od, v2)
    changed = sd.filter("status <> 'common' OR type_changed").count()
    print(f"schema drift: {changed} column(s) changed")

    # 2. WHEN did the purchase value level shift? (planted for demo —
    # epoch day 19723 is the generator's fixed 2024-01-01 start)
    day = (F.col("ts") / _NS_PER_DAY).cast("long")
    shifted = ev.select(
        "event_type", day.alias("day"),
        (F.col("value")
         + F.when(day - 19723 >= 15, 25.0).otherwise(0.0)).alias("v"))
    cp = drift.cusum_change_point(shifted, "day", "v",
                                  group_cols=("event_type",))
    row = cp.orderBy(F.desc("tmax")).first()
    print(f"change point: {row['event_type']} shifted at day "
          f"{row['change_at']} (t={row['tmax']:.2f})")

    # 3. engagement: time-weighted value + churn curves per cohort
    twa = asof.time_weighted_mean(ev, "ts", "value", ("user_id",))
    print(f"median-ish TWA sample: {twa.limit(3).collect()}")
    acts = ev.select("user_id", day.alias("day")).distinct()
    u = acts.groupBy("user_id").agg(F.min("day").alias("fd"),
                                    F.max("day").alias("ld"))
    dmax = acts.agg(F.max("day").alias("dmax"))
    subj = (u.crossJoin(F.broadcast(dmax))
            .select((F.col("fd") % 3).alias("cohort"),
                    (F.col("ld") - F.col("fd")).alias("dur"),
                    (F.col("ld") < F.col("dmax")).cast("int").alias("e")))
    km = drift.survival_curve(subj, "dur", "e", group_cols=("cohort",))
    print(f"churn curve rows: {km.count()}")

    # 4. plausibility + privacy gates before the table ships
    ben = profiling.benford_report(
        od, "o_totalprice", group_cols=("o_orderpriority",)).first()
    print(f"benford: chi2={ben['chi2']:.1f} p={ben['p_value']} "
          f"(synthetic uniform prices correctly rejected)")
    ka = profiling.k_anonymity_report(
        cu.select("c_nationkey", "c_mktsegment",
                  F.floor(F.col("c_acctbal") / 1000).alias("bal_k")),
        ("c_nationkey", "c_mktsegment", "bal_k"), k=5).first()
    print(f"k-anonymity: {ka['n_rows_below_k']}/{ka['n_rows']} rows "
          f"linkable below k=5")

    # 5. corpus diversity: is more data still buying vocabulary?
    n = docs.count()
    growth = T.vocab_growth_curve(
        docs, "doc_id", "text",
        [max(1, n * i // 4) for i in range(1, 5)])
    for r in growth.collect():
        print(f"  docs<={r['checkpoint']}: vocab={r['vocab']} "
              f"ttr={r['type_token_ratio']:.4f}")

    # 6. DAY-2: the same reports, incrementally. Each day's batch
    # writes only its ADDITIVE sufficient statistics (bucket sums,
    # digit counts, time counts, per-column null counts) under its
    # _batch_id partition; every report below reads the accumulated
    # state — yesterday's rows are never rescanned, and a retried
    # batch replaces (not doubles) its increment.
    import shutil
    import tempfile

    from spark_expectations_spark import streaming as st

    state_root = tempfile.mkdtemp(prefix="ops_day2_")
    day1 = shifted.filter(F.col("day") % 2 == 0)   # two arrival days
    day2 = shifted.filter(F.col("day") % 2 == 1)

    cusum_step = st.incremental_cusum_state(
        f"{state_root}/cusum", "day", "v", group_cols=("event_type",))
    cusum_step(day1, 0)
    cusum_step(day2, 1)
    row2 = (st.cusum_from_state(spark, f"{state_root}/cusum",
                                group_cols=("event_type",))
            .orderBy(F.desc("tmax")).first())
    print(f"day-2 change point (from state): {row2['event_type']} at "
          f"day {row2['change_at']} (t={row2['tmax']:.2f}) — matches "
          f"the one-shot scan above: {row2['change_at'] == row['change_at']}")

    ben_step = st.incremental_benford_state(f"{state_root}/benford",
                                            "o_totalprice")
    ben_step(od.filter(F.col("o_orderkey") % 2 == 0), 0)
    ben_step(od.filter(F.col("o_orderkey") % 2 == 1), 1)
    ben2 = st.benford_from_state(spark, f"{state_root}/benford").first()
    ben_union = profiling.benford_report(od, "o_totalprice").first()
    print(f"day-2 benford (from state): chi2={ben2['chi2']:.1f} — "
          f"bit-identical to the one-shot over the union: "
          f"{ben2.asDict() == ben_union.asDict()}")

    surv_step = st.incremental_survival_state(
        f"{state_root}/km", "dur", "e", group_cols=("cohort",))
    surv_step(subj.filter(F.col("dur") % 2 == 0), 0)   # subjects split
    surv_step(subj.filter(F.col("dur") % 2 == 1), 1)
    km2 = st.survival_from_state(spark, f"{state_root}/km",
                                 group_cols=("cohort",))
    print(f"day-2 churn curve rows (from state): {km2.count()}")

    # r16: the rank/trend family's additive halves. Mann-Whitney and
    # Cochran-Armitage reduce over per-(group, value/bucket) integer
    # counts that SUM-merge exactly, so they get the same day-2 seam.
    # Kendall tau, Spearman rho and Theil-Sen do NOT: tau needs pair
    # concordance across batches, rho needs global average ranks of
    # raw rows, Theil-Sen the median of cross-batch pairwise slopes —
    # none reduce to additive per-bucket statistics, so they are
    # deliberately one-shot (recompute over the union, or feed them
    # bucket-collapsed series that ARE the accumulated state).
    rank_step = st.incremental_rank_state(
        f"{state_root}/rank", "v", "is_shift", group_cols=("event_type",))
    labeled = shifted.withColumn(
        "is_shift", (F.col("day") > F.lit(row["change_at"])).cast("int"))
    rank_step(labeled.filter(F.col("day") % 2 == 0), 0)
    rank_step(labeled.filter(F.col("day") % 2 == 1), 1)
    mw2 = (st.mann_whitney_from_state(spark, f"{state_root}/rank",
                                      group_cols=("event_type",))
           .orderBy(F.desc_nulls_last("z")).first())
    print(f"day-2 rank test (from state): {mw2['event_type']} "
          f"cliffs_delta={mw2['cliffs_delta']:.3f} — the shifted days "
          f"dominate without rescanning day 1")

    trend_step = st.incremental_trend_state(
        f"{state_root}/trend", "day", "is_shift",
        group_cols=("event_type",))
    trend_step(labeled.filter(F.col("day") % 2 == 0), 0)
    trend_step(labeled.filter(F.col("day") % 2 == 1), 1)
    ca2 = (st.cochran_armitage_from_state(spark, f"{state_root}/trend",
                                          group_cols=("event_type",))
           .first())
    print(f"day-2 trend test (from state): {ca2['event_type']} "
          f"slope_sign={ca2['slope_sign']} over {ca2['n_buckets']} "
          f"scored buckets")

    prof_step = st.incremental_null_profile_state(f"{state_root}/prof")
    prof_step(od, 0)                                   # day-1 profile
    sd2 = profiling.schema_drift_from_profiles(
        st.null_profile_from_state(spark, f"{state_root}/prof"),
        profiling.null_profile_snapshot(v2))           # day-2 check
    changed2 = sd2.filter("status <> 'common' OR type_changed").count()
    print(f"day-2 schema drift vs stored profile: {changed2} column(s) "
          f"changed — matches the live comparison: {changed2 == changed}")

    shutil.rmtree(state_root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
