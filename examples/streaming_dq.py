"""Streaming DQ three ways: (1) reference-parity row rules on the
stream, (2) full 5-stage engine per micro-batch via foreachBatch,
(3) finalized session windows feeding the DQ engine exactly-once
(windowed/session analytics -> gated table).

    python examples/streaming_dq.py
"""

import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import SparkSession

from spark_expectations_spark import DQConfig, Rule, RuleSet
from spark_expectations_spark.streaming import (foreach_batch_dq,
                                                query_progress,
                                                stop_gracefully)


def main() -> None:
    out = tempfile.mkdtemp(prefix="dq_stream_")
    spark = (SparkSession.builder.master("local[4]")
             .config("spark.sql.shuffle.partitions", "4")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    stream = (spark.readStream.format("rate").option("rowsPerSecond", "200")
              .load().selectExpr("value AS id", "value % 10 AS grade"))
    rules = RuleSet([
        Rule("demo", "grades", "row_dq", "grade_ok", "grade", "grade < 8",
             action_if_failed="drop"),
        Rule("demo", "grades", "agg_dq", "batch_nonempty", "", "count(*) >= 0"),
    ])
    cfg = DQConfig(product_id="demo", table_name="grades",
                   write_error_table=False)

    results = {}
    q = foreach_batch_dq(stream, rules, cfg,
                         on_result=lambda bid, r: results.setdefault(bid, r),
                         checkpoint_location=f"{out}/ckpt")
    deadline = time.time() + 45
    while time.time() < deadline:
        if any(r.input_count > 0 for r in results.values()):
            break
        time.sleep(2)
    print("progress:", query_progress(q))
    stop_gracefully(q)
    for bid, r in sorted(results.items()):
        if r.input_count:
            print(f"batch {bid}: input={r.input_count} errors={r.error_count} "
                  f"output={r.output_count} agg={r.status['source_agg_dq']}")

    # (3) session windows -> DQ engine, exactly-once across replays:
    # rate values shaped into bursts an hour apart so sessions finalize
    from spark_expectations_spark import DQEngine
    from spark_expectations_spark.streaming import (
        idempotent_foreach_batch, session_counts)

    src = (spark.readStream.format("rate")
           .option("rowsPerSecond", "400").load()
           .selectExpr(
               "timestamp '2026-01-01' + (value div 10) * INTERVAL 1 HOUR"
               " + (value % 10) * INTERVAL 1 SECOND as ts",
               "cast(value % 2 as string) as key"))
    sess = session_counts(src, "ts", "key", gap="30 seconds",
                          watermark="0 seconds")
    sess_rules = RuleSet([
        Rule("demo", "sessions", "row_dq", "n_pos", "n_events",
             "n_events > 0", action_if_failed="drop"),
    ])
    engine = DQEngine(DQConfig(product_id="demo", table_name="sessions",
                               write_error_table=False))
    gated = []

    def dq_sink(batch_df, batch_id):
        res = engine.run(batch_df, sess_rules, batch_df.sparkSession)
        gated.append((batch_id, res.output_count))

    spark.sql("CREATE TABLE IF NOT EXISTS sess_state (d INT) USING parquet")
    q2 = (sess.writeStream.outputMode("append")
          .foreachBatch(idempotent_foreach_batch(dq_sink, "sess_state",
                                                 stream_id="demo_sess"))
          .option("checkpointLocation", f"{out}/ckpt_sess").start())
    deadline = time.time() + 60
    while time.time() < deadline and sum(n for _, n in gated) < 4:
        time.sleep(2)
    q2.stop()
    spark.sql("DROP TABLE IF EXISTS sess_state")
    print(f"finalized sessions through DQ: "
          f"{sum(n for _, n in gated)} across {len(gated)} batches")

    # (4) exact streaming distinct users via disk-backed bitmap state:
    # each micro-batch writes only its own bitmaps; OR-merge idempotence
    # makes replays exactly-once, and the query side never rescans
    from spark_expectations_spark.streaming import (
        bitmap_distinct_counts, incremental_bitmap_distinct)

    src3 = (spark.readStream.format("rate")
            .option("rowsPerSecond", "500").load()
            .selectExpr("cast(value % 2 as string) as g",
                        "value % 97 as uid"))
    q3 = (src3.writeStream.outputMode("append")
          .foreachBatch(incremental_bitmap_distinct(
              f"{out}/bm_state", ["g"], "uid"))
          .option("checkpointLocation", f"{out}/ckpt_bm").start())
    time.sleep(5)            # rate source: let real rows arrive first
    q3.processAllAvailable()
    q3.stop()
    for r in bitmap_distinct_counts(spark, f"{out}/bm_state",
                                    ["g"]).collect():
        print(f"exact distinct uids g={r['g']}: {r['n_distinct']}")

    # (5) streaming drift baseline: accumulate per-batch histogram
    # increments exactly-once, then drift ANY later frame against the
    # whole stream history without rescanning it
    from spark_expectations_spark.operators.drift import (
        drift_from_snapshot, drift_verdict)
    from spark_expectations_spark.streaming import (
        incremental_histogram_state)

    edges = {"uid": [20.0, 40.0, 60.0, 80.0]}
    src4 = (spark.readStream.format("rate")
            .option("rowsPerSecond", "500").load()
            .selectExpr("CAST(value % 97 AS DOUBLE) as uid"))
    q4 = (src4.writeStream.outputMode("append")
          .foreachBatch(incremental_histogram_state(
              f"{out}/hist_state", edges))
          .option("checkpointLocation", f"{out}/ckpt_hist").start())
    time.sleep(5)
    q4.processAllAvailable()
    q4.stop()
    skewed = spark.range(0, 500).selectExpr(
        "CAST(id % 30 AS DOUBLE) as uid")      # low-skewed vs uniform
    v = drift_verdict(drift_from_snapshot(
        spark.read.parquet(f"{out}/hist_state"), skewed, edges)).first()
    print(f"stream-baseline drift: psi={v['psi']:.4f} "
          f"verdict={v['verdict']}")
    spark.stop()


if __name__ == "__main__":
    main()
