"""Streaming DQ two ways: (1) reference-parity row rules on the stream,
(2) full 5-stage engine per micro-batch via foreachBatch.

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
    spark.stop()


if __name__ == "__main__":
    main()
