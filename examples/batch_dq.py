"""End-to-end batch DQ run: YAML rules -> DQEngine -> error table, stats,
HTML report.

    python examples/batch_dq.py [sf_dir]    (default /root/testdata/sf0.001)
"""

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import SparkSession

from spark_expectations_spark import DQConfig, DQEngine, WriterOptions
from spark_expectations_spark.sinks.report import render_html_report
from spark_expectations_spark.sources.loaders import rules_from_doc

RULES_DOC = {
    "product_id": "demo",
    "defaults": {"table_name": "lineitem"},
    "rules": [
        {"rule": "qty_range", "rule_type": "row_dq", "column_name": "l_quantity",
         "expectation": "l_quantity between 1 and 50"},
        {"rule": "disc_low", "rule_type": "row_dq", "column_name": "l_discount",
         "expectation": "l_discount between 0 and 0.05",
         "action_if_failed": "drop"},
        {"rule": "avg_disc", "rule_type": "agg_dq", "column_name": "l_discount",
         "expectation": "avg(l_discount) between 0 and 0.1"},
    ],
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = Path(tempfile.mkdtemp(prefix="dq_demo_"))
    spark = (SparkSession.builder.master("local[4]")
             .config("spark.sql.shuffle.partitions", "4")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    rules = rules_from_doc(RULES_DOC)
    cfg = DQConfig(
        product_id="demo", table_name="lineitem",
        write_error_table=True,
        error_writer=WriterOptions(mode="overwrite", path=str(out)),
        write_stats_table=True, stats_table="lineitem_stats",
        stats_writer=WriterOptions(mode="overwrite", path=str(out)),
        # runtime budget for query_dq: a pathological scalar subquery
        # gets status='timeout' instead of hanging the run
        query_timeout_s=60.0,
        # per-segment attribution: every source agg rule ALSO evaluated
        # per return flag (lazy frame + failing-segment report rows;
        # run status stays whole-table)
        agg_group_cols=("l_returnflag",),
    )
    res = DQEngine(cfg).run(li, rules, spark)

    print(f"input={res.input_count} errors={res.error_count} "
          f"output={res.output_count} status={res.status}")
    if res.source_agg_grouped is not None:
        seg_fails = res.source_agg_grouped.filter(
            "status = 'fail'").count()
        print(f"failing (segment, rule) pairs: {seg_fails}")
    report = out / "report.html"
    report.write_text(render_html_report(res))
    print(f"error table: {out}/lineitem_error")
    print(f"stats table: {out}/lineitem_stats")
    print(f"html report: {report}")

    # did the drop rules shift what survives? PSI input vs final
    from spark_expectations_spark.operators import drift
    d = drift.psi(li, res.final_df, "l_extendedprice",
                  lo=0.0, hi=120_000.0, bins=12).first()
    verdict = ("stable" if d.psi < 0.1
               else "drifting" if d.psi < 0.25 else "shifted")
    print(f"price-distribution PSI input→output: {d.psi:.4f} ({verdict})")

    # rule-pack presets: the standard checks without hand-writing SQL
    from spark_expectations_spark import RuleSet, rules_presets as P
    pack = RuleSet([
        *P.not_null_rules("demo", "lineitem",
                          ["l_orderkey", "l_partkey"]),
        P.unique_key_rule("demo", "lineitem",
                          ["l_orderkey", "l_linenumber"]),
        P.accepted_values_rule("demo", "lineitem", "l_returnflag",
                               ["A", "N", "R"]),
        P.range_rule("demo", "lineitem", "l_discount", lo=0, hi=0.1),
        P.row_count_rule("demo", "lineitem", min_rows=100),
    ])
    pres = DQEngine(DQConfig(product_id="demo", table_name="lineitem",
                             write_error_table=False)).run(li, pack, spark)
    fails = {k: v for k, v in
             pres.row_summary.rule_failed_counts.items() if v}
    print(f"preset pack: {len(pack.rules)} rules, "
          f"row-rule failures: {fails or 'none'}")
    spark.stop()


if __name__ == "__main__":
    main()
