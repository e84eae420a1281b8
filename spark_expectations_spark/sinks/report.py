"""Observability report: tidy per-rule outcomes from stats rows.

Re-expresses reference sinks/utils/report.py:38-364 (which parses the
stats table's nested arrays, joins source/target halves and unions them)
as explode/unnest over the typed stats columns — no string munging, no
regex-normalized join keys needed because our stats schema keeps rule
identity as map keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_STAGES = [
    ("source_agg_dq_results", "agg_dq", "source"),
    ("final_agg_dq_results", "agg_dq", "target"),
    ("source_query_dq_results", "query_dq", "source"),
    ("final_query_dq_results", "query_dq", "target"),
]


def report_from_stats(stats: DataFrame) -> DataFrame:
    """stats rows → one row per (run, rule, stage) outcome.

    Columns: run_id, product_id, table_name, rule_type, stage, rule,
    column_name, status, actual_value, expected, failed_row_count.
    Works on any number of stats rows (the whole audit table), exploding
    only rule-scale arrays.
    """
    parts = []
    base = [
        F.col("meta_dq_run_id").alias("run_id"),
        "product_id", "table_name",
    ]
    for col, rule_type, stage in _STAGES:
        part = (
            stats.filter(F.col(col).isNotNull())
            .select(*base, F.explode(col).alias("m"))
            .select(
                "run_id", "product_id", "table_name",
                F.lit(rule_type).alias("rule_type"),
                F.lit(stage).alias("stage"),
                F.col("m")["rule"].alias("rule"),
                F.col("m")["column_name"].alias("column_name"),
                F.col("m")["status"].alias("status"),
                F.col("m")["actual_value"].alias("actual_value"),
                F.col("m")["expected"].alias("expected"),
                F.lit(None).cast("long").alias("failed_row_count"),
            )
        )
        parts.append(part)
    row_part = (
        stats.filter(F.col("row_dq_res_summary").isNotNull())
        .select(*base, F.explode("row_dq_res_summary").alias("m"))
        .select(
            "run_id", "product_id", "table_name",
            F.lit("row_dq").alias("rule_type"),
            F.lit("row").alias("stage"),
            F.col("m")["rule"].alias("rule"),
            F.lit(None).cast("string").alias("column_name"),
            F.when(F.col("m")["failed_row_count"].cast("long") > 0, "fail")
             .otherwise("pass").alias("status"),
            F.col("m")["failed_row_count"].alias("actual_value"),
            F.lit(None).cast("string").alias("expected"),
            F.col("m")["failed_row_count"].cast("long").alias("failed_row_count"),
        )
    )
    parts.append(row_part)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def run_summary(stats: DataFrame) -> DataFrame:
    """One row per run with the headline health numbers — the report
    email/dashboard feed (reference alert.py:43-47 detail query)."""
    return stats.select(
        F.col("meta_dq_run_id").alias("run_id"),
        "product_id", "table_name",
        "input_count", "error_count", "output_count",
        "error_percentage", "success_percentage",
        "dq_status",
        F.col("meta_dq_run_datetime").alias("run_datetime"),
    )
