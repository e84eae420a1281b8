"""Observability report: tidy per-rule outcomes from stats rows.

Re-expresses reference sinks/utils/report.py:38-364 (which parses the
stats table's nested arrays, joins source/target halves and unions them)
as explode/unnest over the typed stats columns — no string munging, no
regex-normalized join keys needed because our stats schema keeps rule
identity as map keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
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


_HTML_PAGE = """<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>DQ report {run_id}</title>
<style>
body {{ font-family: sans-serif; margin: 24px; }}
table {{ border-collapse: collapse; margin: 12px 0; }}
th, td {{ border: 1px solid #999; padding: 4px 10px; text-align: left; }}
th {{ background: #eee; }}
.pass {{ color: #0a0; }} .fail {{ color: #c00; font-weight: bold; }}
</style></head><body>
<h2>Data-quality report — {product_id}.{table_name}</h2>
<p>run <code>{run_id}</code></p>
<table>
<tr><th>input rows</th><th>error rows</th><th>output rows</th>
<th>error %</th><th>success %</th></tr>
<tr><td>{input_count}</td><td>{error_count}</td><td>{output_count}</td>
<td>{error_pct:.2f}</td><td>{success_pct:.2f}</td></tr>
</table>
<h3>Stage status</h3>
<table><tr><th>stage</th><th>status</th></tr>{stage_rows}</table>
<h3>Rule outcomes</h3>
<table>
<tr><th>stage</th><th>rule</th><th>column</th><th>status</th>
<th>actual</th><th>failed rows</th></tr>{rule_rows}</table>
</body></html>
"""


def render_html_report(result) -> str:
    """Self-contained HTML report for one run (reference
    notifications/push/alert.py:71-155 renders the same content through
    Jinja templates + email; here it's a pure string so any channel —
    email plugin, webhook, file sink — can carry it). Driver-side,
    rule-scale only — EXCEPT when per-segment attribution is present
    (DQConfig.agg_group_cols): rendering then runs one Spark job per
    grouped frame to collect the failing segments (ADVICE r8 — this is
    the only place report rendering touches the cluster)."""
    import html as _html

    def esc(v) -> str:
        return _html.escape("" if v is None else str(v))

    def tr(cells, status=None) -> str:
        cls = f' class="{status}"' if status in ("pass", "fail") else ""
        return "<tr>" + "".join(f"<td{cls}>{esc(c)}</td>" for c in cells) + "</tr>"

    stage_rows = "".join(
        tr([s, st], "fail" if st == "Failed" else "pass")
        for s, st in result.status.items())
    rule_rows = []
    if result.row_summary is not None:
        for rule, cnt in sorted(result.row_summary.rule_failed_counts.items()):
            rule_rows.append(tr(
                ["row_dq", rule, "", "fail" if cnt else "pass", "", cnt],
                "fail" if cnt else "pass"))
    for stage, results in (("source_agg_dq", result.source_agg),
                           ("target_agg_dq", result.target_agg),
                           ("source_query_dq", result.source_query),
                           ("target_query_dq", result.target_query)):
        for r in results or []:
            rule_rows.append(tr(
                [stage, r.rule.rule, r.rule.column_name, r.status,
                 r.actual_value, ""], r.status))
    for label, grouped in (
            ("source_agg_dq (segment)",
             getattr(result, "source_agg_grouped", None)),
            ("target_agg_dq (segment)",
             getattr(result, "target_agg_grouped", None))):
        if grouped is None:
            continue
        # per-segment attribution: FAILING segments only, capped — the
        # grouped frame is group-cardinality × rules and a report must
        # stay driver-safe. Ordered by (group cols, rule) BEFORE the
        # cap so which 50 segments appear is deterministic across runs
        # (ADVICE r8).
        gcols = [c for c in grouped.columns
                 if c not in ("rule", "status", "actual_value")]
        fails = (grouped.filter(F.col("status") == "fail")
                 .orderBy(*gcols, "rule")
                 .limit(50).collect())
        for r in fails:
            seg = ", ".join(f"{c}={r[c]}" for c in gcols)
            rule_rows.append(tr(
                [label, r["rule"], seg, "fail",
                 r["actual_value"], ""], "fail"))
    return _HTML_PAGE.format(
        run_id=esc(result.run_id),
        product_id=esc(result.product_id),
        table_name=esc(result.table_name),
        input_count=result.input_count,
        error_count=result.error_count,
        output_count=result.output_count,
        error_pct=result.error_percentage,
        success_pct=result.success_percentage,
        stage_rows=stage_rows,
        rule_rows="".join(rule_rows),
    )


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


def error_rate_trend(
    stats: DataFrame,
    *,
    window: int = 5,
    sigma: float = 2.0,
    min_history: int = 3,
) -> DataFrame:
    """Run-over-run regression detection on the persisted stats table:
    flag runs whose error_percentage sits more than ``sigma`` standard
    deviations above the mean of the preceding ``window`` runs for the
    same (product_id, table_name).

    This is the meta-DQ layer the reference leaves to dashboards: the
    stats table it writes every run (writer.py stats sink) already holds
    the history; one window pass turns it into alerts. Stats rows are
    rule-scale (one per run), so this is driver-cheap at any data scale.
    """
    w = (
        Window.partitionBy("product_id", "table_name")
        .orderBy("meta_dq_run_datetime")
        .rowsBetween(-window, -1)
    )
    mu = F.avg("error_percentage").over(w)
    sd = F.stddev("error_percentage").over(w)
    n = F.count("error_percentage").over(w)
    return (
        stats.select(
            F.col("meta_dq_run_id").alias("run_id"),
            "product_id", "table_name", "error_percentage",
            F.col("meta_dq_run_datetime").alias("run_datetime"),
            mu.alias("trailing_mean"),
            sd.alias("trailing_stddev"),
            n.alias("history_runs"),
        )
        .filter(
            (F.col("history_runs") >= min_history)
            & (F.col("trailing_stddev").isNotNull())
            & (F.col("error_percentage")
               > F.col("trailing_mean") + sigma * F.col("trailing_stddev"))
        )
    )
