"""Static rule validation — the invariants of reference
utils/validate_rules.py:208-447, implemented against Spark's own SQL
parser instead of sqlglot (not available here; Catalyst's parser is the
authority anyway):

* every expectation must parse as a SQL expression (or SELECT for query_dq);
* row_dq: no top-level aggregate (window'd aggs allowed), not a bare query;
* agg_dq: must contain a top-level aggregate function;
* query_dq: must be parenthesized-(sub)query comparison, SELECT-parseable.

Validation is driver-only and cheap: parse + classify, plus an optional
``limit(0)`` analysis probe against the target frame that catches
unresolved columns without running a job.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException

from .core.rules import (AGG_DQ, QUERY_DQ, ROW_DQ, Rule, looks_aggregate,
                         strip_scalar_subqueries)


@dataclass
class ValidationIssue:
    rule: str
    severity: str          # 'error' | 'warning'
    message: str


def _parses_as_expression(spark: SparkSession, expectation: str) -> Optional[str]:
    """None if the expectation parses; otherwise the parser message."""
    from pyspark.errors import ParseException

    try:
        # parse-only: build a Column against an empty frame; no job runs
        spark.range(0).select(F.expr(expectation))
        return None
    except ParseException as e:  # must precede AnalysisException (subclass)
        return str(e).split("\n")[0]
    except AnalysisException:
        return None  # parsed fine; analysis failed only for missing columns
    except Exception as e:
        return str(e).split("\n")[0]


def validate_rule(spark: SparkSession, rule: Rule) -> list[ValidationIssue]:
    issues: list[ValidationIssue] = []
    e = rule.expectation.strip()
    if rule.rule_type == QUERY_DQ:
        if "(" not in e:
            issues.append(ValidationIssue(
                rule.rule, "error",
                "query_dq expectation must contain a parenthesized (sub)query"))
            return issues
        try:
            spark.sql(f"SELECT ({e}) AS output").schema  # analysis, no job
        except Exception as ex:
            # missing temp views at validation time are expected; only
            # report genuine parse errors
            msg = str(ex).split("\n")[0]
            if "PARSE_SYNTAX_ERROR" in msg or "ParseException" in type(ex).__name__:
                issues.append(ValidationIssue(rule.rule, "error", f"unparseable: {msg}"))
            elif "TABLE_OR_VIEW_NOT_FOUND" not in msg and "UNRESOLVED" not in msg:
                issues.append(ValidationIssue(rule.rule, "warning", msg))
        return issues

    err = _parses_as_expression(spark, e)
    if err is not None:
        issues.append(ValidationIssue(rule.rule, "error", f"unparseable: {err}"))
        return issues
    is_agg = looks_aggregate(e)
    # an aggregate INSIDE a scalar subquery is fine in a row rule:
    # `amount <= (select max(cap) from limits)` is a per-row predicate
    if rule.rule_type == ROW_DQ and is_agg:
        is_agg = looks_aggregate(strip_scalar_subqueries(e))
    if rule.rule_type == ROW_DQ and is_agg:
        issues.append(ValidationIssue(
            rule.rule, "error",
            "row_dq expectation contains a top-level aggregate; use agg_dq "
            "(window aggregates `... over (...)` are fine in row_dq)"))
    if rule.rule_type == AGG_DQ and not is_agg:
        issues.append(ValidationIssue(
            rule.rule, "error",
            "agg_dq expectation has no aggregate function; use row_dq"))
    if rule.rule_type == ROW_DQ and e.lower().startswith("select"):
        issues.append(ValidationIssue(
            rule.rule, "error", "row_dq expectation must be a predicate, not a query"))
    return issues


def validate_against_df(
    spark: SparkSession, rule: Rule, df: DataFrame
) -> list[ValidationIssue]:
    """Analysis-time probe: resolves columns/types against the actual frame
    via limit(0) — catches UNRESOLVED_COLUMN before any job runs
    (reference probes with limit(1), which launches a job per rule)."""
    if rule.rule_type == QUERY_DQ:
        return []
    try:
        df.limit(0).select(F.expr(rule.expectation)).schema
        return []
    except Exception as e:
        return [ValidationIssue(rule.rule, "error", str(e).split("\n")[0])]


def validate_rules(
    spark: SparkSession,
    rules: Sequence[Rule],
    df: Optional[DataFrame] = None,
    *,
    raise_on_error: bool = False,
) -> list[ValidationIssue]:
    issues: list[ValidationIssue] = []
    for r in rules:
        issues.extend(validate_rule(spark, r))
        if df is not None:
            issues.extend(validate_against_df(spark, r, df))
    if raise_on_error:
        errors = [i for i in issues if i.severity == "error"]
        if errors:
            details = "; ".join(f"{i.rule}: {i.message}" for i in errors)
            from .core.rules import DQRuleError
            raise DQRuleError(f"invalid rules: {details}")
    return issues
