"""Query-level DQ: full-SQL assertions evaluated as scalar subqueries.

Re-expresses reference utils/actions.py:306-430. An expectation like
``(select sum(o_totalprice) from order_view) > 10000`` is executed as
``SELECT (<expectation>) AS output`` — Catalyst plans the parenthesized
subqueries as scalar subqueries over registered temp views, so each runs as
an ordinary (optimizable, pushdown-friendly) aggregation job.

Composite rules (``expr@alias@sql`` form, parsed in core.rules) also capture
each secondary query's result set for the querydq-output audit table.
Secondary results are rule-scale (assertions over aggregates), so the
``collect()`` here is bounded — never data-scale.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional, Sequence

from pyspark.sql import DataFrame, SparkSession

from ..core.rules import ACTION_FAIL, Rule
from .agg_dq import DQAggFailError, parse_expectation


@dataclass
class QueryRuleResult:
    rule: Rule
    status: str                                   # 'pass' | 'fail'
    actual_value: Any = None
    expected: Optional[str] = None
    #: alias -> list[dict] rows captured from secondary queries
    secondary_output: dict[str, list[dict]] = field(default_factory=dict)

    def result_map(self) -> dict[str, str]:
        d = dict(self.rule.meta_items())
        d["status"] = self.status
        if self.actual_value is not None:
            d["actual_value"] = str(self.actual_value)
        if self.expected is not None:
            d["expected"] = self.expected
        return d


def evaluate_query_rules(
    spark: SparkSession,
    rules: Sequence[Rule],
    *,
    capture_secondary: bool = True,
) -> list[QueryRuleResult]:
    """ALL rules' pass/fail bits AND actual values are fused into ONE
    SELECT (the query-dq twin of agg_dq's single df.agg): each scalar
    subquery is planned once and Catalyst's ReuseSubquery dedupes the
    subqueries shared between an expectation and its extracted
    actual-value expression — K rules cost one driver round-trip instead
    of the reference's 2 jobs per rule (utils/actions.py:306-430)."""
    if not rules:
        return []
    parsed = [parse_expectation(r.expectation) for r in rules]
    selects = []
    for i, (r, p) in enumerate(zip(rules, parsed)):
        selects.append(f"({r.expectation}) AS status_{i}")
        if p is not None:
            selects.append(f"({p.source_expr}) AS actual_{i}")
    row = spark.sql("SELECT " + ", ".join(selects)).first()

    out: list[QueryRuleResult] = []
    for i, (r, p) in enumerate(zip(rules, parsed)):
        secondary: dict[str, list[dict]] = {}
        if capture_secondary and r.enable_querydq_custom_output and r.secondary_queries:
            for alias, sql in r.secondary_queries.items():
                rows = spark.sql(sql).collect()
                secondary[alias] = [rw.asDict(recursive=True) for rw in rows]
        out.append(
            QueryRuleResult(
                rule=r,
                status="pass" if bool(row[f"status_{i}"]) else "fail",
                actual_value=row[f"actual_{i}"] if p is not None else None,
                expected=p.expected_repr() if p is not None else None,
                secondary_output=secondary,
            )
        )
    return out


def failed(results: Sequence[QueryRuleResult]) -> list[QueryRuleResult]:
    return [r for r in results if r.status == "fail"]


def enforce_fail_action(results: Sequence[QueryRuleResult], stage: str) -> None:
    hard = [r for r in failed(results) if r.rule.action_if_failed == ACTION_FAIL]
    if hard:
        names = [r.rule.rule for r in hard]
        raise DQAggFailError(f"{stage}: rules {names} failed with action 'fail'")


def register_views(spark: SparkSession, views: dict[str, DataFrame]) -> None:
    for name, df in views.items():
        df.createOrReplaceTempView(name)
