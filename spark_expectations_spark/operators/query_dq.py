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
    status: str                          # 'pass' | 'fail' | 'timeout'
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


def _run_with_timeout(spark: SparkSession, fn, timeout_s: float, desc: str):
    """Run ``fn`` (which triggers Spark jobs on THIS thread) inside a
    job group that a watchdog timer cancels after ``timeout_s`` seconds.
    Returns ``(value, timed_out)``. Spark has no per-query timeout of
    its own; job-group cancellation is the supported mechanism (the
    same one the UI's kill button uses). Under Spark Connect there is
    no ``sparkContext`` — the query then runs without a watchdog (the
    caller's contract is best-effort budget, not hard real-time).

    Interruptibility caveat: cancellation marks tasks killed, but a
    task only dies when its generated code polls the kill flag. Scans,
    shuffles and aggregations poll per batch and die promptly; the
    inner loop of an un-equi-joined nested-loop join (the accidental
    cross join this budget exists for) does NOT poll, so its tasks can
    linger as zombies occupying task slots after the timeout fires —
    the budget still returns control and marks the rule, but schedule
    headroom for follow-up queries may be reduced until those tasks
    finish or the executor is recycled."""
    import threading
    import uuid

    try:
        sc = spark.sparkContext
    except Exception:  # Spark Connect: no job-group API on the client
        return fn(), False
    gid = f"se-querydq-{uuid.uuid4().hex[:12]}"
    sc.setJobGroup(gid, desc, interruptOnCancel=True)
    timer = threading.Timer(timeout_s, lambda: sc.cancelJobGroup(gid))
    timer.daemon = True
    timer.start()
    try:
        return fn(), False
    except Exception as exc:  # noqa: BLE001 - classifying cancellation
        fired = not timer.is_alive()
        if fired and "cancel" in str(exc).lower():
            return None, True
        raise
    finally:
        timer.cancel()
        sc.setLocalProperty("spark.jobGroup.id", None)


def evaluate_query_rules(
    spark: SparkSession,
    rules: Sequence[Rule],
    *,
    capture_secondary: bool = True,
    timeout_s: Optional[float] = None,
) -> list[QueryRuleResult]:
    """ALL rules' pass/fail bits AND actual values are fused into ONE
    SELECT (the query-dq twin of agg_dq's single df.agg): each scalar
    subquery is planned once and Catalyst's ReuseSubquery dedupes the
    subqueries shared between an expectation and its extracted
    actual-value expression — K rules cost one driver round-trip instead
    of the reference's 2 jobs per rule (utils/actions.py:306-430).

    ``timeout_s`` puts a runtime budget on the stage: the fused SELECT
    runs under a cancellable job group, and if it exceeds the budget the
    rules are re-evaluated INDIVIDUALLY, each under its own
    ``timeout_s``, so one pathological scalar subquery (the classic
    reference-user failure: an accidental cross join in a rule) marks
    only ITS rule ``status='timeout'`` instead of hanging the whole DQ
    run. Timed-out rules carry no actual value, skip secondary capture,
    and gate like failures (a rule you could not evaluate is not a rule
    that passed)."""
    if not rules:
        return []
    parsed = [parse_expectation(r.expectation) for r in rules]
    selects = []
    for i, (r, p) in enumerate(zip(rules, parsed)):
        selects.append(f"({r.expectation}) AS status_{i}")
        if p is not None:
            selects.append(f"({p.source_expr}) AS actual_{i}")
    fused_sql = "SELECT " + ", ".join(selects)
    if timeout_s is None:
        row = spark.sql(fused_sql).first()
    else:
        row, timed_out = _run_with_timeout(
            spark, lambda: spark.sql(fused_sql).first(), timeout_s,
            "query_dq fused assertions")
        if timed_out:
            return _evaluate_individually(
                spark, rules, parsed, capture_secondary, timeout_s)

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


def _evaluate_individually(
    spark: SparkSession,
    rules: Sequence[Rule],
    parsed: Sequence[Any],
    capture_secondary: bool,
    timeout_s: float,
) -> list[QueryRuleResult]:
    """Per-rule fallback after the fused SELECT blew its budget: each
    rule gets its own job group + watchdog, so the slow subquery is
    identified by name instead of poisoning the batch."""
    out: list[QueryRuleResult] = []
    for r, p in zip(rules, parsed):
        sel = [f"({r.expectation}) AS status_0"]
        if p is not None:
            sel.append(f"({p.source_expr}) AS actual_0")
        sql = "SELECT " + ", ".join(sel)
        row, timed_out = _run_with_timeout(
            spark, lambda q=sql: spark.sql(q).first(), timeout_s,
            f"query_dq rule {r.rule}")
        if timed_out:
            out.append(QueryRuleResult(
                rule=r, status="timeout",
                expected=p.expected_repr() if p is not None else None))
            continue
        secondary: dict[str, list[dict]] = {}
        if capture_secondary and r.enable_querydq_custom_output and r.secondary_queries:
            for alias, ssql in r.secondary_queries.items():
                rows, s_timed_out = _run_with_timeout(
                    spark, lambda q=ssql: spark.sql(q).collect(), timeout_s,
                    f"query_dq secondary {r.rule}:{alias}")
                secondary[alias] = ([] if s_timed_out else
                                    [rw.asDict(recursive=True) for rw in rows])
        out.append(QueryRuleResult(
            rule=r,
            status="pass" if bool(row["status_0"]) else "fail",
            actual_value=row["actual_0"] if p is not None else None,
            expected=p.expected_repr() if p is not None else None,
            secondary_output=secondary,
        ))
    return out


def failed(results: Sequence[QueryRuleResult]) -> list[QueryRuleResult]:
    # timeout gates like failure: an unevaluated assertion did not pass
    return [r for r in results if r.status in ("fail", "timeout")]


def enforce_fail_action(results: Sequence[QueryRuleResult], stage: str) -> None:
    hard = [r for r in failed(results) if r.rule.action_if_failed == ACTION_FAIL]
    if hard:
        names = [r.rule.rule for r in hard]
        raise DQAggFailError(f"{stage}: rules {names} failed with action 'fail'")


def register_views(spark: SparkSession, views: dict[str, DataFrame]) -> None:
    for name, df in views.items():
        df.createOrReplaceTempView(name)
