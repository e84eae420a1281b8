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
    #: alias -> list[dict] rows captured from secondary queries. An
    #: alias whose capture blew the runtime budget is ABSENT here and
    #: listed in timed_out_secondaries instead — an empty list always
    #: means "the query ran and returned no rows".
    secondary_output: dict[str, list[dict]] = field(default_factory=dict)
    #: aliases whose secondary capture timed out under the stage budget
    timed_out_secondaries: list[str] = field(default_factory=list)

    def result_map(self) -> dict[str, str]:
        d = dict(self.rule.meta_items())
        d["status"] = self.status
        if self.actual_value is not None:
            d["actual_value"] = str(self.actual_value)
        if self.expected is not None:
            d["expected"] = self.expected
        if self.timed_out_secondaries:
            d["timed_out_secondaries"] = ",".join(self.timed_out_secondaries)
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

    from ..connect import spark_context

    sc = spark_context(spark)
    if sc is None:  # Spark Connect: no job-group API on the client
        return fn(), False
    gid = f"se-querydq-{uuid.uuid4().hex[:12]}"
    # snapshot the caller's thread-local job-group properties BEFORE
    # stamping ours: clusters commonly wrap whole pipelines in
    # setJobGroup for cost attribution, and nulling these in the finally
    # would silently strip that attribution from every job the caller
    # runs after the DQ stage
    _props = ("spark.jobGroup.id", "spark.job.description",
              "spark.job.interruptOnCancel")
    saved = {p: sc.getLocalProperty(p) for p in _props}
    sc.setJobGroup(gid, desc, interruptOnCancel=True)
    done = threading.Event()
    expired = threading.Event()

    def _watchdog():
        # REPEATING cancel, not a one-shot: a multi-subquery SELECT runs
        # several sequential jobs, and cancelJobGroup only cancels jobs
        # active at that instant — a single cancel landing in the gap
        # between two jobs would be a no-op and the next job would run
        # unbudgeted. Re-cancelling every 250ms until the main thread
        # signals completion closes that race with public APIs
        # (cancelJobGroupAndFutureJobs is JVM-only as of PySpark 4.1).
        if done.wait(timeout_s):
            return
        expired.set()
        while not done.is_set():
            sc.cancelJobGroup(gid)
            done.wait(0.25)

    watchdog = threading.Thread(target=_watchdog, daemon=True)
    watchdog.start()
    try:
        return fn(), False
    except Exception:  # noqa: BLE001 - classifying cancellation
        # once the watchdog has fired, ANY job failure is classified as
        # timeout: Spark surfaces cancellation with wording that varies
        # by version/backend ("cancelled", "killed", a bare
        # SparkException), so substring-matching would let a real
        # timeout re-raise as a hard error. A genuine unrelated failure
        # racing the expiry also reads 'timeout' — acceptable, since
        # the budget DID expire and the rule is gated either way.
        if expired.is_set():
            return None, True
        raise
    finally:
        done.set()
        # restore the caller's thread-local properties (not None them) —
        # a stomped description/interruptOnCancel would misattribute all
        # later jobs on this thread and change their task-kill semantics
        for p in _props:
            sc.setLocalProperty(p, saved[p])


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
        secondary, s_timeouts = _capture_secondaries(
            spark, r, capture_secondary, timeout_s)
        out.append(
            QueryRuleResult(
                rule=r,
                status="pass" if bool(row[f"status_{i}"]) else "fail",
                actual_value=row[f"actual_{i}"] if p is not None else None,
                expected=p.expected_repr() if p is not None else None,
                secondary_output=secondary,
                timed_out_secondaries=s_timeouts,
            )
        )
    return out


def _capture_secondaries(
    spark: SparkSession,
    r: Rule,
    capture_secondary: bool,
    timeout_s: Optional[float],
) -> tuple[dict[str, list[dict]], list[str]]:
    """Secondary-query capture shared by the fused and per-rule paths.
    With a budget, EVERY secondary runs under its own watchdog — the
    fused-success path must not become an unbudgeted back door for the
    very cross-join the budget exists to contain. A timed-out alias is
    returned in the second list and OMITTED from the capture dict, so
    an empty list always means 'ran clean, no rows'."""
    secondary: dict[str, list[dict]] = {}
    timeouts: list[str] = []
    if not (capture_secondary and r.enable_querydq_custom_output
            and r.secondary_queries):
        return secondary, timeouts
    for alias, sql in r.secondary_queries.items():
        if timeout_s is None:
            rows = spark.sql(sql).collect()
        else:
            rows, s_to = _run_with_timeout(
                spark, lambda q=sql: spark.sql(q).collect(), timeout_s,
                f"query_dq secondary {r.rule}:{alias}")
            if s_to:
                timeouts.append(alias)
                continue
        secondary[alias] = [rw.asDict(recursive=True) for rw in rows]
    return secondary, timeouts


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
        secondary, s_timeouts = _capture_secondaries(
            spark, r, capture_secondary, timeout_s)
        out.append(QueryRuleResult(
            rule=r,
            status="pass" if bool(row["status_0"]) else "fail",
            actual_value=row["actual_0"] if p is not None else None,
            expected=p.expected_repr() if p is not None else None,
            secondary_output=secondary,
            timed_out_secondaries=s_timeouts,
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
