"""Row-level DQ: one fused projection evaluates every rule in a single pass.

This is the engine's core operator, re-expressing reference
utils/actions.py:497-599 + sinks/utils/writer.py:1011-1102. Design goals at
100 TB scale:

* ONE wide ``select("*", rule_1, ..., rule_N)`` — N predicates compiled into
  a single WholeStageCodegen projection; no per-rule passes.
* Each rule column is NULL on pass and a ``map<string,string>`` of rule
  metadata on fail; ``meta_row_dq_results`` is the null-compacted array.
  (The reference materializes pass-maps too and filters them out later —
  skipping them halves the meta-column bytes shuffled/written.)
* All run counts (input, error, per-rule failures, drop-count, fail-count)
  come from ONE aggregation job over the projected frame — the reference
  runs 3+ separate full scans (input count, error count, output count).
* Zero Python UDFs; everything stays JVM-side.

Window expressions inside rules (``count(*) over (partition by pk) = 1``)
are supported directly: Catalyst plans the needed Window exchange before the
projection. Distinct window specs each cost a shuffle — inherent to the
semantics, so uniqueness-style rules should share partition keys when
possible.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..core.rules import ACTION_DROP, ACTION_FAIL, Rule

META_ROW_RESULTS = "meta_row_dq_results"
META_RUN_ID = "meta_dq_run_id"
META_RUN_DATETIME = "meta_dq_run_datetime"


class DQRowFailError(RuntimeError):
    """Raised when a failed rule has action_if_failed='fail'."""


def _rule_col_name(rule: Rule) -> str:
    return f"__dq_{rule.rule_type}_{rule.rule}"


def fail_map(rule: Rule) -> Column:
    """map<string,string> of rule metadata + status=fail (reference
    utils/actions.py:84-99)."""
    kvs: list[Column] = []
    for k, v in rule.meta_items():
        kvs.extend([F.lit(k), F.lit(v)])
    kvs.extend([F.lit("status"), F.lit("fail")])
    return F.create_map(*kvs)


def rule_column(rule: Rule) -> Column:
    """NULL when the predicate holds, fail-map otherwise.

    SQL three-valued logic: a predicate evaluating to NULL (e.g. comparing
    a NULL column) counts as a failure, matching the reference's
    ``when(expr(e), pass).otherwise(fail)``.
    """
    return (
        F.when(F.expr(rule.expectation), F.lit(None))
        .otherwise(fail_map(rule))
        .alias(_rule_col_name(rule))
    )


def project_rules(df: DataFrame, rules: Sequence[Rule]) -> DataFrame:
    """Append ``meta_row_dq_results: array<map<string,string>>`` in one pass."""
    if not rules:
        return df.withColumn(META_ROW_RESULTS,
                             F.lit([]).cast("array<map<string,string>>"))
    projected = df.select("*", *[rule_column(r) for r in rules])
    names = [_rule_col_name(r) for r in rules]
    return projected.withColumn(
        META_ROW_RESULTS, F.array_compact(F.array(*[F.col(n) for n in names]))
    ).drop(*names)


@dataclass
class RowDQSummary:
    input_count: int = 0
    error_count: int = 0          # rows with >=1 failed rule
    drop_count: int = 0           # rows removed by 'drop' actions
    fail_count: int = 0           # rows hitting a 'fail' rule
    rule_failed_counts: dict[str, int] = field(default_factory=dict)

    @property
    def output_count(self) -> int:
        return self.input_count - self.drop_count


def summarize(projected: DataFrame, rules: Sequence[Rule]) -> RowDQSummary:
    """ONE aggregation job → every count the run needs.

    Replaces the reference's separate input ``count()``, error ``count()``,
    output ``count()`` and explode+groupBy error summary
    (writer.py:1087-1102) with a single scan of the projected frame. The
    per-rule counters are plain conditional sums, so the whole thing is one
    partial+final hash aggregate with no shuffle wider than one row per
    partition.
    """
    res = F.col(META_ROW_RESULTS)
    has_err = F.size(res) > 0
    aggs: list[Column] = [
        F.count(F.lit(1)).alias("__input"),
        F.sum(has_err.cast("long")).alias("__errors"),
        F.sum(
            F.exists(res, lambda m: m["action_if_failed"] == ACTION_DROP).cast("long")
        ).alias("__drops"),
        F.sum(
            F.exists(res, lambda m: m["action_if_failed"] == ACTION_FAIL).cast("long")
        ).alias("__fails"),
    ]
    for i, r in enumerate(rules):
        aggs.append(
            F.sum(
                F.exists(res, (lambda name: lambda m: m["rule"] == name)(r.rule))
                .cast("long")
            ).alias(f"__r{i}")
        )
    row = projected.agg(*aggs).first()
    return RowDQSummary(
        input_count=row["__input"] or 0,
        error_count=row["__errors"] or 0,
        drop_count=row["__drops"] or 0,
        fail_count=row["__fails"] or 0,
        rule_failed_counts={r.rule: (row[f"__r{i}"] or 0) for i, r in enumerate(rules)},
    )


def error_rows(projected: DataFrame) -> DataFrame:
    """Rows with >=1 failed rule, meta column retained (error-table shape,
    reference sinks/utils/writer.py:1026-1050)."""
    return projected.filter(F.size(F.col(META_ROW_RESULTS)) > 0)


def apply_actions(
    projected: DataFrame,
    summary: Optional[RowDQSummary],
    *,
    keep_meta: bool = False,
) -> DataFrame:
    """Drop 'drop'-rows; raise if a 'fail' rule fired (reference
    utils/actions.py:613-690).

    The fail gate uses the already-computed summary — no extra scan (the
    reference re-scans with array_contains + count()). For streaming frames
    pass summary=None: the gate is skipped (uncountable), drop filtering
    still applies — same semantics as reference utils/actions.py:657-665.
    """
    if summary is not None and summary.fail_count > 0:
        raise DQRowFailError(
            f"{summary.fail_count} row(s) failed rules with action_if_failed='fail'"
        )
    out = projected.filter(
        ~F.exists(F.col(META_ROW_RESULTS), lambda m: m["action_if_failed"] == ACTION_DROP)
    )
    return out if keep_meta else out.drop(META_ROW_RESULTS)


def run_row_dq(
    df: DataFrame,
    rules: Sequence[Rule],
    *,
    compute_summary: bool = True,
):
    """Convenience: project → summarize → (errors, final) lazily.

    Returns (projected, summary | None). ``error_rows`` / ``apply_actions``
    derive from ``projected`` without re-evaluating predicates.
    """
    projected = project_rules(df, rules)
    summary = None
    if compute_summary and not df.isStreaming:
        summary = summarize(projected, rules)
    return projected, summary


# ---------------------------------------------------------------------------
# Boolean-flag fast path (what DQEngine uses)
#
# The map-typed meta column above is the error-table CONTRACT, but building
# map<string,string> literals per rule per row on every scan is ~3× the cost
# of the checks themselves (measured at sf0.1: 5.6s engine vs 1.7s
# hand-written booleans). So the engine evaluates rules as boolean fail
# flags — as cheap as hand-written code — and attaches the meta maps only
# AFTER filtering down to error rows, where Catalyst evaluates them on the
# errors alone.
# ---------------------------------------------------------------------------

def _flag_name(i: int) -> str:
    return f"__dq_f{i}"


def flag_column(rule: Rule, i: int) -> Column:
    """TRUE when the rule FAILS (null predicate counts as failure, matching
    the map path's when/otherwise semantics)."""
    return (
        ~F.coalesce(F.expr(rule.expectation).cast("boolean"), F.lit(False))
    ).alias(_flag_name(i))


def project_flags(df: DataFrame, rules: Sequence[Rule]) -> DataFrame:
    """One fused projection appending a boolean fail-flag per rule."""
    return df.select("*", *[flag_column(r, i) for i, r in enumerate(rules)])


def _any_flag(rules: Sequence[Rule], pred=None) -> Column:
    cols = [F.col(_flag_name(i)) for i, r in enumerate(rules)
            if pred is None or pred(r)]
    if not cols:
        return F.lit(False)
    out = cols[0]
    for c in cols[1:]:
        out = out | c
    return out


def summarize_flags_with(
    flags_df: DataFrame,
    rules: Sequence[Rule],
    extra_exprs: Sequence[Column] = (),
):
    """``summarize_flags`` plus caller-supplied aggregate expressions in
    the SAME job (stage fusion: DQEngine splices the source agg_dq rules
    in here so agg rules + every run count share one scan). Returns
    (RowDQSummary, collected Row) — the Row carries the extra outputs."""
    aggs = _summary_aggs(rules) + list(extra_exprs)
    row = flags_df.agg(*aggs).first()
    return _summary_from_row(rules, row), row


def summarize_flags(flags_df: DataFrame, rules: Sequence[Rule]) -> RowDQSummary:
    """ONE aggregation job over the boolean flags — conditional sums only."""
    row = flags_df.agg(*_summary_aggs(rules)).first()
    return _summary_from_row(rules, row)


def _summary_aggs(rules: Sequence[Rule]) -> list[Column]:
    aggs: list[Column] = [
        F.count(F.lit(1)).alias("__input"),
        F.sum(_any_flag(rules).cast("long")).alias("__errors"),
        F.sum(_any_flag(rules, lambda r: r.action_if_failed == ACTION_DROP)
              .cast("long")).alias("__drops"),
        F.sum(_any_flag(rules, lambda r: r.action_if_failed == ACTION_FAIL)
              .cast("long")).alias("__fails"),
    ]
    for i, _ in enumerate(rules):
        aggs.append(F.sum(F.col(_flag_name(i)).cast("long")).alias(f"__r{i}"))
    return aggs


def _summary_from_row(rules: Sequence[Rule], row) -> RowDQSummary:
    return RowDQSummary(
        input_count=row["__input"] or 0,
        error_count=row["__errors"] or 0,
        drop_count=row["__drops"] or 0,
        fail_count=row["__fails"] or 0,
        rule_failed_counts={r.rule: (row[f"__r{i}"] or 0)
                            for i, r in enumerate(rules)},
    )


def _meta_from_flags(rules: Sequence[Rule]) -> Column:
    return F.array_compact(F.array(*[
        F.when(F.col(_flag_name(i)), fail_map(r)).otherwise(F.lit(None))
        for i, r in enumerate(rules)
    ]))


def errors_from_flags(flags_df: DataFrame, rules: Sequence[Rule]) -> DataFrame:
    """Error rows with the meta_row_dq_results contract column. The filter
    runs on booleans; map construction happens only for surviving rows."""
    names = [_flag_name(i) for i in range(len(rules))]
    return (
        flags_df.filter(_any_flag(rules))
        .withColumn(META_ROW_RESULTS, _meta_from_flags(rules))
        .drop(*names)
    )


def final_from_flags(
    flags_df: DataFrame,
    rules: Sequence[Rule],
    summary: Optional[RowDQSummary],
) -> DataFrame:
    """Drop-filter + fail gate on the flag frame; returns the user schema."""
    if summary is not None and summary.fail_count > 0:
        raise DQRowFailError(
            f"{summary.fail_count} row(s) failed rules with action_if_failed='fail'"
        )
    names = [_flag_name(i) for i in range(len(rules))]
    return flags_df.filter(
        ~_any_flag(rules, lambda r: r.action_if_failed == ACTION_DROP)
    ).drop(*names)
