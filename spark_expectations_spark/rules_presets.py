"""Ready-made rule generators — the dbt-tests / Deequ-checks layer.

The reference makes users hand-write every expectation string; in
practice 90% of rules are the same six shapes (not-null, accepted
values, range, unique key, referential integrity, freshness). These
generators emit plain :class:`~.core.rules.Rule` objects — nothing new
at execution time, so every preset rides the fused row projection /
single-agg / scalar-subquery machinery and its validation.

Quoting: column names are backtick-quoted (spaces/keywords survive);
string literal values are single-quote-escaped — user-supplied VALUES
never get string-formatted into SQL unescaped. Relation to
``functions``: that module keeps the reference-parity RAW-STRING
expectation idioms (unquoted identifiers, every literal stringified);
this one emits complete, quoted Rule objects — the two quoting helpers
are deliberately distinct (``_qident`` quotes IDENTIFIERS here,
``functions._q`` quotes LITERALS there).

Usage::

    from spark_expectations_spark import RuleSet, rules_presets as P

    rules = RuleSet([
        *P.not_null_rules("p1", "orders", ["o_orderkey", "o_custkey"],
                          action_if_failed="drop"),
        P.unique_key_rule("p1", "orders", ["o_orderkey"]),
        P.accepted_values_rule("p1", "orders", "o_orderstatus",
                               ["O", "F", "P"]),
        P.range_rule("p1", "orders", "o_totalprice", lo=0),
        P.referential_rule("p1", "orders", "o_custkey",
                           "customer_view", "c_custkey"),
        P.freshness_rule("p1", "orders", "o_orderdate", max_age_days=7),
    ])
"""

from __future__ import annotations

from typing import Iterable, Optional, Sequence

from .core.rules import Rule

__all__ = [
    "not_null_rules", "accepted_values_rule", "range_rule",
    "unique_key_rule", "referential_rule", "freshness_rule",
    "row_count_rule", "matches_rule", "castable_rule",
]


def _qident(col: str) -> str:
    """Backtick-quote an identifier (embedded backticks doubled)."""
    return "`" + col.replace("`", "``") + "`"


def _lit(v) -> str:
    import datetime as _dt

    if v is None:
        # None in an accepted-values list silently builds `x IN (..,
        # NULL)` which can never match — demand the explicit flag
        raise ValueError(
            "None is not a literal; use allow_null=True instead")
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (_dt.date, _dt.datetime)):
        return "'" + str(v) + "'"
    if isinstance(v, (int, float)):
        return str(v)
    # backslashes double FIRST: Spark string literals process escape
    # sequences (default escapedStringLiterals=false), so a regex \d
    # would silently become a literal 'd' otherwise
    return "'" + str(v).replace("\\", "\\\\").replace("'", "''") + "'"


def not_null_rules(
    product_id: str,
    table_name: str,
    columns: Iterable[str],
    *,
    action_if_failed: str = "ignore",
) -> list[Rule]:
    """One row_dq not-null rule per column (dbt ``not_null``)."""
    return [
        Rule(product_id, table_name, "row_dq", f"{c}_not_null", c,
             f"{_qident(c)} IS NOT NULL", action_if_failed=action_if_failed,
             tag="completeness", description=f"{c} must not be null")
        for c in columns
    ]


def accepted_values_rule(
    product_id: str,
    table_name: str,
    column: str,
    values: Sequence,
    *,
    allow_null: bool = False,
    action_if_failed: str = "ignore",
) -> Rule:
    """Row rule: column ∈ literal set (dbt ``accepted_values``).
    ``allow_null`` admits NULL alongside the set; otherwise NULL fails
    (IN returns NULL, which row_dq counts as a violation)."""
    if not values:
        raise ValueError("accepted_values_rule: values must be non-empty")
    in_list = ", ".join(_lit(v) for v in values)
    expr = f"{_qident(column)} IN ({in_list})"
    if allow_null:
        expr = f"({expr} OR {_qident(column)} IS NULL)"
    return Rule(product_id, table_name, "row_dq",
                f"{column}_accepted_values", column, expr,
                action_if_failed=action_if_failed, tag="validity",
                description=f"{column} must be one of {list(values)!r}")


def range_rule(
    product_id: str,
    table_name: str,
    column: str,
    *,
    lo=None,
    hi=None,
    action_if_failed: str = "ignore",
) -> Rule:
    """Row rule: lo <= column <= hi (either bound optional)."""
    if lo is None and hi is None:
        raise ValueError("range_rule: need lo and/or hi")
    parts = []
    if lo is not None:
        parts.append(f"{_qident(column)} >= {_lit(lo)}")
    if hi is not None:
        parts.append(f"{_qident(column)} <= {_lit(hi)}")
    return Rule(product_id, table_name, "row_dq", f"{column}_range",
                column, " AND ".join(parts),
                action_if_failed=action_if_failed, tag="validity",
                description=f"{column} in [{lo}, {hi}]")


def unique_key_rule(
    product_id: str,
    table_name: str,
    key_columns: Sequence[str],
    *,
    action_if_failed: str = "ignore",
) -> Rule:
    """Row rule: the key occurs exactly once (window count — rides the
    engine's Window planning; flags EVERY row of a duplicated key so
    the error table shows all copies, not n−1 of them)."""
    if not key_columns:
        raise ValueError("unique_key_rule: need at least one key column")
    keys = ", ".join(_qident(c) for c in key_columns)
    name = "_".join(key_columns) + "_unique"
    return Rule(product_id, table_name, "row_dq", name,
                ",".join(key_columns),
                f"count(*) OVER (PARTITION BY {keys}) = 1",
                action_if_failed=action_if_failed, tag="uniqueness",
                description=f"({keys}) must be unique")


def referential_rule(
    product_id: str,
    table_name: str,
    child_column: str,
    parent_view: str,
    parent_column: str,
    *,
    child_view: Optional[str] = None,
    action_if_failed: str = "ignore",
) -> Rule:
    """query_dq rule: zero child keys missing from the parent view
    (dbt ``relationships``). The parent must be registered as a temp
    view (``DQConfig.views`` / ``query_dq.register_views``); the child
    side reads ``child_view`` (default: the table name) — set
    ``DQConfig.source_view`` to the same name so the engine registers
    the input frame under it. NULL child keys are exempt, per SQL FK
    semantics."""
    child_view = child_view or table_name
    expr = (
        f"(SELECT count(*) FROM {child_view} c "
        f"WHERE c.{_qident(child_column)} IS NOT NULL AND NOT EXISTS "
        f"(SELECT 1 FROM {parent_view} p "
        f"WHERE p.{_qident(parent_column)} = c.{_qident(child_column)})) = 0"
    )
    return Rule(product_id, table_name, "query_dq",
                f"{child_column}_refs_{parent_view}", child_column, expr,
                action_if_failed=action_if_failed, tag="referential",
                description=(f"{child_column} must exist in "
                             f"{parent_view}.{parent_column}"))


def freshness_rule(
    product_id: str,
    table_name: str,
    ts_column: str,
    *,
    max_age_days: Optional[float] = None,
    max_age_hours: Optional[float] = None,
    name: Optional[str] = None,
    action_if_failed: str = "ignore",
) -> Rule:
    """agg_dq rule: the newest row is at most N days/hours old
    (dbt-source freshness). Uses ``current_timestamp()`` — evaluation
    time, not data time, so re-running an old batch CAN flip it; that
    is the point of a freshness gate."""
    if (max_age_days is None) == (max_age_hours is None):
        raise ValueError(
            "freshness_rule: exactly one of max_age_days / max_age_hours")
    hours = max_age_hours if max_age_hours is not None \
        else float(max_age_days) * 24.0
    # whole SECONDS: Spark rejects fractional HOUR intervals
    # (INVALID_INTERVAL_FORMAT), and float rendering could go
    # scientific — 7 days arrives here as 168.0
    secs = int(round(hours * 3600.0))
    expr = (f"max({_qident(ts_column)}) >= current_timestamp() "
            f"- INTERVAL {secs} SECOND")
    return Rule(product_id, table_name, "agg_dq",
                name or f"{ts_column}_freshness", ts_column, expr,
                action_if_failed=action_if_failed, tag="freshness",
                description=f"newest {ts_column} within {hours}h")


def row_count_rule(
    product_id: str,
    table_name: str,
    *,
    min_rows: int = 1,
    max_rows: Optional[int] = None,
    name: Optional[str] = None,
    action_if_failed: str = "ignore",
) -> Rule:
    """agg_dq rule: row count within [min_rows, max_rows] — the empty-
    or runaway-batch tripwire. ``name`` disambiguates multiple volume
    rules in one set (RuleSet rejects duplicate names)."""
    expr = f"count(*) >= {int(min_rows)}"
    if max_rows is not None:
        expr = f"({expr} AND count(*) <= {int(max_rows)})"
    return Rule(product_id, table_name, "agg_dq", name or "row_count", "",
                expr, action_if_failed=action_if_failed, tag="volume",
                description=f"row count in [{min_rows}, {max_rows}]")


def matches_rule(
    product_id: str,
    table_name: str,
    column: str,
    pattern: str,
    *,
    action_if_failed: str = "ignore",
) -> Rule:
    """Row rule: column matches a regex (dbt-expectations
    ``expect_column_values_to_match_regex``). NULL fails (rlike on
    NULL is NULL); compose with :func:`not_null_rules` or widen the
    pattern if NULLs are acceptable."""
    return Rule(product_id, table_name, "row_dq", f"{column}_matches",
                column, f"{_qident(column)} RLIKE {_lit(pattern)}",
                action_if_failed=action_if_failed, tag="validity",
                description=f"{column} must match /{pattern}/")


def castable_rule(
    product_id: str,
    table_name: str,
    column: str,
    to_type: str,
    *,
    action_if_failed: str = "ignore",
) -> Rule:
    """Row rule: column parses as ``to_type`` via try_cast — the
    string-column sanity check before a real cast migration.
    ``to_type`` must be a type NAME (validated against a whitelist
    shape, not interpolated blindly)."""
    import re as _re

    if not _re.fullmatch(r"[A-Za-z_]+(\(\s*\d+(\s*,\s*\d+)?\s*\))?",
                         to_type.strip()):
        raise ValueError(f"castable_rule: suspicious type name {to_type!r}")
    return Rule(product_id, table_name, "row_dq", f"{column}_castable",
                column,
                f"TRY_CAST({_qident(column)} AS {to_type}) IS NOT NULL",
                action_if_failed=action_if_failed, tag="validity",
                description=f"{column} must cast to {to_type}")
