"""Column-level helpers over DQ meta columns and common rule idioms.

Everything here is a pure Column builder (higher-order functions, zero
Python UDFs — same posture as reference utils/udf.py:5-42, which despite
its name contains no UDFs either). Useful for querying error tables and
for composing rule expectations programmatically.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..operators.row_dq import META_ROW_RESULTS


def results(col: str = META_ROW_RESULTS) -> Column:
    return F.col(col)


def any_rule_failed(col: str = META_ROW_RESULTS) -> Column:
    """Predicate: this row failed at least one rule."""
    return F.size(F.col(col)) > 0


def failed_rule_names(col: str = META_ROW_RESULTS) -> Column:
    """array<string> of failed rule names, in rule order."""
    return F.transform(F.col(col), lambda m: m["rule"])


def failed_rule(rule_name: str, col: str = META_ROW_RESULTS) -> Column:
    """Predicate: this row failed the named rule."""
    return F.exists(F.col(col), lambda m: m["rule"] == rule_name)


def has_action(action: str, col: str = META_ROW_RESULTS) -> Column:
    """Predicate: any failed rule carries the given action
    (reference utils/actions.py:665-669 array_contains idiom)."""
    return F.exists(F.col(col), lambda m: m["action_if_failed"] == action)


def failed_by_tag(tag: str, col: str = META_ROW_RESULTS) -> Column:
    return F.exists(F.col(col), lambda m: m["tag"] == tag)


# ---------------------------------------------------------------------------
# Rule-expectation builders (docs/configurations/rules.md idioms)
# ---------------------------------------------------------------------------

def not_null(column: str) -> str:
    return f"{column} is not null"


def in_range(column: str, lo, hi) -> str:
    return f"{column} between {lo} and {hi}"


def _q(v) -> str:
    """SQL single-quote a literal, doubling embedded quotes — a value
    like O'Brien must not break (or inject into) the expectation.
    Backslashes double first: Spark string literals process escape
    sequences (escapedStringLiterals=false default), so a regex ``\\d``
    fed to :func:`matches` would silently become a literal ``d``."""
    return "'" + str(v).replace("\\", "\\\\").replace("'", "''") + "'"


def in_set(column: str, values: Sequence[str]) -> str:
    quoted = ", ".join(_q(v) for v in values)
    return f"{column} in ({quoted})"


def matches(column: str, pattern: str) -> str:
    return f"{column} rlike {_q(pattern)}"


def unique(*key_columns: str) -> str:
    keys = ", ".join(key_columns)
    return f"count(*) over (partition by {keys}) = 1"


def date_parseable(column: str, fmt: str = "M/d/yyyy") -> str:
    return f"try_to_timestamp({column}, {_q(fmt)}) is not null"


def castable(column: str, to_type: str) -> str:
    return f"try_cast({column} as {to_type}) is not null"


def referential(column: str, other_table: str, other_column: str) -> str:
    """query_dq referential-integrity idiom (docs/configurations/rules.md:60)."""
    return (f"(select count(*) from {{table}} t where t.{column} not in "
            f"(select {other_column} from {other_table})) = 0")
