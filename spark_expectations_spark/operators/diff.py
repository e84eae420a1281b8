"""Snapshot diff / reconciliation.

The reference expresses cross-table consistency as query_dq scalar
assertions (reference docs/configurations/rules.md:60 — e.g.
``(select count(*) from a) = (select count(*) from b)``); that tells you
THAT two snapshots disagree, not WHERE. ``snapshot_diff`` is the
row-level upgrade: a keyed full-outer compare that classifies every row
as added / removed / changed (with the exact columns that changed), so a
100 TB reconciliation emits a small actionable diff instead of a failed
boolean.

Scale shape: ONE full-outer shuffle join on the key (both sides hash-
partitioned once; AQE handles skewed keys), and the per-column compare is
a codegen projection over the joined row — no second pass, no collect.
At 100 TB prefer bucketed/pre-partitioned snapshots on the key so the
join reuses their layout and the shuffle disappears.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    left: DataFrame,
    right: DataFrame,
    key_cols: Sequence[str],
    *,
    compare_cols: Optional[Sequence[str]] = None,
    change_type_out: str = "change_type",
    changed_cols_out: str = "changed_cols",
) -> DataFrame:
    """Row-level diff of two keyed snapshots.

    Returns one row per key that differs, with:
      * ``change_type``: 'added' (only in right), 'removed' (only in
        left), or 'changed' (both sides, ≥1 compared column differs);
      * ``changed_cols``: sorted array of differing column names
        ('changed' rows only, empty otherwise);
      * every compared column as ``old_<c>`` / ``new_<c>``.

    Unchanged rows are filtered out — the output is the delta, sized by
    drift, not by table. NULL-safe equality (``eqNullSafe``) so NULL→value
    and value→NULL both count as changes.
    """
    keys = list(key_cols)
    if compare_cols is None:
        compare_cols = [c for c in left.columns
                        if c not in keys and c in right.columns]
    cmp_cols = list(compare_cols)

    # presence sentinels: deciding "side participated" from data columns
    # is ambiguous when a row is all-NULL, so each side carries a literal
    l = left.select(keys + cmp_cols).withColumn("_l", F.lit(1)).alias("l")
    r = right.select(keys + cmp_cols).withColumn("_r", F.lit(1)).alias("r")
    j = l.join(r, keys, "full_outer")

    in_l = F.col("_l").isNotNull()
    in_r = F.col("_r").isNotNull()
    diffs = F.array_sort(F.filter(
        F.array(*[
            F.when(~F.col(f"l.{c}").eqNullSafe(F.col(f"r.{c}")), F.lit(c))
            for c in cmp_cols
        ]),
        lambda x: x.isNotNull(),
    ))
    change = (
        F.when(in_l & ~in_r, F.lit("removed"))
        .when(~in_l & in_r, F.lit("added"))
        .when(F.size(diffs) > 0, F.lit("changed"))
    )
    out_cols = (
        [F.col(k) for k in keys]
        + [change.alias(change_type_out),
           F.when(change == "changed", diffs)
            .otherwise(F.array().cast("array<string>"))
            .alias(changed_cols_out)]
        + [F.col(f"l.{c}").alias(f"old_{c}") for c in cmp_cols]
        + [F.col(f"r.{c}").alias(f"new_{c}") for c in cmp_cols]
    )
    return j.select(*out_cols).filter(F.col(change_type_out).isNotNull())


def schema_diff(left: DataFrame, right: DataFrame):
    """Driver-side schema reconciliation between two frames — the check
    run before snapshot_diff/union on frames from different pipeline
    versions. Returns a dict with ``added`` (in right only), ``removed``
    (in left only), ``type_changed`` ({name: (left_type, right_type)}),
    and ``common`` — all by column name, types as simpleString.
    Purely metadata: no job, no scan."""
    lt = {f.name: f.dataType.simpleString() for f in left.schema.fields}
    rt = {f.name: f.dataType.simpleString() for f in right.schema.fields}
    return {
        "added": sorted(set(rt) - set(lt)),
        "removed": sorted(set(lt) - set(rt)),
        "type_changed": {n: (lt[n], rt[n])
                         for n in sorted(set(lt) & set(rt)) if lt[n] != rt[n]},
        "common": sorted(set(lt) & set(rt)),
    }
