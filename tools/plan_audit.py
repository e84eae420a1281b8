"""Derive the SCALE.md plan-audit facts for catalog queries.

For each named query (default: every catalog entry) prints one
pipe-table row: pushdown, broadcast, shuffle count, partial aggregation,
columns read, codegen spans. SCALE.md's "Measured plan audit" table is
maintained from this output instead of by hand.

    python tools/plan_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from pyspark.sql import SparkSession  # noqa: E402

from spark_expectations_spark import plans  # noqa: E402
from spark_expectations_spark.queries import QUERIES  # noqa: E402


def audit_row(name: str, df) -> str:
    pushed = "yes" if plans.has_pushed_filters(df) else "—"
    bcast = "yes" if plans.has_broadcast_join(df) else "—"
    smj = " (+SMJ)" if plans.has_sort_merge_join(df) else ""
    shuffles = plans.num_shuffles(df)
    partial = "yes" if plans.has_partial_aggregation(df) else "—"
    cols = plans.read_schema_columns(df)
    spans = plans.whole_stage_codegen_spans(df)
    return (f"| {name} | {pushed} | {bcast}{smj} | {shuffles} | {partial} "
            f"| {len(cols)} | {spans} |")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    names = sys.argv[2:] or sorted(QUERIES)
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("plan-audit")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    print("| query | pushdown | broadcast | shuffles | partial agg "
          "| cols read | codegen spans |")
    print("|---|---|---|---|---|---|---|")
    failures = []
    for name in names:
        try:
            print(audit_row(name, QUERIES[name](spark, sf_dir)))
        except Exception as e:  # noqa: BLE001 — audit keeps going
            failures.append((name, str(e).splitlines()[0][:100]))
    for name, err in failures:
        print(f"# FAILED {name}: {err}", file=sys.stderr)
    spark.stop()
    if failures:
        sys.exit(1)


if __name__ == "__main__":
    main()
