"""Plan-lint every catalog query: the fleet-wide scale audit.

Builds each queries() frame (some operators run small planning jobs —
sampler quotas, percentile thresholds — so this is minutes, not
seconds) and reports plan_lint findings. Error-tier findings are the
repo's zero-tolerance set (cartesian products, row-Python UDFs); the
warn tier is printed for review — deliberate broadcast cross joins
(queries × centroids, grid builds) appear there by design.

    python tools/lint_catalog.py [sf_dir] [query ...]

Exit code 1 when any ERROR-tier finding (or a query that fails to
build) is present. Last full run: 150/150 queries, 0 errors.
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from pyspark.sql import SparkSession  # noqa: E402

from spark_expectations_spark import plans  # noqa: E402
from spark_expectations_spark.queries import QUERIES  # noqa: E402


def main() -> int:
    args = sys.argv[1:]
    sf = args[0] if args else "/root/testdata/sf0.001"
    names = args[1:] or list(QUERIES)
    spark = (SparkSession.builder.master("local[8]")
             .config("spark.ui.enabled", "false")
             .config("spark.sql.shuffle.partitions", "8")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    n_err = 0
    for name in names:
        try:
            findings = plans.plan_lint(QUERIES[name](spark, sf))
        except Exception as exc:  # noqa: BLE001 - report, keep sweeping
            print(f"BUILD-FAIL {name}: {exc}")
            n_err += 1
            continue
        for f in findings:
            if f["severity"] == "error":
                n_err += 1
                print(f"ERROR {name}: {f['rule']}: {f['detail']}")
            elif f["severity"] == "warn":
                print(f"warn  {name}: {f['rule']}")
    print(f"{len(names)} queries linted, {n_err} errors")
    return 1 if n_err else 0


if __name__ == "__main__":
    raise SystemExit(main())
