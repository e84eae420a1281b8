"""Incremental DQ: validate only data that arrived since the last run.

At 100 TB, re-running DQ over the whole table every cycle is the
dominant cost; the scalable loop is: remember a high-water mark, filter
the scan to partitions above it (partition pruning makes that read cost
∝ new data), run the engine on the slice, advance the mark only on
success. The reference has no incremental mode — its per-run
orchestration (core/expectations.py) always validates the full input —
but it DOES persist per-table properties with retry
(sinks/utils/writer.py:46-128), which is exactly the durable slot a
watermark needs; we reuse that mechanism.

The watermark column must be monotonically increasing with arrival
(a date/hour partition column, an ingest batch id). Late rows below the
mark are the caller's contract to prevent — or to sweep separately with
a periodic full run.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .engine import DQEngine
from .rules import RuleSet
from .state import DQConfig, DQResult

WATERMARK_PROP = "spark_expectations.dq_watermark"


def get_watermark(spark: SparkSession, state_table: str) -> Optional[str]:
    """Stored watermark, or None when there is none — INCLUDING when the
    state table itself does not exist yet (the documented pattern keys
    state off the stats table, which the FIRST engine run creates; a
    missing table must mean 'full pass', not a crash)."""
    from ..sinks.writer import get_table_properties

    try:
        return get_table_properties(spark, state_table).get(WATERMARK_PROP)
    except Exception:  # TABLE_OR_VIEW_NOT_FOUND on bootstrap
        if spark.catalog.tableExists(state_table):
            raise
        return None


def set_watermark(spark: SparkSession, state_table: str, value: str) -> None:
    from ..sinks.writer import set_table_properties

    set_table_properties(spark, state_table, {WATERMARK_PROP: value})


def run_incremental(
    config: DQConfig,
    rules: RuleSet,
    df: DataFrame,
    watermark_col: str,
    state_table: str,
    *,
    spark: Optional[SparkSession] = None,
) -> Optional[DQResult]:
    """Run the DQ engine on rows with ``watermark_col`` strictly above the
    stored mark, then advance the mark to the slice's max on success.

    * the filter is a plain predicate on ``watermark_col`` — on a table
      partitioned by it, Catalyst prunes old partitions and the scan
      reads only new data;
    * returns None (no engine run, mark untouched) when nothing is new;
    * a failed run (DQ fail action raises) leaves the mark where it was,
      so the next cycle re-validates the same slice — at-least-once
      semantics, no silent skips.

    ``state_table`` is any registered table whose TBLPROPERTIES hold the
    mark (typically the stats table — it already exists per product).
    """
    spark = spark or df.sparkSession
    mark = get_watermark(spark, state_table)
    fresh = df if mark is None else df.filter(F.col(watermark_col) > mark)

    bounds = fresh.agg(F.max(watermark_col).alias("mx")).first()
    if bounds is None or bounds["mx"] is None:
        return None
    result = DQEngine(config).run(fresh, rules, spark)
    set_watermark(spark, state_table, str(bounds["mx"]))
    return result
