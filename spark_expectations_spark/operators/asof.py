"""As-of and range joins — temporal operators Spark's API lacks.

Not in the reference (its joins are rule-scale equi-joins); listed here
as first-class custom operators for event/feature pipelines (join each
event to the latest prior snapshot; band a metric into an interval).

Both avoid the naive O(n·m) theta join:

* ``asof_join`` is a union + one window pass — ONE shuffle keyed by the
  join key, no join node at all. The classic sort-merge-as-of expressed
  declaratively so Catalyst/Tungsten run it codegen'd.
* ``range_join`` bucketizes the interval side so the probe is an
  equi-join on (bucket) — each point falls in exactly one bucket, so no
  post-join dedup is needed.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str],
    direction: str = "backward",
    tolerance: Optional[int] = None,
    suffix: str = "_asof",
) -> DataFrame:
    """For each left row, attach the latest right row at-or-before its
    timestamp (``backward``; ``forward`` = earliest at-or-after).

    Implementation: tag sides, union on (keys, ts), and carry right
    values forward with ``last(..., ignorenulls=True)`` over a
    key-partitioned, ts-ordered window — one shuffle total; at equal
    timestamps the right row sorts first so it is visible to the left
    row (inclusive match, duckdb/pandas ``merge_asof`` semantics).
    ``tolerance`` (same units as the ts columns) nulls out matches
    further back/ahead than the bound. Value columns that clash with a
    left column get ``suffix``.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    keys = list(on)
    out_names = {
        c: c + suffix if c in left.columns else c for c in value_cols
    }
    ts_name = "__asof_ts"
    matched_ts = "__asof_matched_ts"

    l_tagged = left.select(
        "*",
        F.col(left_ts).alias(ts_name),
        F.lit(1).alias("__asof_side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(out_names[c])
          for c in value_cols],
        F.lit(None).cast(right.schema[right_ts].dataType).alias(matched_ts),
    )
    r_tagged = right.select(
        *keys,
        F.col(right_ts).alias(ts_name),
        F.lit(0).alias("__asof_side"),
        *[F.col(c).alias(out_names[c]) for c in value_cols],
        F.col(right_ts).alias(matched_ts),
    )
    u = l_tagged.unionByName(r_tagged, allowMissingColumns=True)

    if direction == "backward":
        w = (Window.partitionBy(*keys)
             .orderBy(F.col(ts_name).asc(), F.col("__asof_side").asc())
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        fill = F.last
    else:
        w = (Window.partitionBy(*keys)
             .orderBy(F.col(ts_name).asc(), F.col("__asof_side").desc())
             .rowsBetween(Window.currentRow, Window.unboundedFollowing))
        fill = F.first

    filled = u.select(
        *[c for c in u.columns if c not in (*out_names.values(), matched_ts)],
        *[fill(F.col(v), ignorenulls=True).over(w).alias(v)
          for v in out_names.values()],
        fill(F.col(matched_ts), ignorenulls=True).over(w).alias(matched_ts),
    ).filter(F.col("__asof_side") == 1)

    if tolerance is not None:
        gap = (F.col(ts_name) - F.col(matched_ts) if direction == "backward"
               else F.col(matched_ts) - F.col(ts_name))
        keep = F.col(matched_ts).isNotNull() & (gap <= tolerance)
        filled = filled.select(
            *[c for c in filled.columns if c not in out_names.values()],
            *[F.when(keep, F.col(v)).alias(v) for v in out_names.values()],
        )
    return filled.drop(ts_name, matched_ts, "__asof_side")


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    *,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: float,
    extra_keys: Sequence[str] = (),
) -> DataFrame:
    """Inner-join each point row to interval rows with ``lo <= point < hi``.

    The interval side explodes into the fixed-width buckets it spans;
    each point computes its single bucket — the join is then an
    equi-join on (extra_keys, bucket) plus the residual range filter.
    A point's bucket is unique, so no dedup pass is needed. Shuffle
    volume is |points| + Σ interval_spans/bucket_width, never |points| ×
    |intervals|. Choose ``bucket_width`` near the median interval width.
    """
    bucket = "__range_bucket"
    p = points.withColumn(
        bucket, F.floor(F.col(point_col) / F.lit(bucket_width)).cast("long"))
    hi_bucket = F.floor(F.col(hi_col) / F.lit(bucket_width)).cast("long")
    # upper bound is exclusive: an interval ending exactly on a bucket
    # boundary does not reach into that bucket
    span = F.sequence(
        F.floor(F.col(lo_col) / F.lit(bucket_width)).cast("long"),
        F.when(F.col(hi_col) == hi_bucket * F.lit(bucket_width),
               hi_bucket - 1).otherwise(hi_bucket),
    )
    i = intervals.withColumn(bucket, F.explode(span))
    cond = [p[bucket] == i[bucket]] + [p[k] == i[k] for k in extra_keys]
    joined = p.join(i, cond, "inner").where(
        (F.col(point_col) >= F.col(lo_col)) & (F.col(point_col) < F.col(hi_col)))
    return joined.drop(bucket)


def time_weighted_mean(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    group_cols: Sequence[str],
) -> DataFrame:
    """Per-group time-weighted average over IRREGULARLY sampled values
    — the metric a plain ``avg`` gets wrong whenever sampling density
    correlates with the value (a sensor that reports more often when
    busy, a price that ticks on volatility): each sample holds until
    the group's next sample (zero-order hold) and is weighted by its
    holding duration. Returns one row per group:

        (n_intervals, span_ns, twa)

    with ``twa = Σ v_i·Δt_i / Σ Δt_i`` over consecutive sample pairs —
    the time unit cancels in the ratio, so Δt stays in the EXACT
    integer nanoseconds of ``ts_col`` (the events-table convention)
    and ``span_ns = Σ Δt_i`` is an exact long, not a rounded float.
    ``ts_col`` must be an integral-ns long (or int/short) — a
    ``TimestampType`` is normalized to ns via ``unix_micros·1000``
    (µs precision, exactly representable); any other type raises.
    A group's LAST sample has no successor and contributes no interval
    — groups with a single sample therefore emit no row (an average
    over zero duration has no value); groups needing an
    observation-end convention should append a closing row first.
    TIED timestamps within a group make the hold assignment among the
    tied samples ORDER-DEPENDENT (one of them gets the nonzero span to
    the next distinct timestamp) — disambiguate upstream (drop dups or
    add a deterministic epsilon) when a source can emit same-instant
    samples; the span and interval count stay deterministic either
    way, only which tied VALUE holds varies.

    Scale shape: one group-partitioned ``lead`` window (the sort is
    per group) + ONE map-side-combined groupBy — samples shuffle once,
    keyed by group. Float contract: only ``twa`` is floating (a ratio
    of double sums); round it to 9dp (+0.0) for cross-engine
    comparison."""
    gc = list(group_cols)
    if not gc:
        raise ValueError("group_cols must name at least one column "
                         "(an ungrouped TWA is a single-task sort)")
    if any(c in ("n_intervals", "span_ns", "twa") for c in gc):
        raise ValueError("group_cols collide with the output columns")
    # the exact-ns span arithmetic needs an integral ts: lead(ts)-ts
    # on a TimestampType is a day-time INTERVAL, which breaks the
    # sum/ratio below (or silently changes units). Normalize
    # timestamps to ns via unix_micros, and reject anything else.
    ts_type = df.schema[ts_col].dataType
    if isinstance(ts_type, T.TimestampType):
        ts = (F.unix_micros(F.col(ts_col)) * F.lit(1000)).alias("_ts")
    elif isinstance(ts_type, (T.LongType, T.IntegerType, T.ShortType)):
        ts = F.col(ts_col).cast("long").alias("_ts")
    else:
        raise TypeError(
            f"ts_col {ts_col!r} must be an integer-nanosecond long or "
            f"a TimestampType (got {ts_type.simpleString()}); cast "
            "upstream — the span contract is exact integer ns")
    w = Window.partitionBy(*gc).orderBy("_ts")
    dt = F.lead("_ts").over(w) - F.col("_ts")
    v = F.col(value_col).cast("double")
    stepped = (df.select(*gc, ts, v.alias("_v"))
               .select(*gc, F.col("_v"), dt.alias("_dt"))
               .filter(F.col("_dt").isNotNull()))
    return (stepped.groupBy(*gc)
            .agg(F.count(F.lit(1)).alias("n_intervals"),
                 F.sum("_dt").alias("span_ns"),
                 (F.sum(F.col("_v") * F.col("_dt").cast("double"))
                  / F.sum(F.col("_dt").cast("double"))).alias("twa")))
