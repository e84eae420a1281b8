"""Distribution-drift detection between two snapshots of a column.

Agg rules assert point statistics (mean, counts); drift detection
catches the failures those miss — the mean holds while the shape moves.
``psi`` computes the Population Stability Index over a fixed-width
histogram:

    PSI = Σ_buckets (p_i − q_i) · ln(p_i / q_i)

with the standard reading: < 0.1 stable, 0.1–0.25 drifting, > 0.25
shifted. The reference engine has no drift operator (its agg_dq stops at
scalar assertions); this pairs with ``snapshot_diff`` (row-level) as the
distribution-level reconciliation.

Scale shape: each side is ONE partial-aggregated histogram pass
(width_bucket folds into the scan projection — same plan as the
`lineitem_price_histogram` catalog query), and the PSI combine runs on
bucket-count rows (≤ bins + 2 per side). Nothing data-scale crosses the
driver; the two scans don't shuffle row data at all, only bucket counts.
Fixed explicit bounds (not per-run quantiles) keep PSI comparable across
runs and engines — pick them once from a profiling pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Laplace-style floor for empty buckets — PSI's ln(p/q) is undefined at
#: zero; the standard practice is clamping proportions to a small epsilon.
_EPS = 1e-6


def bucket_proportions(
    df: DataFrame,
    col: str,
    *,
    lo: float,
    hi: float,
    bins: int,
    out: str = "prop",
) -> DataFrame:
    """(bucket, proportion) via width_bucket: bucket 0 = below ``lo``,
    ``bins``+1 = at/above ``hi`` — out-of-range mass is counted, not
    dropped, so range drift itself is visible."""
    b = F.width_bucket(F.col(col), F.lit(float(lo)), F.lit(float(hi)),
                       F.lit(int(bins)))
    counts = df.groupBy(b.alias("bucket")).agg(F.count(F.lit(1)).alias("_n"))
    total = counts.agg(F.sum("_n").alias("_t"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select("bucket", (F.col("_n") / F.col("_t")).alias(out))
    )


def psi(
    baseline: DataFrame,
    current: DataFrame,
    col: str,
    *,
    lo: float,
    hi: float,
    bins: int = 10,
) -> DataFrame:
    """One-row frame: (psi, n_buckets_compared). Full-outer join on
    bucket id so mass appearing in a bucket the other side lacks is
    penalized (clamped to epsilon), not ignored."""
    p = bucket_proportions(baseline, col, lo=lo, hi=hi, bins=bins, out="p")
    q = bucket_proportions(current, col, lo=lo, hi=hi, bins=bins, out="q")
    j = p.join(q, "bucket", "full_outer").select(
        F.greatest(F.coalesce(F.col("p"), F.lit(0.0)), F.lit(_EPS)).alias("p"),
        F.greatest(F.coalesce(F.col("q"), F.lit(0.0)), F.lit(_EPS)).alias("q"),
    )
    term = (F.col("p") - F.col("q")) * F.log(F.col("p") / F.col("q"))
    return j.agg(
        F.sum(term).alias("psi"),
        F.count(F.lit(1)).alias("n_buckets_compared"),
    )
