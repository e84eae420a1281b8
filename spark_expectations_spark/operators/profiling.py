"""Table profiling: per-column statistics in ONE aggregation pass.

The natural companion to declarative DQ — profile output is exactly what
seeds rule thresholds (null ratios → null_validation, ranges →
between-rules, distinct counts → uniqueness candidates). All columns'
statistics are fused into a single ``df.agg`` (4 expressions per column),
so profiling a 100-column table is still one scan with map-side partial
aggregation; distinct counts use HyperLogLog (``approx_count_distinct``)
to stay one-pass — exact distinct would force a shuffle per column.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import NumericType


def profile_table(
    df: DataFrame,
    columns: Optional[Sequence[str]] = None,
    *,
    approx_rsd: float = 0.05,
    exact_distinct: bool = False,
) -> DataFrame:
    """One row per column: (column, n_rows, n_nulls, null_pct,
    n_distinct, min_value, max_value) — numeric min/max as doubles,
    others null.

    ``exact_distinct=True`` switches HLL to ``count(distinct)`` — exact
    but each column becomes an Expand branch; keep it for test-scale or
    oracle comparisons.
    """
    cols = list(columns) if columns else list(df.columns)
    types = dict(df.dtypes)
    numeric = {f.name for f in df.schema.fields
               if isinstance(f.dataType, NumericType)}

    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, c in enumerate(cols):
        col = F.col(c)
        aggs.append(F.sum(col.isNull().cast("long")).alias(f"__null{i}"))
        aggs.append(
            (F.count_distinct(col) if exact_distinct
             else F.approx_count_distinct(col, approx_rsd)).alias(f"__dist{i}"))
        if c in numeric:
            aggs.append(F.min(col).cast("double").alias(f"__min{i}"))
            aggs.append(F.max(col).cast("double").alias(f"__max{i}"))

    agg = df.agg(*aggs)
    structs = []
    for i, c in enumerate(cols):
        is_num = c in numeric
        structs.append(F.struct(
            F.lit(c).alias("column"),
            F.lit(types[c]).alias("dtype"),
            F.col("__n").alias("n_rows"),
            F.col(f"__null{i}").alias("n_nulls"),
            F.round(F.col(f"__null{i}") / F.greatest(F.col("__n"), F.lit(1))
                    * 100, 4).alias("null_pct"),
            F.col(f"__dist{i}").alias("n_distinct"),
            (F.col(f"__min{i}") if is_num
             else F.lit(None).cast("double")).alias("min_value"),
            (F.col(f"__max{i}") if is_num
             else F.lit(None).cast("double")).alias("max_value"),
        ))
    return agg.select(F.explode(F.array(*structs)).alias("p")).select("p.*")


def suggest_rules(
    profile: DataFrame,
    *,
    product_id: str,
    table_name: str,
    null_pct_max: float = 0.0,
) -> list:
    """Draft DQ rules from a profile (driver-side, rule-scale): columns
    with null_pct <= ``null_pct_max`` get a not-null rule; numeric
    columns get a between-rule over the observed range. Drafts carry
    tag='suggested' so pipelines can review before activating."""
    from ..core.rules import Rule

    out = []
    for r in profile.collect():
        c = r["column"]
        if r["null_pct"] is not None and r["null_pct"] <= null_pct_max:
            out.append(Rule(product_id, table_name, "row_dq",
                            f"{c}_not_null", c, f"{c} is not null",
                            tag="suggested"))
        if r["min_value"] is not None and r["max_value"] is not None:
            out.append(Rule(product_id, table_name, "row_dq",
                            f"{c}_range", c,
                            f"{c} between {r['min_value']} and {r['max_value']}",
                            tag="suggested"))
    return out


def key_candidates(
    df: DataFrame,
    cols: Sequence[str],
    *,
    rsd: float = 0.02,
) -> DataFrame:
    """Which of ``cols`` (or their pairs) could be a primary key.

    One aggregation job computes approx-distinct for every candidate plus
    the row count; a candidate is flagged when distinct ≈ rows (within
    the HLL error bound). Approximate on purpose — at 100 TB an exact
    countDistinct per candidate is a shuffle each, while HLL rides one
    partial-aggregated pass. Confirm a flagged key exactly with the
    `functions.unique` rule before enforcing it.
    """
    aggs = [F.count(F.lit(1)).alias("_rows")]
    for c in cols:
        aggs.append(F.approx_count_distinct(c, rsd).alias(f"_d_{c}"))
    row = df.agg(*aggs).first()
    n = row["_rows"]
    spark = df.sparkSession
    out = [(c, int(row[f"_d_{c}"]), int(n),
            bool(n > 0 and abs(row[f"_d_{c}"] - n) <= 2 * rsd * n))
           for c in cols]
    from ..plans import local_frame
    return local_frame(
        spark, out, "column string, approx_distinct long, n_rows long, "
                    "candidate_key boolean")


def fk_containment(
    child: DataFrame,
    parent: DataFrame,
    child_key: str,
    parent_key: str,
) -> DataFrame:
    """Referential-integrity profile: what fraction of child keys exist in
    the parent. 1.0 == clean FK; the orphan count sizes the repair job.

    Shape: distinct child keys (one shuffle, map-side combined) left-anti
    parent keys — orphans only; the parent side is its distinct key set.
    This is the profiling twin of the query_dq referential rule (which
    asserts; this measures).
    """
    ck = child.select(F.col(child_key).alias("k")).filter(F.col("k").isNotNull())
    pk = parent.select(F.col(parent_key).alias("k")).distinct()
    total = ck.distinct()
    orphans = total.join(pk, "k", "left_anti")
    return (
        total.agg(F.count(F.lit(1)).alias("_t"))
        .crossJoin(orphans.agg(F.count(F.lit(1)).alias("_o")))
        .select(
            F.col("_t").alias("distinct_child_keys"),
            F.col("_o").alias("orphan_keys"),
            F.round(1.0 - F.col("_o") / F.col("_t"), 6).alias("containment"),
        )
    )


def correlation_matrix(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Pairwise Pearson correlations over numeric columns in ONE
    aggregation job — k·(k−1)/2 ``corr`` aggregates ride a single scan
    (map-side partial moments), so profiling 10 columns costs one pass,
    not 45. Returns a (col_a, col_b, corr) frame, col_a < col_b by
    position; the result is pairs-sized (driver-assembled, like the
    rest of the profiling reports)."""
    if len(cols) < 2:
        raise ValueError("need at least two columns")
    aggs = [F.corr(a, b).alias(f"__c_{i}_{j}")
            for i, a in enumerate(cols)
            for j, b in enumerate(cols) if i < j]
    row = df.agg(*aggs).first()
    out = [(a, b, row[f"__c_{i}_{j}"])
           for i, a in enumerate(cols)
           for j, b in enumerate(cols) if i < j]
    from ..plans import local_frame
    return local_frame(
        df.sparkSession, out, "col_a string, col_b string, corr double")


def cohens_kappa(
    df: DataFrame,
    label_a: str,
    label_b: str,
) -> DataFrame:
    """Inter-annotator agreement for two labelers over the same items —
    the label-quality gate before trusting human (or LLM-judge)
    annotations as training targets: Cohen's kappa
    ``(p_o − p_e) / (1 − p_e)`` where ``p_o`` is observed agreement and
    ``p_e`` the agreement expected from each rater's marginal label
    distribution. Returns ONE row ``(n, p_o, p_e, kappa)``; rows where
    either label is NULL are dropped (unlabeled items carry no
    agreement evidence). ``kappa`` is NULL when ``p_e = 1`` (both
    raters constant and identical — agreement is degenerate, not
    perfect; Cohen's estimator is undefined there).

    Scale shape: ONE map-side-combined groupBy over the (label_a,
    label_b) confusion key — label-cardinality rows — then a driver-free
    fold of that tiny frame into the marginals and the scalar; nothing
    corpus-sized leaves the executors (the calibration-report /
    fold-bucket histogram pattern)."""
    a = F.col(label_a).cast("string")
    b = F.col(label_b).cast("string")
    conf = (df.filter(a.isNotNull() & b.isNotNull())
            .groupBy(a.alias("__a"), b.alias("__b"))
            .agg(F.count(F.lit(1)).alias("__c")))
    folded = conf.agg(
        F.sum("__c").alias("n"),
        F.sum(F.when(F.col("__a") == F.col("__b"), F.col("__c"))
              .otherwise(F.lit(0))).alias("__agree"))
    # marginals: per-label totals for each rater, joined on label —
    # label-cardinality frames, p_e = Σ_l (na_l/n)·(nb_l/n)
    ma = conf.groupBy(F.col("__a").alias("__l")).agg(
        F.sum("__c").alias("__na"))
    mb = conf.groupBy(F.col("__b").alias("__l")).agg(
        F.sum("__c").alias("__nb"))
    pe = (ma.join(mb, "__l")
          .agg(F.sum(F.col("__na").cast("double") * F.col("__nb"))
               .alias("__pe_num")))
    out = folded.crossJoin(F.broadcast(pe))
    p_o = F.col("__agree") / F.col("n")
    p_e = F.coalesce(F.col("__pe_num"), F.lit(0.0)) \
        / (F.col("n").cast("double") * F.col("n"))
    return out.select(
        "n", p_o.alias("p_o"), p_e.alias("p_e"),
        F.when(p_e < 1.0, (p_o - p_e) / (F.lit(1.0) - p_e))
         .alias("kappa"))


def krippendorff_alpha(
    df: DataFrame,
    unit_col: str,
    label_col: str,
    *,
    metric: str = "nominal",
    ci: bool = False,
    replicas: int = 40,
    ci_alpha: float = 0.05,
    digits: int = 6,
    salt: str = "kalpha",
) -> DataFrame:
    """Krippendorff's alpha over LONG-form ratings — one row per
    (unit, rating). The multi-rater upgrade of :func:`cohens_kappa`:
    any number of raters, raters need not be identified (alpha is
    rater-agnostic by construction), and MISSING ratings are handled
    by the math instead of dropping the unit — exactly the shape of an
    LLM-judge ensemble where each item gets 2-5 verdicts. Returns ONE
    row ``(n_units, n_ratings, d_o, d_e, alpha)``.

    ``metric`` selects the disagreement distance δ²(c, k) between two
    rating values (Krippendorff 2011, "Computing Krippendorff's
    Alpha-Reliability"):

    - ``"nominal"`` — δ² = 1 for c ≠ k: categorical labels.
    - ``"interval"`` — δ² = (c − k)²: numeric scores where distances
      are meaningful (the 1-5 scalar ratings LLM-judge ensembles
      emit). Ratings are cast to double; non-numeric ratings become
      NULL and are dropped as missing.
    - ``"ordinal"`` — δ² = (Σ_{g=c..k} n_g − (n_c + n_k)/2)² with
      ``n_g`` the rank marginals over pairable ratings: ordered
      categories where only the ranking matters. Ratings must be
      numeric-orderable (cast to double for ranking, same NULL rule).

    Derivation (coincidence-matrix form, collapsed to per-unit folds):
    units with fewer than 2 non-NULL ratings are unpairable and
    excluded; ``D_o = Σ_u [Σ_{pairs within u} δ²]/(m_u − 1)``;
    marginals over pairable ratings give ``D_e = [Σ_{pairs overall}
    δ²]/(n − 1)``; ``alpha = 1 − D_o/D_e``, NULL when ``D_e = 0``
    (every rating identical — agreement degenerate, matching kappa's
    convention). For nominal the per-unit pair mass folds to
    ``(m_u² − Σ_c n_uc²)``; for interval it folds to per-unit MOMENTS
    ``2(m_u·Σv² − (Σv)²)`` — no label grouping at all; ordinal keeps
    the explicit pair form over the rank-marginal cumulative sums.
    Every output is int-derived doubles when ratings are integers —
    bit-identical cross-engine, no rounding (per-unit divisions are by
    ``m_u − 1``; with ≤3 raters that is 1 or 2, exact in binary).

    Scale shape: one (unit, label) groupBy (map-side combined), one
    unit-keyed fold to per-unit masses, one label-keyed marginal agg —
    the largest intermediate is units × labels-per-unit rows (ordinal
    adds a unit-keyed self-join bounded by ratings-per-unit² and a
    broadcast label-cardinality² δ² table); the final fold is over
    label-cardinality and unit-count frames, and only 1-row aggregates
    cross to the driver side of the plan.

    ``ci=True`` adds a UNIT-RESAMPLING Poisson bootstrap (Krippendorff
    recommends bootstrap CIs for alpha; units are the exchangeable
    sampling unit): replica ``b`` weights every pairable UNIT by the
    same deterministic md5-derived Poisson(1) draw
    :func:`bootstrap_ci` uses (unit ids are unique by construction of
    the per-unit fold, so no uniqueness caveat), recomputing BOTH
    D_o^b and D_e^b from the reweighted per-unit masses and label
    marginals. For the ordinal metric the δ² distance table is HELD
    FIXED at its full-sample values (the standard approximation —
    re-deriving rank distances per replica would change the metric
    itself, not just the sample). Output row extends to ``(…, se,
    ci_lo, ci_hi, replicas)``: replica-alpha population SD and the
    ``floor(ci_alpha/2·B)`` percentile pair, rounded to ``digits``;
    degenerate replicas (D_e^b ≤ 0 or < 2 resampled ratings) are
    dropped and ``replicas`` reports the count actually used (raises
    if fewer than 2 survive). Cost: the point-estimate plan plus one
    B-accumulator agg over the UNITS-scale frame and one
    labels×B collect (model-scale), never a corpus×B blow-up."""
    if metric not in ("nominal", "interval", "ordinal"):
        raise ValueError(
            f"metric must be nominal/interval/ordinal, got {metric!r}")
    if ci:
        return _alpha_with_ci(df, unit_col, label_col, metric=metric,
                              replicas=replicas, ci_alpha=ci_alpha,
                              digits=digits, salt=salt)
    if metric == "interval":
        return _alpha_interval(df, unit_col, label_col)
    if metric == "ordinal":
        return _alpha_ordinal(df, unit_col, label_col)
    u = F.col(unit_col)
    lab = F.col(label_col).cast("string")
    ul = (df.filter(u.isNotNull() & lab.isNotNull())
          .groupBy(u.alias("__u"), lab.alias("__l"))
          .agg(F.count(F.lit(1)).alias("__c")))
    return _alpha_nominal_from_ul(ul)


def _alpha_nominal_from_ul(ul: DataFrame) -> DataFrame:
    """Nominal-metric alpha from a prebuilt ``(__u, __l, __c)`` count
    frame — split out so the CI path can feed the SAME (persisted)
    frame to the point estimate instead of re-deriving it from the
    raw ratings (r16: the un-shared point plan planted the ratings
    scan 10×)."""
    per_unit = (ul.groupBy("__u")
                .agg(F.sum("__c").alias("__m"),
                     F.sum(F.col("__c") * F.col("__c")).alias("__s2"))
                .filter(F.col("__m") >= 2))
    do = per_unit.agg(
        F.count(F.lit(1)).alias("n_units"),
        F.sum("__m").alias("n_ratings"),
        F.sum((F.col("__m") * F.col("__m") - F.col("__s2"))
              .cast("double") / (F.col("__m") - 1)).alias("d_o"))
    marg = (ul.join(per_unit.select("__u"), "__u", "left_semi")
            .groupBy("__l").agg(F.sum("__c").alias("__nl")))
    tot = marg.agg(F.sum("__nl").alias("__n"),
                   F.sum(F.col("__nl") * F.col("__nl")).alias("__s2l"))
    d_e = ((F.col("__n") * F.col("__n") - F.col("__s2l")).cast("double")
           / (F.col("__n") - 1))
    return _alpha_final(do, tot, d_e)


def _alpha_final(do, tot, d_e) -> DataFrame:
    """Shared (n_units, n_ratings, d_o, d_e, alpha) assembly for the
    three :func:`krippendorff_alpha` metrics."""
    out = do.crossJoin(F.broadcast(tot))
    return out.select(
        F.coalesce("n_units", F.lit(0)).alias("n_units"),
        F.coalesce("n_ratings", F.lit(0)).alias("n_ratings"),
        F.coalesce("d_o", F.lit(0.0)).alias("d_o"),
        d_e.alias("d_e"),
        F.when(d_e > 0.0,
               F.lit(1.0) - F.coalesce("d_o", F.lit(0.0)) / d_e)
         .alias("alpha"))


def _alpha_interval(df: DataFrame, unit_col: str,
                    label_col: str) -> DataFrame:
    """Interval-metric alpha: δ² = (c−k)² folds to per-unit MOMENTS —
    ``Σ_{i≠j}(v_i−v_j)² = 2(m·Σv² − (Σv)²)`` — so D_o needs only a
    per-unit (count, sum, sum-of-squares) agg and D_e the same moments
    over all pairable ratings. No label grouping anywhere."""
    u = F.col(unit_col)
    v = F.col(label_col).cast("double")
    per_unit = (df.filter(u.isNotNull() & v.isNotNull())
                .groupBy(u.alias("__u"))
                .agg(F.count(F.lit(1)).alias("__m"),
                     F.sum(v).alias("__s1"),
                     F.sum(v * v).alias("__s2"))
                .filter(F.col("__m") >= 2))
    return _alpha_interval_from_pu(per_unit)


def _alpha_interval_from_pu(per_unit: DataFrame) -> DataFrame:
    """Interval-metric alpha from a prebuilt per-unit moments frame
    ``(__u, __m, __s1, __s2)`` (extra columns ignored) — the CI path
    feeds its persisted frame here (see :func:`_alpha_nominal_from_ul`)."""
    do = per_unit.agg(
        F.count(F.lit(1)).alias("n_units"),
        F.sum("__m").alias("n_ratings"),
        F.sum(F.lit(2.0) * (F.col("__m") * F.col("__s2")
                            - F.col("__s1") * F.col("__s1"))
              / (F.col("__m") - 1)).alias("d_o"))
    tot = per_unit.agg(F.sum("__m").alias("__n"),
                       F.sum("__s1").alias("__t1"),
                       F.sum("__s2").alias("__t2"))
    d_e = (F.lit(2.0) * (F.col("__n") * F.col("__t2")
                         - F.col("__t1") * F.col("__t1"))
           / (F.col("__n") - 1))
    return _alpha_final(do, tot, d_e)


def _alpha_ordinal(df: DataFrame, unit_col: str,
                   label_col: str) -> DataFrame:
    """Ordinal-metric alpha: δ²(c,k) = (Σ_{g=c..k} n_g − (n_c+n_k)/2)²
    over the rank marginals of pairable ratings. The δ² table is
    label-cardinality² (broadcast); the per-unit pair mass comes from
    a unit-keyed self-join bounded by ratings-per-unit²."""
    u = F.col(unit_col)
    v = F.col(label_col).cast("double")
    ul = (df.filter(u.isNotNull() & v.isNotNull())
          .groupBy(u.alias("__u"), v.alias("__v"))
          .agg(F.count(F.lit(1)).alias("__c")))
    return _alpha_ordinal_from_ul(ul)


def _alpha_ordinal_from_ul(ul: DataFrame) -> DataFrame:
    """Ordinal-metric alpha from a prebuilt ``(__u, __v, __c)`` count
    frame (see :func:`_alpha_nominal_from_ul` for why the split
    exists)."""
    per_unit = (ul.groupBy("__u")
                .agg(F.sum("__c").alias("__m"))
                .filter(F.col("__m") >= 2))
    ul = ul.join(per_unit, "__u")          # pairable units only
    marg = ul.groupBy("__v").agg(F.sum("__c").alias("__nl"))
    # label-cardinality frame: the no-partition window is over the
    # marginals only, never corpus rows (same shape as a reliability-
    # diagram bucket table)
    wcum = (Window.orderBy("__v")
            .rowsBetween(Window.unboundedPreceding, 0))
    cum = marg.withColumn("__cum", F.sum("__nl").over(wcum))
    a = cum.select(F.col("__v").alias("__va"),
                   F.col("__nl").alias("__na"),
                   F.col("__cum").alias("__ca"))
    b = cum.select(F.col("__v").alias("__vb"),
                   F.col("__nl").alias("__nb"),
                   F.col("__cum").alias("__cb"))
    # δ for va < vb: (cum_b − cum_a + n_a) − (n_a + n_b)/2
    delta = (F.col("__cb") - F.col("__ca") + F.col("__na")
             - (F.col("__na") + F.col("__nb")) / 2)
    d2 = (a.join(b, F.col("__va") < F.col("__vb"))
          .select("__va", "__vb", (delta * delta).alias("__d2")))
    pairs = (ul.alias("x").join(ul.alias("y"), "__u")
             .filter(F.col("x.__v") < F.col("y.__v"))
             .select(F.col("__u"),
                     F.col("x.__v").alias("__va"),
                     F.col("y.__v").alias("__vb"),
                     (F.lit(2.0) * F.col("x.__c") * F.col("y.__c"))
                     .alias("__cc"))
             .join(F.broadcast(d2), ["__va", "__vb"]))
    per_unit_mass = (pairs.groupBy("__u")
                     .agg(F.sum(F.col("__cc") * F.col("__d2"))
                          .alias("__mass")))
    do = (per_unit.join(per_unit_mass, "__u", "left")
          .agg(F.count(F.lit(1)).alias("n_units"),
               F.sum("__m").alias("n_ratings"),
               F.sum(F.coalesce("__mass", F.lit(0.0))
                     / (F.col("__m") - 1)).alias("d_o")))
    etot = (marg.alias("p").join(
        marg.alias("q"),
        F.col("p.__v") < F.col("q.__v"))
        .select(F.col("p.__v").alias("__va"),
                F.col("q.__v").alias("__vb"),
                (F.lit(2.0) * F.col("p.__nl") * F.col("q.__nl"))
                .alias("__cc"))
        .join(F.broadcast(d2), ["__va", "__vb"])
        .agg(F.sum(F.col("__cc") * F.col("__d2")).alias("__e")))
    tot = (marg.agg(F.sum("__nl").alias("__n"))
           .crossJoin(F.broadcast(etot)))
    d_e = F.coalesce("__e", F.lit(0.0)) / (F.col("__n") - 1)
    return _alpha_final(do, tot, d_e)


def _alpha_with_ci(df: DataFrame, unit_col: str, label_col: str, *,
                   metric: str, replicas: int, ci_alpha: float,
                   digits: int, salt: str) -> DataFrame:
    """Unit-resampling Poisson bootstrap around
    :func:`krippendorff_alpha` — see its ``ci=True`` contract. Replica
    alpha_b = 1 − D_o^b/D_e^b with every pairable unit weighted by its
    deterministic Poisson(1) draw; the labels×B marginal table and the
    (ordinal) δ² table are collected driver-side (both model-scale,
    like bootstrap_ci's replica means).

    The point estimate, the weighted D_o aggregate, and the replica
    marginals ride ONE driver action (see :func:`_alpha_ci_replicas`
    for the fusion and the measured adjudication); the ordinal metric
    adds one model-scale collect for its δ² table."""
    if replicas < 2:
        raise ValueError("replicas must be >= 2")
    if not 0.0 < ci_alpha < 1.0:
        raise ValueError("ci_alpha must be in (0, 1)")
    u = F.col(unit_col)
    B = replicas
    wt_sum = lambda expr: [  # noqa: E731
        F.expr(f"sum(__wt{b} * ({expr}))").alias(f"__a{b}")
        for b in range(B)]

    if metric == "interval":
        v = F.col(label_col).cast("double")
        per_unit = (df.filter(u.isNotNull() & v.isNotNull())
                    .groupBy(u.alias("__u"))
                    .agg(F.count(F.lit(1)).alias("__m"),
                         F.sum(v).alias("__s1"),
                         F.sum(v * v).alias("__s2"))
                    .filter(F.col("__m") >= 2)
                    .withColumn(
                        "__mass",
                        F.lit(2.0) * (F.col("__m") * F.col("__s2")
                                      - F.col("__s1") * F.col("__s1"))
                        / (F.col("__m") - 1)))
        base = per_unit
    else:
        val = (F.col(label_col).cast("string") if metric == "nominal"
               else F.col(label_col).cast("double"))
        ul = (df.filter(u.isNotNull() & val.isNotNull())
              .groupBy(u.alias("__u"), val.alias("__v"))
              .agg(F.count(F.lit(1)).alias("__c")))
        base = ul
    alphas, point = _alpha_ci_replicas(
        metric=metric, base=base, B=B, salt=salt, wt_sum=wt_sum)

    if len(alphas) < 2:
        raise ValueError(
            "krippendorff_alpha ci: fewer than 2 non-degenerate "
            "bootstrap replicas — input too small for a meaningful CI")
    alphas.sort()
    used = len(alphas)
    mbar = sum(alphas) / used
    se = (sum((x - mbar) ** 2 for x in alphas) / used) ** 0.5
    lo_idx = int((ci_alpha / 2) * used)
    out = (int(point["n_units"]), int(point["n_ratings"]),
           point["d_o"], point["d_e"], point["alpha"],
           float(round(se, digits)) + 0.0,
           float(round(alphas[lo_idx], digits)) + 0.0,
           float(round(alphas[used - 1 - lo_idx], digits)) + 0.0,
           used)
    from ..plans import local_frame
    return local_frame(
        df.sparkSession,
        [out], "n_units long, n_ratings long, d_o double, d_e double, "
               "alpha double, se double, ci_lo double, ci_hi double, "
               "replicas int")


def _alpha_ci_replicas(*, metric: str, base: DataFrame, B: int,
                       salt: str, wt_sum):
    """Point estimate + replica alphas for :func:`_alpha_with_ci`.

    The point estimate's 1-row frame and the weighted-D_o 1-row
    aggregate are crossJoined (broadcast) onto the replica-marginals
    frame so ALL of them ride ONE collect: as three separate driver
    actions each paid its own chain of sequential AQE stage-jobs
    (~21 jobs per call at the r16 profile) while recomputing the
    shared subtrees — which runtime exchange reuse already dedups
    WITHIN one action, and measurably does not pay for materializing
    across actions (persist/localCheckpoint variants both LOST the
    r16 A/B: 6.4 s / 4.4 s vs 3.6 s baseline — the cache machinery
    costs more than re-deriving the units-scale frames)."""
    if metric == "interval":
        per_unit = base
        pointdf = _alpha_interval_from_pu(per_unit)
        puw = _with_poisson_weights(
            per_unit, "__u", B, salt,
            keep=["__mass", "__m", "__s1", "__s2"])
        aggs = (wt_sum("__mass")
                + [F.expr(f"sum(__wt{b} * __m)").alias(f"__n{b}")
                   for b in range(B)]
                + [F.expr(f"sum(__wt{b} * __s1)").alias(f"__t1{b}")
                   for b in range(B)]
                + [F.expr(f"sum(__wt{b} * __s2)").alias(f"__t2{b}")
                   for b in range(B)])
        row = (puw.agg(*aggs)
               .crossJoin(F.broadcast(pointdf)).first())
        point = row
        alphas = []
        for b in range(B):
            n_b = row[f"__n{b}"]
            if n_b is None or n_b < 2:
                continue
            de = 2.0 * (n_b * row[f"__t2{b}"]
                        - row[f"__t1{b}"] * row[f"__t1{b}"]) / (n_b - 1)
            if de <= 0:
                continue
            alphas.append(1.0 - (row[f"__a{b}"] or 0.0) / de)
        return alphas, point

    # nominal and ordinal share the (unit, value) count frame and
    # the per-replica label marginals; they differ in the per-unit
    # pair mass and in how D_e folds over the marginals.
    ul = base
    if metric == "nominal":
        pointdf = _alpha_nominal_from_ul(
            ul.select(F.col("__u"), F.col("__v").alias("__l"),
                      F.col("__c")))
    else:
        pointdf = _alpha_ordinal_from_ul(ul)
    per_unit = (ul.groupBy("__u")
                .agg(F.sum("__c").alias("__m"),
                     F.sum(F.col("__c") * F.col("__c"))
                      .alias("__s2"))
                .filter(F.col("__m") >= 2))
    ulp = ul.join(per_unit.select("__u"), "__u", "left_semi")
    d2_map = {}
    if metric == "nominal":
        pu = per_unit.withColumn(
            "__mass",
            (F.col("__m") * F.col("__m") - F.col("__s2"))
            .cast("double") / (F.col("__m") - 1))
    else:
        # ordinal: fixed full-sample δ² table + per-unit pair mass
        marg = ulp.groupBy("__v").agg(F.sum("__c").alias("__nl"))
        wcum = (Window.orderBy("__v")
                .rowsBetween(Window.unboundedPreceding, 0))
        cum = marg.withColumn("__cum", F.sum("__nl").over(wcum))
        a = cum.select(F.col("__v").alias("__va"),
                       F.col("__nl").alias("__na"),
                       F.col("__cum").alias("__ca"))
        bb = cum.select(F.col("__v").alias("__vb"),
                        F.col("__nl").alias("__nb"),
                        F.col("__cum").alias("__cb"))
        delta = (F.col("__cb") - F.col("__ca") + F.col("__na")
                 - (F.col("__na") + F.col("__nb")) / 2)
        d2 = (a.join(bb, F.col("__va") < F.col("__vb"))
              .select("__va", "__vb", (delta * delta).alias("__d2"))
              .localCheckpoint(eager=False))
        d2_map = {(r["__va"], r["__vb"]): r["__d2"]
                  for r in d2.collect()}
        pairs = (ulp.alias("x").join(ulp.alias("y"), "__u")
                 .filter(F.col("x.__v") < F.col("y.__v"))
                 .select(F.col("__u"),
                         F.col("x.__v").alias("__va"),
                         F.col("y.__v").alias("__vb"),
                         (F.lit(2.0) * F.col("x.__c")
                          * F.col("y.__c")).alias("__cc"))
                 .join(F.broadcast(d2), ["__va", "__vb"]))
        mass = (pairs.groupBy("__u")
                .agg(F.sum(F.col("__cc") * F.col("__d2"))
                     .alias("__pm")))
        pu = (per_unit.join(mass, "__u", "left")
              .withColumn("__mass",
                          F.coalesce("__pm", F.lit(0.0))
                          / (F.col("__m") - 1)))
    puw = _with_poisson_weights(pu, "__u", B, salt,
                                keep=["__mass"])
    ulw = _with_poisson_weights(ulp, "__u", B, salt,
                                keep=["__v", "__c"])
    lrows = (ulw.groupBy("__v")
             .agg(*[F.expr(f"sum(__wt{b} * __c)").alias(f"__n{b}")
                    for b in range(B)])
             .crossJoin(F.broadcast(puw.agg(*wt_sum("__mass"))))
             .crossJoin(F.broadcast(pointdf))
             .collect())
    if not lrows:
        # no pairable labels at all: the caller's <2-replica guard is
        # the contractual error for this case
        return [], None
    point = do_row = lrows[0]
    alphas = []
    for b in range(B):
        nl = [(r["__v"], r[f"__n{b}"] or 0) for r in lrows]
        n_b = sum(c for _, c in nl)
        if n_b < 2:
            continue
        if metric == "nominal":
            de = float(n_b * n_b - sum(c * c for _, c in nl)) \
                / (n_b - 1)
        else:
            nl.sort(key=lambda t: t[0])  # δ² keys are (va < vb)
            de = sum(2.0 * ca * cb * d2_map[(va, vb)]
                     for i, (va, ca) in enumerate(nl)
                     for vb, cb in nl[i + 1:]) / (n_b - 1)
        if de <= 0:
            continue
        alphas.append(1.0 - (do_row[f"__a{b}"] or 0.0) / de)
    return alphas, point


#: Poisson(1) CDF thresholds for k = 0..8 (e^-1 · Σ 1/i!), written as
#: 17-significant-digit literals so a SQL oracle can embed the SAME
#: doubles instead of trusting a cross-engine exp(); u beyond the last
#: threshold caps the weight at 9 (P ≈ 1e-7).
_POISSON1_CDF = (
    0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
    0.9810118431238462, 0.9963401531726563, 0.9994058151824183,
    0.9999167588507119, 0.9999897508033253, 0.9999988852520038,
)


def _with_poisson_weights(frame: DataFrame, key_col: str,
                          replicas: int, salt: str,
                          keep: list[str]) -> DataFrame:
    """Append integer Poisson(1) replica weights ``__wt0..__wt{B−1}``
    derived deterministically from ``md5('{salt}{b//8}|' + key)`` —
    the one-pass bootstrap machinery shared by :func:`bootstrap_ci`
    and the Krippendorff-alpha CI. One md5 digest feeds EIGHT replicas
    (disjoint 16-bit hex slices), and the inverse CDF is a flat
    integer-threshold sum that stays inside codegen. ``keep`` lists
    the columns carried through the three string-expression
    projections (built with ~B py4j calls total — the per-replica
    Column-tree build was measured 4× slower in plan construction)."""
    import math

    n_groups = (replicas + 7) // 8
    hex_cols = [f"md5(concat('{salt}{g}|', CAST({key_col} AS STRING))) "
                f"AS __h{g}" for g in range(n_groups)]
    s1 = frame.selectExpr(*keep, *hex_cols)
    bucket_cols = []
    for b in range(replicas):
        g, j = divmod(b, 8)
        bucket_cols.append(
            f"CAST(conv(substring(__h{g}, {1 + 4 * j}, 4), 16, 10) "
            f"AS BIGINT) AS __b{b}")
    s2 = s1.selectExpr(*keep, *bucket_cols)
    ts = [math.ceil(t * 65536) for t in _POISSON1_CDF]
    w_cols = [
        "(" + " + ".join(f"IF(__b{b} >= {t}, 1L, 0L)" for t in ts)
        + f") AS __wt{b}" for b in range(replicas)]
    return s2.selectExpr(*keep, *w_cols)


def bootstrap_ci(
    df: DataFrame,
    key_col: str,
    value_col: str,
    *,
    replicas: int = 40,
    alpha: float = 0.05,
    digits: int = 6,
    salt: str = "boot",
    check_unique_keys: bool = True,
) -> DataFrame:
    """ONE-PASS Poisson-bootstrap confidence interval for the mean of
    ``value_col`` — error bars on corpus statistics without ever
    resampling the data: replica ``b`` weights each row by an
    independent Poisson(1) draw (the classic big-data bootstrap
    approximation of multinomial resampling — Chamandy et al.,
    "Estimating Uncertainty for Massive Data Streams"), derived
    DETERMINISTICALLY from the module's md5 coin (hex slice
    ``[4·(b mod 8), 4·(b mod 8)+4)`` of ``md5('{salt}{b//8}|' + key)``
    as a 16-bit fraction through the Poisson inverse CDF), so reruns
    and engines agree draw for draw. Returns ONE row ``(n, mean, se,
    ci_lo, ci_hi, replicas)``: the exact sample mean, the replica-mean
    standard deviation (population form), and the percentile CI —
    ``sorted_means[floor(alpha/2·B)]`` / the mirrored upper order
    statistic (document-your-index beats interpolation ambiguity).
    All float outputs rounded to ``digits``.

    Scale shape: ONE aggregation job with 2·B + 2 accumulators
    (Σw_b, Σw_b·x per replica + n, Σx) — every weight is a
    when-chain over the 9 CDF literals, no explode, no corpus×B rows,
    no shuffle beyond the map-side-combined agg; the B replica means
    are folded driver-side (model-scale, like a PQ codebook). One md5
    supplies EIGHT replicas (its 32 hex chars slice into eight
    disjoint 16-bit buckets), so the per-row hash work is ⌈B/8⌉
    digests, not B — measured 4.8 s → melts to the when-chain cost at
    sf0.1×40. NULL values drop from everything. Raises if any
    replica's total weight is 0 (only conceivable on a near-empty
    input, where a bootstrap CI is meaningless anyway).

    ``key_col`` MUST be row-unique: each replica's Poisson draw is a
    pure function of the key, so rows sharing a key get perfectly
    correlated (identical) draws in every replica and the SE/CI are
    biased. By default this is VALIDATED inside the same single agg
    (one extra ``count(DISTINCT key)`` accumulator; raises ValueError
    on duplicates). At 100 TB the distinct forces a key-cardinality
    shuffle phase, so callers whose key is unique by construction
    (``doc_id``, a primary key) pass ``check_unique_keys=False`` to
    keep the agg purely map-side-combinable.
    """
    if replicas < 2:
        raise ValueError("replicas must be >= 2")
    if not 0.0 < alpha < 1.0:
        raise ValueError("alpha must be in (0, 1)")
    x = F.col(value_col).cast("double")
    rows = df.filter(x.isNotNull()).select(
        F.col(key_col).alias("__k"), x.alias("__x"))

    # Weight machinery factored into _with_poisson_weights (shared
    # with the Krippendorff-alpha CI) — three string-expression
    # projections built with ~B py4j calls total; see its docstring.
    carry = ["__k"] if check_unique_keys else []
    step3 = _with_poisson_weights(rows, "__k", replicas, salt,
                                  keep=["__x"] + carry)
    aggs = [F.expr("count(1)").alias("__n"),
            F.expr("sum(__x)").alias("__sx")]
    if check_unique_keys:
        aggs.append(F.expr("count(DISTINCT __k)").alias("__nk"))
    for b in range(replicas):
        aggs.append(F.expr(f"sum(__wt{b})").alias(f"__w{b}"))
        aggs.append(F.expr(f"sum(__wt{b} * __x)").alias(f"__s{b}"))
    row = step3.agg(*aggs).first()
    n = row["__n"]
    if n == 0:
        raise ValueError("bootstrap_ci: no non-NULL values")
    if check_unique_keys and row["__nk"] != n:
        raise ValueError(
            f"bootstrap_ci: key_col {key_col!r} is not row-unique "
            f"({n} rows, {row['__nk']} distinct keys) — rows sharing "
            "a key would get identical Poisson draws in every replica "
            "and bias the SE/CI; pass a unique key")
    means = []
    for b in range(replicas):
        if not row[f"__w{b}"]:
            raise ValueError(
                f"bootstrap_ci: replica {b} drew total weight 0 — "
                "input too small for a meaningful bootstrap")
        means.append(row[f"__s{b}"] / row[f"__w{b}"])
    means.sort()
    bb = len(means)
    lo_idx = int((alpha / 2) * bb)
    mbar = sum(means) / bb
    se = (sum((m - mbar) ** 2 for m in means) / bb) ** 0.5
    out_row = (int(n),
               float(round(row["__sx"] / n, digits)) + 0.0,
               float(round(se, digits)) + 0.0,
               float(round(means[lo_idx], digits)) + 0.0,
               float(round(means[bb - 1 - lo_idx], digits)) + 0.0,
               int(bb))
    from ..plans import local_frame
    return local_frame(
        df.sparkSession,
        [out_row], "n long, mean double, se double, ci_lo double, "
                   "ci_hi double, replicas int")


def key_skew_report(
    df: DataFrame,
    key_cols: Sequence[str],
    *,
    target_rows_per_task: int = 5_000_000,
    digits: int = 9,
) -> DataFrame:
    """One-row skew diagnosis for a prospective shuffle key — the
    pre-flight check before keying a 100 TB join/groupBy on a column:
    hot keys make straggler tasks that AQE can split for joins but
    nothing can split for a groupBy whose single key exceeds a task.
    Emits the numbers that decide the mitigation:

    - ``n_rows`` / ``n_keys`` / ``max_key_rows`` / ``avg_key_rows``
    - ``skew_ratio`` = max/avg — >10 means the hot key dominates its
      task; near 1 means salting would only add overhead
    - ``top_key_share`` = max/n_rows — the fraction of the corpus one
      reducer would receive
    - ``entropy_norm`` — Shannon entropy of the key distribution over
      ``ln(n_keys)`` (1.0 = perfectly uniform, →0 = mass on one key);
      the single-number summary to alarm on in a DQ rule
    - ``recommended_salt`` = ceil(max_key_rows / target_rows_per_task)
      — the salt fan-out that caps any one (key, salt) group at the
      target task size; 1 means no salting needed, and the value feeds
      ``skew.salted_join(salt=...)`` directly

    Companion to ``skew.key_skew_stats`` (the top-k hottest KEYS, for
    naming the culprits) — this is the one-row whole-distribution
    summary a DQ rule can gate on.

    Scale shape: ONE map-side-combined groupBy to per-key counts (each
    task emits one row per distinct key it saw — the combine step is
    exactly why this probe is safe on the very key it diagnoses), then
    ONE aggregate over the key-count frame. Entropy folds in the same
    pass via ``ln(n) − Σ c·ln(c) / n`` — no second scan, no collect.
    NULL keys count as a key (they hash to one reducer like any other
    value — the classic hidden hot key; check ``profile_table`` for
    the null share). Floats round to ``digits`` for cross-engine
    comparability.
    """
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    if target_rows_per_task < 1:
        raise ValueError("target_rows_per_task must be >= 1")
    c = F.col("__c").cast("double")
    counts = df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("__c"))
    agg = counts.agg(
        F.sum("__c").alias("__n"),
        F.count(F.lit(1)).alias("n_keys"),
        F.max("__c").alias("max_key_rows"),
        F.sum(c * F.log(c)).alias("__clogc"))
    n = F.col("__n").cast("double")
    entropy = F.log(n) - F.col("__clogc") / n
    rnd = lambda col: F.round(col, digits) + F.lit(0.0)  # noqa: E731
    return agg.select(
        F.col("__n").alias("n_rows"),
        "n_keys",
        "max_key_rows",
        rnd(n / F.col("n_keys")).alias("avg_key_rows"),
        rnd(F.col("max_key_rows") / (n / F.col("n_keys")))
        .alias("skew_ratio"),
        rnd(F.col("max_key_rows") / n).alias("top_key_share"),
        F.when(F.col("n_keys") > 1,
               rnd(entropy / F.log(F.col("n_keys").cast("double"))))
        .alias("entropy_norm"),
        F.ceil(F.col("max_key_rows")
               / F.lit(float(target_rows_per_task)))
        .cast("long").alias("recommended_salt"))


def exact_order_statistic(
    df: DataFrame,
    col: str,
    k: int,
    *,
    accuracy: int = 10_000,
    n: int | None = None,
    max_collect_rows: int = 2_000_000,
) -> float:
    """EXACT k-th smallest value of ``col`` (1-based, NULLs excluded)
    without a global sort — the distributed-selection primitive behind
    :func:`conformal_threshold`'s ungrouped path. ``percentile_approx``
    alone is NOT exact (rank error ~n/accuracy); a full
    ``orderBy().limit(k)`` is exact but k here is typically a corpus
    FRACTION (0.9·n for a 90% threshold), far past top-k territory.

    Two-phase bracketing instead: an approximate quantile pair brackets
    the target rank (the sketch's rank error bounds how far off the
    bracket can be — widened by 2× that bound on each side), ONE exact
    count fixes how many rows fall below the bracket, and only the
    in-bracket slice (~n/accuracy rows) is sorted. The RESULT is exact
    and bracket-independent — sketch nondeterminism can only move the
    bracket, and a bracket that misses the target rank is detected by
    the count and falls back to one exact EXECUTOR-SIDE rank-filter
    job rather than returning a wrong answer.

    Driver-safety contract: the only corpus-dependent collect is the
    in-bracket slice, expected ~2·n/accuracy rows. ``max_collect_rows``
    caps it — if the bracket would require collecting more (n/accuracy
    too large, or a heavily duplicated value stretching the bracket),
    the call raises with guidance instead of pulling a corpus onto the
    driver: raise ``accuracy`` (shrinks the bracket ∝ 1/accuracy) or
    quantize/deduplicate upstream (the isotonic ``max_points``
    convention, mirrored here per the r14 verdict task 3).
    """
    if k < 1:
        raise ValueError("k must be >= 1 (1-based rank)")
    c = F.col(col)
    nn = df.filter(c.isNotNull())
    if n is None:  # caller may pass a known count to skip this scan
        n = nn.count()
    if k > n:
        raise ValueError(f"k={k} exceeds non-null rows n={n}")
    q = k / n
    err = 1.0 / accuracy
    lo_q, hi_q = max(0.0, q - 2 * err), min(1.0, q + 2 * err)
    row = nn.agg(F.percentile_approx(
        c, F.array(F.lit(lo_q), F.lit(hi_q)),
        F.lit(accuracy)).alias("b")).first()
    lo, hi = row["b"][0], row["b"][1]
    n_below = nn.filter(c < lo).count()
    need = k - n_below
    if need > max_collect_rows:
        raise ValueError(
            f"exact_order_statistic would collect {need} in-bracket "
            f"rows (> max_collect_rows={max_collect_rows}): the "
            f"bracket holds ~2·n/accuracy rows, so raise accuracy "
            f"(={accuracy}, bracket shrinks proportionally) or "
            "quantize/deduplicate the column upstream")
    slice_rows = (nn.filter((c >= lo) & (c <= hi))
                  .select(c.alias("__v"))
                  .orderBy(F.col("__v").asc())
                  .limit(max(need, 0))
                  .collect())
    idx = k - n_below - 1
    if 0 <= idx < len(slice_rows):
        return slice_rows[idx]["__v"]
    # bracket missed (possible only if the sketch's rank error exceeded
    # its bound for this layout) — exact global selection as a JOB
    return _rank_filter_selection(nn, c, k)


def _rank_filter_selection(nn: DataFrame, c, k: int):
    """Exact k-th smallest as ONE job: ``orderBy.limit(k)`` keeps the
    k-row frontier executor-side (TakeOrderedAndProject) and the
    ``max`` reduce hands the driver a single scalar — never k collected
    rows (the r14 verdict replaced the ``.limit(k).collect()`` driver
    slice with this)."""
    return (nn.select(c.alias("__v")).orderBy(F.col("__v").asc())
            .limit(k).agg(F.max("__v").alias("__v")).first()["__v"])


def conformal_threshold(
    df: DataFrame,
    score_col: str,
    *,
    alpha: float = 0.1,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Split-conformal calibration threshold (Vovk; Angelopoulos &
    Bates 2023 tutorial form): given held-out NONCONFORMITY scores
    (higher = worse), the threshold is the ``⌈(n+1)(1−alpha)⌉``-th
    smallest score — any future exchangeable example's score falls at
    or under it with probability ≥ 1−alpha, a FINITE-SAMPLE guarantee
    with no distributional assumptions. This is the principled version
    of "filter at the 90th percentile": the +1 correction is what
    turns a quantile into a guarantee. Returns ``(group..., n, k,
    threshold)``; threshold is NULL when ⌈(n+1)(1−alpha)⌉ > n (too few
    calibration rows for the requested coverage — at least
    ``1/alpha − 1`` rows are needed). NULL scores are excluded.

    Scale shape: grouped, one rank window per group (per-source /
    per-domain calibration — thousands of bounded partitions);
    ungrouped, the two-phase :func:`exact_order_statistic` selection —
    never a corpus-wide single-task sort. Exact order statistics make
    the threshold value-oracle-checkable.
    """
    if not 0.0 < alpha < 1.0:
        raise ValueError("alpha must be in (0, 1)")
    s = F.col(score_col)
    nn = df.filter(s.isNotNull())
    if not group_cols:
        n = nn.count()
        k = math.ceil((n + 1) * (1.0 - alpha))
        # float() — the selection returns the column's native type
        # (int for bigint scores) and the DoubleType verifier rejects
        # Python ints
        thr = (float(exact_order_statistic(nn, score_col, k, n=n))
               if k <= n else None)
        spark = df.sparkSession
        from ..plans import local_frame
        return local_frame(
            spark, [(int(n), int(k), thr)],
            "n long, k long, threshold double")
    gc = list(group_cols)
    w = Window.partitionBy(*gc).orderBy(s.asc())
    wn = Window.partitionBy(*gc)
    ranked = nn.select(
        *gc, s.alias("__s"),
        F.row_number().over(w).alias("__rk"),
        F.count(F.lit(1)).over(wn).alias("n"))
    k = F.ceil((F.col("n") + 1) * F.lit(1.0 - alpha)).cast("long")
    return (ranked.withColumn("k", k)
            .filter(F.col("__rk") == F.least(F.col("k"), F.col("n")))
            .select(*gc, "n", "k",
                    F.when(F.col("k") <= F.col("n"), F.col("__s"))
                    .cast("double").alias("threshold")))


def k_anonymity_report(
    df: DataFrame,
    qi_cols: Sequence[str],
    *,
    k: int = 5,
    sensitive_col: Optional[str] = None,
    l: int = 2,
) -> DataFrame:
    """Re-identification audit over quasi-identifier columns — the
    compliance gate before a table (or a training corpus's metadata)
    ships: a row is k-ANONYMOUS when at least ``k`` rows share its
    full quasi-identifier combination (Sweeney 2002), so small QI
    groups are the linkable ones. With ``sensitive_col`` the report
    adds l-DIVERSITY (Machanavajjhala 2007): a k-anonymous group still
    leaks when everyone in it shares the same sensitive value, so
    groups also need >= ``l`` DISTINCT sensitive values. Returns ONE
    row:

        (n_rows, n_groups, min_group_size, n_rows_below_k,
         frac_rows_below_k [, min_l, n_groups_below_l,
         n_rows_in_groups_below_l])

    NULL quasi-identifier values form their own groups (NULL is itself
    a linkable value — dropping those rows would hide exactly the
    outliers the audit exists to find).

    Scale shape: ONE map-side-combined groupBy over the QI tuple
    (count + optional distinct-sensitive count), then a
    group-cardinality fold to the report row — the corpus never
    shuffles twice. Companion: the per-group risky-combination detail
    is the grouped frame itself; this report is the gate, not the
    drill-down."""
    gc = list(qi_cols)
    if not gc:
        raise ValueError("qi_cols must name at least one column")
    if k < 1:
        raise ValueError("k must be >= 1")
    aggs = [F.count(F.lit(1)).alias("_n")]
    if sensitive_col is not None:
        if l < 1:
            raise ValueError("l must be >= 1")
        aggs.append(F.countDistinct(sensitive_col).alias("_l"))
    groups = df.groupBy(*gc).agg(*aggs)
    outs = [
        F.sum("_n").alias("n_rows"),
        F.count(F.lit(1)).alias("n_groups"),
        F.min("_n").alias("min_group_size"),
        F.sum(F.when(F.col("_n") < k, F.col("_n")).otherwise(0))
        .alias("n_rows_below_k"),
        (F.sum(F.when(F.col("_n") < k, F.col("_n")).otherwise(0))
         / F.sum("_n")).alias("frac_rows_below_k"),
    ]
    if sensitive_col is not None:
        outs += [
            F.min("_l").alias("min_l"),
            F.sum(F.when(F.col("_l") < l, 1).otherwise(0))
            .alias("n_groups_below_l"),
            F.sum(F.when(F.col("_l") < l, F.col("_n")).otherwise(0))
            .alias("n_rows_in_groups_below_l"),
        ]
    return groups.agg(*outs)


def schema_drift_report(
    base: DataFrame,
    cur: DataFrame,
) -> DataFrame:
    """Schema + null-rate drift between two snapshots of a table — the
    day-2 companion to row-level ``snapshot_diff`` and
    distribution-level ``drift_report``: upstream producers rename,
    retype, and stop populating columns long before values drift.
    One row per column in EITHER schema:

        (column, status, type_base, type_cur, type_changed,
         null_frac_base, null_frac_cur, null_frac_delta)

    ``status`` ∈ added/removed/common (relative to base → cur); types
    are Spark simpleString forms; null fractions are exact
    int-count/int-count doubles (NULL for the side a column is absent
    from). Column names compare case-sensitively — a case-only rename
    reports as removed + added, which IS a producer change worth
    seeing.

    Scale shape: ONE whole-table aggregate per side (every column's
    null count rides the same map-side-combined pass), exploded into
    the column-cardinality report row set by a literal array — the
    schema comparison itself is plan-time driver metadata, no data
    moves for it."""
    tb = {f.name: f.dataType.simpleString() for f in base.schema.fields}
    tc = {f.name: f.dataType.simpleString() for f in cur.schema.fields}

    def null_fracs(df: DataFrame, names) -> DataFrame:
        # backtick-quote: producer schemas carry dots and spaces, and
        # an unquoted F.col would read them as struct-field paths
        return df.agg(*[
            F.avg(F.col(f"`{n}`").isNull().cast("int")).alias(n)
            for n in names])

    nb = null_fracs(base, tb)
    nc = null_fracs(cur, tc)
    cols = sorted(set(tb) | set(tc))
    entries = F.array(*[
        F.struct(
            F.lit(n).alias("column"),
            F.lit("common" if n in tb and n in tc
                  else "removed" if n in tb else "added").alias("status"),
            F.lit(tb.get(n)).cast("string").alias("type_base"),
            F.lit(tc.get(n)).cast("string").alias("type_cur"),
            F.lit(n in tb and n in tc
                  and tb[n] != tc[n]).alias("type_changed"),
            (F.col(f"b.`{n}`") if n in tb
             else F.lit(None).cast("double")).alias("null_frac_base"),
            (F.col(f"c.`{n}`") if n in tc
             else F.lit(None).cast("double")).alias("null_frac_cur"))
        for n in cols])
    row = nb.alias("b").crossJoin(F.broadcast(nc.alias("c")))
    return (row.select(F.explode(entries).alias("e"))
            .select("e.*")
            .withColumn("null_frac_delta",
                        F.col("null_frac_cur") - F.col("null_frac_base")))


def null_profile_snapshot(df: DataFrame) -> DataFrame:
    """The ADDITIVE half of :func:`schema_drift_report`: one row per
    column — ``(column, dtype, n_rows, n_nulls)`` — from ONE
    whole-table aggregate (every column's null count rides the same
    map-side-combined pass, the report's own scan shape). Counts from
    disjoint row batches SUM to the union's exactly, so day-2 runs
    never rescan history (``streaming.incremental_null_profile_state``);
    ``dtype`` is the Spark simpleString, constant across batches of
    one producer version."""
    names = [f.name for f in df.schema.fields]
    types = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    row = df.agg(
        F.count(F.lit(1)).alias("__nrows"),
        *[F.sum(F.col(f"`{n}`").isNull().cast("long")).alias(f"__nn_{i}")
          for i, n in enumerate(names)])
    entries = F.array(*[
        F.struct(F.lit(n).alias("column"),
                 F.lit(types[n]).alias("dtype"),
                 F.col("__nrows").cast("long").alias("n_rows"),
                 F.coalesce(F.col(f"__nn_{i}"), F.lit(0)).cast("long")
                 .alias("n_nulls"))
        for i, n in enumerate(names)])
    return row.select(F.explode(entries).alias("e")).select("e.*")


def schema_drift_from_profiles(
    base_prof: DataFrame,
    cur_prof: DataFrame,
) -> DataFrame:
    """:func:`schema_drift_report` computed from two
    :func:`null_profile_snapshot` frames (or exact SUM re-merges of
    them) instead of two live tables — the day-2 path: yesterday's
    profile is column-cardinality state, so today's drift check scans
    only today's rows. Same output contract as the report
    (added/removed/common, type_changed, exact-ratio null fractions;
    a zero-row side's fractions are NULL like ``avg`` over no rows)."""
    b = base_prof.select(
        "column", F.col("dtype").alias("type_base"),
        F.col("n_rows").alias("_nrb"), F.col("n_nulls").alias("_nnb"))
    c = cur_prof.select(
        "column", F.col("dtype").alias("type_cur"),
        F.col("n_rows").alias("_nrc"), F.col("n_nulls").alias("_nnc"))
    j = b.join(c, "column", "full_outer")
    frac_b = F.when(F.col("_nrb") > 0,
                    F.col("_nnb") / F.col("_nrb")).cast("double")
    frac_c = F.when(F.col("_nrc") > 0,
                    F.col("_nnc") / F.col("_nrc")).cast("double")
    status = (F.when(F.col("type_base").isNull(), F.lit("added"))
              .when(F.col("type_cur").isNull(), F.lit("removed"))
              .otherwise(F.lit("common")))
    return (j.select(
        "column", status.alias("status"), "type_base", "type_cur",
        (F.col("type_base").isNotNull() & F.col("type_cur").isNotNull()
         & (F.col("type_base") != F.col("type_cur")))
        .alias("type_changed"),
        frac_b.alias("null_frac_base"), frac_c.alias("null_frac_cur"))
        .withColumn("null_frac_delta",
                    F.col("null_frac_cur") - F.col("null_frac_base")))


#: Benford first-digit probabilities log10(1 + 1/d), written as exact
#: double literals so Spark and any SQL replay aggregate over
#: IDENTICAL constants (repr round-trips the IEEE value).
BENFORD_P = (0.3010299956639812, 0.17609125905568124,
             0.12493873660829993, 0.09691001300805642,
             0.07918124604762482, 0.06694678963061322,
             0.05799194697768673, 0.05115252244738129,
             0.04575749056067514)


def benford_report(
    df: DataFrame,
    value_col: str,
    *,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Benford's-law first-digit audit — the classic fabricated-or-
    truncated-numbers smell test for naturally occurring magnitudes
    (amounts, populations, file sizes): the first significant digit of
    honest multi-order-of-magnitude data follows
    ``P(d) = log10(1 + 1/d)``, and hand-entered, capped, or
    synthesized values do not. One row per group:

        (n, chi2, p_value, worst_digit, worst_abs_gap)

    chi² against the Benford expectation over digits 1-9 (8 degrees of
    freedom — even, so the portable closed-form p-value applies),
    plus the digit with the largest absolute frequency gap.

    Digit extraction is EXACT for the FULL double range, not floating:
    the first character of the double rendered as a string. A
    shortest-round-trip rendering (Java ``Double.toString``, DuckDB's
    Ryu) cannot change the leading digit — a rendering with a
    different leading digit would parse back to a different double —
    so there is no log10-at-a-power-of-ten boundary hazard and no
    ``floor→long`` overflow at |value| ≥ 2⁶³ (which raises under ANSI
    mode and silently wraps otherwise). Rows with ``|value| < 1``,
    NULL, NaN, or ±Inf are dropped by contract (a sub-1 value's first
    significant digit lives in the fraction; Benford audits
    magnitudes) — an audit over such data should rescale first.

    Scale shape: the digit fold rides the scan projection into ONE
    map-side-combined (group, digit) groupBy; chi² and the worst-gap
    pick are digit-cardinality folds. Float contract: chi2/p/gap are
    arithmetic over exact counts and the literal probabilities —
    round 9dp (+0.0)."""
    from .drift import chi2_pvalue

    gc = list(group_cols)
    if any(c in ("n", "chi2", "p_value", "worst_digit", "worst_abs_gap")
           for c in gc):
        raise ValueError("group_cols collide with the output columns")
    return benford_from_counts(
        benford_digit_counts(df, value_col, group_cols=gc),
        group_cols=gc)


def benford_digit_counts(
    df: DataFrame,
    value_col: str,
    *,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """The ADDITIVE half of :func:`benford_report`: per-(group, first
    digit) row counts ``(group..., _d, _c)`` under the report's drop
    contract (NULL/NaN/±Inf/|v|<1 excluded). Counts from disjoint row
    batches SUM to the union's exactly — the day-2 seam
    (``streaming.incremental_benford_state``)."""
    gc = list(group_cols)
    v = F.abs(F.col(value_col).cast("double"))
    # first char of the string form: ≥1 guarantees no sign / "0." /
    # leading zero, and scientific notation still leads with the
    # first significant digit in both Spark and DuckDB
    digit = F.substring(v.cast("string"), 1, 1).cast("int")
    finite = (F.col(value_col).isNotNull() & ~F.isnan(v)
              & (v >= 1.0) & (v < F.lit(float("inf"))))
    return (df.filter(finite)
            .groupBy(*gc, digit.alias("_d"))
            .agg(F.count(F.lit(1)).alias("_c")))


def benford_from_counts(
    per_d: DataFrame,
    *,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """The chi²/worst-gap fold of :func:`benford_report`, over a
    :func:`benford_digit_counts` frame (or an exact SUM re-merge —
    integer counts make the merged report bit-identical to the
    one-shot)."""
    from .drift import chi2_pvalue

    gc = list(group_cols)
    n = F.sum("_c")
    terms_chi2 = []
    terms_gap = []
    for d, p in zip(range(1, 10), BENFORD_P):
        obs = F.sum(F.when(F.col("_d") == d, F.col("_c")).otherwise(0))
        terms_chi2.append(
            (obs - n * F.lit(p)) * (obs - n * F.lit(p)) / (n * F.lit(p)))
        terms_gap.append(F.struct(
            F.abs(obs / n - F.lit(p)).alias("gap"),
            F.lit(d).alias("d")))
    chi2 = sum(terms_chi2[1:], terms_chi2[0])
    worst = F.greatest(*terms_gap)
    return (per_d.groupBy(*gc)
            .agg(n.alias("n"), chi2.alias("chi2"),
                 worst.getField("d").alias("worst_digit"),
                 worst.getField("gap").alias("worst_abs_gap"))
            .select(*gc, "n", "chi2",
                    chi2_pvalue("chi2", 8).alias("p_value"),
                    "worst_digit", "worst_abs_gap"))


def quantile_discretize(
    df: DataFrame,
    value_col: str,
    *,
    n_bins: int = 4,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """EXACT equi-frequency discretization per group — the feature-
    binning companion to the approximate fixed-edge
    ``sketches.quantile_histogram``: rows are ranked within their
    group and dealt into ``n_bins`` SQL-standard ntile buckets, so bin
    populations differ by at most one row and the bin edges are true
    order statistics, not estimates. Returns one row per (group, bin):

        (bin, n, lo, hi, mean)

    Although ties at a bin boundary are ASSIGNED arbitrarily, every
    bin's CONTENT as a multiset is determined (position r in the
    value-sorted sequence always holds the r-th smallest value), so
    n/lo/hi/mean are all engine-independent — the property that makes
    this value-oracle-able. NULL values drop.

    Scale shape: ONE rank window partitioned by group + one (group,
    bin) groupBy. The window sorts each group's rows — correct and
    parallel ACROSS groups, a single-task sort for an UNGROUPED
    corpus-sized frame: pass group_cols at corpus scale (per-source,
    per-day) or reach for quantile_histogram's fixed-edge approximation
    when a global exact discretizer over billions of rows is asked
    for (that demand is usually a modeling smell anyway)."""
    if n_bins < 1:
        raise ValueError("n_bins must be >= 1")
    gc = list(group_cols)
    if any(c in ("bin", "n", "lo", "hi", "mean") for c in gc):
        raise ValueError("group_cols collide with the output columns")
    v = F.col(value_col).cast("double")
    w = Window.partitionBy(*gc).orderBy(v)
    return (df.filter(v.isNotNull())
            .select(*gc, v.alias("_v"),
                    F.ntile(n_bins).over(w).alias("bin"))
            .groupBy(*gc, "bin")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.min("_v").alias("lo"), F.max("_v").alias("hi"),
                 F.avg("_v").alias("mean")))
