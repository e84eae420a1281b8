"""Physical-plan inspection helpers.

The engine's scale posture is encoded in plan shapes: filters pushed to the
parquet scan, small dims broadcast, one fused projection for row rules,
partial aggregation before shuffles. These helpers read
``explain('formatted')`` output so tests can ASSERT those shapes instead of
hoping for them.
"""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import DataFrame


def plan_text(df: DataFrame, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def has_pushed_filters(df: DataFrame) -> bool:
    """True if the parquet scan carries PushedFilters (predicate pushdown)."""
    txt = plan_text(df)
    return bool(re.search(r"PushedFilters: \[[^\]]+\]", txt))


def read_schema_columns(df: DataFrame) -> list[str]:
    """TOP-LEVEL columns actually read from the scan (column pruning
    check). Parses the ReadSchema struct with bracket/paren awareness:
    ``decimal(12,2)`` commas and nested ``struct<...>`` fields must not
    be mistaken for column separators."""
    txt = plan_text(df)
    m = re.search(r"ReadSchema: struct<", txt)
    if not m:
        return []
    # bracket-matched body of the outer struct<...>
    start = m.end()
    depth, i = 1, start
    while i < len(txt) and depth:
        if txt[i] == "<":
            depth += 1
        elif txt[i] == ">":
            depth -= 1
        i += 1
    body = txt[start:i - 1]
    cols, cur, d = [], [], 0
    for ch in body:
        if ch in "<(":
            d += 1
        elif ch in ">)":
            d -= 1
        if ch == "," and d == 0:
            cols.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    cols.append("".join(cur))
    return [c.split(":")[0].strip() for c in cols if c.strip()]


def num_shuffles(df: DataFrame) -> int:
    """Count KEY-partitioning shuffle exchanges (hash/range) in the
    physical plan. Deliberately excludes RoundRobinPartitioning (the
    module's own ``fan_out`` adds one on purpose for small inputs) and
    SinglePartition collapses (1-row aggregates) — count those with
    :func:`num_exchanges` when a pin needs EVERY exchange. NOT a sound
    upper bound on all data movement for that reason."""
    txt = plan_text(df, "simple")
    return txt.count("Exchange hashpartitioning") + txt.count("Exchange rangepartitioning")


def num_exchanges(df: DataFrame) -> int:
    """Count EVERY shuffle exchange — hash, range, round-robin, and
    single-partition — excluding broadcast exchanges (which move dims,
    not the corpus). The strict companion to :func:`num_shuffles`."""
    txt = plan_text(df, "simple")
    return len(re.findall(r"\bExchange (?!.*IdentityBroadcastMode)"
                          r"(hashpartitioning|rangepartitioning|"
                          r"RoundRobinPartitioning|SinglePartition)", txt))


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in plan_text(df, "simple")


def has_sort_merge_join(df: DataFrame) -> bool:
    return "SortMergeJoin" in plan_text(df, "simple")


def has_broadcast_hint(df: DataFrame) -> bool:
    """True if the LOGICAL plan carries a broadcast hint (``F.broadcast``
    / ``/*+ BROADCAST */``). Distinct from ``has_broadcast_join``: a
    stats-driven BroadcastHashJoin picked by the planner on genuinely
    small data is fine; a *hint* forces the collect regardless of size
    and is what scale pins must ban on corpus-sized frames."""
    txt = plan_text(df, "extended")
    logical = txt.split("== Physical Plan ==")[0]
    return bool(re.search(r"ResolvedHint|UnresolvedHint|hint=\[[^\]]*broadcast",
                          logical, re.IGNORECASE))


def whole_stage_codegen_spans(df: DataFrame, *, execute: bool = True) -> int:
    """Number of WholeStageCodegen regions — wider spans = more fused
    JVM-side execution. Under AQE the pre-execution plan (and
    ``explain('codegen')``) reports 0 subtrees because codegen stages
    only materialize at runtime, so by default this runs the frame once
    (noop sink) and counts distinct codegen ids in the executed plan."""
    if execute:
        # must run THIS frame's own QueryExecution (a noop .write wraps
        # the plan in a fresh one and leaves this one un-finalized).
        # Drained through toLocalIterator: executes every partition but
        # holds one at a time on the driver — collect() on a corpus-
        # sized frame would OOM the driver this module exists to protect
        for _ in df.toLocalIterator():
            pass
    txt = df._jdf.queryExecution().executedPlan().toString()
    ids = set(re.findall(r"WholeStageCodegen \((\d+)\)", txt))
    if ids:
        return len(ids)
    m = re.search(r"Found (\d+) WholeStageCodegen subtrees",
                  plan_text(df, "codegen"))
    return int(m.group(1)) if m else 0


def estimated_size_bytes(df: DataFrame) -> int:
    """Catalyst's optimized-plan size estimate (file sizes for scans).
    Plan-time only — no job, unlike ``df.rdd.getNumPartitions()`` which
    costs ~1s of RDD-conversion overhead per call."""
    return int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())


def fan_out(df: DataFrame, min_partitions: int = 0,
            max_bytes: int = 2 << 30) -> DataFrame:
    """Round-robin repartition a small input up to cluster parallelism.

    CPU-heavy per-row operators (shingling, BLAS matmuls in mapInPandas)
    inherit the scan's partitioning; a small single-file parquet input
    arrives as ONE partition (a single row group can't even be split) and
    serializes the whole stage onto one core. The repartition fires only
    when Catalyst estimates the input under ``max_bytes`` — at 100 TB the
    scan has thousands of splits already and the big-data path never pays
    the shuffle; under the bound the shuffle is small by construction.
    """
    try:
        if estimated_size_bytes(df) >= max_bytes:
            return df
        target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    except Exception:
        # Spark Connect exposes neither _jdf nor sparkContext — be
        # conservative and add no shuffle
        return df
    return df.repartition(target)


def has_partial_aggregation(df: DataFrame) -> bool:
    """True if a HashAggregate with partial mode precedes the exchange
    (map-side combine)."""
    txt = plan_text(df)
    return "partial_" in txt or bool(re.search(r"Functions \[\d+\]: partial", txt))
