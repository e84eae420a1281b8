"""Parquet file-layout maintenance: compaction and Z-order clustering.

The two layout levers that matter at 100 TB and that no query-side knob
fixes after the fact: (1) thousands of KB-sized files from streaming /
incremental appends destroy scan throughput (per-file open + footer
costs dominate), and (2) row order decides whether min/max file
statistics can prune scans on more than one column. Both operators
write to a NEW directory — the at-scale pattern is write-new-then-flip
(a view, symlink manifest, or table-format pointer), never an in-place
overwrite of a directory being read.

Net-new relative to the reference (its sinks stop at table writes,
sinks/utils/writer.py:242-287); layout maintenance is what a lake needs
once those writes accumulate.
"""

from __future__ import annotations

import math
import os
import re
from typing import Mapping, Optional, Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans import estimated_size_bytes

__all__ = ["compact_small_files", "interleave_bits", "zorder_write",
           "clustering_report", "analyze_tables", "dataset_manifest",
           "manifest_diff", "publish_version", "current_version",
           "read_current", "set_current"]


def _hadoop_fs(spark: SparkSession, path: str):
    """(FileSystem, Path class) for ``path`` via the JVM Hadoop API —
    works for local, HDFS, and s3a URIs alike. Raises a clear error
    under Spark Connect (no JVM handle there; pointer flips need a
    driver-side filesystem client)."""
    from ..connect import spark_context

    sc = spark_context(spark)
    if sc is None:  # Spark Connect: no sparkContext/_jvm
        raise NotImplementedError(
            "versioned publish needs driver-side Hadoop FS access (a "
            "classic SparkSession); not available under Spark Connect")
    jvm = sc._jvm
    conf = sc._jsc.hadoopConfiguration()
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(conf), jvm.org.apache.hadoop.fs.Path


def publish_version(
    df: DataFrame,
    root: str,
    *,
    version: Optional[int] = None,
) -> int:
    """Versioned snapshot publish — the machinery behind this module's
    "write new, then flip; never overwrite a directory being read"
    rule: write ``df`` fully to ``root/v=<n>/``, THEN flip the
    ``root/_CURRENT`` pointer (write-tmp + rename, the closest thing to
    atomic every Hadoop filesystem offers). :func:`read_current`
    readers see the old version until the flip and the new one after —
    never a half-written directory. Rollback is rewriting the pointer;
    old versions stay until explicitly retired.

    ``version`` defaults to max existing + 1. Returns the published
    version number. Concurrent publishers are NOT coordinated (last
    rename wins) — serialize publishes per dataset upstream."""
    spark = df.sparkSession
    fs, Path = _hadoop_fs(spark, root)
    if version is None:
        version = (_max_version(fs, Path, root) or 0) + 1
    df.write.mode("overwrite").parquet(f"{root}/v={int(version)}")
    # writeUTF/readUTF framing: the one py4j-unambiguous (write|read)
    # pair on Hadoop's Data(Out|In)putStream (a bare read() is an
    # overload py4j cannot resolve)
    set_current(spark, root, int(version))
    return int(version)


def _max_version(fs, Path, root: str) -> Optional[int]:
    rp = Path(root)
    if not fs.exists(rp):
        return None
    best = None
    for st in fs.listStatus(rp):
        name = st.getPath().getName()
        m = re.fullmatch(r"v=(\d+)", name)
        if m:
            v = int(m.group(1))
            best = v if best is None else max(best, v)
    return best


def set_current(spark: SparkSession, root: str, version: int) -> None:
    """Point ``_CURRENT`` at an already-published version — the
    rollback/promote primitive (publish keeps old ``v=<n>`` dirs
    intact, so rollback is just a pointer rewrite). Raises if the
    version directory does not exist.

    Flip mechanics (ADVICE r8): the pointer is renamed over with
    ``FileContext.rename(..., Options.Rename.OVERWRITE)`` — a single
    atomic operation on HDFS and the local FS, so readers see the old
    value until the flip and the new one after, never a missing
    pointer. Only if the filesystem exposes no FileContext binding does
    this fall back to delete-then-rename, which opens a transient
    window where the pointer does not exist; :func:`current_version`
    carries a bounded retry to ride that window out."""
    fs, Path = _hadoop_fs(spark, root)
    if not fs.exists(Path(f"{root}/v={int(version)}")):
        raise FileNotFoundError(f"{root}/v={int(version)} not published")
    tmp = Path(f"{root}/_CURRENT.tmp")
    out = fs.create(tmp, True)
    out.writeUTF(str(int(version)))
    out.close()
    cur = Path(f"{root}/_CURRENT")
    try:
        jvm = spark.sparkContext._jvm
        fc = jvm.org.apache.hadoop.fs.FileContext.getFileContext(
            fs.getUri(), spark.sparkContext._jsc.hadoopConfiguration())
        overwrite = jvm.org.apache.hadoop.fs.Options.Rename.OVERWRITE
        opts = spark.sparkContext._gateway.new_array(
            jvm.org.apache.hadoop.fs.Options.Rename, 1)
        opts[0] = overwrite
        fc.rename(tmp, cur, opts)
        return
    except Exception:
        # no FileContext for this scheme (rare object stores) — fall
        # back to the non-atomic flip the docstring documents
        pass
    if fs.exists(cur):
        fs.delete(cur, False)
    if not fs.rename(tmp, cur):
        raise IOError(f"pointer flip failed for {root}")


def current_version(spark: SparkSession, root: str) -> Optional[int]:
    """The published version the ``_CURRENT`` pointer names, or None if
    nothing has been published.

    Retries a few times before concluding "nothing published": on
    filesystems where :func:`set_current` had to fall back to
    delete-then-rename, a read racing the flip could otherwise see the
    transient no-pointer window (ADVICE r8)."""
    import time as _time

    fs, Path = _hadoop_fs(spark, root)
    cur = Path(f"{root}/_CURRENT")
    for attempt in range(3):
        if fs.exists(cur):
            try:
                stream = fs.open(cur)
            except Exception:
                # deleted between exists() and open() by a racing flip
                _time.sleep(0.05 * (attempt + 1))
                continue
            try:
                return int(stream.readUTF().strip())
            finally:
                stream.close()
        # distinguish "never published" (no tmp, no flip in progress)
        # from "mid-flip": only retry when a flip could be racing
        if not fs.exists(Path(f"{root}/_CURRENT.tmp")):
            return None
        _time.sleep(0.05 * (attempt + 1))
    return None


def read_current(spark: SparkSession, root: str) -> DataFrame:
    """Load the currently-published snapshot of a
    :func:`publish_version` dataset."""
    v = current_version(spark, root)
    if v is None:
        raise FileNotFoundError(f"no published version under {root}")
    return spark.read.parquet(f"{root}/v={v}")


def compact_small_files(
    spark: SparkSession,
    src_path: str,
    dest_path: str,
    *,
    target_file_bytes: int = 128 << 20,
    sort_by: Sequence[str] = (),
) -> Mapping[str, int]:
    """Rewrite a parquet directory into ~``target_file_bytes`` files.

    File count comes from Catalyst's plan-time size estimate (sum of
    source file sizes — no job). Without ``sort_by`` the rewrite is one
    round-robin repartition; with it, a range partition + in-file sort,
    so the compacted files also carry useful min/max pruning stats on
    the sort key. Returns {files_before, files_after, estimated_bytes,
    target_files}.

    Scale notes: cost is one full read + write of ``src_path`` — run it
    per partition directory, not per table, and flip readers to
    ``dest_path`` afterwards. The estimate is the *compressed* source
    size, so output files land near the target without sampling.
    """
    df = spark.read.parquet(src_path)
    total = max(estimated_size_bytes(df), 1)
    n = max(1, math.ceil(total / target_file_bytes))
    if sort_by:
        out = df.repartitionByRange(n, *sort_by).sortWithinPartitions(*sort_by)
    else:
        out = df.repartition(n)
    out.write.mode("overwrite").parquet(dest_path)
    return {
        "files_before": len(df.inputFiles()),
        "files_after": len(spark.read.parquet(dest_path).inputFiles()),
        "estimated_bytes": total,
        "target_files": n,
    }


#: exact simpleString() names accepted by the layout operators; decimal
#: is matched by prefix "decimal(" separately. Exact matching matters:
#: a startswith check on "int" would silently admit interval types, and
#: "date"/"timestamp_ntz" need a pre-conversion because Spark rejects
#: cast(DATE AS DOUBLE) / cast(TIMESTAMP_NTZ AS DOUBLE) at analysis
_ORDERABLE_TYPES = frozenset({
    "tinyint", "smallint", "int", "bigint", "float", "double",
    "date", "timestamp", "timestamp_ntz",
})


def _check_orderable(df: DataFrame, columns: Sequence[str]) -> None:
    for c in columns:
        t = df.schema[c].dataType.simpleString()
        if t not in _ORDERABLE_TYPES and not t.startswith("decimal("):
            raise ValueError(
                f"column {c!r} has non-orderable type {t}; min/max spans "
                "are meaningless under a numeric cast")


def _as_double(df: DataFrame, c: str) -> Column:
    """Numeric projection of an orderable column. DATE and TIMESTAMP_NTZ
    cannot be cast to double directly (DATATYPE_MISMATCH), so they go
    through unix_date / an ntz->ltz cast first — monotone conversions,
    which is all min/max spans and grid normalization need."""
    t = df.schema[c].dataType.simpleString()
    col = F.col(c)
    if t == "date":
        return F.unix_date(col).cast("double")
    if t == "timestamp_ntz":
        return col.cast("timestamp").cast("double")
    return col.cast("double")


def interleave_bits(cols: Sequence[Column], *, bits: int = 16) -> Column:
    """Morton (Z-order) code: interleave the low ``bits`` bits of each
    already-normalized non-negative integer column. Pure codegen
    arithmetic (shift/and/or folds), no UDF. With k columns the result
    uses k·bits bits — keep k·bits <= 62."""
    if not cols:
        raise ValueError("need at least one column")
    if len(cols) * bits > 62:
        raise ValueError("k*bits must fit in a signed 64-bit long")
    k = len(cols)
    code = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(cols):
            bit = F.shiftright(c.cast("long"), i).bitwiseAND(F.lit(1))
            code = code.bitwiseOR(F.shiftleft(bit, i * k + j))
    return code


def zorder_write(
    df: DataFrame,
    dest_path: str,
    zorder_by: Sequence[str],
    *,
    num_files: Optional[int] = None,
    target_file_bytes: int = 128 << 20,
    bits: int = 16,
) -> Mapping[str, int]:
    """Write ``df`` as parquet clustered on a Z-order curve over
    ``zorder_by`` — after this, min/max file statistics prune scans on
    ANY of the curve columns, not just a single sort leader (the
    locality trade linear sort can't make).

    Each column is normalized to a ``bits``-bit grid by its (min, max)
    range — ONE 1-row aggregate, broadcast — then rows are range-
    partitioned and sorted by the interleaved Morton code. Numeric and
    date/timestamp columns work (anything castable to double). NULLs
    map to grid 0 (they sort first, like NULLS FIRST).

    Scale notes: the only corpus shuffle is the range partition on the
    code (plus Spark's internal range sampling); the stats frame is one
    row. File count = plan-size estimate / target, like
    :func:`compact_small_files`.
    """
    if not zorder_by:
        raise ValueError("zorder_by must name at least one column")
    _check_orderable(df, zorder_by)
    stats = df.agg(*[f(_as_double(df, c)).alias(f"__{agg}_{c}")
                     for c in zorder_by
                     for agg, f in (("min", F.min), ("max", F.max))])
    grid_max = (1 << bits) - 1
    z_cols = []
    for c in zorder_by:
        lo, hi = F.col(f"__min_{c}"), F.col(f"__max_{c}")
        span = F.when(hi > lo, hi - lo).otherwise(F.lit(1.0))
        norm = ((_as_double(df, c) - lo) / span * grid_max)
        z_cols.append(F.coalesce(norm, F.lit(0.0)).cast("long"))
    coded = (
        df.crossJoin(F.broadcast(stats))
        .withColumn("__z", interleave_bits(z_cols, bits=bits))
        .select(*df.columns, "__z")
    )
    if num_files is None:
        est = max(estimated_size_bytes(df), 1)
        if est >= 1 << 60:
            # Catalyst's no-stats fallback (defaultSizeInBytes ~ Long.MAX)
            # would yield billions of range partitions and kill the
            # driver — demand an explicit file count instead
            raise ValueError(
                "size estimate unavailable for this plan (no source "
                "statistics); pass num_files explicitly")
        num_files = max(1, math.ceil(est / target_file_bytes))
    (coded.repartitionByRange(num_files, "__z")
     .sortWithinPartitions("__z")
     .drop("__z")
     .write.mode("overwrite").parquet(dest_path))
    return {"num_files": num_files, "bits": bits}


def clustering_report(
    spark: SparkSession,
    path: str,
    columns: Sequence[str],
) -> DataFrame:
    """Measure how well a parquet directory's files cluster each column —
    the acceptance check after :func:`zorder_write` / sorted compaction,
    and the monitor that tells you when accumulated appends have decayed
    the layout enough to re-cluster.

    Per column: ``clustering_factor`` = mean over files of
    (file_max − file_min) / (global_max − global_min) — 1.0 means every
    file spans the whole value range (min/max pruning skips nothing),
    1/n_files is perfect disjoint clustering. ``avg_files_hit`` estimates
    how many files a random point lookup on that column must open
    (Σ per-file span overlap). Returns one row per column:
    (column, n_files, clustering_factor, avg_files_hit).

    Scale shape: ONE scan aggregating min/max per (file, column) — the
    same stats the parquet footers hold, derived engine-side so the
    report needs no filesystem access — then one rollup over that
    files-sized frame covering every column at once (per-file stats are
    persisted; nothing re-scans the directory per column). Constant
    columns report factor 0; an all-null column reports NULL factors —
    never the 0.0 a "layout is perfect, skip re-clustering" monitor
    would silently trust. Columns must be numeric/date/timestamp
    (orderable under a double cast); strings are rejected up front for
    the same reason.
    """
    if not columns:
        raise ValueError("columns must be non-empty")
    df = spark.read.parquet(path)
    _check_orderable(df, columns)
    per_file = (
        df.groupBy(F.input_file_name().alias("__f"))
        .agg(*[f(_as_double(df, c)).alias(f"__{agg}_{c}")
               for c in columns
               for agg, f in (("min", F.min), ("max", F.max))])
        .persist()
    )
    glob = per_file.agg(*[
        f(F.col(f"__{agg}_{c}")).alias(f"__g{agg}_{c}")
        for c in columns
        for agg, f in (("min", F.min), ("max", F.max))])
    aggs = [F.count(F.lit(1)).alias("n_files")]
    for c in columns:
        span = F.col(f"__gmax_{c}") - F.col(f"__gmin_{c}")
        frac = (F.when(span > 0,
                       (F.col(f"__max_{c}") - F.col(f"__min_{c}")) / span)
                .when(F.col(f"__gmin_{c}").isNotNull(), F.lit(0.0)))
        aggs.append(F.round(F.avg(frac), 4).alias(f"__cf_{c}"))
        aggs.append(F.round(F.sum(frac), 2).alias(f"__fh_{c}"))
    row = per_file.crossJoin(F.broadcast(glob)).agg(*aggs).first()
    out = [(c, row["n_files"], row[f"__cf_{c}"], row[f"__fh_{c}"])
           for c in columns]
    per_file.unpersist()
    return spark.createDataFrame(
        out, "column string, n_files bigint, clustering_factor double, "
             "avg_files_hit double")


def analyze_tables(
    spark: SparkSession,
    tables: Sequence[str],
    *,
    columns: Optional[Mapping[str, Sequence[str]]] = None,
) -> dict[str, dict]:
    """Run ``ANALYZE TABLE ... COMPUTE STATISTICS`` (plus optional
    ``FOR COLUMNS``) over catalog tables and return the collected
    row-count/size stats. At 100 TB these statistics are what lets the
    cost-based optimizer reorder joins and pick broadcast sides without
    AQE having to discover sizes at runtime — run after large writes,
    the way a warehouse runs ANALYZE after load.

    ``columns`` maps table -> column names for histogram/NDV stats
    (costlier: one extra scan per table). Returns
    {table: {"rowCount": int|None, "sizeInBytes": int|None}} read back
    from DESCRIBE EXTENDED, so callers can assert stats actually
    landed.
    """
    out: dict[str, dict] = {}
    for t in tables:
        spark.sql(f"ANALYZE TABLE {t} COMPUTE STATISTICS")
        cols = (columns or {}).get(t)
        if cols:
            col_list = ", ".join(cols)
            spark.sql(f"ANALYZE TABLE {t} COMPUTE STATISTICS "
                      f"FOR COLUMNS {col_list}")
        stats_row = [r for r in spark.sql(f"DESCRIBE EXTENDED {t}").collect()
                     if r["col_name"] == "Statistics"]
        info: dict = {"rowCount": None, "sizeInBytes": None}
        if stats_row:
            text = stats_row[0]["data_type"]  # e.g. '123 bytes, 45 rows'
            mb = re.search(r"(\d+)\s+bytes", text)
            mr = re.search(r"(\d+)\s+rows", text)
            info["sizeInBytes"] = int(mb.group(1)) if mb else None
            info["rowCount"] = int(mr.group(1)) if mr else None
        out[t] = info
    return out


def dataset_manifest(
    spark: SparkSession,
    path: str,
    *,
    file_col: str = "file",
) -> DataFrame:
    """Per-file row-count manifest of a parquet dataset: one row per
    physical file (basename) with its row count — the cheap integrity
    check a 100 TB lake needs around partition swaps and compaction
    (a file that vanished or a partial write shows as a manifest diff
    between runs; pair with :func:`~..operators.diff.snapshot_diff`
    keyed on ``file``).

    Shape: ``input_file_name()`` folds into the scan and the groupBy
    shuffles one row per (partition, file) — metadata-scale, even when
    the dataset is not. Row counts come from the data path, so the
    manifest also catches a parquet footer lying about its row count.

    Files are keyed by their path RELATIVE to the dataset root (review
    fix: Spark reuses the same part-file basename across Hive
    partition directories, so a basename key silently merged distinct
    physical files and hid exactly the partial-partition damage this
    manifest exists to catch). Diffing manifests of datasets at
    DIFFERENT roots works as-is — the root prefix is stripped. The
    strip is LENGTH-BASED against the normalized root URI (ADVICE r6
    fix: splitting on the root directory NAME mis-keyed any dataset
    whose root segment recurs earlier in the path, e.g.
    ``/data/events/v1/events`` — manifest_diff then misreported
    unchanged files as removed+added).
    """
    df = spark.read.parquet(path)
    # input_file_name() is a resolved URI (file:///... or s3a://...);
    # build the root-prefix candidates it could render as and strip the
    # matching one by length. Local paths resolve to file: URIs that
    # Spark renders with either one or three slashes depending on
    # version/backend, so both spellings are candidates.
    p = path.rstrip("/")
    if "://" in p or p.startswith("file:"):
        cands = [p]
        if p.startswith("file:///"):
            cands.append("file:/" + p[len("file:///"):])
        elif p.startswith("file:/") and not p.startswith("file://"):
            cands.append("file:///" + p[len("file:/"):])
    else:
        ab = os.path.abspath(p)
        cands = ["file:" + ab, "file://" + ab]
    fname = F.input_file_name()
    rel = None
    for cand in cands:
        pref = cand + "/"
        cond = fname.startswith(pref)
        val = F.substring(fname, len(pref) + 1, 2 ** 31 - 1)
        rel = F.when(cond, val) if rel is None else rel.when(cond, val)
    # fallback for an unanticipated URI rendering: everything after the
    # LAST '/<root-dir-name>/' (last, not first — a recurring root
    # segment earlier in the path must not win), else the full URI
    root = p.split("/")[-1]
    last_seg = F.element_at(
        F.split(fname, re.escape("/" + root + "/")), -1)
    rel = rel.otherwise(F.coalesce(last_seg, fname))
    return (df.groupBy(rel.alias(file_col))
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )


def manifest_diff(
    spark: SparkSession,
    old_path: str,
    new_path: str,
) -> DataFrame:
    """File-level integrity diff of two parquet dataset snapshots:
    :func:`dataset_manifest` each side, then
    :func:`~..operators.diff.snapshot_diff` keyed on the root-relative
    file path. One row per file that was added, removed, or whose ROW
    COUNT changed — the post-swap / post-compaction check that answers
    "did that partition overwrite touch anything it shouldn't have"
    at metadata scale (the shuffled frames are one row per file).

    ``change_type`` semantics: 'removed' rows are files present only
    in ``old_path``; after an intentional compaction expect removed+
    added pairs whose row counts reconcile — assert the TOTALS match
    (sum of n_rows per side) to separate re-layout from data loss.
    """
    from ..operators.diff import snapshot_diff

    old = dataset_manifest(spark, old_path)
    new = dataset_manifest(spark, new_path)
    return snapshot_diff(old, new, ["file"], compare_cols=["n_rows"])
