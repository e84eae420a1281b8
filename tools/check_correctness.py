"""Local stand-in for the driver's correctness gate.

Runs every queries() entry against its oracle_sql() via DuckDB at a given
scale factor, comparing row count + order-insensitive value multiset
(values stringified, columns sorted by name — like the driver). Usage:

    python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import duckdb  # noqa: E402
import pyarrow as pa  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

from spark_expectations_spark.queries import ORACLES, QUERIES, TABLES  # noqa: E402


def norm_val(v):
    import datetime
    import math
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(round(v, 9))
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    return str(v)


def frame_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(norm_val(r[i]) for i in order) for r in rows)


def driver_canon_error(cols, rows):
    """Replicate the external driver's pandas canonicalization
    (sort_values over all columns -> Categorical -> factorize) and
    return the error string if it cannot digest this frame. This is
    the failure mode behind round-5's only red row: a value-correct
    query with an array-typed output column errors INSIDE the driver
    harness, not in Spark — catch it locally."""
    import pandas as pd

    pdf = pd.DataFrame(rows, columns=list(cols))
    order = sorted(cols)
    try:
        pdf[order].sort_values(order)
        # sort_values on a SINGLE column argsorts directly without
        # factorizing, so a one-array-column frame would slip through —
        # run each column through Categorical (what the driver's
        # multi-column lexsort does internally) explicitly
        for c in order:
            pd.Categorical(pdf[c], ordered=True)
    except Exception as e:  # noqa: BLE001 - reporting, not handling
        return f"{type(e).__name__}: {str(e)[:120]}"
    return None


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("correctness-check")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "6g")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    n_pass = n_fail = 0
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL  {name}: spark error: {type(e).__name__}: {str(e)[:200]}")
            n_fail += 1
            continue
        oracle = ORACLES.get(name)
        if oracle is None:
            print(f"ROWS  {name}: {len(s_rows)} rows (no oracle) [{time.time()-t0:.1f}s]")
            n_pass += 1
            continue
        try:
            tbl = con.execute(oracle).fetch_arrow_table()
            d_cols = tbl.column_names
            d_rows = [tuple(d[c] for c in d_cols) for d in tbl.to_pylist()]
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {str(e)[:200]}")
            n_fail += 1
            continue
        # Representation-hazard gate: the external driver hashes stringified
        # values, so an oracle column typed decimal128 (uncast sum() ->
        # HUGEINT/DECIMAL) stringifies differently from Spark's int64/double
        # even when every value is equal. Enforce int/float/bool/str/date
        # arrow types only (VERDICT r01 items 1-2).
        bad = [
            f"{fld.name}:{fld.type}" for fld in tbl.schema
            if pa.types.is_decimal(fld.type)
        ]
        bad += [
            f"spark:{f.name}:{f.dataType.simpleString()}"
            for f in sdf.schema.fields
            if f.dataType.simpleString().startswith("decimal")
        ]
        if bad:
            print(f"FAIL  {name}: decimal-typed output columns (driver hash hazard): {bad}")
            n_fail += 1
            continue
        canon_err = (driver_canon_error(s_cols, s_rows)
                     or driver_canon_error(d_cols, d_rows))
        if canon_err:
            print(f"FAIL  {name}: driver canonicalizer cannot digest "
                  f"this frame: {canon_err}")
            n_fail += 1
            continue
        if sorted(s_cols) != sorted(d_cols):
            print(f"FAIL  {name}: columns differ spark={sorted(s_cols)} duck={sorted(d_cols)}")
            n_fail += 1
            continue
        sm, dm = frame_multiset(s_cols, s_rows), frame_multiset(d_cols, d_rows)
        if len(sm) != len(dm):
            print(f"FAIL  {name}: row count spark={len(sm)} duck={len(dm)}")
            n_fail += 1
            continue
        if sm != dm:
            diffs = [(a, b) for a, b in zip(sm, dm) if a != b][:3]
            print(f"FAIL  {name}: values differ; first diffs: {diffs}")
            n_fail += 1
            continue
        print(f"OK    {name}: {len(sm)} rows [{time.time()-t0:.1f}s]")
        n_pass += 1
    print(f"\n{n_pass} ok, {n_fail} fail")
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
