#!/usr/bin/env python
"""Local replica of the driver's correctness gate: run every
queries() entry on Spark and its oracle_sql() on DuckDB over the same
sf dir; compare row counts, column names, and order-insensitive values.

Usage: python scripts/check_correctness.py [sf_dir] [name_filter]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.10g}"
    return str(v)


def frame_key(pdf):
    cols = sorted(pdf.columns)
    rows = sorted(
        tuple(norm_cell(v) for v in row)
        for row in pdf[cols].itertuples(index=False, name=None)
    )
    return cols, rows


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    filt = sys.argv[2] if len(sys.argv) > 2 else ""

    import __spark_entry__ as entry
    from cuely_spark.session import get_spark

    spark = get_spark(app="check-correctness", cores=8,
                      shuffle_partitions=8, driver_mem="8g")
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = entry.queries()
    oracles = entry.oracle_sql()
    n_pass = n_fail = n_rows_only = 0
    for name, fn in qs.items():
        if filt and filt not in name:
            continue
        t0 = time.time()
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error {type(e).__name__}: {e}")
            n_fail += 1
            continue
        dt = time.time() - t0
        sql = oracles.get(name)
        if sql is None:
            print(f"ROWS  {name}: {len(got)} rows ({dt:.1f}s, no oracle)")
            n_rows_only += 1
            continue
        try:
            exp = con.execute(sql).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error {type(e).__name__}: {e}")
            n_fail += 1
            continue
        gc, gr = frame_key(got)
        ec, er = frame_key(exp)
        if gc != ec:
            print(f"FAIL  {name}: columns {gc} != {ec}")
            n_fail += 1
        elif gr != er:
            diff_g = [r for r in gr if r not in set(map(tuple, er))][:3]
            diff_e = [r for r in er if r not in set(map(tuple, gr))][:3]
            print(f"FAIL  {name}: values differ "
                  f"({len(gr)} vs {len(er)} rows)")
            print(f"      spark-only: {diff_g}")
            print(f"      duck-only:  {diff_e}")
            n_fail += 1
        else:
            print(f"PASS  {name}: {len(gr)} rows ({dt:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
