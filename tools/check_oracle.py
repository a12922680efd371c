#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [query ...]

Loads each Spark result parquet written by graft.Verify, runs the matching
oracle SQL from oracle_sql.json in DuckDB (tables = parquet files in sfDir),
sorts columns by name, and compares values row by row (row order preserved —
queries must ORDER BY). Reports schema and value diffs per query.
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(rows):
    out = []
    for r in rows:
        out.append(tuple(float(v) if isinstance(v, (int,)) and not isinstance(v, bool) and False else v
                         for v in r))
    return out


def values_equal(a, b):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, bool) or isinstance(b, bool):
        return bool(a) == bool(b)
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return a == b
        if math.isnan(fa) and math.isnan(fb):
            return True
        return fa == fb
    if isinstance(a, int) and isinstance(b, int):
        return a == b
    return a == b


def connect(sf_dir):
    """DuckDB connection with one view per testdata table."""
    con = duckdb.connect()
    import os
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        # Spark-written tables (e.g. ScaleGen output) are DIRECTORIES of
        # part files; the driver's testdata tables are single files.
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
    return con


def check_one(con, out_dir, name, sql):
    """Compare one dumped Spark result against its oracle SQL.

    Returns (passed: bool, line: str) — line is the PASS/FAIL report the
    caller prints/logs (shared by the batch main() below and the
    per-query-flushing sf10 sweep in sweep.py).
    """
    try:
        spark_rel = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
        scols = sorted(spark_rel.columns)
        spark = con.sql(
            f"SELECT {', '.join(repr_col(c) for c in scols)} FROM spark_rel").fetchall()
        duck_rel = con.sql(sql)
        dcols = sorted(duck_rel.columns)
        duck_rows = con.sql(
            f"SELECT {', '.join(repr_col(c) for c in dcols)} FROM duck_rel").fetchall()
    except Exception as e:
        return False, f"FAIL {name}: ERROR {e}"

    if scols != dcols:
        return False, f"FAIL {name}: columns spark={scols} duck={dcols}"
    if len(spark) != len(duck_rows):
        return False, f"FAIL {name}: rowcount spark={len(spark)} duck={len(duck_rows)}"
    for i, (sr, dr) in enumerate(zip(spark, duck_rows)):
        if not all(values_equal(a, b) for a, b in zip(sr, dr)):
            return False, (f"FAIL {name}: row {i} differs\n  cols : {scols}\n"
                           f"  spark: {sr}\n  duck : {dr}")
    # type report (informational): compare duckdb-inferred types
    stypes = [str(t) for t in spark_rel.types]
    dtypes = [str(t) for t in duck_rel.types]
    tnote = "" if sorted(zip(spark_rel.columns, stypes)) == sorted(zip(duck_rel.columns, dtypes)) \
        else f"  [type diff: spark={sorted(zip(spark_rel.columns, stypes))} duck={sorted(zip(duck_rel.columns, dtypes))}]"
    return True, f"PASS {name} ({len(spark)} rows){tnote}"


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = connect(sf_dir)
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        ok, line = check_one(con, out_dir, name, sql)
        print(line)
        if ok:
            n_pass += 1
        else:
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


def repr_col(c):
    return f'"{c}"'


if __name__ == "__main__":
    main()
