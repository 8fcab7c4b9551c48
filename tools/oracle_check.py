#!/usr/bin/env python
"""Local mirror of the driver's t2 correctness gate (SURVEY §5.1).

Usage: python tools/oracle_check.py <verify_out_dir> <sf_dir>

For each query dumped by `graft.Verify` into <verify_out_dir>/<name>/,
runs the matching oracle SQL from oracle_sql.json in DuckDB over the
same parquet tables, and compares:
  - schema: column names (sorted),
  - rows: exact values, both in emitted order and canonically sorted.

Exit code 0 iff every query matches. Prints a per-query verdict plus
first-diff details on mismatch.
"""
import json
import math
import sys
from pathlib import Path

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(v):
    """Canonicalize a cell for comparison (mirror of a value-hash)."""
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision; bit-exactness required
    if isinstance(v, list):
        return tuple(canon(x) for x in v)
    # Decimal, int, str, datetime → via str
    return str(v)


def rows_of(con, sql):
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    return cols, cur.fetchall()


def main():
    out_dir, sf_dir = Path(sys.argv[1]), sys.argv[2]
    oracle = json.loads((out_dir / "oracle_sql.json").read_text())

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    failures, passed, no_oracle = [], 0, 0
    names = sorted(p.name for p in out_dir.iterdir() if p.is_dir())
    for name in names:
        if name not in oracle:
            n = con.execute(
                f"SELECT count(*) FROM read_parquet('{out_dir}/{name}/*.parquet')").fetchone()[0]
            status = "ROWS-ONLY" if n > 0 else "EMPTY!"
            if n == 0:
                failures.append((name, "rows-only query returned 0 rows"))
            else:
                no_oracle += 1
            print(f"  {status:9} {name} ({n} rows)")
            continue
        try:
            scols, srows = rows_of(
                con, f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            ocols, orows = rows_of(con, oracle[name])
        except Exception as e:
            failures.append((name, f"exec error: {e}"))
            print(f"  ERROR     {name}: {e}")
            continue

        if sorted(scols) != sorted(ocols):
            failures.append((name, f"schema: spark={sorted(scols)} oracle={sorted(ocols)}"))
            print(f"  SCHEMA!   {name}: spark={sorted(scols)} oracle={sorted(ocols)}")
            continue
        # align column order by sorted name (driver sorts by name)
        sidx = [scols.index(c) for c in sorted(scols)]
        oidx = [ocols.index(c) for c in sorted(ocols)]
        s = [tuple(canon(r[i]) for i in sidx) for r in srows]
        o = [tuple(canon(r[i]) for i in oidx) for r in orows]
        if len(s) != len(o):
            failures.append((name, f"rowcount: spark={len(s)} oracle={len(o)}"))
            print(f"  COUNT!    {name}: spark={len(s)} oracle={len(o)}")
            continue
        if s == o:
            passed += 1
            print(f"  OK        {name} ({len(s)} rows)")
            continue
        if sorted(s) == sorted(o):
            failures.append((name, "values match but ROW ORDER differs"))
            print(f"  ORDER!    {name}: same multiset, different order")
            continue
        # first differing row
        diff = next(
            (i, a, b) for i, (a, b) in enumerate(zip(s, o)) if a != b)
        failures.append((name, f"first diff at row {diff[0]}"))
        print(f"  VALUES!   {name}: row {diff[0]}\n    spark : {diff[1]}\n    oracle: {diff[2]}")

    print(f"\n{passed} ok, {no_oracle} rows-only, {len(failures)} failed "
          f"of {len(names)} queries")
    for n, why in failures:
        print(f"  FAIL {n}: {why}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
