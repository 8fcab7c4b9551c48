#!/usr/bin/env python
"""Local mirror of the driver's t2 correctness gate (SURVEY §5.1).

Usage: python tools/oracle_check.py <verify_out_dir> <sf_dir>

Compares through the SAME path the driver uses (VERDICT r1 #3):
  - Spark side : pandas read of the dumped parquet (pyarrow engine),
  - oracle side: duckdb con.execute(sql).df().
This surfaces dtype-level mismatches the old str()-canonicalization
erased — e.g. Spark decimal -> pandas object(Decimal) vs DuckDB
DECIMAL/HUGEINT -> float64, which the driver hash-fails.

Checks, per query:
  1. every key in oracle_sql.json (and declared.json, if Verify wrote
     one) must have a dump directory — a crashed query is a FAILURE,
     not a skip;
  2. column name sets equal;
  3. after sorting columns by name: pandas dtypes must be equal
     (any `object` dtype column is additionally flagged unless both
     sides are plain str);
  4. values exactly equal in emitted order (both sides carry ORDER BY).

Exit 0 iff everything passes.
"""
import glob
import json
import sys
from decimal import Decimal
from pathlib import Path

import duckdb
import numpy as np
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def load_spark(out_dir: Path, name: str):
    files = sorted(glob.glob(str(out_dir / name / "*.parquet")))
    if not files:
        return None
    return pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)


def col_repr(s: pd.Series) -> str:
    d = str(s.dtype)
    if d == "object":
        kinds = {type(v).__name__ for v in s.head(20) if v is not None}
        d += f"({'/'.join(sorted(kinds)) or 'empty'})"
    return d


def _norm(v):
    """Array-valued cells (numpy arrays / lists) -> tuples so == is scalar."""
    if isinstance(v, np.ndarray):
        return tuple(_norm(x) for x in v.tolist())
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    return v


def cells_differ(x, y) -> bool:
    """Scalar-or-array cell comparison that never raises: arrays are
    normalized to tuples first (raw numpy `x != y` on arrays raises
    inside a generator, turning a clean FAIL into a crash)."""
    x, y = _norm(x), _norm(y)
    if not isinstance(x, tuple) and not isinstance(y, tuple):
        try:
            if pd.isna(x) and pd.isna(y):
                return False
        except (TypeError, ValueError):
            pass
    try:
        return not bool(x == y)
    except (TypeError, ValueError):
        return True


def values_equal(a: pd.Series, b: pd.Series) -> bool:
    if len(a) != len(b):
        return False
    av, bv = a.to_numpy(), b.to_numpy()
    if a.dtype.kind == "f" and b.dtype.kind == "f":
        return bool(np.array_equal(av, bv, equal_nan=True))
    if a.dtype == object:
        av = np.array([_norm(x) for x in av.tolist()], dtype=object)
        bv = np.array([_norm(x) for x in bv.tolist()], dtype=object)
    # nullable/object/datetime: elementwise with None==None
    for x, y in zip(av.tolist(), bv.tolist()):
        if x is None and y is None:
            continue
        if (x is None) != (y is None):
            return False
        if isinstance(x, float) and isinstance(y, float):
            if x != y and not (np.isnan(x) and np.isnan(y)):
                return False
        elif x != y:
            return False
    return True


def main():
    out_dir, sf_dir = Path(sys.argv[1]), sys.argv[2]
    oracle = json.loads((out_dir / "oracle_sql.json").read_text())
    declared = {}
    if (out_dir / "declared.json").exists():
        declared = json.loads((out_dir / "declared.json").read_text())

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    dumped = {p.name for p in out_dir.iterdir() if p.is_dir()}
    expected = set(oracle) | set(declared) | dumped
    failures, passed, no_oracle = [], 0, 0

    for name in sorted(expected):
        if name not in dumped:
            why = declared.get(name, "no dump directory (query crashed in Verify?)")
            failures.append((name, f"MISSING DUMP: {why}"))
            print(f"  MISSING!  {name}: {why}")
            continue
        sdf = load_spark(out_dir, name)
        if name not in oracle:
            n = 0 if sdf is None else len(sdf)
            if n == 0:
                failures.append((name, "rows-only query returned 0 rows"))
                print(f"  EMPTY!    {name}")
            else:
                no_oracle += 1
                print(f"  ROWS-ONLY {name} ({n} rows)")
            continue
        try:
            odf = con.execute(oracle[name]).df()
        except Exception as e:
            failures.append((name, f"oracle exec error: {e}"))
            print(f"  ERROR     {name}: {e}")
            continue

        if sorted(sdf.columns) != sorted(odf.columns):
            failures.append(
                (name, f"schema: spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}"))
            print(f"  SCHEMA!   {name}")
            continue
        sdf = sdf[sorted(sdf.columns)]
        odf = odf[sorted(odf.columns)]
        if len(sdf) != len(odf):
            failures.append((name, f"rowcount: spark={len(sdf)} oracle={len(odf)}"))
            print(f"  COUNT!    {name}: spark={len(sdf)} oracle={len(odf)}")
            continue

        bad = []
        for c in sdf.columns:
            sr, orr = col_repr(sdf[c]), col_repr(odf[c])
            # normalize datetime unit spellings: driver compares values
            # via pandas; ns-vs-us datetime64 columns ARE a real split
            if sr != orr:
                bad.append(f"dtype[{c}]: spark={sr} oracle={orr}")
                continue
            if sdf[c].dtype == object:
                if any(isinstance(v, Decimal) for v in sdf[c].head(20)):
                    bad.append(f"decimal-object[{c}] would hash-fail in driver")
            if not values_equal(sdf[c], odf[c]):
                i = next(
                    (i for i, (x, y) in enumerate(zip(sdf[c].tolist(), odf[c].tolist()))
                     if cells_differ(x, y)), None)
                if i is None:
                    # e.g. length mismatch upstream, or a difference the
                    # per-cell walk can't localize — report honestly
                    # instead of pointing at iloc[-1] (the LAST row)
                    bad.append(f"values[{c}] differ (no scalar first-diff located)")
                else:
                    bad.append(
                        f"values[{c}] first diff row {i}: "
                        f"spark={sdf[c].iloc[i]!r} oracle={odf[c].iloc[i]!r}")
        if bad:
            failures.append((name, "; ".join(bad)))
            print(f"  VALUES!   {name}: " + "; ".join(bad[:3]))
        else:
            passed += 1
            print(f"  OK        {name} ({len(sdf)} rows)")

    print(f"\n{passed} ok, {no_oracle} rows-only, {len(failures)} failed "
          f"of {len(expected)} queries")
    for n, why in failures:
        print(f"  FAIL {n}: {why}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
