#!/usr/bin/env python
"""Self-test for oracle_check.py: the local gate must red-flag the
round-1 failure modes it was blind to (VERDICT r1 #3):
  1. a decimal-typed Spark output vs a float64 oracle (dtype split),
  2. a query listed in oracle_sql.json whose dump is missing (crash),
and must still pass an honest query. Exercises the checker end-to-end
via a synthetic verify dir. Exit 0 iff all three behave."""
import json
import subprocess
import sys
import tempfile
from decimal import Decimal
from pathlib import Path

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

root = Path(tempfile.mkdtemp(prefix="oc_selftest_"))
sf = root / "sf"
out = root / "out"
sf.mkdir()
out.mkdir()

# minimal "tables" (every name oracle_check registers must exist)
for t in ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split():
    pq.write_table(pa.table({"x": [1, 2, 3]}), sf / f"{t}.parquet")

# 1. honest query: bigint counts, matches oracle
(out / "good").mkdir()
pq.write_table(pa.table({"n": pa.array([3], type=pa.int64())}),
               out / "good" / "part-0.parquet")

# 2. decimal poison: Spark-style decimal(18,2) output; oracle returns DOUBLE
(out / "decimal_poison").mkdir()
pq.write_table(
    pa.table({"s": pa.array([Decimal("6.00")], type=pa.decimal128(18, 2))}),
    out / "decimal_poison" / "part-0.parquet")

# 3. array-valued cells that differ: raw x != y on numpy arrays raises —
# the first-diff finder must report cleanly, not crash
(out / "array_diff").mkdir()
pq.write_table(
    pa.table({"a": pa.array([[1, 2], [3, 4]], type=pa.list_(pa.int64()))}),
    out / "array_diff" / "part-0.parquet")

# 4. values differ only in no-scalar-localizable ways (equal scalar cells
# but values_equal False via length/NaN subtleties is hard to fabricate;
# instead: arrays equal except one cell) — covered by array_diff's clean
# row report; additionally a scalar diff sanity row
(out / "scalar_diff").mkdir()
pq.write_table(pa.table({"n": pa.array([1, 99, 3], type=pa.int64())}),
               out / "scalar_diff" / "part-0.parquet")

oracle = {
    "good": "SELECT count(*) AS n FROM region",
    "decimal_poison": "SELECT cast(sum(x) as double) AS s FROM region",
    "crashed_query": "SELECT 1 AS one",  # no dump dir on purpose
    "array_diff": "SELECT [x, x] AS a FROM region ORDER BY x LIMIT 2",
    "scalar_diff": "SELECT x AS n FROM region ORDER BY x",
}
(out / "oracle_sql.json").write_text(json.dumps(oracle))
(out / "declared.json").write_text(json.dumps(
    {"good": "ok", "decimal_poison": "ok",
     "crashed_query": "error: SimulatedCrash: boom"}))

proc = subprocess.run(
    [sys.executable, str(Path(__file__).parent / "oracle_check.py"),
     str(out), str(sf)],
    capture_output=True, text=True)
report = proc.stdout

failures = []
if proc.returncode == 0:
    failures.append("checker exited 0 despite poisoned queries")
if "OK        good" not in report:
    failures.append("honest query not passed")
if "decimal_poison" not in report or "decimal" not in report.lower():
    failures.append("decimal dtype split not flagged")
if "crashed_query" not in report or "MISSING" not in report:
    failures.append("missing dump not flagged")
if "Traceback" in proc.stderr or "Traceback" in report:
    failures.append("checker crashed instead of reporting a clean FAIL")
if "array_diff" not in report or "values[a]" not in report:
    failures.append("array-cell diff not reported cleanly")
if "values[n] first diff row 1" not in report:
    failures.append("scalar first-diff row not localized (expected row 1)")

if failures:
    print(report)
    print("SELFTEST FAILED:", "; ".join(failures))
    sys.exit(1)
print("oracle_check selftest OK: decimal split flagged, missing dump "
      "flagged, honest query passed")
