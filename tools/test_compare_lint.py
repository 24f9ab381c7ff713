#!/usr/bin/env python3
"""Red demonstration for compare.py's oracle output-type lint.

Proves the three cases the lint must catch (the q99 class) and the two
it must pass, without any test data: DuckDB widens sum(BIGINT) to
HUGEINT and exact '/' on integers to... actually DOUBLE, but explicit
DECIMAL casts and integer '//' sums still surface; any such output
column would render as float64 through the driver's pandas comparator
and flip the value hash against Spark's int64.

Run: python3 tools/test_compare_lint.py  (exits 0 iff all assertions hold)
"""
import duckdb
from compare import lint_oracle_types

con = duckdb.connect()

# MUST flag: sum over BIGINT widens to HUGEINT (exactly q99's `chars`).
r = lint_oracle_types(con, "SELECT sum(x) AS chars FROM (SELECT CAST(1 AS BIGINT) AS x)")
assert r and "ORACLE-TYPE" in r and "chars" in r, r

# MUST flag: an explicit HUGEINT output column.
r = lint_oracle_types(con, "SELECT CAST(7 AS HUGEINT) AS v")
assert r and "ORACLE-TYPE" in r, r

# MUST flag: DECIMAL output.
r = lint_oracle_types(con, "SELECT CAST(1.5 AS DECIMAL(10,2)) AS v")
assert r and "ORACLE-TYPE" in r, r

# MUST pass: the q99 fix shape — the HUGEINT sum cast back to BIGINT.
r = lint_oracle_types(con, "SELECT CAST(sum(x) AS BIGINT) AS chars FROM (SELECT CAST(1 AS BIGINT) AS x)")
assert r is None, r

# MUST pass: doubles and strings are rendered identically on both paths.
r = lint_oracle_types(con, "SELECT 1.5::DOUBLE AS d, 'a' AS s, CAST(1 AS BIGINT) AS i")
assert r is None, r

# Broken SQL surfaces as an oracle error, not a crash.
r = lint_oracle_types(con, "SELECT FROM nowhere!!")
assert r and r.startswith("ORACLE ERROR"), r

print("compare-lint selftest: 6/6 OK")
