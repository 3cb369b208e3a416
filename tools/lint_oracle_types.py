#!/usr/bin/env python3
"""Oracle output-type lint (the HUGEINT bug class, PLANS.md finding 48).

The driver's comparator hashes TYPED values: DuckDB widens uncast integer
aggregates (sum(BIGINT) -> HUGEINT, x // y stays HUGEINT), so an oracle
whose final SELECT leaves such an expression uncast hash-FAILS against a
bit-equal Spark BIGINT column (q_text_qmodel_calibration, rounds 10-12).
Value equality is not hash equality.

This lint runs DuckDB `DESCRIBE` (no execution) on every oracle in a
dumped oracle_sql.json and asserts each output column's type is in the
closed allowed set below — the set the driver's hasher is known to match
against Spark's emitted schema. Any widened type (HUGEINT, UHUGEINT,
DECIMAL, UBIGINT, ...) is an error naming the query and column.

Usage: lint_oracle_types.py <oracle_sql.json> [sf_dir]
Exit 0 = clean; exit 1 = violations (listed on stdout).
"""
import json
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from graft_tables import create_views

# Types every green oracle in the registry resolves to (r13 survey over all
# 271: BIGINT 519, VARCHAR 129, DOUBLE 97, BOOLEAN 91, INTEGER 53) plus the
# remaining Spark-representable scalars a future oracle may legitimately
# emit. Deliberately closed: a new type should be a conscious decision, not
# DuckDB widening. SCALARS ONLY — the driver comparator row-sorts dumps
# with pandas, and a top-level list/array column crashes its sort
# ("unhashable type: 'numpy.ndarray'", q_profile_quantiles round 15), so
# list types are banned outright: flatten to per-element scalar columns.
ALLOWED = {
    "BIGINT", "INTEGER", "DOUBLE", "VARCHAR", "BOOLEAN", "DATE",
    "TIMESTAMP", "TIMESTAMP WITH TIME ZONE",
}

def main():
    oracle_path = sys.argv[1]
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"
    con = duckdb.connect()
    create_views(con, sf)
    sqls = json.load(open(oracle_path))
    violations = []
    for name in sorted(sqls):
        try:
            rows = con.execute(f"DESCRIBE {sqls[name]}").fetchall()
        except Exception as e:
            violations.append((name, "<describe>", f"DESCRIBE failed: {e}"))
            continue
        for col, typ, *_ in rows:
            if typ not in ALLOWED:
                violations.append((name, col, typ))
    for name, col, typ in violations:
        print(f"VIOLATION {name}.{col}: {typ}")
    print(f"{len(sqls)} oracles, {len(violations)} violations")
    return 1 if violations else 0

if __name__ == "__main__":
    sys.exit(main())
