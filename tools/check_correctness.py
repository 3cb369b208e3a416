#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare (t2).

For each SparkEntry query result dumped by Verify into OUTDIR/<name>/,
runs the oracle SQL from OUTDIR/oracle_sql.json against the same sf tables,
sorts columns by name, and compares row counts, schemas (loosely) and
values (bit-exact for floats, with a near-miss diagnostic at 1e-9 rel).
"""
import json, math, os, sys
import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from graft_tables import create_views

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out"
SF = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
# Optional 4th arg: comma-separated query subset — pairs with Verify's own
# subset arg so a touched-query re-check (the finding-49 commit policy)
# doesn't drown in missing-dir FAILs for the queries it didn't dump.
ONLY = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None

con = duckdb.connect()
create_views(con, SF)

# utf-8 explicitly: the dump holds non-ASCII SQL literals (mojibake repair
# chain) — a latin-1 locale default would silently double-corrupt them.
oracle = json.load(open(f"{OUT}/oracle_sql.json", encoding="utf-8"))

def norm(v):
    if isinstance(v, float):
        return v
    return v

def driver_order(rows, cols):
    """Replica of the driver comparator's row ordering: load into pandas,
    sort columns by name, row-sort over ALL columns. Returns the input
    rows (original Python values, NOT pandas-coerced ones) in that order.

    Each side is ordered INDEPENDENTLY by its own values — exactly like
    the driver — so when the two sides genuinely differ in a sort-key
    column, the per-row diff below may pair shifted rows: the FAIL
    verdict is still correct, but treat first_bad as "somewhere in this
    region", not as an exact row pairing.

    Crucially this RAISES on comparator-hostile cells — a top-level array
    column dies in pandas factorize with "unhashable type: 'numpy.ndarray'"
    — exactly like the driver (q_profile_quantiles, round 15). The old
    zip-in-dump-order compare structurally could not reproduce that class.
    """
    if len(rows) <= 1:
        # The driver still builds the frame for 0- AND 1-row dumps; mirror
        # both (ADVICE r16: the 0-row case was skipped, so an empty
        # hostile-dtype output would pass here and crash the driver).
        pd.DataFrame(list(rows), columns=cols)[sorted(cols)] \
            .sort_values(by=sorted(cols), kind="mergesort")
        return rows
    df = pd.DataFrame(list(rows), columns=cols)[sorted(cols)]
    idx = df.sort_values(by=sorted(cols), kind="mergesort").index
    return [rows[i] for i in idx]

def values_equal(a, b):
    if a is None and b is None:
        return True, False
    if isinstance(a, float) and isinstance(b, float):
        if a == b or (math.isnan(a) and math.isnan(b)):
            return True, False
        if b != 0 and abs(a - b) / max(abs(a), abs(b)) < 1e-9:
            return False, True  # near miss
        return False, False
    if isinstance(a, list) and isinstance(b, list):
        if len(a) != len(b):
            return False, False
        near = False
        for x, y in zip(a, b):
            eq, nr = values_equal(x, y)
            if not eq and not nr:
                return False, False
            near = near or nr
        return (not near), near
    return (a == b), False

n_pass = n_near = n_fail = n_rowsonly = n_types = 0
for name in sorted(oracle):
    if ONLY is not None and name not in ONLY:
        continue
    sql = oracle[name]
    try:
        got = con.execute(
            f"SELECT * FROM read_parquet('{OUT}/{name}/*.parquet')").fetchall()
        got_cols = [d[0] for d in con.description]
        exp = con.execute(sql).fetchall()
        exp_cols = [d[0] for d in con.description]
        # Strict per-column TYPE parity (the driver hashes typed values:
        # a DuckDB-widened HUGEINT pandas-converts to float64 and
        # hash-fails against a bit-equal Spark BIGINT — finding 48).
        got_t = dict((c, t) for c, t, *_ in con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{OUT}/{name}/*.parquet')").fetchall())
        exp_t = dict((c, t) for c, t, *_ in con.execute(f"DESCRIBE {sql}").fetchall())
    except Exception as e:
        print(f"FAIL {name}: exec error {e}")
        n_fail += 1
        continue
    tmism = [(c, got_t.get(c), exp_t.get(c)) for c in sorted(set(got_t) | set(exp_t))
             if got_t.get(c) != exp_t.get(c)]
    if tmism:
        # A type mismatch IS a failure for this query (ADVICE r13): the
        # driver hashes TYPED values, so bit-equal values with divergent
        # types hash-fail — the exact finding-48 bug class this check
        # exists for must not read as green.
        print(f"TYPES-FAIL {name}: spark-vs-oracle column types differ: {tmism}")
        n_types += 1
        n_fail += 1
        continue
    # sort columns by name (driver behavior)
    gi = sorted(range(len(got_cols)), key=lambda i: got_cols[i])
    ei = sorted(range(len(exp_cols)), key=lambda i: exp_cols[i])
    if sorted(got_cols) != sorted(exp_cols):
        print(f"FAIL {name}: columns {sorted(got_cols)} vs {sorted(exp_cols)}")
        n_fail += 1
        continue
    if len(got) != len(exp):
        print(f"FAIL {name}: rows {len(got)} vs {len(exp)}")
        n_fail += 1
        continue
    # Row-sort both sides the way the driver does (pandas). Raises on
    # comparator-hostile cell types — that's a FAIL, like the driver's err.
    try:
        got = driver_order(got, got_cols)
        exp = driver_order(exp, exp_cols)
    except Exception as e:
        print(f"FAIL {name}: driver-sort replica error {type(e).__name__}: {e}")
        n_fail += 1
        continue
    bad = near = 0
    first_bad = None
    for r, (g, e) in enumerate(zip(got, exp)):
        for a, b in zip([g[i] for i in gi], [e[i] for i in ei]):
            eq, nr = values_equal(a, b)
            if nr:
                near += 1
                if first_bad is None:
                    first_bad = (r, a, b, "near")
            elif not eq:
                bad += 1
                if first_bad is None:
                    first_bad = (r, a, b, "bad")
    if bad == 0 and near == 0:
        print(f"PASS {name} ({len(got)} rows)")
        n_pass += 1
    elif bad == 0:
        print(f"NEAR {name}: {near} near-misses, first {first_bad}")
        n_near += 1
    else:
        print(f"FAIL {name}: {bad} mismatches ({near} near), first {first_bad}")
        n_fail += 1

import os
for name in sorted(os.listdir(OUT)):
    if ONLY is not None and name not in ONLY:
        continue
    if name.startswith("q_") and name not in oracle:
        try:
            n = con.execute(
                f"SELECT count(*) FROM read_parquet('{OUT}/{name}/*.parquet')").fetchone()[0]
            status = "ROWS-ONLY-PASS" if n > 0 else "ROWS-ONLY-EMPTY"
            print(f"{status} {name} ({n} rows)")
            n_rowsonly += 1
        except Exception as e:
            print(f"ROWS-ONLY-FAIL {name}: {e}")
print(f"\n== {n_pass} pass, {n_near} near, {n_fail} fail, {n_rowsonly} rows-only, "
      f"{n_types} type-mismatch ==")
# Exit nonzero on any failure so 'green' can be asserted by exit code,
# not by eyeballing 'fail 0' (ADVICE r13).
sys.exit(1 if (n_fail or n_near or n_types) else 0)
