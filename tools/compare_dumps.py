#!/usr/bin/env python3
"""Partition-invariance certificate: diff two Verify dumps row by row.

Runs the driver's own comparison shape (rows in order, bit-exact values)
between two `graft.Verify` output directories produced under DIFFERENT
Spark configurations (e.g. SPARK_GRAFT_CPUS=4 vs 13 — which changes both
scan parallelism and spark.sql.shuffle.partitions). Any query whose rows
differ between the two dumps is nondeterministic UNDER THE ENGINE'S OWN
KNOBS — an under-keyed Spark-side sort, a cross-partition float-sum
order sensitivity, or driver-state leakage — i.e. a red row waiting for
the next AQE plan change, even if today's oracle compare passes.

Usage: compare_dumps.py <dumpA> <dumpB>
Exit 0 = every query bit-identical; exit 1 = differences (listed).
"""
import os
import sys

import duckdb


def values_equal(u, v):
    """Bit-exact with NaN==NaN, recursing into list/array cells — a NaN
    inside a DOUBLE[] column must compare equal to itself (plain == on
    lists would report identical dumps as different)."""
    if u is None and v is None:
        return True
    if isinstance(u, float) and isinstance(v, float):
        return u == v or (u != u and v != v)
    if isinstance(u, (list, tuple)) and isinstance(v, (list, tuple)):
        return len(u) == len(v) and all(
            values_equal(x, y) for x, y in zip(u, v))
    return u == v


def main():
    a, b = sys.argv[1], sys.argv[2]
    con = duckdb.connect()

    def dirs(root):
        return set(d for d in os.listdir(root)
                   if d.startswith("q_") and os.path.isdir(os.path.join(root, d)))

    qa, qb = dirs(a), dirs(b)
    qs = sorted(qa | qb)  # union: a query present in only ONE dump is a
    missing = sorted((qa - qb) | (qb - qa))  # coverage hole, whichever side
    bad = []
    for name in qs:
        if name in missing:
            continue
        try:
            ra = con.execute(
                f"SELECT * FROM read_parquet('{a}/{name}/*.parquet')").fetchall()
            ca = [d[0] for d in con.description]
            rb = con.execute(
                f"SELECT * FROM read_parquet('{b}/{name}/*.parquet')").fetchall()
            cb = [d[0] for d in con.description]
        except Exception as e:
            bad.append((name, f"read error: {e}"))
            continue
        if ca != cb:
            bad.append((name, f"columns {ca} vs {cb}"))
        elif len(ra) != len(rb):
            bad.append((name, f"rows {len(ra)} vs {len(rb)}"))
        else:
            for i, (x, y) in enumerate(zip(ra, rb)):
                if not all(values_equal(u, v) for u, v in zip(x, y)):
                    bad.append((name, f"first diff at row {i}: {x} vs {y}"))
                    break
    for name in missing:
        side = f"absent in {b}" if name in qa else f"absent in {a}"
        print(f"MISSING {name}: {side}")
    for name, detail in bad:
        print(f"DIFF {name}: {detail}")
    print(f"{len(qs)} queries, {len(bad)} diffs, {len(missing)} missing")
    return 1 if (bad or missing) else 0


if __name__ == "__main__":
    sys.exit(main())
