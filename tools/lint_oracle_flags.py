#!/usr/bin/env python3
"""Stated-flag certificate lint (VERDICT r14 item 3).

A certificate oracle that only STATES booleans (`SELECT true AS x`) is
weaker than one that states values: the DuckDB side cannot re-derive a
flag, so a Spark-side expression bug that pins the flag true is invisible
to the driver's hash compare. The r15 sweep added, next to every stated
flag, (a) at least one column the oracle DERIVES from a corpus table and
(b) where the construction is deterministic, the exact integer the flag
summarizes (hit counts, agreement counts, sketch estimates, ranks) so a
regression INSIDE the flag's slack still flips the hash.

This lint enforces the end state:
  1. every oracle containing a stated boolean must also reference at
     least one corpus table (a derivable companion) — no flag-only
     certificates;
  2. every stated-boolean column must appear in the ALLOWED residue
     below, each entry carrying its justification for why DuckDB cannot
     state it as a value (the documented non-derivable residue).

Usage: lint_oracle_flags.py <oracle_sql.json>
Exit 0 = clean; exit 1 = violations (listed on stdout).
"""
import json
import re
import sys

TABLES = ("documents", "embeddings", "lineitem", "orders", "events",
          "customer", "supplier", "part", "nation", "region")

# The justified residue: flag column -> (queries allowed to state it,
# why the value itself is not DuckDB-derivable). '*' = any query.
#
# r17 sweep: every threshold/containment/shape flag was converted to the
# violation-count form (q_expectations' pattern — the oracle states the
# exact integer 0, a failure surfaces as its size, and no boolean is
# stated): recall_ok/pairs_wellformed -> missed_over_budget/
# n_malformed_pairs/pairs_deficit; shape_ok -> n_bad_shape_anchors/
# n_cos_violations; subset/frac/order/capped/best_first ->
# n_outside/n_cells_* counts; pruned/range_pruned/files_ok ->
# n_rows_outside_partition/files_over_cap/files_over_buckets; codec_ok ->
# the actual codec-set string; current_stable/expired_unreadable/gc_exact
# and snapshot_read's v1_stable -> n_drift_rows/n_expired_readable/
# n_gc_*/current_version; recrawls_dropped/novel_kept ->
# recrawls_kept_over_cap/n_novel_dropped. The survivors below are the
# structurally boolean facts: equality across a reloaded artifact or an
# external byte format, and float-tolerance checks on trained artifacts
# whose violation "size" has no exact integer form.
ALLOWED = {
    # Artifact-lifecycle stability (q_sim_index_release): requires running
    # the snapshot store twice and comparing giant hash-sums, which SQL
    # over the source parquet cannot do.
    "v1_stable": ("*", "before/after comparison across two store reads"),
    "search_pinned_ok": ("*", "search equality over a reloaded artifact"),
    "current_is_v2": ("*", "snapshot-store CURRENT resolution"),
    # Filesystem / external-format facts.
    "staged_name_ok": ("*", "staged->final rename path names"),
    "rejected": ("*", "ingest-time structural rejection outcome"),
    "roundtrip_ok": ("*", "byte equality across an external format"),
    # Trainer/kernel equivalence certificates: both sides live in the
    # engine; the oracle cannot run either. Exact companion integers
    # (n_correct, n_equal, n_counted_pieces) are stated beside them.
    "train_separates": ("*", "distributed trainer accuracy"),
    "estep_ok": ("*", "distributed-vs-driver E-step equality"),
    "coverage_ok": ("*", "trained vocab vs corpus chars"),
    "norm_ok": ("*", "trained piece-probability normalization"),
    "tokens_ok": ("*", "trained tokenizer output bounds"),
    # PCA basis facts: float-tolerance checks on the trained projection
    # (an "orthonormality violation count" would hide the epsilon choice
    # the flag makes explicit in code).
    "ortho_ok": ("*", "trained PCA basis orthonormality"),
    "sorted_ok": ("*", "trained eigenvalue ordering"),
    "mean_ok": ("*", "centering of the trained projection"),
    "var_ok": ("*", "explained-variance accounting"),
    "identity_ok": ("*", "round-trip through the trained basis"),
    # Decoded-media / sampled-reconstruction facts.
    "color_ok": ("*", "decoded MJPEG pixel values"),
    "valid_ok": ("*", "sampled segmentation reconstructs the text"),
}

# (?!BOOLEAN\b): `CAST(true AS BOOLEAN)` is a type ascription, not a
# stated flag column.
FLAG_RE = re.compile(r"\b(?:true|false)\s+AS\s+(?!BOOLEAN\b)(\w+)",
                     re.IGNORECASE)


def main():
    sqls = json.load(open(sys.argv[1]))
    violations = []
    n_flagged = 0
    for name in sorted(sqls):
        sql = sqls[name]
        flags = FLAG_RE.findall(sql)
        if not flags:
            continue
        n_flagged += 1
        low = sql.lower()
        if not any(t in low for t in TABLES):
            violations.append(
                (name, "<no-table>", "stated flags with NO derivable companion"))
        for f in flags:
            rule = ALLOWED.get(f)
            if rule is None:
                violations.append((name, f, "stated flag not in justified residue"))
            elif rule[0] != "*" and name not in rule[0]:
                violations.append((name, f, f"flag only allowed for {rule[0]}"))
    for name, col, why in violations:
        print(f"VIOLATION {name}.{col}: {why}")
    print(f"{len(sqls)} oracles, {n_flagged} with stated flags, "
          f"{len(violations)} violations")
    return 1 if violations else 0


if __name__ == "__main__":
    sys.exit(main())
